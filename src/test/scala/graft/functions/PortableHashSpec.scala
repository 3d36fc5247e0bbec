package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Pins the portable family's documented contracts — especially the
  * MaxChars prefix cap: strings identical in their first 48 characters
  * collide BY DESIGN (the cap bounds the column fold's length; both
  * engines apply it, so oracles agree — but users dedup'ing on
  * near-identical long prefixes must know). */
class PortableHashSpec extends SparkSuite {
  import spark.implicits._

  private def hashOf(ss: String*): Seq[Long] =
    ss.toDF("s").select(PortableHash.polyHash(col("s")).as("h"))
      .as[Long].collect().toSeq

  test("MaxChars cap: strings differing only after char 48 collide by design") {
    val prefix = "x" * PortableHash.MaxChars
    val Seq(a, b, c) = hashOf(prefix + "SUFFIX-ONE", prefix + "completely different tail", prefix)
    assert(a == b && b == c,
      "the first 48 chars alone determine the hash — documented prefix-collision behavior")
    // a difference AT char 48 (the last hashed position) must still count
    val Seq(d, e) = hashOf(("y" * 47) + "A" + "tail", ("y" * 47) + "B" + "tail")
    assert(d != e, "character 48 is inside the hashed prefix")
  }

  test("Scala twin agrees with the Column fold, including empty and short strings") {
    val samples = Seq("", "a", "hello world", "x" * 47, "x" * 48, "x" * 200,
      "Zürich — naïve café", "0123456789" * 10)
    val viaCol = hashOf(samples: _*)
    val viaScala = samples.map(PortableHash.polyHashScala)
    assert(viaCol == viaScala)
    assert(viaCol.head == 0L, "empty string hashes to 0")
  }

  test("PolyHash48 kernel == HOF fold == Scala twin on adversarial inputs") {
    // the three independent derivations of the same arithmetic: the
    // codegen'd kernel (production), the composed-builtin interpreted
    // fold (the pre-kernel formulation, kept as a twin), and the plain
    // Scala loop. Surrogate pairs are the sharp case: one CODE POINT,
    // two UTF-16 chars — all three must step by code point.
    val samples = Seq("", "a", " ", "hello world", "x" * 47, "x" * 48,
      "x" * 49, "x" * 200, "Zürich — naïve café", "é́ combining",
      "emoji 😀 pair", "😀" * 60, "0123456789" * 10,
      "tab\tand\nnewline")
    val df = samples.toDF("s")
    val viaKernel = df.select(PortableHash.polyHash(col("s")).as("h")).as[Long].collect().toSeq
    val viaHof = df.select(PortableHash.polyHashHof(col("s")).as("h")).as[Long].collect().toSeq
    val viaScala = samples.map(PortableHash.polyHashScala)
    assert(viaKernel == viaScala, "kernel vs Scala twin")
    assert(viaHof == viaScala, "HOF fold vs Scala twin")
    // null propagates through the kernel like through the fold
    val nulls = Seq[Option[String]](None, Some("x")).toDF("s")
    assert(nulls.select(PortableHash.polyHash(col("s"))).collect().map(r => r.isNullAt(0)).toSeq
      == Seq(true, false))
  }

  test("affine permutations stay in [0, P) and differ across j") {
    val h = PortableHash.polyHashScala("some document shingle")
    val perms = (0 until 8).map { j =>
      Seq(h).toDF("h").select(PortableHash.perm(col("h"), j, 8).as("p"))
        .as[Long].collect().head
    }
    assert(perms.forall(p => p >= 0 && p < PortableHash.P))
    assert(perms.distinct.length == perms.length, "permutations must disagree across j")
  }
}
