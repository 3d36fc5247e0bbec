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
