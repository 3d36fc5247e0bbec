package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** An engine-portable universal hash family over strings — polynomial
  * character hash into Z_P (P = 2³¹−1) composed with Lehmer-sequence
  * affine permutations: h_j(s) = (poly(s)·Aⱼ + Bⱼ) mod P.
  *
  * This exists NEXT TO the production xxhash64/splitmix kernels
  * ([[ShingleHash64]], [[SimHash64]]), not instead of them: xxhash64 mixes
  * better and runs as one codegen'd loop, but its constants cannot be
  * replayed by a SQL oracle. Every operation here — ord·31^i sums, one
  * mod, an affine map — is exact 64-bit-safe integer arithmetic any engine
  * reproduces bit-for-bit, which turns whole hash-seeded pipelines
  * (MinHash signatures → LSH banding → candidates) into fully
  * oracle-checkable queries. Collision quality is universal-hash grade:
  * fine for sketches, weaker bit-mixing than xxhash64.
  *
  * Overflow audit (Spark 4 ANSI throws on Long overflow): poly terms are
  * code·31^i-mod-P ≤ ~1.1e6·(2³¹−1) < 2⁶²; ≤ MaxChars terms sum < 2⁶³.
  * The affine step is (P−1)·(P−1)+P < 2⁶². */
object PortableHash {

  val P = 2147483647L // 2^31 - 1
  val MaxChars = 48   // characters hashed per string (documented cap)

  /** 31^i mod P for i < MaxChars. */
  val powers: Seq[Long] =
    Iterator.iterate(1L)(p => p * 31 % P).take(MaxChars).toSeq

  /** Lehmer sequences seeded by the classic minimal-standard multipliers —
    * frozen constants, part of the family's identity. */
  def permConstants(n: Int): Seq[(Long, Long)] = {
    val as = Iterator.iterate(48271L)(a => a * 48271L % P).take(n).toSeq
    val bs = Iterator.iterate(69621L)(b => b * 69621L % P).take(n).toSeq
    as.zip(bs)
  }

  /** poly(s) = Σ code(sᵢ)·31^i mod P over the first [[MaxChars]] characters
    * (code points, matching SQL `ord`/`substr` semantics). Empty strings
    * hash to 0. Backed by the codegen'd [[PolyHash48]] kernel — one JVM
    * loop per value; the previous composed-builtin fold ([[polyHashHof]])
    * evaluated interpreted per character and dominated every portable-hash
    * pipeline's profile (see PolyHash48's scaladoc for the measurements).
    * Same arithmetic bit-for-bit; SQL oracles replaying ord·31^i sums are
    * unaffected. */
  def polyHash(s: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      PolyHash48(org.apache.spark.sql.graftbridge.Bridge.expression(s)))

  /** The composed-builtin formulation polyHash had through r14 — kept as
    * the independently-derived twin the kernel agreement spec checks
    * against (the ShingleHash64 pattern). */
  def polyHashHof(s: Column): Column = {
    val pows = array(powers.map(lit): _*)
    val summed = aggregate(
      sequence(lit(1), least(length(s), lit(MaxChars))),
      lit(0L),
      (acc, i) => acc + ascii(s.substr(i, lit(1))).cast("bigint") * element_at(pows, i))
    when(length(s) <= 0, lit(0L)).otherwise(pmod(summed, lit(P)))
  }

  /** The j-th affine permutation of an already-reduced hash (h < P). */
  def perm(h: Column, j: Int, n: Int): Column = {
    val (a, b) = permConstants(n)(j)
    pmod(h * a + b, lit(P))
  }

  /** Scala twin of [[polyHash]] for specs and driver-side derivations. */
  def polyHashScala(s: String): Long = {
    if (s.isEmpty) 0L
    else {
      var acc = 0L
      var i = 0
      val cps = s.codePoints().toArray.take(MaxChars)
      while (i < cps.length) { acc += cps(i).toLong * powers(i); i += 1 }
      acc % P
    }
  }
}
