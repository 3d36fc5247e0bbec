package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch over an integer key column — the fixed-memory heavy-
  * hitter / frequency-estimate structure for corpora whose distinct-key
  * count dwarfs executor memory: `depth` hash rows × `width` counters
  * (d·w cells TOTAL, regardless of row count), est(x) = min over rows of
  * the counter x hashes into; never an underestimate, overcount bounded
  * by collisions (≤ e·N/width with probability 1 − e^−depth).
  *
  * The hash family is `((x mod P)·Aⱼ + Bⱼ mod P) mod width` with
  * P = 2³¹−1 and fixed odd multipliers — pure 64-bit-safe integer
  * arithmetic ((P−1)·Aⱼ < 2⁶² — no ANSI overflow), chosen over xxhash64
  * deliberately: any engine (and the DuckDB oracle) can replay the WHOLE
  * sketch bit-for-bit, counters and estimates, not just its error bounds.
  *
  * Scale shape: the sketch build is one `posexplode(depth)` over the scan
  * into a (row, bucket) aggregate — map-side combined down to ≤ d·w
  * partial cells per task, so the shuffle moves kilobytes regardless of
  * input size. Estimates join the (d·w-row, broadcast) counter table.
  */
object CountMin {

  private val P = 2147483647L // 2^31 - 1 (Mersenne)
  // fixed odd multipliers/offsets (primes; arbitrary but frozen — part of
  // the sketch's identity, like MinHash's seeds)
  private val A = Seq(1299721L, 1299743L, 1299763L, 1299791L, 1299811L, 1299817L, 1299821L, 1299827L)
  private val B = Seq(15485863L, 15485867L, 15485917L, 15485927L, 15485933L, 15485941L, 15485959L, 15485989L)

  /** Bucket of `key` in hash row `j` (pure column arithmetic). */
  def bucket(key: Column, j: Int, width: Int): Column =
    pmod(pmod(pmod(key.cast("long"), lit(P)) * A(j) + B(j), lit(P)), lit(width))

  /** The d×w counter table: (j, bucket, c) — ≤ depth·width rows. */
  def counters(df: DataFrame, key: Column, width: Int, depth: Int): DataFrame = {
    require(depth >= 1 && depth <= A.length, s"depth must be in [1, ${A.length}] (got $depth)")
    require(width > 0, s"width must be positive (got $width)")
    df.select(posexplode(array((0 until depth).map(j => bucket(key, j, width)): _*))
        .as(Seq("j", "bucket")))
      .groupBy(col("j"), col("bucket"))
      .agg(count(lit(1)).as("c"))
  }

  /** CMS frequency estimates for `items` (a one-column frame of keys):
    * (item, cms_est). The counter table broadcasts — it is ≤ d·w rows by
    * construction, whatever the corpus size. */
  def estimates(df: DataFrame, key: Column, width: Int, depth: Int,
                items: DataFrame): DataFrame = {
    val ctrs = counters(df, key, width, depth)
    val itemKey = col(items.columns.head)
    val itemBuckets = items
      .select(itemKey.as("item"),
        posexplode(array((0 until depth).map(j => bucket(col(items.columns.head), j, width)): _*))
          .as(Seq("j", "bucket")))
    // Left join: a (j,bucket) cell absent from the counter table means its
    // count is 0 — the CMS point-query contract is min over ALL depth rows,
    // so an unseen key must estimate 0, not vanish or min over a subset.
    itemBuckets
      .join(broadcast(ctrs), Seq("j", "bucket"), "left")
      .groupBy(col("item"))
      .agg(min(coalesce(col("c"), lit(0L))).as("cms_est"))
  }
}
