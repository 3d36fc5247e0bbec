package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering — the multi-dimensional
  * data-skipping layout (Delta/Iceberg `OPTIMIZE ZORDER BY` shape;
  * Morton 1966): interleave the bits of two key columns so that rows
  * close in EITHER dimension land close on the curve, then range-
  * partition and sort the table by the curve index at write time. A
  * selective predicate on either dimension then prunes most files via
  * parquet min/max footers — where a single-column sort only skips for
  * its leading column. The third storage-layout lever next to Hive
  * partition pruning (`PartitionPruningSpec`) and bucketed co-located
  * joins ([[BucketedIO]]).
  *
  * The index is pure column arithmetic (32 shift/mask terms, whole-stage
  * codegen'd — no UDF), over each key's MOST-SIGNIFICANT 16 bits: a key
  * whose domain is narrower than 16 bits is left-aligned into its lane,
  * a wider one keeps its TOP 16 bits (`x >> (bits − 16)`). High bits,
  * not low: the curve exists to give footer min/max boxes locality, and
  * locality lives in the high bits — taking the low 16 (`% 65536`, the
  * original cap) made every key beyond 2^16 WRAP, scattering the
  * large-scale structure pseudo-randomly and measurably un-clustering
  * the layout (caught by the 26× sweep: z touched 3× the files of a
  * single-key sort once l_partkey crossed 25M). A SQL oracle replays
  * every bit with `//`/`%` integer arithmetic.
  */
object ZOrder {

  /** Bit width of a key domain: the smallest b with max < 2^b (integer
    * threshold comparisons only — a SQL oracle replays it exactly from
    * `max(key)`, the autoPlanesPerTable pattern). Domains at or past
    * 2^62 are REFUSED loudly: they would derive width 63, and `lane`'s
    * `pmod(key, 2^62)` under a silent clamp discards the key's TOP bit
    * — a key 2^62+k would cluster next to k, exactly the wraparound
    * failure the high-bit lane design exists to prevent (a clamp loses
    * the HIGH bit; the 16-bit lane truncation only ever discards LOW
    * bits — not the same thing). Keys that wide in practice are hash
    * values, which carry no footer locality to preserve anyway; rescale
    * the key into a ≤61-bit domain (e.g. `shiftright(key, 2)` for a
    * dense wide domain) before clustering. */
  def bitsFor(maxValue: Long): Int = {
    if (maxValue >= (1L << 62))
      throw new IllegalArgumentException(
        s"ZOrder.bitsFor: key domain max $maxValue >= 2^62. A 63-bit lane would " +
          "silently wrap the key's top bit (destroying the high-bit locality the " +
          "curve exists for) and its 1<<63 mirror overflows in the SQL oracle. " +
          "Full-width keys are hash-shaped and carry no locality to cluster by; " +
          "rescale the key into a <= 61-bit domain (e.g. shiftright(key, 2)) first.")
    1 + (1 to 62).count(k => maxValue >= (1L << k))
  }

  /** Morton index of two keys, each mapped to its 16-bit lane by domain
    * width: narrow keys LEFT-ALIGNED (`(x mod 2^bits) << (16 − bits)`),
    * wide keys truncated to their HIGH 16 bits
    * (`(x mod 2^bits) >> (bits − 16)`). Without the alignment a
    * narrow-domain key occupies only the LOW interleave positions, the
    * curve degenerates to a sort on the wide key's high bits, and every
    * output file spans the narrow key's whole range (measured straddle
    * 1.0 — no skipping at all). Aligned, both keys' most-significant
    * bits compete at the top of the index, which is what gives the
    * curve its either-dimension locality. Bit i of x lands at 2i, of y
    * at 2i+1. */
  def zindex(x: Column, y: Column, xBits: Int, yBits: Int): Column = {
    require(xBits >= 1 && xBits <= 62 && yBits >= 1 && yBits <= 62,
      "zindex lane widths must be 1..62")
    def lane(c: Column, bits: Int): Column = {
      val dom = pmod(c.cast("bigint"), lit(1L << bits))
      // shiftright, not floating division: dom can reach 2^62 and a
      // double round-trip loses bits past 2^53
      if (bits <= 16) dom * lit(1L << (16 - bits))
      else shiftright(dom, bits - 16)
    }
    val x16 = lane(x, xBits)
    val y16 = lane(y, yBits)
    (0 until 16).map { i =>
      (shiftright(x16, i).bitwiseAND(1L) * lit(1L << (2 * i))) +
        (shiftright(y16, i).bitwiseAND(1L) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)
  }

  /** Write `df` z-clustered on (xCol, yCol): lane widths from the keys'
    * observed maxima (one 1-row aggregate read-back — driver state is
    * two ints), then range-partition by the Morton index into `files`
    * output files and sort within each. One global range exchange at
    * write time — the amortized layout cost, paid once like the
    * bucketing shuffle. */
  def clusterWrite(df: DataFrame, xCol: String, yCol: String,
                   path: String, files: Int): Unit = {
    val mx = df.agg(max(col(xCol)).cast("bigint"), max(col(yCol)).cast("bigint")).head()
    // max() over an empty table (or an all-NULL key) is NULL; getLong
    // would throw a bare NPE from deep inside the write job — name the
    // actual problem instead
    if (mx.isNullAt(0) || mx.isNullAt(1)) {
      val bad = Seq(xCol, yCol).zipWithIndex.collect { case (c, i) if mx.isNullAt(i) => c }
      throw new IllegalArgumentException(
        s"ZOrder.clusterWrite: max(${bad.mkString(", ")}) is NULL — the input is " +
          "empty or the clustering key is all-NULL. Z-clustering derives its bit-lane " +
          "widths from the observed key maxima, so it needs at least one row with " +
          "non-NULL values in both key columns; filter NULL keys out (they carry no " +
          "locality) or skip clustering for an empty write.")
    }
    val z = zindex(col(xCol), col(yCol), bitsFor(mx.getLong(0)), bitsFor(mx.getLong(1)))
    df.withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
