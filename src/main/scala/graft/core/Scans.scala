package graft.core

import org.apache.spark.sql.DataFrame

/** Scan-parallelism discipline, shared by every per-document surface
  * (`Tables.widen`, `Dedup`'s internal widen, and the text/similarity
  * libraries): spread a compact table across the session's cores BEFORE
  * CPU-bound per-row work, but ONLY when the scan under-splits.
  *
  * Why it exists: a compact parquet file under
  * `spark.sql.files.maxPartitionBytes` arrives as ONE scan partition
  * (row-group bounds cap splitting even below that), so per-document
  * work — tokenize, shingle, hash, score — runs single-threaded no
  * matter how many cores the session has. Both the 26× and 100× scale
  * sweeps repeatedly read per-doc queries 10-45× super-linear BECAUSE of
  * this, never because of their arithmetic (r14 found it first;
  * q_chunk_dedup recurred in r15 in a query written before the
  * discipline). The repartition is a narrow round-robin exchange of the
  * raw rows, paid once and amortized by the parallel map; it is a NO-OP
  * whenever the scan already splits — at real scale (many files / large
  * row groups / a 1000-executor cluster) this does nothing, exactly as
  * the at-scale plan wants.
  *
  * Streaming DataFrames pass through untouched (`.rdd` is illegal on
  * them; micro-batch sides are widened by the batch plan inside
  * foreachBatch if needed).
  */
object Scans {
  def widen(df: DataFrame): DataFrame =
    if (df.isStreaming) df
    else {
      val target = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions < target) df.repartition(target) else df
    }
}
