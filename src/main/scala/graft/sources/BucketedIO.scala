package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed table IO: pre-shuffle a fact table ONCE at write time so that
  * subsequent equi-joins and aggregations on the bucket key run without any
  * exchange — the 100 TB pattern for repeatedly-joined tables (pay one
  * shuffle at ingest, never again). Bucket metadata lives in the session
  * catalog; `join` on the bucket columns of two tables bucketed the same
  * way produces a zero-Exchange plan (verified in `BucketedIOSpec`).
  */
object BucketedIO {

  /** Write `df` as a bucketed managed table (sorted within buckets for
    * merge-friendly reads). */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, bucketCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  def readTable(spark: SparkSession, table: String): DataFrame = spark.table(table)
}
