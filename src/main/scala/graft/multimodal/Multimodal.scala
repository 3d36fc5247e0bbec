package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata alongside. The decode / feature
  * extraction step runs as a partition-level batch transformation
  * (`mapPartitions` — the Scala analog of `mapInPandas`: one iterator per
  * partition, amortized per-batch setup for a decoder library).
  *
  * The actual media decoding is STUBBED (no image/audio libraries in this
  * environment): `decodeStub` derives deterministic fake metadata from the
  * raw bytes. The Spark-side plumbing — binary schema, partitioning, batch
  * iterator shape, typed output — is real and tested; swapping the stub for
  * a JNI/ffmpeg/ImageIO decoder changes only the function body.
  */
object Multimodal {

  case class MediaMeta(doc_id: Long, n_bytes: Int, width: Int, height: Int, checksum: Long)

  /** Deterministic fake "decode": pretends the blob is an image and derives
    * (width, height, checksum) from the bytes. Replace with a real decoder
    * in production. */
  def decodeStub(docId: Long, bytes: Array[Byte]): MediaMeta = {
    var crc = 0L
    var i = 0
    while (i < bytes.length) { crc = crc * 31 + (bytes(i) & 0xff); i += 1 }
    val w = 64 + (math.abs(crc) % 1024).toInt
    val h = 64 + (math.abs(crc >> 10) % 1024).toInt
    MediaMeta(docId, bytes.length, w, h, crc)
  }

  /** Attach a fake binary payload column (UTF-8 of the text) — stands in for
    * a real image/audio blob column in the testdata. */
  def withFakeBlob(df: DataFrame): DataFrame =
    df.withColumn("blob", encode(col("text"), "UTF-8"))

  /** Partition-batched decode: binary column → typed metadata. */
  def extractMeta(spark: SparkSession, df: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder setup would go here (load codec once)
        it.map { case (id, bytes) => decodeStub(id, bytes) }
      }
  }
}
