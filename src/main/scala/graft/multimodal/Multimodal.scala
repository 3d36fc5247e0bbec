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

  /** Pluggable decoder: constructed ONCE PER PARTITION (the expensive
    * library/codec init the `mapInPandas` batch shape exists to amortize),
    * then applied per row. Production swaps [[StubDecoder]] for a JNI /
    * ffmpeg / ImageIO-backed factory; the plumbing does not change. */
  trait MediaDecoder extends Serializable {
    def decode(docId: Long, bytes: Array[Byte]): MediaMeta
    /** Fixed-size feature vector (the embedding-extraction step). */
    def features(bytes: Array[Byte], dim: Int): Array[Float]
  }

  /** Deterministic stub decoder (this container has no media libraries). */
  object StubDecoder extends (() => MediaDecoder) with Serializable {
    def apply(): MediaDecoder = new MediaDecoder {
      def decode(docId: Long, bytes: Array[Byte]): MediaMeta = decodeStub(docId, bytes)
      def features(bytes: Array[Byte], dim: Int): Array[Float] = {
        val out = new Array[Float](dim)
        var h = 1125899906842597L
        var i = 0
        while (i < bytes.length) { h = h * 31 + (bytes(i) & 0xff); i += 1 }
        var d = 0
        while (d < dim) {
          h ^= h << 13; h ^= h >>> 7; h ^= h << 17 // xorshift per slot
          out(d) = (h & 0xffff).toFloat / 0xffff.toFloat
          d += 1
        }
        out
      }
    }
  }

  /** Partition-batched decode: binary column → typed metadata. The decoder
    * factory runs once per partition. */
  def extractMeta(spark: SparkSession, df: DataFrame,
                  decoder: () => MediaDecoder = StubDecoder): Dataset[MediaMeta] = {
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val d = decoder() // per-partition codec setup, amortized over rows
        it.map { case (id, bytes) => d.decode(id, bytes) }
      }
  }

  /** Partition-batched feature extraction: binary column → fixed-dimension
    * `array<float>` embedding column, composable with the
    * [[graft.similarity.Similarity]] ANN pipelines. */
  def extractFeatures(spark: SparkSession, df: DataFrame, dim: Int,
                      decoder: () => MediaDecoder = StubDecoder): DataFrame = {
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val d = decoder()
        it.map { case (id, bytes) => (id, d.features(bytes, dim)) }
      }
      .toDF("doc_id", "embedding")
  }

  /** Frame sampling (the video path): slice the blob into fixed-size
    * "frames" and keep every `stride`-th, one output row per kept frame —
    * pure column expressions (slice arithmetic fuses into the scan; the
    * explode is a Generate node Catalyst prunes through). */
  def sampleFrames(df: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    val nFrames = ceil(length(col("blob")).cast("double") / frameBytes).cast("int")
    df.select(
        col("doc_id"),
        posexplode(transform(sequence(lit(0), greatest(nFrames, lit(1)) - 1),
          i => col("blob").substr(i * frameBytes + 1, lit(frameBytes))))
          .as(Seq("frame_idx", "frame")))
      .filter(pmod(col("frame_idx"), lit(stride)) === 0)
  }
}
