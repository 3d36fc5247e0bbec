package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata alongside. The decode / feature
  * extraction step runs as a partition-level batch transformation
  * (`mapPartitions` — the Scala analog of `mapInPandas`: one iterator per
  * partition, amortized per-batch setup for a decoder library).
  *
  * Decoders are pluggable per format: [[Multimodal.NetpbmDecoder]] REALLY
  * decodes binary netpbm images (PGM/PPM — header parse, dimension
  * validation, brightness-histogram features) and [[Multimodal.WavDecoder]]
  * really parses RIFF/WAV audio, both with zero external libraries; any
  * other format raises its decoder's directed error. The Spark-side
  * plumbing — binary schema, partitioning, batch iterator shape, typed
  * output — is decoder-agnostic; a JNI/ffmpeg/ImageIO-backed factory slots
  * into the same [[Multimodal.MediaDecoder]] surface without touching it
  * (the test suite drives the plumbing through exactly such a drop-in,
  * test-scope decoder).
  */
object Multimodal {

  case class MediaMeta(doc_id: Long, n_bytes: Int, width: Int, height: Int, checksum: Long)

  /** Pluggable decoder: constructed ONCE PER PARTITION (the expensive
    * library/codec init the `mapInPandas` batch shape exists to amortize),
    * then applied per row. Production swaps [[NetpbmDecoder]] for a JNI /
    * ffmpeg / ImageIO-backed factory; the plumbing does not change. */
  trait MediaDecoder extends Serializable {
    def decode(docId: Long, bytes: Array[Byte]): MediaMeta
    /** Fixed-size feature vector (the embedding-extraction step). */
    def features(bytes: Array[Byte], dim: Int): Array[Float]
  }

  /** REAL decoder for binary netpbm images (PGM `P5` grayscale / PPM `P6`
    * RGB — the one raster format decodable with zero external libraries):
    * parses the header (magic, whitespace/`#`-comment-tolerant width,
    * height, maxval), validates the pixel payload length, and exposes
    *  - metadata: true (width, height) + pixel-byte sum as checksum;
    *  - features: an L1-normalized `dim`-bucket brightness histogram over
    *    the pixels (channels averaged for PPM) — a genuine, deterministic
    *    image feature suitable for the ANN pipelines.
    * Formats beyond netpbm still need an external codec; this decoder
    * throws on other magics, demonstrating the error path the pluggable
    * surface carries. */
  object NetpbmDecoder extends (() => MediaDecoder) with Serializable {
    def apply(): MediaDecoder = new MediaDecoder {
      def decode(docId: Long, bytes: Array[Byte]): MediaMeta = {
        val h = Header.parse(bytes)
        // sum exactly the declared raster: trailing bytes (a writer's
        // newline after the raster is a common, legal netpbm artifact)
        // must not change the checksum of pixel-identical images
        val rasterEnd = h.pixelOffset + h.width * h.height * (if (h.color) 3 else 1)
        var s = 0L
        var i = h.pixelOffset
        while (i < rasterEnd) { s += bytes(i) & 0xff; i += 1 }
        MediaMeta(docId, bytes.length, h.width, h.height, s)
      }
      def features(bytes: Array[Byte], dim: Int): Array[Float] = {
        val h = Header.parse(bytes)
        val hist = new Array[Float](dim)
        val channels = if (h.color) 3 else 1
        val rasterEnd = h.pixelOffset + h.width * h.height * channels
        var i = h.pixelOffset
        var n = 0
        while (i + channels <= rasterEnd) {
          var lum = 0
          var c = 0
          while (c < channels) { lum += bytes(i + c) & 0xff; c += 1 }
          lum /= channels
          hist(math.min(dim - 1, lum * dim / (h.maxval + 1))) += 1f
          n += 1
          i += channels
        }
        if (n > 0) { var d = 0; while (d < dim) { hist(d) /= n; d += 1 } }
        hist
      }
    }

    private case class Header(color: Boolean, width: Int, height: Int,
                              maxval: Int, pixelOffset: Int)

    /** REAL pixel transform on the decoded path: f×f average-pool
      * downsample of a P5 grayscale PGM or P6 RGB PPM, re-encoded in the
      * same format. Output dims are ⌈w/f⌉×⌈h/f⌉; each output sample is
      * the integer floor-average of its block's samples IN THAT CHANNEL
      * (P6 pools the three channels independently — averaging across
      * channels would desaturate), partial edge blocks averaged over the
      * pixels they actually contain — all-integer arithmetic, so an
      * oracle (or spec) can replay every output byte. */
    def resizePgmBytes(bytes: Array[Byte], f: Int): Array[Byte] = {
      require(f > 0, s"pool factor must be positive (got $f)")
      val hd = Header.parse(bytes)
      val channels = if (hd.color) 3 else 1
      val ow = (hd.width + f - 1) / f
      val oh = (hd.height + f - 1) / f
      val magic = if (hd.color) "P6" else "P5"
      val header = s"$magic\n$ow $oh\n${hd.maxval}\n".getBytes("US-ASCII")
      val out = new Array[Byte](header.length + ow * oh * channels)
      System.arraycopy(header, 0, out, 0, header.length)
      var r = 0
      while (r < oh) {
        var c = 0
        while (c < ow) {
          var ch = 0
          while (ch < channels) {
            var sum = 0
            var cnt = 0
            var dr = r * f
            while (dr < math.min(r * f + f, hd.height)) {
              var dc = c * f
              while (dc < math.min(c * f + f, hd.width)) {
                sum += bytes(hd.pixelOffset + (dr * hd.width + dc) * channels + ch) & 0xff
                cnt += 1
                dc += 1
              }
              dr += 1
            }
            out(header.length + (r * ow + c) * channels + ch) = (sum / cnt).toByte
            ch += 1
          }
          c += 1
        }
        r += 1
      }
      out
    }

    private object Header {
      /** netpbm header: magic, then 3 ints separated by whitespace, with
        * `#`-to-end-of-line comments allowed; a single whitespace byte
        * precedes the raster. */
      def parse(bytes: Array[Byte]): Header = {
        require(bytes.length >= 2, "truncated netpbm header")
        val magic = new String(bytes, 0, 2, "US-ASCII")
        require(magic == "P5" || magic == "P6", s"unsupported magic '$magic' (netpbm P5/P6 only)")
        var pos = 2
        def nextInt(): Int = {
          // skip whitespace and comments
          var inComment = false
          while (pos < bytes.length &&
            (inComment || bytes(pos).toChar.isWhitespace || bytes(pos) == '#')) {
            if (bytes(pos) == '#') inComment = true
            if (bytes(pos) == '\n') inComment = false
            pos += 1
          }
          var v = 0
          var any = false
          while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
            v = v * 10 + (bytes(pos) - '0'); pos += 1; any = true
          }
          require(any, "malformed netpbm header")
          v
        }
        val (w, h, mv) = (nextInt(), nextInt(), nextInt())
        require(w > 0 && h > 0 && mv > 0, "invalid netpbm dimensions")
        // the spec allows maxval up to 65535 (2 bytes/sample); this decoder
        // implements the 1-byte form only, so reject rather than misparse
        require(mv <= 255, s"netpbm maxval $mv > 255 (16-bit samples) unsupported")
        pos += 1 // the single whitespace byte before the raster
        val channels = if (magic == "P6") 3 else 1
        require(bytes.length - pos >= w.toLong * h * channels,
          s"truncated raster: need ${w.toLong * h * channels}, have ${bytes.length - pos}")
        Header(magic == "P6", w, h, mv, pos)
      }
    }
  }

  /** Partition-batched decode: binary column → typed metadata. The decoder
    * factory runs once per partition. */
  def extractMeta(spark: SparkSession, df: DataFrame,
                  decoder: () => MediaDecoder): Dataset[MediaMeta] = {
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
                      decoder: () => MediaDecoder): DataFrame = {
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val d = decoder()
        it.map { case (id, bytes) => (id, d.features(bytes, dim)) }
      }
      .toDF("doc_id", "embedding")
  }

  case class AudioMeta(doc_id: Long, n_bytes: Int, sample_rate: Int, channels: Int,
                       bits: Int, n_samples: Long, peak: Int, sum_sq: Long)

  /** REAL decoder for RIFF/WAV PCM audio — like netpbm for images, the one
    * audio container parseable with zero external libraries: validates the
    * RIFF/WAVE magic, WALKS the chunk list (real-world WAVs interleave
    * LIST/fact/cue chunks before `data`; a fixed-44-byte-offset parser
    * would misread them), parses `fmt ` (PCM only), and computes sample
    * statistics — peak amplitude and the energy sum Σs² (the exact integer
    * the RMS derives from) — for 8-bit unsigned and 16-bit signed LE PCM.
    * Compressed formats (non-PCM audioFormat) throw the directed error the
    * pluggable surface carries. */
  object WavDecoder {

    /** Minimal canonical 8-bit mono PCM WAV wrapping `payload` as samples —
      * the encode side (a 44-byte classic header + the sample bytes). */
    def wavFromBytes(payload: Array[Byte], sampleRate: Int): Array[Byte] = {
      // RIFF chunks are word-aligned: an odd-length data payload carries a
      // zero pad byte EXCLUDED from the declared chunk size (and the RIFF
      // size counts the pad, since it is part of the chunk stream).
      val pad = payload.length & 1
      val out = java.nio.ByteBuffer.allocate(44 + payload.length + pad)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes("US-ASCII")).putInt(36 + payload.length + pad)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1)                       // PCM, mono
        .putInt(sampleRate).putInt(sampleRate)         // byteRate = rate·1·8/8
        .putShort(1).putShort(8)                       // blockAlign, bits
        .put("data".getBytes("US-ASCII")).putInt(payload.length)
        .put(payload)
      if (pad == 1) out.put(0.toByte)
      out.array()
    }

    /** The shared RIFF chunk walk: (audioFormat, channels, rate, bits,
      * dataOffset, dataSize) — used by [[parse]] and [[decimateWav]]. */
    private def parseLayout(bytes: Array[Byte]): (Int, Int, Int, Int, Int, Int) = {
      val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def ascii(off: Int, n: Int) = new String(bytes, off, n, "US-ASCII")
      require(bytes.length >= 12 && ascii(0, 4) == "RIFF" && ascii(8, 4) == "WAVE",
        "not a RIFF/WAVE file")
      var pos = 12
      var fmt: Option[(Int, Int, Int, Int)] = None // (audioFormat, channels, rate, bits)
      var data: Option[(Int, Int)] = None          // (offset, size)
      while (pos + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
        val id = ascii(pos, 4)
        val size = bb.getInt(pos + 4)
        // bound check in Long: pos + 8 + size in Int overflows negative for an
        // adversarial size near Int.MaxValue and would pass `<= length`
        require(size >= 0 && pos.toLong + 8L + size <= bytes.length,
          s"truncated WAV chunk '$id' (declares $size bytes at offset $pos)")
        id match {
          case "fmt " =>
            require(size >= 16, "fmt chunk too short")
            fmt = Some((bb.getShort(pos + 8) & 0xffff, bb.getShort(pos + 10) & 0xffff,
              bb.getInt(pos + 12), bb.getShort(pos + 22) & 0xffff))
          case "data" => data = Some((pos + 8, size))
          case _      => () // LIST/fact/cue/...: skip
        }
        pos += 8 + size + (size & 1) // chunks are word-aligned; odd sizes pad
      }
      val (audioFormat, channels, rate, bits) =
        fmt.getOrElse(throw new IllegalArgumentException("WAV has no fmt chunk"))
      val (off, size) =
        data.getOrElse(throw new IllegalArgumentException("WAV has no data chunk"))
      require(audioFormat == 1, s"audioFormat $audioFormat unsupported (PCM=1 only; " +
        "compressed WAV needs an external codec behind the pluggable decoder surface)")
      require(bits == 8 || bits == 16, s"$bits-bit samples unsupported (8/16 only)")
      (audioFormat, channels, rate, bits, off, size)
    }

    /** REAL transform on the audio path: naive decimation of 8-bit mono
      * PCM — keep every `factor`-th sample, re-encode at rate/factor.
      * Deliberately filterless (a production resampler low-passes first
      * to prevent aliasing; the filterless form is the integer-exact one
      * an oracle replays byte-for-byte, and the Spark-side plumbing —
      * chunk walk, re-encode, batching — is identical either way). */
    def decimateWav(bytes: Array[Byte], factor: Int): Array[Byte] = {
      require(factor >= 1, s"decimation factor must be >= 1 (got $factor)")
      val (_, channels, rate, bits, off, size) = parseLayout(bytes)
      require(bits == 8 && channels == 1,
        s"decimateWav supports 8-bit mono PCM (got $bits-bit, $channels ch)")
      require(rate % factor == 0,
        s"decimation factor $factor must divide the sample rate $rate: " +
          "rate / factor is the re-encoded header rate, and integer division " +
          "would silently floor it (factor > rate would even declare rate 0 — " +
          "an invalid WAV produced without error)")
      val kept = new Array[Byte](if (size == 0) 0 else (size - 1) / factor + 1)
      var i = 0
      while (i < kept.length) { kept(i) = bytes(off + i * factor); i += 1 }
      wavFromBytes(kept, rate / factor)
    }

    def parse(docId: Long, bytes: Array[Byte]): AudioMeta = {
      val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val (_, channels, rate, bits, off, size) = parseLayout(bytes)
      var peak = 0
      var sumSq = 0L
      var n = 0L
      if (bits == 8) {
        var i = off
        while (i < off + size) {
          val s = bytes(i) & 0xff
          if (s > peak) peak = s
          sumSq += s.toLong * s
          n += 1; i += 1
        }
      } else {
        var i = off
        while (i + 2 <= off + size) {
          val s = bb.getShort(i).toInt
          val a = math.abs(s)
          if (a > peak) peak = a
          sumSq += s.toLong * s
          n += 1; i += 2
        }
      }
      AudioMeta(docId, bytes.length, rate, channels, bits, n, peak, sumSq)
    }
  }

  /** Partition-batched audio decode: binary WAV column → typed
    * [[AudioMeta]] (same batch shape as the image decoders). */
  def extractAudioMeta(spark: SparkSession, df: DataFrame): Dataset[AudioMeta] = {
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => WavDecoder.parse(id, bytes) })
  }

  /** Partition-batched image resize (the decode→transform→re-encode leg of
    * a multimodal pipeline): every P5 PGM blob average-pooled `factor`×
    * ([[NetpbmDecoder.resizePgmBytes]]) into a new, valid PGM blob —
    * composable with [[extractMeta]]/[[extractFeatures]] downstream. Same
    * `mapPartitions` batch shape as the decoders (per-partition setup
    * amortized; at scale this is the CPU-bound stage that wants the corpus
    * pre-split, not a shuffle). */
  def resizeImages(spark: SparkSession, df: DataFrame, factor: Int): DataFrame = {
    import spark.implicits._
    df.select(col("doc_id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        (id, NetpbmDecoder.resizePgmBytes(bytes, factor))
      })
      .toDF("doc_id", "blob")
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
