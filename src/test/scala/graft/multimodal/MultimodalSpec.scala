package graft.multimodal

import graft.SparkSuite

/** The netpbm decoder really decodes: constructed PGM/PPM binaries go
  * through the same partition-batched plumbing as the stub and come out
  * with true dimensions and meaningful histogram features. */
class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  /** Binary PGM (P5): 4x2, maxval 255, pixels 0,0,0,0,255,255,255,255. */
  private def pgm: Array[Byte] =
    ("P5\n# a comment\n4 2\n255\n".getBytes("US-ASCII") ++
      Array[Byte](0, 0, 0, 0, -1, -1, -1, -1))

  /** Binary PPM (P6): 2x1, maxval 255, one black and one white RGB pixel. */
  private def ppm: Array[Byte] =
    ("P6\n2 1\n255\n".getBytes("US-ASCII") ++
      Array[Byte](0, 0, 0, -1, -1, -1))

  test("PGM decode through the partition-batched plumbing yields true dimensions") {
    val df = Seq((1L, pgm), (2L, ppm)).toDF("doc_id", "blob")
    val metas = Multimodal.extractMeta(spark, df, Multimodal.NetpbmDecoder)
      .collect().map(m => m.doc_id -> m).toMap
    assert(metas(1L).width == 4 && metas(1L).height == 2)
    assert(metas(1L).checksum == 4L * 255) // four white pixels
    assert(metas(2L).width == 2 && metas(2L).height == 1)
    assert(metas(2L).checksum == 3L * 255) // one white RGB pixel
  }

  test("brightness-histogram features: half black half white, L1-normalized") {
    val df = Seq((1L, pgm)).toDF("doc_id", "blob")
    val feats = Multimodal.extractFeatures(spark, df, dim = 4, Multimodal.NetpbmDecoder)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val h = feats(1L)
    assert(h.length == 4)
    assert(math.abs(h.sum - 1.0) < 1e-6)
    assert(h.head == 0.5f && h.last == 0.5f) // darkest + brightest buckets
    assert(h(1) == 0f && h(2) == 0f)
  }

  test("trailing bytes after the raster don't change checksum or features") {
    val d = Multimodal.NetpbmDecoder()
    val clean = d.decode(1L, pgm)
    val trailed = d.decode(1L, pgm ++ "\n".getBytes("US-ASCII"))
    assert(clean.checksum == trailed.checksum)
    assert(clean.width == trailed.width && clean.height == trailed.height)
    assert(d.features(pgm, 4).toSeq == d.features(pgm ++ "\n".getBytes("US-ASCII"), 4).toSeq)
  }

  test("non-netpbm bytes fail with a directed error, truncated rasters too") {
    val d = Multimodal.NetpbmDecoder()
    val bad = intercept[IllegalArgumentException] {
      d.decode(1L, "JFIF....".getBytes("US-ASCII"))
    }
    assert(bad.getMessage.contains("netpbm"))
    val trunc = intercept[IllegalArgumentException] {
      d.decode(1L, "P5\n4 2\n255\n".getBytes("US-ASCII") ++ Array[Byte](0, 0))
    }
    assert(trunc.getMessage.contains("truncated"))
    // 16-bit samples (maxval > 255) are rejected, not misparsed as 8-bit
    val deep = intercept[IllegalArgumentException] {
      d.decode(1L, "P5\n1 1\n65535\n".getBytes("US-ASCII") ++ Array[Byte](0, 0))
    }
    assert(deep.getMessage.contains("255"))
  }

  test("textAsPgm normalizes on CODE POINTS: a supplementary-plane char is ONE '?'") {
    // q_multimodal_meta's oracle replaces non-printable code points with one
    // '?' each (DuckDB regexp is code-point based); the Spark side must
    // agree even for chars outside the BMP (😀 = U+1F600 = 2 UTF-16 units).
    val texts = Seq("plain ascii", "café 😀 end", "😀😁")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val metas = Multimodal.extractMeta(spark,
        df.select($"doc_id", graft.queries.SimilarityQueries.textAsPgm($"text").as("blob")),
        Multimodal.NetpbmDecoder)
      .collect().map(m => m.doc_id -> m).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      // independent derivation over code points
      val ascii = t.codePoints().toArray.map(cp =>
        if (cp >= 0x20 && cp <= 0x7e) cp else '?'.toInt)
      val h = math.max(1, math.ceil(ascii.length / 32.0).toInt)
      val checksum = ascii.map(_.toLong).sum + (32L * h - ascii.length) * 32L
      val m = metas(i.toLong)
      assert(m.width == 32 && m.height == h, s"doc $i dims")
      assert(m.checksum == checksum, s"doc $i checksum")
    }
  }

  test("resizePgmBytes: 2x2 floor-average pooling, partial edge blocks, valid re-encode") {
    // 4x3 (odd height): last row-block pools 2 pixels, not 4
    val img = ("P5\n4 3\n255\n".getBytes("US-ASCII") ++
      Array[Byte](10, 20, 30, 40,
                  50, 60, 70, 80,
                  90, 100, 110, 120))
    val out = Multimodal.NetpbmDecoder.resizePgmBytes(img, 2)
    assert(new String(out.take(10), "US-ASCII") == "P5\n2 2\n255")
    val raster = out.drop("P5\n2 2\n255\n".length)
    // blocks: (10,20,50,60)/4=35 (30,40,70,80)/4=55; partial (90,100)/2=95 (110,120)/2=115
    assert(raster.toSeq == Seq[Byte](35, 55, 95, 115))
    // the re-encode is a VALID PGM: the real decoder round-trips it
    val meta = Multimodal.extractMeta(spark,
        Seq((7L, out)).toDF("doc_id", "blob"), Multimodal.NetpbmDecoder)
      .collect().head
    assert(meta.width == 2 && meta.height == 2 && meta.checksum == 35 + 55 + 95 + 115)
  }

  test("resize pools P6 color per channel, byte-exact (cross-channel averaging would desaturate)") {
    // 2x2 RGB image: R channel 10/20/30/40, G 100 everywhere, B 0/0/200/200
    val img = ("P6\n2 2\n255\n".getBytes("US-ASCII") ++ Array[Byte](
      10, 100, 0, 20, 100, 0,
      30, 100, -56, 40, 100, -56)) // -56 = 200 unsigned
    val out = Multimodal.NetpbmDecoder.resizePgmBytes(img, 2)
    val hdr = "P6\n1 1\n255\n".getBytes("US-ASCII")
    assert(out.take(hdr.length).sameElements(hdr), "P6 in, P6 out")
    val px = out.drop(hdr.length).map(_ & 0xff)
    assert(px.toSeq == Seq((10 + 20 + 30 + 40) / 4, 100, (0 + 0 + 200 + 200) / 4),
      s"per-channel floor averages, got ${px.toSeq}")
    // and the resized bytes re-parse as a valid color image
    val meta = Multimodal.NetpbmDecoder().decode(1L, out)
    assert(meta.width == 1 && meta.height == 1 && meta.checksum == 25 + 100 + 100)
  }

  test("WAV round-trip: encode bytes as 8-bit PCM, chunk-walking parse recovers stats") {
    val payload = Array[Byte](0, 10, 20, -1) // samples 0, 10, 20, 255
    val wav = Multimodal.WavDecoder.wavFromBytes(payload, 8000)
    assert(wav.length == 44 + 4)
    val m = Multimodal.extractAudioMeta(spark,
        Seq((3L, wav)).toDF("doc_id", "blob")).collect().head
    assert(m == Multimodal.AudioMeta(3L, 48, 8000, 1, 8, 4, 255,
      0L + 100 + 400 + 255L * 255))
  }

  test("WAV encode pads odd data chunks to word alignment; declared size excludes the pad") {
    val wav = Multimodal.WavDecoder.wavFromBytes(Array[Byte](10, 20, 30), 8000)
    assert(wav.length == 44 + 3 + 1, "odd payload must carry one pad byte")
    assert(wav.last == 0, "pad byte must be zero")
    val bb = java.nio.ByteBuffer.wrap(wav).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(bb.getInt(40) == 3, "declared data size must EXCLUDE the pad")
    assert(bb.getInt(4) == 36 + 3 + 1, "RIFF size counts the padded chunk stream")
    val m = Multimodal.WavDecoder.parse(1L, wav)
    assert(m.n_samples == 3 && m.peak == 30, "pad byte must not read as a sample")
  }

  test("WAV parser rejects an adversarial chunk size that overflows Int arithmetic") {
    val wav = Multimodal.WavDecoder.wavFromBytes(Array[Byte](1, 2), 8000)
    val bb = java.nio.ByteBuffer.wrap(wav).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(40, Int.MaxValue - 4) // data size: pos+8+size overflows negative in Int
    val e = intercept[IllegalArgumentException] { Multimodal.WavDecoder.parse(0L, wav) }
    assert(e.getMessage.contains("truncated"), s"want a loud truncation error, got: $e")
  }

  test("WAV parser walks interleaved chunks and reads 16-bit signed LE samples") {
    // RIFF [LIST junk] [fmt 16-bit] [data]: -2 and +3 as LE shorts
    val bb = java.nio.ByteBuffer.allocate(12 + (8 + 4) + (8 + 16) + (8 + 4))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(0).put("WAVE".getBytes("US-ASCII"))
    bb.put("LIST".getBytes("US-ASCII")).putInt(4).put("junk".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(2).putInt(44100).putInt(44100 * 4).putShort(4).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(4).putShort(-2).putShort(3)
    val m = Multimodal.WavDecoder.parse(9L, bb.array())
    assert(m.sample_rate == 44100 && m.channels == 2 && m.bits == 16)
    assert(m.n_samples == 2 && m.peak == 3 && m.sum_sq == 4L + 9)
  }

  test("decimateWav keeps every factor-th sample, halves rate, rejects 16-bit") {
    // rate 9000 so factor 3 divides it exactly: decimateWav is divisor-only
    // (rate / factor is the re-encoded header rate; flooring is a directed error)
    val wav = Multimodal.WavDecoder.wavFromBytes(Array[Byte](10, 20, 30, 40, 50, 60, 70), 9000)
    val dec = Multimodal.WavDecoder.decimateWav(wav, 3) // keeps 10, 40, 70
    val m = Multimodal.WavDecoder.parse(1L, dec)
    assert(m.sample_rate == 3000 && m.n_samples == 3 && m.peak == 70)
    assert(m.sum_sq == 100L + 1600 + 4900)
    // a non-dividing factor gets the directed error, never a floored header rate
    val nd = intercept[IllegalArgumentException] {
      Multimodal.WavDecoder.decimateWav(
        Multimodal.WavDecoder.wavFromBytes(Array[Byte](1, 2, 3), 8000), 3)
    }
    assert(nd.getMessage.contains("must divide the sample rate"), s"got: $nd")
    // factor 1 is an identity re-encode
    val id = Multimodal.WavDecoder.parse(2L, Multimodal.WavDecoder.decimateWav(wav, 1))
    assert(id.n_samples == 7 && id.sum_sq == Multimodal.WavDecoder.parse(2L, wav).sum_sq)
    // 16-bit input gets the directed error, not silent byte-level garbage
    val bb = java.nio.ByteBuffer.allocate(12 + (8 + 16) + (8 + 4))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(0).put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(4).putShort(-2).putShort(3)
    val e = intercept[IllegalArgumentException] {
      Multimodal.WavDecoder.decimateWav(bb.array(), 2)
    }
    assert(e.getMessage.contains("8-bit mono"), s"got: $e")
  }

  test("WAV parser rejects non-PCM, truncated chunks, and non-RIFF bytes") {
    val ok = Multimodal.WavDecoder.wavFromBytes(Array[Byte](1, 2), 8000)
    val nonPcm = ok.clone(); nonPcm(20) = 3 // audioFormat = IEEE float
    intercept[IllegalArgumentException] { Multimodal.WavDecoder.parse(0L, nonPcm) }
    val truncated = ok.dropRight(1)
    intercept[IllegalArgumentException] { Multimodal.WavDecoder.parse(0L, truncated) }
    intercept[IllegalArgumentException] { Multimodal.WavDecoder.parse(0L, pgm) }
  }

  test("resizePgmBytes: factor 1 is identity on the raster; bad factors rejected") {
    val img = ("P5\n4 2\n255\n".getBytes("US-ASCII") ++
      Array[Byte](1, 2, 3, 4, 5, 6, 7, 8))
    val id = Multimodal.NetpbmDecoder.resizePgmBytes(img, 1)
    assert(id.drop("P5\n4 2\n255\n".length).toSeq == Seq[Byte](1, 2, 3, 4, 5, 6, 7, 8))
    // P6 pools per channel (round 7): the 2x1 black|white PPM at factor 2
    // averages to one mid-gray pixel in every channel
    val color = Multimodal.NetpbmDecoder.resizePgmBytes(ppm, 2)
    assert(color.drop("P6\n1 1\n255\n".length).map(_ & 0xff).toSeq == Seq(127, 127, 127))
    intercept[IllegalArgumentException] {
      Multimodal.NetpbmDecoder.resizePgmBytes(img, 0)
    }
  }
}
