package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Int8 quantization must be a faithful 4× compression: bounded
  * per-coordinate error, codes in range, and good enough for ANN
  * shortlisting (top-5 neighbor recall on the real embeddings). */
class QuantizeSpec extends SparkSuite {

  private lazy val emb = graft.queries.Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("codes are in [-127,127] and dequantization error is <= scale/2 per coordinate") {
    val q = Similarity.quantizeInt8(emb, col("embedding"))
    val rows = q.select(col("vec_id"), col("embedding"), col("q"), col("q_scale")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val xs = r.getSeq[Float](1)
      val qs = r.getSeq[Int](2)
      val s = r.getDouble(3)
      assert(xs.length == qs.length)
      qs.foreach(c => assert(c >= -127 && c <= 127, s"code $c out of range"))
      xs.zip(qs).foreach { case (x, c) =>
        // floor(+0.5) rounds half toward +inf, so the error bound is a
        // closed half-interval; allow 1 ulp of slack for the division
        assert(math.abs(x.toDouble - c * s) <= s / 2 + math.ulp(s * 127),
          s"vec ${r.getLong(0)}: |$x - $c*$s| > scale/2")
      }
    }
  }

  test("quantized cosine preserves exact top-5 neighbors well enough to shortlist") {
    val rows = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      d / math.sqrt(na * nb)
    }
    def quant(a: Array[Double]): Array[Double] = {
      val s = math.max(a.map(math.abs).max / 127.0, 1e-12)
      a.map(x => math.floor(x / s + 0.5) * s)
    }
    val ids = rows.keys.toArray.sorted.take(20)
    val recalls = ids.map { q =>
      def top5(f: Array[Double] => Array[Double]) =
        rows.keys.filter(_ != q).toSeq
          .sortBy(n => (-cos(f(rows(q)), f(rows(n))), n)).take(5).toSet
      val exact = top5(identity)
      val viaQuant = top5(quant)
      exact.intersect(viaQuant).size / 5.0
    }
    val meanRecall = recalls.sum / recalls.length
    // int8 on 64-dim vectors loses ~0.4% of the dot product — shortlist
    // quality should be near-perfect; 0.8 mean recall is a loose floor
    assert(meanRecall >= 0.8, s"mean top-5 recall $meanRecall")
  }
}
