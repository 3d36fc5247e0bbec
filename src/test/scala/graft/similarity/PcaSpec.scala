package graft.similarity

import org.scalatest.funsuite.AnyFunSuite

/** The integer power iteration's contract: scatter-matrix arithmetic,
  * convergence to the dominant eigendirection, determinism. */
class PcaSpec extends AnyFunSuite {

  test("scatter matrix = n*sum_prod - sum_i*sum_j from the aggregate layout") {
    // two 2-dim vectors (1,2), (3,4): layout [s11,s12,s21,s22, 4,6, 2]
    val m = Seq(10L, 14L, 14L, 20L, 4L, 6L, 2L)
    val sc = Pca.scatterMatrix(m, 2)
    assert(sc.map(_.toSeq).toSeq == Seq(Seq(4L, 4L), Seq(4L, 4L)))
    // = n^2 * cov: var(1,3) = 1 → 4*1 = 4 in every cell (perfect correlation)
  }

  test("power iteration finds the dominant eigendirection of a known matrix") {
    // diag-dominant symmetric: eigenvector of [[5,2],[2,1]] is ~(0.91, 0.41)
    val mat = Array(Array(5L, 2L), Array(2L, 1L))
    val v = Pca.powerIteration(mat, iters = 20)
    assert(math.abs(v(0)) == Pca.Scale, s"max component must renormalize to Scale, got ${v.toSeq}")
    val ratio = v(1).toDouble / v(0)
    // true ratio = (λ1 - 5)/2 with λ1 = 3 + sqrt(8) ≈ 5.8284 → 0.4142
    assert(math.abs(ratio - 0.4142) < 0.01, s"direction ratio $ratio")
  }

  test("iteration is deterministic and all-integer") {
    val rnd = new scala.util.Random(5)
    val a = Array.fill(8, 8)(0L)
    for (i <- 0 until 8; j <- 0 to i) {
      val x = rnd.nextInt(1000).toLong - 300
      a(i)(j) = x; a(j)(i) = x
    }
    val v1 = Pca.powerIteration(a, 12)
    val v2 = Pca.powerIteration(a, 12)
    assert(v1.toSeq == v2.toSeq)
    assert(v1.forall(x => math.abs(x) <= Pca.Scale))
  }
}
