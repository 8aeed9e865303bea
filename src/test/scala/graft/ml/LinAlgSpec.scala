package graft.ml

import breeze.linalg.{inv, svd, DenseMatrix}
import org.scalatest.funsuite.AnyFunSuite

/** Ground-truth cross-check of the hand-rolled [[LinAlg]] against
  * Breeze's LAPACK-backed routines (test scope only — the main path
  * deliberately avoids Breeze, see LinAlg scaladoc). */
class LinAlgSpec extends AnyFunSuite {

  private def rng(seed: Long) = new scala.util.Random(seed)

  private def randomSpd(d: Int, seed: Long): Array[Double] = {
    // A = I + XᵀX is symmetric positive definite — exactly the LinUCB shape.
    val r = rng(seed)
    val x = Array.fill(3 * d * d)(r.nextDouble() * 2 - 1)
    val a = new Array[Double](d * d)
    for (i <- 0 until d) a(i * d + i) = 1.0
    for (row <- 0 until 3 * d; i <- 0 until d; j <- 0 until d)
      a(i * d + j) += x(row * d + i) * x(row * d + j)
    a
  }

  test("invertRowMajor matches Breeze inv on SPD matrices") {
    for (d <- Seq(2, 5, 9, 15); seed <- 1L to 3L) {
      val a = randomSpd(d, seed * 100 + d)
      val got = LinAlg.invertRowMajor(a, d)
      val m = new DenseMatrix(d, d, a.clone()).t
      val expect = inv(m)
      for (i <- 0 until d; j <- 0 until d)
        assert(math.abs(got(i * d + j) - expect(i, j)) < 1e-9,
          s"d=$d seed=$seed ($i,$j): ${got(i * d + j)} vs ${expect(i, j)}")
    }
  }

  test("invertRowMajor handles a permutation-like matrix (pivoting required)") {
    // zero on the first diagonal slot forces a row swap
    val a = Array(0.0, 1.0, 1.0, 0.0)
    val got = LinAlg.invertRowMajor(a, 2)
    assert(got.sameElements(Array(0.0, 1.0, 1.0, 0.0)))
  }

  test("invertRowMajor rejects singular input") {
    intercept[ArithmeticException] {
      LinAlg.invertRowMajor(Array(1.0, 2.0, 2.0, 4.0), 2)
    }
  }

  test("choleskyLower matches Breeze cholesky and reconstructs A") {
    for (d <- Seq(2, 5, 12); seed <- 1L to 3L) {
      val a = randomSpd(d, seed * 31 + d)
      val l = LinAlg.choleskyLower(a, d)
      val expect = breeze.linalg.cholesky(new DenseMatrix(d, d, a.clone()))
      for (i <- 0 until d; j <- 0 until d) {
        val want = if (j <= i) expect(i, j) else 0.0
        assert(math.abs(l(i * d + j) - want) < 1e-9, s"d=$d ($i,$j)")
      }
      // L·Lᵀ = A
      for (i <- 0 until d; j <- 0 until d) {
        val recon = (0 until d).map(k => l(i * d + k) * l(j * d + k)).sum
        assert(math.abs(recon - a(i * d + j)) < 1e-9)
      }
    }
  }

  test("choleskyLower rejects non-positive-definite input") {
    intercept[ArithmeticException] {
      LinAlg.choleskyLower(Array(1.0, 2.0, 2.0, 1.0), 2) // indefinite
    }
  }

  test("symEigDesc matches Breeze svd on symmetric PSD matrices") {
    for (n <- Seq(3, 8, 20); seed <- 1L to 2L) {
      val a = randomSpd(n, seed * 1000 + n)
      val (eig, vecs) = LinAlg.symEigDesc(a, n)
      val s = svd(new DenseMatrix(n, n, a.clone())) // symmetric → layout-agnostic
      // eigenvalues = singular values, both descending
      for (j <- 0 until n)
        assert(math.abs(eig(j) - s.S(j)) < 1e-8 * math.max(1.0, s.S(0)),
          s"n=$n seed=$seed eig $j: ${eig(j)} vs ${s.S(j)}")
      // eigenvectors match up to sign (columns of vecs vs rows of Vt)
      for (j <- 0 until n) {
        val dot = (0 until n).map(i => vecs(i * n + j) * s.Vt(j, i)).sum
        assert(math.abs(math.abs(dot) - 1.0) < 1e-7,
          s"n=$n seed=$seed vec $j: |dot|=${math.abs(dot)}")
      }
    }
  }

  test("symEigDesc reconstructs the input: A = V diag(e) Vᵀ") {
    val n = 12
    val a = randomSpd(n, 77)
    val (eig, vecs) = LinAlg.symEigDesc(a, n)
    for (i <- 0 until n; j <- 0 until n) {
      val recon = (0 until n).map(m => vecs(i * n + m) * eig(m) * vecs(j * n + m)).sum
      assert(math.abs(recon - a(i * n + j)) < 1e-8 * math.max(1.0, eig(0)),
        s"($i,$j): $recon vs ${a(i * n + j)}")
    }
  }
}
