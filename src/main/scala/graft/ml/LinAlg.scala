package graft.ml

/** Minimal dense linear algebra for the tiny driver-side matrices the
  * engine needs (LinUCB d×d inverses at d≈5-15, the vocab-bounded gram
  * matrix for the SVD embedding). Hand-rolled on purpose: the matrices
  * are small enough that a JNI BLAS round-trip buys nothing, and keeping
  * Breeze/netlib off the query hot path removes its multi-second
  * first-use native-loader cost from a cold JVM (measured ~3s on this
  * container — it landed entirely on the first bench query that touched
  * `breeze.linalg.inv`). Breeze remains the ground truth in ScalaTest
  * cross-checks.
  *
  * Reference parity: the reference inverts A with commons-math LU
  * (`recsys-trainer/.../LinUCBUpdater.kt:111-118`) and numpy
  * (`recsys-engine/src/bandit_manager.py:97-99`); Gauss-Jordan with
  * partial pivoting agrees to floating-point round-off, which is inside
  * the tolerance every consumer of these numbers rounds to.
  */
object LinAlg {

  /** Invert a d×d row-major matrix via Gauss-Jordan elimination with
    * partial pivoting. Throws on a numerically singular input. */
  def invertRowMajor(src: Array[Double], d: Int): Array[Double] = {
    require(src.length == d * d, s"expected ${d * d} elements, got ${src.length}")
    val m = src.clone()
    val out = new Array[Double](d * d)
    var i = 0
    while (i < d) { out(i * d + i) = 1.0; i += 1 }
    var col = 0
    while (col < d) {
      // partial pivot: largest |value| in this column at or below the diagonal
      var piv = col
      var best = math.abs(m(col * d + col))
      var r = col + 1
      while (r < d) {
        val v = math.abs(m(r * d + col))
        if (v > best) { best = v; piv = r }
        r += 1
      }
      if (best < 1e-300) throw new ArithmeticException(
        s"singular matrix: no usable pivot in column $col")
      if (piv != col) {
        var j = 0
        while (j < d) {
          var t = m(piv * d + j); m(piv * d + j) = m(col * d + j); m(col * d + j) = t
          t = out(piv * d + j); out(piv * d + j) = out(col * d + j); out(col * d + j) = t
          j += 1
        }
      }
      val inv = 1.0 / m(col * d + col)
      var j = 0
      while (j < d) { m(col * d + j) *= inv; out(col * d + j) *= inv; j += 1 }
      r = 0
      while (r < d) {
        if (r != col) {
          val f = m(r * d + col)
          if (f != 0.0) {
            var k = 0
            while (k < d) {
              m(r * d + k) -= f * m(col * d + k)
              out(r * d + k) -= f * out(col * d + k)
              k += 1
            }
          }
        }
        r += 1
      }
      col += 1
    }
    out
  }

  /** Cholesky factorization of an SPD row-major matrix: returns lower-
    * triangular L (row-major) with L·Lᵀ = A. Used by the LinTS policy to
    * sample θ̃ ~ N(θ, ν²A⁻¹) as θ + ν·L·z with L = chol(A⁻¹). Throws on
    * a non-positive-definite input. */
  def choleskyLower(src: Array[Double], d: Int): Array[Double] = {
    require(src.length == d * d, s"expected ${d * d} elements, got ${src.length}")
    val l = new Array[Double](d * d)
    var i = 0
    while (i < d) {
      var j = 0
      while (j <= i) {
        var s = src(i * d + j)
        var k = 0
        while (k < j) { s -= l(i * d + k) * l(j * d + k); k += 1 }
        if (i == j) {
          if (s <= 0.0) throw new ArithmeticException(
            s"matrix not positive definite at pivot $i (s=$s)")
          l(i * d + i) = math.sqrt(s)
        } else {
          l(i * d + j) = s / l(j * d + j)
        }
        j += 1
      }
      i += 1
    }
    l
  }

  /** Eigendecomposition of a symmetric n×n row-major matrix via cyclic
    * Jacobi rotations. Returns `(eigenvalues, vectors)` sorted by
    * eigenvalue DESCENDING, with `vectors(i * n + j)` = component i of
    * eigenvector j (eigenvectors are columns). For a symmetric PSD gram
    * matrix this is exactly its SVD (singular values = eigenvalues,
    * right singular vectors = eigenvectors), which is all the truncated-
    * SVD embedding needs. Deterministic: fixed sweep order, fixed
    * rotation formulas, stable sort.
    */
  def symEigDesc(src: Array[Double], n: Int): (Array[Double], Array[Double]) = {
    require(src.length == n * n, s"expected ${n * n} elements, got ${src.length}")
    val a = src.clone()
    val v = new Array[Double](n * n)
    var i = 0
    while (i < n) { v(i * n + i) = 1.0; i += 1 }

    def offDiagSq(): Double = {
      var s = 0.0
      var p = 0
      while (p < n) {
        var q = p + 1
        while (q < n) { val x = a(p * n + q); s += 2 * x * x; q += 1 }
        p += 1
      }
      s
    }

    var sweep = 0
    val tol = 1e-22 * math.max(1.0, a.map(x => x * x).sum)
    while (sweep < 64 && offDiagSq() > tol) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p * n + q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q * n + q) - a(p * n + p)) / (2.0 * apq)
            val t =
              if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              else -1.0 / (-theta + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            // A ← JᵀAJ on rows/cols p,q
            var k = 0
            while (k < n) {
              val akp = a(k * n + p)
              val akq = a(k * n + q)
              a(k * n + p) = c * akp - s * akq
              a(k * n + q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < n) {
              val apk = a(p * n + k)
              val aqk = a(q * n + k)
              a(p * n + k) = c * apk - s * aqk
              a(q * n + k) = s * apk + c * aqk
              k += 1
            }
            // V ← VJ
            k = 0
            while (k < n) {
              val vkp = v(k * n + p)
              val vkq = v(k * n + q)
              v(k * n + p) = c * vkp - s * vkq
              v(k * n + q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    // Cyclic Jacobi converges quadratically: 64 sweeps is far beyond any
    // non-pathological symmetric input. If the off-diagonal mass still
    // hasn't met tolerance, the factorization is inaccurate — fail loudly
    // rather than return a quietly wrong embedding (mirrors the
    // convergence requirement in Dedup.propagateLabels).
    require(offDiagSq() <= tol,
      s"symEigDesc: Jacobi failed to converge in 64 sweeps (n=$n, offDiagSq=${offDiagSq()}, tol=$tol)")

    // sort eigenpairs by eigenvalue descending (stable: ties keep sweep order)
    val order = (0 until n).sortBy(j => -a(j * n + j))
    val eig = new Array[Double](n)
    val vecs = new Array[Double](n * n)
    var j = 0
    while (j < n) {
      val src_j = order(j)
      eig(j) = a(src_j * n + src_j)
      var r = 0
      while (r < n) { vecs(r * n + j) = v(r * n + src_j); r += 1 }
      j += 1
    }
    (eig, vecs)
  }
}
