package graft.dsp

/** Symmetric eigendecomposition for the bounded d×d matrices the
  * embedding pipeline produces (covariance of a d-dim corpus, d ≲
  * a few thousand). Cyclic Jacobi (Golub & Van Loan §8.5): rotate away
  * the largest off-diagonal elements sweep by sweep — unconditionally
  * stable for symmetric input, no shifts/deflation subtleties, and the
  * accumulated rotations ARE the eigenvectors. Driver-side by design:
  * the distributed pass is the GramAgg moment scan; this consumes its
  * d² output, like kmeansFit consumes collected centroids.
  */
object Eigen {

  /** Eigenvalues (descending) and matching eigenvectors (rows) of a
    * symmetric matrix. Signs are normalized so each vector's
    * largest-magnitude component is positive — the same convention
    * makes results comparable across runs and engines.
    */
  def symmetric(aIn: Array[Array[Double]],
                maxSweeps: Int = 64): (Array[Double], Array[Array[Double]]) = {
    val n = aIn.length
    require(n > 0 && aIn.forall(_.length == n), "matrix must be square")
    val a = Array.tabulate(n, n)((i, j) => aIn(i)(j))
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    val tol = 1e-14 * math.max(1.0, frobenius(a))
    while (off > tol && sweep < maxSweeps) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          if (math.abs(a(p)(q)) > tol / (n * n)) rotate(a, v, p, q)
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    // extract, sort descending, normalize signs
    val order = (0 until n).sortBy(i => -a(i)(i))
    val values = order.map(i => a(i)(i)).toArray
    val vectors = order.map { i =>
      val vec = Array.tabulate(n)(r => v(r)(i))
      var mi = 0
      var m = 0.0
      var r = 0
      while (r < n) {
        if (math.abs(vec(r)) > m) { m = math.abs(vec(r)); mi = r }
        r += 1
      }
      if (vec(mi) < 0) vec.map(-_) else vec
    }.toArray
    (values, vectors)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    val n = a.length
    var s = 0.0
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) { s += 2 * a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }

  private def frobenius(a: Array[Array[Double]]): Double = {
    var s = 0.0
    a.foreach(_.foreach(x => s += x * x))
    math.sqrt(s)
  }

  /** One Jacobi rotation zeroing a(p)(q), updating rows/cols p,q of `a`
    * and columns p,q of the accumulated rotations `v`.
    */
  private def rotate(a: Array[Array[Double]], v: Array[Array[Double]],
                     p: Int, q: Int): Unit = {
    val n = a.length
    val apq = a(p)(q)
    if (apq == 0.0) return
    val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
    // stable tangent: smaller root of t² + 2θt − 1 = 0
    val t = math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
      case 0.0 => 1.0 // theta == 0 -> 45°
      case x => x
    }
    val c = 1.0 / math.sqrt(t * t + 1.0)
    val s = t * c
    var k = 0
    while (k < n) {
      val akp = a(k)(p)
      val akq = a(k)(q)
      a(k)(p) = c * akp - s * akq
      a(k)(q) = s * akp + c * akq
      k += 1
    }
    k = 0
    while (k < n) {
      val apk = a(p)(k)
      val aqk = a(q)(k)
      a(p)(k) = c * apk - s * aqk
      a(q)(k) = s * apk + c * aqk
      k += 1
    }
    k = 0
    while (k < n) {
      val vkp = v(k)(p)
      val vkq = v(k)(q)
      v(k)(p) = c * vkp - s * vkq
      v(k)(q) = s * vkp + c * vkq
      k += 1
    }
  }
}
