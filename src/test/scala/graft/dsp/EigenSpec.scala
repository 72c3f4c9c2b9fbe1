package graft.dsp

import org.scalatest.funsuite.AnyFunSuite

class EigenSpec extends AnyFunSuite {

  private def randSym(n: Int, seed: Int): Array[Array[Double]] = {
    val r = new scala.util.Random(seed)
    val a = Array.ofDim[Double](n, n)
    for (i <- 0 until n; j <- i until n) {
      val v = r.nextGaussian()
      a(i)(j) = v
      a(j)(i) = v
    }
    a
  }

  private def checkDecomposition(a: Array[Array[Double]]): Unit = {
    val n = a.length
    val (values, vectors) = Eigen.symmetric(a)
    // descending order
    values.sliding(2).foreach(p => if (p.length == 2) assert(p(0) >= p(1) - 1e-12))
    // trace preserved
    val trace = (0 until n).map(i => a(i)(i)).sum
    assert(math.abs(values.sum - trace) < 1e-9 * math.max(1.0, math.abs(trace)))
    // A·v = λ·v and orthonormality
    for (c <- 0 until n) {
      val v = vectors(c)
      val av = Array.tabulate(n)(i => (0 until n).map(j => a(i)(j) * v(j)).sum)
      for (i <- 0 until n)
        assert(math.abs(av(i) - values(c) * v(i)) < 1e-8, s"Av!=λv at ($c,$i)")
      for (c2 <- 0 until n) {
        val dot = (0 until n).map(i => v(i) * vectors(c2)(i)).sum
        val want = if (c == c2) 1.0 else 0.0
        assert(math.abs(dot - want) < 1e-9, s"orthonormality ($c,$c2): $dot")
      }
      // sign convention: largest-|component| positive
      val mi = v.indices.maxBy(i => math.abs(v(i)))
      assert(v(mi) > 0 || math.abs(v(mi)) < 1e-12)
    }
  }

  test("Jacobi decomposition invariants on random symmetric matrices") {
    for ((n, seed) <- Seq((3, 1), (8, 2), (20, 3), (64, 4)))
      checkDecomposition(randSym(n, seed))
  }

  test("known 2x2: [[2,1],[1,2]] has eigenvalues 3 and 1") {
    val (values, vectors) = Eigen.symmetric(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(values(0) - 3.0) < 1e-12)
    assert(math.abs(values(1) - 1.0) < 1e-12)
    val s = 1.0 / math.sqrt(2)
    assert(math.abs(vectors(0)(0) - s) < 1e-12 && math.abs(vectors(0)(1) - s) < 1e-12)
  }

  test("diagonal matrix passes through (sorted)") {
    val (values, _) = Eigen.symmetric(Array(
      Array(1.0, 0.0, 0.0), Array(0.0, 5.0, 0.0), Array(0.0, 0.0, 3.0)))
    assert(values.toSeq == Seq(5.0, 3.0, 1.0))
  }
}
