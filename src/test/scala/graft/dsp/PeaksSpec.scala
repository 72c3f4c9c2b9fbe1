package graft.dsp

import org.scalatest.funsuite.AnyFunSuite

class PeaksSpec extends AnyFunSuite {
  private val g = Golden.load("peaks.txt")

  test("hand-computed triangle peak") {
    val x = Array(0.0, 1.0, 0.0, 2.0, 0.0)
    val p1 = Peaks.prominence(x, 1)
    assert(p1.prominence == 1.0 && p1.leftBase == 0 && p1.rightBase == 2)
    val w1 = Peaks.width(x, 1, 0.5)
    assert(math.abs(w1.width - 1.0) < 1e-12)
    assert(math.abs(w1.leftIp - 0.5) < 1e-12)
    assert(math.abs(w1.rightIp - 1.5) < 1e-12)
    assert(w1.widthHeight == 0.5)
    // base updates are strict-< (scipy rule): the first 0 encountered
    // (index 2) stays the left base even though x(0) ties it.
    val p3 = Peaks.prominence(x, 3)
    assert(p3.prominence == 2.0 && p3.leftBase == 2 && p3.rightBase == 4)
  }

  test("multi-peak signal vs python reimplementation") {
    val x = g("px")
    val peaks = g("ppeaks").map(_.toInt)
    assert(peaks.sameElements(Peaks.localMaxima(x)))
    for (rel <- Seq(0.5, 1.0)) {
      val ws = peaks.map(p => Peaks.width(x, p, rel))
      assert(Golden.maxAbsDiff(ws.map(_.width), g(s"widths_$rel")) < 1e-10)
      assert(Golden.maxAbsDiff(ws.map(_.widthHeight), g(s"wheights_$rel")) < 1e-10)
      assert(Golden.maxAbsDiff(ws.map(_.leftIp), g(s"lips_$rel")) < 1e-10)
      assert(Golden.maxAbsDiff(ws.map(_.rightIp), g(s"rips_$rel")) < 1e-10)
    }
    val ps = peaks.map(p => Peaks.prominence(x, p))
    assert(Golden.maxAbsDiff(ps.map(_.prominence), g("proms")) < 1e-10)
    assert(Golden.maxAbsDiff(ps.map(_.leftBase.toDouble), g("lbases")) < 1e-10)
    assert(Golden.maxAbsDiff(ps.map(_.rightBase.toDouble), g("rbases")) < 1e-10)
  }

  test("wlen-restricted prominence + prominence_data widths vs python") {
    val x = g("px")
    val peaks = g("ppeaks").map(_.toInt)
    for (wlen <- Seq(11, 25)) {
      val ps = peaks.map(p => Peaks.prominence(x, p, wlen))
      assert(Golden.maxAbsDiff(ps.map(_.prominence), g(s"proms_wlen$wlen")) < 1e-10)
      assert(Golden.maxAbsDiff(ps.map(_.leftBase.toDouble), g(s"lbases_wlen$wlen")) < 1e-10)
      assert(Golden.maxAbsDiff(ps.map(_.rightBase.toDouble), g(s"rbases_wlen$wlen")) < 1e-10)
      // widths via caller-supplied prominence_data (scipy kwarg)
      val ws = peaks.zip(ps).map { case (p, pd) => Peaks.width(x, p, 0.5, promData = pd) }
      assert(Golden.maxAbsDiff(ws.map(_.width), g(s"widths_wlen$wlen")) < 1e-10)
      assert(Golden.maxAbsDiff(ws.map(_.widthHeight), g(s"wheights_wlen$wlen")) < 1e-10)
      assert(Golden.maxAbsDiff(ws.map(_.leftIp), g(s"lips_wlen$wlen")) < 1e-10)
      assert(Golden.maxAbsDiff(ws.map(_.rightIp), g(s"rips_wlen$wlen")) < 1e-10)
      // width(wlen=) must equal width(promData=) computed with that wlen
      val ws2 = peaks.map(p => Peaks.width(x, p, 0.5, wlen = wlen))
      assert(ws.zip(ws2).forall { case (a, b) => a == b })
    }
    // wlen wide enough to cover the signal reduces to the unrestricted path
    val unres = peaks.map(p => Peaks.prominence(x, p))
    val wide = peaks.map(p => Peaks.prominence(x, p, wlen = 1000))
    assert(unres.zip(wide).forall { case (a, b) => a == b })
  }

  test("localMaxima handles plateaus and edges") {
    assert(Peaks.localMaxima(Array(0, 2, 2, 2, 0).map(_.toDouble)).toSeq == Seq(2))
    assert(Peaks.localMaxima(Array(3, 1, 2, 1, 3).map(_.toDouble)).toSeq == Seq(2))
    assert(Peaks.localMaxima(Array(1.0, 2.0)).isEmpty)
  }

  test("findPeaksFiltered: height floor, greedy distance (scipy tie rule), prominence") {
    // peaks at 1 (h=3), 3 (h=2), 5 (h=1)
    val x = Array(0.0, 3.0, 0.0, 2.0, 0.0, 1.0, 0.0)
    assert(Peaks.findPeaksFiltered(x).toSeq == Seq(1, 3, 5))
    assert(Peaks.findPeaksFiltered(x, height = 1.5).toSeq == Seq(1, 3))
    // distance 3: highest (idx 1) erases idx 3 (gap 2 < 3); idx 5
    // survives (gap 4 from idx 1)
    assert(Peaks.findPeaksFiltered(x, distance = 3).toSeq == Seq(1, 5))
    // exact height tie: scipy processes the RIGHTMOST tied peak first
    val tie = Array(0.0, 2.0, 0.0, 2.0, 0.0)
    assert(Peaks.findPeaksFiltered(tie, distance = 3).toSeq == Seq(3))
    // prominence: middle peak on a high shoulder has low prominence
    val sh = Array(0.0, 5.0, 4.0, 4.5, 4.0, 5.0, 0.0)
    assert(Peaks.findPeaksFiltered(sh, promMin = 1.0).toSeq == Seq(1, 5))
    assert(Peaks.findPeaksFiltered(sh, promMin = 0.4).toSeq == Seq(1, 3, 5))
    // invariants on random data: kept peaks pairwise >= distance apart,
    // all are true local maxima, and every drop is justified by a
    // kept higher-or-equal peak within distance
    val rnd = new scala.util.Random(5)
    val xs = Array.fill(400)(rnd.nextGaussian())
    for (dist <- Seq(2, 5, 11)) {
      val all = Peaks.localMaxima(xs)
      val kept = Peaks.findPeaksFiltered(xs, distance = dist)
      kept.sliding(2).foreach(p =>
        if (p.length == 2) assert(p(1) - p(0) >= dist))
      assert(kept.forall(all.contains))
      val dropped = all.filterNot(kept.contains)
      dropped.foreach { dp =>
        assert(kept.exists(kp => math.abs(kp - dp) < dist && xs(kp) >= xs(dp)),
          s"dropped peak $dp has no dominating kept neighbor (dist=$dist)")
      }
    }
  }

  test("findPeaksFiltered width filter: kept peaks bracket the bound, applied after prominence") {
    // a narrow spike (FWHM 1) and a broad hill (FWHM ~4)
    val x = Array(0.0, 0.5, 5.0, 0.5, 0.0, 1.0, 2.5, 3.0, 2.5, 1.0, 0.0)
    val narrowAndBroad = Peaks.findPeaksFiltered(x)
    assert(narrowAndBroad.toSeq == Seq(2, 7))
    // width floor keeps only the hill; ceiling keeps only the spike
    assert(Peaks.findPeaksFiltered(x, widthMin = 2.0).toSeq == Seq(7))
    assert(Peaks.findPeaksFiltered(x, widthMax = 2.0).toSeq == Seq(2))
    // both bounds = a band-pass on width
    assert(Peaks.findPeaksFiltered(x, widthMin = 0.5, widthMax = 2.0).toSeq == Seq(2))
    // filter agrees with the (independently oracled) width() evaluation
    val rnd = new scala.util.Random(17)
    val xs = Array.fill(300)(rnd.nextGaussian()).scanLeft(0.0)(_ + _ * 0.3)
    val wmin = 3.0
    val kept = Peaks.findPeaksFiltered(xs, widthMin = wmin)
    val all = Peaks.findPeaksFiltered(xs)
    for (p <- all) {
      val wd = Peaks.width(xs, p).width
      assert(kept.contains(p) == (wd >= wmin),
        s"peak $p width $wd membership mismatch")
    }
    // relHeight is honoured: at rel_height 1.0 widths span whole bases,
    // so a floor that removed peaks at 0.5 keeps them at 1.0
    val keptFull = Peaks.findPeaksFiltered(xs, widthMin = wmin, relHeight = 1.0)
    assert(keptFull.length >= kept.length)
  }

  test("findPeaksFiltered threshold: floor on min neighbor drop, ceiling on max") {
    //           0    1    2    3    4    5    6    7    8
    val x = Array(0.0, 1.0, 0.9, 3.0, 0.0, 0.5, 0.45, 0.5, 0.0)
    // peaks: 1 (drops 1.0, 0.1), 3 (2.1, 3.0), 5 (0.5, 0.05), 7 (0.05, 0.5)
    assert(Peaks.findPeaksFiltered(x).toSeq == Seq(1, 3, 5, 7))
    // min-drop floor 0.2: peak 1 min drop 0.1 out, 5/7 min drop 0.05 out
    assert(Peaks.findPeaksFiltered(x, thresholdMin = 0.2).toSeq == Seq(3))
    // floor 0.04 keeps all; ceiling 1.0 on the MAX drop kills 3 (drop
    // 3.0) but keeps 1 (max drop exactly 1.0 — the bound is inclusive)
    assert(Peaks.findPeaksFiltered(x, thresholdMin = 0.04).toSeq == Seq(1, 3, 5, 7))
    assert(Peaks.findPeaksFiltered(x, thresholdMin = 0.04, thresholdMax = 1.0)
      .toSeq == Seq(1, 5, 7))
    // a plateau peak has a zero drop on the plateau side -> any floor
    // removes it (scipy: threshold measures the IMMEDIATE neighbors)
    val pl = Array(0.0, 2.0, 2.0, 2.0, 0.0)
    assert(Peaks.findPeaksFiltered(pl).toSeq == Seq(2))
    assert(Peaks.findPeaksFiltered(pl, thresholdMin = 0.1).isEmpty)
    // threshold applies BEFORE distance: a tall peak removed by the
    // ceiling no longer suppresses its low neighbors
    val y = Array(0.0, 1.0, 0.0, 5.0, 0.0, 1.0, 0.0)
    assert(Peaks.findPeaksFiltered(y, distance = 3).toSeq == Seq(3))
    assert(Peaks.findPeaksFiltered(y, distance = 3, thresholdMax = 2.0)
      .toSeq == Seq(1, 5))
  }

  test("findPeaksFiltered plateau_size: edge bookkeeping, bounds, applied FIRST") {
    //           0    1    2    3    4    5    6    7    8    9    10
    val x = Array(0.0, 1.0, 0.0, 2.0, 2.0, 0.0, 3.0, 3.0, 3.0, 0.0, 0.0)
    // peaks: 1 (size 1), 3 (midpoint of [3,4], size 2), 7 (midpoint of
    // [6,8], size 3)
    val (mids, lefts, rights) = Peaks.localMaximaEdges(x)
    assert(mids.toSeq == Seq(1, 3, 7))
    assert(lefts.toSeq == Seq(1, 3, 6) && rights.toSeq == Seq(1, 4, 8))
    assert(Peaks.findPeaksFiltered(x, plateauMin = 2).toSeq == Seq(3, 7))
    assert(Peaks.findPeaksFiltered(x, plateauMin = 2, plateauMax = 2)
      .toSeq == Seq(3))
    assert(Peaks.findPeaksFiltered(x, plateauMax = 1).toSeq == Seq(1))
    // scipy's find_peaks(plateau_size=(min,max)) filter order: plateau
    // runs FIRST — a tall sharp peak removed by plateauMin no longer
    // suppresses its flat low neighbor under distance
    val y = Array(0.0, 1.0, 1.0, 0.0, 5.0, 0.0)
    assert(Peaks.findPeaksFiltered(y, distance = 4).toSeq == Seq(4))
    assert(Peaks.findPeaksFiltered(y, distance = 4, plateauMin = 2)
      .toSeq == Seq(1))
    // ...and before height: the plateau cut applies to peaks height
    // would have kept, independent of order observability — both
    // filters together conjoin
    assert(Peaks.findPeaksFiltered(y, height = 2.0, plateauMin = 2).isEmpty)
    assert(Peaks.findPeaksFiltered(y, height = 0.5, plateauMin = 2)
      .toSeq == Seq(1))
  }
}
