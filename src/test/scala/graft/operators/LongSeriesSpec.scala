package graft.operators

import org.apache.spark.sql.DataFrame
import graft.SparkTestBase
import graft.dsp.{Conv, Design, Fft, Filt}

/** Scale-shape sanity on longer series (4096 samples × 8 series):
  * the group→kernel→explode path must stay correct and the chunked
  * convolution must stay bit-identical when a series spans many
  * chunks.
  */
class LongSeriesSpec extends SparkTestBase {
  import spark.implicits._

  private val n = 4096
  private val nSeries = 8

  private def x(k: Int, i: Int): Double =
    math.sin(i * 0.01 * (k + 1)) + 0.3 * math.cos(i * 0.07) + 0.001 * i

  private lazy val longDf: DataFrame = {
    val rows = for (k <- 0 until nSeries; i <- 0 until n)
      yield (k, i.toDouble, x(k, i))
    new scala.util.Random(7).shuffle(rows).toDF("k", "t", "v").repartition(16)
  }

  private def series(k: Int): Array[Double] = Array.tabulate(n)(i => x(k, i))

  private def byK(df: DataFrame, k: Int, c: String): Array[Double] =
    df.filter($"k" === k).orderBy("pos").select(c).as[Double].collect()

  test("rfft on 4096-sample series matches the kernel (pow-2 path)") {
    val out = Signal.rfft(longDf, Seq("k"), "t", "v").cache()
    for (k <- Seq(0, 5)) {
      val want = Fft.rfft(series(k))
      val re = byK(out, k, "re")
      assert(re.length == n / 2 + 1)
      assert(re.indices.forall(i => math.abs(re(i) - want.re(i)) < 1e-9))
    }
  }

  test("convolveLong across 8 chunks is bit-identical to direct convolve") {
    val kernel = Array.tabulate(9)(i => 0.1 * (i + 1))
    val out = Signal.convolveLong(longDf, Seq("k"), "t", "v", kernel,
      chunkSize = 512, method = "direct")
    for (k <- Seq(1, 7)) {
      val want = Conv.convolve(series(k), kernel, "full", "direct")
      val got = byK(out, k, "value")
      assert(got.length == n + 8)
      assert(got.indices.forall(i => got(i) == want(i)), s"k=$k")
    }
  }

  test("convolveLong with jittered (non-equispaced) coordinates still ranks correctly") {
    // Round-4 regression guard: real event timestamps are NOT
    // equispaced, so any coordinate-arithmetic index
    // (round((t-cmin)/delta)) collapses distinct samples. Jitter keeps
    // the order but destroys equispacing; the result must stay
    // bit-identical to the direct convolve in rank order.
    val kernel = Array(0.25, 0.5, 0.25)
    val jittered = {
      val rows = for (k <- 0 until nSeries; i <- 0 until n)
        yield (k, i.toDouble + 0.45 * math.sin(i * 1.7 + k), x(k, i))
      new scala.util.Random(11).shuffle(rows).toDF("k", "t", "v").repartition(16)
    }
    val out = Signal.convolveLong(jittered, Seq("k"), "t", "v", kernel,
      chunkSize = 512, method = "direct")
    for (k <- Seq(0, 6)) {
      val want = Conv.convolve(series(k), kernel, "full", "direct")
      val got = byK(out, k, "value")
      assert(got.length == n + 2, s"k=$k length ${got.length}")
      assert(got.indices.forall(i => got(i) == want(i)), s"k=$k")
    }
  }

  test("convolveLong with duplicate coordinates ranks by (coord, value) like seriesify") {
    // every 16th coordinate is duplicated (two samples share t); the
    // direct path sorts struct(c, v) lexicographically, so the chunked
    // path's rank window must tie-break on value the same way or the
    // chunk contents diverge nondeterministically
    val kernel = Array(0.5, 0.3, 0.2)
    val dup = {
      val rows = for (k <- 0 until 2; i <- 0 until 1024)
        yield (k, (i - (i % 16) / 15).toDouble, x(k, i))
      new scala.util.Random(17).shuffle(rows).toDF("k", "t", "v").repartition(16)
    }
    val kdf = kernel.zipWithIndex.map { case (w, i) => (i.toDouble, w) }
      .toSeq.toDF("t", "v")
    val direct = Signal.convolve(dup, kdf, Seq("k"), "t", "v")
    val chunked = Signal.convolveLong(dup, Seq("k"), "t", "v", kernel,
      chunkSize = 128, method = "direct")
    for (k <- 0 until 2) {
      val want = byK(direct, k, "value")
      val got = byK(chunked, k, "value")
      assert(got.length == want.length, s"k=$k")
      assert(got.indices.forall(i => got(i) == want(i)), s"k=$k")
    }
  }

  test("welchLong matches the single-kernel welch across chunk geometries") {
    import graft.dsp.{Resample, Spectral}
    val nperseg = 64
    val hann = Resample.periodicWindow("hann", nperseg)
    for (chunkSize <- Seq(64, 100, 512, 4096, 5000)) {
      // 64 = minimum legal (chunk == segment); 100 = hop-misaligned
      // boundaries; 4096 = single chunk; 5000 = chunk > series
      val out = Signal.welchLong(longDf, Seq("k"), "t", "v",
        nperseg = nperseg, fs = 2.0, chunkSize = chunkSize)
      for (k <- Seq(0, 7)) {
        val want = Spectral.welch(series(k), nperseg, nperseg / 2, hann, fs = 2.0)
        val got = byK(out, k, "psd")
        assert(got.length == want.length, s"chunk=$chunkSize k=$k")
        got.indices.foreach(i => assert(
          math.abs(got(i) - want(i)) < 1e-9 * math.max(1.0, math.abs(want(i))),
          s"chunk=$chunkSize k=$k bin=$i: ${got(i)} vs ${want(i)}"))
      }
    }
    // derived fs (equispaced coords, delta=1 -> fs=1) agrees too
    val derived = Signal.welchLong(longDf, Seq("k"), "t", "v",
      nperseg = nperseg, chunkSize = 512)
    val wantD = Spectral.welch(series(2), nperseg, nperseg / 2, hann, fs = 1.0)
    val gotD = byK(derived, 2, "psd")
    gotD.indices.foreach(i => assert(
      math.abs(gotD(i) - wantD(i)) < 1e-9 * math.max(1.0, math.abs(wantD(i)))))
    // a series shorter than nperseg drops (welch's filter), never a
    // 0/0 NaN row
    val short = (0 until 10).map(i => (99, i.toDouble, 1.0)).toDF("k", "t", "v")
    assert(Signal.welchLong(short, Seq("k"), "t", "v",
      nperseg = nperseg, fs = 2.0, chunkSize = 512).count() == 0)
  }

  test("sosfiltfilt on 4096-sample series matches the kernel") {
    val sos = Design.cheby1Sos(8, 0.05, 0.2)
    val out = Signal.sosfiltfilt(sos, longDf, Seq("k"), "t", "v")
    val want = Filt.sosfiltfilt(sos, series(3))
    val got = byK(out, 3, "value")
    assert(got.length == n)
    assert(got.indices.forall(i => math.abs(got(i) - want(i)) < 1e-9))
  }
}
