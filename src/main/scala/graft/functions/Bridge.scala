package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.dsp.{Conv, Fft, Filt, Hilbert, Peaks, Resample}

/** Static kernel entry points on Catalyst runtime types (ArrayData
  * in/out, UTF8String params). Every method here is called directly
  * from generated code (see [[DspExpr.doGenCode]]) as
  * `graft.functions.Bridge.<name>(...)` — no boxing, no closure
  * serialization, one static call per group-row.
  */
object Bridge {

  val arrD: ArrayType = ArrayType(DoubleType, containsNull = false)
  val arrI: ArrayType = ArrayType(IntegerType, containsNull = false)

  /** complex series as struct-of-arrays — mirrors the reference's
    * complex DataArray (xarray_scipy/signal.py:234-241) without boxing.
    */
  val complexT: StructType = StructType(Seq(
    StructField("re", arrD, nullable = false),
    StructField("im", arrD, nullable = false)))

  val peakWidthsT: StructType = StructType(Seq(
    StructField("widths", arrD, nullable = false),
    StructField("width_heights", arrD, nullable = false),
    StructField("left_ips", arrD, nullable = false),
    StructField("right_ips", arrD, nullable = false)))

  @inline private def d(a: ArrayData): Array[Double] = a.toDoubleArray()
  @inline private def out(a: Array[Double]): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(a)
  @inline private def c(x: Fft.C): InternalRow =
    new GenericInternalRow(Array[Any](out(x.re), out(x.im)))

  // ---- FFT family ---------------------------------------------------

  def fft(re: ArrayData, im: ArrayData, n: Int, norm: UTF8String): InternalRow =
    c(Fft.fft(d(re), d(im), n, norm.toString))

  def ifft(re: ArrayData, im: ArrayData, n: Int, norm: UTF8String): InternalRow =
    c(Fft.ifft(d(re), d(im), n, norm.toString))

  def rfft(x: ArrayData, n: Int, norm: UTF8String): InternalRow =
    c(Fft.rfft(d(x), n, norm.toString))

  def irfft(re: ArrayData, im: ArrayData, n: Int, norm: UTF8String): ArrayData =
    out(Fft.irfft(d(re), d(im), n, norm.toString))

  def hfft(re: ArrayData, im: ArrayData, n: Int, norm: UTF8String): ArrayData =
    out(Fft.hfft(d(re), d(im), n, norm.toString))

  def ihfft(x: ArrayData, n: Int, norm: UTF8String): InternalRow =
    c(Fft.ihfft(d(x), n, norm.toString))

  def fftfreq(n: Int, delta: Double): ArrayData = out(Fft.fftfreq(n, delta))

  def rfftfreq(n: Int, delta: Double): ArrayData = out(Fft.rfftfreq(n, delta))

  def fftshift(x: ArrayData): ArrayData = out(Fft.fftshift(d(x)))

  def ifftshift(x: ArrayData): ArrayData = out(Fft.ifftshift(d(x)))

  // ---- convolution --------------------------------------------------

  def convolve(a: ArrayData, b: ArrayData, mode: UTF8String, method: UTF8String): ArrayData =
    out(Conv.convolve(d(a), d(b), mode.toString, method.toString))

  def correlate(a: ArrayData, b: ArrayData, mode: UTF8String, method: UTF8String): ArrayData =
    out(Conv.correlate(d(a), d(b), mode.toString, method.toString))

  // ---- filtering ----------------------------------------------------

  def sosfilt(sos: ArrayData, x: ArrayData): ArrayData =
    out(Filt.sosfilt(d(sos), d(x)))

  def sosfiltfilt(sos: ArrayData, x: ArrayData, padtype: UTF8String, padlen: Int): ArrayData =
    out(Filt.sosfiltfilt(d(sos), d(x), padtype.toString, padlen))

  def lfilter(b: ArrayData, a: ArrayData, x: ArrayData): ArrayData =
    out(Filt.lfilter(d(b), d(a), d(x)))

  def filtfilt(b: ArrayData, a: ArrayData, x: ArrayData): ArrayData =
    out(Filt.filtfilt(d(b), d(a), d(x)))

  // ---- spectral / rate ----------------------------------------------

  def hilbert(x: ArrayData, n: Int): InternalRow = c(Hilbert.hilbert(d(x), n))

  def envelope(x: ArrayData, n: Int): ArrayData = out(Hilbert.envelope(d(x), n))

  def resample(x: ArrayData, num: Int): ArrayData = out(Resample.resample(d(x), num))

  def decimate(x: ArrayData, q: Int, n: Int, ftype: UTF8String, zeroPhase: Boolean): ArrayData =
    out(Resample.decimate(d(x), q, n, ftype.toString, zeroPhase))

  // ---- peaks --------------------------------------------------------

  def peakWidths(x: ArrayData, peaks: ArrayData, relHeight: Double): InternalRow = {
    val xs = d(x)
    val ps = peaks.toIntArray()
    val n = ps.length
    val w = new Array[Double](n); val h = new Array[Double](n)
    val l = new Array[Double](n); val r = new Array[Double](n)
    var i = 0
    while (i < n) {
      val res = Peaks.width(xs, ps(i), relHeight)
      w(i) = res.width; h(i) = res.widthHeight; l(i) = res.leftIp; r(i) = res.rightIp
      i += 1
    }
    new GenericInternalRow(Array[Any](out(w), out(h), out(l), out(r)))
  }

  def localMaxima(x: ArrayData): ArrayData = {
    val m = Peaks.localMaxima(d(x))
    UnsafeArrayData.fromPrimitiveArray(m)
  }

  // ---- signatures for DspExpr --------------------------------------

  /** Catalyst argument/return types per bridge function; the generic
    * [[DspExpr]] uses this to type-check and to pick codegen casts.
    */
  val signatures: Map[String, (Seq[DataType], DataType)] = Map(
    "fft" -> (Seq(arrD, arrD, IntegerType, StringType) -> complexT),
    "ifft" -> (Seq(arrD, arrD, IntegerType, StringType) -> complexT),
    "rfft" -> (Seq(arrD, IntegerType, StringType) -> complexT),
    "irfft" -> (Seq(arrD, arrD, IntegerType, StringType) -> arrD),
    "hfft" -> (Seq(arrD, arrD, IntegerType, StringType) -> arrD),
    "ihfft" -> (Seq(arrD, IntegerType, StringType) -> complexT),
    "fftfreq" -> (Seq(IntegerType, DoubleType) -> arrD),
    "rfftfreq" -> (Seq(IntegerType, DoubleType) -> arrD),
    "fftshift" -> (Seq(arrD) -> arrD),
    "ifftshift" -> (Seq(arrD) -> arrD),
    "convolve" -> (Seq(arrD, arrD, StringType, StringType) -> arrD),
    "correlate" -> (Seq(arrD, arrD, StringType, StringType) -> arrD),
    "sosfilt" -> (Seq(arrD, arrD) -> arrD),
    "sosfiltfilt" -> (Seq(arrD, arrD, StringType, IntegerType) -> arrD),
    "lfilter" -> (Seq(arrD, arrD, arrD) -> arrD),
    "filtfilt" -> (Seq(arrD, arrD, arrD) -> arrD),
    "hilbert" -> (Seq(arrD, IntegerType) -> complexT),
    "envelope" -> (Seq(arrD, IntegerType) -> arrD),
    "resample" -> (Seq(arrD, IntegerType) -> arrD),
    "decimate" -> (Seq(arrD, IntegerType, IntegerType, StringType, BooleanType) -> arrD),
    "peakWidths" -> (Seq(arrD, arrI, DoubleType) -> peakWidthsT),
    "localMaxima" -> (Seq(arrD) -> arrI))

  /** Interpreted-path dispatch (mirrors the static calls codegen makes). */
  def dispatch(fn: String, a: Array[Any]): Any = fn match {
    case "fft" => fft(a(0).asInstanceOf[ArrayData], a(1).asInstanceOf[ArrayData], a(2).asInstanceOf[Int], a(3).asInstanceOf[UTF8String])
    case "ifft" => ifft(a(0).asInstanceOf[ArrayData], a(1).asInstanceOf[ArrayData], a(2).asInstanceOf[Int], a(3).asInstanceOf[UTF8String])
    case "rfft" => rfft(a(0).asInstanceOf[ArrayData], a(1).asInstanceOf[Int], a(2).asInstanceOf[UTF8String])
    case "irfft" => irfft(a(0).asInstanceOf[ArrayData], a(1).asInstanceOf[ArrayData], a(2).asInstanceOf[Int], a(3).asInstanceOf[UTF8String])
    case "hfft" => hfft(a(0).asInstanceOf[ArrayData], a(1).asInstanceOf[ArrayData], a(2).asInstanceOf[Int], a(3).asInstanceOf[UTF8String])
    case "ihfft" => ihfft(a(0).asInstanceOf[ArrayData], a(1).asInstanceOf[Int], a(2).asInstanceOf[UTF8String])
    case "fftfreq" => fftfreq(a(0).asInstanceOf[Int], a(1).asInstanceOf[Double])
    case "rfftfreq" => rfftfreq(a(0).asInstanceOf[Int], a(1).asInstanceOf[Double])
    case "fftshift" => fftshift(a(0).asInstanceOf[ArrayData])
    case "ifftshift" => ifftshift(a(0).asInstanceOf[ArrayData])
    case "convolve" => convolve(a(0).asInstanceOf[ArrayData], a(1).asInstanceOf[ArrayData], a(2).asInstanceOf[UTF8String], a(3).asInstanceOf[UTF8String])
    case "correlate" => correlate(a(0).asInstanceOf[ArrayData], a(1).asInstanceOf[ArrayData], a(2).asInstanceOf[UTF8String], a(3).asInstanceOf[UTF8String])
    case "sosfilt" => sosfilt(a(0).asInstanceOf[ArrayData], a(1).asInstanceOf[ArrayData])
    case "sosfiltfilt" => sosfiltfilt(a(0).asInstanceOf[ArrayData], a(1).asInstanceOf[ArrayData], a(2).asInstanceOf[UTF8String], a(3).asInstanceOf[Int])
    case "lfilter" => lfilter(a(0).asInstanceOf[ArrayData], a(1).asInstanceOf[ArrayData], a(2).asInstanceOf[ArrayData])
    case "filtfilt" => filtfilt(a(0).asInstanceOf[ArrayData], a(1).asInstanceOf[ArrayData], a(2).asInstanceOf[ArrayData])
    case "hilbert" => hilbert(a(0).asInstanceOf[ArrayData], a(1).asInstanceOf[Int])
    case "envelope" => envelope(a(0).asInstanceOf[ArrayData], a(1).asInstanceOf[Int])
    case "resample" => resample(a(0).asInstanceOf[ArrayData], a(1).asInstanceOf[Int])
    case "decimate" => decimate(a(0).asInstanceOf[ArrayData], a(1).asInstanceOf[Int], a(2).asInstanceOf[Int], a(3).asInstanceOf[UTF8String], a(4).asInstanceOf[Boolean])
    case "peakWidths" => peakWidths(a(0).asInstanceOf[ArrayData], a(1).asInstanceOf[ArrayData], a(2).asInstanceOf[Double])
    case "localMaxima" => localMaxima(a(0).asInstanceOf[ArrayData])
    case other => throw new IllegalArgumentException(s"unknown bridge fn: $other")
  }
}
