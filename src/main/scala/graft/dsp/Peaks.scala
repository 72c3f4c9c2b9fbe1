package graft.dsp

/** Peak prominence and width measurement matching
  * `scipy.signal.peak_widths` / `peak_prominences` as wrapped by the
  * reference (xarray_scipy/signal.py:330-371): peaks are caller-
  * provided sample indices; widths are measured at
  * `rel_height` of the prominence and linearly interpolated between
  * samples.
  */
object Peaks {

  final case class Prominence(prominence: Double, leftBase: Int, rightBase: Int)
  final case class Width(width: Double, widthHeight: Double, leftIp: Double, rightIp: Double)

  /** scipy.signal.peak_prominences: walk outward from the peak to the
    * first higher sample (or the signal edge); the base on each side
    * is the lowest point in that stretch. `wlen >= 2` limits the
    * evaluated area to peak ± wlen/2 (scipy's window rule: i_min =
    * max(peak - wlen//2, 0), i_max = min(peak + wlen//2, n-1)).
    */
  def prominence(x: Array[Double], peak: Int, wlen: Int = -1): Prominence = {
    val n = x.length
    require(peak >= 0 && peak < n, s"peak index $peak out of range")
    var iMin = 0
    var iMax = n - 1
    if (wlen >= 2) {
      iMin = math.max(peak - wlen / 2, iMin)
      iMax = math.min(peak + wlen / 2, iMax)
    }
    val hp = x(peak)
    var leftMin = hp; var leftBase = peak
    var i = peak
    while (i >= iMin && x(i) <= hp) {
      if (x(i) < leftMin) { leftMin = x(i); leftBase = i }
      i -= 1
    }
    var rightMin = hp; var rightBase = peak
    i = peak
    while (i <= iMax && x(i) <= hp) {
      if (x(i) < rightMin) { rightMin = x(i); rightBase = i }
      i += 1
    }
    Prominence(hp - math.max(leftMin, rightMin), leftBase, rightBase)
  }

  /** scipy.signal.peak_widths for one peak at `rel_height` of its
    * prominence (default 0.5 = FWHM when prominence spans the full
    * peak height). `wlen` is forwarded to the prominence search;
    * `promData` (scipy's `prominence_data` kwarg) skips it entirely.
    */
  def width(x: Array[Double], peak: Int, relHeight: Double = 0.5,
            wlen: Int = -1, promData: Prominence = null): Width = {
    require(relHeight >= 0, s"rel_height must be >= 0: $relHeight")
    val p = if (promData != null) promData else prominence(x, peak, wlen)
    val height = x(peak) - p.prominence * relHeight
    // left intersection
    var i = peak
    while (p.leftBase < i && height < x(i)) i -= 1
    var leftIp = i.toDouble
    if (x(i) < height) leftIp += (height - x(i)) / (x(i + 1) - x(i))
    // right intersection
    i = peak
    while (i < p.rightBase && height < x(i)) i += 1
    var rightIp = i.toDouble
    if (x(i) < height) rightIp -= (height - x(i)) / (x(i - 1) - x(i))
    Width(rightIp - leftIp, height, leftIp, rightIp)
  }

  /** scipy.signal.find_peaks with its three most-used filters, applied
    * in scipy's order: `height` (absolute sample floor), then
    * `distance` (scipy's greedy rule: walk peaks from highest to
    * lowest, erase any unkept neighbor closer than `distance`; ties
    * resolve by index order of the stable sort), then `prominence`
    * (floor on [[prominence]] with the optional wlen window). NaN
    * height/prominence and distance <= 1 mean "no filter", matching
    * scipy's None.
    */
  def findPeaksFiltered(x: Array[Double], height: Double = Double.NaN,
                        distance: Int = 1, promMin: Double = Double.NaN,
                        wlen: Int = -1, widthMin: Double = Double.NaN,
                        widthMax: Double = Double.NaN,
                        relHeight: Double = 0.5,
                        thresholdMin: Double = Double.NaN,
                        thresholdMax: Double = Double.NaN,
                        plateauMin: Int = -1,
                        plateauMax: Int = -1): Array[Int] = {
    // scipy's `plateau_size` is the FIRST filter — applied to the raw
    // local-maxima plateau extents before height ever looks at a
    // sample (scipy.signal.find_peaks filter order: plateau_size,
    // height, threshold, distance, prominence, width). <= 0 bounds
    // mean "no filter", matching scipy's None.
    var peaks =
      if (plateauMin > 0 || plateauMax > 0) {
        val (mids, lefts, rights) = localMaximaEdges(x)
        mids.indices.collect { case i
          if {
            val sz = rights(i) - lefts(i) + 1
            (plateauMin <= 0 || sz >= plateauMin) &&
              (plateauMax <= 0 || sz <= plateauMax)
          } => mids(i)
        }.toArray
      } else localMaxima(x)
    if (!height.isNaN) peaks = peaks.filter(p => x(p) >= height)
    // scipy's `threshold`: vertical drop to the IMMEDIATE neighbors —
    // scalar = a floor on min(x[p]-x[p-1], x[p]-x[p+1]), optional max
    // a ceiling on max(...); applied after height, before distance
    // (scipy's documented filter order)
    if (!thresholdMin.isNaN)
      peaks = peaks.filter(p =>
        math.min(x(p) - x(p - 1), x(p) - x(p + 1)) >= thresholdMin)
    if (!thresholdMax.isNaN)
      peaks = peaks.filter(p =>
        math.max(x(p) - x(p - 1), x(p) - x(p + 1)) <= thresholdMax)
    if (distance > 1 && peaks.length > 1) {
      // scipy's priority order: argsort ascending (stable) iterated
      // from the top — highest first, and the RIGHTMOST of exact-tied
      // heights processed first
      val order = peaks.indices.sortBy(i => x(peaks(i))).reverse
      val keep = Array.fill(peaks.length)(true)
      for (oi <- order if keep(oi)) {
        var j = oi - 1
        while (j >= 0 && peaks(oi) - peaks(j) < distance) {
          keep(j) = false
          j -= 1
        }
        j = oi + 1
        while (j < peaks.length && peaks(j) - peaks(oi) < distance) {
          keep(j) = false
          j += 1
        }
      }
      peaks = peaks.indices.filter(keep).map(peaks).toArray
    }
    if (!promMin.isNaN)
      peaks = peaks.filter(p => prominence(x, p, wlen).prominence >= promMin)
    // scipy applies `width` AFTER prominence, evaluating peak_widths at
    // rel_height with the same wlen; scalar width = a minimum, the
    // optional second bound an (inclusive) maximum
    if (!widthMin.isNaN || !widthMax.isNaN)
      peaks = peaks.filter { p =>
        val wd = width(x, p, relHeight, wlen).width
        (widthMin.isNaN || wd >= widthMin) && (widthMax.isNaN || wd <= widthMax)
      }
    peaks
  }

  /** Interior local maxima (plateaus report their left edge), the
    * "peaks" input a user would get from scipy.signal.find_peaks with
    * no filtering — a convenience for queries where peaks are not
    * precomputed.
    */
  def localMaxima(x: Array[Double]): Array[Int] = localMaximaEdges(x)._1

  /** [[localMaxima]] with the plateau extents scipy's
    * `_local_maxima_1d` also returns: (midpoints, left edges, right
    * edges), parallel arrays. plateau_size = right − left + 1.
    */
  def localMaximaEdges(x: Array[Double]): (Array[Int], Array[Int], Array[Int]) = {
    val mids = scala.collection.mutable.ArrayBuffer.empty[Int]
    val lefts = scala.collection.mutable.ArrayBuffer.empty[Int]
    val rights = scala.collection.mutable.ArrayBuffer.empty[Int]
    val n = x.length
    var i = 1
    while (i < n - 1) {
      if (x(i - 1) < x(i)) {
        // scan any plateau
        var j = i
        while (j < n - 1 && x(j + 1) == x(i)) j += 1
        if (j < n - 1 && x(j + 1) < x(i)) {
          mids += (i + j) / 2 // midpoint, matching scipy's plateau rule
          lefts += i
          rights += j
          i = j
        }
      }
      i += 1
    }
    (mids.toArray, lefts.toArray, rights.toArray)
  }
}
