package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GramAgg

/** Embedding-matrix moment statistics — the preprocessing pass behind
  * PCA / whitening / mean-centering of a vector corpus.
  */
object Emb {

  /** PCA model: population covariance eigenpairs (descending) plus the
    * corpus mean. `vectors(c)` is the c-th principal axis; signs follow
    * [[graft.dsp.Eigen.symmetric]]'s largest-component-positive rule.
    */
  final case class PcaModel(n: Long, mean: Array[Double],
                            values: Array[Double],
                            vectors: Array[Array[Double]],
                            variances: Array[Double]) {
    def explained(c: Int): Double = values(c) / values.sum
  }

  /** Fit PCA from the ONE distributed [[GramAgg]] scan: the collect is
    * the bounded d(d+1)/2 covariance triangle (d=1024 → 4 MB), the
    * Jacobi eigendecomposition is a driver-side O(d³) on that bounded
    * matrix — the same collect-a-model shape as Ann.kmeansFit. The
    * corpus itself never leaves the executors.
    */
  def pcaFit(df: DataFrame, embCol: String, dim: Int): PcaModel = {
    val rows = covariance(df, embCol, dim).collect()
    require(rows.nonEmpty && rows.head.getLong(2) > 0,
      "pcaFit: empty corpus (no embedding rows)")
    val n = rows.head.getLong(2)
    val mean = new Array[Double](dim)
    val cov = Array.ofDim[Double](dim, dim)
    rows.foreach { r =>
      val i = r.getInt(0)
      val j = r.getInt(1)
      mean(i) = r.getDouble(3)
      mean(j) = r.getDouble(4)
      cov(i)(j) = r.getDouble(5)
      cov(j)(i) = r.getDouble(5)
    }
    val (values, vectors) = graft.dsp.Eigen.symmetric(cov)
    PcaModel(n, mean, values, vectors, Array.tabulate(dim)(i => cov(i)(i)))
  }

  /** Map-side projection onto the model's top `k` axes: appends
    * `proj` = array(⟨e − mean, v_c⟩ for c < k). With `whiten`, each
    * component divides by √λ_c so the projected corpus has unit
    * population variance per axis (sklearn's whiten=True). Pure
    * builtin zip_with/aggregate expressions on broadcast literal
    * vectors — zero shuffle, scan-bound at any corpus size.
    */
  def pcaProject(df: DataFrame, embCol: String, model: PcaModel,
                 k: Int, whiten: Boolean = false): DataFrame = {
    require(k >= 1 && k <= model.vectors.length, s"bad k=$k")
    val centered = zip_with(
      col(embCol).cast("array<double>"), typedLit(model.mean.toSeq),
      (a, b) => a - b)
    val comps: Seq[Column] = (0 until k).map { c =>
      val dot = aggregate(
        zip_with(centered, typedLit(model.vectors(c).toSeq), (a, b) => a * b),
        lit(0.0), (acc, x) => acc + x)
      // a zero-variance axis has nothing to whiten — emit 0, not x/0
      if (whiten && model.values(c) > 0) dot / math.sqrt(model.values(c))
      else if (whiten) lit(0.0)
      else dot
    }
    df.withColumn("proj", array(comps: _*))
  }

  /** Map-side per-component z-scoring against the corpus moments
    * (mean and population std from the SAME GramAgg pass the
    * covariance uses): appends `z` = (e − mean) / σ elementwise.
    * Components with σ = 0 standardize to 0 (sklearn StandardScaler's
    * constant-feature rule), not NaN.
    */
  def standardize(df: DataFrame, embCol: String, model: PcaModel): DataFrame = {
    val std = model.variances.map(v => math.sqrt(math.max(0.0, v)))
    val z = zip_with(
      zip_with(col(embCol).cast("array<double>"), typedLit(model.mean.toSeq),
        (a, b) => a - b),
      typedLit(std.toSeq),
      (num, sd) => when(sd > 0, num / sd).otherwise(lit(0.0)))
    df.withColumn("z", z)
  }

  /** Covariance (and mean) of an embedding column, as one row per
    * upper-triangle (i ≤ j) component pair:
    * cov(i,j) = Σeᵢeⱼ/n − mean(i)·mean(j) (population covariance,
    * divisor n).
    *
    * Scale shape: ONE scan with [[GramAgg]] — map-side partial buffers
    * of 1+d+d(d+1)/2 doubles, a single tiny final merge, then the
    * d(d+1)/2 output rows explode from that one aggregated row. No
    * per-component shuffle of the corpus, no explode-then-join (which
    * would move n·d² rows).
    */
  def covariance(df: DataFrame, embCol: String, dim: Int): DataFrame = {
    val g = df.agg(GramAgg.gram(col(embCol), dim).as("_g"))
    // 1-based element_at offsets into the packed buffer:
    // count at 1, sums at 2..d+1, gram(i,j) at 1+d + i·d − i(i−1)/2 + (j−i) + 1
    // i*(i-1) is even, so `div 2` is exact; all index arithmetic stays
    // integral (a `/` would silently promote to double and break
    // element_at)
    // `div` yields BIGINT; element_at wants INT
    val gramIdx =
      s"CAST(1 + $dim + i * $dim - (i * (i - 1)) div 2 + (j - i) + 1 AS INT)"
    g.select(col("_g"), explode(expr(s"sequence(0, ${dim - 1})")).as("i"))
      .select(col("_g"), col("i"),
        explode(expr(s"sequence(i, ${dim - 1})")).as("j"))
      .select(
        col("i"), col("j"),
        expr("CAST(element_at(_g, 1) AS LONG)").as("n"),
        expr("element_at(_g, i + 2) / element_at(_g, 1)").as("mean_i"),
        expr("element_at(_g, j + 2) / element_at(_g, 1)").as("mean_j"),
        expr(s"element_at(_g, $gramIdx) / element_at(_g, 1) - " +
          "(element_at(_g, i + 2) / element_at(_g, 1)) * " +
          "(element_at(_g, j + 2) / element_at(_g, 1))").as("cov"))
  }

  /** Symmetric per-vector int8 quantization — the embedding STORAGE
    * transform for ANN/retrieval indexes (4× smaller than float32,
    * 8× smaller than the float64 working form): scale = absmax/127,
    * code_i = round(x_i/scale) clamped to [-127, 127], dequant =
    * code·scale, so the elementwise error is ≤ scale/2 by
    * construction. Appends `codesCol` (array<int>) and `scaleCol`
    * (double). Pure map-side builtins — zero shuffle, scan-bound.
    *
    * Determinism across engines: the rounding runs on the fp6
    * fixed-point grid — code = floor((fp6(x/scale) + 5·10⁵)/10⁶) —
    * so an oracle replaying the identical expression gets the
    * identical code even when x/scale sits ulps from a .5 boundary
    * (the same trick every kmeans/PQ assignment here uses). A zero
    * vector (scale 0) codes to all zeros, not NaN.
    */
  def quantizeInt8(df: DataFrame, embCol: String,
                   codesCol: String = "q8",
                   scaleCol: String = "q8_scale"): DataFrame = {
    val xd = col(embCol).cast("array<double>")
    val absmax = aggregate(transform(xd, x => abs(x)), lit(0.0),
      (acc, x) => greatest(acc, x))
    val scale = absmax / lit(127.0)
    val code = (x: Column) => when(col(scaleCol) > 0,
      greatest(lit(-127), least(lit(127),
        floor((graft.Tables.fp6(x / col(scaleCol)) + lit(500000L)) /
          lit(1000000.0)).cast("int"))))
      .otherwise(lit(0))
    df.withColumn(scaleCol, scale)
      .withColumn(codesCol, transform(xd, code))
  }
}
