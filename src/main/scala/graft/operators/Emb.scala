package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GramAgg

/** Embedding-matrix moment statistics — the preprocessing pass behind
  * PCA / whitening / mean-centering of a vector corpus.
  */
object Emb {

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
}
