package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column-level distribution statistics at corpus scale. */
object Stats {

  /** Fixed-width equal-bin histogram of a numeric column. Bounds come
    * from a one-row min/max aggregate that joins back as a broadcast —
    * no driver collect — and the binning + counting is one
    * partial-aggregatable hash agg, so the whole thing is two
    * scan-shaped passes at any size. The max value clamps into the
    * last bin (the standard right-closed final edge); a constant
    * column degenerates to one bin holding everything.
    * Output: bin, lo, hi, cnt (only non-empty bins — left join a
    * spine if dense output is needed).
    */
  def histogram(df: DataFrame, valueCol: String, nBins: Int): DataFrame = {
    require(nBins >= 1, "nBins must be >= 1")
    val bounds = df.agg(
      min(col(valueCol).cast("double")).as("mn"),
      max(col(valueCol).cast("double")).as("mx"))
    val width = (col("mx") - col("mn")) / nBins
    df.select(col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)
      .crossJoin(broadcast(bounds))
      .withColumn("bin",
        when(col("mx") > col("mn"),
          least(floor((col("v") - col("mn")) / width).cast("int"), lit(nBins - 1)))
          .otherwise(lit(0)))
      .groupBy(col("bin"), col("mn"), col("mx"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("bin"),
        (col("mn") + col("bin") * ((col("mx") - col("mn")) / nBins)).as("lo"),
        (col("mn") + (col("bin") + 1) * ((col("mx") - col("mn")) / nBins)).as("hi"),
        col("cnt"))
  }
}
