package graft.tools
import org.apache.spark.sql.SparkSession

/** A/B probe for `spark.sql.optimizer.inferFiltersFromGenerate`
  * (optimization round 22): the rule infers `size(e) > 0 AND
  * isnotnull(e)` from every posexplode and pushes it below the
  * projection, duplicating the generator input's expression tree —
  * for the sig family that input is the expensive kernel call
  * (`graft_fftconvolve2d(...)` appears 3× in sig_fftconvolve2d_keyed's
  * plan: twice in the pushed predicate, once in the project).
  * `tools/run.sh graft.tools.InferProbe <query,query,...> [sfDir] [reps]`
  */
object InferProbe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    graft.Bench.calibrate()
    for (name <- names; flag <- Seq("true", "false", "true", "false")) {
      spark.conf.set("spark.sql.optimizer.inferFiltersFromGenerate", flag)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      spark.catalog.clearCache()
      println(f"$name infer=$flag: ${times.map(t => f"$t%.2f").mkString(", ")} (min ${times.min}%.2f)")
    }
    spark.stop()
  }
}
