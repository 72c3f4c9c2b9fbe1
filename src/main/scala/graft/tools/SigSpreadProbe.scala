package graft.tools
import org.apache.spark.sql.SparkSession

/** In-JVM A/B of the seriesify/gridify keyed spread (round 22): runs
  * each query alternating the `graft.sig.spread` system property so
  * host drift cancels out of the comparison.
  * `tools/run.sh graft.tools.SigSpreadProbe <q,q,...> [sfDir] [reps]`
  */
object SigSpreadProbe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 4
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    graft.Bench.calibrate()
    println(f"cal: ${graft.Bench.calibrate()}%.3f s")
    for (name <- names) {
      val on = collection.mutable.ArrayBuffer.empty[Double]
      val off = collection.mutable.ArrayBuffer.empty[Double]
      for (r <- 1 to reps; flag <- Seq("true", "false")) {
        System.setProperty("graft.sig.spread", flag)
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        (if (flag == "true") on else off) += dt
        spark.catalog.clearCache()
      }
      println(f"$name spread=on : ${on.map(t => f"$t%.2f").mkString(", ")} (min ${on.min}%.2f)")
      println(f"$name spread=off: ${off.map(t => f"$t%.2f").mkString(", ")} (min ${off.min}%.2f)")
    }
    spark.stop()
  }
}
