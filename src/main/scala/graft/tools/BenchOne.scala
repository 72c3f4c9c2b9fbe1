package graft.tools
import org.apache.spark.sql.SparkSession

/** Time one SparkEntry query N times in a single warmed JVM:
  * `tools/run.sh graft.tools.BenchOne <query> [sfDir] [runs]` — the
  * per-run breakdown Bench prints for everything, on demand for one
  * query (e.g. to confirm cache-reuse behavior across repeat runs).
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: BenchOne <query> [sfDir] [runs]\n" +
        s"queries: ${graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}")
      sys.exit(2)
    }
    // comma-separated names share one warmed JVM; cache cleared
    // between queries (Bench's per-query isolation rule)
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val bad = names.filterNot(graft.SparkEntry.queries.contains)
    if (bad.nonEmpty) {
      System.err.println(s"unknown queries: ${bad.mkString(",")}; valid: " +
        graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", "))
      sys.exit(2)
    }
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (sys.env.contains("STREAM_PROBE_JOBS"))
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val s = e.stageInfo
          val m = s.taskMetrics
          val wall = s.completionTime.getOrElse(0L) - s.submissionTime.getOrElse(0L)
          if (wall >= 100) println(f"[stage] ${s.stageId} '${s.name.take(50)}' " +
            f"tasks=${s.numTasks} wall=$wall ms exec=${m.executorRunTime} " +
            f"gc=${m.jvmGCTime} cpu=${m.executorCpuTime / 1000000}")
        }
      })
    spark.range(1000).selectExpr("sum(id)").collect()
    graft.Bench.calibrate() // JIT warm-up
    println(f"cal: ${graft.Bench.calibrate()}%.3f s (single-thread ALU anchor)")
    names.foreach { name =>
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      spark.catalog.clearCache()
      println(f"$name: ${times.map(t => f"$t%.2f").mkString(", ")} (min ${times.min}%.2f)")
    }
    spark.stop()
  }
}
