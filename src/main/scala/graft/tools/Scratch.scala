package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Scratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (sys.env.contains("STREAM_PROBE_JOBS"))
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val s = e.stageInfo
          val m = s.taskMetrics
          println(f"[stage] ${s.stageId} '${s.name.take(50)}' tasks=${s.numTasks} " +
            f"wall=${s.completionTime.getOrElse(0L) - s.submissionTime.getOrElse(0L)} ms " +
            f"exec=${m.executorRunTime} gc=${m.jvmGCTime} deser=${m.executorDeserializeTime} " +
            f"cpu=${m.executorCpuTime / 1000000}")
        }
      })
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_scale/x10"
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    val ud = graft.queries.Pipeline.compDocs(spark, dir, 3)
    t("ud.count 1")(ud.count())
    t("ud.count 2")(ud.count())
    val fit = t("fit")(graft.operators.TextOps.unigramTrainLarge(
      ud, "_cw", maxLen = 8, seedSize = 4096, targetMulti = 256,
      shrinkKeep = 0.75, finalRounds = 2))
    println(s"[scratch] uniModelBuilds after fit: ${graft.functions.Bridge.uniModelBuilds.get}")
    t("encode+digest") {
      graft.operators.TextOps.unigramEncode(ud, "_cw", fit.pieces)
        .select(col("doc_id"),
          (array_join(col("unigram_tokens"), "") ===
            regexp_replace(col("_cw"), "\\s+", "")).as("roundtrip_ok"))
        .orderBy("doc_id")
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
