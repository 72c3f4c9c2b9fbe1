package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Per-micro-batch duration breakdown for a declared streaming query
  * (optimization round 21, guide §1 "measure first"): runs the query
  * UNCHANGED via SparkEntry and prints each micro-batch's durationMs
  * map (triggerExecution, queryPlanning, getBatch, addBatch,
  * walCommit, commitOffsets) plus state-store metrics from a global
  * StreamingQueryListener — the data the Spark UI would show, with the
  * UI disabled.
  *
  * Usage: tools/run.sh graft.tools.StreamProbe <query> [sfDir] [runs]
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { System.err.println("usage: StreamProbe <query> [sfDir] [runs]"); sys.exit(2) }
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        println(s"[probe] started ${e.name} ${e.id}")
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val d = new java.util.TreeMap[String, java.lang.Long](p.durationMs)
        val ss = p.stateOperators.map(o =>
          s"rows=${o.numRowsTotal} commitMs=${o.commitTimeMs} memUsed=${o.memoryUsedBytes}").mkString(" | ")
        println(s"[probe] batch=${p.batchId} rows=${p.numInputRows} dur=$d state{$ss}")
      }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    })
    if (sys.env.contains("STREAM_PROBE_JOBS"))
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        // boxed java.lang.Long: with a Scala Long value type, remove()
        // on an absent key unboxes null and NPEs before any null check
        // can run (ADVICE r21 — and the r21 guard compared a primitive
        // to null, which scalac flags as always-true)
        private val starts = new java.util.concurrent.ConcurrentHashMap[Int, java.lang.Long]()
        override def onJobStart(e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          starts.put(e.jobId, System.nanoTime())
        override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val t0 = starts.remove(e.jobId)
          if (t0 != null)
            println(f"[job] ${e.jobId} ${(System.nanoTime() - t0.longValue()) / 1e6}%.0f ms")
        }
        override def onStageCompleted(e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val s = e.stageInfo
          val m = s.taskMetrics
          println(f"[stage] ${s.stageId} '${s.name.take(60)}' tasks=${s.numTasks} " +
            f"wall=${s.completionTime.getOrElse(0L) - s.submissionTime.getOrElse(0L)} ms " +
            f"exec=${m.executorRunTime} gc=${m.jvmGCTime} deser=${m.executorDeserializeTime} " +
            f"sRead=${m.shuffleReadMetrics.fetchWaitTime} sWrite=${m.shuffleWriteMetrics.writeTime / 1000000}")
        }
      })
    spark.range(1000).selectExpr("sum(id)").collect()
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      println(f"[probe] $name run$i total ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
