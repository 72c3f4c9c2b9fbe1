package graft.tools
import org.apache.spark.sql.SparkSession

/** Dump ONE (or a few) SparkEntry queries + the full oracle_sql.json
  * in the graft.Verify output layout, so `tools/check.py --skip-verify
  * <names...>` can gate a single new query locally without re-running
  * the whole suite:
  * `tools/run.sh graft.tools.VerifyOne <sfDir> <outDir> <query>...`
  */
object VerifyOne {
  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println("usage: VerifyOne <sfDir> <outDir> <query>...")
      sys.exit(2)
    }
    val sfDir = args(0)
    val outDir = args(1)
    // Guard against the pre-round-11 arg order (<outDir> <sfDir>): an
    // old invocation would silently write query output INTO the
    // dataset directory. The sf dir must look like a testdata dir.
    if (!new java.io.File(sfDir, "events.parquet").exists()) {
      System.err.println(
        s"arg order check: $sfDir has no events.parquet — expected " +
          "<sfDir> <outDir> <query>... (sfDir first)")
      sys.exit(2)
    }
    val names = args.drop(2).toSeq
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    if (unknown.nonEmpty) {
      System.err.println(s"unknown queries: ${unknown.mkString(", ")}")
      sys.exit(2)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      graft.SparkEntry.queries(name)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      println(s"[verify-one] wrote $name")
    }
    graft.Verify.writeOracleJson(outDir)
    spark.stop()
  }
}
