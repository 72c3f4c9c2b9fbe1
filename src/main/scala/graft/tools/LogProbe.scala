package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Commit-cost-vs-version-count probe (round 18): builds a manifest
  * table with a wide file count, then streams single-bucket appends
  * and prints, at checkpoints along the way, the APPEND's wall time
  * and its manifest-file bytes. Under the r17 full-list log both grew
  * with the table's file count; under the action log both must stay
  * flat. One JSON line per sample:
  *   {"version":N,"tableFiles":F,"commitMs":T,"actionBytes":B}
  */
object LogProbe {
  def main(args: Array[String]): Unit = {
    val nAppends = args.headOption.map(_.toInt).getOrElse(200)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val t = java.nio.file.Files.createTempDirectory("graft_logprobe")
      .resolve("t").toString
    val base = (0 until 60000).map(i => (i.toLong, s"row-$i")).toDF("k", "v")
    graft.sources.ManifestTable.create(spark, t, base, "k", buckets = 48)
    val sample = Set(1, 10, 50, 100, 150, nAppends)
    (1 to nAppends).foreach { b =>
      val df = Seq((1000000L + b, s"app-$b")).toDF("k", "v")
      val t0 = System.nanoTime()
      val ok = graft.sources.ManifestTable.appendBatch(
        spark, t, df, "probe", b.toLong, buckets = 1)
      val ms = (System.nanoTime() - t0) / 1e6
      require(ok)
      if (sample(b)) {
        val snap = graft.sources.ManifestTable.readSnapshot(
          t, graft.sources.ManifestTable.latestVersion(t))
        val bytes = new java.io.File(t, f"_log/v$b%08d.json").length()
        println(f"""{"version":$b,"tableFiles":${snap.files.size},"commitMs":${ms}%.1f,"actionBytes":$bytes}""")
      }
    }
    spark.stop()
  }
}
