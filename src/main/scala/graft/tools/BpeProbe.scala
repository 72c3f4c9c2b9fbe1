package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the byte-BPE training fast path (VERDICT r18 #6): the
  * merge loop at a PRODUCTION-SHAPED merge count (default 200) on the
  * driver histogram vs the distributed per-merge job loop, same
  * corpus, identical output asserted. Usage:
  * `tools/run.sh graft.tools.BpeProbe [sfDir] [nMerges]`.
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nMerges = if (args.length > 1) args(1).toInt else 200
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    docs.count() // warm the scan
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val (local, tLocal) = time(
      graft.operators.TextOps.bpeTrainBytes(docs, "text", nMerges))
    val (dist, tDist) = time(
      graft.operators.TextOps.bpeTrainBytes(docs, "text", nMerges,
        localThreshold = 0L))
    require(local.length == dist.length &&
      local.zip(dist).forall { case ((ll, lr, lc), (dl, dr, dc)) =>
        java.util.Arrays.equals(ll, dl) && java.util.Arrays.equals(lr, dr) && lc == dc
      }, "fast path drifted from the distributed loop")
    println(f"nMerges=$nMerges driver=$tLocal%.2fs distributed=$tDist%.2fs " +
      f"speedup=${tDist / tLocal}%.1fx (identical merges)")
    spark.stop()
  }
}
