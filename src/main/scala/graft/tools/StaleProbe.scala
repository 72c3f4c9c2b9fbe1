package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Ann

/** Measurement harness for ann_incremental's staleness gate: recall of
  * the frozen-base-model IVF probe (fit on vec_id % 10 != 9, queries
  * probing the full post-ingest corpus) vs the fresh exact top-3, plus
  * how many delta neighbors surface — used to pick (and re-audit) the
  * 0.40 stale_recall_ok floor. `tools/run.sh graft.tools.StaleProbe`
  */
object StaleProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- dirs) {
      val all = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      val base = all.filter(col("vec_id") % 10 =!= 9)
      val queries = all.filter(col("vec_id") < 10)
      val cents = Ann.kmeansFit(base, "vec_id", "embedding",
        k = Ann.sizedCells(base.count()), iters = 2)
      val ann = Ann.topkIvf(all, queries, "vec_id", "embedding",
        k = 3, nProbe = 4, centroids = Some(cents))
      val exact = Ann.topkBruteForce(all, queries, "vec_id", "embedding", k = 3)
      val n = exact.count()
      val hits = ann.select("query_id", "neighbor_id")
        .join(exact.select("query_id", "neighbor_id"),
          Seq("query_id", "neighbor_id"), "left_semi").count()
      val newRows = ann.filter(col("neighbor_id") % 10 === 9).count()
      println(f"$dir%-28s exact=$n%4d hits=$hits%4d staleRecall=${hits.toDouble / n}%.3f deltaNeighbors=$newRows")
    }
    spark.stop()
  }
}
