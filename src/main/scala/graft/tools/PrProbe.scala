package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Ann

/** Stage-level timing of graph_pagerank_ivfpq (VERDICT r15 #6 / r16
  * #6: standing row drifted 7.2 → 10.0 s solo across rounds with
  * untouched operator code — find the grown stage).
  * `tools/run.sh graft.tools.PrProbe [sfDir] [reps]`
  */
object PrProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.Functions.install(spark)
    spark.range(1000).selectExpr("sum(id)").collect()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (rep <- 1 to reps) {
      println(s"rep $rep")
      import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      val nodes = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
        .filter(col("vec_id") % 10 === 0)
      nodes.persist(MEMORY_AND_DISK)
      val nNodes = t("nodes count")(nodes.count())
      val exact = Ann.knnGraph(nodes, "vec_id", "embedding", k = 4)
      exact.persist(MEMORY_AND_DISK)
      t("exact knn graph")(exact.count())
      val cents = t("kmeans fit")(Ann.kmeansFit(nodes, "vec_id", "embedding",
        k = Ann.sizedCells(nNodes), iters = 2))
      val short = Ann.topkIvfPq(nodes,
        nodes.select(col("vec_id"), col("embedding")), "vec_id", "embedding",
        k = 96, nProbe = 24, nSub = 8, kSub = 16, iters = 2,
        centroids = Some(cents))
      val ann = Ann.knnGraphFrom(
        Ann.rerankExact(short, nodes, "vec_id", "embedding", k = 4))
      ann.persist(MEMORY_AND_DISK)
      t("ivfpq shortlist+rerank")(ann.count())
      val exactRanks = t("pagerank exact")({
        val r = graft.operators.Graph.pageRank(exact, "a", "b", iters = 5)
        r.persist(MEMORY_AND_DISK); r.count(); r
      })
      t("pagerank ann")({
        val r = graft.operators.Graph.pageRank(ann, "a", "b", iters = 5)
        r.count(); r
      })
      t("gates + final sort")({
        graft.queries.Pipeline.queries("graph_pagerank_ivfpq")(spark, dir)
          .write.format("noop").mode("overwrite").save()
      })
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
