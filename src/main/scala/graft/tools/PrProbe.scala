package graft.tools
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Ann

/** Stage-by-stage wall-clock breakdown of graph_pagerank_ivfpq (round-14
  * perf triage): times each pipeline stage with an eager noop write so
  * the expensive span is attributable instead of folded into the final
  * action.
  */
object PrProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prprobe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def mat(name: String, df: DataFrame): DataFrame = {
      t(name)(df.write.format("noop").mode("overwrite").save()); df
    }
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    t("baseline range.count #1")(spark.range(1000000).count())
    t("baseline range.count #2")(spark.range(1000000).count())
    val nodes = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .filter(col("vec_id") % 10 === 0)
    nodes.persist(MEMORY_AND_DISK)
    println(s"[prprobe] n nodes = ${nodes.count()}")
    t("nodes.count cached #1")(nodes.count())
    t("nodes.count cached #2")(nodes.count())
    val exact = Ann.knnGraph(nodes, "vec_id", "embedding", k = 4)
    exact.persist(MEMORY_AND_DISK)
    mat("exact knnGraph", exact)
    val cents = t("kmeansFit") {
      Ann.kmeansFit(nodes, "vec_id", "embedding",
        k = Ann.sizedCells(nodes.count()), iters = 2)
    }
    val short = Ann.topkIvfPq(nodes,
      nodes.select(col("vec_id"), col("embedding")), "vec_id", "embedding",
      k = 96, nProbe = 24, nSub = 8, kSub = 16, iters = 2,
      centroids = Some(cents))
    val short2 = t("topkIvfPq build+fit") { short.persist(MEMORY_AND_DISK); short }
    mat("topkIvfPq materialize", short2)
    val rer = Ann.rerankExact(short2, nodes, "vec_id", "embedding", k = 4)
    val ann = Ann.knnGraphFrom(rer)
    ann.persist(MEMORY_AND_DISK)
    mat("rerank+mutualize", ann)
    val exactRanks = graft.operators.Graph.pageRank(exact, "a", "b", iters = 5)
    exactRanks.persist(MEMORY_AND_DISK)
    mat("pageRank(exact)", exactRanks)
    val annRanks = graft.operators.Graph.pageRank(ann, "a", "b", iters = 5)
    annRanks.persist(MEMORY_AND_DISK)
    mat("pageRank(ann)", annRanks)
    val eHits = ann.select("a", "b")
      .join(exact.select("a", "b"), Seq("a", "b"), "left_semi")
      .agg(count(lit(1)).as("_hits"))
    val eDenom = exact.agg(count(lit(1)).as("_n"))
    val edgeGate = eHits.crossJoin(eDenom)
      .select((col("_hits") >= col("_n") * lit(0.40)).as("edge_recall_ok"))
    mat("edgeGate", edgeGate)
    def topDecile(ranks: DataFrame): DataFrame = {
      val n = ranks.count()
      val kTop = ((n + 9) / 10).toInt.max(1)
      ranks
        .agg(graft.functions.TopKAgg.topK(col("r_fp"), col("node"), kTop).as("_tk"))
        .select(explode(col("_tk")).as("_e"))
        .select(col("_e.id").as("node"))
    }
    println("[prprobe] exactRanks cached? " +
      spark.sharedState.cacheManager.lookupCachedData(
        exactRanks.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]).isDefined)
    println("[prprobe] exactRanks executed plan:\n" +
      exactRanks.queryExecution.executedPlan.toString.linesIterator.take(8).mkString("\n"))
    t("exactRanks.count cached")(println("[prprobe] count=" + exactRanks.count()))
    t("exactRanks.count cached x2")(exactRanks.count())
    mat("pageRank(exact) AGAIN", exactRanks)
    mat("topDecile(exact) alone", topDecile(exactRanks))
    mat("derived filter off exactRanks", exactRanks.filter(col("r_fp") > 0))
    val rHits = topDecile(annRanks)
      .join(topDecile(exactRanks), Seq("node"), "left_semi")
      .agg(count(lit(1)).as("_rhits"))
    val rDenom = topDecile(exactRanks).agg(count(lit(1)).as("_rn"))
    val rankGate = rHits.crossJoin(rDenom)
      .select((col("_rhits") >= col("_rn") * lit(0.40)).as("rank_agree_ok"))
    mat("rankGate", rankGate)
    val out = exactRanks.crossJoin(broadcast(edgeGate.crossJoin(rankGate)))
      .orderBy("node")
    mat("final assemble", out)
    t("end range.count #1")(spark.range(1000000).count())
    t("end range.count #2")(spark.range(1000000).count())
    t("end nodes.count cached")(nodes.count())
    spark.stop()
  }
}
