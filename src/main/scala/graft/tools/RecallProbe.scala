package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Ann

/** Measurement harness: edge recall of the IVF-PQ-backed mutual kNN
  * graph vs the exact brute-force graph, per sf dir — used to pick
  * (and re-audit) the emb_knn_graph_ivfpq gate floor of 0.40. The
  * first config row (nc=sizedCells(n) np=8 it=2 sk=32) is the SHIPPED
  * query's configuration since round 13's √n default sizing; measured
  * 0.88/0.84/0.59 at sf0.001/0.01/0.1 (the old fixed nc=32 row stays
  * for comparison: 0.82/0.81/0.63).
  * `tools/run.sh graft.tools.RecallProbe [sfDir...]`
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- dirs) {
      val nodes = spark.read.parquet(s"$dir/embeddings.parquet")
        .filter(col("vec_id") % 10 === 0)
        .select(col("vec_id"), col("embedding"))
      val exact = Ann.knnGraph(nodes, "vec_id", "embedding", k = 4)
      val nExact = exact.count()
      val ncSized = Ann.sizedCells(nodes.count())
      for ((nc, np, it, shortK) <- Seq((ncSized, 8, 2, 32), (32, 8, 2, 32), (32, 8, 2, 16), (16, 4, 2, 32))) {
        val cents = Ann.kmeansFit(nodes, "vec_id", "embedding", k = nc, iters = 2)
        val short = Ann.topkIvfPq(nodes, nodes, "vec_id", "embedding",
          k = shortK, nProbe = np, nSub = 8, kSub = 16, iters = it,
          centroids = Some(cents))
        val annKnn = Ann.rerankExact(short, nodes, "vec_id", "embedding", k = 4)
        val ann = Ann.knnGraphFrom(annKnn)
        val nAnn = ann.count()
        val hits = ann.select("a", "b")
          .join(exact.select("a", "b"), Seq("a", "b"), "left_semi").count()
        println(f"$dir%-28s nc=$nc%2d np=$np%2d it=$it sk=$shortK%2d exactEdges=$nExact%5d annEdges=$nAnn%5d hits=$hits%5d recall=${hits.toDouble / nExact}%.3f")
      }
      // round-13 gates: flagged-set recall (emb_outliers_ivfpq) and
      // pagerank top-decile agreement (graph_pagerank_ivfpq) across
      // (nProbe, shortlistK) depth configs — kdist tails need the TRUE
      // k-th neighbor in the shortlist, so these probe deeper than the
      // mutual-graph query does
      val exOut = Ann.knnOutliers(nodes, "vec_id", "embedding", k = 4)
        .filter(col("is_outlier")).select("node")
      exOut.persist()
      val exKnn = Ann.topkBruteForce(nodes, nodes, "vec_id", "embedding", k = 4)
      exKnn.persist()
      def decile(r: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
        r.persist()
        val n = r.count()
        r.agg(graft.functions.TopKAgg.topK(col("r_fp"), col("node"),
            ((n + 9) / 10).toInt.max(1)).as("_tk"))
          .select(explode(col("_tk")).as("_e"))
          .select(col("_e.id").as("node"))
      }
      val exR = decile(graft.operators.Graph.pageRank(exact, "a", "b", iters = 5))
      exR.persist()
      for ((np, sk) <- Seq((8, 32), (16, 64), (24, 96))) {
        val cents = Ann.kmeansFit(nodes, "vec_id", "embedding", k = ncSized, iters = 2)
        val short = Ann.topkIvfPq(nodes, nodes, "vec_id", "embedding",
          k = sk, nProbe = np, nSub = 8, kSub = 16, iters = 2,
          centroids = Some(cents))
        val annKnn = Ann.rerankExact(short, nodes, "vec_id", "embedding", k = 4)
        annKnn.persist()
        val n4 = exKnn.count()
        val h4 = annKnn.select("query_id", "neighbor_id")
          .join(exKnn.select("query_id", "neighbor_id"),
            Seq("query_id", "neighbor_id"), "left_semi").count()
        val annOut = Ann.knnOutliersFrom(annKnn, k = 4)
          .filter(col("is_outlier")).select("node")
        val nOut = exOut.count()
        val oHits = annOut.join(exOut, Seq("node"), "left_semi").count()
        val annG = Ann.knnGraphFrom(annKnn)
        annG.persist()
        val eHits = annG.select("a", "b")
          .join(exact.select("a", "b"), Seq("a", "b"), "left_semi").count()
        val anR = decile(graft.operators.Graph.pageRank(annG, "a", "b", iters = 5))
        val nDec = exR.count()
        val rHits = anR.join(exR, Seq("node"), "left_semi").count()
        println(f"$dir%-28s np=$np%2d sk=$sk%2d knn4recall=${h4.toDouble / n4}%.3f edge=${eHits.toDouble / nExact}%.3f outlier=${oHits.toDouble / nOut}%.3f ($oHits/$nOut) decile=${rHits.toDouble / nDec}%.3f ($rHits/$nDec)")
      }
    }
    spark.stop()
  }
}
