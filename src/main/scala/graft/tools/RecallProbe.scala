package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Ann

/** Measurement harness: edge recall of the IVF-PQ-backed mutual kNN
  * graph vs the exact brute-force graph, per sf dir — used to pick
  * (and re-audit) the emb_knn_graph_ivfpq gate floor of 0.40. The
  * first config row (nc=32 np=8 it=2 sk=32) is the SHIPPED query's
  * configuration; measured 0.82/0.81/0.63 at sf0.001/0.01/0.1.
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
      for ((nc, np, it, shortK) <- Seq((32, 8, 2, 32), (32, 8, 2, 16), (16, 4, 2, 32))) {
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
    }
    spark.stop()
  }
}
