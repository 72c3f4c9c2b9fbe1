package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Ann

/** ×100 decade probe: the ANN-backed mutual kNN graph WITHOUT the
  * exact n² baseline — the production path emb_knn_graph_ivfpq gates.
  * `tools/run.sh graft.tools.GraphProbe [sfDir]`
  */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_scale/x100"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-26s ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val nodes = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") % 10 === 0)
      .select(col("vec_id"), col("embedding"))
    println("nodes: " + nodes.count())
    for ((nc, np) <- Seq((32, 8), (128, 8), (128, 16))) {
      val edges = t(s"ann graph nc=$nc np=$np") {
        val cents = Ann.kmeansFit(nodes, "vec_id", "embedding", k = nc, iters = 2)
        val short = Ann.topkIvfPq(nodes,
          nodes.select(col("vec_id"), col("embedding")), "vec_id", "embedding",
          k = 32, nProbe = np, nSub = 8, kSub = 16, iters = 2,
          centroids = Some(cents))
        val g = Ann.knnGraphFrom(
          Ann.rerankExact(short, nodes, "vec_id", "embedding", k = 4))
        g.count()
      }
      println(s"ann edges nc=$nc np=$np: " + edges)
    }
    spark.stop()
  }
}
