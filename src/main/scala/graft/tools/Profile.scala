package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the dedup hotspot queries. */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.Functions.install(spark)

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val embs = graft.Tables.load(spark, dir, "embeddings")
    time("emb scan")(embs.count())
    val q = embs.filter(col("vec_id") < 10)
    val bf = graft.operators.Ann.topkBruteForce(embs, q, "vec_id", "embedding", 5)
    time("topkBruteForce plan")(bf.queryExecution.executedPlan)
    time("topkBruteForce run")(bf.count())
    time("topkBruteForce warm")(
      graft.operators.Ann.topkBruteForce(embs, q, "vec_id", "embedding", 5).count())

    val docs = graft.Tables.load(spark, dir, "documents")
    time("warm scan")(docs.count())
    val sh = graft.operators.Dedup.shingleFrame(docs, "doc_id", "text")
    time("shingleFrame")(sh.count())
    time("shingleFrame warm")(sh.count())
    time("words only")(docs.select(explode(split(lower(col("text")), "\\s+"))).count())
    val mh = graft.operators.Dedup.minhash(sh, "doc_id", 12)
    time("minhash")(mh.count())
    val bd = graft.operators.Dedup.bands(mh, "doc_id", 12, 3)
    time("bands")(bd.count())
    val cand = graft.operators.Dedup.minhashCandidates(docs, "doc_id", "text")
    time("candidates e2e")(cand.count())
    time("candidates warm")(cand.count())
    time("mh+bands warm")(bd.count())
    time("ngramJaccard e2e")(
      graft.operators.Dedup.ngramJaccard(docs, "doc_id", "text", 0.8).count())
    time("ngramJaccard warm")(
      graft.operators.Dedup.ngramJaccard(docs, "doc_id", "text", 0.8).count())
    if (args.length > 1) cand.explain("formatted")
    spark.stop()
  }
}
