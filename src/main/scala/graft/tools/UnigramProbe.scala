package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Production-parameter unigram-fit probe (VERDICT r19 #1's "done"
  * evidence): refit [[graft.operators.TextOps.unigramTrainLarge]] at a
  * 4096-piece multi vocabulary, maxLen 8, 50k-candidate distributed
  * seed over the ×10 compound corpus, then Viterbi-encode the whole
  * corpus under the fit and report per-round stats, the monotonicity
  * gate, roundtrip coverage, and wall times as one JSON line.
  *
  *   tools/run.sh graft.tools.UnigramProbe [sfDir] [targetMulti]
  */
object UnigramProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_scale/x10")
    val target = if (args.length > 1) args(1).toInt else 4096
    val ngram = if (args.length > 2) args(2).toInt else 4
    val seedSize = if (args.length > 3) args(3).toInt else 50000
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ud = graft.queries.Pipeline.compDocs(spark, sfDir, ngram)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nDocs = ud.count()
    val t0 = System.nanoTime()
    val fit = graft.operators.TextOps.unigramTrainLarge(ud, "_cw",
      maxLen = 8, seedSize = seedSize, targetMulti = target,
      shrinkKeep = 0.75, finalRounds = 2)
    val fitSec = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val rt = graft.operators.TextOps.unigramEncode(ud, "_cw", fit.pieces)
      .agg(count(lit(1)).as("n"),
        sum(when(array_join(col("unigram_tokens"), "") ===
          regexp_replace(col("_cw"), "\\s+", ""), 1L).otherwise(0L)).as("ok"),
        sum(size(col("unigram_tokens")).cast("long")).as("tok"))
      .collect()(0)
    val encSec = (System.nanoTime() - t1) / 1e9
    val rounds = fit.stats.map(s =>
      s"""{"round":${s.round},"n_multi":${s.nMulti},"loglik":${s.loglik},""" +
      s""""gain":${s.gain},"pruned_into":${s.vocabChanged}}""").mkString("[", ",", "]")
    def r3(x: Double) = math.round(x * 1000) / 1000.0
    println(s"""{"probe":"unigram","sf_dir":"$sfDir","docs":$nDocs,"ngram":$ngram,""" +
      s""""target_multi":$target,"n_multi":${fit.pieces.count(_._1.length > 1)},""" +
      s""""n_pieces":${fit.pieces.length},"monotone_ok":${fit.monotoneOk},""" +
      s""""total_words":${fit.totalWords},"fit_sec":${r3(fitSec)},""" +
      s""""encode_sec":${r3(encSec)},"docs_roundtrip":${rt.getLong(1)},""" +
      s""""tokens":${rt.getLong(2)},"rounds":$rounds}""")
    ud.unpersist()
    spark.stop()
  }
}
