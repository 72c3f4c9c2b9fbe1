package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The composed training-data pipeline a user of the library runs:
  * exact dedup → near-dup clustering → keep one per cluster →
  * quality + repetition filtering → deterministic split. Checks the
  * stages compose on the documents table shape and the output
  * invariants hold.
  */
class EndToEndPipelineSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = {
    val base = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick  brown fox jumps over the lazy dog near the river bank today"), // ws-dup of 1
      (3L, "a completely different document about signal processing on large clusters"),
      (4L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near-dup of 1
      (5L, "spam spam spam spam spam spam spam spam spam spam spam spam spam spam"),   // repetitive
      (6L, "short"),
      (7L, "yet another unique piece of text with enough words to pass the quality bar ok"))
    base.toDF("doc_id", "text")
  }

  test("dedup -> cluster -> filter -> split composes with sane invariants") {
    // 1. exact dedup: drop whitespace-normalized duplicates
    val exact = Dedup.exact(docs, "doc_id", "text").filter($"is_dup" === 0)
    assert(!exact.select("doc_id").as[Long].collect().contains(2L))

    // 2. near-dup clustering over LSH candidates; keep cluster minima
    val cand = Dedup.minhashCandidates(exact, "doc_id", "text", k = 12, r = 3)
    val clusters = Dedup.dupClusters(cand)
    val nearDups = clusters.filter($"doc_id" =!= $"cluster_id")
      .select("doc_id").as[Long].collect().toSet
    val kept = exact.join(clusters, Seq("doc_id"), "left")
      .filter($"cluster_id".isNull || $"doc_id" === $"cluster_id")
    assert(nearDups.contains(4L)) // 4 clusters with 1
    assert(!kept.select("doc_id").as[Long].collect().contains(4L))

    // 3. quality + repetition gates
    val scored = TextOps.repetitionFrame(TextOps.qualityFrame(kept, "text"), "text")
    val filtered = scored.filter($"quality" > 0.4 && $"dup_ratio" < 0.5)
    val ids = filtered.select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(5L), "repetitive doc must be filtered")
    assert(ids.contains(3L) && ids.contains(7L))

    // 4. deterministic split: stable across invocations
    val s1 = TextOps.hashSplit(filtered, "doc_id").select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    val s2 = TextOps.hashSplit(filtered, "doc_id").select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    assert(s1 == s2 && s1.nonEmpty)
    assert(s1.values.forall(Set("train", "val", "test")))
  }

  test("readme example: signal chain parses and runs") {
    val df = (0 until 64).map(i => ("s1", i.toDouble, math.sin(i * 0.2))).toDF("sensor_id", "t", "x")
    val sos = graft.dsp.Design.butterSos(4, 0.3)
    val smooth = Signal.sosfiltfilt(sos, df, Seq("sensor_id"), "t", "x")
    val spec = Signal.rfft(smooth.withColumnRenamed("value", "x"), Seq("sensor_id"), "t", "x")
    assert(spec.count() == 33)
    assert(spec.columns.toSet == Set("sensor_id", "pos", "frequency", "re", "im"))
  }
}
