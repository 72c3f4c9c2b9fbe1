package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.sources.ManifestTable._

/** Cross-feature lifecycle (round 17): one table through EVERY
  * round-17 capability in sequence — bloom + constraints at create,
  * z-order recluster, predicate delete, streaming append, bin-pack,
  * restore — pinning that each commit class carries the others'
  * config and none corrupts the content. The interactions here are
  * exactly what a sequential per-feature spec cannot see.
  */
class ManifestLifecycleSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpTable(): String =
    java.nio.file.Files.createTempDirectory("graft_mlc").resolve("t").toString

  test("full lifecycle: every commit class composes; content and config survive") {
    val t = tmpTable()
    // v0: create with bloom index + constraint; a and b scrambled
    val rows = (0 until 1600).map(i =>
      (i.toLong, ((i * 37) % 1600).toDouble, ((i * 101) % 1600).toDouble, s"g-${i % 40}"))
    create(spark, t, rows.toDF("id", "a", "b", "g"), "id", 16,
      bloomFor = Seq("g"), bloomBits = 1 << 12,
      constraints = Map("a_nonneg" -> "a >= 0"))

    // v1: z-order on (a, b) — a compact, so config must carry
    compactZOrder(spark, t, Seq("a", "b"), buckets = 16)
    val s1 = readSnapshot(t, 1)
    assert(s1.bloomCols == Seq("g") && s1.constraints.keySet == Set("a_nonneg"))
    assert(s1.files.forall(_.blooms.contains("g"))) // recluster re-indexed
    val (hitA, _) = matchingFiles(t, col("a") >= 405.0 && col("a") < 795.0)
    assert(hitA.size <= 10) // z-layout prunes on a

    // v2: predicate delete of a b-band; z-layout means not all files touched
    deleteWhere(spark, t, col("b") >= 1200.0)
    val (carried2, dropped2, rewritten2) = lastDeleteWherePlan(t).get
    assert(carried2 >= 1 && carried2 + dropped2 + rewritten2 == 16,
      s"plan $carried2/$dropped2/$rewritten2")
    val survivors = rows.filterNot(_._3 >= 1200.0)
    assert(snapshot(spark, t).count() == survivors.size)
    // constraint still enforced after the delete commit
    intercept[IllegalArgumentException] {
      upsert(spark, t, Seq((5L, -1.0, 0.0, "g-0")).toDF("id", "a", "b", "g"), 4)
    }

    // v3: streaming append under the carried config (blooms built)
    // 4 buckets of ~25 rows: small enough that the later bin-pack
    // (minRows=40) selects exactly these and nothing else
    assert(appendBatch(spark, t,
      (2000 until 2100).map(i => (i.toLong, 1.0, 2.0, s"h-$i"))
        .toDF("id", "a", "b", "g"), "app", 0L, 4))
    val s3 = readSnapshot(t, 3)
    assert(s3.txns == Map("app" -> 0L) && s3.files.forall(_.blooms.contains("g")))
    // bloom probes work across z-ordered, rewritten, AND appended files
    val (hitH, totalH) = matchingFiles(t, col("g") === "h-2050")
    assert(hitH.size < totalH)
    assert(snapshotWhere(spark, t, col("g") === "h-2050").count() == 1)

    // v4: bin-pack the appended small files; z-ordered files carry by name
    val preNames = s3.files.map(_.name).toSet
    val s4 = compactSmall(spark, t, minRows = 40)
    assert(s4.version == 4)
    val carriedNames = s4.files.map(_.name).toSet.intersect(preNames)
    assert(carriedNames.nonEmpty && s4.files.size < s3.files.size)
    assert(s4.txns == Map("app" -> 0L)) // txn map survives maintenance

    // v5: restore to v2 (pre-append) — txns still carry FORWARD
    restore(t, 2)
    val s5 = readSnapshot(t, 5)
    assert(s5.op == "restore" && s5.txns == Map("app" -> 0L))
    assert(snapshot(spark, t).count() == survivors.size)
    // the replayed batch still skips after the rollback
    assert(!appendBatch(spark, t,
      Seq((9999L, 0.0, 0.0, "x")).toDF("id", "a", "b", "g"), "app", 0L, 1))

    // full-history CDC tail: replays create, delete, append, restore
    // (compacts silent) and nets out to the restored state
    val got = spark.readStream.format("graft.sources.ManifestStreamProvider")
      .option("readChangeFeed", "true").load(t)
    val chk = java.nio.file.Files.createTempDirectory("graft_mlc_chk").toString
    val acc = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    val q = got.writeStream.option("checkpointLocation", chk)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        acc.synchronized {
          acc ++= b.select("id", "_change_type").collect()
            .map(r => (r.getLong(0), r.getString(1)))
        }
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    val net = scala.collection.mutable.Map.empty[Long, Int]
    acc.foreach { case (id, ct) =>
      net(id) = net.getOrElse(id, 0) + (if (ct == "delete") -1 else 1)
    }
    val live = net.filter(_._2 > 0).keys.toSeq.sorted
    assert(live == survivors.map(_._1),
      s"CDC net state drifted: ${live.size} vs ${survivors.size}")
  }
}
