package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.sources.ManifestTable._

/** Round-18 log-format contracts: per-commit ACTION files (log bytes
  * grow with the commit's changes, not the table's file count),
  * periodic full-state checkpoints + `_last_checkpoint`, cold
  * checkpoint-plus-tail reconstruction identical to the live path,
  * O(1)-byte ts headers, and time-based vacuum retention.
  */
class ManifestLogSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpTable(): String =
    java.nio.file.Files.createTempDirectory("graft_mlg").resolve("t").toString

  private def mkTable(n: Int, buckets: Int): String = {
    val t = tmpTable()
    val df = (0 until n).map(i => (i.toLong, s"row-$i", i % 7))
      .toDF("doc_id", "text", "tag")
    create(spark, t, df, "doc_id", buckets)
    t
  }

  private def vBytes(t: String, v: Int): Long =
    new java.io.File(t, f"_log/v$v%08d.json").length()

  private def batch(lo: Long, n: Int) =
    (lo until lo + n).map(i => (i, s"app-$i", 1)).toDF("doc_id", "text", "tag")

  test("append commits write O(batch) manifest bytes, not O(table files)") {
    // 24-file create, then 1-file appends: each append's action must
    // stay small and FLAT as the table's file count grows — the exact
    // property VERDICT r17 found missing (full-list serialization)
    val t = mkTable(2400, 24)
    val v0 = vBytes(t, 0)
    (1 to 8).foreach { b =>
      assert(appendBatch(spark, t, batch(10000L + b * 100, 50), "app", b.toLong, 1))
    }
    val sizes = (1 to 8).map(v => vBytes(t, v))
    // every append action is far below the full-list v0 manifest
    sizes.foreach(sz => assert(sz * 4 < v0,
      s"append action $sz B is not << create manifest $v0 B"))
    // and does not grow as versions accumulate files
    assert(sizes.last <= sizes.head * 3 / 2,
      s"append action grew with table size: first=${sizes.head} last=${sizes.last}")
    // state is still exact: all rows present under the replayed log
    assert(snapshot(spark, t).count() == 2400L + 8 * 50)
  }

  test("checkpoints land every interval; cold reconstruction == live state") {
    val t = mkTable(200, 4)
    (1 to 12).foreach { b =>
      assert(appendBatch(spark, t, batch(5000L + b * 100, 20), "app", b.toLong, 1))
    }
    assert(new java.io.File(t, f"_log/cp${10}%08d.json").exists(),
      "no checkpoint at v10")
    val hint = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(t, "_log/_last_checkpoint").toPath)).trim.toInt
    assert(hint == 10, s"_last_checkpoint points at $hint, want 10")
    val live = readSnapshot(t, 12)
    ManifestTable.clearSnapshotCache()
    val cold = readSnapshot(t, 12) // checkpoint@10 + actions 11..12
    assert(cold == live, "cold checkpoint+tail reconstruction drifted from live")
    // an old version below the checkpoint still reconstructs (replay from v0)
    ManifestTable.clearSnapshotCache()
    assert(readSnapshot(t, 3).files.map(_.rows).sum == 200L + 3 * 20)
  }

  test("readTsFast reads the header only and matches the full parse") {
    val t = mkTable(100, 2)
    (1 to 3).foreach { b =>
      assert(appendBatch(spark, t, batch(900L + b * 10, 5), "app", b.toLong, 1))
    }
    (0 to 3).foreach { v =>
      assert(ManifestTable.readTsFast(t, v) == readSnapshot(t, v).ts,
        s"ts header mismatch at v$v")
    }
  }

  test("vacuum checkpoints the cutoff; retained window survives, older history is loud") {
    val t = mkTable(300, 3)
    (1 to 6).foreach { b =>
      assert(appendBatch(spark, t, batch(7000L + b * 10, 5), "app", b.toLong, 1))
    }
    val before = snapshot(spark, t).count()
    val dead = vacuum(t, keepVersions = 3) // keep v4..v6
    assert(dead.isEmpty, "pure appends never unreference a file")
    assert(new java.io.File(t, f"_log/cp${4}%08d.json").exists(),
      "vacuum must checkpoint the oldest retained version")
    ManifestTable.clearSnapshotCache()
    assert(snapshot(spark, t).count() == before)
    assert(readSnapshot(t, 4).files.nonEmpty) // cutoff readable cold
    intercept[Exception] { readSnapshot(t, 2) } // aged out
  }

  test("vacuumRetention drops only versions older than the window") {
    val t = mkTable(200, 2)
    // a compact makes v0's files unreferenced by later versions
    compact(spark, t, buckets = 2)
    (1 to 2).foreach { b =>
      assert(appendBatch(spark, t, batch(8000L + b * 10, 5), "app", b.toLong, 1))
    }
    val tsV1 = ManifestTable.readTsFast(t, 1)
    // retention window opens just before v1: v0 ages out, its files go
    val dead = vacuumRetention(t, retentionMs = 10L,
      nowMillis = tsV1 + 9L)
    assert(dead.nonEmpty, "v0's compacted-away files should be reclaimed")
    assert(!new java.io.File(t, f"_log/v${0}%08d.json").exists())
    (1 to 3).foreach(v => assert(readSnapshot(t, v).files.nonEmpty))
    // and a window covering everything is a no-op
    assert(vacuumRetention(t, retentionMs = Long.MaxValue / 2).isEmpty)
  }

  test("a mid-tail full-snapshot file (inexpressible diff) replays correctly") {
    val t = mkTable(100, 2)
    // force the full-render path: commit a snapshot whose txn map
    // DROPS an entry (the one delta the action grammar refuses)
    assert(appendBatch(spark, t, batch(900L, 5), "app", 1L, 1))
    val cur = readSnapshot(t, 1)
    val s2 = commit(t, Snapshot(2, "evolve", cur.keyCol, cur.files,
      cur.schemaJson, txns = Map.empty, cur.bloomCols, cur.bloomBits,
      cur.constraints))
    assert(s2.txns.isEmpty)
    ManifestTable.clearSnapshotCache()
    val cold = readSnapshot(t, 2)
    assert(cold.txns.isEmpty && cold.files.map(_.rows).sum == 105L)
    // the v2 manifest is a full snapshot (has "files"), not an action
    assert(ManifestTable.readAction(t, 2).isEmpty)
    assert(ManifestTable.readAction(t, 1).exists(_.add.size == 1))
  }

  test("startingTimestamp tails from the first commit at or after it") {
    val t = mkTable(100, 2)
    (1 to 3).foreach { b =>
      assert(appendBatch(spark, t, batch(900L + b * 10, 5), "app", b.toLong, 1))
    }
    val ts2 = ManifestTable.readTsFast(t, 2)
    val q = spark.readStream.format("graft.sources.ManifestStreamProvider")
      .option("startingTimestamp", ts2.toString)
      .load(t)
      .writeStream.format("memory").queryName("mlg_ts").trigger(
        org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    // versions 2 and 3 only: 2 appends x 5 rows
    assert(spark.table("mlg_ts").count() == 10L)
    q.stop()
    // after the last commit: loud
    val late = ManifestTable.readTsFast(t, 3) + 1
    val e = intercept[Exception] {
      spark.readStream.format("graft.sources.ManifestStreamProvider")
        .option("startingTimestamp", late.toString).load(t)
        .writeStream.format("memory").queryName("mlg_ts2").trigger(
          org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        .awaitTermination(60000)
    }
    assert(e.getMessage != null)
  }
  test("history: newest-first per-version action stats; LIMIT from the head; loud empties") {
    val t = mkTable(200, 2)                       // v0: create, 2 files
    assert(appendBatch(spark, t, batch(1000L, 30), "app", 0L, 1)) // v1: +1 file
    compact(spark, t, buckets = 1)                // v2: 1 add, 3 removes
    val h = history(t)
    assert(h.map(_._1) == Seq(2, 1, 0), "newest first")
    assert(h(2) match { case (0, _, "create", 2, 0, 200L, _) => true; case _ => false }, s"v0 row ${h(2)}")
    assert(h(1) match { case (1, _, "append", 1, 0, 30L, _) => true; case _ => false }, s"v1 row ${h(1)}")
    assert(h(0) match { case (2, _, "compact", 1, 3, 230L, _) => true; case _ => false }, s"v2 row ${h(0)}")
    // byte metrics (round 20): logged add.size sums, positive wherever
    // files were added, and exactly the on-disk lengths
    h.foreach { row =>
      assert(row._7 > 0, s"v${row._1} bytesAdded ${row._7} not from the log")
    }
    val v1Bytes = readAction(t, 1).get.add.map(f =>
      new java.io.File(t, s"data/${f.name}").length()).sum
    assert(h(1)._7 == v1Bytes, s"v1 bytesAdded ${h(1)._7} != on-disk $v1Bytes")
    // ts strictly monotone, newest first
    assert(h.map(_._2).sliding(2).forall(p => p(0) > p(1)))
    // LIMIT bounds from the newest side
    assert(history(t, 2).map(_._1) == Seq(2, 1))
    intercept[IllegalArgumentException](history(t, 0))
  }
}
