package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.sources.ManifestTable._

/** The transaction-log contracts the queries rely on but their DuckDB
  * oracles can't see: atomic put-if-absent commits, copy-on-write
  * file pruning (untouched files carry BY REFERENCE), metadata-only
  * range deletes, and manifest-level scan skipping.
  */
class ManifestSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpTable(): String =
    java.nio.file.Files.createTempDirectory("graft_mt").resolve("t").toString

  private def mkTable(n: Int, buckets: Int): String = {
    val t = tmpTable()
    val df = (0 until n).map(i => (i.toLong, s"row-$i", i % 7))
      .toDF("doc_id", "text", "tag")
    create(spark, t, df, "doc_id", buckets)
    t
  }

  test("commit is put-if-absent: replaying a version throws") {
    val t = mkTable(100, 4)
    val s0 = readSnapshot(t, 0)
    intercept[java.nio.file.FileAlreadyExistsException] {
      commit(t, s0.copy(op = "rogue"))
    }
    // and the original manifest is untouched by the losing writer
    assert(readSnapshot(t, 0).op == "create")
  }

  test("create writes range-bucketed files with tight disjoint stats") {
    val t = mkTable(400, 4)
    val s0 = readSnapshot(t, 0)
    assert(s0.files.size == 4)
    assert(s0.files.map(_.rows).sum == 400L)
    // range layout → sorted by minKey, ranges do not interleave
    val sorted = s0.files.sortBy(_.minKey)
    sorted.sliding(2).foreach {
      case Seq(a, b) => assert(a.maxKey < b.minKey)
      case _ =>
    }
  }

  test("upsert rewrites ONLY key-range-overlapping files; rest carry by reference") {
    val t = mkTable(400, 4)
    val s0 = readSnapshot(t, 0)
    // delta touches keys 10..19 — inside exactly ONE of the 4 buckets
    val delta = (10 until 20).map(i => (i.toLong, s"upd-$i", 99))
      .toDF("doc_id", "text", "tag")
    upsert(spark, t, delta, buckets = 1)
    val s1 = readSnapshot(t, 1)
    val carried = s1.files.map(_.name).toSet intersect s0.files.map(_.name).toSet
    assert(carried.size == 3, s"expected 3 carried files, got ${carried.size}")
    assert(s1.files.map(_.rows).sum == 400L) // pure update, no inserts
    val got = snapshot(spark, t).filter(col("doc_id") === 15L)
      .select("text", "tag").as[(String, Int)].collect()
    assert(got.toSeq == Seq(("upd-15", 99)))
  }

  test("upsert appends new keys and replaces matched keys in one commit") {
    val t = mkTable(100, 2)
    val delta = Seq(
      (5L, "upd-5", 99), // matched → replace
      (500L, "new-500", 42), (501L, "new-501", 42) // above keyspace → insert
    ).toDF("doc_id", "text", "tag")
    upsert(spark, t, delta, buckets = 1)
    val all = snapshot(spark, t)
    assert(all.count() == 102L)
    assert(all.filter(col("doc_id") === 5L).select("text").as[String].head() == "upd-5")
    assert(all.filter(col("doc_id") >= 500L).count() == 2L)
    // no duplicate keys after the merge
    assert(all.select("doc_id").distinct().count() == 102L)
  }

  test("range delete drops fully-covered files metadata-only, rewrites boundaries") {
    val t = mkTable(400, 4) // buckets ≈ [0,99][100,199][200,299][300,399]
    val s0 = readSnapshot(t, 0)
    val b1 = s0.files.sortBy(_.minKey).apply(1)
    // delete exactly bucket 1's span plus a sliver of bucket 2
    deleteRange(spark, t, b1.minKey, b1.maxKey + 10)
    val s1 = readSnapshot(t, 1)
    assert(!s1.files.map(_.name).contains(b1.name)) // dropped, never read
    // bucket 0 and 3 carried by reference
    val sorted0 = s0.files.sortBy(_.minKey)
    assert(s1.files.map(_.name).toSet.contains(sorted0(0).name))
    assert(s1.files.map(_.name).toSet.contains(sorted0(3).name))
    val left = snapshot(spark, t)
    assert(left.count() == 400L - (b1.rows + 10))
    assert(left.filter(col("doc_id").between(b1.minKey, b1.maxKey + 10)).count() == 0L)
  }

  test("snapshotRange prunes at the manifest before Spark sees a path") {
    val t = mkTable(400, 4)
    val full = snapshot(spark, t)
    val pruned = snapshotRange(spark, t, 150, 160)
    assert(pruned.inputFiles.length < full.inputFiles.length)
    assert(pruned.inputFiles.length == 1)
    assert(pruned.count() == 11L)
  }

  test("compact rewrites the layout as a commit; old versions still read") {
    val t = mkTable(400, 8)
    val before = snapshot(spark, t).orderBy("doc_id")
      .as[(Long, String, Int)].collect().toSeq
    compact(spark, t, buckets = 2)
    val s1 = readSnapshot(t, 1)
    assert(s1.op == "compact" && s1.files.size == 2)
    val after = snapshot(spark, t).orderBy("doc_id")
      .as[(Long, String, Int)].collect().toSeq
    assert(after == before)
    // pre-compaction version remains readable until vacuumed
    assert(snapshot(spark, t, Some(0)).count() == 400L)
  }

  test("vacuum deletes only files unreferenced by the kept window") {
    val t = mkTable(200, 4)
    // v1: upsert touching one bucket — 3 files are SHARED between v0 and v1
    upsert(spark, t, Seq((5L, "x", 1)).toDF("doc_id", "text", "tag"), 1)
    val v0Files = readSnapshot(t, 0).files.map(_.name).toSet
    val v1Files = readSnapshot(t, 1).files.map(_.name).toSet
    val dead = vacuum(t, keepVersions = 1)
    // exactly the v0-only file(s) died; shared files survived
    assert(dead.toSet == (v0Files -- v1Files))
    val dataDir = new java.io.File(t, "data")
    val onDisk = dataDir.listFiles().map(_.getName).toSet
    assert(v1Files.subsetOf(onDisk))
    assert((v0Files -- v1Files).forall(!onDisk.contains(_)))
    // v0 manifest is gone; latest still reads completely
    assert(!new java.io.File(t, f"_log/v${0}%08d.json").exists())
    assert(snapshot(spark, t).count() == 200L)
    intercept[Exception] { readSnapshot(t, 0) }
  }

  test("upsert rejects a delta with duplicate keys (Delta MERGE contract)") {
    val t = mkTable(100, 2)
    val dup = Seq((5L, "a", 1), (5L, "b", 2)).toDF("doc_id", "text", "tag")
    val e = intercept[IllegalArgumentException] { upsert(spark, t, dup, 1) }
    assert(e.getMessage.contains("duplicate keys"))
    assert(latestVersion(t) == 0) // nothing committed
  }

  test("schema rides in the manifest; empty snapshot reads with it") {
    val t = mkTable(100, 2)
    val s0 = readSnapshot(t, 0)
    assert(schemaOf(s0).exists(_.fieldNames.toSeq == Seq("doc_id", "text", "tag")))
    // delete everything → empty snapshot still reads, schema intact
    deleteRange(spark, t, 0, 1000)
    val empty = snapshot(spark, t)
    assert(empty.count() == 0L)
    assert(empty.columns.toSeq == Seq("doc_id", "text", "tag"))
  }

  test("addColumns is a metadata-only evolution commit; old files read NULL") {
    val t = mkTable(100, 2)
    val filesBefore = readSnapshot(t, 0).files.map(_.name).toSet
    addColumns(t, Seq(org.apache.spark.sql.types.StructField(
      "rating", org.apache.spark.sql.types.DoubleType)))
    val s1 = readSnapshot(t, 1)
    assert(s1.op == "evolve")
    assert(s1.files.map(_.name).toSet == filesBefore) // zero data IO
    val df = snapshot(spark, t)
    assert(df.columns.toSeq == Seq("doc_id", "text", "tag", "rating"))
    assert(df.filter(col("rating").isNull).count() == 100L)
    // a post-evolution upsert writes the new column for its rows only
    upsert(spark, t,
      Seq((5L, "upd", 9, 0.5)).toDF("doc_id", "text", "tag", "rating"), 1)
    val df2 = snapshot(spark, t)
    assert(df2.filter(col("rating").isNotNull).count() == 1L)
    assert(df2.count() == 100L)
    // duplicate column rejected
    intercept[IllegalArgumentException] {
      addColumns(t, Seq(org.apache.spark.sql.types.StructField(
        "rating", org.apache.spark.sql.types.DoubleType)))
    }
  }

  test("snapshotDiff: inserts/updates/deletes only — carried AND rewritten-unchanged rows excluded") {
    val t = mkTable(400, 4)
    // v1: update 2 keys in bucket 0, insert 2 above the keyspace —
    // bucket 0 is rewritten so its ~98 unchanged rows move files
    val delta = Seq((5L, "upd-5", 99), (6L, "upd-6", 99),
      (900L, "new-900", 1), (901L, "new-901", 1))
      .toDF("doc_id", "text", "tag")
    upsert(spark, t, delta, 1)
    val d01 = snapshotDiff(spark, t, 0, 1)
      .orderBy("doc_id").as[(Long, String, Int, String)].collect().toSeq
    assert(d01 == Seq(
      (5L, "upd-5", 99, "update"), (6L, "upd-6", 99, "update"),
      (900L, "new-900", 1, "insert"), (901L, "new-901", 1, "insert")))
    // v2: range delete [100,199] (one whole bucket) plus slivers
    deleteRange(spark, t, 100, 205)
    val d12 = snapshotDiff(spark, t, 1, 2)
    assert(d12.select("_change_type").distinct().as[String].collect().toSeq == Seq("delete"))
    assert(d12.count() == 106L)
    // diff across both commits composes
    val d02 = snapshotDiff(spark, t, 0, 2)
    assert(d02.filter(col("_change_type") === "delete").count() == 106L)
    assert(d02.filter(col("_change_type") === "insert").count() == 2L)
  }

  test("commitWithRetry re-runs the body when a REWRITE-shaped commit loses the race") {
    val t = mkTable(50, 1)
    var calls = 0
    val s = commitWithRetry(t) { v =>
      calls += 1
      if (calls == 1) {
        // simulate a concurrent winner landing v+1 before our commit
        commit(t, readSnapshot(t, v).copy(version = v + 1, op = "racer"))
      }
      // drops a base file -> NOT add-only -> no rebase, full re-run
      Snapshot(v + 1, "mine", "doc_id",
        readSnapshot(t, math.min(v, 0)).files.drop(if (calls == 1) 1 else 0),
        readSnapshot(t, 0).schemaJson)
    }
    assert(calls == 2)
    assert(s.version == 2 && readSnapshot(t, 2).op == "mine")
    assert(readSnapshot(t, 1).op == "racer")
  }

  test("commitWithRetry REBASES an add-only commit over a winner without re-running") {
    val t = mkTable(50, 2)
    val extra = FileEntry("zz-rebase.parquet", 1L, 1000L, 1000L)
    var calls = 0
    val s = commitWithRetry(t) { v =>
      calls += 1
      val cur = readSnapshot(t, v)
      if (calls == 1) {
        // the winner REMOVES one base file (a compactor shape)
        commit(t, cur.copy(version = v + 1, op = "racer",
          files = cur.files.drop(1)))
      }
      cur.copy(version = v + 1, op = "mine", files = cur.files :+ extra)
    }
    assert(calls == 1, "add-only loser must rebase, not re-run the body")
    assert(s.version == 2 && s.op == "mine")
    // rebased onto the WINNER's listing: its removal holds, our add lands
    val v2 = readSnapshot(t, 2)
    assert(v2.files.map(_.name).contains("zz-rebase.parquet"))
    assert(v2.files.length == readSnapshot(t, 1).files.length + 1)
  }

  test("rebase refuses when the winner changed table config or claimed our txn") {
    val t = mkTable(50, 1)
    var calls = 0
    commitWithRetry(t) { v =>
      calls += 1
      val cur = readSnapshot(t, v)
      if (calls == 1) {
        // winner CHANGES CONFIG (adds a constraint) -> rebase must refuse
        commit(t, cur.copy(version = v + 1, op = "racer",
          constraints = Map("c" -> "doc_id >= 0")))
      }
      cur.copy(version = v + 1, op = "mine",
        files = cur.files :+ FileEntry(s"zz-c$calls.parquet", 1L, 2000L, 2000L))
    }
    assert(calls == 2, "config drift must force a body re-run")
    // txn claim: winner records (app, batch) >= ours -> re-run (its skip logic decides)
    val t2 = mkTable(50, 1)
    var calls2 = 0
    commitWithRetry(t2) { v =>
      calls2 += 1
      val cur = readSnapshot(t2, v)
      if (calls2 == 1) {
        commit(t2, cur.copy(version = v + 1, op = "racer",
          txns = cur.txns + ("app" -> 7L)))
      }
      cur.copy(version = v + 1, op = "mine",
        files = cur.files :+ FileEntry(s"zz-t$calls2.parquet", 1L, 2000L, 2000L),
        txns = cur.txns + ("app" -> 7L))
    }
    assert(calls2 == 2, "a claimed txn must force a body re-run")
  }

  test("paced appender racing a concurrent compactor converges without IllegalState") {
    // VERDICT r18 #4's scenario: a hot table with a streaming sink
    // plus maintenance compaction. The appender's commits are
    // add-only (rebase path); the compactor's are rewrites (body
    // re-run + jittered backoff). Neither may exhaust its attempts.
    val t = mkTable(40, 2)
    val nBatches = 12
    @volatile var appErr: Throwable = null
    @volatile var cmpErr: Throwable = null
    val appender = new Thread(() => {
      try {
        for (b <- 0 until nBatches) {
          val df = Seq((1000L + b, s"app-$b", 1)).toDF("doc_id", "text", "tag")
          assert(appendBatch(spark, t, df, "race-app", b.toLong, 1))
        }
      } catch { case e: Throwable => appErr = e }
    })
    val compactor = new Thread(() => {
      try {
        for (_ <- 0 until 8) { compactSmall(spark, t, minRows = 5); Thread.sleep(3) }
      } catch { case e: Throwable => cmpErr = e }
    })
    appender.start(); compactor.start()
    appender.join(120000); compactor.join(120000)
    assert(appErr == null, s"appender failed: $appErr")
    assert(cmpErr == null, s"compactor failed: $cmpErr")
    assert(snapshot(spark, t).count() == 40L + nBatches)
    assert(snapshot(spark, t).filter(col("doc_id") >= 1000L).count() == nBatches.toLong)
  }

  // --- appendBatch: the Delta streaming-sink shape (txn action) ---

  private def listedEverywhere(t: String): Set[String] =
    (0 to latestVersion(t))
      .filter(v => new java.io.File(t, f"_log/v$v%08d.json").exists())
      .flatMap(v => readSnapshot(t, v).files.map(_.name)).toSet

  private def onDisk(t: String): Set[String] =
    Option(new java.io.File(t, "data").listFiles())
      .getOrElse(Array.empty).map(_.getName).toSet

  test("appendBatch commits monotone batches; replay skips with zero new IO") {
    val t = mkTable(100, 2)
    val b0 = Seq((500L, "s-500", 1), (501L, "s-501", 1)).toDF("doc_id", "text", "tag")
    val b1 = Seq((502L, "s-502", 2)).toDF("doc_id", "text", "tag")
    assert(appendBatch(spark, t, b0, "appA", 0L, 1))
    assert(appendBatch(spark, t, b1, "appA", 1L, 1))
    val s2 = readSnapshot(t, 2)
    assert(s2.op == "append" && s2.txns == Map("appA" -> 1L))
    assert(snapshot(spark, t).count() == 103L)
    // replay of batch 1 (the crash-between-sink-and-commit window):
    // skipped, no new version, no orphan data file
    val disk = onDisk(t)
    assert(!appendBatch(spark, t, b1, "appA", 1L, 1))
    assert(!appendBatch(spark, t, b0, "appA", 0L, 1)) // older id too
    assert(latestVersion(t) == 2)
    assert(onDisk(t) == disk)
    assert(snapshot(spark, t).count() == 103L)
  }

  test("txn map carries forward across upsert/compact/evolve/delete") {
    val t = mkTable(100, 2)
    val b0 = Seq((900L, "s", 1)).toDF("doc_id", "text", "tag")
    assert(appendBatch(spark, t, b0, "appA", 7L, 1))
    upsert(spark, t, Seq((5L, "u", 9)).toDF("doc_id", "text", "tag"), 1)
    compact(spark, t, 2)
    addColumns(t, Seq(org.apache.spark.sql.types.StructField(
      "rating", org.apache.spark.sql.types.DoubleType)))
    deleteRange(spark, t, 10, 20)
    assert(readSnapshot(t, latestVersion(t)).txns == Map("appA" -> 7L))
    // the idempotency lookup is O(1) against the LATEST manifest —
    // a replay after arbitrary maintenance still skips
    assert(!appendBatch(spark, t,
      Seq((900L, "s", 1, null.asInstanceOf[java.lang.Double]))
        .toDF("doc_id", "text", "tag", "rating"), "appA", 7L, 1))
    // a second app's ids are independent
    assert(appendBatch(spark, t,
      Seq((901L, "b", 1, java.lang.Double.valueOf(0.5)))
        .toDF("doc_id", "text", "tag", "rating"), "appB", 0L, 1))
    assert(readSnapshot(t, latestVersion(t)).txns ==
      Map("appA" -> 7L, "appB" -> 0L))
  }

  test("appendBatch rejects NULL keys and drifted column types loudly") {
    val t = mkTable(50, 1)
    val nullKey = Seq((java.lang.Long.valueOf(600L), "a", 1),
      (null.asInstanceOf[java.lang.Long], "b", 2)).toDF("doc_id", "text", "tag")
    val e1 = intercept[IllegalArgumentException] {
      appendBatch(spark, t, nullKey, "appA", 0L, 1)
    }
    assert(e1.getMessage.contains("NULL doc_id"))
    // type drift under matching names: tag int → string
    val drifted = Seq((601L, "a", "oops")).toDF("doc_id", "text", "tag")
    val e2 = intercept[IllegalArgumentException] {
      appendBatch(spark, t, drifted, "appA", 0L, 1)
    }
    assert(e2.getMessage.contains("schema mismatch"))
    assert(latestVersion(t) == 0) // nothing committed, no orphans
    assert(onDisk(t) == listedEverywhere(t))
  }

  test("zombie writers race the same batch: exactly one commits, loser leaves no orphan") {
    // the at-least-once window's worst case — two instances of the
    // SAME app replaying the SAME batch concurrently (driver failover
    // with a zombie predecessor). Loop to catch interleavings.
    for (round <- 0 until 3) {
      val t = mkTable(60, 2)
      val rows = Seq((700L + round, "z", 1)).toDF("doc_id", "text", "tag")
      val results = new java.util.concurrent.ConcurrentLinkedQueue[Boolean]
      val barrier = new java.util.concurrent.CyclicBarrier(2)
      val threads = (0 until 2).map { _ =>
        new Thread(() => {
          barrier.await()
          results.add(appendBatch(spark, t, rows, "appA", 0L, 1))
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      import scala.jdk.CollectionConverters._
      assert(results.asScala.toSeq.sorted == Seq(false, true),
        s"round $round: expected exactly one commit, got ${results.asScala}")
      assert(readSnapshot(t, latestVersion(t)).txns == Map("appA" -> 0L))
      assert(snapshot(spark, t).filter(col("doc_id") === (700L + round)).count() == 1L)
      // the loser's never-listed files were deleted, not leaked
      assert(onDisk(t) == listedEverywhere(t), s"round $round leaked orphans")
    }
  }

  test("appendBatch racing a COW upsert: both land, serial-equivalent snapshot") {
    for (round <- 0 until 3) {
      val t = mkTable(100, 2)
      val appendRows = Seq((800L, "ap", 1)).toDF("doc_id", "text", "tag")
      val delta = Seq((5L, "up", 9)).toDF("doc_id", "text", "tag")
      val barrier = new java.util.concurrent.CyclicBarrier(2)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      val t1 = new Thread(() => {
        barrier.await()
        try assert(appendBatch(spark, t, appendRows, "appA", 0L, 1))
        catch { case e: Throwable => errs.add(e) }
      })
      val t2 = new Thread(() => {
        barrier.await()
        try upsert(spark, t, delta, 1)
        catch { case e: Throwable => errs.add(e) }
      })
      t1.start(); t2.start(); t1.join(); t2.join()
      assert(errs.isEmpty, s"round $round: ${errs.peek()}")
      // versions are sequential (1 and 2 in either order), snapshot
      // equals the serial execution, and no data file leaked
      assert(latestVersion(t) == 2)
      val fin = snapshot(spark, t)
      assert(fin.count() == 101L)
      assert(fin.filter(col("doc_id") === 5L).select("text")
        .as[String].head() == "up")
      assert(fin.filter(col("doc_id") === 800L).count() == 1L)
      assert(readSnapshot(t, 2).txns == Map("appA" -> 0L))
      assert(onDisk(t) == listedEverywhere(t), s"round $round leaked orphans")
    }
  }

  test("two racing COW upserts on disjoint keys: both land via retry, serial-equivalent") {
    for (round <- 0 until 3) {
      val t = mkTable(100, 2)
      val d1 = Seq((5L, "a", 1)).toDF("doc_id", "text", "tag")
      val d2 = Seq((95L, "b", 2)).toDF("doc_id", "text", "tag")
      val barrier = new java.util.concurrent.CyclicBarrier(2)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      val mk = (d: org.apache.spark.sql.DataFrame) => new Thread(() => {
        barrier.await()
        try upsert(spark, t, d, 1)
        catch { case e: Throwable => errs.add(e) }
      })
      val ts = Seq(mk(d1), mk(d2))
      ts.foreach(_.start()); ts.foreach(_.join())
      assert(errs.isEmpty, s"round $round: ${errs.peek()}")
      assert(latestVersion(t) == 2)
      val fin = snapshot(spark, t)
      assert(fin.count() == 100L)
      assert(fin.filter(col("doc_id") === 5L).select("text").as[String].head() == "a")
      assert(fin.filter(col("doc_id") === 95L).select("text").as[String].head() == "b")
      assert(fin.select("doc_id").distinct().count() == 100L)
      assert(onDisk(t) == listedEverywhere(t), s"round $round leaked orphans")
    }
  }

  test("create from an empty frame: schema'd v0, appendBatch bootstraps the table") {
    // the streaming-sink bootstrap shape: v0 is an empty snapshot
    // carrying only the schema; the first micro-batch appends into it
    val t = tmpTable()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    create(spark, t,
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        schema), "doc_id", 2)
    val s0 = readSnapshot(t, 0)
    assert(s0.files.isEmpty && schemaOf(s0).contains(schema))
    assert(snapshot(spark, t).count() == 0L)
    assert(appendBatch(spark, t,
      Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text"), "appA", 0L, 1))
    assert(snapshot(spark, t).orderBy("doc_id")
      .as[(Long, String)].collect().toSeq == Seq((1L, "a"), (2L, "b")))
  }

  test("snapshotDiff over an append version is exactly that batch as inserts") {
    val t = mkTable(100, 2)
    val b0 = Seq((500L, "s-500", 1), (501L, "s-501", 2)).toDF("doc_id", "text", "tag")
    appendBatch(spark, t, b0, "appA", 0L, 1)
    val d = snapshotDiff(spark, t, 0, 1).orderBy("doc_id")
      .as[(Long, String, Int, String)].collect().toSeq
    assert(d == Seq((500L, "s-500", 1, "insert"), (501L, "s-501", 2, "insert")))
  }

  test("time travel: v0 is byte-stable across later commits") {
    val t = mkTable(200, 4)
    val before = snapshot(spark, t, Some(0)).orderBy("doc_id")
      .as[(Long, String, Int)].collect().toSeq
    upsert(spark, t, Seq((7L, "x", 1)).toDF("doc_id", "text", "tag"), 1)
    deleteRange(spark, t, 50, 90)
    val after = snapshot(spark, t, Some(0)).orderBy("doc_id")
      .as[(Long, String, Int)].collect().toSeq
    assert(after == before)
    assert(latestVersion(t) == 2)
  }

  test("in-commit timestamps are strictly monotone; versionAsOf resolves exactly") {
    val t = mkTable(50, 1)
    // rapid-fire commits force clock ties: the max(now, parent+1)
    // clamp must keep ts strictly increasing anyway
    (0 until 5).foreach(b => appendBatch(spark, t,
      Seq((1000L + b, s"b$b", 0)).toDF("doc_id", "text", "tag"), "a", b.toLong, 1))
    val ts = (0 to 5).map(v => readSnapshot(t, v).ts)
    assert(ts.forall(_ > 0) && ts.sliding(2).forall(p => p(0) < p(1)),
      s"not strictly monotone: $ts")
    // exact hit, between-versions, after-latest, before-create
    assert(versionAsOf(t, ts(3)) == 3)
    assert(versionAsOf(t, ts(3) - 1) <= 2) // strictly before v3's stamp
    assert(versionAsOf(t, Long.MaxValue) == 5)
    val e = intercept[IllegalArgumentException] { versionAsOf(t, ts(0) - 1) }
    assert(e.getMessage.contains("predates"))
    // content resolution matches the version read
    assert(snapshotAsOf(spark, t, ts(2)).count() ==
      snapshot(spark, t, Some(2)).count())
    // vacuumed history: a timestamp older than the retained window is loud
    compact(spark, t, 1); compact(spark, t, 1)
    vacuum(t, keepVersions = 2)
    intercept[IllegalArgumentException] { versionAsOf(t, ts(0)) }
    assert(versionAsOf(t, Long.MaxValue) == latestVersion(t))
  }

  test("restore re-lists the old version verbatim: metadata-only rollback") {
    val t = mkTable(200, 4)
    upsert(spark, t, Seq((7L, "x", 1)).toDF("doc_id", "text", "tag"), 1)
    deleteRange(spark, t, 50, 90)
    val v1Files = readSnapshot(t, 1).files
    val dataBefore = new java.io.File(t, "data").listFiles().map(_.getName).toSet
    val s = restore(t, 1)
    assert(s.version == 3 && s.op == "restore")
    // exact old file list, and NO new data file was written
    assert(s.files == v1Files)
    assert(new java.io.File(t, "data").listFiles().map(_.getName).toSet == dataBefore)
    // content equals v1's exactly (the deleted band is back, the
    // upserted row stays upserted)
    val v1 = snapshot(spark, t, Some(1)).orderBy("doc_id")
      .as[(Long, String, Int)].collect().toSeq
    val now = snapshot(spark, t).orderBy("doc_id")
      .as[(Long, String, Int)].collect().toSeq
    assert(now == v1 && now.exists(_ == (7L, "x", 1)))
    // the rolled-back state (v2) still time-travels
    assert(snapshot(spark, t, Some(2)).count() == v1.size - 41)
  }

  test("restore: txns carry FORWARD; schema and bloom config restore BACK") {
    val t = tmpTable()
    create(spark, t, (0 until 100).map(i => (i.toLong, s"v$i")).toDF("doc_id", "text"),
      "doc_id", 2, bloomFor = Seq("text"), bloomBits = 1 << 10)
    assert(appendBatch(spark, t,
      Seq((200L, "b0")).toDF("doc_id", "text"), "app", 0L, 1))
    addColumns(t, Seq(org.apache.spark.sql.types.StructField(
      "extra", org.apache.spark.sql.types.DoubleType)))
    setBloomIndex(t, Seq("doc_id"), bloomBits = 1 << 11)
    val s = restore(t, 1) // before the evolve and the index change
    assert(schemaOf(s).get.fieldNames.toSeq == Seq("doc_id", "text"))
    assert(s.bloomCols == Seq("text") && s.bloomBits == (1 << 10))
    // the stream's idempotency ledger survived the rollback
    assert(!appendBatch(spark, t, Seq((300L, "x")).toDF("doc_id", "text"), "app", 0L, 1))
    assert(snapshot(spark, t).count() == 101)
  }

  test("restore preconditions are loud: bad target, vacuumed files") {
    val t = mkTable(100, 2)
    intercept[IllegalArgumentException] { restore(t, 5) }
    // age v0 out of the retention window, then try to restore to it
    compact(spark, t, 1)
    compact(spark, t, 1)
    vacuum(t, keepVersions = 1)
    val e = intercept[IllegalStateException] { restore(t, 0) }
    assert(e.getMessage.contains("retention window"), e.getMessage)
  }
}
