package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.sources.ManifestTable._

/** Deletion-vector contracts (round 18 — the Delta DV role,
  * merge-on-read delete): straddling files carry UNMODIFIED with a
  * key-set sidecar the read anti-joins away, DV results match the
  * copy-on-write path bit-for-bit, repeated deletes merge (no
  * resurrection), appends may re-insert a deleted key without the DV
  * eating it, compaction materializes vectors away, and
  * vacuum/restore/CDC account sidecars like any other listed file.
  */
class ManifestDvSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpTable(): String =
    java.nio.file.Files.createTempDirectory("graft_mdv").resolve("t").toString

  private def mkTable(n: Int, buckets: Int): String = {
    val t = tmpTable()
    val df = (0 until n).map(i => (i.toLong, s"row-$i", i % 7))
      .toDF("doc_id", "text", "tag")
    create(spark, t, df, "doc_id", buckets)
    t
  }

  private def digest(t: String): Seq[(Long, Long, Long)] =
    snapshot(spark, t).agg(count(lit(1)), sum("doc_id"),
      bit_xor(xxhash64(col("doc_id"), col("text"), col("tag"))))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("deleteKeys with DV: file NOT rewritten, result == COW bit-for-bit") {
    val tCow = mkTable(400, 4)
    val tDv = mkTable(400, 4)
    val keys = Seq(3L, 77L, 210L, 211L, 390L).toDF("doc_id")
    deleteKeys(spark, tCow, keys)
    val s0 = readSnapshot(tDv, 0)
    val dataBytes = s0.files.map(f =>
      f.name -> new java.io.File(tDv, s"data/${f.name}").length()).toMap
    deleteKeys(spark, tDv, keys, useDv = true)
    val s1 = readSnapshot(tDv, 1)
    // every v0 file is still listed under its own NAME (merge-on-read:
    // zero data files rewritten), untouched bytes on disk
    assert(s1.files.map(_.name).toSet == s0.files.map(_.name).toSet)
    s1.files.foreach(f => assert(
      new java.io.File(tDv, s"data/${f.name}").length() == dataBytes(f.name)))
    // the files containing victims carry sidecars; the rest none
    val hit = s1.files.filter(_.dv.isDefined)
    assert(hit.nonEmpty && hit.map(_.dvRows).sum == 5L)
    assert(digest(tDv) == digest(tCow), "DV read drifted from COW")
  }

  test("repeated DV deletes merge keys; superseded sidecar becomes vacuumable") {
    val t = mkTable(200, 2)
    deleteKeys(spark, t, Seq(10L, 11L).toDF("doc_id"), useDv = true)
    val dv1 = readSnapshot(t, 1).files.flatMap(_.dv)
    deleteKeys(spark, t, Seq(12L, 10L).toDF("doc_id"), useDv = true) // 10 repeats
    val s2 = readSnapshot(t, 2)
    assert(s2.files.map(_.dvRows).sum == 3L, "distinct union of victim keys")
    assert(snapshot(spark, t).filter(col("doc_id").isin(10L, 11L, 12L)).count() == 0)
    assert(snapshot(spark, t).count() == 197L)
    // old sidecar unreferenced by the latest -> vacuum reclaims it
    val dead = vacuum(t, keepVersions = 1)
    dv1.foreach(d => assert(dead.contains(d) &&
      !new java.io.File(t, s"data/$d").exists()))
    // live sidecars survive and the table still reads
    assert(snapshot(spark, t).count() == 197L)
  }

  test("a re-appended key is NOT eaten by another file's DV") {
    val t = mkTable(100, 1)
    deleteKeys(spark, t, Seq(42L).toDF("doc_id"), useDv = true)
    assert(snapshot(spark, t).filter(col("doc_id") === 42L).count() == 0)
    // blind append re-inserts key 42 into a NEW file
    assert(appendBatch(spark, t,
      Seq((42L, "back", 9)).toDF("doc_id", "text", "tag"), "app", 1L, 1))
    val got = snapshot(spark, t).filter(col("doc_id") === 42L).collect()
    assert(got.length == 1 && got(0).getString(1) == "back",
      "per-file DV scope must not delete the re-appended row")
  }

  test("deleteWhere with DV: three tiers engage; straddler carries with a vector") {
    val t = tmpTable()
    val df = (0 until 400).map(i => (i.toLong, s"row-$i", i.toLong))
      .toDF("doc_id", "text", "v")
    create(spark, t, df, "doc_id", buckets = 4, clusterBy = Some("v"))
    // band fully covers one file, straddles others, misses the rest
    deleteWhere(spark, t, col("v") >= 90L && col("v") < 210L, useDv = true)
    val Some((carried, dropped, straddled)) = lastDeleteWherePlan(t)
    assert(carried >= 1 && dropped >= 1 && straddled >= 1,
      s"tiers: carried=$carried dropped=$dropped straddled=$straddled")
    val s1 = readSnapshot(t, 1)
    assert(s1.files.count(_.dv.isDefined) == straddled)
    assert(snapshot(spark, t).filter(col("v") >= 90L && col("v") < 210L).count() == 0)
    assert(snapshot(spark, t).count() == 400L - 120L)
    // live-row accounting: physical rows minus dvRows == table count
    assert(s1.files.map(f => f.rows - f.dvRows).sum == 280L)
  }

  test("compact and compactSmall materialize DVs into clean files") {
    val t = mkTable(300, 3)
    deleteKeys(spark, t, (0L until 300L by 37L).toDF("doc_id"), useDv = true)
    val before = digest(t)
    compactSmall(spark, t, minRows = 10) // all files >= 10 rows, but DV'd ones rewrite
    val s2 = readSnapshot(t, 2)
    assert(s2.op == "compact" && s2.files.forall(_.dv.isEmpty))
    assert(digest(t) == before)
    // a second pass converges: nothing left to rewrite
    assert(compactSmall(spark, t, minRows = 10).version == 2)
    // full compact from a DV state also materializes
    val t2 = mkTable(120, 2)
    deleteKeys(spark, t2, Seq(5L, 6L).toDF("doc_id"), useDv = true)
    val want = digest(t2)
    compact(spark, t2, buckets = 1)
    assert(readSnapshot(t2, 2).files.forall(_.dv.isEmpty) && digest(t2) == want)
  }

  test("CDC diff across a DV delete emits exactly the victims as deletes") {
    val t = mkTable(200, 2)
    deleteKeys(spark, t, Seq(7L, 8L, 150L).toDF("doc_id"), useDv = true)
    val d = snapshotDiff(spark, t, 0, 1).collect()
    assert(d.length == 3 && d.forall(_.getAs[String]("_change_type") == "delete"))
    assert(d.map(_.getLong(0)).sorted.toSeq == Seq(7L, 8L, 150L))
  }

  test("restore across a DV commit is loud once the sidecar is vacuumed") {
    val t = mkTable(100, 1)
    deleteKeys(spark, t, Seq(1L).toDF("doc_id"), useDv = true) // v1: dv
    deleteKeys(spark, t, Seq(2L).toDF("doc_id"), useDv = true) // v2: new dv
    restore(t, 1) // v3 relists v1's file+dv — fine, everything on disk
    assert(snapshot(spark, t).count() == 99L)
    restore(t, 2) // v4: back to v2's state; v1's sidecar now unreferenced
    // simulate the sidecar aging out while the v1 manifest survives:
    // the DV-aware precondition must catch the missing SIDECAR
    val dv1 = readSnapshot(t, 1).files.flatMap(_.dv).head
    assert(new java.io.File(t, s"data/$dv1").delete())
    val e = intercept[Exception] { restore(t, 1) }
    assert(e.getMessage.contains("no longer exist") && e.getMessage.contains(dv1))
  }

  test("scattered delete over 120 files: O(1) scan nodes, not one per DV'd file") {
    // the scenario DVs exist for — a GDPR sweep over a key the table
    // IS clustered by still scatters when the victims do: step-13 keys
    // land in every one of 120 files. The read plan must stay at <= 3
    // scans (plain, DV'd-data, sidecar) no matter how many files carry
    // a vector (VERDICT r18 #1: the old per-file union planned 120).
    val t = mkTable(6000, 120)
    deleteKeys(spark, t, (0L until 6000L by 13L).toDF("doc_id"), useDv = true)
    val s1 = readSnapshot(t, 1)
    assert(s1.files.count(_.dv.isDefined) >= 100,
      s"fixture must scatter: ${s1.files.count(_.dv.isDefined)} DV'd files")
    val df = snapshot(spark, t)
    val nScans = df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
    }.size
    assert(nScans <= 3, s"DV read planned $nScans scan nodes")
    val nVictims = (0L until 6000L by 13L).size
    assert(df.count() == 6000L - nVictims)
    assert(df.filter(col("doc_id") % 13 === 0).count() == 0)
    // a second scattered sweep merges into the same sidecar layer and
    // the plan pin still holds
    deleteKeys(spark, t, (5L until 6000L by 17L).toDF("doc_id"), useDv = true)
    val df2 = snapshot(spark, t)
    val nScans2 = df2.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation => r
    }.size
    assert(nScans2 <= 3, s"second sweep planned $nScans2 scan nodes")
    assert(df2.filter(col("doc_id") % 13 === 0 ||
      (col("doc_id") % 17 === 5)).count() == 0)
  }

  test("upsert on a DV'd file does not resurrect deleted rows") {
    val t = mkTable(100, 1)
    deleteKeys(spark, t, Seq(30L, 31L).toDF("doc_id"), useDv = true)
    upsert(spark, t,
      Seq((31L, "upd", 1), (500L, "new", 2)).toDF("doc_id", "text", "tag"),
      buckets = 1)
    val s = snapshot(spark, t)
    assert(s.filter(col("doc_id") === 30L).count() == 0, "30 stays deleted")
    assert(s.filter(col("doc_id") === 31L).select("text").collect()(0)
      .getString(0) == "upd", "31 re-inserted by the upsert")
    assert(s.count() == 100L) // 100 - 2 deleted + 31 back + 500 new
    // the rewrite materialized the DV away
    assert(readSnapshot(t, 2).files.forall(_.dv.isEmpty))
  }

  test("legacy key-only sidecar fails LOUDLY, never resurrects deletes") {
    // ADVICE r19 (high): a sidecar missing the target-file column `f`
    // would read f=NULL, the anti-join would match nothing, and every
    // delete in it would silently undo. The reader must refuse.
    val t = mkTable(100, 1)
    deleteKeys(spark, t, Seq(40L, 41L).toDF("doc_id"), useDv = true)
    val dvName = readSnapshot(t, 1).files.flatMap(_.dv).head
    val dvPath = new java.io.File(t, s"data/$dvName")
    // rewrite the sidecar in a hypothetical legacy format: k only
    val legacy = spark.read.parquet(dvPath.getAbsolutePath)
      .select("k").collect().map(_.getLong(0))
    val stage = java.nio.file.Files.createTempDirectory("graft_dvleg").toString
    legacy.toSeq.toDF("k").coalesce(1).write.mode("overwrite").parquet(stage)
    val part = new java.io.File(stage).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part.toPath, dvPath.toPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val ex = intercept[Exception] { snapshot(spark, t).count() }
    def msgs(e: Throwable): Seq[String] =
      Option(e).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(ex).exists(_.contains("no target-file column")),
      s"wanted the loud legacy-sidecar refusal, got: ${ex.getMessage}")
  }
}
