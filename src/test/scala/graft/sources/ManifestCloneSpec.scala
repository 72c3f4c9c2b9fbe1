package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.sources.ManifestTable._

/** Shallow-clone contracts (round 18 — Delta's SHALLOW CLONE): zero
  * bytes copied at clone time, full independence in both directions
  * afterwards, COW rewrites drop external references file by file,
  * vacuum on the clone never reaches into the source, compaction
  * materializes to self-contained, deletion vectors resolve across
  * the external boundary in BOTH directions, and the txn map does not
  * carry (a clone is a new sink identity).
  */
class ManifestCloneSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpDir(): java.io.File =
    java.nio.file.Files.createTempDirectory("graft_clone").toFile

  private def mkSource(n: Int, buckets: Int): String = {
    val t = new java.io.File(tmpDir(), "src").getAbsolutePath
    val df = (0 until n).map(i => (i.toLong, s"row-$i", (i % 7).toLong))
      .toDF("doc_id", "text", "tag")
    create(spark, t, df, "doc_id", buckets)
    t
  }

  private def digest(t: String): (Long, Long) = {
    val r = snapshot(spark, t).agg(count(lit(1)),
      bit_xor(xxhash64(col("doc_id"), col("text"), col("tag")))).collect()(0)
    (r.getLong(0), r.getLong(1))
  }

  test("clone is zero-copy: absolute references, no local data, identical reads") {
    val src = mkSource(300, 3)
    val dst = new java.io.File(tmpDir(), "clone").getAbsolutePath
    shallowClone(src, dst)
    val c0 = readSnapshot(dst, 0)
    assert(c0.op == "clone" && c0.files.nonEmpty)
    assert(c0.files.forall(f => f.name.startsWith("/")),
      "clone entries must reference the source by absolute path")
    val local = Option(new java.io.File(dst, "data").listFiles()).getOrElse(Array.empty)
    assert(local.isEmpty, "a shallow clone copies zero data bytes")
    assert(digest(dst) == digest(src))
  }

  test("independence: writes on either side never move the other") {
    val src = mkSource(200, 2)
    val dst = new java.io.File(tmpDir(), "clone").getAbsolutePath
    shallowClone(src, dst)
    val srcBefore = digest(src)
    val srcFiles = readSnapshot(src, 0).files.map(f =>
      f.name -> new java.io.File(src, s"data/${f.name}").length()).toMap
    // write on the CLONE: source digest and bytes untouched
    upsert(spark, dst, Seq((5L, "clone-upd", 9L), (200L, "clone-new", 9L))
      .toDF("doc_id", "text", "tag"), 1)
    assert(digest(src) == srcBefore)
    srcFiles.foreach { case (n, len) =>
      assert(new java.io.File(src, s"data/$n").length() == len) }
    // the touched external file dropped out COW-style; untouched ones remain external
    val c1 = readSnapshot(dst, 1)
    assert(c1.files.exists(f => !f.name.startsWith("/")),
      "the rewrite must land locally")
    assert(c1.files.exists(f => f.name.startsWith("/")),
      "untouched entries keep referencing the source")
    // write on the SOURCE: the clone is pinned at clone-time state
    val cloneAfter = digest(dst)
    upsert(spark, src, Seq((7L, "src-upd", 9L)).toDF("doc_id", "text", "tag"), 1)
    assert(digest(dst) == cloneAfter)
    val m = snapshot(spark, dst).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(5L) == "clone-upd" && m(200L) == "clone-new" && m(7L) == "row-7")
  }

  test("vacuum on the clone reclaims only its OWN files, never the source's") {
    val src = mkSource(100, 1)
    val dst = new java.io.File(tmpDir(), "clone").getAbsolutePath
    shallowClone(src, dst)
    // v1 rewrites everything locally (the lone external file drops out)
    upsert(spark, dst, Seq((5L, "u", 9L)).toDF("doc_id", "text", "tag"), 1)
    val dead = vacuum(dst, keepVersions = 1)
    assert(dead.forall(n => !n.startsWith("/")),
      s"vacuum reported an external name as reclaimed: $dead")
    // every source byte still in place, source still reads
    assert(readSnapshot(src, 0).files.forall(f =>
      new java.io.File(src, s"data/${f.name}").exists()))
    assert(digest(src)._1 == 100)
    assert(digest(dst)._1 == 100)
  }

  test("compact materializes the clone to self-contained; source becomes deletable") {
    val src = mkSource(150, 2)
    val dst = new java.io.File(tmpDir(), "clone").getAbsolutePath
    shallowClone(src, dst)
    compact(spark, dst, buckets = 2)
    val c1 = readSnapshot(dst, 1)
    assert(c1.files.forall(f => !f.name.startsWith("/")),
      "compact must materialize every external reference")
    val want = digest(dst)
    // simulate the source disappearing entirely
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit }
    rm(new java.io.File(src))
    assert(digest(dst) == want, "a materialized clone must not need the source")
  }

  test("deletion vectors cross the boundary both ways") {
    val src = mkSource(100, 1)
    // source-side DV BEFORE the clone: the clone must apply it
    deleteKeys(spark, src, Seq(7L, 8L).toDF("doc_id"), useDv = true)
    val dst = new java.io.File(tmpDir(), "clone").getAbsolutePath
    shallowClone(src, dst)
    val c0 = readSnapshot(dst, 0)
    assert(c0.files.exists(f => f.dv.exists(_.startsWith("/"))),
      "the source's sidecar must clone as an absolute reference")
    assert(snapshot(spark, dst).count() == 98)
    assert(snapshot(spark, dst).filter(col("doc_id").isin(7L, 8L)).count() == 0)
    // clone-side DV ON an external file: sidecar local, file untouched
    deleteKeys(spark, dst, Seq(10L).toDF("doc_id"), useDv = true)
    val c1 = readSnapshot(dst, 1)
    assert(c1.files.forall(f => f.name.startsWith("/")),
      "a merge-on-read delete must not rewrite the external file")
    assert(c1.files.exists(f => f.dv.exists(d => !d.startsWith("/"))),
      "the clone's new sidecar lives in its own data/")
    assert(snapshot(spark, dst).count() == 97)
    // the source never sees the clone's delete
    assert(snapshot(spark, src).filter(col("doc_id") === 10L).count() == 1)
  }

  test("clone-of-clone re-points at the original bytes; txns do not carry") {
    val src = mkSource(50, 1)
    val d1 = new java.io.File(tmpDir(), "c1").getAbsolutePath
    val d2 = new java.io.File(tmpDir(), "c2").getAbsolutePath
    shallowClone(src, d1)
    // a sink identity on the first clone
    assert(appendBatch(spark, d1,
      Seq((100L, "b", 0L)).toDF("doc_id", "text", "tag"), "app", 5L, 1))
    shallowClone(d1, d2)
    val c2 = readSnapshot(d2, 0)
    val srcData = new java.io.File(src, "data").getAbsolutePath
    assert(c2.files.exists(f => f.name.startsWith(srcData)),
      "already-absolute entries must carry as-is (never re-prefixed)")
    assert(c2.txns.isEmpty, "the txn map must not clone")
    // the same (appId, batchId) on the new clone is NOT treated as applied
    assert(appendBatch(spark, d2,
      Seq((200L, "c", 0L)).toDF("doc_id", "text", "tag"), "app", 5L, 1),
      "a clone is a new sink identity — the batch must commit")
    assert(digest(d2)._1 == 52)
    // loud on an occupied destination
    val e = intercept[IllegalArgumentException](shallowClone(src, d1))
    assert(e.getMessage.contains("already"))
  }

  test("CLONE VERSION AS OF pins an old state; the tip keeps moving") {
    val src = mkSource(80, 1)
    upsert(spark, src, Seq((5L, "v1-upd", 9L)).toDF("doc_id", "text", "tag"), 1)
    val d0 = new java.io.File(tmpDir(), "at0").getAbsolutePath
    val dTip = new java.io.File(tmpDir(), "tip").getAbsolutePath
    shallowClone(src, d0, version = Some(0))
    shallowClone(src, dTip)
    val m0 = snapshot(spark, d0).filter(col("doc_id") === 5L).collect()(0)
    val mT = snapshot(spark, dTip).filter(col("doc_id") === 5L).collect()(0)
    assert(m0.getString(1) == "row-5", "VERSION AS OF 0 must see pre-upsert state")
    assert(mT.getString(1) == "v1-upd", "the default clone takes the tip")
  }

  test("a streaming tail reads a cloned table from v0") {
    val src = mkSource(40, 1)
    val dst = new java.io.File(tmpDir(), "clone").getAbsolutePath
    shallowClone(src, dst)
    import org.apache.spark.sql.streaming.Trigger
    val out = tmpDir()
    val q = spark.readStream.format("graft.sources.ManifestStreamProvider")
      .load(dst).writeStream.format("parquet")
      .option("path", new java.io.File(out, "d").getAbsolutePath)
      .option("checkpointLocation", new java.io.File(out, "c").getAbsolutePath)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(spark.read.parquet(new java.io.File(out, "d").getAbsolutePath)
      .count() == 40)
  }
}
