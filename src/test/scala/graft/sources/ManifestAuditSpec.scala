package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.sources.ManifestTable._

/** Pins for the round-18 self-audit findings: the pre-checkpoint
  * vacuumed-history replay fallback, bloom-bits survival through the
  * last bloom column's drop, the fully-emptied-file DV sidecar leak,
  * and reserved internal column names.
  */
class ManifestAuditSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpTable(): String =
    java.nio.file.Files.createTempDirectory("graft_maud").resolve("t").toString

  private def mkTable(n: Int, buckets: Int): String = {
    val t = tmpTable()
    val df = (0 until n).map(i => (i.toLong, s"row-$i", (i % 7).toLong))
      .toDF("doc_id", "text", "tag")
    create(spark, t, df, "doc_id", buckets)
    t
  }

  test("a legacy-vacuumed log (full snapshot, no checkpoint, no v0) still reads") {
    val t = mkTable(100, 1)
    // drive past the checkpoint interval so cp10 exists
    (1 to 12).foreach(i => upsert(spark, t,
      Seq((i.toLong, s"u-$i", 0L)).toDF("doc_id", "text", "tag"), 1))
    val log = new java.io.File(t, "_log")
    val cp10 = new java.io.File(log, "cp00000010.json")
    assert(cp10.exists(), "fixture needs the v10 checkpoint")
    // simulate the PRE-checkpoint era after a vacuum: v10 becomes a
    // self-contained FULL snapshot (the legacy manifest form — a
    // checkpoint file is byte-identical to it), versions 0-9 are gone,
    // and no checkpoint/hint machinery exists at all
    val v10 = new java.io.File(log, "v00000010.json")
    v10.delete()
    java.nio.file.Files.copy(cp10.toPath, v10.toPath)
    (0 to 9).foreach(i => new java.io.File(log, f"v$i%08d.json").delete())
    log.listFiles().filter(f => f.getName.startsWith("cp") ||
      f.getName == "_last_checkpoint").foreach(_.delete())
    clearSnapshotCache()
    val snap = readSnapshot(t, 12)
    assert(snap.version == 12 && snap.files.nonEmpty,
      "replay must fall back to the oldest surviving full snapshot")
    assert(snapshot(spark, t).count() == 100)
    // an action tail with NO full snapshot under it still fails loudly
    v10.delete()
    clearSnapshotCache()
    val e = intercept[IllegalStateException](readSnapshot(t, 12))
    assert(e.getMessage.contains("vacuumed"), e.getMessage)
  }

  test("bloomBits survives dropping the last bloom column across a cold reconstruction") {
    val t = mkTable(60, 1)
    setBloomIndex(t, Seq("text"), bloomBits = 1 << 20)
    dropColumn(t, "text") // unconfigures the bloom column
    assert(readSnapshot(t, 2).bloomCols.isEmpty)
    // force a checkpoint (cp10) then reconstruct cold from it
    (1 to 9).foreach(i => upsert(spark, t,
      Seq((100L + i, 9L)).toDF("doc_id", "tag"), 1))
    assert(new java.io.File(t, "_log/cp00000010.json").exists())
    val live = readSnapshot(t, latestVersion(t))
    clearSnapshotCache()
    val cold = readSnapshot(t, latestVersion(t))
    assert(live.bloomBits == (1 << 20) && cold.bloomBits == live.bloomBits,
      s"cold ${cold.bloomBits} vs live ${live.bloomBits} — checkpoint lost bloomBits")
  }

  test("a DV delete that empties a file leaves no unlisted sidecar behind") {
    val t = mkTable(50, 1) // one data file
    deleteKeys(spark, t, (0L until 50L).toDF("doc_id"), useDv = true)
    val s1 = readSnapshot(t, 1)
    assert(s1.files.isEmpty, "all rows deleted -> file drops from the listing")
    // every byte in data/ must be reachable from SOME retained version;
    // after vacuum to the latest, data/ must be exactly empty
    vacuum(t, keepVersions = 1)
    val left = Option(new java.io.File(t, "data").listFiles())
      .getOrElse(Array.empty).map(_.getName)
    assert(left.isEmpty,
      s"orphaned unlisted file(s) survived vacuum: ${left.mkString(", ")}")
    assert(snapshot(spark, t).count() == 0)
  }

  test("reserved internal column names are refused at every schema boundary") {
    val t = tmpTable()
    val bad = Seq((1L, "x")).toDF("doc_id", "_fb")
    val e1 = intercept[IllegalArgumentException](
      create(spark, t, bad, "doc_id", 1))
    assert(e1.getMessage.contains("_fb"))
    val t2 = mkTable(10, 1)
    val e2 = intercept[IllegalArgumentException](addColumns(t2, Seq(
      org.apache.spark.sql.types.StructField("_dvk",
        org.apache.spark.sql.types.LongType))))
    assert(e2.getMessage.contains("_dvk"))
    val e3 = intercept[IllegalArgumentException](
      renameColumn(t2, "text", "_from_src"))
    assert(e3.getMessage.contains("_from_src"))
    val e4 = intercept[IllegalArgumentException](
      renameColumn(t2, "text", "_src_text"))
    assert(e4.getMessage.contains("_src_"))
  }
}
