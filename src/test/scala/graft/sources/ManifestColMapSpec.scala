package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StringType}
import graft.SparkTestBase
import graft.sources.ManifestTable._

/** Column-mapping contracts (round 18 — Delta's column mapping, name
  * mode): RENAME/DROP COLUMN are metadata-only commits; data files
  * keep their PHYSICAL names forever, reads translate at the scan
  * boundary, stats/bloom pruning at the lookup; a re-added name gets
  * a fresh physical and can never resurrect dropped bytes; writes
  * after a rename store physical names so old and new files stay one
  * coherent table; time travel and restore see era-correct names;
  * key-column renames follow through the COW paths.
  */
class ManifestColMapSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpTable(): String =
    java.nio.file.Files.createTempDirectory("graft_cmap").resolve("t").toString

  private def mkTable(n: Int, buckets: Int,
                      constraints: Map[String, String] = Map.empty): String = {
    val t = tmpTable()
    val df = (0 until n).map(i => (i.toLong, s"row-$i", (i % 7).toLong))
      .toDF("doc_id", "text", "tag")
    create(spark, t, df, "doc_id", buckets, constraints = constraints)
    t
  }

  test("rename is metadata-only; reads present the new name over old bytes") {
    val t = mkTable(200, 2)
    val s0 = readSnapshot(t, 0)
    val bytes = s0.files.map(f =>
      f.name -> new java.io.File(t, s"data/${f.name}").length()).toMap
    renameColumn(t, "text", "body")
    val s1 = readSnapshot(t, 1)
    assert(s1.op == "evolve" && s1.files == s0.files,
      "rename must relist the identical file entries")
    s1.files.foreach(f => assert(
      new java.io.File(t, s"data/${f.name}").length() == bytes(f.name)))
    val df = snapshot(spark, t)
    assert(df.columns.toSeq == Seq("doc_id", "body", "tag"))
    assert(df.filter(col("body") === "row-7").count() == 1)
    // time travel still reads the OLD name at the old version
    assert(snapshot(spark, t, Some(0)).columns.toSeq ==
      Seq("doc_id", "text", "tag"))
  }

  test("writes after a rename store PHYSICAL names; old and new files read as one") {
    val t = mkTable(100, 1)
    renameColumn(t, "text", "body")
    upsert(spark, t,
      Seq((5L, "upd-5", 9L), (100L, "new-100", 9L)).toDF("doc_id", "body", "tag"), 1)
    val s2 = readSnapshot(t, 2)
    val newFile = s2.files.map(_.name)
      .diff(readSnapshot(t, 0).files.map(_.name)).head
    val footer = spark.read.parquet(
      new java.io.File(t, s"data/$newFile").getAbsolutePath).schema.fieldNames.toSeq
    assert(footer.contains("text") && !footer.contains("body"),
      s"new files must store the physical name: $footer")
    val m = snapshot(spark, t).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(m(5L) == "upd-5" && m(100L) == "new-100" && m(7L) == "row-7")
  }

  test("stats and bloom pruning translate through the mapping") {
    val t = tmpTable()
    val df = (0 until 400).map(i => (i.toLong, s"row-$i", (i % 7).toLong))
      .toDF("doc_id", "text", "tag")
    create(spark, t, df, "doc_id", 4, bloomFor = Seq("text"))
    renameColumn(t, "text", "body")
    // nullness pruning: every file's physical 'text' stats say zero
    // nulls -> an isNull probe on the LOGICAL name prunes everything
    assert(matchingFiles(t, col("body").isNull)._1.isEmpty,
      "nullness pruning must engage through the logical->physical map")
    // bloom pruning: an equality probe for a value in one file skips
    // the rest (blooms are keyed physical; the probe speaks logical)
    val (hit, total) = matchingFiles(t, col("body") === "row-10")
    assert(hit.size < total, s"bloom skipping must engage: $hit of $total")
    assert(snapshot(spark, t).filter(col("body") === "row-10").count() == 1)
    // deleteWhere's three-tier plan prunes through the map too
    deleteWhere(spark, t, col("body") === "row-10")
    assert(snapshot(spark, t).filter(col("body") === "row-10").count() == 0)
    assert(snapshot(spark, t).count() == 399)
  }

  test("drop + re-add never resurrects the dropped bytes") {
    val t = mkTable(100, 1)
    dropColumn(t, "text")
    assert(snapshot(spark, t).columns.toSeq == Seq("doc_id", "tag"))
    addColumns(t, Seq(StructField("text", StringType)))
    val re = snapshot(spark, t)
    assert(re.columns.toSeq == Seq("doc_id", "tag", "text"))
    assert(re.filter(col("text").isNotNull).count() == 0,
      "a re-added column must read NULL, never the dropped bytes")
    // the fresh physical engages on write: new rows carry values,
    // old rows stay NULL
    upsert(spark, t, Seq((100L, 9L, "fresh")).toDF("doc_id", "tag", "text"), 1)
    val m = snapshot(spark, t).collect()
      .map(r => r.getLong(0) -> Option(r.getString(2))).toMap
    assert(m(100L).contains("fresh") && m(7L).isEmpty)
    // time travel: v0 still reads the original values
    assert(snapshot(spark, t, Some(0))
      .filter(col("text") === "row-7").count() == 1)
  }

  test("addColumns is batch-safe: duplicate names refused, sibling physical clashes avoided") {
    // ADVICE r18: candidates were only checked against deadCols and
    // live physicals, so a batch could assign ONE physical to TWO
    // logical columns
    val t = mkTable(20, 1)
    val dup = intercept[IllegalArgumentException](
      addColumns(t, Seq(StructField("x", StringType), StructField("x", StringType))))
    assert(dup.getMessage.contains("duplicate"))
    // 'text' is dropped (dead physical), then re-added in the SAME
    // batch as a sibling literally named like its fresh-physical
    // candidate: the two must land on DISTINCT physicals
    dropColumn(t, "text") // v1
    addColumns(t, Seq(
      StructField("text__p2", StringType), StructField("text", StringType))) // v2
    val s = readSnapshot(t, 2)
    val pText = s.colMap.getOrElse("text", "text")
    val pSib = s.colMap.getOrElse("text__p2", "text__p2")
    assert(pText != "text", "re-added dead name needs a fresh physical")
    assert(pText != pSib, s"batch assigned one physical to two columns: $pText")
    // both columns round-trip values independently through a write
    upsert(spark, t,
      Seq((100L, 1L, "sib-val", "text-val")).toDF("doc_id", "tag", "text__p2", "text"), 1)
    val m = snapshot(spark, t).collect()
      .map(r => r.getLong(0) -> (Option(r.get(2)), Option(r.get(3)))).toMap
    assert(m(100L) == (Some("sib-val"), Some("text-val")))
    assert(m(7L) == (None, None), "old rows read NULL for both new columns")
  }

  test("swap two column names (a->tmp, b->a, tmp->b) reads correctly") {
    val t = tmpTable()
    val df = (0 until 50).map(i => (i.toLong, s"A-$i", s"B-$i"))
      .toDF("doc_id", "a", "b")
    create(spark, t, df, "doc_id", 1)
    renameColumn(t, "a", "tmp")
    renameColumn(t, "b", "a")
    renameColumn(t, "tmp", "b")
    val r = snapshot(spark, t).filter(col("doc_id") === 3L).collect()(0)
    assert(r.getString(r.fieldIndex("a")) == "B-3" &&
      r.getString(r.fieldIndex("b")) == "A-3",
      "a swap mapping must translate both columns in one projection")
    // and a write under the swapped names lands physically correct
    upsert(spark, t, Seq((50L, "bVal", "aVal")).toDF("doc_id", "a", "b"), 1)
    val r2 = snapshot(spark, t).filter(col("doc_id") === 50L).collect()(0)
    assert(r2.getString(r2.fieldIndex("a")) == "bVal" &&
      r2.getString(r2.fieldIndex("b")) == "aVal")
  }

  test("key column rename follows through the COW paths") {
    val t = mkTable(100, 2)
    renameColumn(t, "doc_id", "id")
    assert(readSnapshot(t, 1).keyCol == "id")
    upsert(spark, t, Seq((5L, "upd", 9L)).toDF("id", "text", "tag"), 1)
    deleteRange(spark, t, 90L, 99L)
    val d = snapshot(spark, t)
    assert(d.columns.contains("id") && d.count() == 90)
    assert(d.filter(col("id") === 5L).collect()(0).getString(1) == "upd")
  }

  test("constraint-referenced rename/drop are refused; others proceed") {
    val t = mkTable(50, 1, constraints = Map("tag_ok" -> "tag >= 0"))
    val e1 = intercept[IllegalArgumentException](renameColumn(t, "tag", "label"))
    assert(e1.getMessage.contains("tag_ok"))
    val e2 = intercept[IllegalArgumentException](dropColumn(t, "tag"))
    assert(e2.getMessage.contains("tag_ok"))
    renameColumn(t, "text", "body") // unreferenced: fine
    assert(snapshot(spark, t).columns.contains("body"))
    val e3 = intercept[IllegalArgumentException](dropColumn(t, "doc_id"))
    assert(e3.getMessage.contains("key column"))
  }

  test("restore across a rename restores the old names (config back)") {
    val t = mkTable(60, 1)
    renameColumn(t, "text", "body")
    upsert(spark, t, Seq((60L, "new", 0L)).toDF("doc_id", "body", "tag"), 1)
    restore(t, 0)
    val df = snapshot(spark, t)
    assert(df.columns.toSeq == Seq("doc_id", "text", "tag"),
      "restore must bring the pre-rename logical names back")
    assert(df.count() == 60)
    // and the mapping era is consistent: a post-restore write speaks
    // the restored names
    upsert(spark, t, Seq((61L, "after", 1L)).toDF("doc_id", "text", "tag"), 1)
    assert(snapshot(spark, t).filter(col("text") === "after").count() == 1)
  }

  test("streaming tails speak their start-time names; a restart adopts the rename") {
    val t = mkTable(40, 1)
    import org.apache.spark.sql.streaming.Trigger
    val out = java.nio.file.Files.createTempDirectory("graft_cmap_out")
    // tail 1, started pre-rename: presents 'text'
    val q = spark.readStream.format("graft.sources.ManifestStreamProvider")
      .load(t).writeStream.format("parquet")
      .option("path", out.resolve("d1").toString)
      .option("checkpointLocation", out.resolve("c1").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got1 = spark.read.parquet(out.resolve("d1").toString)
    assert(got1.columns.contains("text") && got1.count() == 40)
    renameColumn(t, "text", "body")
    // post-rename append writes the SAME physical names
    assert(appendBatch(spark, t,
      Seq((100L, "late", 1L)).toDF("doc_id", "body", "tag"), "app", 1L, 1))
    // tail 2, started post-rename (fresh checkpoint — the Delta
    // schema-change restart): presents 'body' for ALL rows, including
    // the 40 written under the old logical name (physical unchanged)
    val q2 = spark.readStream.format("graft.sources.ManifestStreamProvider")
      .load(t).writeStream.format("parquet")
      .option("path", out.resolve("d2").toString)
      .option("checkpointLocation", out.resolve("c2").toString)
      .trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(60000)
    val got2 = spark.read.parquet(out.resolve("d2").toString)
    assert(got2.columns.contains("body") && !got2.columns.contains("text"))
    assert(got2.count() == 41 &&
      got2.filter(col("body") === "late").count() == 1 &&
      got2.filter(col("body") === "row-7").count() == 1)
  }

  test("merge prunes its by-source tier through the mapping") {
    val t = tmpTable()
    val df = (0 until 400).map(i => (i.toLong, s"row-$i", (i % 7).toLong))
      .toDF("doc_id", "text", "tag")
    create(spark, t, df, "doc_id", 4)
    renameColumn(t, "tag", "label")
    val s1 = readSnapshot(t, 1)
    val src = Seq((5L, "u5", 99L)).toDF("doc_id", "text", "label")
    merge(spark, t, src, 1,
      matchedUpdate = Some(lit(true)),
      notMatchedBySourceDelete = Some(col("label") === 98L)) // matches nothing
    val s2 = readSnapshot(t, 2)
    // label stats (physical 'tag', 0..6 per file) prove label===98
    // impossible -> only the key-5 file rewrites
    val carried = s2.files.count(f => s1.files.map(_.name).toSet(f.name))
    assert(carried == s1.files.size - 1,
      s"by-source pruning must engage through the map (carried $carried)")
    assert(snapshot(spark, t).count() == 400)
  }
}
