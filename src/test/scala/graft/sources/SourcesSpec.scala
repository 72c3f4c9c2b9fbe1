package graft.sources

import java.nio.file.Files

import graft.SparkTestBase
import graft.operators.Multimodal

class SourcesSpec extends SparkTestBase {

  test("media source reads binary files with typed metadata and feeds Multimodal") {
    val dir = Files.createTempDirectory("graft_media")
    // real PNG via the JDK encoder: 8x8 gray, pixel (x,y) = 'a'+x
    // (text length == row width, so every row repeats the same bytes)
    val pngBytes = graft.dsp.Image.encodePng(
      graft.dsp.Image.synthGray("abcdefgh", 8, 8, 0))
    Files.write(dir.resolve("a.png"), pngBytes)
    Files.write(dir.resolve("b.wav"), Array.tabulate[Byte](32)(_.toByte))
    try {
      val media = Sources.media(spark, dir.toString).cache()
      val rows = media.collect().map(r =>
        (r.getString(0).split('/').last, r.getAs[Array[Byte]]("content").length,
          r.getStruct(2).getAs[String]("mime"))).toSet
      assert(rows == Set(("a.png", pngBytes.length, "image/png"),
        ("b.wav", 32, "audio/wav")))

      val img = Multimodal.imageFeatures(
          media.filter(org.apache.spark.sql.functions.col("meta.mime") === "image/png"))
        .select("width", "height", "features").collect()(0)
      assert(img.getInt(0) == 8 && img.getInt(1) == 8)
      val feats = img.getSeq[Long](2)
      // 4x4 grid over 8x8: each block is 2x2 pixels; columns 2bx, 2bx+1
      assert(feats.length == 16)
      for (by <- 0 until 4; bx <- 0 until 4)
        assert(feats(by * 4 + bx) == 2L * (('a' + 2 * bx) + ('a' + 2 * bx + 1)))
      assert(feats.sum == 8L * "abcdefgh".map(_.toInt).sum)

      val png = Sources.media(spark, dir.toString, Some("*.png")).count()
      assert(png == 1)
    } finally {
      dir.toFile.listFiles().foreach(_.delete())
      Files.deleteIfExists(dir)
    }
  }

  test("jsonlDocs: corrupt lines accounted exactly, surviving texts byte-identical") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val parsed = Sources.jsonlDocs(spark, sf).cache()
    val ref = spark.read.parquet(s"$sf/documents.parquet").cache()
    val wantCorrupt = ref.filter(col("doc_id") % 83 === 0).count()
    val gotCorrupt = parsed.filter(col("j.doc_id").isNull).count()
    assert(gotCorrupt == wantCorrupt && wantCorrupt > 0)
    assert(parsed.count() == ref.count())
    // every surviving (doc_id, text) round-trips byte-for-byte
    val good = parsed.filter(col("j.doc_id").isNotNull)
      .select(col("j.doc_id").as("doc_id"), col("j.text").as("text"))
    val refGood = ref.filter(col("doc_id") % 83 =!= 0)
      .select(col("doc_id"), col("text"))
    assert(good.exceptAll(refGood).count() == 0)
    assert(refGood.exceptAll(good).count() == 0)
    parsed.unpersist(); ref.unpersist(): Unit
  }

  test("partitionedDocs: lang filter prunes to one partition directory, rows intact") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val part = Sources.partitionedDocs(spark, sf)
    // round trip is lossless
    val ref = spark.read.parquet(s"$sf/documents.parquet")
    assert(part.count() == ref.count())
    assert(part.select("doc_id", "text", "lang")
      .exceptAll(ref.select("doc_id", "text", "lang")).count() == 0)
    // a partition-column filter must reach the scan as a
    // PartitionFilter (directory pruning), NOT a post-scan Filter over
    // all rows — the entire point of the layout
    val en = part.filter(col("lang") === "en")
    val plan = en.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters"))
    assert(pf.exists(l => l.contains("lang")), s"no lang PartitionFilter:\n$plan")
    // and the pruned read agrees with the unpartitioned filter
    assert(en.count() == ref.filter(col("lang") === "en").count())
  }

  test("csvDocs: quoting hazards round-trip byte-identical, corrupt stubs quarantined") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val parsed = Sources.csvDocs(spark, sf).cache()
    val ref = spark.read.parquet(s"$sf/documents.parquet").cache()
    val wantCorrupt = ref.filter(col("doc_id") % 89 === 0).count()
    assert(parsed.filter(col("c.doc_id").isNull).count() == wantCorrupt)
    assert(wantCorrupt > 0 && parsed.count() == ref.count())
    // the embedded-comma + doubled-quote title decodes EXACTLY to the
    // derived expression, and text round-trips byte-for-byte
    val good = parsed.filter(col("c.doc_id").isNotNull)
      .select(col("c.doc_id").as("doc_id"), col("c.title").as("title"),
        col("c.text").as("text"))
    val refGood = ref.filter(col("doc_id") % 89 =!= 0)
      .select(col("doc_id"), Sources.csvTitleExpr.as("title"), col("text"))
    assert(good.exceptAll(refGood).count() == 0)
    assert(refGood.exceptAll(good).count() == 0)
    // sanity: the titles genuinely contain the hazards
    val t = good.select("title").head().getString(0)
    assert(t.contains(",") && t.contains("\""), s"hazard-free title: $t")
    parsed.unpersist(); ref.unpersist(): Unit
  }

  test("orcDocs: lossless round trip, predicates reach the ORC scan as PushedFilters") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val orc = Sources.orcDocs(spark, sf)
    val ref = spark.read.parquet(s"$sf/documents.parquet")
    assert(orc.count() == ref.count())
    assert(orc.select("doc_id", "text", "lang", "source", "n_chars")
      .exceptAll(ref.select("doc_id", "text", "lang", "source", "n_chars"))
      .count() == 0)
    val filtered = orc.filter(col("lang") === "en" && col("n_chars") >= 200)
      .select("doc_id")
    val plan = filtered.queryExecution.executedPlan.toString
    val pushed = plan.linesIterator.find(_.contains("PushedFilters"))
    assert(pushed.exists(l => l.contains("lang") && l.contains("n_chars")),
      s"predicates not pushed to the ORC scan:\n$plan")
    // and the projection prunes: the scan schema must not read `text`
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema"))
    assert(readSchema.exists(l => !l.contains("text")),
      s"column pruning lost — text read for a doc_id projection:\n$plan")
  }

  test("compactedDocs: 64-file layout collapses to the target, content lossless") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val (df, before, after) = Sources.compactedDocs(spark, sf, targetFiles = 4)
    assert(before == 64, s"fragmented fixture has $before files, wanted 64")
    assert(after == 4, s"compaction produced $after files, wanted 4")
    val ref = spark.read.parquet(s"$sf/documents.parquet")
    assert(df.count() == ref.count())
    assert(df.select("doc_id", "text").exceptAll(ref.select("doc_id", "text"))
      .count() == 0)
  }

  test("evolvedDocs: merged union schema, null backfill exactly on the missing generation") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val ev = Sources.evolvedDocs(spark, sf).cache()
    val ref = spark.read.parquet(s"$sf/documents.parquet")
    // union schema carries all six columns
    assert(ev.columns.toSet ==
      Set("doc_id", "text", "lang", "gen", "n_chars", "quality"))
    assert(ev.count() == ref.count())
    // gen-1 rows have NULL for the late-added columns, gen-2 rows don't
    assert(ev.filter(col("gen") === 1 &&
      (col("n_chars").isNotNull || col("quality").isNotNull)).count() == 0)
    assert(ev.filter(col("gen") === 2 &&
      (col("n_chars").isNull || col("quality").isNull)).count() == 0)
    // no row lost or duplicated across the generations
    assert(ev.select("doc_id").exceptAll(ref.select("doc_id")).count() == 0)
    assert(ref.select("doc_id").exceptAll(ev.select("doc_id")).count() == 0)
    ev.unpersist(): Unit
  }
}
