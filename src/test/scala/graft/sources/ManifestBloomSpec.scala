package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.sources.ManifestTable._

/** Per-file bloom index (round 17 — the Delta bloom-filter-index
  * role): equality / IN skipping on high-cardinality columns whose
  * values are SCRAMBLED across the file layout, where min/max spans
  * everything and range stats prune nothing. Pins: the no-false-
  * negative contract (every present value's file is always hit),
  * pruning engagement, the negative directions (≠ and ¬(=) never
  * bloom-prune), config carry-forward through every commit class,
  * the metadata-only setBloomIndex → compact indexing flow, and the
  * serde round-trip.
  */
class ManifestBloomSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpTable(): String =
    java.nio.file.Files.createTempDirectory("graft_mbl").resolve("t").toString

  /** 400 rows over 8 key-ranged files; `tag` is a high-cardinality
    * string whose values spread uniformly across files (hash-like),
    * so range stats on it can never prune.
    */
  private def mkIndexed(bits: Int = 1 << 12): (String, Seq[(Long, String, Long)]) = {
    val rows = (0 until 400).map(i =>
      (i.toLong, s"tag-${(i * 37) % 400}", ((i * 101) % 400).toLong))
    val t = tmpTable()
    create(spark, t, rows.toDF("id", "tag", "gid"), "id", 8,
      bloomFor = Seq("tag", "gid"), bloomBits = bits)
    (t, rows)
  }

  test("serde round-trip: bloomCols/bloomBits/blobs survive the JSON manifest") {
    val (t, _) = mkIndexed()
    val s0 = readSnapshot(t, 0)
    assert(s0.bloomCols == Seq("tag", "gid") && s0.bloomBits == (1 << 12))
    assert(s0.files.size == 8)
    s0.files.foreach { f =>
      assert(f.blooms.keySet == Set("tag", "gid"))
      val (words, k) = bloomUnblob(f.blooms("tag"))
      assert(words.length == (1 << 12) / 64 && k == 6)
      assert(words.exists(_ != 0L)) // bits actually set
    }
  }

  test("equality on a scrambled string column prunes; present values never miss") {
    val (t, rows) = mkIndexed()
    // control: range stats alone cannot prune tag (every file spans
    // nearly the whole lexicographic space) — proven by probing a
    // value that is ABSENT yet inside every file's [min,max]
    val sAbsent = matchingFiles(t, col("tag") === "tag-09999")
    assert(sAbsent._1.isEmpty, // bloom proves absence in every file
      s"absent probe hit ${sAbsent._1.size} files")
    // no false negatives: EVERY present value's containing file is hit
    val byFile = readSnapshot(t, 0).files.map(f => f.name ->
      rows.filter { case (id, _, _) => id >= f.minKey && id <= f.maxKey }).toMap
    byFile.foreach { case (fname, contents) =>
      contents.take(7).foreach { case (_, tag, _) =>
        val (hit, _) = matchingFiles(t, col("tag") === tag)
        assert(hit.exists(_.name == fname), s"false negative: $tag not in $fname")
      }
    }
    // and pruning engages: one value lives in exactly one file, so a
    // probe should hit far fewer than all 8 (fp-rate slack: allow 3)
    val (hit, total) = matchingFiles(t, col("tag") === "tag-123")
    assert(total == 8 && hit.size <= 3, s"probe hit ${hit.size}/8")
    // the read itself returns exactly the matching row
    val got = snapshotWhere(spark, t, col("tag") === "tag-123")
      .select("id").as[Long].collect()
    assert(got.toSeq == rows.filter(_._2 == "tag-123").map(_._1))
  }

  test("integral column probes: IN list, int-vs-long literals, range synergy") {
    val (t, rows) = mkIndexed()
    // gid is integral; literal arrives as Int — canonical "5" either way
    val (h1, _) = matchingFiles(t, col("gid") === 123)
    val (h2, _) = matchingFiles(t, col("gid") === 123L)
    assert(h1.map(_.name) == h2.map(_.name) && h1.size <= 3)
    // IN = union of per-element probes
    val (hIn, total) = matchingFiles(t, col("gid").isin(7L, 555L))
    assert(hIn.nonEmpty && hIn.size < total)
    val got = snapshotWhere(spark, t, col("gid").isin(7L, 555L))
      .select("id").as[Long].collect().sorted
    assert(got.toSeq == rows.filter(r => r._3 == 7L || r._3 == 555L).map(_._1).sorted)
    // a long literal beyond the column's whole domain: provably absent
    assert(matchingFiles(t, col("gid") === 5000000000L)._1.isEmpty)
    // ¬(≠) is positive equality — bloom applies there too
    assert(matchingFiles(t, !(col("gid") =!= 5000000000L))._1.isEmpty)
  }

  test("negative directions never bloom-prune: ≠, fractional and mistyped literals") {
    val (t, _) = mkIndexed()
    val total = readSnapshot(t, 0).files.size
    // ≠ an absent value: true for every row — must hit ALL files
    assert(matchingFiles(t, col("tag") =!= "tag-09999")._1.size == total)
    assert(matchingFiles(t, !(col("tag") === "tag-09999"))._1.size == total)
    // fractional literal on an integral column: unprobeable by the
    // bloom, so only range stats act — 100.5 is inside every file's
    // gid [min,max] (mins ≤ 53, maxes ≥ 346), so nothing may prune
    // even though NO row can ever equal it
    assert(matchingFiles(t, col("gid") === 100.5)._1.size == total)
    // number literal on a string column: unprobeable, degrade
    assert(matchingFiles(t, col("tag") === 42)._1.size == total)
    // null literal: never prunes via bloom
    assert(matchingFiles(t, col("tag") === lit(null))._1.size == total)
  }

  test("nulls: bloom covers non-null values; equality still exact") {
    val t = tmpTable()
    val df = (0 until 100).map(i =>
      (i.toLong, if (i % 4 == 0) null else s"v-${(i * 7) % 100}")).toDF("id", "s")
    create(spark, t, df, "id", 4, bloomFor = Seq("s"), bloomBits = 1 << 10)
    val (hit, _) = matchingFiles(t, col("s") === "v-21")
    assert(hit.nonEmpty && hit.size <= 2)
    assert(snapshotWhere(spark, t, col("s") === "v-21").count() ==
      (0 until 100).count(i => i % 4 != 0 && (i * 7) % 100 == 21))
    // isNull unaffected by the index
    assert(snapshotWhere(spark, t, col("s").isNull).count() == 25)
  }

  test("config carries through upsert/evolve/delete/compact; rewrites re-index") {
    val (t, _) = mkIndexed()
    upsert(spark, t, Seq((5L, "tag-NEW", 999L)).toDF("id", "tag", "gid"), 8)
    addColumns(t, Seq(org.apache.spark.sql.types.StructField(
      "extra", org.apache.spark.sql.types.DoubleType)))
    deleteRange(spark, t, 390L, 399L)
    compact(spark, t, buckets = 4)
    val s = readSnapshot(t, latestVersion(t))
    assert(s.bloomCols == Seq("tag", "gid") && s.bloomBits == (1 << 12))
    assert(s.files.size == 4 && s.files.forall(_.blooms.keySet == Set("tag", "gid")))
    // the upserted value is probeable after all the rewrites
    val (hit, total) = matchingFiles(t, col("tag") === "tag-NEW")
    assert(hit.size < total)
    assert(snapshotWhere(spark, t, col("tag") === "tag-NEW")
      .select("id").as[Long].collect().toSeq == Seq(5L))
    // and the deleted range's ids are gone while absent probes stay clean
    assert(matchingFiles(t, col("tag") === "tag-09999")._1.isEmpty)
  }

  test("setBloomIndex is metadata-only; compact materializes the index") {
    val t = tmpTable()
    val rows = (0 until 200).map(i => (i.toLong, s"h-${(i * 13) % 200}"))
    create(spark, t, rows.toDF("id", "h"), "id", 8) // NO index at create
    assert(matchingFiles(t, col("h") === "h-55")._1.size == 8) // nothing prunes
    val s1 = setBloomIndex(t, Seq("h"), bloomBits = 1 << 10)
    assert(s1.op == "evolve" && s1.bloomCols == Seq("h"))
    // existing files unchanged (zero data IO), still un-indexed
    assert(s1.files == readSnapshot(t, 0).files)
    assert(matchingFiles(t, col("h") === "h-55")._1.size == 8)
    // one compact rebuilds every file WITH blooms — now it prunes
    compact(spark, t, buckets = 8)
    val (hit, total) = matchingFiles(t, col("h") === "h-55")
    assert(total == 8 && hit.size <= 3, s"post-compact probe hit ${hit.size}/8")
    assert(snapshotWhere(spark, t, col("h") === "h-55")
      .select("id").as[Long].collect().toSeq ==
      rows.filter(_._2 == "h-55").map(_._1))
  }

  test("appendBatch builds blooms for appended files under the table config") {
    val t = tmpTable()
    create(spark, t, Seq((0L, "a-0")).toDF("id", "s"), "id", 1,
      bloomFor = Seq("s"), bloomBits = 1 << 10)
    val batch = (100 until 200).map(i => (i.toLong, s"a-${(i * 3) % 500}"))
    assert(appendBatch(spark, t, batch.toDF("id", "s"), "app", 0L, 4))
    val s = readSnapshot(t, latestVersion(t))
    assert(s.op == "append" && s.files.forall(_.blooms.contains("s")))
    val (hit, total) = matchingFiles(t, col("s") === "a-300")
    assert(hit.size < total)
    assert(snapshotWhere(spark, t, col("s") === "a-300").count() ==
      batch.count(_._2 == "a-300"))
  }

  test("type and config guards are loud") {
    val t = tmpTable()
    val df = Seq((1L, 2.5, "x")).toDF("id", "d", "s")
    val e1 = intercept[IllegalArgumentException] {
      create(spark, t, df, "id", 1, bloomFor = Seq("d"))
    }
    assert(e1.getMessage.contains("unsupported type"))
    val e2 = intercept[IllegalArgumentException] {
      create(spark, t, df, "id", 1, bloomFor = Seq("nope"))
    }
    assert(e2.getMessage.contains("not in schema"))
    val e3 = intercept[IllegalArgumentException] {
      create(spark, t, df, "id", 1, bloomFor = Seq("s"), bloomBits = 100)
    }
    assert(e3.getMessage.contains("multiple of 64"))
  }
}
