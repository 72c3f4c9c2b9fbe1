package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.sources.ManifestTable._

/** Bin-packing compaction (round 17 — Delta OPTIMIZE's selection
  * behavior): only under-sized files rewrite; big files carry
  * forward BY REFERENCE (same names, zero IO). Pins: the reference
  * carry, content neutrality, no-op convergence, config
  * carry-forward, time travel across the maintenance commit, and
  * the streaming-sink interplay (replay still skips after packing).
  */
class ManifestOptimizeSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpTable(): String =
    java.nio.file.Files.createTempDirectory("graft_mop").resolve("t").toString

  /** 2 big files (500 rows each) + 6 small appended ones (50 each). */
  private def mkMixed(): String = {
    val t = tmpTable()
    create(spark, t, (0 until 1000).map(i => (i.toLong, s"v$i")).toDF("id", "s"),
      "id", 2)
    (0 until 6).foreach { b =>
      val lo = 1000 + b * 50
      assert(appendBatch(spark, t,
        (lo until lo + 50).map(i => (i.toLong, s"v$i")).toDF("id", "s"),
        "app", b.toLong, 1))
    }
    t
  }

  test("big files carry by reference; small ones bin-pack; content neutral") {
    val t = mkMixed()
    val before = readSnapshot(t, latestVersion(t))
    assert(before.files.size == 8)
    // the "big" files are v0's BY CONSTRUCTION — no size threshold:
    // the create's 2-bucket range split is sampled (seeded off global
    // RDD ids, so a full concurrent-suite run draws different
    // boundaries than a solo run and ≈500/500 can drift substantially)
    val bigNames = readSnapshot(t, 0).files.map(_.name).toSet
    assert(bigNames.size == 2)
    assert(before.files.filter(f => bigNames(f.name))
      .forall(_.rows > 100), // sanity: create files sit above minRows
      s"v0 split degenerate: ${before.files.map(_.rows).sorted}")
    val s = compactSmall(spark, t, minRows = 100, targetRows = 150)
    assert(s.op == "compact")
    // 300 small rows at target 150 → 2 packed files; the 2 big files
    // survive with their EXACT names (never rewritten, never moved).
    // The 150/150 split is only NOMINAL: the range partitioner
    // samples boundaries, and concurrent-suite load shifts file-split
    // planning — assert the invariants (2 files, all rows, each file
    // a real merge ≥ the bin-pack threshold), not the sampled split.
    assert(s.files.size == 4, s"got ${s.files.map(_.rows)}")
    assert(bigNames.subsetOf(s.files.map(_.name).toSet))
    val packed = s.files.filterNot(f => bigNames(f.name))
    assert(packed.map(_.rows).sum == 300 && packed.forall(_.rows >= 50),
      s"packed sizes ${packed.map(_.rows)}")
    // content neutral: every row exactly once
    val d = snapshot(spark, t).agg(count(lit(1)), sum(col("id"))).head()
    assert(d.getLong(0) == 1300 && d.getLong(1) == 1300L * 1299 / 2)
    // packed files got real stats (min/max cover the appended range)
    assert(s.files.filterNot(f => bigNames(f.name))
      .forall(f => f.minKey >= 1000 && f.maxKey <= 1299))
  }

  test("no-op convergence: a second pass commits nothing") {
    val t = mkMixed()
    val s1 = compactSmall(spark, t, minRows = 100)
    val v1 = s1.version
    val s2 = compactSmall(spark, t, minRows = 100) // everything ≥ 100 rows now
    assert(s2.version == v1 && latestVersion(t) == v1,
      "repeat maintenance must not commit empty rewrites")
    // single small file: also a no-op (nothing to merge with)
    val t2 = tmpTable()
    create(spark, t2, (0 until 500).map(i => (i.toLong, "x")).toDF("id", "s"), "id", 1)
    assert(appendBatch(spark, t2, Seq((600L, "y")).toDF("id", "s"), "a", 0L, 1))
    val v2 = latestVersion(t2)
    assert(compactSmall(spark, t2, minRows = 100).version == v2)
  }

  test("txn map, bloom config, and schema carry; time travel survives") {
    val t = tmpTable()
    create(spark, t, (0 until 400).map(i => (i.toLong, s"g-${(i * 7) % 400}"))
      .toDF("id", "g"), "id", 1, bloomFor = Seq("g"), bloomBits = 1 << 10)
    (0 until 4).foreach { b =>
      val lo = 400 + b * 25
      assert(appendBatch(spark, t,
        (lo until lo + 25).map(i => (i.toLong, s"g-$i")).toDF("id", "g"),
        "app", b.toLong, 1))
    }
    val vPre = latestVersion(t)
    val s = compactSmall(spark, t, minRows = 50, targetRows = 100)
    assert(s.txns == Map("app" -> 3L))
    assert(s.bloomCols == Seq("g") && s.bloomBits == (1 << 10))
    // a replayed batch STILL skips after maintenance
    assert(!appendBatch(spark, t,
      Seq((9999L, "g-X")).toDF("id", "g"), "app", 3L, 1))
    assert(latestVersion(t) == s.version)
    // packed files are bloom-indexed like any write
    assert(s.files.forall(_.blooms.contains("g")))
    val (hit, total) = matchingFiles(t, col("g") === "g-410")
    assert(hit.size < total)
    // the pre-maintenance version still reads (immutable history)
    assert(snapshot(spark, t, Some(vPre)).count() == 500)
    assert(snapshot(spark, t).count() == 500)
  }
}
