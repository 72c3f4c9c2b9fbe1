package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.sources.ManifestTable._

/** Per-column file stats + stats-predicate data skipping (round 17):
  * the stats job's coverage (min/max/nulls, typed round-trip through
  * the JSON manifest), the pruning evaluator's provable-miss cases,
  * and — most importantly — every direction it must NOT prune:
  * unknown expressions, incomparable domains, NaN bounds, pre-stats
  * manifests, and the UTF-8-vs-UTF-16 string-order trap.
  */
class ManifestStatsSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpTable(): String =
    java.nio.file.Files.createTempDirectory("graft_mst").resolve("t").toString

  test("writeFiles records per-column min/max/null stats, typed round-trip") {
    val t = tmpTable()
    val df = (0 until 100).map(i =>
      (i.toLong, if (i % 5 == 0) null else s"s-$i", i * 1.5, i % 2 == 0))
      .toDF("id", "txt", "score", "flag")
    create(spark, t, df, "id", 2)
    val s0 = readSnapshot(t, 0) // re-parsed from JSON — serde round-trip included
    assert(s0.files.size == 2)
    s0.files.foreach { f =>
      val txt = f.stats("txt")
      assert(txt.nulls == f.rows / 5)
      assert(txt.min.isDefined && txt.max.isDefined)
      val sc = f.stats("score")
      assert(sc.nulls == 0)
      // double bounds round-trip exactly (Double.toString form)
      assert(sc.min.get.toDouble == f.minKey * 1.5)
      assert(sc.max.get.toDouble == f.maxKey * 1.5)
      val fl = f.stats("flag")
      assert(fl.min.contains("false") && fl.max.contains("true"))
      val id = f.stats("id")
      assert(id.min.get.toLong == f.minKey && id.max.get.toLong == f.maxKey)
    }
  }

  test("snapshotWhere prunes provable misses and equals the full-scan filter") {
    val t = tmpTable()
    val df = (0 until 1000).map(i => (i.toLong, i * 2.0, s"g${i / 250}"))
      .toDF("id", "v", "grp")
    create(spark, t, df, "id", 8)
    val pred = col("v") >= 500.0 && col("v") < 700.0
    val (hit, total) = matchingFiles(t, pred)
    assert(total == 8 && hit.size <= 2, s"expected <=2 of 8 files, got ${hit.size}")
    val got = snapshotWhere(spark, t, pred).select("id").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == (250L until 350L))
    // string equality pruning: grp g3 lives in the last quarter
    val (hit2, _) = matchingFiles(t, col("grp") === "g3")
    assert(hit2.size <= 2)
    assert(snapshotWhere(spark, t, col("grp") === "g3").count() == 250)
  }

  test("clusterBy gives the stats column tight per-file ranges; upsert stays correct") {
    val t = tmpTable()
    // value column is a SCRAMBLED permutation of the key (37 ⊥ 800),
    // so key-ranged files each span ~the full value range (no pruning)
    val df = (0 until 800).map(i => (i.toLong, ((i * 37) % 800).toDouble))
      .toDF("id", "v")
    create(spark, t, df, "id", 8, clusterBy = Some("v"))
    val (hit, total) = matchingFiles(t, col("v") >= 700.0)
    assert(total == 8 && hit.size == 1, s"clustered read hit ${hit.size} of 8")
    // un-clustered control: the same data keyed the same way prunes nothing
    val tc = tmpTable()
    create(spark, tc, df, "id", 8)
    assert(matchingFiles(tc, col("v") >= 700.0)._1.size == 8)
    // COW upsert on the cluster-layout table (overlapping key ranges)
    upsert(spark, t, Seq((400L, 9999.0)).toDF("id", "v"), buckets = 1)
    val after = snapshot(spark, t)
    assert(after.count() == 800)
    assert(after.filter(col("id") === 400L).head().getDouble(1) == 9999.0)
  }

  test("string pruning orders by UTF-8 bytes, not UTF-16 code units") {
    // U+1F600 (4-byte UTF-8, surrogate pair in UTF-16) vs U+FB01:
    // UTF-8 order: "ﬁ" < "😀"; UTF-16 order reverses them.
    val emoji = new String(Character.toChars(0x1F600))
    val lig = "ﬁ"
    assert(emoji.compareTo(lig) < 0, "precondition: UTF-16 order reverses")
    val t = tmpTable()
    create(spark, t, Seq((1L, emoji)).toDF("id", "s"), "id", 1)
    // a UTF-16 comparator would conclude max(s) < lig and prune — wrongly
    val (hit, _) = matchingFiles(t, col("s") > lig)
    assert(hit.size == 1, "UTF-16 ordering would have pruned the matching file")
    assert(snapshotWhere(spark, t, col("s") > lig).count() == 1)
  }

  test("never prunes on: unknown exprs, mixed domains, NaN bounds, null literals") {
    val t = tmpTable()
    val df = (0 until 100).map(i =>
      (i.toLong, if (i == 50) Double.NaN else i * 1.0, s"s-$i"))
      .toDF("id", "v", "s")
    create(spark, t, df, "id", 4)
    // unknown expression shape: correct via residual filter, no pruning
    assert(matchingFiles(t, length(col("s")) > 3)._1.size == 4)
    assert(snapshotWhere(spark, t, length(col("s")) > 3).count() == 90)
    // mixed domain (string col vs numeric literal expression shape)
    assert(matchingFiles(t, col("s") > lit(5).cast("string"))._1.size == 4)
    // NaN max bound on v's file: present-but-unusable must NOT prune
    val s0 = readSnapshot(t, 0)
    val nanFile = s0.files.find(_.stats("v").max.contains("NaN"))
    assert(nanFile.isDefined, "Spark max should order NaN greatest")
    val st = schemaOf(s0).get
    val pe = org.apache.spark.sql.graftshim.NodeInternals.predTree(col("v") > 1e9)
    assert(canMatch(nanFile.get, st, pe), "NaN bound treated as all-NULL (unsafe prune)")
    // null literal comparisons: no pruning claim
    assert(matchingFiles(t, col("v") > lit(null).cast("double"))._1.size == 4)
  }

  test("all-NULL column prunes comparisons but keeps IS NULL; IS NOT NULL prunes it") {
    val t = tmpTable()
    val some = (0 until 50).map(i => (i.toLong, Some(i * 1.0)))
    val none = (50 until 100).map(i => (i.toLong, Option.empty[Double]))
    val df = (some ++ none).toDF("id", "v")
    create(spark, t, df, "id", 2) // key-ranged: file 2 is the all-NULL half
    val s0 = readSnapshot(t, 0)
    val nullFile = s0.files.find(_.stats("v").min.isEmpty).get
    val st = schemaOf(s0).get
    def pe(c: org.apache.spark.sql.Column) =
      org.apache.spark.sql.graftshim.NodeInternals.predTree(c)
    assert(!canMatch(nullFile, st, pe(col("v") > 0.0)))
    assert(!canMatch(nullFile, st, pe(col("v") === 10.0)))
    assert(canMatch(nullFile, st, pe(col("v").isNull)))
    assert(!canMatch(nullFile, st, pe(col("v").isNotNull)))
    val full = s0.files.find(_.stats("v").nulls == 0).get
    assert(!canMatch(full, st, pe(col("v").isNull)))
    assert(matchingFiles(t, col("v").isNotNull)._1.size == 1)
    assert(snapshotWhere(spark, t, col("v").isNotNull).count() == 50)
  }

  test("boolean algebra: Or keeps either side, Not pushes down (De Morgan), In") {
    val t = tmpTable()
    val df = (0 until 400).map(i => (i.toLong, i * 1.0)).toDF("id", "v")
    create(spark, t, df, "id", 4) // files: [0,100),[100,200),[200,300),[300,400)
    assert(matchingFiles(t, col("v") < 50.0 || col("v") >= 350.0)._1.size == 2)
    // ¬(v >= 100 ∧ v < 300) = v < 100 ∨ v >= 300
    assert(matchingFiles(t, !(col("v") >= 100.0 && col("v") < 300.0))._1.size == 2)
    assert(matchingFiles(t, col("v").isin(42.0, 242.0))._1.size == 2)
    assert(snapshotWhere(spark, t, col("v").isin(42.0, 242.0)).count() == 2)
    // != prunes only a constant file
    val tc = tmpTable()
    create(spark, tc, Seq((1L, 5.0), (2L, 5.0)).toDF("id", "v"), "id", 1)
    assert(matchingFiles(tc, col("v") =!= 5.0)._1.isEmpty)
    assert(matchingFiles(tc, col("v") =!= 6.0)._1.size == 1)
  }

  test("z-order recluster: BOTH columns prune afterwards; contents identical") {
    val t = tmpTable()
    // a and b are independent scrambled permutations: a key-ranged or
    // single-column-clustered layout cannot serve both predicates
    val df = (0 until 1600).map(i =>
      (i.toLong, ((i * 37) % 1600).toDouble, ((i * 101) % 1600).toDouble))
      .toDF("id", "a", "b")
    create(spark, t, df, "id", 16)
    assert(matchingFiles(t, col("a") < 100.0)._1.size == 16) // control: no locality
    compactZOrder(spark, t, Seq("a", "b"), buckets = 16)
    val s1 = readSnapshot(t, 1)
    assert(s1.op == "compact" && s1.files.size == 16)
    // one z-quartile-cell band per column: at 4 bits × 2 cols and 16
    // files, the file grid factors into a 4×4 quantile grid — a
    // quarter-span band on EITHER column hits one row/column of cells
    // (+ range-boundary straddle slack: file cuts need not align to cells)
    val (hitA, totalA) = matchingFiles(t, col("a") >= 405.0 && col("a") < 795.0)
    val (hitB, totalB) = matchingFiles(t, col("b") >= 405.0 && col("b") < 795.0)
    assert(totalA == 16 && hitA.size <= 10, s"a-band hit ${hitA.size}/16")
    assert(totalB == 16 && hitB.size <= 10, s"b-band hit ${hitB.size}/16")
    // the rewrite is content-neutral
    val digest = snapshot(spark, t).agg(
      count(lit(1)), sum(col("id")), sum(col("a")), sum(col("b"))).head()
    assert(digest.getLong(0) == 1600 && digest.getLong(1) == 1600L * 1599 / 2)
    assert(digest.getDouble(2) == digest.getDouble(3))
    // and the z read path answers a point query correctly
    assert(snapshotWhere(spark, t, col("a") === 500.0 && col("b") >= 0.0).count() == 1)
  }

  test("snapshotWhere's residual filter reaches the parquet scan (PushedFilters)") {
    val t = tmpTable()
    val df = (0 until 400).map(i => (i.toLong, (i % 100).toDouble)).toDF("id", "v")
    create(spark, t, df, "id", 4)
    val read = snapshotWhere(spark, t, col("v") >= 50.0)
    // file-level skipping happens at the manifest; ROW-GROUP-level
    // skipping inside the surviving files is Spark's job, and it only
    // happens if the residual filter is pushed into the scan — a plan
    // where PushedFilters is empty reads every row group of every hit
    // file, which at 100 TB is the difference that matters
    val scan = read.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(v), GreaterThanOrEqual(v,50.0)]")
      || scan.contains("GreaterThanOrEqual(v,50.0)"),
      s"residual predicate not pushed to the scan:\n$scan")
    assert(read.count() == 400 / 2)
  }

  test("pre-stats manifests (no stats maps) read fine and never prune") {
    val t = tmpTable()
    val df = (0 until 100).map(i => (i.toLong, i * 1.0)).toDF("id", "v")
    create(spark, t, df, "id", 2)
    val s0 = readSnapshot(t, 0)
    // simulate an old-format manifest: same files, stats stripped
    commit(t, s0.copy(version = 1, op = "compact",
      files = s0.files.map(_.copy(stats = Map.empty))))
    assert(matchingFiles(t, col("v") > 1e9, Some(1))._1.size == 2)
    assert(snapshotWhere(spark, t, col("v") >= 50.0, Some(1)).count() == 50)
    // and the stripped manifest round-trips through the serde
    assert(readSnapshot(t, 1).files.forall(_.stats.isEmpty))
  }
}
