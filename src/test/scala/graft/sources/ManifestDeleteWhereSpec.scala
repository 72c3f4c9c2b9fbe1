package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.sources.ManifestTable._

/** Predicate DELETE (round 17 — DELETE WHERE over the transaction
  * log): the three-tier stats plan (carry / metadata-drop / rewrite),
  * SQL NULL semantics (a NULL predicate KEEPS the row, so a
  * null-bearing file may never whole-file drop), and the safe
  * degradation directions.
  */
class ManifestDeleteWhereSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpTable(): String =
    java.nio.file.Files.createTempDirectory("graft_mdw").resolve("t").toString

  test("three tiers engage on a value-clustered table; content exact") {
    val t = tmpTable()
    // cluster by v so each of 8 files carries a tight v range
    val df = (0 until 800).map(i => (i.toLong, ((i * 37) % 800).toDouble))
      .toDF("id", "v")
    create(spark, t, df, "id", 8, clusterBy = Some("v"))
    val s = deleteWhere(spark, t, col("v") >= 150.0 && col("v") < 450.0)
    val (carried, dropped, rewritten) = lastDeleteWherePlan(t).get
    assert(carried >= 1 && dropped >= 1 && rewritten >= 1,
      s"tiers did not all engage: carried=$carried dropped=$dropped rewritten=$rewritten")
    assert(carried + dropped + rewritten == 8)
    // carried files survive BY NAME
    val v0Names = readSnapshot(t, 0).files.map(_.name).toSet
    assert(s.files.count(f => v0Names(f.name)) == carried)
    // exact SQL-DELETE semantics
    val got = snapshot(spark, t).select("id").as[Long].collect().sorted
    val want = (0 until 800).filter(i =>
      !((i * 37) % 800 >= 150 && (i * 37) % 800 < 450)).map(_.toLong)
    assert(got.toSeq == want)
  }

  test("NULL rows are KEPT and block the metadata-drop tier") {
    val t = tmpTable()
    // one file, all non-null values inside the band, plus NULL rows:
    // ¬pred is provably unsatisfiable on the stats, but the nulls
    // make whole-file drop unsafe — must rewrite and keep the NULLs
    val df = (0 until 100).map(i =>
      (i.toLong, if (i % 10 == 0) None else Some(200.0 + i % 50)))
      .toDF("id", "v")
    create(spark, t, df, "id", 1)
    deleteWhere(spark, t, col("v") >= 100.0 && col("v") < 300.0)
    val (_, dropped, rewritten) = lastDeleteWherePlan(t).get
    assert(dropped == 0 && rewritten == 1)
    val left = snapshot(spark, t).select("id").as[Long].collect().sorted
    assert(left.toSeq == (0L until 100L by 10L)) // exactly the NULL rows
  }

  test("null-free file fully inside the band drops metadata-only") {
    val t = tmpTable()
    val df = (0 until 100).map(i => (i.toLong, 200.0 + i % 50)).toDF("id", "v")
    create(spark, t, df, "id", 1)
    val dataBefore = new java.io.File(t, "data").listFiles().map(_.getName).toSet
    val s = deleteWhere(spark, t, col("v") >= 100.0 && col("v") < 300.0)
    assert(lastDeleteWherePlan(t) == Some((0, 1, 0)))
    assert(s.files.isEmpty && snapshot(spark, t).count() == 0)
    // metadata-only: the dropped file still exists for time travel
    assert(new java.io.File(t, "data").listFiles().map(_.getName).toSet == dataBefore)
    assert(snapshot(spark, t, Some(0)).count() == 100)
  }

  test("deleteKeys: scattered key list rewrites only containing files") {
    val t = tmpTable()
    val df = (0 until 800).map(i => (i.toLong, s"r$i")).toDF("id", "s")
    create(spark, t, df, "id", 8) // key-ranged: 100 ids per file
    // victims live in 2 of the 8 files; list includes dups, a NULL,
    // and keys the table never had
    val victims = Seq(Some(5L), Some(7L), Some(5L), Some(750L), None,
      Some(99999L)).toDF("k")
    val s = deleteKeys(spark, t, victims)
    val v0Names = readSnapshot(t, 0).files.map(_.name).toSet
    assert(s.files.count(f => v0Names(f.name)) == 6,
      s"expected 6 carried files, sizes ${s.files.map(_.rows)}")
    val got = snapshot(spark, t).select("id").as[Long].collect().sorted
    assert(got.toSeq == (0L until 800L).filterNot(Set(5L, 7L, 750L)))
    // an all-absent key list carries EVERY file (zero IO delete)
    val s2 = deleteKeys(spark, t, Seq(123456L).toDF("k"))
    assert(s2.files.map(_.name).toSet == s.files.map(_.name).toSet)
  }

  test("unprovable shapes degrade to rewrite-everything, never to a wrong answer") {
    val t = tmpTable()
    val df = (0 until 200).map(i => (i.toLong, s"w$i")).toDF("id", "s")
    create(spark, t, df, "id", 2)
    // length() is an unknown function to the evaluator: both proofs
    // fail, every file rewrites, the filter still lands exactly
    deleteWhere(spark, t, length(col("s")) === 2)
    val (carried, dropped, _) = lastDeleteWherePlan(t).get
    assert(carried == 0 && dropped == 0)
    assert(snapshot(spark, t).count() == 190) // w0..w9 deleted
    // a null LITERAL deletes nothing (pred is NULL everywhere)
    deleteWhere(spark, t, col("s") === lit(null))
    assert(snapshot(spark, t).count() == 190)
  }
}
