package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.sources.ManifestTable._

/** CHECK constraints (round 17 — Delta's ALTER TABLE ADD CONSTRAINT):
  * SQL semantics (violation iff FALSE, NULL passes), enforced on the
  * user-supplied frame of every data-adding commit BEFORE anything is
  * written, validated against existing data at ADD time, carried
  * forward by every commit class, restored BACK by restore, and
  * droppable. Pins every direction plus the atomicity property (a
  * rejected commit leaves no version and no orphan file).
  */
class ManifestConstraintSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpTable(): String =
    java.nio.file.Files.createTempDirectory("graft_mck").resolve("t").toString

  private def mk(): String = {
    val t = tmpTable()
    create(spark, t,
      (0 until 100).map(i => (i.toLong, i * 10, s"s$i")).toDF("id", "v", "s"),
      "id", 2, constraints = Map("v_nonneg" -> "v >= 0"))
    t
  }

  test("create/upsert/appendBatch reject violating input before any write") {
    val t = mk()
    val dataFiles = new java.io.File(t, "data").listFiles().map(_.getName).toSet
    val e1 = intercept[IllegalArgumentException] {
      upsert(spark, t, Seq((5L, -1, "bad")).toDF("id", "v", "s"), 2)
    }
    assert(e1.getMessage.contains("v_nonneg") && e1.getMessage.contains("1 row"))
    val e2 = intercept[IllegalArgumentException] {
      appendBatch(spark, t, Seq((500L, -7, "bad")).toDF("id", "v", "s"), "a", 0L, 1)
    }
    assert(e2.getMessage.contains("v_nonneg"))
    // atomicity: no new version, no orphan data file, state unchanged
    assert(latestVersion(t) == 0)
    assert(new java.io.File(t, "data").listFiles().map(_.getName).toSet == dataFiles)
    assert(snapshot(spark, t).count() == 100)
    // and a violating CREATE never materializes a table
    val t2 = tmpTable()
    intercept[IllegalArgumentException] {
      create(spark, t2, Seq((1L, -5, "x")).toDF("id", "v", "s"), "id", 1,
        constraints = Map("v_nonneg" -> "v >= 0"))
    }
    assert(!new java.io.File(t2, "_log").exists())
  }

  test("valid commits pass; NULL evaluates as non-violation (SQL CHECK)") {
    val t = tmpTable()
    create(spark, t,
      Seq((1L, Some(5)), (2L, None)).toDF("id", "v"), "id", 1,
      constraints = Map("v_pos" -> "v > 0")) // the NULL row passes
    upsert(spark, t, Seq((3L, Some(7))).toDF("id", "v"), 1)
    assert(appendBatch(spark, t, Seq((10L, None: Option[Int])).toDF("id", "v"),
      "a", 0L, 1))
    assert(snapshot(spark, t).count() == 4)
  }

  test("setConstraint validates existing data; add/drop are metadata commits") {
    val t = mk()
    // a constraint existing data violates is rejected outright
    val e = intercept[IllegalArgumentException] {
      setConstraint(spark, t, "v_small", "v < 500")
    }
    assert(e.getMessage.contains("existing data") && latestVersion(t) == 0)
    // a holdable one lands as evolve and bites on the next commit
    val s1 = setConstraint(spark, t, "v_cap", "v <= 2000")
    assert(s1.op == "evolve" && s1.files == readSnapshot(t, 0).files)
    intercept[IllegalArgumentException] {
      upsert(spark, t, Seq((7L, 9999, "x")).toDF("id", "v", "s"), 2)
    }
    // duplicate add is loud; drop lifts enforcement
    intercept[IllegalArgumentException] { setConstraint(spark, t, "v_cap", "v <= 1") }
    dropConstraint(t, "v_cap")
    upsert(spark, t, Seq((7L, 9999, "x")).toDF("id", "v", "s"), 2)
    assert(snapshot(spark, t).filter(col("v") === 9999).count() == 1)
    intercept[IllegalArgumentException] { dropConstraint(t, "nope") }
  }

  test("constraints carry through every commit class; restore restores BACK") {
    val t = mk()
    assert(appendBatch(spark, t,
      Seq((200L, 1, "a")).toDF("id", "v", "s"), "app", 0L, 1)) // v1
    compact(spark, t, 2)                                       // v2
    addColumns(t, Seq(org.apache.spark.sql.types.StructField(
      "extra", org.apache.spark.sql.types.DoubleType)))        // v3
    deleteRange(spark, t, 90L, 99L)                            // v4
    assert(readSnapshot(t, 4).constraints == Map("v_nonneg" -> "v >= 0"))
    setConstraint(spark, t, "v_cap", "v <= 100000")            // v5
    restore(t, 4)                                              // v6: pre-cap
    assert(readSnapshot(t, 6).constraints == Map("v_nonneg" -> "v >= 0"))
    // enforcement reflects the restored set: the cap is gone, nonneg isn't
    upsert(spark, t, Seq((7L, 999999, "x", None: Option[Double]))
      .toDF("id", "v", "s", "extra"), 2)
    intercept[IllegalArgumentException] {
      upsert(spark, t, Seq((8L, -1, "x", None: Option[Double]))
        .toDF("id", "v", "s", "extra"), 2)
    }
  }
}
