package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row
import graft.{SparkTestBase, Tables}

/** Pins [[Tables.tsToNanos]] across the testdata generations the
  * driver has actually shipped: events.ts as parquet TIMESTAMP(NANOS)
  * (Spark reads a nanos-since-epoch long under nanosAsLong) and as
  * TIMESTAMP(MICROS) isAdjustedToUTC=false (Spark reads
  * TIMESTAMP_NTZ). Round 9→10 regression: the micros generation made
  * `ts div 1000` unresolvable and silently dropped all 52
  * events-family queries out of the correctness gate — the normalizer
  * must hand every downstream operator the SAME nanos-long column for
  * either file, and the value must be the raw stored micros × 1000
  * (what DuckDB's epoch_us sees), independent of session timezone.
  */
class TsNormalizeSpec extends SparkTestBase {

  // 2024-01-01T00:00:00.123456 UTC in epoch micros
  private val micros = Seq(1704067200123456L, 1704067200000000L, 1704070800999999L)

  private def writeParquet(dt: DataType, rows: Seq[Row]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_ts").toString
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", dt)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
      .coalesce(1).write.mode("overwrite").parquet(dir)
    dir
  }

  test("TIMESTAMP_NTZ (micros generation) normalizes to raw-micros × 1000") {
    val rows = micros.zipWithIndex.map { case (us, i) =>
      Row(i.toLong, java.time.LocalDateTime.ofEpochSecond(
        us / 1000000L, (us % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC))
    }
    val dir = writeParquet(TimestampNTZType, rows)
    val read = spark.read.parquet(dir)
    assert(read.schema("ts").dataType == TimestampNTZType)
    val out = Tables.tsToNanos(read)
    assert(out.schema("ts").dataType == LongType)
    val got = out.orderBy("user_id").select("ts").collect().map(_.getLong(0)).toSeq
    assert(got == micros.map(_ * 1000L))
  }

  test("TIMESTAMP_NTZ normalization ignores a hostile session timezone") {
    val rows = micros.take(1).map(us =>
      Row(0L, java.time.LocalDateTime.ofEpochSecond(
        us / 1000000L, (us % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC)))
    val dir = writeParquet(TimestampNTZType, rows)
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
      val got = Tables.tsToNanos(spark.read.parquet(dir))
        .select("ts").collect().map(_.getLong(0)).toSeq
      assert(got == micros.take(1).map(_ * 1000L))
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("nanos-long generation (TIMESTAMP(NANOS) under nanosAsLong) passes through") {
    // nanosAsLong reads TIMESTAMP(NANOS) as LongType — tsToNanos must
    // leave an already-long ts untouched, bit for bit
    val nanos = micros.map(_ * 1000L + 789L) // sub-µs bits preserved
    val rows = nanos.zipWithIndex.map { case (ns, i) => Row(i.toLong, ns) }
    val dir = writeParquet(LongType, rows)
    val out = Tables.tsToNanos(spark.read.parquet(dir))
    assert(out.schema("ts").dataType == LongType)
    val got = out.orderBy("user_id").select("ts").collect().map(_.getLong(0)).toSeq
    assert(got == nanos)
  }

  test("frames without a ts column are untouched") {
    val df = spark.range(3).toDF("id")
    assert(Tables.tsToNanos(df) eq df)
  }

  test("TimestampType (tz-adjusted micros) also normalizes") {
    val rows = micros.take(2).zipWithIndex.map { case (us, i) =>
      Row(i.toLong, java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        us / 1000000L, (us % 1000000L) * 1000L)))
    }
    val dir = writeParquet(TimestampType, rows)
    val got = Tables.tsToNanos(spark.read.parquet(dir))
      .orderBy("user_id").select("ts").collect().map(_.getLong(0)).toSeq
    assert(got == micros.take(2).map(_ * 1000L))
  }
}
