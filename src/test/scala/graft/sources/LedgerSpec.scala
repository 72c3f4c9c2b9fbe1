package graft.sources

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Contracts of the Kafka-shaped DSv2 ledger source that no SQL
  * oracle can see: per-partition offset bookkeeping, admission-
  * control pacing, checkpoint recovery without loss or duplication,
  * and segment-visibility (index-gated) semantics.
  */
class LedgerSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpTopic(): String =
    java.nio.file.Files.createTempDirectory("graft_ledger").resolve("t").toString

  private def writeTopic(topic: String, parts: Int, perPart: Int,
                         segs: Int): Unit = {
    for (p <- 0 until parts; s <- 0 until segs) {
      val base = s * (perPart / segs)
      val n = if (s == segs - 1) perPart - base else perPart / segs
      Ledger.append(topic, p, (0 until n).map { i =>
        val id = base + i
        (1700000000000000000L + id * 1000000L, s"k$p-$id", s"""{"p":$p,"i":$id}""")
      })
    }
  }

  private def readAll(topic: String, extraOpts: Map[String, String] = Map.empty,
                      chk: Option[String] = None): org.apache.spark.sql.DataFrame = {
    val out = java.nio.file.Files.createTempDirectory("graft_ledger_out").toString
    val chkDir = chk.getOrElse(
      java.nio.file.Files.createTempDirectory("graft_ledger_chk").toString)
    var r = spark.readStream.format("graft.sources.LedgerProvider")
    extraOpts.foreach { case (k, v) => r = r.option(k, v) }
    val q = r.load(topic).writeStream
      .format("parquet").option("path", out)
      .option("checkpointLocation", chkDir).start()
    try q.processAllAvailable() finally q.stop()
    spark.read.schema(Ledger.schema).parquet(out)
  }

  test("reads every record with per-partition sequential offsets") {
    val t = tmpTopic()
    writeTopic(t, parts = 3, perPart = 100, segs = 4)
    val got = readAll(t)
    assert(got.count() == 300L)
    // offsets are exactly 0..99 in each partition, no gaps, no dupes
    val offs = got.groupBy("partition")
      .agg(count(lit(1)).as("n"), min("offset").as("mn"),
        max("offset").as("mx"), countDistinct("offset").as("d"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(offs.length == 3)
    offs.foreach { case (_, n, mn, mx, d) =>
      assert((n, mn, mx, d) == (100L, 0L, 99L, 100L))
    }
    // payload survives the envelope roundtrip
    val payload = got.select(from_json(col("value"),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("p", org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.types.StructField("i", org.apache.spark.sql.types.IntegerType)))).as("j"),
        col("partition"), col("offset"))
    assert(payload.filter(col("j.p") =!= col("partition") ||
      col("j.i") =!= col("offset").cast("int")).count() == 0L)
  }

  test("maxRecordsPerTrigger paces micro-batches with proportional allocation") {
    val t = tmpTopic()
    writeTopic(t, parts = 2, perPart = 50, segs = 2)
    val out = java.nio.file.Files.createTempDirectory("graft_ledger_out").toString
    val chk = java.nio.file.Files.createTempDirectory("graft_ledger_chk").toString
    var batches = 0
    val q = spark.readStream.format("graft.sources.LedgerProvider")
      .option("maxRecordsPerTrigger", "20").load(t)
      .writeStream.option("checkpointLocation", chk)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        batches += 1
        b.write.mode("append").parquet(out): Unit
      }.start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.read.schema(Ledger.schema).parquet(out)
    assert(got.count() == 100L)
    assert(got.select("partition", "offset").distinct().count() == 100L)
    assert(batches >= 5, s"expected >=5 paced batches, got $batches") // 100/20
  }

  test("checkpoint restart resumes at committed offsets: no loss, no dupes") {
    val t = tmpTopic()
    writeTopic(t, parts = 2, perPart = 30, segs = 3)
    val out = java.nio.file.Files.createTempDirectory("graft_ledger_out").toString
    val chk = java.nio.file.Files.createTempDirectory("graft_ledger_chk").toString
    def run(): Unit = {
      val q = spark.readStream.format("graft.sources.LedgerProvider")
        .load(t).writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", chk).start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    // producer appends AFTER the first run committed its offsets
    for (p <- 0 until 2)
      Ledger.append(t, p, (30 until 45).map { i =>
        (1700000000000000000L + i * 1000000L, s"k$p-$i", s"""{"p":$p,"i":$i}""")
      })
    run()
    val got = spark.read.schema(Ledger.schema).parquet(out)
    assert(got.count() == 90L) // 2*30 + 2*15, each exactly once
    assert(got.select("partition", "offset").distinct().count() == 90L)
    val maxOff = got.groupBy("partition").agg(max("offset")).collect()
      .map(_.getLong(1)).toSeq
    assert(maxOff == Seq(44L, 44L))
  }

  test("admission control never exceeds maxRecordsPerTrigger (exact budget)") {
    // ADVICE r14: the old per-partition max(1,·) progress floor could
    // admit maxRows + nPartitions - 1 rows. With maxRows=3 over 8
    // non-empty partitions the floor-and-round-robin split must hand
    // out EXACTLY 3 per batch (some partitions wait — their backlog
    // survives to the next trigger) and still drain everything.
    val t = tmpTopic()
    writeTopic(t, parts = 8, perPart = 6, segs = 1)
    val out = java.nio.file.Files.createTempDirectory("graft_ledger_out").toString
    val chk = java.nio.file.Files.createTempDirectory("graft_ledger_chk").toString
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("graft.sources.LedgerProvider")
      .option("maxRecordsPerTrigger", "3").load(t)
      .writeStream.option("checkpointLocation", chk)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        sizes += b.count()
        b.write.mode("append").parquet(out): Unit
      }.start()
    try q.processAllAvailable() finally q.stop()
    assert(sizes.forall(_ <= 3L), s"batch over budget: $sizes")
    val got = spark.read.schema(Ledger.schema).parquet(out)
    assert(got.count() == 48L)
    assert(got.select("partition", "offset").distinct().count() == 48L)
  }

  test("registerSegment validates the declared count against the file") {
    val t = tmpTopic()
    val seg = java.nio.file.Files.createTempFile("graft_seg", ".jsonl")
    java.nio.file.Files.write(seg,
      "{\"ts\":1,\"key\":\"a\",\"value\":\"x\"}\n{\"ts\":2,\"key\":\"b\",\"value\":\"y\"}\n".getBytes)
    val e = intercept[IllegalArgumentException] {
      Ledger.registerSegment(t, 0, seg.toFile, count = 5)
    }
    assert(e.getMessage.contains("declared count"))
    assert(Ledger.segments(t, 0).isEmpty) // nothing became visible
  }

  test("only index-registered segments are visible") {
    val t = tmpTopic()
    writeTopic(t, parts = 1, perPart = 10, segs = 1)
    // a fully-written but UNREGISTERED segment must not be consumed
    val orphan = new java.io.File(s"$t/p=0/seg-99999999999999999999.jsonl")
    java.nio.file.Files.write(orphan.toPath,
      "{\"ts\":1,\"key\":\"x\",\"value\":\"y\"}\n".getBytes)
    assert(readAll(t).count() == 10L)
  }
}
