package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.{fp2, fp6, fpSql}
import graft.dsp.Design
import graft.streaming.Streaming

/** End-to-end Structured Streaming oracle queries (SURVEY.md §2.2
  * op 30): drive a file-source stream of the events table through a
  * stateful streaming operator into a sink table, then hand the sink
  * back as a batch DataFrame for the driver's DuckDB compare. The
  * oracle is the BATCH recursive-CTE twin — passing proves the
  * streaming operator's carried state reproduces the batch semantics
  * sample-for-sample, not just "rows came out".
  */
object Stream {

  /** events.parquet as a bounded file-source stream of [[Streaming.Event]].
    * ts is parquet TIMESTAMP(NANOS) read as a nanos long
    * (legacy.parquet.nanosAsLong); `timestamp_micros(ts div 1000)`
    * reproduces the µs truncation every batch oracle uses, so stream
    * and oracle see identical coordinates.
    */
  private def eventStream(s: SparkSession, dir: String) = {
    import s.implicits._
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$dir/events.parquet"
    val schema = s.read.parquet(path).schema
    // the file source wants a directory: stream the sf dir with a
    // glob filter selecting just the events table file(s)
    s.readStream.schema(schema).option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .select(col("user_id"),
        timestamp_micros(expr("ts div 1000")).as("ts"),
        col("event_type"), col("value"))
      .as[Streaming.Event]
  }

  /** Run a streaming Dataset to completion into a named in-memory sink
    * and return the sink contents. The memory sink is driver-local —
    * fine for the verification harness (the sink holds the filtered
    * sample frame at sf<=0.1); production streams write a real sink
    * (kafka/parquet) with the same plan.
    */
  private def runToSink(ds: org.apache.spark.sql.Dataset[_], name: String,
                        mode: String = "append"): DataFrame = {
    val q = ds.writeStream.format("memory").queryName(name)
      .outputMode(mode).start()
    try q.processAllAvailable() finally q.stop()
    ds.sparkSession.table(name)
  }

  /** Streaming sosfilt(butter(4, 0.3)) over the events stream —
    * byte-identical to the batch `sig_sosfilt` query (same filter,
    * same µs coordinates, same fp encoding), so it shares that
    * query's recursive-CTE oracle. `pos` comes from the operator's
    * carried per-key sample count, which is exactly the batch rank.
    */
  def streamSosfilt(s: SparkSession, dir: String): DataFrame =
    runToSink(
      Streaming.streamingSosfilt(eventStream(s, dir), Design.butterSos(4, 0.3)),
      "stream_sosfilt_sink")
      .select(col("user_id"), col("pos").cast("int").as("pos"),
        fp6(col("value")).as("value_fp"))
      .orderBy("user_id", "pos")

  /** Watermarked 5-minute tumbling-window counts per event_type over
    * the events stream, run in `complete` mode so the final (otherwise
    * watermark-held) windows emit when the bounded stream drains.
    * Spark aligns tumbling windows to the unix epoch, so the oracle is
    * a plain epoch-seconds div/mul bucket aggregation.
    */
  def streamWindowedCounts(s: SparkSession, dir: String): DataFrame =
    runToSink(
      Streaming.windowedCounts(eventStream(s, dir).toDF(), "5 minutes", "10 minutes"),
      "stream_wc_sink", mode = "complete")
      // timestamp → long = epoch seconds (exact: starts are 300 s
      // aligned); sum of 2-decimal values is exact on the 0.01 grid,
      // so fp2 buckets are boundary-safe
      .select(col("w_start").cast("long").as("w_start_s"), col("event_type"),
        col("n"), fp2(col("sum_value")).as("sum_fp"))
      .orderBy("w_start_s", "event_type")

  private val streamWindowedCountsSql: String =
    s"""SELECT (epoch_us(ts) // 300000000) * 300 AS w_start_s, event_type,
       |  COUNT(*) AS n, ${fpSql("SUM(value)", "100")} AS sum_fp
       |FROM events
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "stream_sosfilt" -> (streamSosfilt _),
    "stream_windowed_counts" -> (streamWindowedCounts _))

  /** stream_sosfilt replays the batch sosfilt semantics, so its oracle
    * IS the batch oracle. */
  val oracleSql: Map[String, String] = Map(
    "stream_sosfilt" -> Sig.sigSosfiltSql,
    "stream_windowed_counts" -> streamWindowedCountsSql)
}
