package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkTestBase
import graft.dsp.{Design, Filt}
import graft.streaming.Streaming.{Event, FilteredPoint, Session}

class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(minutes: Double): Timestamp =
    new Timestamp((minutes * 60000).toLong)

  test("windowed aggregation with watermark over a memory stream") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Streaming.windowedCounts(in.toDF(), "5 minutes", "10 minutes")
      .writeStream.format("memory").queryName("wc").outputMode("update").start()
    try {
      in.addData(
        Event(1, ts(0.5), "click", 1.0), Event(1, ts(1.5), "click", 2.0),
        Event(2, ts(6.0), "view", 5.0))
      q.processAllAvailable()
      val rows = spark.table("wc")
        .select("w_start", "event_type", "n", "sum_value").collect()
        .map(r => (r.getTimestamp(0).getTime / 60000, r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(rows.contains((0L, "click", 2L, 3.0)))
      assert(rows.contains((5L, "view", 1L, 5.0)))
    } finally q.stop()
  }

  test("stream-stream interval join matches across micro-batch boundaries") {
    implicit val sc = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val inL = MemoryStream[Event]
    val inR = MemoryStream[Event]
    val left = inL.toDF().select(col("user_id"), col("ts").as("c_ts"),
      col("value").as("c_value"))
    val right = inR.toDF().select(col("user_id").as("p_user"),
      col("ts").as("p_ts"), col("value").as("p_value"))
    val q = Streaming.streamStreamIntervalJoin(left, right,
      "user_id", "c_ts", "p_user", "p_ts", maxDelayMs = 600000L)
      .writeStream.format("memory").queryName("ssj").outputMode("append").start()
    try {
      // base offset: the engine's INITIAL watermark is epoch 0 and the
      // late filter is `eventTime > watermark`, so a row at exactly
      // ts(0) would be dropped before reaching join state
      val b = 1000
      // batch 1: a click for users 1 and 2; no purchases yet
      inL.addData(Event(1, ts(b), "click", 1.0), Event(2, ts(b + 1), "click", 2.0))
      q.processAllAvailable()
      assert(spark.table("ssj").count() === 0)
      // batch 2: purchases — user 1 inside the 10-min window (cross-
      // batch match via buffered join state), user 2 outside it, and a
      // user-3 purchase with no click at all
      inR.addData(Event(1, ts(b + 5), "purchase", 10.0),
        Event(2, ts(b + 20), "purchase", 20.0), Event(3, ts(b + 2), "purchase", 30.0))
      q.processAllAvailable()
      val rows = spark.table("ssj")
        .select("user_id", "c_value", "p_value").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
      assert(rows === Set((1L, 1.0, 10.0)))
      // batch 3: a purchase BEFORE the click's time never joins
      // (rightTs >= leftTs is one-sided)
      inR.addData(Event(1, ts(b - 3), "purchase", 40.0))
      q.processAllAvailable()
      assert(spark.table("ssj").count() === 1)
    } finally q.stop()
  }

  test("left-outer stream-stream join emits null rows only after watermark eviction") {
    implicit val sc = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val inL = MemoryStream[Event]
    val inR = MemoryStream[Event]
    val left = inL.toDF().select(col("user_id"), col("ts").as("c_ts"),
      col("value").as("c_value"))
    val right = inR.toDF().select(col("user_id").as("p_user"),
      col("ts").as("p_ts"), col("value").as("p_value"))
    val q = Streaming.streamStreamIntervalJoin(left, right,
      "user_id", "c_ts", "p_user", "p_ts", maxDelayMs = 600000L,
      joinType = "left_outer")
      .writeStream.format("memory").queryName("ssjo").outputMode("append").start()
    try {
      val b = 1000
      // batch 1: user 1 clicks and purchases in-window; user 2's click
      // never matches
      inL.addData(Event(1, ts(b), "click", 1.0), Event(2, ts(b), "click", 2.0))
      inR.addData(Event(1, ts(b + 5), "purchase", 10.0))
      q.processAllAvailable()
      // user 2's null row may NOT emit yet: wm = min-of-sides = the
      // purchase side's (b+5) - 10 = b-5; eviction needs c_ts <= wm - 10
      assert(spark.table("ssjo").count() === 1)
      // batch 2: both sides advance far enough that wm - 10 min passes
      // user 2's click (wm = b+50-10 = b+40 > b+10)
      inL.addData(Event(9, ts(b + 50), "click", 0.0))
      inR.addData(Event(9, ts(b + 50), "purchase", 0.0))
      q.processAllAvailable()
      val rows = spark.table("ssjo")
        .select("user_id", "c_value", "p_value").collect()
        .map(r => (r.getLong(0), r.getDouble(1),
          if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toSet
      assert(rows.exists(r => r._1 == 2L && r._3.isNaN),
        s"user 2's unmatched click should have emitted a null row; got $rows")
      assert(rows.contains((1L, 1.0, 10.0)))
    } finally q.stop()
  }

  test("sessionization closes sessions after the gap via event-time timeout") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Streaming.sessionize(in.toDS(), gapMs = 5 * 60000)
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      // session 1: user 1, minutes 1-3 (3 events, off zero — an event at
      // exactly the initial watermark is dropped as late); then silence
      in.addData(
        Event(1, ts(1), "c", 1.0), Event(1, ts(2), "c", 2.0), Event(1, ts(3), "c", 3.0))
      q.processAllAvailable()
      // advance watermark far past the gap with a later event
      in.addData(Event(2, ts(60), "c", 9.0))
      q.processAllAvailable()
      in.addData(Event(2, ts(61), "c", 1.0)) // nudge watermark once more
      q.processAllAvailable()
      val sessions = spark.table("sess").as[Session].collect().toSet
      assert(sessions.contains(Session(1, 60000, 3 * 60000, 3, 6.0)))
    } finally q.stop()
  }

  test("sessionization absorbs a late in-watermark event without rewinding the session") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Streaming.sessionize(in.toDS(), gapMs = 5 * 60000)
      .writeStream.format("memory").queryName("sess_late").outputMode("append").start()
    try {
      // open session: minutes 1 and 4 (watermark delay is 10 min)
      in.addData(Event(1, ts(1), "c", 1.0), Event(1, ts(4), "c", 2.0))
      q.processAllAvailable()
      // LATE but within watermark: minute 2 — merges into the open
      // session; a blind last=t overwrite would rewind last to 2min
      // and wrongly split at the next on-time event
      in.addData(Event(1, ts(2), "c", 4.0))
      q.processAllAvailable()
      // minute 8: within gap of the true last (4min) — must MERGE
      in.addData(Event(1, ts(8), "c", 8.0))
      q.processAllAvailable()
      // close everything via a far-future watermark nudge
      in.addData(Event(2, ts(60), "c", 0.0))
      q.processAllAvailable()
      in.addData(Event(2, ts(61), "c", 0.0))
      q.processAllAvailable()
      val sessions = spark.table("sess_late").as[Session].collect().toSet
      assert(sessions.contains(Session(1, 60000, 8 * 60000, 4, 15.0)),
        s"got $sessions")
    } finally q.stop()
  }

  test("session_window append: eviction is end <= watermark (exact tie emits)") {
    // Pins the emission rule stream_session_window_append's oracle
    // replays: a finalized session emits iff its window end is <= the
    // watermark — INCLUSIVE at the exact microsecond tie. gap = 10 s,
    // delay = 5 s; the second batch's 15 s event drives the final
    // watermark to exactly 10 s.
    implicit val sc = spark.sqlContext
    import org.apache.spark.sql.functions._
    val in = MemoryStream[Event]
    val agg = in.toDF()
      .withWatermark("ts", "5 seconds")
      .groupBy(col("user_id"),
        session_window(col("ts"), "10 seconds").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("w.end").as("e"), col("n"))
    val q = agg.writeStream.format("memory").queryName("sessapp")
      .outputMode(OutputMode.Append).start()
    try {
      val tTie = new Timestamp(0) // end = 10 s == final wm
      val tAbove = new Timestamp(0); tAbove.setNanos(1000) // end = wm + 1 µs
      in.addData(
        Event(1, tTie, "c", 1.0),
        Event(2, new Timestamp(-1000), "c", 1.0), // end = 9 s < wm
        Event(3, tAbove, "c", 1.0))
      q.processAllAvailable()
      in.addData(Event(4, new Timestamp(15000), "c", 1.0)) // wm -> 10 s
      q.processAllAvailable()
      val emitted = spark.table("sessapp").select("user_id")
        .collect().map(_.getLong(0)).toSet
      assert(emitted == Set(1L, 2L),
        s"expected exactly the tie (1) and below-wm (2) sessions: $emitted")
    } finally q.stop()
  }

  test("streaming sosfilt equals batch sosfilt across micro-batches") {
    implicit val sc = spark.sqlContext
    val sos = Design.butterSos(4, 0.25)
    val xs = Array.tabulate(40)(i => math.sin(i * 0.3) + 0.2 * math.cos(i * 1.1))
    val in = MemoryStream[Event]
    val q = Streaming.streamingSosfilt(in.toDS(), sos)
      .writeStream.format("memory").queryName("filt").outputMode("append").start()
    try {
      // three micro-batches, in order per user
      in.addData((0 until 15).map(i => Event(7, ts(i), "c", xs(i))))
      q.processAllAvailable()
      in.addData((15 until 30).map(i => Event(7, ts(i), "c", xs(i))))
      q.processAllAvailable()
      in.addData((30 until 40).map(i => Event(7, ts(i), "c", xs(i))))
      q.processAllAvailable()
      val pts = spark.table("filt").as[FilteredPoint].collect().sortBy(_.pos)
      // pos is the carried per-key sample count: contiguous 0..39
      // across the three micro-batches, matching the ts order
      assert(pts.map(_.pos).toSeq == (0L until 40L))
      assert(pts.sortBy(_.ts_ms).map(_.value).toSeq == pts.map(_.value).toSeq)
      val got = pts.map(_.value)
      val want = Filt.sosfilt(sos, xs)
      assert(got.length == 40)
      val d = got.zip(want).map { case (a, b) => math.abs(a - b) }.max
      assert(d < 1e-12, s"maxAbsDiff=$d")
    } finally q.stop()
  }

  test("streaming dedup keeps one row per normalized content hash") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val df = in.toDF().toDF("ts", "text")
    val q = Streaming.streamingDedup(df, "ts", "text")
      .writeStream.format("memory").queryName("sdedup").outputMode("append").start()
    try {
      in.addData((ts(1), "Hello  World"), (ts(2), "hello world"), (ts(3), "other doc"))
      q.processAllAvailable()
      in.addData((ts(4), "HELLO WORLD"), (ts(5), "fresh one"))
      q.processAllAvailable()
      val texts = spark.table("sdedup").select("text").as[String].collect().toSet
      assert(texts.size == 3)
      assert(texts.map(_.toLowerCase.replaceAll("\\s+", " ")) ==
        Set("hello world", "other doc", "fresh one"))
    } finally q.stop()
  }

  test("streaming STFT windows match batch rfft across micro-batch boundaries") {
    implicit val sc = spark.sqlContext
    val xs = Array.tabulate(40)(i => math.sin(i * 0.4) + 0.5 * math.cos(i * 0.9))
    val in = MemoryStream[Event]
    val q = Streaming.streamingStft(in.toDS(), w = 16, h = 8, window = "boxcar")
      .writeStream.format("memory").queryName("stft").outputMode("append").start()
    try {
      in.addData((0 until 10).map(i => Event(3, ts(i), "c", xs(i))))
      q.processAllAvailable()
      in.addData((10 until 40).map(i => Event(3, ts(i), "c", xs(i))))
      q.processAllAvailable()
      val rows = spark.table("stft").as[Streaming.SpectrumBin].collect()
      // windows end at samples 15, 23, 31, 39 (w=16, hop 8)
      val ends = rows.map(_.window_end_ms).distinct.sorted
      assert(ends.sameElements(Array(15L, 23L, 31L, 39L).map(_ * 60000)))
      for ((endMin, start) <- Seq(15 -> 0, 23 -> 8, 31 -> 16, 39 -> 24)) {
        val want = graft.dsp.Fft.rfft(xs.slice(start, start + 16))
        val got = rows.filter(_.window_end_ms == endMin * 60000L).sortBy(_.bin)
        assert(got.length == 9)
        assert(got.zipWithIndex.forall { case (r, b) =>
          r.re == want.re(b) && r.im == want.im(b)
        }, s"window ending $endMin")
      }
    } finally q.stop()
  }

  test("streaming STFT hann taper matches batch weights bit-exactly") {
    implicit val sc = spark.sqlContext
    val xs = Array.tabulate(24)(i => math.sin(i * 0.4) + 0.5 * math.cos(i * 0.9))
    val wts = graft.dsp.Resample.periodicWindow("hann", 16)
    val in = MemoryStream[Event]
    val q = Streaming.streamingStft(in.toDS(), w = 16, h = 8) // hann default
      .writeStream.format("memory").queryName("stft_hann").outputMode("append").start()
    try {
      in.addData((0 until 24).map(i => Event(4, ts(i), "c", xs(i))))
      q.processAllAvailable()
      val rows = spark.table("stft_hann").as[Streaming.SpectrumBin].collect()
      for ((endMin, start) <- Seq(15 -> 0, 23 -> 8)) {
        val want = graft.dsp.Fft.rfft(
          Array.tabulate(16)(i => xs(start + i) * wts(i)))
        val got = rows.filter(_.window_end_ms == endMin * 60000L).sortBy(_.bin)
        assert(got.length == 9)
        assert(got.zipWithIndex.forall { case (r, b) =>
          r.re == want.re(b) && r.im == want.im(b)
        }, s"window ending $endMin")
      }
    } finally q.stop()
  }

  test("RocksDB state store reproduces the in-memory provider bit-for-bit") {
    // the production store at 100 TB (off-heap state, incremental
    // checkpoints) must carry zi/TTL state across batches exactly like
    // the default HDFS-backed store: same TTL-eviction scenario, both
    // providers, identical rows
    implicit val sc = spark.sqlContext
    val sos = Design.butterSos(2, 0.3)
    val xs = Array.tabulate(10)(i => math.sin(i * 0.7))
    val key = "spark.sql.streaming.stateStore.providerClass"
    def run(provider: String, name: String): Seq[FilteredPoint] = {
      val prev = spark.conf.getOption(key)
      spark.conf.set(key,
        s"org.apache.spark.sql.execution.streaming.state.$provider")
      try {
        val in = MemoryStream[Event]
        val q = Streaming.streamingSosfilt(in.toDS(), sos,
            idleTimeoutMs = Some(500L), watermark = "0 seconds")
          .writeStream.format("memory").queryName(name)
          .outputMode("append").start()
        try {
          in.addData((0 until 5).flatMap(i =>
            Seq(Event(1, ts(i + 1), "c", xs(i)), Event(2, ts(i + 1), "c", xs(i)))))
          q.processAllAvailable()
          in.addData((5 until 10).map(i => Event(2, ts(i + 1), "c", xs(i))))
          q.processAllAvailable()
          in.addData(Event(3, ts(11), "c", 0.0)) // advance wm: evict key 1
          q.processAllAvailable()
          in.addData((0 until 5).map(j => Event(1, ts(12 + j), "c", xs(5 + j))))
          q.processAllAvailable()
          spark.table(name).as[FilteredPoint].collect().toSeq
            .sortBy(p => (p.user_id, p.ts_ms))
        } finally q.stop()
      } finally prev match {
        case Some(p) => spark.conf.set(key, p)
        case None => spark.conf.unset(key)
      }
    }
    val rocks = run("RocksDBStateStoreProvider", "filt_rocks")
    val hdfs = run("HDFSBackedStateStoreProvider", "filt_hdfs")
    assert(rocks.nonEmpty && rocks == hdfs,
      "providers diverged on carried state / TTL eviction")
    // the eviction semantics held under RocksDB: key 1 restarted cold
    assert(rocks.filter(_.user_id == 1).map(_.pos) ==
      Seq(0L, 1L, 2L, 3L, 4L, 0L, 1L, 2L, 3L, 4L))
  }

  test("sosfilt idle-key state is evicted after idleTimeout; active key survives") {
    implicit val sc = spark.sqlContext
    val sos = Design.butterSos(2, 0.3)
    val xs = Array.tabulate(10)(i => math.sin(i * 0.7))
    val in = MemoryStream[Event]
    // event-time timeout: 500 ms TTL, zero watermark delay so the
    // watermark tracks max event time exactly
    val q = Streaming.streamingSosfilt(in.toDS(), sos,
        idleTimeoutMs = Some(500L), watermark = "0 seconds")
      .writeStream.format("memory").queryName("filt_ttl").outputMode("append").start()
    try {
      // batch 1: both keys get samples at minutes 1..5 (off zero — an
      // event at the initial watermark, epoch 0, is dropped as late)
      in.addData((0 until 5).flatMap(i =>
        Seq(Event(1, ts(i + 1), "c", xs(i)), Event(2, ts(i + 1), "c", xs(i)))))
      q.processAllAvailable()
      // batch 2: only key 2 is active (minutes 6..10). Watermark during
      // this batch is ts(5) — key 1's timeout (ts(5)+500ms) has NOT
      // passed yet, so its state survives; key 2 carries state forward.
      in.addData((5 until 10).map(i => Event(2, ts(i + 1), "c", xs(i))))
      q.processAllAvailable()
      // batch 3: a third key nudges the watermark to ts(10) > ts(5)+500ms
      // — key 1 (no data, timeout passed) is evicted here; key 2's
      // timeout (ts(10)+500ms) has not passed, its state survives.
      in.addData(Event(3, ts(11), "c", 0.0))
      q.processAllAvailable()
      // batch 4: key 1 returns with FRESH timestamps (its old ones are
      // sub-watermark and would be dropped as late) — a cold restart:
      // pos from 0, zi zeroed.
      in.addData((0 until 5).map(j => Event(1, ts(12 + j), "c", xs(5 + j))))
      q.processAllAvailable()
      val pts = spark.table("filt_ttl").as[FilteredPoint].collect()
      val k2 = pts.filter(_.user_id == 2).sortBy(_.ts_ms)
      assert(k2.map(_.pos).toSeq == (0L until 10L), "active key keeps carried state")
      val want2 = Filt.sosfilt(sos, xs)
      assert(k2.map(_.value).zip(want2).forall { case (a, b) => math.abs(a - b) < 1e-12 })
      val k1 = pts.filter(_.user_id == 1).sortBy(_.ts_ms)
      // first 5 match the batch filter; the returning 5 restart COLD:
      // pos 0..4 again and values equal filtering the tail from zi=0
      assert(k1.map(_.pos).toSeq == Seq(0L, 1L, 2L, 3L, 4L, 0L, 1L, 2L, 3L, 4L),
        s"evicted key must restart at pos 0; got ${k1.map(_.pos).toSeq}")
      val wantCold = Filt.sosfilt(sos, xs.drop(5))
      assert(k1.drop(5).map(_.value).zip(wantCold).forall {
        case (a, b) => math.abs(a - b) < 1e-12
      }, "returning key must filter from zero initial conditions")
    } finally q.stop()
  }

  test("STFT eviction drops the partial buffer by default, flushes zero-padded when asked") {
    implicit val sc = spark.sqlContext
    for (flush <- Seq(false, true)) {
      val in = MemoryStream[Event]
      val name = s"stft_ttl_$flush"
      val q = Streaming.streamingStft(in.toDS(), w = 8, h = 4,
          window = "boxcar", idleTimeoutMs = Some(500L), flushOnEvict = flush, watermark = "0 seconds")
        .writeStream.format("memory").queryName(name).outputMode("append").start()
      try {
        // key 1 buffers 5 of 8 samples (minutes 1..5, off the epoch-0
        // initial watermark) — no complete window
        val xs = Array.tabulate(5)(i => math.cos(i * 0.5))
        in.addData((0 until 5).map(i => Event(1, ts(i + 1), "c", xs(i))))
        q.processAllAvailable()
        // two watermark nudges: the first advances the watermark to
        // ts(5); the second batch runs WITH watermark ts(100) which is
        // past key 1's timeout (ts(5)+500ms) — key 1 is evicted there
        in.addData(Event(2, ts(100), "c", 0.0))
        q.processAllAvailable()
        in.addData(Event(2, ts(101), "c", 0.0))
        q.processAllAvailable()
        val rows = spark.table(name).as[Streaming.SpectrumBin].collect()
          .filter(_.user_id == 1)
        if (!flush) assert(rows.isEmpty, "default policy discards the partial buffer")
        else {
          // one spectrum: the 5 samples zero-padded to w=8, stamped with
          // the last buffered sample's time
          assert(rows.length == 5, s"got ${rows.length} bins")
          assert(rows.forall(_.window_end_ms == ts(5).getTime))
          val want = graft.dsp.Fft.rfft(xs ++ Array(0.0, 0.0, 0.0))
          val got = rows.sortBy(_.bin)
          assert(got.zipWithIndex.forall { case (r, b) =>
            r.re == want.re(b) && r.im == want.im(b)
          })
        }
      } finally q.stop()
    }
  }

  test("STFT ring buffer handles audio-scale windows (w=2048) across batches") {
    implicit val sc = spark.sqlContext
    val n = 8192; val w = 2048; val h = 1024
    val xs = Array.tabulate(n)(i => math.sin(i * 0.01) + 0.3 * math.cos(i * 0.37))
    val in = MemoryStream[Event]
    val q = Streaming.streamingStft(in.toDS(), w = w, h = h, window = "boxcar")
      .writeStream.format("memory").queryName("stft_big").outputMode("append").start()
    try {
      in.addData((0 until 3000).map(i => Event(5, ts(i), "c", xs(i))))
      q.processAllAvailable()
      in.addData((3000 until n).map(i => Event(5, ts(i), "c", xs(i))))
      q.processAllAvailable()
      val rows = spark.table("stft_big").as[Streaming.SpectrumBin].collect()
      val nWin = (n - w) / h + 1 // 7 windows
      assert(rows.length == nWin * (w / 2 + 1), s"got ${rows.length} rows")
      // spot-check the 3rd window (starts at sample 2*h) bit-for-bit
      val start = 2 * h
      val want = graft.dsp.Fft.rfft(xs.slice(start, start + w))
      val got = rows.filter(_.window_end_ms == ts(start + w - 1).getTime).sortBy(_.bin)
      assert(got.length == w / 2 + 1)
      assert(got.zipWithIndex.forall { case (r, b) =>
        r.re == want.re(b) && r.im == want.im(b)
      })
    } finally q.stop()
  }

  test("sosfiltWithState composes: filter(a++b) == filter(a) then filter(b)") {
    val sos = Design.cheby1Sos(6, 0.5, 0.4)
    val rnd = new scala.util.Random(3)
    val x = Array.fill(64)(rnd.nextGaussian())
    val (full, _) = Streaming.sosfiltWithState(sos, x, new Array[Double](6))
    val (h1, z1) = Streaming.sosfiltWithState(sos, x.take(20), new Array[Double](6))
    val (h2, _) = Streaming.sosfiltWithState(sos, x.drop(20), z1)
    val stitched = h1 ++ h2
    val d = full.zip(stitched).map { case (a, b) => math.abs(a - b) }.max
    assert(d == 0.0)
    // and matches the batch kernel
    val batch = Filt.sosfilt(sos, x)
    assert(full.zip(batch).map { case (a, b) => math.abs(a - b) }.max < 1e-12)
  }

  test("streaming anomaly: planted spike alerts once, warm-up silent, state spans batches") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Event]
    val q = Streaming.streamingAnomaly(in.toDS(), alpha = 0.125, nSigma = 3.0, minN = 8)
      .writeStream.format("memory").queryName("anom").outputMode("append").start()
    try {
      // steady level-10 signal with tiny wiggle, split across batches;
      // a level-100 spike lands at pos 20 in the SECOND batch, so the
      // pre-spike statistics must have carried through the state store
      def v(i: Int) = 10.0 + 0.1 * (i % 3)
      in.addData((0 until 15).map(i => Event(5, ts(i), "c", v(i))))
      q.processAllAvailable()
      in.addData((15 until 30).map(i =>
        Event(5, ts(i), "c", if (i == 20) 100.0 else v(i))))
      q.processAllAvailable()
      val alerts = spark.table("anom").as[Streaming.Alert].collect().sortBy(_.pos)
      assert(alerts.map(_.pos).toSeq == Seq(20L), s"got ${alerts.toSeq}")
      val a = alerts.head
      assert(a.value == 100.0)
      // judged against PRE-spike statistics: mean still near 10
      assert(math.abs(a.mean - 10.0) < 0.2 && a.variance < 0.02)
      // a spike inside the warm-up (pos < 8) must stay silent
      val in2 = MemoryStream[Event]
      val q2 = Streaming.streamingAnomaly(in2.toDS(), minN = 8)
        .writeStream.format("memory").queryName("anom2").outputMode("append").start()
      try {
        in2.addData((0 until 8).map(i =>
          Event(6, ts(i), "c", if (i == 4) 500.0 else 10.0)))
        q2.processAllAvailable()
        assert(spark.table("anom2").count() == 0)
      } finally q2.stop()
    } finally q.stop()
  }
}
