package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.dsp.Filt

/** Structured Streaming variants (SURVEY.md §2.2 op 30): the same
  * engine semantics on unbounded event streams.
  *
  * Scale shape: all three are keyed-state operators — state lives
  * partitioned by user/key in the state store, watermarks bound it,
  * and throughput scales with executors exactly like the batch
  * groupBy(keys) shuffle.
  */
object Streaming {

  final case class Event(user_id: Long, ts: java.sql.Timestamp, event_type: String, value: Double)
  final case class Session(user_id: Long, start_ms: Long, end_ms: Long, n_events: Int, sum_value: Double)
  final case class FilteredPoint(user_id: Long, pos: Long, ts_ms: Long, value: Double)
  /** Open-session buffer held in the state store. */
  final case class S(start: Long, last: Long, n: Int, sum: Double)

  /** Watermarked sliding-window aggregation per event_type:
    * 5-minute tumbling windows, 10-minute lateness bound.
    */
  def windowedCounts(events: DataFrame,
                     window: String = "5 minutes",
                     watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("w_start"), col("window.end").as("w_end"),
        col("event_type"), col("n"), col("sum_value"))

  /** Stream-stream interval inner join: left events join right events
    * of the same key with rightTs in [leftTs, leftTs + maxDelayMs] —
    * the funnel/attribution primitive (click → purchase within 2 h)
    * as a genuine two-stream stateful join, not a batch self-join.
    *
    * Scale shape: both sides shuffle once on the key into the same
    * state-store partitioning; the watermark plus the time-range
    * condition let the engine evict buffered rows as soon as no
    * future match is possible (left rows expire at wm - maxDelay,
    * right rows at wm), so state per partition is bounded by the
    * key's event rate × (maxDelay + lateness), independent of stream
    * length. Inner-join matches emit eagerly as both sides arrive —
    * on in-watermark data the emitted set is exactly the batch join,
    * which is what the oracle checks.
    *
    * Columns from both sides must be pre-renamed disjoint (left
    * keeps `key` and `leftTs`; right carries `rightKey`/`rightTs`)
    * so the output schema needs no disambiguation.
    */
  /** joinType "inner" or "left_outer". Outer rows (left rows that
    * found no match) emit only once the watermark passes leftTs +
    * maxDelay — i.e. when the engine can PROVE no future right row
    * can match — so on a bounded stream the most recent unmatched
    * left rows stay in state and are never emitted, exactly like an
    * open session in [[sessionize]].
    */
  def streamStreamIntervalJoin(left: DataFrame, right: DataFrame,
                               key: String, leftTs: String,
                               rightKey: String, rightTs: String,
                               maxDelayMs: Long,
                               watermark: String = "10 minutes",
                               joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r,
      col(key) === col(rightKey) &&
        col(rightTs) >= col(leftTs) &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $maxDelayMs MILLISECONDS"),
      joinType)
  }

  /** Gap-based sessionization per user via flatMapGroupsWithState with
    * an event-time timeout: a session closes when the watermark passes
    * last-event + gap, emitting (start, end, n, sum).
    */
  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._

    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[S, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[Event], state: GroupState[S]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(user, s.start, s.last, s.n, s.sum))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  // min/max, not blind overwrite: a late-but-in-
                  // watermark event from an earlier batch can precede
                  // the open session's bounds; overwriting `last`
                  // backwards would wrongly split the session at the
                  // next on-time event (and leave start > some events)
                  cur = Some(S(math.min(s.start, t), math.max(s.last, t),
                    s.n + 1, s.sum + e.value))
                case Some(s) =>
                  closed ::= Session(user, s.start, s.last, s.n, s.sum)
                  cur = Some(S(t, t, 1, e.value))
                case None =>
                  cur = Some(S(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.reverseIterator
          }
      }
  }

  /** Streaming exact dedup: normalize → content hash →
    * dropDuplicatesWithinWatermark, so the state store holds one hash
    * per distinct document inside the lateness window instead of the
    * documents themselves. The batch twin is Dedup.exact.
    */
  def streamingDedup(docs: DataFrame, tsCol: String, textCol: String,
                     watermark: String = "10 minutes"): DataFrame =
    docs
      // the canonical batch hash (Dedup.exact's normalize→md5), not a
      // re-implementation — a drift in normalization would silently
      // diverge the streaming dedup set from its batch twin
      .withColumn("_h", md5(encode(
        graft.operators.TextOps.normalize(col(textCol)), "UTF-8")))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("_h")
      .drop("_h")

  /** Streaming per-user sosfilt: cascaded-biquad state carried across
    * micro-batches in the state store (events assumed in order per key
    * within the stream, the usual telemetry contract). Reuses the
    * batch kernel's DF2T recurrence via its zi parameter. The state
    * array carries one extra slot: the running sample count, emitted
    * as `pos` so the output joins/compares against the batch operator
    * by rank even when millisecond timestamps collide (ts_ms is
    * lossy — Timestamp.getTime truncates to ms; the per-batch sort
    * uses the FULL timestamp, nanos included).
    *
    * `idleTimeoutMs` bounds the state store on streams with unbounded
    * key churn: a key idle for that much EVENT time — watermark passes
    * its last event + timeout — has its filter state evicted. An
    * event-time timeout (not processing-time) keeps eviction
    * deterministic and replay-safe, and avoids the engine's
    * processing-time no-data-batch spin (`shouldRunAnotherBatch` is
    * unconditionally true under ProcessingTimeTimeout, so a drained
    * bounded stream re-triggers forever). Enabling it installs
    * `withWatermark(ts, watermark)` on the input. Eviction policy: the
    * zi vector is discarded — a returning key restarts cold (zero
    * initial conditions, `pos` restarting at 0), indistinguishable
    * from a brand-new key. That is the standard contract for an IIR
    * over telemetry (a gap longer than the timeout means the filter's
    * ring-down is stale anyway); callers needing warm restarts must
    * persist zi externally. Default `None` keeps the grow-forever
    * behavior for bounded/replay streams where total key cardinality
    * is known small.
    */
  def streamingSosfilt(events: Dataset[Event], sos: Array[Double],
                       idleTimeoutMs: Option[Long] = None,
                       watermark: String = "10 minutes"): Dataset[FilteredPoint] = {
    import events.sparkSession.implicits._
    val nState = (sos.length / 6) * 2
    val tconf = if (idleTimeoutMs.isDefined) GroupStateTimeout.EventTimeTimeout()
                else GroupStateTimeout.NoTimeout()
    val src = idleTimeoutMs.fold(events)(_ => events.withWatermark("ts", watermark))

    src
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Array[Double], FilteredPoint](
        OutputMode.Append(), tconf) {
        (user: Long, rows: Iterator[Event], state: GroupState[Array[Double]]) =>
          // (ts, value) order: the batch oracle ranks ROW_NUMBER(...
          // ORDER BY t, value), so exact-timestamp ties must break the
          // same way or the order-sensitive IIR recurrence diverges
          val sorted = rows.toSeq.sortWith { (a, b) =>
            val c = a.ts.compareTo(b.ts); c < 0 || (c == 0 && a.value < b.value)
          }
          if (state.hasTimedOut) { // idle past idleTimeout: evict zi
            state.remove()
            Iterator.empty
          } else if (sorted.isEmpty) Iterator.empty
          else {
            val st = state.getOption.getOrElse(new Array[Double](nState + 1))
            val zi = java.util.Arrays.copyOf(st, nState)
            val base = st(nState).toLong // exact for counts < 2^53
            val x = sorted.map(_.value).toArray
            // run the cascade with carried state, then recover the new
            // state by replaying each section's tail (sosfilt mutates a
            // copy; we recompute the final zi with a stateful pass)
            val (y, zo) = sosfiltWithState(sos, x, zi)
            val next = java.util.Arrays.copyOf(zo, nState + 1)
            next(nState) = (base + x.length).toDouble
            state.update(next)
            idleTimeoutMs.foreach { ttl =>
              // evict when the watermark passes last-seen + ttl; clamp
              // above the current watermark (a timeout timestamp at or
              // below it is rejected by the API)
              state.setTimeoutTimestamp(
                math.max(sorted.last.ts.getTime + ttl,
                  state.getCurrentWatermarkMs() + 1))
            }
            sorted.iterator.zip(y.iterator).zipWithIndex.map { case ((e, v), i) =>
              FilteredPoint(user, base + i, e.ts.getTime, v)
            }
          }
      }
  }

  final case class SpectrumBin(user_id: Long, window_end_ms: Long, bin: Int,
                               re: Double, im: Double)

  /** Streaming STFT: per-user sliding-window rfft (window `w` samples,
    * hop `h`). The state store holds at most w-1 samples per key; each
    * completed window emits w/2+1 spectrum rows stamped with the
    * window-closing event time. Events are assumed in order per key
    * within the stream (same telemetry contract as
    * [[streamingSosfilt]]); spectra match the batch `Signal.rfft` on
    * the same window exactly.
    *
    * Per-batch buffering is a `mutable.ArrayDeque` ring buffer —
    * amortized O(1) per appended sample plus the unavoidable O(w)
    * window copy per completed spectrum — so audio-scale windows
    * (w = 4096) cost the same per sample as w = 16 (the previous
    * `List :+` append was O(w) per SAMPLE, quadratic per window).
    *
    * `idleTimeoutMs` bounds the state store under key churn — an
    * EVENT-TIME timeout with the same contract and rationale as
    * [[streamingSosfilt]]. Eviction policy for the ≤ w-1 buffered
    * samples of an evicted key is caller-chosen: `flushOnEvict = true`
    * zero-pads the partial buffer to `w` and emits one final spectrum
    * stamped with the last buffered sample's time (scipy.signal.stft's
    * boundary-padding convention, so a drained key still accounts for
    * its tail); `false` (default) discards it — the right choice when
    * partial windows would pollute downstream averages.
    */
  def streamingStft(events: Dataset[Event], w: Int, h: Int,
                    window: String = "hann",
                    idleTimeoutMs: Option[Long] = None,
                    flushOnEvict: Boolean = false,
                    watermark: String = "10 minutes"): Dataset[SpectrumBin] = {
    require(w > 0 && h > 0 && h <= w, "need 0 < hop <= window")
    import events.sparkSession.implicits._
    // taper weights (hann default, scipy.signal.stft's convention —
    // identical to the batch twin so their spectra agree bin-for-bin);
    // computed once here and closure-captured by every task
    val wts =
      if (window == "boxcar" || window == "rectangular") null
      else graft.dsp.Resample.periodicWindow(window, w)
    val tconf = if (idleTimeoutMs.isDefined) GroupStateTimeout.EventTimeTimeout()
                else GroupStateTimeout.NoTimeout()
    val src = idleTimeoutMs.fold(events)(_ => events.withWatermark("ts", watermark))

    def emitSpectrum(user: Long, end: Long, x: Array[Double],
                     out: scala.collection.mutable.ArrayBuffer[SpectrumBin]): Unit = {
      if (wts != null) {
        var i = 0
        while (i < w) { x(i) *= wts(i); i += 1 }
      }
      val spec = graft.dsp.Fft.rfft(x)
      var b = 0
      while (b < spec.re.length) {
        out += SpectrumBin(user, end, b, spec.re(b), spec.im(b))
        b += 1
      }
    }

    src
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[(Long, Double)], SpectrumBin](
        OutputMode.Append(), tconf) {
        (user: Long, rows: Iterator[Event], state: GroupState[List[(Long, Double)]]) =>
          if (state.hasTimedOut) { // idle past idleTimeout: evict buffer
            val pending = state.getOption.getOrElse(Nil)
            state.remove()
            if (flushOnEvict && pending.nonEmpty) {
              val out = scala.collection.mutable.ArrayBuffer.empty[SpectrumBin]
              val x = new Array[Double](w) // zero-padded tail window
              var i = 0
              pending.foreach { p => x(i) = p._2; i += 1 }
              emitSpectrum(user, pending.last._1, x, out)
              out.iterator
            } else Iterator.empty
          } else {
            // full-precision (ts, value) order — getTime truncates to ms
            // and in-window position sets the DFT weight, so a sub-ms
            // swap would change every bin (same contract as sosfilt)
            val sorted = rows.toSeq.sortWith { (a, b) =>
              val c = a.ts.compareTo(b.ts); c < 0 || (c == 0 && a.value < b.value)
            }
            val buf = scala.collection.mutable.ArrayDeque
              .from(state.getOption.getOrElse(Nil)) // stored oldest-first
            val out = scala.collection.mutable.ArrayBuffer.empty[SpectrumBin]
            sorted.foreach { e =>
              buf.append((e.ts.getTime, e.value))
              if (buf.length == w) {
                val x = new Array[Double](w)
                var i = 0
                while (i < w) { x(i) = buf(i)._2; i += 1 }
                emitSpectrum(user, buf(w - 1)._1, x, out)
                buf.dropInPlace(h)
              }
            }
            state.update(buf.toList)
            if (sorted.nonEmpty) idleTimeoutMs.foreach { ttl =>
              state.setTimeoutTimestamp(
                math.max(sorted.last.ts.getTime + ttl,
                  state.getCurrentWatermarkMs() + 1))
            }
            out.iterator
          }
      }
  }

  final case class Alert(user_id: Long, pos: Long, ts_ms: Long, value: Double,
                         mean: Double, variance: Double)

  /** Streaming anomaly detection per key: an exponentially-weighted
    * mean/variance (EWMA + EW variance, the RFC 6298-style estimator)
    * maintained in mapGroupsWithState, emitting an alert row — and
    * ONLY an alert row — whenever a sample deviates from the running
    * mean by more than `nSigma` EW standard deviations. This is the
    * telemetry/fraud alerting shape: dense input, SPARSE data-
    * dependent output, O(1) state per key (three doubles), unlike the
    * dense re-emission of streamingSosfilt.
    *
    * Update (after the alert test, so a spike is judged against the
    * PRE-spike statistics): d = x − m; m += α·d; v = (1−α)(v + α·d²);
    * the first sample initializes m = x, v = 0, and no alerts fire
    * before `minN` samples (the estimator warm-up). α defaults to
    * 0.125 = 1/8 — exactly representable, so every arithmetic step is
    * reproducible bit-for-bit by any IEEE-754 engine and the oracle
    * replays the recursion (and the strict `>` alert comparison) with
    * zero tolerance.
    *
    * Scale shape: state is 3 doubles + a count per key, hash-
    * partitioned by key; batch sort is per-key per-batch (bounded);
    * emission is alerts only, so the sink sees event-rate × anomaly-
    * rate rows. Production adds the event-time TTL of streamingSosfilt
    * for unbounded key churn (same eviction contract).
    */
  def streamingAnomaly(events: Dataset[Event], alpha: Double = 0.125,
                       nSigma: Double = 3.0, minN: Long = 8): Dataset[Alert] = {
    import events.sparkSession.implicits._
    require(alpha > 0 && alpha < 1, "alpha must be in (0,1)")
    require(minN >= 1, "minN must be >= 1")
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Array[Double], Alert](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[Event], state: GroupState[Array[Double]]) =>
          // same (ts, value) tie rule as streamingSosfilt: the oracle's
          // ROW_NUMBER replay must walk the samples in this exact order
          val sorted = rows.toSeq.sortWith { (a, b) =>
            val c = a.ts.compareTo(b.ts); c < 0 || (c == 0 && a.value < b.value)
          }
          if (sorted.isEmpty) Iterator.empty
          else {
            val st = state.getOption.getOrElse(Array(0.0, 0.0, 0.0))
            var m = st(0); var v = st(1); var n = st(2).toLong // n exact < 2^53
            val out = scala.collection.mutable.ArrayBuffer[Alert]()
            sorted.foreach { e =>
              val x = e.value
              if (n >= minN && math.abs(x - m) > nSigma * math.sqrt(v))
                out += Alert(user, n, e.ts.getTime, x, m, v)
              if (n == 0L) { m = x; v = 0.0 }
              else {
                val d = x - m
                m = m + alpha * d
                v = (1.0 - alpha) * (v + alpha * d * d)
              }
              n += 1
            }
            state.update(Array(m, v, n.toDouble))
            out.iterator
          }
      }
  }

  /** sosfilt that also returns the final filter state (DF2T z per
    * section) for carry-over across micro-batches.
    */
  private[streaming] def sosfiltWithState(
      sos: Array[Double], x: Array[Double], zi: Array[Double]): (Array[Double], Array[Double]) = {
    val ns = Filt.nSections(sos)
    val z = zi.clone()
    val y = x.clone()
    var s = 0
    while (s < ns) {
      val o = s * Filt.SOS_W
      val a0 = sos(o + 3)
      val b0 = sos(o) / a0; val b1 = sos(o + 1) / a0; val b2 = sos(o + 2) / a0
      val a1 = sos(o + 4) / a0; val a2 = sos(o + 5) / a0
      var z0 = z(s * 2); var z1 = z(s * 2 + 1)
      var t = 0
      while (t < y.length) {
        val xt = y(t)
        val yt = b0 * xt + z0
        z0 = b1 * xt + z1 - a1 * yt
        z1 = b2 * xt - a2 * yt
        y(t) = yt
        t += 1
      }
      z(s * 2) = z0; z(s * 2 + 1) = z1
      s += 1
    }
    (y, z)
  }
}
