package graft.dsp

import scala.collection.mutable

/** Unigram language-model tokenizer (Kudo 2018, "Subword
  * Regularization" — the SentencePiece unigram algorithm; public).
  * Hard-EM (Viterbi) variant with fully DETERMINISTIC integer
  * decisions so a SQL oracle can replay the fit exactly:
  *
  *  - Piece scores are integer MICRO-NATS: `round(1e6 * ln(p))`.
  *    Every segmentation decision compares integer sums — no float
  *    comparison anywhere in the decision path (the only float op is
  *    the `ln` feeding the quantizer, whose rounding boundary a real
  *    count ratio misses by ~9 orders of magnitude).
  *  - Viterbi tie-break: max score, then FEWER tokens, then the
  *    lexicographically smallest piece sequence under UTF-8 byte
  *    order (DuckDB's memcmp). DP-safe: tied candidates at a
  *    position cover the same characters with the same token count,
  *    so their path strings have equal length.
  *  - Fit: seed = all substrings up to `maxLen` chars with corpus
  *    count >= ceil(W / seedDivisor) (W = total word occurrences),
  *    plus every single character (full coverage — no unknowns, the
  *    roundtrip guarantee). Two hard-EM rounds; after round 1 the
  *    vocabulary prunes to all single chars plus the `keepMulti`
  *    most frequent multi-char pieces; Laplace (+1) smoothing keeps
  *    zero-count chars finite.
  *
  * Reference shape: FRidh/xarray_scipy has no tokenizer; this extends
  * the LLM-pipeline surface next to byte BPE (SURVEY §2.2), matching
  * the other production tokenizer family (LLaMA-style unigram).
  */
object Unigram {

  /** Reserved path separator for tie-break strings. */
  val Sep: Char = '\u001f'

  /** Score assigned to a piece absent from a model when RE-scoring an
    * old segmentation (pruned pieces): effectively -inf, but finite
    * so integer sums stay defined. SQL uses the same constant.
    */
  val MissingScore: Long = -1000000000000L

  /** Unsigned-byte (memcmp / DuckDB blob-and-text) string compare. */
  private[graft] def utf8Cmp(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    x.length - y.length
  }

  /** Viterbi segmentation of `word` under integer micro-nat scores.
    * Returns (pieces, total score, token count). Loud when the word
    * is not coverable (cannot happen under a fit()-produced model —
    * single-char coverage is invariant).
    */
  def viterbi(word: String, lpq: collection.Map[String, Long],
              maxLen: Int): (Seq[String], Long, Int) = {
    val n = word.length
    val NoScore = Long.MinValue / 2
    val dpScore = Array.fill(n + 1)(NoScore)
    val dpN = new Array[Int](n + 1)
    val dpPath = new Array[String](n + 1)
    val dpPrev = new Array[Int](n + 1)
    dpScore(0) = 0L; dpN(0) = 0; dpPath(0) = ""
    var i = 1
    while (i <= n) {
      var l = 1
      while (l <= maxLen && l <= i) {
        val j = i - l
        if (dpScore(j) != NoScore) {
          lpq.get(word.substring(j, i)) match {
            case Some(s) =>
              val piece = word.substring(j, i)
              val sc = dpScore(j) + s
              val nt = dpN(j) + 1
              val pth = if (j == 0) piece else dpPath(j) + Sep + piece
              val better = dpScore(i) == NoScore || sc > dpScore(i) ||
                (sc == dpScore(i) && (nt < dpN(i) ||
                  (nt == dpN(i) && utf8Cmp(pth, dpPath(i)) < 0)))
              if (better) {
                dpScore(i) = sc; dpN(i) = nt; dpPath(i) = pth; dpPrev(i) = j
              }
            case None => ()
          }
        }
        l += 1
      }
      i += 1
    }
    require(dpScore(n) != NoScore,
      s"word '$word' is not coverable by the vocabulary")
    // backtrack (never splits on Sep — a piece may legally contain it
    // in adversarial corpora; fit() refuses those for the oracle's sake)
    val pieces = mutable.ListBuffer.empty[String]
    var p = n
    while (p > 0) { pieces.prepend(word.substring(dpPrev(p), p)); p = dpPrev(p) }
    (pieces.toList, dpScore(n), dpN(n))
  }

  /** Quantized log-prob: integer micro-nats. */
  private[graft] def q(num: Double, den: Double): Long =
    Math.round(1e6 * Math.log(num / den))

  /** Incremental log-sum-exp in MICRO-nats. */
  @inline private def lseMicro(a: Double, b: Double): Double =
    if (a == Double.NegativeInfinity) b
    else if (b == Double.NegativeInfinity) a
    else {
      val m = math.max(a, b); val o = math.min(a, b)
      m + 1e6 * Math.log1p(Math.exp((o - m) / 1e6))
    }

  /** Soft-EM E-step over ONE word's segmentation lattice (Kudo 2018
    * §4's expected frequencies — what SentencePiece actually trains
    * with): forward/backward over all segmentations under integer
    * micro-nat piece scores, returning
    *
    *  - per-piece expected occurrence counts, quantized to integer
    *    NANO-counts (`round(1e9 · E[occurrences])`) so distributed
    *    aggregation is exact-integer and therefore bit-deterministic
    *    across partitionings and cluster sizes — nano (not micro)
    *    resolution because soft-EM's whole advantage over Viterbi
    *    counting is the tiny tail mass that keeps candidate pieces
    *    alive through pruning: a 1e-6 floor kills every piece more
    *    than ~14 nats behind the best segmentation, 1e-9 moves that
    *    cliff to ~21 nats, and
    *  - the word's marginal log-likelihood `Z` in integer micro-nats.
    *
    * The only float math is inside this single-word kernel, where the
    * accumulation order is FIXED by the position loops — the same word
    * under the same model yields the same bits on any executor.
    * Output pairs are sorted by piece under UTF-8 byte order.
    */
  def lattice(word: String, lpq: collection.Map[String, Long],
              maxLen: Int): (Array[(String, Long)], Long) = {
    val n = word.length
    val NEG = Double.NegativeInfinity
    val alpha = Array.fill(n + 1)(NEG); alpha(0) = 0.0
    var i = 1
    while (i <= n) {
      var l = 1
      while (l <= maxLen && l <= i) {
        val j = i - l
        if (alpha(j) != NEG) lpq.get(word.substring(j, i)) match {
          case Some(s) => alpha(i) = lseMicro(alpha(i), alpha(j) + s)
          case None => ()
        }
        l += 1
      }
      i += 1
    }
    require(alpha(n) != NEG,
      s"word '$word' is not coverable by the vocabulary")
    val beta = Array.fill(n + 1)(NEG); beta(n) = 0.0
    var k = n - 1
    while (k >= 0) {
      var l = 1
      while (l <= maxLen && k + l <= n) {
        val m = k + l
        if (beta(m) != NEG) lpq.get(word.substring(k, m)) match {
          case Some(s) => beta(k) = lseMicro(beta(k), s + beta(m))
          case None => ()
        }
        l += 1
      }
      k -= 1
    }
    val z = alpha(n)
    val e = mutable.LinkedHashMap.empty[String, Double]
    i = 1
    while (i <= n) {
      var l = 1
      while (l <= maxLen && l <= i) {
        val j = i - l
        if (alpha(j) != NEG && beta(i) != NEG) {
          val piece = word.substring(j, i)
          lpq.get(piece) match {
            case Some(s) =>
              val p = Math.exp((alpha(j) + s + beta(i) - z) / 1e6)
              e.updateWith(piece) {
                case Some(v) => Some(v + p); case None => Some(p) }
            case None => ()
          }
        }
        l += 1
      }
      i += 1
    }
    val pairs = e.iterator
      .map { case (p, v) => (p, Math.round(EQuant * v)) }
      .filter(_._2 > 0L).toArray
      .sortWith((a, b) => utf8Cmp(a._1, b._1) < 0)
    (pairs, Math.round(z))
  }

  /** Expected-count quantization unit of [[lattice]]: counts are in
    * integer NANO-occurrences.
    */
  val EQuant: Double = 1e9

  /** Per-EM-round statistics of the production-scale soft-EM fit
    * ([[graft.operators.TextOps.unigramTrainLarge]]). `loglik` is the
    * corpus MARGINAL log-likelihood under that round's model (micro-
    * nats, Σ word-count × lattice Z); `gain` = loglik − previous
    * round's loglik when the vocabulary was UNCHANGED between them
    * (the EM monotonicity invariant, gated to within quantization
    * tolerance), or 0 on rounds following a prune (removing pieces
    * legitimately lowers Z — monotonicity is only defined at fixed
    * vocabulary). BigInt because corpus-scale count × micro-nat
    * products overflow Long at ~10¹² words.
    */
  final case class RoundStat(round: Int, nMulti: Int,
                             loglik: BigInt, gain: BigInt,
                             vocabChanged: Boolean)

  /** Result of the production-scale fit: final vocabulary
    * (piece, expected count in [[EQuant]] NANO-occurrences, micro-nat log-prob)
    * sorted by piece under UTF-8 byte order; per-round stats; and the
    * corpus word-occurrence total `totalWords` — the quantization
    * tolerance unit for the monotonicity gate (each word's lattice Z
    * is rounded to an integer micro-nat, so Σ count·Z carries at most
    * ±½ micro-nat of rounding noise per word occurrence).
    */
  final case class LargeFit(pieces: Array[(String, Long, Long)],
                            stats: Array[RoundStat],
                            totalWords: BigInt) {
    /** The gated invariant: every fixed-vocabulary round's marginal
      * loglik is non-decreasing to within the documented quantization
      * tolerance (1 micro-nat per word occurrence).
      */
    def monotoneOk: Boolean =
      stats.filter(s => !s.vocabChanged).forall(_.gain >= -totalWords)
  }

  final case class Model(
      /** (piece, final expected count, final micro-nat log-prob),
        * sorted by piece under UTF-8 byte order. */
      pieces: Array[(String, Long, Long)],
      /** Corpus Viterbi log-lik of round 1 (seed model), micro-nats. */
      loglik1: Long,
      /** Corpus Viterbi log-lik of round 2 (post-prune model). */
      loglik2: Long,
      /** loglik2 minus the OLD segmentation's score under the SAME
        * round-2 model — Viterbi reassignment can never lose, so this
        * is >= 0 BY CONSTRUCTION; the query gates on it. */
      reassignGain: Long) {
    def lpqMap: Map[String, Long] = pieces.map(p => p._1 -> p._3).toMap
  }

  /** Deterministic two-round hard-EM fit over a word-type histogram.
    * The state is vocabulary-sized (word TYPES, not occurrences) —
    * the same collect-a-model shape as k-means: callers aggregate the
    * histogram distributedly, collect the bounded frame, fit here,
    * and broadcast the model back for map-side encoding.
    */
  def fit(words: Array[(String, Long)], maxLen: Int = 3,
          seedDivisor: Long = 400L, keepMulti: Int = 40): Model = {
    require(words.nonEmpty, "unigram fit needs a non-empty corpus")
    require(words.forall(!_._1.contains(Sep)),
      "corpus contains the reserved separator U+001F")
    // BMP-only guard: substring here is UTF-16 code units while the
    // SQL oracle's substr is code points — identical only without
    // surrogate pairs. Loud, never silently divergent.
    require(words.forall(w => w._1.codePointCount(0, w._1.length) == w._1.length),
      "corpus contains non-BMP characters (surrogate pairs) — " +
      "code-unit vs code-point substring semantics would diverge")
    val W = words.map(_._2).sum
    val minC = math.max(2L, (W + seedDivisor - 1) / seedDivisor)
    // seed: overlapping substring counts, all positions, lengths 1..maxLen
    val seedCnt = mutable.HashMap.empty[String, Long].withDefaultValue(0L)
    for ((w, c) <- words; i <- 0 until w.length;
         l <- 1 to maxLen if i + l <= w.length)
      seedCnt(w.substring(i, i + l)) += c
    val v0 = seedCnt.filter { case (p, c) => p.length == 1 || c >= minC }
    val t0 = v0.valuesIterator.sum.toDouble
    val lpq0: Map[String, Long] =
      v0.iterator.map { case (p, c) => p -> q(c.toDouble, t0) }.toMap
    // EM round 1 under the seed model
    val seg1 = words.map { case (w, c) => (w, c, viterbi(w, lpq0, maxLen)) }
    val ll1 = seg1.map { case (_, c, (_, s, _)) => c * s }.sum
    val cnt1 = mutable.HashMap.empty[String, Long].withDefaultValue(0L)
    seg1.foreach { case (_, c, (ps, _, _)) => ps.foreach(p => cnt1(p) += c) }
    // prune: every single char (coverage invariant) + top multi-char
    // by (count desc, piece asc under utf8)
    val chars = v0.keysIterator.filter(_.length == 1).toArray
      .sortWith(utf8Cmp(_, _) < 0)
    val multi = cnt1.iterator.filter { case (p, c) => p.length > 1 && c > 0 }
      .toArray
      .sortWith { case ((p1, c1), (p2, c2)) =>
        c1 > c2 || (c1 == c2 && utf8Cmp(p1, p2) < 0) }
      .take(keepMulti).map(_._1)
    val v1: Array[String] = (chars ++ multi).sortWith(utf8Cmp(_, _) < 0)
    val t1 = v1.map(cnt1(_)).sum
    val lpq1: Map[String, Long] = v1.iterator
      .map(p => p -> q(cnt1(p) + 1.0, (t1 + v1.length).toDouble)).toMap
    // EM round 2 under the pruned, smoothed model
    val seg2 = words.map { case (w, c) => (w, c, viterbi(w, lpq1, maxLen)) }
    val ll2 = seg2.map { case (_, c, (_, s, _)) => c * s }.sum
    // the gate: seg1 re-scored under the round-2 model (pruned pieces
    // score MissingScore) can never beat seg2, which is argmax there
    val ll1under2 = seg1.map { case (_, c, (ps, _, _)) =>
      c * ps.map(p => lpq1.getOrElse(p, MissingScore)).sum }.sum
    val cnt2 = mutable.HashMap.empty[String, Long].withDefaultValue(0L)
    seg2.foreach { case (_, c, (ps, _, _)) => ps.foreach(p => cnt2(p) += c) }
    val t2 = v1.map(cnt2(_)).sum
    val out = v1.map(p =>
      (p, cnt2(p), q(cnt2(p) + 1.0, (t2 + v1.length).toDouble)))
    Model(out, ll1, ll2, ll2 - ll1under2)
  }
}
