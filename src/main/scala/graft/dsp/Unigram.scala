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

  /** Array-backed character trie over the vocabulary — the kernels'
    * zero-allocation lookup structure (optimization round 21, guide
    * §1.2 step 2 "per-task work"): the previous per-probe
    * `word.substring(j, i)` + hash-map lookup allocated a String and
    * hashed it for EVERY (position, length) pair, three passes per
    * word — measured 11–48 s of task CPU per EM round at sf0.1.
    * A trie walk extends one char per length step and allocates
    * nothing. Root fan-out is a direct char index (BMP-only — the
    * fits already refuse surrogate pairs); deeper nodes are sibling
    * lists (tiny after the first char).
    */
  private[dsp] final class Trie(pieceCount: Int) {
    private var cap = math.max(16, pieceCount * 4)
    private var ch = new Array[Char](cap)
    private var firstChild = new Array[Int](cap)
    private var nextSib = new Array[Int](cap)
    private var pidA = new Array[Int](cap)
    private var n = 1 // node 0 = root
    private val root = { val a = new Array[Int](65536); java.util.Arrays.fill(a, -1); a }
    firstChild(0) = -1; pidA(0) = -1
    private def grow(): Unit = {
      cap *= 2
      ch = java.util.Arrays.copyOf(ch, cap)
      firstChild = java.util.Arrays.copyOf(firstChild, cap)
      nextSib = java.util.Arrays.copyOf(nextSib, cap)
      pidA = java.util.Arrays.copyOf(pidA, cap)
    }
    /** Child of `node` labelled `c`, or -1. `node` 0 is the root. */
    def step(node: Int, c: Char): Int =
      if (node == 0) root(c)
      else {
        var k = firstChild(node)
        while (k >= 0 && ch(k) != c) k = nextSib(k)
        k
      }
    /** Piece id terminating at `node`, or -1. */
    def pid(node: Int): Int = pidA(node)
    def insert(s: String, reversed: Boolean, id: Int): Unit = {
      var node = 0
      var i = 0
      val L = s.length
      while (i < L) {
        val c = if (reversed) s.charAt(L - 1 - i) else s.charAt(i)
        var k = step(node, c)
        if (k < 0) {
          if (n == cap) grow()
          k = n; n += 1
          ch(k) = c; firstChild(k) = -1; pidA(k) = -1
          if (node == 0) { nextSib(k) = -1; root(c) = k }
          else { nextSib(k) = firstChild(node); firstChild(node) = k }
        }
        node = k; i += 1
      }
      pidA(node) = id
    }
  }

  /** Compiled vocabulary for the lattice/Viterbi kernels: pieces
    * UTF-8-byte-sorted with aligned micro-nat scores, plus two tries —
    * `rev` (reversed pieces; serves the end-major loops, where the
    * candidate substring grows LEFTWARD as its length increases) and
    * `pre` (prefix; serves the start-major backward pass). Loop order,
    * guards, and tie-breaks in the kernels are byte-identical to the
    * map-based originals — only the lookup mechanics changed — so
    * every oracle-replayed decision and float accumulation is
    * bit-identical.
    *
    * NOT thread-safe: carries per-call scratch buffers (expected-count
    * lanes reset after each word). Build one per task/thread — the
    * Bridge kernels cache one per (thread, vocab literal).
    */
  final class UniModel private[dsp] (
      val pieces: Array[String], val scores: Array[Long], val maxLen: Int) {
    private[dsp] val pre = new Trie(pieces.length)
    private[dsp] val rev = new Trie(pieces.length)
    locally {
      var i = 0
      while (i < pieces.length) {
        pre.insert(pieces(i), reversed = false, i)
        rev.insert(pieces(i), reversed = true, i)
        i += 1
      }
    }
    // lattice scratch: expected-count lane per piece + touched list,
    // reset after each word (single-threaded by the contract above)
    private[dsp] val eLane = new Array[Double](pieces.length)
    private[dsp] val eSeen = new Array[Boolean](pieces.length)
    private[dsp] var touched = new Array[Int](math.min(256, math.max(1, pieces.length)))
    private[dsp] var nTouched = 0
    private[dsp] def touch(id: Int): Unit = {
      if (!eSeen(id)) {
        eSeen(id) = true
        if (nTouched == touched.length)
          touched = java.util.Arrays.copyOf(touched, touched.length * 2)
        touched(nTouched) = id; nTouched += 1
      }
    }
  }

  object UniModel {
    /** Build from parallel (piece, score) arrays — duplicate pieces
      * keep the LAST score (the `.toMap` semantics of the map-based
      * kernels). `maxLen` bounds probe length exactly like the map
      * API's parameter.
      */
    def build(ps: Array[String], lq: Array[Long], maxLen: Int): UniModel = {
      require(ps.length == lq.length,
        s"UniModel: ${ps.length} pieces but ${lq.length} scores")
      val dedup = new java.util.LinkedHashMap[String, java.lang.Long]()
      var i = 0
      while (i < ps.length) { dedup.put(ps(i), lq(i)); i += 1 }
      val entries = new Array[(String, Long)](dedup.size())
      val it = dedup.entrySet().iterator()
      i = 0
      while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
      val sorted = entries.sortWith((a, b) => utf8Cmp(a._1, b._1) < 0)
      new UniModel(sorted.map(_._1), sorted.map(_._2), maxLen)
    }

    def fromMap(lpq: collection.Map[String, Long], maxLen: Int): UniModel = {
      val ps = lpq.keysIterator.toArray
      build(ps, ps.map(lpq), maxLen)
    }
  }

  /** Viterbi segmentation of `word` under integer micro-nat scores.
    * Returns (pieces, total score, token count). Loud when the word
    * is not coverable (cannot happen under a fit()-produced model —
    * single-char coverage is invariant).
    *
    * NOTE (ADVICE r21): this wrapper compiles a full UniModel per call
    * — O(vocab), not O(word). Per-row/executor hot paths must build
    * the model once per task and call the compiled overload.
    */
  def viterbi(word: String, lpq: collection.Map[String, Long],
              maxLen: Int): (Seq[String], Long, Int) =
    viterbi(word, UniModel.fromMap(lpq, maxLen))

  /** Trie-backed Viterbi — decision-identical to the map API (same
    * loop order, same tie-breaks); path strings are built only when a
    * candidate wins or ties (the original built one per probe).
    */
  def viterbi(word: String, m: UniModel): (Seq[String], Long, Int) = {
    val n = word.length
    val maxLen = m.maxLen
    val NoScore = Long.MinValue / 2
    val dpScore = Array.fill(n + 1)(NoScore)
    val dpN = new Array[Int](n + 1)
    val dpPath = new Array[String](n + 1)
    val dpPrev = new Array[Int](n + 1)
    dpScore(0) = 0L; dpN(0) = 0; dpPath(0) = ""
    var i = 1
    while (i <= n) {
      var node = 0
      var l = 1
      while (node >= 0 && l <= maxLen && l <= i) {
        node = m.rev.step(node, word.charAt(i - l))
        if (node >= 0) {
          val id = m.rev.pid(node)
          val j = i - l
          if (id >= 0 && dpScore(j) != NoScore) {
            val sc = dpScore(j) + m.scores(id)
            val nt = dpN(j) + 1
            var pth: String = null
            var better = false
            if (dpScore(i) == NoScore || sc > dpScore(i)) better = true
            else if (sc == dpScore(i)) {
              if (nt < dpN(i)) better = true
              else if (nt == dpN(i)) {
                pth = if (j == 0) m.pieces(id) else dpPath(j) + Sep + m.pieces(id)
                better = utf8Cmp(pth, dpPath(i)) < 0
              }
            }
            if (better) {
              if (pth == null)
                pth = if (j == 0) m.pieces(id) else dpPath(j) + Sep + m.pieces(id)
              dpScore(i) = sc; dpN(i) = nt; dpPath(i) = pth; dpPrev(i) = j
            }
          }
          l += 1
        }
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
  /** NOTE (ADVICE r21): this map-based wrapper compiles a full
    * UniModel (two tries + 65536-entry root arrays + dedup/sort) PER
    * CALL — O(vocab), not O(word). Fine for one-shot driver use; any
    * per-row/executor hot path must build the model once per task via
    * [[UniModel.build]]/[[UniModel.fromMap]] and call the compiled
    * overload (see Bridge's per-(thread, vocab) model cache).
    */
  def lattice(word: String, lpq: collection.Map[String, Long],
              maxLen: Int): (Array[(String, Long)], Long) =
    lattice(word, UniModel.fromMap(lpq, maxLen))

  /** Merge two EM partial-count arrays (piece → BigInteger bytes; the
    * "" lane is the corpus-marginal sentinel). Integer sums are
    * associative and commutative, so any merge tree over any
    * partitioning yields bit-identical totals — the property that lets
    * the EM E-step treeReduce its per-partition partials on executors
    * (driver receives ONE O(vocab) array, VERDICT r21 #2) without
    * touching the oracle hash.
    */
  def mergePartials(a: Array[(String, Array[Byte])],
                    b: Array[(String, Array[Byte])]): Array[(String, Array[Byte])] = {
    val m = new java.util.HashMap[String, java.math.BigInteger](
      (a.length + b.length) * 2)
    var i = 0
    while (i < a.length) {
      m.merge(a(i)._1, new java.math.BigInteger(a(i)._2), (x, y) => x.add(y)); i += 1
    }
    i = 0
    while (i < b.length) {
      m.merge(b(i)._1, new java.math.BigInteger(b(i)._2), (x, y) => x.add(y)); i += 1
    }
    val out = new Array[(String, Array[Byte])](m.size())
    val it = m.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      out(k) = (e.getKey, e.getValue.toByteArray); k += 1
    }
    out
  }

  /** Trie-backed lattice — bit-identical to the map API: identical
    * loop order means identical log-sum-exp and expected-count
    * accumulation order, so the same word under the same model yields
    * the same bits; the emitted pairs are UTF-8-byte-sorted exactly as
    * before (the model's pieces are pre-sorted with that comparator).
    */
  def lattice(word: String, m: UniModel): (Array[(String, Long)], Long) = {
    val n = word.length
    val maxLen = m.maxLen
    val NEG = Double.NegativeInfinity
    val alpha = Array.fill(n + 1)(NEG); alpha(0) = 0.0
    var i = 1
    while (i <= n) {
      var node = 0
      var l = 1
      while (node >= 0 && l <= maxLen && l <= i) {
        node = m.rev.step(node, word.charAt(i - l))
        if (node >= 0) {
          val id = m.rev.pid(node)
          if (id >= 0 && alpha(i - l) != NEG)
            alpha(i) = lseMicro(alpha(i), alpha(i - l) + m.scores(id))
          l += 1
        }
      }
      i += 1
    }
    require(alpha(n) != NEG,
      s"word '$word' is not coverable by the vocabulary")
    val beta = Array.fill(n + 1)(NEG); beta(n) = 0.0
    var k = n - 1
    while (k >= 0) {
      var node = 0
      var l = 1
      while (node >= 0 && l <= maxLen && k + l <= n) {
        node = m.pre.step(node, word.charAt(k + l - 1))
        if (node >= 0) {
          val id = m.pre.pid(node)
          if (id >= 0 && beta(k + l) != NEG)
            beta(k) = lseMicro(beta(k), m.scores(id) + beta(k + l))
          l += 1
        }
      }
      k -= 1
    }
    val z = alpha(n)
    i = 1
    while (i <= n) {
      var node = 0
      var l = 1
      while (node >= 0 && l <= maxLen && l <= i) {
        node = m.rev.step(node, word.charAt(i - l))
        if (node >= 0) {
          val id = m.rev.pid(node)
          if (id >= 0 && alpha(i - l) != NEG && beta(i) != NEG) {
            m.eLane(id) += Math.exp((alpha(i - l) + m.scores(id) + beta(i) - z) / 1e6)
            m.touch(id)
          }
          l += 1
        }
      }
      i += 1
    }
    // emit in UTF-8 byte order = ascending piece id (pieces pre-sorted)
    java.util.Arrays.sort(m.touched, 0, m.nTouched)
    val buf = Array.newBuilder[(String, Long)]
    var t = 0
    while (t < m.nTouched) {
      val id = m.touched(t)
      val q = Math.round(EQuant * m.eLane(id))
      if (q > 0L) buf += ((m.pieces(id), q))
      m.eLane(id) = 0.0; m.eSeen(id) = false
      t += 1
    }
    m.nTouched = 0
    (buf.result(), Math.round(z))
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
    // EM round 1 under the seed model (compiled once, not per word)
    val m0 = UniModel.fromMap(lpq0, maxLen)
    val seg1 = words.map { case (w, c) => (w, c, viterbi(w, m0)) }
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
    val m1 = UniModel.fromMap(lpq1, maxLen)
    val seg2 = words.map { case (w, c) => (w, c, viterbi(w, m1)) }
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
