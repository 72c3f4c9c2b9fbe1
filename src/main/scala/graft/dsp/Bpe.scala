package graft.dsp

/** Byte-pair-encoding kernels: greedy single-merge application and
  * full encoding of a word under an ordered merge table.
  *
  * Merge application is the classic greedy left-to-right scan: at
  * position i, if (syms(i), syms(i+1)) equals the merge pair, emit
  * the merged symbol and skip both; otherwise emit syms(i). For a
  * self-pair (x, x) over a run "x x x" this merges positions (0, 1)
  * and leaves position 2 — the overlap convention every published BPE
  * implementation uses, and the one the SQL oracle replays with its
  * run-parity rule.
  *
  * Applying the learned merges ONCE EACH, in rank order, is exact BPE
  * encoding: a merge only ever replaces two adjacent symbols with
  * their concatenation, so an earlier merge's pair can be destroyed
  * but never re-created by a later merge — after pass t there are no
  * (l_t, r_t) pairs left to revisit.
  */
object Bpe {

  /** One greedy pass of merge (l, r) over a symbol sequence. */
  def applyMerge(syms: Array[String], l: String, r: String): Array[String] = {
    val n = syms.length
    if (n < 2) return syms
    val out = new Array[String](n)
    var i = 0
    var k = 0
    while (i < n) {
      if (i + 1 < n && syms(i) == l && syms(i + 1) == r) {
        out(k) = syms(i) + syms(i + 1)
        i += 2
      } else {
        out(k) = syms(i)
        i += 1
      }
      k += 1
    }
    java.util.Arrays.copyOf(out, k)
  }

  /** Encode a word: split to single-char symbols, then apply each
    * (mergesL(i), mergesR(i)) pair in order.
    */
  def encode(word: String, mergesL: Array[String], mergesR: Array[String]): Array[String] = {
    require(mergesL.length == mergesR.length,
      s"merge tables differ in length: ${mergesL.length} vs ${mergesR.length}")
    var syms = new Array[String](word.length)
    var i = 0
    while (i < word.length) { syms(i) = word.substring(i, i + 1); i += 1 }
    var t = 0
    while (t < mergesL.length) {
      syms = applyMerge(syms, mergesL(t), mergesR(t))
      t += 1
    }
    syms
  }
}
