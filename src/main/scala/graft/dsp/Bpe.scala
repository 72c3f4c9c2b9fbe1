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

  // ---- byte-level variants (round 18 — the GPT-2 byte alphabet) ----
  // Same greedy algorithm over UTF-8 BYTE sequences: symbols are byte
  // arrays, so digits, punctuation, and multi-byte scripts (CJK,
  // Arabic, Cyrillic) participate in merges instead of falling
  // outside a closed [a-z] alphabet. decode is plain concatenation of
  // the byte symbols — no unknown token is possible by construction.

  /** One greedy pass of merge (l, r) over a byte-symbol sequence. */
  def applyMergeB(syms: Array[Array[Byte]], l: Array[Byte],
                  r: Array[Byte]): Array[Array[Byte]] = {
    val n = syms.length
    if (n < 2) return syms
    val out = new Array[Array[Byte]](n)
    var i = 0
    var k = 0
    while (i < n) {
      if (i + 1 < n && java.util.Arrays.equals(syms(i), l) &&
          java.util.Arrays.equals(syms(i + 1), r)) {
        val m = new Array[Byte](syms(i).length + syms(i + 1).length)
        System.arraycopy(syms(i), 0, m, 0, syms(i).length)
        System.arraycopy(syms(i + 1), 0, m, syms(i).length, syms(i + 1).length)
        out(k) = m
        i += 2
      } else {
        out(k) = syms(i)
        i += 1
      }
      k += 1
    }
    java.util.Arrays.copyOf(out, k)
  }

  /** Encode a word's UTF-8 bytes: split to single-byte symbols, then
    * apply each merge pair in rank order.
    */
  def encodeB(word: Array[Byte], mergesL: Array[Array[Byte]],
              mergesR: Array[Array[Byte]]): Array[Array[Byte]] = {
    require(mergesL.length == mergesR.length,
      s"merge tables differ in length: ${mergesL.length} vs ${mergesR.length}")
    var syms = new Array[Array[Byte]](word.length)
    var i = 0
    while (i < word.length) { syms(i) = Array(word(i)); i += 1 }
    var t = 0
    while (t < mergesL.length) {
      syms = applyMergeB(syms, mergesL(t), mergesR(t))
      t += 1
    }
    syms
  }
}
