package graft.dsp

import org.scalatest.funsuite.AnyFunSuite

/** Unigram-LM kernel contracts (Kudo 2018 hard-EM variant): Viterbi
  * argmax + deterministic integer tie-breaks, full-coverage
  * segmentation, fit invariants (reassignment never loses, chars
  * always survive pruning), and bit-stable determinism.
  */
class UnigramSpec extends AnyFunSuite {

  test("viterbi picks the max-score segmentation") {
    // 'abc': pieces a(-1), b(-1), c(-1), ab(-1), bc(-1), abc(-10)
    val lpq = Map("a" -> -1L, "b" -> -1L, "c" -> -1L,
      "ab" -> -1L, "bc" -> -1L, "abc" -> -10L)
    val (ps, score, n) = Unigram.viterbi("abc", lpq, 3)
    // best: ab|c or a|bc at -2 — fewer tokens beats a|b|c (-3);
    // lexicographic tie-break picks a|bc ('a' < 'ab' bytewise? no:
    // 'a' is a prefix of 'ab' -> 'a' sorts first) => a|bc
    assert(score == -2L && n == 2)
    assert(ps == Seq("a", "bc"))
  }

  test("fewer tokens wins an exact score tie") {
    val lpq = Map("x" -> -2L, "xx" -> -4L, "xxxx" -> -8L)
    // xxxx: 4 singles = -8, 2 doubles = -8, 1 quad = -8 -> quad wins
    val (ps, score, n) = Unigram.viterbi("xxxx", lpq, 4)
    assert(score == -8L && n == 1 && ps == Seq("xxxx"))
  }

  test("uncoverable word is loud; coverage via single chars always succeeds") {
    val e = intercept[IllegalArgumentException](
      Unigram.viterbi("abq", Map("a" -> -1L, "b" -> -1L), 3))
    assert(e.getMessage.contains("not coverable"))
    val (ps, _, _) = Unigram.viterbi("abq",
      Map("a" -> -1L, "b" -> -1L, "q" -> -9L), 3)
    assert(ps.mkString("") == "abq")
  }

  test("fit invariants: reassignment gain >= 0, chars survive, roundtrip total") {
    val words = Array(
      ("internationalization", 3L), ("international", 5L), ("nation", 9L),
      ("nationalize", 4L), ("東京都", 7L), ("京都", 6L), ("naïve", 2L),
      ("the", 20L), ("then", 8L), ("them", 6L), ("ab", 1L))
    val m = Unigram.fit(words, maxLen = 3, seedDivisor = 10L, keepMulti = 6)
    assert(m.reassignGain >= 0L, s"gain ${m.reassignGain}")
    // every character of the corpus survives as a piece
    val chars = words.flatMap(_._1.toCharArray).map(_.toString).distinct
    val pieceSet = m.pieces.map(_._1).toSet
    chars.foreach(c => assert(pieceSet(c), s"char '$c' pruned"))
    // at most keepMulti multi-char pieces
    assert(m.pieces.count(_._1.length > 1) <= 6)
    // every word segments and roundtrips under the final model
    val lpq = m.lpqMap
    words.foreach { case (w, _) =>
      val (ps, _, _) = Unigram.viterbi(w, lpq, 3)
      assert(ps.mkString("") == w, s"roundtrip broke on '$w'")
    }
    // bit-stable determinism
    val m2 = Unigram.fit(words, maxLen = 3, seedDivisor = 10L, keepMulti = 6)
    assert(m.pieces.toSeq == m2.pieces.toSeq &&
      m.loglik1 == m2.loglik1 && m.loglik2 == m2.loglik2)
  }

  test("lattice Z equals exact path enumeration; posteriors are true path probs") {
    // 'abc' under a(-1e6), b(-1e6), c(-1e6), ab(-1.5e6), bc(-1.5e6), abc(-2e6):
    // paths: a|b|c (-3e6), ab|c (-2.5e6), a|bc (-2.5e6), abc (-2e6)
    val lpq = Map("a" -> -1000000L, "b" -> -1000000L, "c" -> -1000000L,
      "ab" -> -1500000L, "bc" -> -1500000L, "abc" -> -2000000L)
    val paths = Seq(-3000000.0, -2500000.0, -2500000.0, -2000000.0)
    val zExact = {
      val m = paths.max
      m + 1e6 * math.log(paths.map(s => math.exp((s - m) / 1e6)).sum)
    }
    val (pairs, z) = Unigram.lattice("abc", lpq, 3)
    assert(math.abs(z - zExact) <= 1, s"z=$z want ~$zExact")
    val probs = paths.map(s => math.exp((s - zExact) / 1e6))
    val e = pairs.toMap
    val Q = Unigram.EQuant
    // E[abc] = P(path abc); E[ab] = P(ab|c); E[a] = P(a|b|c) + P(a|bc)
    assert(math.abs(e("abc") - math.round(Q * probs(3))) <= 2)
    assert(math.abs(e("ab") - math.round(Q * probs(1))) <= 2)
    assert(math.abs(e("a") - math.round(Q * (probs(0) + probs(2)))) <= 2)
    // char-coverage identity: sum of E[p]*len(p) == word length
    val covered = pairs.map { case (p, v) => p.length.toLong * v }.sum
    assert(math.abs(covered - math.round(3 * Q)) <= pairs.length,
      s"covered=$covered want ~3*EQuant")
    // bit determinism
    assert(Unigram.lattice("abc", lpq, 3)._1.toSeq == pairs.toSeq &&
      Unigram.lattice("abc", lpq, 3)._2 == z)
    // uncoverable is loud
    val ex = intercept[IllegalArgumentException](
      Unigram.lattice("abq", lpq, 3))
    assert(ex.getMessage.contains("not coverable"))
  }

  test("guards: reserved separator and non-BMP corpora are refused loudly") {
    val sep = intercept[IllegalArgumentException](
      Unigram.fit(Array(("ab", 1L)), 3, 2L, 4))
    assert(sep.getMessage.contains("U+001F"))
    val bmp = intercept[IllegalArgumentException](
      Unigram.fit(Array(("a😀b", 1L)), 3, 2L, 4)) // emoji = surrogate pair
    assert(bmp.getMessage.contains("non-BMP"))
  }
}
