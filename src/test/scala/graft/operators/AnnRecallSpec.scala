package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Measured recall@k of the approximate ANN paths against brute force
  * (VERDICT r8 #6): the oracles prove LSH/IVF return exactly what
  * their blocking scheme promises; this spec pins how much of the TRUE
  * top-k that blocking retains on the real embeddings table, so a
  * future change that silently degrades retrieval quality (bad
  * centroid fit, broken probe set) fails loudly. Floors sit just
  * below the measured values (see SURVEY §4).
  */
class AnnRecallSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private val k = 10

  private lazy val corpus = {
    graft.functions.Functions.install(spark)
    spark.read.parquet(s"$dir/embeddings.parquet")
  }
  private lazy val queries = corpus.filter(col("vec_id") < 20)

  /** query_id -> true top-k neighbor set. */
  private def neighborSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.select(col("query_id").cast("long"), col("neighbor_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (q, rows) => q -> rows.map(_._2).toSet }

  private def recallVs(approx: Map[Long, Set[Long]],
                       truth: Map[Long, Set[Long]]): Double = {
    val per = truth.map { case (q, t) =>
      approx.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
    }
    per.sum / per.size
  }

  test(s"IVF (trained) and LSH recall@$k vs brute force stay above their floors") {
    val truth = neighborSets(
      Ann.topkBruteForce(corpus, queries, "vec_id", "embedding", k))
    assert(truth.size == 20 && truth.forall(_._2.size == k))

    val cents = Ann.kmeansFit(corpus, "vec_id", "embedding", k = 16, iters = 2)
    val ivf = neighborSets(Ann.topkIvf(corpus, queries, "vec_id", "embedding",
      k, nProbe = 4, centroids = Some(cents)))
    val ivfRecall = recallVs(ivf, truth)

    val lsh = neighborSets(
      Ann.topkLsh(corpus, queries, "vec_id", "embedding", k))
    val lshRecall = recallVs(lsh, truth)
    val lsh4 = neighborSets(
      Ann.topkLsh(corpus, queries, "vec_id", "embedding", k, nPlanes = 4))
    val lsh4Recall = recallVs(lsh4, truth)

    info(f"recall@$k: ivf_trained=$ivfRecall%.3f (nProbe=4/16) " +
      f"lsh8=$lshRecall%.3f lsh4=$lsh4Recall%.3f (hamming-1 probes)")
    assert(ivfRecall >= 0.75, f"trained-IVF recall@$k degraded: $ivfRecall%.3f")
    assert(lshRecall >= 0.08, f"LSH(8 planes) recall@$k degraded: $lshRecall%.3f")
    assert(lsh4Recall >= lshRecall,
      "coarser buckets (fewer planes) must not lose recall")
    // more probes must not lose neighbors: nProbe=8 dominates nProbe=4
    val ivf8 = neighborSets(Ann.topkIvf(corpus, queries, "vec_id", "embedding",
      k, nProbe = 8, centroids = Some(cents)))
    val ivf8Recall = recallVs(ivf8, truth)
    info(f"recall@$k: ivf_trained nProbe=8 -> $ivf8Recall%.3f")
    assert(ivf8Recall >= ivfRecall - 1e-9, "raising nProbe lowered recall")
  }

  test(s"PQ ADC recall@$k vs brute force stays above its floor") {
    val truth = neighborSets(
      Ann.topkBruteForce(corpus, queries, "vec_id", "embedding", k))
    // 8×16 codebook at 64 dims = 32× compression; ADC ranks by
    // reconstructed dot product, NOT cosine, so recall measures both
    // quantization loss and the unnormalized-score mismatch. Finer
    // codebooks (more cells per subspace) must not lose recall.
    val cb16 = Ann.pqFit(corpus, "vec_id", "embedding", nSub = 8, kSub = 16, iters = 2)
    val pq16 = neighborSets(Ann.topkPq(corpus, queries, "vec_id", "embedding",
      k, codebooks = Some(cb16)))
    val r16 = recallVs(pq16, truth)
    val cb32 = Ann.pqFit(corpus, "vec_id", "embedding", nSub = 8, kSub = 32, iters = 2)
    val pq32 = neighborSets(Ann.topkPq(corpus, queries, "vec_id", "embedding",
      k, codebooks = Some(cb32)))
    val r32 = recallVs(pq32, truth)
    info(f"recall@$k: pq 8x16=$r16%.3f 8x32=$r32%.3f (ADC, no rerank)")
    assert(r16 >= 0.25, f"PQ(8x16) recall@$k degraded: $r16%.3f")
    assert(r32 >= r16 - 0.10,
      f"doubling cells per subspace collapsed recall: $r32%.3f vs $r16%.3f")
  }

  test(s"IVF-PQ recall@$k vs brute force stays above its floor") {
    val truth = neighborSets(
      Ann.topkBruteForce(corpus, queries, "vec_id", "embedding", k))
    // residual quantization + cell pruning: recall is bounded above by
    // IVF's probe coverage and below by PQ's quantization loss — it
    // must beat raw-PQ-at-the-same-budget on the probed fraction
    val ivfpq = neighborSets(Ann.topkIvfPq(corpus, queries, "vec_id",
      "embedding", k, nProbe = 4, nSub = 8, kSub = 16, iters = 1))
    val r = recallVs(ivfpq, truth)
    val ivfpq8 = neighborSets(Ann.topkIvfPq(corpus, queries, "vec_id",
      "embedding", k, nProbe = 8, nSub = 8, kSub = 16, iters = 1))
    val r8 = recallVs(ivfpq8, truth)
    info(f"recall@$k: ivfpq nProbe=4 -> $r%.3f, nProbe=8 -> $r8%.3f")
    assert(r >= 0.20, f"IVF-PQ recall@$k degraded: $r%.3f")
    assert(r8 >= r - 1e-9, "raising nProbe lowered IVF-PQ recall")
  }

  test(s"IVF-PQ shortlist + exact rerank recall@$k: rerank dominates raw ADC") {
    val truth = neighborSets(
      Ann.topkBruteForce(corpus, queries, "vec_id", "embedding", k))
    // the production tail emb_knn_graph_ivfpq rides on: ADC ranks a
    // 4k-candidate shortlist, exact cosine reranks it. Recall is then
    // bounded only by shortlist coverage, so it must dominate the raw
    // ADC ranking at the same probe budget.
    val adc = Ann.topkIvfPq(corpus, queries, "vec_id", "embedding",
      k, nProbe = 8, nSub = 8, kSub = 16, iters = 1)
    val shortlist = Ann.topkIvfPq(corpus, queries, "vec_id", "embedding",
      k * 4, nProbe = 8, nSub = 8, kSub = 16, iters = 1)
    val rr = neighborSets(Ann.rerankExact(shortlist, corpus, queries,
      "vec_id", "embedding", k))
    val rAdc = recallVs(neighborSets(adc), truth)
    val rRr = recallVs(rr, truth)
    info(f"recall@$k: ivfpq ADC=$rAdc%.3f, shortlist(4k)+exact rerank=$rRr%.3f")
    assert(rRr >= rAdc - 1e-9, "exact rerank lost recall vs raw ADC")
    assert(rRr >= 0.55, f"rerank recall@$k degraded: $rRr%.3f")
    // wherever the true neighbor made the shortlist, the reranked
    // score is the brute-force fp6 cosine bit-for-bit
    val bf = Ann.topkBruteForce(corpus, queries, "vec_id", "embedding", k)
      .select(col("query_id"), col("neighbor_id"), col("score_fp"))
    val rrScores = Ann.rerankExact(shortlist, corpus, queries,
      "vec_id", "embedding", k)
      .select(col("query_id"), col("neighbor_id"),
        col("score_fp").as("rr_fp"))
    val joined = bf.join(rrScores, Seq("query_id", "neighbor_id")).collect()
    assert(joined.nonEmpty)
    joined.foreach(r0 => assert(r0.getLong(2) == r0.getLong(3),
      s"rerank score != brute-force score on ${r0.getLong(0)}->${r0.getLong(1)}"))
  }

  test("OPQ rotation: valid model, lower distortion, recall floor") {
    val m = Ann.opqFit(corpus, "vec_id", "embedding", nSub = 8)
    // the rotation really is orthogonal and really diagonalizes the
    // independently collected covariance; the greedy allocation is at
    // least as balanced as the contiguous split (and on this corpus,
    // strictly better — a degenerated greedy was exactly equal)
    assert(m.orthErr < 1e-9, f"RRt-I off by ${m.orthErr}%.2e")
    assert(m.diagErr < 1e-8, f"R C Rt offdiag ${m.diagErr}%.2e")
    assert(m.allocSpread < m.contigSpread - 1e-6,
      f"eigenvalue allocation not better balanced than contiguous: " +
        f"${m.allocSpread}%.4f vs ${m.contigSpread}%.4f")
    // Ge et al.'s claim at identical code budget: rotated-space PQ has
    // strictly lower mean squared reconstruction error
    val rot = Ann.opqRotate(corpus, "embedding", m.rotation, "_rv")
      .select(col("vec_id"), col("_rv"))
    val cbO = Ann.pqFit(rot, "vec_id", "_rv", nSub = 8, kSub = 16, iters = 2)
    val cbP = Ann.pqFit(corpus, "vec_id", "embedding", nSub = 8, kSub = 16, iters = 2)
    val mseO = Ann.pqDistortion(Ann.pqEncode(rot, cbO, "vec_id", "_rv", "c"),
      cbO, "_rv", "c").head().getDouble(0)
    val mseP = Ann.pqDistortion(
      Ann.pqEncode(corpus, cbP, "vec_id", "embedding", "c"),
      cbP, "embedding", "c").head().getDouble(0)
    info(f"PQ reconstruction MSE: raw=$mseP%.4f opq-rotated=$mseO%.4f")
    assert(mseO < mseP, f"OPQ did not reduce distortion: $mseO%.4f vs $mseP%.4f")
    val truth = neighborSets(
      Ann.topkBruteForce(corpus, queries, "vec_id", "embedding", k))
    val opq = neighborSets(Ann.topkOpq(corpus, queries, "vec_id",
      "embedding", k, model = Some(m)))
    val rOpq = recallVs(opq, truth)
    info(f"recall@$k: opq=$rOpq%.3f (ADC on rotated codes)")
    assert(rOpq >= 0.15, f"OPQ recall@$k collapsed: $rOpq%.3f")
  }

  test("OPQ beats plain PQ on a cross-subspace-correlated corpus") {
    // The corpus OPQ exists for: every subspace sees the SAME 8 latent
    // components (v[j] = z[j % 8] + noise), so plain PQ spends each
    // subspace's 16 cells re-quantizing the full 8-dim latent
    // independently, while the OPQ rotation compacts each latent
    // direction into its own subspace (eigenvalue allocation deals the
    // 8 large eigendirections one per subspace). Deterministic via a
    // fixed-seed generator.
    val rnd = new scala.util.Random(42)
    val d = 64
    val n = 240
    val scale = Array.tabulate(8)(i => 2.0 - 0.15 * i)
    val rows = (0 until n).map { id =>
      val z = Array.tabulate(8)(i => rnd.nextGaussian() * scale(i))
      val v = Array.tabulate(d)(j =>
        (z(j % 8) + 0.05 * rnd.nextGaussian()).toFloat)
      (id.toLong, v.toSeq)
    }
    import spark.implicits._
    val c = rows.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val q = c.filter(col("vec_id") < 20)
    val truth = neighborSets(Ann.topkBruteForce(c, q, "vec_id", "embedding", k))
    val m = Ann.opqFit(c, "vec_id", "embedding", nSub = 8)
    val rOpq = recallVs(neighborSets(
      Ann.topkOpq(c, q, "vec_id", "embedding", k, model = Some(m))), truth)
    val rPq = recallVs(neighborSets(
      Ann.topkPq(c, q, "vec_id", "embedding", k)), truth)
    info(f"anisotropic corpus recall@$k: opq=$rOpq%.3f pq=$rPq%.3f")
    assert(rOpq > rPq + 0.05,
      f"OPQ did not dominate PQ where rotation provably helps: " +
        f"$rOpq%.3f vs $rPq%.3f")
  }
}
