package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Functions.dsl._

/** Deduplication operators for training-data pipelines (SURVEY.md §2.2
  * ops 18-22). Hash/bucket families are md5-derived so the DuckDB
  * oracle can reproduce them bit-for-bit (lexicographic min over hex
  * strings — engine-portable).
  *
  * Scale notes (§4): exact dedup shuffles md5 keys, not documents;
  * MinHash banding turns O(n²) candidate generation into a shuffle on
  * band signatures (skew-capped by construction: identical docs cap a
  * bucket, verification is per-bucket map-side); embedding blocking
  * uses random-hyperplane buckets so only same-bucket pairs are
  * scored.
  */
object Dedup {

  /** Exact dedup after normalization: every doc mapped to the smallest
    * doc_id sharing its normalized text. One shuffle on the hash.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val h = md5(encode(TextOps.normalize(col(textCol)), "UTF-8"))
    val w = Window.partitionBy(col("_h"))
    df.withColumn("_h", h)
      .withColumn("canonical_id", min(col(idCol)).over(w))
      .withColumn("is_dup", (col(idCol) =!= col("canonical_id")).cast("int"))
      .drop("_h")
  }

  /** Lowercased 3-word shingles of a word-array column. `ws` must be a
    * plain attribute (not an expression): Catalyst inlines expression
    * arguments into every lambda element, so passing `split(...)` here
    * would re-run the regex split per shingle per reference.
    */
  def shingles(ws: Column): Column =
    transform(sequence(lit(0), size(ws) - 3),
      i => concat_ws(" ", element_at(ws, i + 1), element_at(ws, i + 2),
        element_at(ws, i + 3)))

  /** (id, shingle) long frame (docs with <3 words drop out). The word
    * split is materialized behind a hash exchange on the id: this (a)
    * computes the regex split exactly once per doc (the exchange stops
    * Catalyst's project-collapsing from inlining it into the shingle
    * lambda), (b) spreads small single-file scans across the cluster,
    * and (c) pre-partitions by id so the downstream minhash groupBy
    * reuses the exchange instead of shuffling again.
    */
  def shingleFrame(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), TextOps.words(col(textCol)).as("_ws"))
      .repartition(col(idCol))
      .filter(size(col("_ws")) >= 3)
      .select(col(idCol), explode(shingles(col("_ws"))).as("s"))

  /** MinHash signatures: k independent permutations approximated by
    * min over the leading 60 bits of md5(seed || shingle) as BIGINT
    * (same ordering as the lexicographic hex min — fixed-width hex is
    * order-isomorphic to its numeric value — but long-typed, so the
    * aggregate stays in codegen'd HashAggregate instead of falling
    * back to SortAggregate on string buffers, and the shuffle carries
    * 8-byte values). One shuffle (groupBy id) computes all k mins
    * map-side-combined.
    */
  def minhash(sh: DataFrame, idCol: String, k: Int): DataFrame = {
    val aggs = (0 until k).map { i =>
      min(conv(substring(md5(encode(concat(lit(s"$i|"), col("s")), "UTF-8")), 1, 15),
        16, 10).cast("long")).as(s"h$i")
    }
    sh.groupBy(col(idCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Band signatures: k hashes in bands of r → (id, band, sig). */
  def bands(mh: DataFrame, idCol: String, k: Int, r: Int): DataFrame = {
    val nBands = k / r
    val sigs = (0 until nBands).map { b =>
      struct(lit(b).as("band"),
        concat_ws("|", (0 until r).map(j => col(s"h${b * r + j}")): _*).as("sig"))
    }
    mh.select(col(idCol), explode(array(sigs: _*)).as("bs"))
      .select(col(idCol), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  /** LSH candidate pairs (a < b): docs sharing any band signature.
    * One shuffle on (band, sig) gathers each bucket's ids; pairs are
    * emitted map-side within the bucket (no self-join — a self-join
    * would rebuild the whole shingle→minhash pipeline for both sides
    * and broadcast one of them). Identical docs collapse to one
    * bucket, so bucket sizes are bounded by the duplicate-cluster
    * size; `maxBucket` caps the quadratic pair emission for degenerate
    * buckets (a bucket of identical boilerplate at corpus scale) — the
    * capped buckets are already fully-connected duplicate clusters, so
    * downstream exact-dedup handles them more cheaply than pairing.
    */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 12, r: Int = 3,
                        maxBucket: Int = Int.MaxValue): DataFrame = {
    val sh = shingleFrame(df, idCol, textCol)
    val bd = bands(minhash(sh, idCol, k), idCol, k, r)
    val buckets = bd.groupBy(col("band"), col("sig"))
      .agg(sort_array(collect_list(col(idCol).cast("long"))).as("ids"))
      .filter(size(col("ids")) > 1 && size(col("ids")) <= maxBucket)
    buckets
      .select(explode(pairsC(col("ids"))).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .distinct()
  }

  /** Exact n-gram (3-word shingle) Jaccard over LSH candidates,
    * keeping pairs with jac >= minJac.
    */
  /** Exact n-gram (3-word shingle) Jaccard over LSH candidates,
    * keeping pairs with jac >= minJac. The candidate set is sparse by
    * LSH construction, so both intersection joins broadcast the pair
    * side — the (large) distinct-shingle frame is scanned once,
    * map-side, with its distinct exchange reused by the size
    * aggregation. If candidates ever outgrow broadcast range the
    * joins degrade to shuffles via AQE, not to failure.
    */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String,
                   minJac: Double = 0.8, k: Int = 12, r: Int = 3): DataFrame = {
    val cand = minhashCandidates(df, idCol, textCol, k, r)
    val shd = shingleFrame(df, idCol, textCol).distinct()
    val sizes = shd.groupBy(col(idCol)).agg(count(lit(1)).as("sz"))
    val aSh = shd.select(col(idCol).as("a"), col("s"))
      .join(broadcast(cand), "a")
    val inter = shd.select(col(idCol).as("b"), col("s"))
      .join(broadcast(aSh), Seq("b", "s"))
      .groupBy("a", "b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col(idCol).as("a"), col("sz").as("na")), "a")
      .join(sizes.select(col(idCol).as("b"), col("sz").as("nb")), "b")
      .withColumn("jac", col("inter").cast("double") /
        (col("na") + col("nb") - col("inter")))
      .filter(col("jac") >= minJac)
      .select(col("a"), col("b"), col("jac"))
  }

  /** Connected components over near-duplicate pairs: every doc that
    * appears in a pair is labelled with the smallest id reachable
    * through the pair graph — the canonical representative of its
    * duplicate cluster ("keep one per cluster" then being a filter on
    * id != cluster_id). Iterative min-label propagation, the standard
    * distributed CC shape: each round is one shuffle (neighbor-min
    * aggregation); rounds = graph diameter (near-dup clusters are
    * shallow); lineage is truncated per round with an eager
    * localCheckpoint so the plan stays linear.
    */
  def dupClusters(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    // materialize the edge list once — every iteration joins it, and
    // without the checkpoint each round would re-run the whole
    // candidate-generation pipeline upstream of `pairs`
    val edges = pairs.select(col("a"), col("b"))
      .union(pairs.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint(true)
    // seed with the direct-neighborhood minimum (one aggregation) —
    // equivalent to running the first propagation round for free
    var labels = edges.groupBy(col("a"))
      .agg(least(col("a"), min(col("b"))).as("lbl"))
      .withColumnRenamed("a", "id")
      .localCheckpoint(true)
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIters) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "b"), "b")
        .groupBy(col("a").as("id")).agg(min(col("lbl")).as("_nl"))
      val updated = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("lbl"), coalesce(col("_nl"), col("lbl"))).as("lbl"),
          col("lbl").as("_old"))
        .localCheckpoint(true)
      changed = updated.filter(col("lbl") =!= col("_old")).count()
      labels = updated.select(col("id"), col("lbl"))
      iter += 1
    }
    labels.withColumnRenamed("id", "doc_id").withColumnRenamed("lbl", "cluster_id")
  }

  /** 64-bit SimHash signature per doc as (hi32, lo32). Map-side only. */
  def simhashFrame(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    graft.functions.Functions.install(df.sparkSession)
    df.withColumn("_sh", simhashC(TextOps.words(col(textCol))))
      .withColumn("sim_hi", col("_sh.hi"))
      .withColumn("sim_lo", col("_sh.lo"))
      .drop("_sh")
  }

  /** SimHash near-dup pairs with hamming distance <= maxHam. The
    * self-join here blocks on the high 16 bits first (near-dups almost
    * always agree there), then verifies full hamming — at scale this
    * is the standard rotate-and-block scheme's first table.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHam: Int = 3): DataFrame = {
    val sig = simhashFrame(df, idCol, textCol)
      .select(col(idCol), col("sim_hi"), col("sim_lo"))
      .withColumn("blk", shiftright(col("sim_hi"), 16))
    val a = sig.select(col("blk"), col(idCol).as("a"),
      col("sim_hi").as("hi_a"), col("sim_lo").as("lo_a"))
    val b = sig.select(col("blk"), col(idCol).as("b"),
      col("sim_hi").as("hi_b"), col("sim_lo").as("lo_b"))
    a.join(b, "blk").filter(col("a") < col("b"))
      .withColumn("hamming",
        bit_count(col("hi_a").bitwiseXOR(col("hi_b"))) +
          bit_count(col("lo_a").bitwiseXOR(col("lo_b"))))
      .filter(col("hamming") <= maxHam)
      .select(col("a"), col("b"), col("hamming"))
  }
}
