package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame

/** Round-22 scale-safety internals: the gated corpus spread
  * (Pipeline.spreadByKey) and the EM partial-count merge kernel
  * (Unigram.mergePartials) that backs the executor-side treeReduce.
  */
class ScaleSafetySpec extends SparkTestBase {
  import spark.implicits._

  private def exchanges(df: DataFrame): Int =
    "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).length

  test("spreadByKey: pre-split input passes through with ZERO added exchange") {
    val preSplit = spark.range(0, 1000, 1,
        numPartitions = spark.sparkContext.defaultParallelism)
      .selectExpr("id AS doc_id", "CAST(id AS STRING) AS text")
    val out = graft.queries.Pipeline.spreadByKey(preSplit, "doc_id")
    assert(exchanges(out) == exchanges(preSplit),
      "a scan already at session parallelism must not pay a repartition")
    assert(out.rdd.getNumPartitions == preSplit.rdd.getNumPartitions)
  }

  test("spreadByKey: single-split input spreads to defaultParallelism on the key") {
    val narrow = spark.range(0, 1000, 1, numPartitions = 1)
      .selectExpr("id AS doc_id", "CAST(id AS STRING) AS text")
    val out = graft.queries.Pipeline.spreadByKey(narrow, "doc_id")
    assert(out.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
    assert(out.queryExecution.executedPlan.toString.contains("hashpartitioning(doc_id"),
      "the spread must be a deterministic hash repartition on the key")
    // partitioning must not change row content
    assert(out.as[(Long, String)].collect().sortBy(_._1).toSeq ==
      narrow.as[(Long, String)].collect().sortBy(_._1).toSeq)
  }

  test("mergePartials: exact BigInteger sums, merge-tree invariant") {
    import graft.dsp.Unigram.mergePartials
    def lane(p: String, v: BigInt): (String, Array[Byte]) =
      (p, v.bigInteger.toByteArray)
    def decode(a: Array[(String, Array[Byte])]): Map[String, BigInt] =
      a.map { case (p, b) => p -> BigInt(new java.math.BigInteger(b)) }.toMap
    val big = BigInt("123456789012345678901234567890")
    val parts = Seq(
      Array(lane("a", 1), lane("b", big), lane("", 7)),
      Array(lane("b", big), lane("c", 2)),
      Array(lane("a", 5), lane("", 3)),
      Array(lane("c", 0)))
    val expected = Map("a" -> BigInt(6), "b" -> big * 2, "c" -> BigInt(2),
      "" -> BigInt(10))
    // left fold and a balanced tree must agree (associativity is what
    // lets the EM E-step treeReduce on executors)
    val flat = parts.reduceLeft(mergePartials)
    val tree = mergePartials(
      mergePartials(parts(0), parts(1)), mergePartials(parts(2), parts(3)))
    assert(decode(flat) == expected)
    assert(decode(tree) == expected)
  }
}
