package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-defeating join helpers (SURVEY §4: salting for hot keys).
  *
  * A shuffled equi-join hashes each side by the join key, so every row
  * of a hot key lands on ONE reducer — at 100 TB a power-law key (the
  * bot user, the empty-string normalized doc) turns into a straggler
  * task hours long. Salting splits each key across `salt` reducers:
  * the fact side gets a deterministic salt from a row-unique column
  * (no RNG — reruns and retries route identically), the dimension side
  * replicates each row `salt` times, and the join key becomes
  * (key, salt). Results are IDENTICAL to the unsalted join — every
  * fact row still meets exactly the dimension rows of its key — which
  * is what the oracle checks.
  *
  * This is the manual, always-on form of what AQE's skew-join split
  * does adaptively for sort-merge joins; it also covers the cases AQE
  * misses (shuffled hash joins, skew below AQE's 5-partition-median
  * threshold but above the straggler budget, and aggregation feeding
  * the join).
  */
object Skew {

  /** Inner equi-join of `fact` to `dim` with the key salted `salt`
    * ways. `factSaltSrc` must be non-null and spread-out (a row id, an
    * event id — NOT the join key, which would put the whole hot key in
    * one salt bucket again). Dimension rows replicate `salt`× map-side
    * (an Expand-style explode, no shuffle added on the build side
    * beyond the join's own). The `_salt` routing column is dropped
    * from the output.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                 dimKey: String, factSaltSrc: Column,
                 salt: Int = 16): DataFrame = {
    require(salt >= 2, "salt must be >= 2")
    val f = fact.withColumn("_salt", pmod(xxhash64(factSaltSrc), lit(salt)))
    val d = dim.withColumn("_salt",
      explode(expr(s"sequence(CAST(0 AS BIGINT), CAST(${salt - 1} AS BIGINT))")))
    // shuffle_hash pins the shuffled path: a broadcast join has no
    // per-key reducer to overload, so salting it would only multiply
    // the build side; the hint makes the demonstrated plan the one
    // salting exists for. (At 100 TB the dimension exceeds the
    // broadcast threshold and this is the plan AQE picks anyway.)
    f.join(d.hint("shuffle_hash"),
      f(factKey) === d(dimKey) && f("_salt") === d("_salt"))
      .drop("_salt")
  }
}
