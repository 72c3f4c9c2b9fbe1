package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range-containment) join — left rows at time `t` matched
  * to right rows whose [start, end] contains t, per key. Spark plans
  * the naive `t BETWEEN s AND e` theta-join as a (broadcast) nested
  * loop — O(|left|·|right|) per key group at any scale. The scalable
  * shape is BUCKETIZATION: each right interval explodes to the
  * fixed-width buckets it covers, each left row computes its single
  * bucket map-side, and the join runs as an ordinary hash equi-join on
  * (keys, bucket) with the exact containment predicate as a
  * post-filter. A left row lives in exactly ONE bucket, so each
  * matching (row, interval) pair is produced exactly once — no
  * distinct pass. With interval lengths bounded by L, the right-side
  * blowup is ≤ L/bucketWidth + 1 rows per interval: pick bucketWidth
  * near the typical interval length for ~2× duplication, the classic
  * spatial-binning trade.
  *
  * Degenerate intervals (end < start) are dropped up front: Spark's
  * `sequence(a, b)` would otherwise generate a DESCENDING bucket range
  * and silently mis-bucket them.
  */
object RangeJoin {

  def intervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                   tCol: String, startCol: String, endCol: String,
                   bucketWidth: Double): DataFrame = {
    require(keys.nonEmpty, "intervalJoin needs at least one key column")
    require(bucketWidth > 0, "bucketWidth must be positive")
    // shared non-key names would emit duplicate (ambiguous) columns
    val shared = left.columns.toSet.intersect(right.columns.toSet) -- keys
    require(shared.isEmpty,
      s"non-key columns ${shared.mkString(", ")} exist on both sides — rename one side")
    val lb = left.withColumn("_bk",
      floor(col(tCol).cast("double") / bucketWidth).cast("long"))
    val rb = right
      .filter(col(endCol) >= col(startCol))
      .withColumn("_bk", explode(expr(
        s"sequence(CAST(FLOOR(CAST($startCol AS DOUBLE) / $bucketWidth) AS BIGINT), " +
          s"CAST(FLOOR(CAST($endCol AS DOUBLE) / $bucketWidth) AS BIGINT))")))
    lb.join(rb, keys :+ "_bk")
      .filter(col(tCol).cast("double") >= col(startCol).cast("double") &&
        col(tCol).cast("double") <= col(endCol).cast("double"))
      .drop("_bk")
  }
}
