package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — for each left row, attach the payload
  * of the LATEST right row with `right.time <= left.time` in the same
  * key group (`strict = true` uses `<`): the telemetry/state-snapshot
  * join Spark has no native operator for.
  *
  * Spark-first shape: NOT a range join (O(n·m) candidate explosion
  * under a theta-join) and NOT a per-key collect. The two sides union
  * with a side tag, and ONE window pass — hash exchange on the keys +
  * per-partition sort, the same cost envelope as any keyed signal op —
  * carries the last right payload forward onto every left row
  * (`last(_, ignoreNulls)` over rows unbounded-preceding..current).
  * At equal times the tag orders the right row first, giving the `<=`
  * semantics (flipped for strict); payload travels as ONE struct so
  * multi-column payloads can never mix rows even when some payload
  * fields are null.
  *
  * Left rows with no matching right row keep a null payload (left-join
  * semantics). Right rows with duplicate (keys, time) are ordered by
  * the payload struct for cross-engine determinism — callers wanting a
  * specific winner should dedupe first.
  *
  * `tolerance` (pandas merge_asof semantics): a finite value nulls the
  * payload when the matched right row is older than `tolerance` time
  * units — the latest right row IS the closest one, so nulling (rather
  * than re-searching) is exact. Implemented by carrying the right time
  * inside the payload struct; the default (∞) emits the identical plan
  * as before.
  */
object AsOf {

  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               timeCol: String, payload: Seq[String],
               strict: Boolean = false,
               tolerance: Double = Double.PositiveInfinity): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one key column")
    require(payload.nonEmpty, "asofJoin needs at least one payload column")
    require(tolerance >= 0, s"tolerance must be >= 0, got $tolerance")
    val leftCols = left.columns.toSeq
    require(payload.forall(right.columns.contains), "payload must exist in right")
    // a payload name colliding with a left column would emit duplicate
    // output columns (ambiguous on any downstream by-name reference)
    require(payload.forall(!leftCols.contains(_)),
      s"payload columns ${payload.filter(leftCols.contains).mkString(", ")} " +
        "collide with left columns — rename one side")
    val tagR = if (strict) 1 else 0
    val tagL = 1 - tagR
    // ordering type for the union'd time: integral stays LONG — a
    // double cast would merge nanosecond epochs above 2^53 and
    // silently change which right row is "latest" (ADVICE r8);
    // fractional/timestamp types order as double as before
    import org.apache.spark.sql.types._
    val integral = Seq(left, right).forall(_.schema(timeCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    })
    val tType = if (integral) "long" else "double"
    // the right time rides inside the payload struct (_rt) so the
    // tolerance check can compare against the matched row, not just
    // the carried values; it leads the struct, so tie ordering among
    // duplicate (keys, time) right rows is unchanged (_rt equal there)
    val rT = right.select(
      (keys.map(col) :+ col(timeCol).cast(tType).as("_t") :+
        lit(tagR).as("_tag") :+
        struct((col(timeCol).cast(tType).as("_rt") +: payload.map(col)): _*)
          .as("_pl")): _*)
    // carry the whole left row as a struct so arbitrary left schemas
    // survive the union without column gymnastics
    val lT = left.select(
      (keys.map(col) :+ col(timeCol).cast(tType).as("_t") :+
        lit(tagL).as("_tag") :+ struct(leftCols.map(col): _*).as("_lrow")): _*)
    val u = rT.withColumn("_lrow", lit(null).cast(lT.schema("_lrow").dataType))
      .unionByName(lT.withColumn("_pl", lit(null).cast(rT.schema("_pl").dataType)))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t"), col("_tag"), col("_pl"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = u.withColumn("_last", last(col("_pl"), ignoreNulls = true).over(w))
      .filter(col("_tag") === tagL)
    // subtract FIRST, cast after: long times subtract exactly (the
    // same >2^53 nanosecond-epoch hazard the ordering path avoids),
    // and the small difference casts to double losslessly
    val pick: String => Column =
      if (tolerance.isPosInfinity) p => col(s"_last.$p").as(p)
      else p => when(
        (col("_t") - col("_last._rt")).cast("double") <= tolerance,
        col(s"_last.$p")).as(p)
    out.select(
      leftCols.map(c => col(s"_lrow.$c").as(c)) ++ payload.map(pick): _*)
  }
}
