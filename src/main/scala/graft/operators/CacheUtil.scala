package graft.operators

import org.apache.spark.sql.DataFrame

/** Cache-lifetime helper shared by operators that persist bounded
  * intermediate frames inside a LAZY result (optimization round 22,
  * factored out of incrementalDedup's VERDICT-r21-#4 fix): the
  * returned DataFrame has not run yet when the builder returns, so an
  * in-function unpersist would free the caches before first use.
  * Instead a QueryExecutionListener waits for the first completed
  * execution whose analyzed plan CONTAINS the first cached frame's
  * subtree (plan-matched via sameResult, so unrelated concurrent
  * queries never trigger it), unpersists every cached frame, and
  * unregisters itself. Re-running the returned frame after that
  * simply recomputes — correctness is cache-independent.
  */
object CacheUtil {
  def unpersistAfterUse(result: DataFrame, cached: Seq[DataFrame]): Unit = {
    val session = result.sparkSession
    val markerPlan = cached.head.queryExecution.analyzed
    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    lazy val listener: org.apache.spark.sql.util.QueryExecutionListener =
      new org.apache.spark.sql.util.QueryExecutionListener {
        private def cleanup(
            qe: org.apache.spark.sql.execution.QueryExecution): Unit =
          if (qe.analyzed.find(_.sameResult(markerPlan)).isDefined &&
              done.compareAndSet(false, true)) {
            cached.foreach(_.unpersist(blocking = false))
            session.listenerManager.unregister(listener)
          }
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit = cleanup(qe)
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = cleanup(qe)
      }
    session.listenerManager.register(listener)
  }
}
