package graft.spark

import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.CollectMetrics
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions.{count, lit}
import org.apache.spark.sql.util.QueryExecutionListener

/** Scoped persist lifecycle for operators that cache an intermediate
  * relation consumed by several branches of the plan they RETURN
  * (IVF-assigned corpora, positive-pair elections): the operator cannot
  * unpersist before returning — no action has run, so the cache would be
  * dropped before it was ever filled — and leaving it pinned forever
  * forces callers into manual `clearCache()` bookkeeping (the r10 caveat
  * this replaces).
  *
  * [[CacheRelease.afterFirstAction]] tags the returned plan with a
  * zero-cost `observe` marker and registers a one-shot
  * [[QueryExecutionListener]]: when the FIRST action over any plan
  * containing the marker completes (success or failure), the listener
  * unpersists the caches and unregisters itself. Within that one action
  * Spark fills and reuses the cache across all consuming branches —
  * exactly the window the persist exists for; re-executing the returned
  * DataFrame afterwards recomputes (correct, just uncached), the
  * documented trade for a session that never accumulates stale blocks.
  *
  * The marker survives caller-side transforms (projections/joins stack
  * ON TOP of the CollectMetrics node), so `op(...).filter(...).count()`
  * releases just the same. If the caller never runs an action the cache
  * (and one listener) stays until `clearCache()` — unavoidable without
  * an action to observe.
  *
  * NOT for snapshot-dependent persists: when a collected artifact
  * (driver-side partition bases, range boundaries) describes one
  * specific materialization — `packingOffsets`, `trainingOrder`,
  * `curriculumOrder` — releasing the cache makes RE-execution produce
  * different partitioning and WRONG results, not just slow ones. Those
  * persists are correctness pins and stay caller-managed.
  */
private[graft] object CacheRelease {

  /** Monotonic marker suffix — observation names must be unique within
    * one query, and composed operators (e.g. contrastiveTriplets
    * wrapping hardNegativesIvf) put several markers in one action.
    */
  private val counter = new AtomicLong(0)

  /** Return `result` tagged so that the first completed action over it
    * unpersists every DataFrame in `cached`, then drops the hook.
    */
  def afterFirstAction(result: DataFrame, cached: Seq[DataFrame]): DataFrame = {
    val name = s"graft_cache_release_${counter.incrementAndGet()}"
    val spark = result.sparkSession
    val released = new AtomicBoolean(false)
    val listener = new QueryExecutionListener {
      // plan-based detection (not observedMetrics) so a FAILED action
      // still releases — metrics are unavailable on failure
      private def marked(qe: QueryExecution): Boolean =
        try qe.analyzed.exists {
          case c: CollectMetrics => c.name == name
          case _ => false
        } catch { case _: Throwable => false }
      private def maybeRelease(qe: QueryExecution): Unit =
        if (marked(qe) && released.compareAndSet(false, true)) {
          cached.foreach { df =>
            try df.unpersist(blocking = false)
            catch { case _: Throwable => () }
          }
          spark.listenerManager.unregister(this)
        }
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = maybeRelease(qe)
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = maybeRelease(qe)
    }
    spark.listenerManager.register(listener)
    result.observe(name, count(lit(1)).as("rows"))
  }
}
