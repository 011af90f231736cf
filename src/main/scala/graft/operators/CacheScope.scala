package graft.operators

import org.apache.spark.sql.{Dataset, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Operator-scoped cache lifecycle.
  *
  * Several operators cache an intermediate frame that feeds two or
  * more branches of ONE returned plan (tf → df-agg AND join; postings
  * → both sides of a self-join). The cache is required while the
  * caller materializes the result, but a bare `.cache()` in a library
  * function leaks: Spark's CacheManager holds the plan by strong
  * reference until an explicit `unpersist()`/`clearCache()`, so a
  * long-lived session accumulates every intermediate any operator ever
  * cached.
  *
  * [[scoped]] gives the cache an automatic release point: the operator
  * registers its intermediates against its RESULT plan, and a
  * session-level action-completion listener unpersists them after the
  * FIRST completed action whose analyzed plan contains that result
  * (matched with `sameResult`, so caller-side projections/renames on
  * top don't break it). Verify's per-query parquet write, Bench's
  * `count()`, and a library user's terminal action all fire it.
  *
  * Contract: the cache lives exactly until the first action that
  * consumes the operator's result (success OR failure). Re-running the
  * same result afterwards recomputes without the cache — correct,
  * just uncached; call the operator again for a fresh scoped cache.
  * Results never acted on keep their registration until [[releaseAll]]
  * (or session `clearCache()`), the same liability an unreleased
  * manual cache had — but now with a one-call global release.
  *
  * Iterative operators that truncate lineage (`localCheckpoint` in the
  * component loops) hide consumed upstream plans from the listener —
  * they call [[releaseFor]] on their input once their first internal
  * action has materialized everything they need from it.
  */
object CacheScope {

  private final case class Entry(session: SparkSession, owner: LogicalPlan,
                                 caches: Seq[Dataset[_]])
  private val pending = new java.util.concurrent.ConcurrentLinkedQueue[Entry]()
  private val hooked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[SparkSession]()

  /** Register `caches` (already `.cache()`/`.persist()`ed intermediates
    * of `result`'s plan) for release after the first action on
    * `result`. Returns `result` unchanged. */
  def scoped[T](result: Dataset[T], caches: Dataset[_]*): Dataset[T] = {
    if (caches.nonEmpty) {
      purgeStopped()
      ensureListener(result.sparkSession)
      pending.add(Entry(result.sparkSession,
        GraftSqlBridge.analyzedPlan(result), caches))
    }
    result
  }

  /** Drop state tied to STOPPED sessions: their caches are gone with
    * the context, so holding the entry (or the session in `hooked`)
    * would just re-create the leak this object exists to close, one
    * layer up. Called from every mutation path — both collections stay
    * bounded by LIVE sessions' registrations. */
  private def purgeStopped(): Unit = {
    val it = pending.iterator()
    while (it.hasNext) if (it.next().session.sparkContext.isStopped) it.remove()
    hooked.removeIf(s => s.sparkContext.isStopped)
  }

  /** Release every pending registration whose owner plan occurs inside
    * `consumed`'s analyzed plan — for operators whose internal actions
    * run behind a lineage-truncating checkpoint, where the listener
    * can't see what was consumed. */
  def releaseFor(consumed: Dataset[_]): Unit =
    releaseMatching(GraftSqlBridge.analyzedPlan(consumed))

  /** Unpersist every still-pending scoped cache (results that were
    * never materialized). Entries of STOPPED sessions are dropped, not
    * unpersisted — their caches died with the context, and an RPC
    * against a stopped env would throw and abort the drain mid-queue. */
  def releaseAll(): Unit = {
    var e = pending.poll()
    while (e != null) {
      if (!e.session.sparkContext.isStopped)
        e.caches.foreach(_.unpersist(false))
      e = pending.poll()
    }
  }

  private def releaseMatching(plan: LogicalPlan): Unit = {
    val it = pending.iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.session.sparkContext.isStopped) it.remove()
      else if (plan.exists(_.sameResult(e.owner))) {
        it.remove()
        e.caches.foreach(_.unpersist(false))
      }
    }
  }

  private def ensureListener(spark: SparkSession): Unit =
    if (hooked.add(spark))
      GraftSqlBridge.onActionComplete(spark, qe => releaseMatching(qe.analyzed))
}
