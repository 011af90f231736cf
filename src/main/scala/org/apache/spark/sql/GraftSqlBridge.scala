package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column↔Expression conversion (Spark 4
  * moved Column onto ColumnNode; `classic.ExpressionUtils` is the
  * sanctioned converter but is sql-private). Lives in the spark.sql
  * package purely for access; no Spark internals are modified. */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Re-home a batch DataFrame onto `session` WITHOUT collecting: the
    * InternalRow RDD is re-wrapped under the target session's state.
    * Needed because `foreachBatch` hands a frame bound to the stream's
    * CLONED session, whose temp-view catalog is a snapshot — views
    * registered through it are invisible to the main session (and vice
    * versa). The RDD stays distributed and lazy. */
  def toSession(session: SparkSession, df: Dataset[Row]): DataFrame = {
    val cs = session.asInstanceOf[classic.SparkSession]
    val cdf = df.asInstanceOf[classic.DataFrame]
    cs.internalCreateDataFrame(cdf.queryExecution.toRdd, cdf.schema)
  }

  /** Clone a session: shared SparkContext/SharedState, but its OWN
    * SessionState — conf, temp-view catalog, and registered functions
    * are copied at clone time and evolve independently. The seam for
    * per-statement execution sessions (`cloneSession` is sql-private):
    * each long-running INSERT shadows views in its own clone, so
    * independent statements' micro-batches never serialize on a shared
    * catalog. */
  def cloneSession(session: SparkSession): SparkSession =
    session.asInstanceOf[classic.SparkSession].cloneSession()

  /** Analyzed logical plan of a Dataset (queryExecution is classic-only
    * in the unified-API split). */
  def analyzedPlan(df: Dataset[_]): catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed

  /** DataFrame over a LogicalPlan (`Dataset.ofRows` is sql-private) —
    * the execution seam for engine-rewritten plans (the retraction-
    * aware aggregate rewrite transforms an ANALYZED Aggregate and needs
    * it back as a runnable, still-streaming DataFrame). */
  def ofRows(session: SparkSession,
             plan: catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(session.asInstanceOf[classic.SparkSession], plan)

  /** Register a query-execution listener (action-completion hook) on a
    * session (`listenerManager` is classic-only). */
  def onActionComplete(session: SparkSession,
                       f: execution.QueryExecution => Unit): Unit =
    session.asInstanceOf[classic.SparkSession].listenerManager.register(
      new util.QueryExecutionListener {
        override def onSuccess(funcName: String, qe: execution.QueryExecution,
                               durationNs: Long): Unit = f(qe)
        override def onFailure(funcName: String, qe: execution.QueryExecution,
                               exception: Exception): Unit = f(qe)
      })

  /** Block until the context's listener bus has drained — lets tests
    * assert on (async) QueryExecutionListener deliveries without
    * polling. (`listenerBus` is private[spark]; this bridge lives under
    * org.apache.spark.* precisely for such access.) */
  def awaitListenerBus(session: SparkSession): Unit =
    session.sparkContext.listenerBus.waitUntilEmpty()

  /** True when the session's shared cache manager holds no cached
    * (InMemoryRelation) plans — the library-hygiene assertion surface. */
  def cacheManagerIsEmpty(session: SparkSession): Boolean =
    session.asInstanceOf[classic.SparkSession].sharedState.cacheManager.isEmpty

  /** Count cache-scan (InMemoryTableScan) nodes in an EXECUTED plan,
    * descending through AQE wrappers (AdaptiveSparkPlanExec /
    * QueryStageExec hide their subtree from `children`). Plan-shape
    * tests need this because `executedPlan.toString` truncates long
    * trees, silently dropping later branches from string counts. */
  def countCacheScans(df: Dataset[_]): Int = {
    import execution.SparkPlan
    import execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import execution.columnar.InMemoryTableScanExec
    def walk(p: SparkPlan): Int = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case o => o.children
      }
      val self = p match {
        case s: InMemoryTableScanExec =>
          // descend into the cached relation's own physical plan too
          1 + walk(s.relation.cachedPlan)
        case _ => 0
      }
      self + kids.map(walk).sum
    }
    walk(df.asInstanceOf[classic.Dataset[_]].queryExecution.executedPlan)
  }
}
