package graft.exec

import graft.catalog.{ChangelogMode, InMemoryCatalog, TableMeta}
import graft.ddl.StatementPreprocessor
import graft.ddl.StatementPreprocessor._
import graft.operators.ChangelogOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming execution of the reference's statement dialect: every
  * `INSERT INTO` becomes a LONG-RUNNING StreamingQuery, exactly as a
  * `confluent_flink_statement` INSERT is a never-terminating job
  * (SURVEY.md §3.1 "The INSERT statements are long-running").
  *
  * Execution scheme per target-table changelog mode:
  *
  *  - upsert (PRIMARY KEY): the select's stream is keyed and folded with
  *    `flatMapGroupsWithState`-equivalent update-mode semantics into an
  *    update log (memory sink `<table>__log`); the TABLE view exposed to
  *    downstream statements is latest-by-key over that log — the
  *    compacted-topic materialization. Downstream statements read the
  *    snapshot (Flink regular join against a versioned table's latest
  *    state).
  *  - append/retract: `foreachBatch` — each micro-batch of the (possibly
  *    stream-to-snapshot joined) select is appended to the target's
  *    accumulated table, retract targets tagged `__op`.
  *
  * Sources may be true streams (rate/memory/file) registered as temp
  * views; the select is analyzed against them unchanged. DDL statements
  * behave as in the batch `StatementRunner` (shared catalog semantics).
  */
final class StreamingStatementRunner(spark: SparkSession,
                                     val catalog: InMemoryCatalog = new InMemoryCatalog) {

  private val queries = scala.collection.mutable.ArrayBuffer.empty[StreamingQuery]
  private val seqCounter = new java.util.concurrent.atomic.AtomicLong(0L)
  private val appendState =
    scala.collection.mutable.Map.empty[String, scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row]]

  def activeQueries: Seq[StreamingQuery] = queries.toSeq

  def runScript(script: String): Unit =
    StatementPreprocessor.splitScript(script).foreach(run)

  def run(stmt: String): Option[StreamingQuery] = StatementPreprocessor.parse(stmt) match {

    case ct: CreateTable =>
      val ddl = ct.columns
        .map { case (n, t) => s"`$n` ${StatementPreprocessor.toSparkType(t)}" }
        .mkString(", ")
      val schema = org.apache.spark.sql.types.StructType.fromDDL(ddl)
      catalog.register(TableMeta(ct.name,
        schema = Some(schema),
        primaryKey = ct.primaryKey,
        buckets = ct.buckets, changelogMode = ct.changelogMode, options = ct.options))
      // materialize an empty view NOW so later statements in the same
      // script can be analyzed before the INSERT's first micro-batch
      // replaces the view (the reference's depends_on DAG only orders
      // creation, not data arrival)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        .createOrReplaceTempView(ct.name)
      None

    case InsertInto(target, targetCols, select) =>
      val meta = catalog.getOrCreate(target)
      val selected = spark.sql(select)
      require(selected.isStreaming,
        s"INSERT INTO $target: select is not streaming; use StatementRunner for batch")
      // positional mapping to the declared target columns (reference:
      // `id` → `customer_id` via INSERT order, lab-aggregations :431)
      val renamed =
        if (targetCols.nonEmpty) selected.toDF(targetCols: _*)
        else meta.schema match {
          case Some(sc) => selected.toDF(sc.fieldNames.take(selected.columns.length).toIndexedSeq: _*)
          case None => selected
        }
      val q = meta.changelogMode match {
        case ChangelogMode.Upsert if meta.primaryKey.nonEmpty =>
          // stamp micro-batch arrival order; fold via foreachBatch into
          // the target's update log view
          startUpsert(target, meta, renamed)
        case mode =>
          startAppend(target, renamed, retract = mode == ChangelogMode.Retract)
      }
      queries += q
      Some(q)

    case AlterModifyColumn(table, column, newType) =>
      catalog.update(table)(m => m.copy(
        columnCasts = m.columnCasts + (column -> StatementPreprocessor.toSparkType(newType))))
      None

    case AlterModifyWatermark(table, column, expr) =>
      val delay = if (expr.trim.equalsIgnoreCase(column)) "0 seconds" else expr
      catalog.update(table)(_.copy(watermarkCol = Some(column), watermarkDelay = delay))
      None

    case UseCatalog(name) =>
      // streaming runner: context scopes catalog METADATA (qualified
      // keys); view-level bare-name rebinding is the batch runner's job
      catalog.currentCatalog = name
      None

    case UseDatabase(name) =>
      catalog.currentDatabase = name
      None

    case Passthrough(sql) =>
      spark.sql(sql)
      None
  }

  /** Upsert INSERT: every micro-batch is stamped with a monotone seq and
    * appended to the log; the exposed view is latest-by-key over it. */
  private def startUpsert(target: String, meta: TableMeta, df: DataFrame): StreamingQuery = {
    df.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // __seq orders across micro-batches, __sub within one batch by
        // arrival order (Kafka-offset analog): two versions of a key in
        // the same batch resolve to the later one deterministically
        val stamped = batch.withColumn("__seq", lit(seqCounter.incrementAndGet()))
          .withColumn("__sub", monotonically_increasing_id())
        appendRows(s"${target}__log", stamped)
        val log = spark.table(s"${target}__log")
        val visible = ChangelogOps.latestByKey(log, meta.primaryKey, Seq("__seq", "__sub"))
          .drop("__seq", "__sub")
        visible.createOrReplaceTempView(target)
        ()
      }.start()
  }

  /** Append/retract INSERT: each micro-batch's rows accumulate into the
    * target view; retract targets carry `__op`. */
  private def startAppend(target: String, df: DataFrame, retract: Boolean): StreamingQuery = {
    df.writeStream.outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val tagged = if (retract) batch.withColumn("__op", lit("+I")) else batch
        appendRows(target, tagged)
        ()
      }.start()
  }

  /** Accumulate rows under a registered temp view (driver-side buffer —
    * the test/local analog of a topic; a production sink would be Kafka
    * via `ChangelogSink.encodeUpsert`). */
  private def appendRows(view: String, batch: DataFrame): Unit = synchronized {
    val rows = batch.collect()
    val buf = appendState.getOrElseUpdate(view,
      scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row])
    buf ++= rows
    spark.createDataFrame(spark.sparkContext.parallelize(buf.toSeq), batch.schema)
      .createOrReplaceTempView(view)
  }

  def processAllAvailable(): Unit = queries.foreach(_.processAllAvailable())
  def stopAll(): Unit = queries.foreach(_.stop())
}
