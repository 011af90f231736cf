package graft.exec

import graft.catalog.{ChangelogMode, InMemoryCatalog, TableMeta}
import graft.ddl.StatementPreprocessor
import graft.ddl.StatementPreprocessor._
import graft.operators.ChangelogOps
import graft.sources.{TopicConf, Topics}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Streaming execution of the reference's statement dialect: every
  * `INSERT INTO` becomes a LONG-RUNNING StreamingQuery, exactly as a
  * `confluent_flink_statement` INSERT is a never-terminating job
  * (SURVEY.md §3.1 "The INSERT statements are long-running").
  *
  * Every table is topic-backed (`graft.sources.Topics`): INSERT sinks
  * encode each micro-batch into Kafka-shaped records and append them to
  * the target's topic with a fully DISTRIBUTED write — no rows ever
  * funnel through the driver. The visible table view is a
  * materialization over the topic read-back:
  *
  *  - upsert (PRIMARY KEY): compacted-topic contract — key = PK JSON,
  *    value = rest; visible state = latest record per key by offset
  *    (`ChangelogOps.latestByKey`, sort-free).
  *  - append/retract: the value carries the whole row (plus the `__op`
  *    tag for retract); visible state = every record in offset order.
  *
  * Source tables registered via `registerTopicSource` expose the two
  * system columns the reference exposes (SURVEY.md §1.4): `key` — raw
  * message key bytes, retyped AT SCAN by `ALTER TABLE ... MODIFY (key
  * STRING)` (S7/S8, `terraform/lab-joins/main.tf:465,498`) — and
  * `$rowtime` — the record timestamp, the watermark column (S9/S10).
  *
  * Join execution: an INSERT whose select references ONE streaming
  * table plus materialized (batch) views runs as a per-micro-batch
  * snapshot join — the micro-batch shadows the streaming view's name,
  * the select is re-resolved FRESH so dimension tables join at their
  * CURRENT upsert state (the Flink regular join against a versioned
  * table's latest state). Pure-streaming selects run natively.
  *
  * Table-to-table continuous INSERT (Flink's everyday statement shape
  * beyond the reference's corpus): a select with NO streaming source
  * in FROM promotes its first runner-created topic-backed ref to a
  * changelog stream of that table's topic ([[changelogStream]] — every
  * upsert revision flows as its own record) and drives the statement
  * with it; remaining refs snapshot-join as above. The promoted
  * table's own view keeps serving materialized STATE to every other
  * consumer.
  */
final class StreamingStatementRunner(spark: SparkSession,
                                     val catalog: InMemoryCatalog = new InMemoryCatalog,
                                     topicConf: Option[TopicConf] = None) {

  val conf: TopicConf = topicConf.getOrElse(
    TopicConf(java.nio.file.Files.createTempDirectory("graft-topics").toString))

  /** Checkpoint root for the long-running INSERT queries — lives under
    * the topic root (dot-prefixed: invisible to file listings), so a
    * RESTARTED runner on the same `TopicConf` resumes every INSERT
    * from its committed offsets instead of replaying the whole source.
    * Restart contract: re-run the SAME script in the SAME statement
    * order — each INSERT's checkpoint dir and epoch namespace key on
    * its position among the script's INSERTs (`insertSeq`), which a
    * faithful re-run reproduces (exactly how the reference re-applies
    * its Terraform statement set against durable Flink jobs). */
  private def checkpointRoot: String = s"${conf.root}/.checkpoints"

  private val queries = scala.collection.mutable.ArrayBuffer.empty[StreamingQuery]
  /** Statement index among this runner's INSERTs, in run order —
    * restart-stable (same script ⇒ same index), unlike a timestamp or
    * a global counter surviving only one process. Partitions the
    * 23-bit epoch space BATCH-MAJOR: epoch = batchId·2^4 + insertSeq,
    * so (a) two INSERTs into one topic can never collide epochs, (b) a
    * replayed micro-batch (same batchId) lands on the SAME epoch —
    * which `Topics.appendJson` then overwrites, not duplicates — and
    * (c) upsert latest-by-offset order across writers follows batch
    * PROGRESSION (≈ arrival time), not statement position: were the
    * statement id the high bits, the later statement's rows would win
    * a key forever regardless of when they arrived. Budget: ≤16
    * INSERTs per runner, ≤2^19 micro-batches per statement (a hard,
    * LOUD bound of the files-transport offset packing — the Kafka
    * transport has broker-assigned offsets and no such bound). */
  private val insertSeq = new java.util.concurrent.atomic.AtomicLong(0L)
  /** Qualified tables consumed by a PROMOTED (table-to-table) INSERT;
    * a later INSERT targeting one of them means the DAG is declared
    * out of topological order and the drain needs multiple passes. */
  private val promotedDrivers = scala.collection.mutable.Set.empty[String]
  @volatile private var outOfOrderChain = false
  /** decoded (pre-cast, pre-watermark) topic sources by table name */
  private val sources = scala.collection.mutable.Map.empty[String, DataFrame]
  /** qualified table name → physical topic name. Externally-registered
    * sources keep their given topic; runner-created targets get a
    * SCOPED topic (qualified name, sanitized), so two same-named tables
    * in different catalog/database scopes never share a log. */
  private val topicOf = scala.collection.mutable.Map.empty[String, String]

  private def targetTopic(name: String): String = synchronized {
    topicOf.getOrElseUpdate(catalog.qualify(name),
      catalog.qualify(name).replaceAll("[^\\w]", "_"))
  }

  /** A target's identity, RESOLVED at statement-run time: `USE` mid-
    * stream must not re-route a running INSERT's micro-batches — the
    * scoped view and topic are captured here, not re-qualified per
    * batch. Temp views are a flat namespace, so (as in the batch
    * runner) each scoped table gets a fully-qualified shadow view and
    * the BARE name is a binding of the CURRENT scope. */
  private final case class TargetBinding(bare: String, qualified: String,
                                         scoped: String, topic: String)

  private def bind(bare: String): TargetBinding = synchronized {
    val q = catalog.qualify(bare)
    TargetBinding(bare, q, q.replace(".", "__").replaceAll("[^\\w]", "_"),
      targetTopic(bare))
  }

  /** True when `b`'s table is what the CURRENT scope resolves its bare
    * name to — only then may a view refresh touch the bare binding. */
  private def inCurrentScope(b: TargetBinding): Boolean =
    catalog.qualify(b.bare) == b.qualified

  /** Re-point bare-name bindings on USE (mirrors the batch runner):
    * unbind the old scope's runner-created views, switch, rebind the
    * new scope's from their scoped shadows. Externally-registered
    * sources (no shadow view) are left alone. */
  private def switchScope(switch: () => Unit): Unit = synchronized {
    def shadowOf(bare: String): String =
      catalog.qualify(bare).replace(".", "__").replaceAll("[^\\w]", "_")
    catalog.inScope.foreach { bare =>
      if (spark.catalog.tableExists(shadowOf(bare)))
        spark.catalog.dropTempView(bare)
    }
    switch()
    catalog.inScope.foreach { bare =>
      if (spark.catalog.tableExists(shadowOf(bare)))
        spark.table(shadowOf(bare)).createOrReplaceTempView(bare)
    }
  }

  def activeQueries: Seq[StreamingQuery] = queries.toSeq

  def runScript(script: String): Unit =
    StatementPreprocessor.splitScript(script).foreach(run)

  /** Register a topic-backed source table: unbounded scan of the topic's
    * records, JSON values decoded to `valueSchema` (+ `keySchema` fields
    * for compacted topics), with `key`/`$rowtime` system columns. The
    * reference's analog is catalog auto-registration of every topic via
    * Schema Registry (SURVEY.md §1.1 — no CREATE TABLE exists for the
    * datagen tables, yet statements query them). */
  def registerTopicSource(name: String, valueSchema: StructType,
                          keySchema: Option[StructType] = None): Unit = {
    Topics.ensureTopic(spark, conf, name)
    val records = Topics.readStreamRecords(spark, name, conf)
    sources(name) = Topics.decodeJson(records, valueSchema, keySchema).drop("__offset")
    catalog.getOrCreate(name)
    topicOf(catalog.qualify(name)) = name // external topic keeps its name
    refreshSourceView(name)
  }

  /** (Re)bind a topic source's view applying the CURRENT catalog state:
    * ALTER MODIFY column casts act at scan (S7/S8 key retype), the
    * watermark (S9/S10) applies to its declared column. */
  private def refreshSourceView(name: String): Unit = sources.get(name).foreach { base =>
    val meta = catalog.getOrCreate(name)
    val casted = meta.columnCasts.foldLeft(base) { case (df, (c, t)) =>
      if (df.columns.contains(c)) df.withColumn(c, col(c).cast(t)) else df
    }
    val watermarked = meta.watermarkCol match {
      case Some(wc) if casted.columns.contains(wc) =>
        // backtick-quote: `$rowtime` would otherwise be parsed
        casted.withWatermark(s"`$wc`", meta.watermarkDelay)
      case _ => casted
    }
    watermarked.createOrReplaceTempView(name)
  }

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
      val b = bind(ct.name)
      Topics.ensureTopic(spark, conf, b.topic)
      // materialize the view NOW from the topic read-back (scoped
      // shadow + bare binding) so later statements in the same script
      // can be analyzed before the INSERT's first micro-batch refreshes
      // it (the reference's depends_on DAG only orders creation, not
      // data arrival). On a FRESH topic this is the empty frame of the
      // declared schema; on a RESTART the topic already holds prior
      // epochs and the view hydrates to the pre-crash state — without
      // this, a restarted runner with no new input would serve an
      // empty table until the next micro-batch.
      val meta = catalog.getOrCreate(ct.name)
      refreshTargetView(b, meta, sunkSchema(meta, schema))
      None

    case InsertInto(target, targetCols, select) =>
      val meta = catalog.getOrCreate(target)
      val binding = bind(target)
      // an earlier statement promoted-consumes this target → the DAG
      // is declared out of topological order; widen the drain
      if (promotedDrivers.contains(binding.qualified)) outOfOrderChain = true
      val refs = tableRefs(select)
      val streamRefs = refs.filter(r =>
        spark.catalog.tableExists(r) && spark.table(r).isStreaming)
      val q =
        if (streamRefs.nonEmpty) {
          if (streamRefs.size == 1 && refs.size > 1)
            startSnapshotJoin(binding, meta, targetCols, select, streamRefs.head)
          else
            startDirect(binding, meta, targetCols, select)
        } else {
          // TABLE-TO-TABLE continuous INSERT (Flink's everyday shape,
          // beyond the reference's corpus): no external streaming
          // source in FROM — promote the FIRST runner-created
          // topic-backed ref to a CHANGELOG STREAM of its topic and
          // drive the statement with it; any remaining refs join at
          // their current materialized state per micro-batch (the
          // same regular-join approximation as the S6 path).
          val promotable = refs.filter(r => synchronized {
            topicOf.contains(catalog.qualify(r))
          })
          require(promotable.nonEmpty,
            s"INSERT INTO $target: select references no streaming source " +
              "and no topic-backed table; use StatementRunner for batch")
          val driver = promotable.head
          promotedDrivers += catalog.qualify(driver)
          // an AGGREGATE over a promoted UPSERT driver would count
          // changelog REVISIONS, not latest state (no retraction
          // channel — Flink's ChangelogNormalize has one, this path
          // does not): reject LOUDLY instead of returning numbers that
          // are silently wrong after the first key revision. Append
          // drivers are true insert streams — aggregates are exact.
          val driverMeta = catalog.getOrCreate(driver)
          if (driverMeta.changelogMode == ChangelogMode.Upsert &&
              driverMeta.primaryKey.nonEmpty) {
            val parsed = spark.sessionState.sqlParser.parsePlan(select)
            val aggregates = parsed.collectFirst {
              case _: org.apache.spark.sql.catalyst.plans.logical.Aggregate => ()
              case _: org.apache.spark.sql.catalyst.plans.logical.Distinct => ()
            }.isDefined
            require(!aggregates,
              s"INSERT INTO $target: aggregating over promoted upsert table " +
                s"$driver would count changelog revisions, not latest state " +
                "(no retraction channel). Aggregate the upstream feed, or " +
                "read the table's materialized state through the batch runner.")
          }
          val promoted = changelogStream(driver)
          withViewShadow(driver, promoted) {
            if (refs.size > 1)
              startSnapshotJoin(binding, meta, targetCols, select, driver)
            else
              startDirect(binding, meta, targetCols, select)
          }
        }
      queries += q
      Some(q)

    case AlterModifyColumn(table, column, newType) =>
      catalog.update(table)(m => m.copy(
        columnCasts = m.columnCasts + (column -> StatementPreprocessor.toSparkType(newType))))
      refreshSourceView(table)
      None

    case AlterModifyWatermark(table, column, expr) =>
      val delay = StatementPreprocessor.parseWatermarkDelay(column, expr)
      catalog.update(table)(_.copy(watermarkCol = Some(column), watermarkDelay = delay))
      refreshSourceView(table)
      None

    case UseCatalog(name) =>
      switchScope(() => catalog.currentCatalog = name)
      None

    case UseDatabase(name) =>
      switchScope(() => catalog.currentDatabase = name)
      None

    case Passthrough(sql) =>
      spark.sql(sql)
      None
  }

  /** Table names a select references (pre-analysis, so shadowing views
    * per micro-batch is possible before resolution). CTE aliases are
    * NOT references — counting them would misroute a pure single-stream
    * select with a WITH clause onto the snapshot-join path. */
  private[graft] def tableRefs(select: String): Seq[String] = {
    val plan = spark.sessionState.sqlParser.parsePlan(select)
    // CTE definition plans are NOT in `children` — collect them
    // explicitly, both to traverse the real relations inside them and
    // to exclude the aliases themselves from the reference list
    val ctes = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.UnresolvedWith =>
        w.cteRelations
    }.flatten
    val cteNames = ctes.map(_._1).toSet
    (plan +: ctes.map(_._2: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan))
      .flatMap(_.collect {
        case r: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation =>
          r.multipartIdentifier.last
      })
      .distinct.filterNot(cteNames.contains)
  }

  /** The record schema [[sinkBatch]] writes for a table: the declared
    * columns, plus the `__op` tag a retract-mode sink carries. Used to
    * hydrate the visible view from the topic BEFORE any micro-batch of
    * this process has run (CREATE TABLE on a restart). */
  private def sunkSchema(meta: TableMeta, declared: StructType): StructType =
    if (meta.changelogMode == ChangelogMode.Retract && !declared.fieldNames.contains("__op"))
      StructType(declared.fields :+ org.apache.spark.sql.types.StructField(
        "__op", org.apache.spark.sql.types.StringType))
    else declared

  /** Positional mapping to the declared target columns (reference:
    * `id` → `customer_id` via INSERT order, lab-aggregations :431). */
  private def renameTo(meta: TableMeta, targetCols: Seq[String], df: DataFrame): DataFrame =
    if (targetCols.nonEmpty) df.toDF(targetCols: _*)
    else meta.schema match {
      case Some(sc) => df.toDF(sc.fieldNames.take(df.columns.length).toIndexedSeq: _*)
      case None => df
    }

  /** Pure-streaming INSERT: the select streams end-to-end; each
    * micro-batch sinks to the target topic.
    *
    * Output mode: `update` for upsert-keyed targets — each micro-batch
    * carries the CHANGED rows, which the upsert topic folds by primary
    * key. That is exactly Flink's update-mode aggregation (the S1–S6
    * keyed-table pipeline's semantics, SURVEY.md §2.3): a streaming
    * `GROUP BY k` INSERT INTO a PRIMARY KEY table continuously revises
    * per-key aggregates. For non-aggregating selects `update` emits the
    * same rows `append` would, so the mode is safe across the board;
    * append/retract targets keep `append` (every record is a fact). */
  private def startDirect(target: TargetBinding, meta: TableMeta, targetCols: Seq[String],
                          select: String): StreamingQuery = {
    val stmtId = nextInsertId(target)
    val renamed = renameTo(meta, targetCols, spark.sql(select))
    val isUpsert = meta.changelogMode == ChangelogMode.Upsert && meta.primaryKey.nonEmpty
    renamed.writeStream.outputMode(if (isUpsert) "update" else "append")
      .queryName(queryDisplayName(target, stmtId))
      .option("checkpointLocation", checkpointDir(target, stmtId))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        sinkBatch(target, meta, batch, stmtId, batchId)
        ()
      }.start()
  }

  /** Stream-to-snapshot INSERT (the Flink regular join, SURVEY.md §3.2):
    * the single streaming ref drives; per micro-batch its name is
    * shadowed by the batch data and the select re-resolves FRESH, so
    * materialized dimension views join at their CURRENT state. */
  private def startSnapshotJoin(target: TargetBinding, meta: TableMeta, targetCols: Seq[String],
                                select: String, driverRef: String): StreamingQuery = {
    val stmtId = nextInsertId(target)
    val stream = spark.table(driverRef)
    stream.writeStream.outputMode("append")
      .queryName(queryDisplayName(target, stmtId))
      .option("checkpointLocation", checkpointDir(target, stmtId))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        synchronized {
          // `batch` is bound to the stream's CLONED session whose view
          // catalog is a snapshot — re-home it (distributed, no collect)
          // so the shadow registers in the MAIN session the select
          // resolves against
          org.apache.spark.sql.GraftSqlBridge.toSession(spark, batch)
            .createOrReplaceTempView(driverRef)
          try {
            val result = renameTo(meta, targetCols, spark.sql(select))
            sinkBatch(target, meta, result, stmtId, batchId)
          } finally {
            // restore the driver's steady-state binding: topic sources
            // via refresh (a concurrent ALTER isn't clobbered),
            // PROMOTED runner tables back to their batch view (other
            // consumers must keep reading table state, not the stream)
            restoreRefView(driverRef, stream)
          }
        }
        ()
      }.start()
  }

  /** A runner-created table's topic read back as a CHANGELOG STREAM —
    * the source of a promoted table-to-table INSERT. Records decode
    * per the table's declared schema: upsert tables as the
    * compacted-topic form (key json = PK, value json = rest;
    * TOMBSTONES DROPPED — an append consumer has no retraction
    * channel), append/retract tables as whole-row values (retract's
    * `__op` tag rides along). Semantics caveat (Flink's upsert-kafka
    * raw-record contract): every upsert REVISION flows as its own
    * record — a non-aggregating select sees the changelog exactly
    * once; an aggregate over a promoted upsert stream counts records,
    * not latest state. */
  private def changelogStream(bare: String): DataFrame = {
    val meta = catalog.getOrCreate(bare)
    val b = bind(bare)
    val declared = meta.schema.getOrElse(throw new IllegalArgumentException(
      s"table $bare: no declared schema to decode its changelog"))
    val isUpsert = meta.changelogMode == ChangelogMode.Upsert && meta.primaryKey.nonEmpty
    val records = Topics.readStreamRecords(spark, b.topic, conf)
    val decoded =
      if (isUpsert) {
        val keySchema = StructType(declared.fields.filter(f => meta.primaryKey.contains(f.name)))
        val valueSchema = StructType(declared.fields.filterNot(f => meta.primaryKey.contains(f.name)))
        Topics.decodeJson(records.where(col("value").isNotNull), valueSchema, Some(keySchema))
      } else Topics.decodeJson(records, sunkSchema(meta, declared))
    decoded.drop("__offset")
  }

  /** Temporarily shadow `name`'s view with `df` while `body` BUILDS
    * its plan (the built DataFrame captures the relation, so the
    * shadow need not outlive plan construction), then restore the
    * table's materialized batch view for every other consumer. */
  private def withViewShadow[T](name: String, df: DataFrame)(body: => T): T = synchronized {
    df.createOrReplaceTempView(name)
    try body finally restoreRefView(name, df)
  }

  /** Re-point a ref's bare view to its steady-state binding: topic
    * SOURCES via refreshSourceView (ALTER casts/watermarks re-apply),
    * runner-created TABLES via their materialized topic read-back,
    * anything else back to the given frame. */
  private def restoreRefView(ref: String, fallback: DataFrame): Unit = {
    if (sources.contains(ref)) refreshSourceView(ref)
    else if (topicOf.contains(catalog.qualify(ref))) {
      val m = catalog.getOrCreate(ref)
      m.schema.foreach(sc => refreshTargetView(bind(ref), m, sunkSchema(m, sc)))
    } else fallback.createOrReplaceTempView(ref)
  }

  /** Allocate an INSERT's restart-stable statement id. */
  private def nextInsertId(target: TargetBinding): Long = {
    val id = insertSeq.getAndIncrement()
    require(id < (1L << 4),
      s"INSERT INTO ${target.qualified}: more than 16 INSERT statements " +
        "in one runner — epoch namespace (batchId·2^4 + insertSeq) exhausted")
    id
  }

  /** Per-INSERT checkpoint dir: keyed on the restart-stable statement
    * id + the SCOPED target name, so a re-run script resumes each
    * statement from its own committed offsets. */
  private def checkpointDir(target: TargetBinding, stmtId: Long): String =
    s"$checkpointRoot/ins$stmtId-${target.scoped}"

  /** Active-query display name: statement id + target for
    * [[progressSummary]] identifiability, SUFFIXED with a short hash
    * of the topic root — Spark rejects duplicate ACTIVE query names
    * per session, and two runners on one session (different
    * TopicConfs, same script) must not collide. Same-conf restarts
    * reuse the name (the predecessor is stopped); two LIVE runners on
    * one conf root would share checkpoints — there the loud
    * duplicate-name error is the correct outcome. */
  private def queryDisplayName(target: TargetBinding, stmtId: Long): String = {
    val tag = Integer.toHexString(
      java.security.MessageDigest.getInstance("MD5")
        .digest(conf.root.getBytes("UTF-8")).take(4)
        .foldLeft(0)((a, b) => (a << 8) | (b & 0xff)))
    s"ins$stmtId-${target.scoped}-$tag"
  }

  /** Sink ONE micro-batch: encode to Kafka-shaped records, write to the
    * target topic (distributed write — `Topics.appendJson` never
    * collects), re-materialize the visible view from the read-back.
    *
    * Effectively-once on the FILES transport: the epoch is a PURE
    * FUNCTION of (statement id, batchId) — a crash-replayed
    * micro-batch recomputes from the same checkpointed offsets and
    * lands on the same epoch, which the files-transport append
    * OVERWRITES (idempotent), never duplicates. The Kafka transport
    * remains at-least-once under replay (broker appends have no
    * epoch key; exactly-once there needs transactions — env-limited,
    * see ARCHITECTURE.md). */
  private def sinkBatch(target: TargetBinding, meta: TableMeta, batch: DataFrame,
                        stmtId: Long, batchId: Long): Unit = synchronized {
    require(batchId < (1L << 19),
      s"INSERT INTO ${target.qualified}: batchId $batchId exceeds the " +
        "2^19 per-statement epoch budget of the files-transport offset " +
        "packing; move the pipeline to the kafka transport")
    val epoch = (batchId << 4) | stmtId
    val isUpsert = meta.changelogMode == ChangelogMode.Upsert && meta.primaryKey.nonEmpty
    val retract = meta.changelogMode == ChangelogMode.Retract
    val tagged =
      if (retract && !batch.columns.contains("__op")) batch.withColumn("__op", lit("+I"))
      else batch
    Topics.appendJson(tagged, target.topic, conf,
      keyCols = if (isUpsert) meta.primaryKey else Nil, epoch = epoch)
    refreshTargetView(target, meta, tagged.schema)
  }

  /** Rebuild the target's visible view from its topic. Upsert targets
    * materialize latest-by-offset per key (the compacted-topic contract);
    * append/retract targets expose every record. Metadata columns are
    * dropped unless the table declares them.
    *
    * The view is LAZY — per micro-batch this only re-registers a plan;
    * the O(log length) materialization runs when a consumer queries it,
    * which is the compacted-topic contract cost. `Topics.compact` bounds
    * it at O(live keys), exactly as Kafka log compaction does. */
  private def refreshTargetView(target: TargetBinding, meta: TableMeta,
                                written: StructType): Unit = {
    val records = Topics.readBatchRecords(spark, target.topic, conf)
    val isUpsert = meta.changelogMode == ChangelogMode.Upsert && meta.primaryKey.nonEmpty
    val visible =
      if (isUpsert) {
        val keySchema = StructType(written.fields.filter(f => meta.primaryKey.contains(f.name)))
        val valueSchema = StructType(
          written.fields.filterNot(f => meta.primaryKey.contains(f.name) || f.name == "__op"))
        // latest record per KEY BYTES by offset FIRST, tombstone filter
        // AFTER — the same fold `Topics.compact` applies, so the view is
        // identical before and after compaction. Filtering tombstones
        // first would resurrect a deleted key's previous value.
        val latestRec = ChangelogOps.latestByKey(records, Seq("key"), Seq("offset"))
          .where(col("value").isNotNull)
        val decoded = Topics.decodeJson(latestRec, valueSchema, Some(keySchema))
        decoded.select(written.fieldNames.filterNot(_ == "__op").map(col).toIndexedSeq: _*)
      } else {
        val decoded = Topics.decodeJson(records, written)
        decoded.select(written.fieldNames.map(col).toIndexedSeq: _*)
      }
    // scoped shadow always; the bare binding only while this table is
    // what the current scope resolves the bare name to — a micro-batch
    // arriving after USE switched away must not clobber the other
    // scope's same-named view
    visible.createOrReplaceTempView(target.scoped)
    if (inCurrentScope(target)) visible.createOrReplaceTempView(target.bare)
  }

  /** Drain every statement to quiescence. One pass drains each query
    * in STATEMENT order, which propagates a topologically-ordered
    * chain fully but under-drains a chained DAG declared OUT of order
    * (a downstream promoted INSERT listed before its upstream would
    * drain first and miss the records the upstream is about to sink).
    * [[run]] detects that shape statically — an INSERT targeting a
    * table some EARLIER statement promoted-consumes — and only then
    * does the drain take `queries.size` passes (chain depth is bounded
    * by the statement count). Ordinary scripts keep the single-pass
    * cost. */
  def processAllAvailable(): Unit = {
    val passes = if (outOfOrderChain) math.max(1, queries.size) else 1
    (0 until passes).foreach(_ => queries.foreach(_.processAllAvailable()))
  }
  def stopAll(): Unit = queries.foreach(_.stop())

  /** One progress row per long-running INSERT — the observability
    * surface a production operator of never-terminating statements
    * watches (the managed-platform analog is the statement status
    * panel): last completed batch, rows ingested by it, current
    * processing rate, and the event-time watermark (the lag signal
    * for the stateful operators). Reads each query's LAST progress
    * snapshot — a driver-side constant-size read, no job run. */
  def progressSummary: Seq[StatementProgress] = queries.toSeq.flatMap { q =>
    Option(q.lastProgress).map { p =>
      StatementProgress(
        name = Option(p.name).getOrElse(q.id.toString),
        batchId = p.batchId,
        inputRows = p.numInputRows,
        rowsPerSecond = p.processedRowsPerSecond,
        watermark = Option(p.eventTime.get("watermark")).getOrElse(""))
    }
  }
}

/** Snapshot of one long-running INSERT's last completed micro-batch. */
final case class StatementProgress(name: String, batchId: Long,
                                   inputRows: Long, rowsPerSecond: Double,
                                   watermark: String)
