package graft.exec

import graft.catalog.{ChangelogMode, InMemoryCatalog, TableMeta}
import graft.ddl.StatementPreprocessor
import graft.ddl.StatementPreprocessor._
import graft.operators.ChangelogOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Executes scripts of reference-dialect statements (SURVEY.md §3.1):
  * preprocessor → engine catalog → Spark plan. Statement ordering is the
  * caller's (the reference orders via a terraform `depends_on` DAG,
  * `terraform/lab-aggregations/main.tf:442-444,541-544,574-576`; a
  * sequential script subsumes it).
  *
  * Execution model (bounded/batch form — the streaming form is
  * `graft.streaming`): every table is a temp view; INSERT INTO an
  * upsert-keyed table materializes latest-row-per-key over the
  * accumulated changelog (ONE map-combinable shuffle per refresh, see
  * `ChangelogOps.latestByKey`); INSERT INTO a retract table keeps the
  * append form plus an `__op` column.
  */
/** @param bucketedWrites when true, an upsert target declared
  *   `DISTRIBUTED INTO n BUCKETS` is materialized as a NATIVE bucketed
  *   managed table on every refresh (hash-partitioned at write, the
  *   physical meaning of the clause — `terraform/lab-aggregations/
  *   main.tf:396,463`): downstream joins/aggs on the primary key elide
  *   their exchange entirely. Off by default — the in-memory
  *   `repartition` form gives the same single-plan co-location without
  *   a warehouse write per refresh (the right trade for tests/small
  *   batches; bucketed storage is the 100 TB ingest-once shape). */
final class StatementRunner(spark: SparkSession, val catalog: InMemoryCatalog = new InMemoryCatalog,
                            bucketedWrites: Boolean = false) {

  /** Monotone ingestion sequence per target table: the Kafka offset
    * analog that makes "latest row per key" well-defined. */
  private val seq = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)

  def runScript(script: String): Unit =
    StatementPreprocessor.splitScript(script).foreach(run)

  /** Spark temp views have a flat namespace, so each scoped table also
    * gets a fully-qualified shadow view (`cat__db__table`); the BARE
    * name is a binding of the CURRENT scope, re-pointed on USE.
    * Non-word characters are sanitized: the reference's environment ids
    * are hyphenated (`env-abc123`), and a hyphen inside a temp-view
    * identifier is a ParseException. */
  private def scopedView(bare: String): String =
    catalog.qualify(bare).replace(".", "__").replaceAll("[^\\w]", "_")

  /** Re-point all bare-name bindings when the session scope changes:
    * unbind the old scope's tables, switch, bind the new scope's. Views
    * the runner never created (externally registered sources) are left
    * alone. */
  private def switchScope(switch: () => Unit): Unit = {
    catalog.inScope.foreach { bare =>
      if (spark.catalog.tableExists(scopedView(bare)))
        spark.catalog.dropTempView(bare)
    }
    switch()
    catalog.inScope.foreach { bare =>
      if (spark.catalog.tableExists(scopedView(bare)))
        spark.table(scopedView(bare)).createOrReplaceTempView(bare)
    }
  }

  def run(stmt: String): Option[DataFrame] = StatementPreprocessor.parse(stmt) match {

    case ct: CreateTable =>
      val ddlSchema = ct.columns
        .map { case (n, t) => s"`$n` ${StatementPreprocessor.toSparkType(t)}" }
        .mkString(", ")
      val schema = org.apache.spark.sql.types.StructType.fromDDL(ddlSchema)
      catalog.register(TableMeta(
        name = ct.name,
        schema = Some(schema),
        primaryKey = ct.primaryKey,
        buckets = ct.buckets,
        changelogMode = ct.changelogMode,
        options = ct.options))
      // materialize an empty relation with the declared schema, under
      // both the scoped shadow view and the bare current-scope binding
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      empty.createOrReplaceTempView(scopedView(ct.name))
      empty.createOrReplaceTempView(ct.name)
      None

    case InsertInto(target, targetCols, select) =>
      val meta = catalog.getOrCreate(target)
      val selected = spark.sql(select)
      // positional mapping to the target's declared columns (reference:
      // `id` → `customer_id` via INSERT order, lab-aggregations :431/:498)
      val targetSchema = meta.schema.getOrElse(spark.table(target).schema)
      val renamed =
        if (targetCols.nonEmpty) selected.toDF(targetCols: _*)
        else selected.toDF(targetSchema.fieldNames.take(selected.columns.length): _*)
      val casted = targetSchema.fields.foldLeft(renamed) { (df, f) =>
        if (df.columns.contains(f.name)) df.withColumn(f.name, col(f.name).cast(f.dataType))
        else df
      }
      val qualified = catalog.qualify(target)
      val startSeq = seq(qualified)
      seq(qualified) = startSeq + 1
      // __seq orders ACROSS inserts; __sub orders WITHIN one insert by
      // source scan order (the Kafka-offset analog — later source rows
      // of the same key win the upsert deterministically)
      val stamped = casted.withColumn("__seq", lit(startSeq))
        .withColumn("__sub", monotonically_increasing_id())
      val existing = appended.get(qualified)
      val changelog = existing.map(_.unionByName(stamped)).getOrElse(stamped)
      appended(qualified) = changelog
      val visible = meta.changelogMode match {
        case ChangelogMode.Upsert if meta.primaryKey.nonEmpty =>
          val latest = ChangelogOps.latestByKey(changelog, meta.primaryKey,
              Seq("__seq", "__sub"))
            .drop("__seq", "__sub")
          meta.buckets match {
            case Some(n) if bucketedWrites =>
              // pay the hash-distribution at write: downstream joins on
              // the PK read bucket-aligned files, no exchange. The store
              // name is SCOPED — same-named tables in two databases must
              // not clobber each other's bucketed data.
              val store = s"${scopedView(target)}__bucketed"
              graft.operators.Bucketing.writeBucketedMulti(
                latest, store, meta.primaryKey, n)
              spark.table(store)
            case Some(n) => latest.repartition(n, meta.primaryKey.map(col): _*)
            case None => latest
          }
        case ChangelogMode.Retract =>
          changelog.drop("__seq", "__sub").withColumn("__op", lit("+I"))
        case _ =>
          changelog.drop("__seq", "__sub")
      }
      visible.createOrReplaceTempView(scopedView(target))
      visible.createOrReplaceTempView(target)
      Some(visible)

    case AlterModifyColumn(table, column, newType) =>
      catalog.update(table)(m => m.copy(
        columnCasts = m.columnCasts + (column -> StatementPreprocessor.toSparkType(newType))))
      // applied lazily at next scan (SURVEY.md §3.3); if the view exists
      // now, refresh it eagerly so downstream statements see the cast
      if (spark.catalog.tableExists(table)) {
        val df = spark.table(table)
        if (df.columns.contains(column)) {
          df.withColumn(column, col(column).cast(StatementPreprocessor.toSparkType(newType)))
            .createOrReplaceTempView(table)
        }
      }
      None

    case AlterModifyWatermark(table, column, expr) =>
      // `WATERMARK FOR ts AS ts` = zero-delay (the only form the
      // reference uses, `terraform/lab-joins/main.tf:531,564`);
      // `AS ts - INTERVAL 'n' UNIT` parses to a bounded delay;
      // anything else is rejected at parse time.
      val delay = StatementPreprocessor.parseWatermarkDelay(column, expr)
      catalog.update(table)(_.copy(watermarkCol = Some(column), watermarkDelay = delay))
      None

    case UseCatalog(name) =>
      switchScope(() => catalog.currentCatalog = name)
      None

    case UseDatabase(name) =>
      switchScope(() => catalog.currentDatabase = name)
      None

    case Passthrough(sql) =>
      Some(spark.sql(sql))
  }

  /** Raw accumulated changelog per target (insert history). */
  private val appended = scala.collection.mutable.Map.empty[String, DataFrame]

  /** The materialized (visible) form of a table. */
  def table(name: String): DataFrame = {
    val df = spark.table(name)
    val meta = catalog.getOrCreate(name)
    meta.columnCasts.foldLeft(df) { case (d, (c, t)) =>
      if (d.columns.contains(c)) d.withColumn(c, col(c).cast(t)) else d
    }
  }
}
