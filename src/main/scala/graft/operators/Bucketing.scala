package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (hash-distributed) tables — the physical meaning of the
  * reference's `DISTRIBUTED INTO n BUCKETS`
  * (`terraform/lab-aggregations/main.tf:396,463,530`): rows are hash-
  * partitioned by key into a fixed bucket count AT WRITE TIME, so a
  * later join or aggregation on that key needs NO shuffle — the
  * dominant cost of a 100 TB join is the exchange, and bucketing pays
  * it once at ingest instead of per query.
  *
  * Uses Spark's native bucketed managed tables (parquet + the built-in
  * catalog; no Hive). Both join sides must share bucket count and key
  * for the exchange-free plan; `isShuffleFree` inspects the executed
  * plan so tests (and operators) can ASSERT the shuffle was elided
  * rather than trust it.
  */
object Bucketing {

  /** Write `df` as a managed bucketed table (overwriting). Sorted within
    * buckets so merge joins skip the sort too. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    writeBucketedMulti(df, table, Seq(key), buckets)

  /** Multi-column bucket key form (composite PRIMARY KEY tables). */
  def writeBucketedMulti(df: DataFrame, table: String, keys: Seq[String],
                         buckets: Int): Unit = {
    val spark = df.sparkSession
    // a previous JVM may have left the managed location on disk with no
    // catalog entry — saveAsTable refuses to reuse it (LOCATION_ALREADY_
    // EXISTS), so clear both the entry and any orphaned location
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    // through Hadoop FileSystem: a warehouse on HDFS/S3A cleans up too
    graft.sources.Fs.deleteRecursive(
      spark, s"${warehouse.stripSuffix("/")}/${table.toLowerCase}")
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table) // managed table under spark.sql.warehouse.dir
  }

  /** Join two same-bucketed tables on their bucket key. */
  def bucketedJoin(spark: SparkSession, left: String, right: String,
                   key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)

  /** True if the executed plan contains no shuffle exchange (bucket
    * layout satisfied the join/agg distribution requirement). */
  def isShuffleFree(df: DataFrame): Boolean = {
    val plan = df.queryExecution.executedPlan.toString()
    !plan.contains("Exchange hashpartitioning")
  }
}
