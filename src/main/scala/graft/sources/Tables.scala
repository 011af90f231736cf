package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet-backed table loader over the driver test fixtures
  * (`TESTDATA.md`): one parquet file per table under a scale-factor dir.
  *
  * In the reference every table is a Kafka topic read through Schema
  * Registry (reference `terraform/lab-tables/main.tf:98-108`, Avro at
  * `:173`); here the bounded fixture form is a parquet scan, and the
  * unbounded form is `graft.streaming` over the same schemas. Schema
  * inference is the parquet footer (reference: Avro subject).
  */
object Tables {
  /** TPC-H-ish star schema + events stream table + LLM-pipeline tables. */
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Fixture timestamps are naive (isAdjustedToUTC=false): read them as
    // session-UTC TimestampType, not TIMESTAMP_NTZ, so epoch functions
    // apply. events.ts is TIMESTAMP(NANOS) which the vectorized reader
    // rejects — read it as long nanos and convert (values are µs-aligned).
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.find(f => f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType) match {
      case Some(_) => df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
      case None => df
    }
  }

  /** Register every fixture table as a temp view (for spark.sql form). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
