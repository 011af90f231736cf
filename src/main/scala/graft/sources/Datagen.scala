package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic source — the engine's analog of the reference's Datagen
  * connectors (`terraform/lab-aggregations/main.tf:216-310`,
  * `terraform/lab-joins/main.tf:253-379`): deterministic rate-limited
  * record streams shaped like the shoe-store quickstart schemas
  * (FIXTURES.md §A).
  *
  * The column synthesis is a pure projection over a monotone `value`
  * counter, so the same rows come out of the streaming form (`rate`
  * source) and the bounded form (`spark.range`) — which is what lets
  * the stream-vs-batch differential tests use it.
  *
  * Keys CYCLE (`value % keySpace`), so long runs produce multiple
  * versions per key — upserts actually get exercised, per FIXTURES.md
  * "multiple versions per key".
  */
object Datagen {

  private def hashStr(c: org.apache.spark.sql.Column, salt: String) =
    abs(xxhash64(lit(salt), c))

  /** shoe_customers-shaped rows from a monotone counter column `value`. */
  def customersProjection(df: DataFrame): DataFrame =
    df.select(
      concat(lit("c"), pmod(col("value"), lit(100))).as("id"),
      concat(lit("First"), pmod(hashStr(col("value"), "fn"), lit(50))).as("first_name"),
      concat(lit("Last"), pmod(hashStr(col("value"), "ln"), lit(50))).as("last_name"),
      concat(lit("user"), col("value"), lit("@example.com")).as("email"))

  /** shoe_orders-shaped rows: fact stream with event time. */
  def ordersProjection(df: DataFrame, startEpochSec: Long = 1700000000L): DataFrame =
    df.select(
      col("value").cast("int").as("order_id"),
      concat(lit("p"), pmod(hashStr(col("value"), "p"), lit(20))).as("product_id"),
      concat(lit("c"), pmod(hashStr(col("value"), "c"), lit(100))).as("customer_id"),
      timestamp_seconds(lit(startEpochSec) + col("value")).as("ts"))

  /** Bounded form: n deterministic rows. */
  def customersBatch(spark: SparkSession, n: Long): DataFrame =
    customersProjection(spark.range(n).withColumnRenamed("id", "value"))

  def ordersBatch(spark: SparkSession, n: Long): DataFrame =
    ordersProjection(spark.range(n).withColumnRenamed("id", "value"))

  /** Unbounded form: rate-limited stream (reference `tasks.max=1`,
    * rate-per-second is the connector's implicit cadence). */
  def customersStream(spark: SparkSession, rowsPerSecond: Int): DataFrame =
    customersProjection(
      spark.readStream.format("rate").option("rowsPerSecond", rowsPerSecond).load())

  def ordersStream(spark: SparkSession, rowsPerSecond: Int): DataFrame =
    ordersProjection(
      spark.readStream.format("rate").option("rowsPerSecond", rowsPerSecond).load())
}
