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

  /** documents-shaped synthetic corpus for scale smokes: `n`
    * deterministic rows with a near-dup FAMILY structure — 4-doc
    * families whose non-leader members mutate exactly one token, so
    * within-family trigram Jaccard is ≈ 0.9 (3 of ~58 trigrams
    * touched), well over the suite's 0.8 LSH threshold, while
    * cross-family similarity is noise. Dedup/LSH/cluster/graph plans
    * therefore see the same candidate-pair and component shape as a
    * real boilerplate-heavy corpus, at any chosen scale.
    *
    * Pure projection of a counter (no randomness): the 10× corpus
    * contains the 1× corpus's rows as a prefix, which is what lets a
    * scale test attribute wall-time growth to data volume alone. */
  def documentsBatch(spark: SparkSession, n: Long,
                     docTokens: Int = 60): DataFrame = {
    val v = col("id")
    val fam = (v - pmod(v, lit(4L))).as("__fam")
    val mutPos = pmod(xxhash64(lit("mp"), v), lit(docTokens))
    val toks = transform(sequence(lit(0), lit(docTokens - 1)), i => {
      val familyWord = concat(lit("w"),
        pmod(xxhash64(lit("tok"), col("__fam"), i), lit(4000)))
      val ownWord = concat(lit("x"),
        pmod(xxhash64(lit("own"), v, i), lit(4000)))
      when(v =!= col("__fam") && i.cast("long") === mutPos, ownWord)
        .otherwise(familyWord)
    })
    spark.range(n)
      .withColumn("__fam", fam)
      .select(
        v.as("doc_id"),
        concat_ws(" ", toks).as("text"),
        element_at(array(lit("en"), lit("de"), lit("fr"), lit("es")),
          (pmod(xxhash64(lit("lg"), col("__fam")), lit(4)) + 1).cast("int"))
          .as("lang"),
        concat(lit("s"), pmod(xxhash64(lit("src"), col("__fam")), lit(8)))
          .as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
  }

  def ordersStream(spark: SparkSession, rowsPerSecond: Int): DataFrame =
    ordersProjection(
      spark.readStream.format("rate").option("rowsPerSecond", rowsPerSecond).load())
}
