package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TEMP profiling scratch for round-6 perf work (not committed). */
object ProfileScratch {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[prof] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def docs = sources.Tables.load(spark, sfDir, "documents")

    // warm JVM
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    spark.catalog.clearCache()

    // components loop internals: rounds + partition counts
    val pairs = operators.Dedup.minHashLshPairs(docs, "doc_id", "text", 5, 64, 16, 0.8)
    val edges = pairs.select(col("id_a").as("u"), col("id_b").as("v"))
      .unionAll(pairs.select(col("id_b").as("u"), col("id_a").as("v")))
      .distinct().persist()
    var labels = edges.groupBy(col("u").as("id"))
      .agg(least(min(col("v")), col("u")).as("comp"))
      .localCheckpoint(false)
    def labelSum(df: DataFrame): String = df
      .agg(coalesce(sum(col("comp").cast("decimal(38,0)")), lit(0).cast("decimal(38,0)")))
      .head.getDecimal(0).toPlainString
    var s = time("seed labelSum (materializes everything)")(labelSum(labels))
    println("  seed label partitions=" + labels.rdd.getNumPartitions)
    var converged = false
    var iter = 0
    while (!converged && iter < 20) {
      val next = time(s"round $iter build+checkpoint") {
        labels
          .unionAll(labels.as("l").join(edges.as("e"), col("l.id") === col("e.u"))
            .select(col("e.v").as("id"), col("l.comp").as("comp")))
          .groupBy("id").agg(min("comp").as("comp"))
          .localCheckpoint(false)
      }
      val ns = time(s"round $iter labelSum job")(labelSum(next))
      println(s"  round $iter partitions=" + next.rdd.getNumPartitions)
      converged = ns == s
      s = ns
      labels = next
      iter += 1
    }
    println(s"  rounds=$iter")
    spark.stop()
  }
}
