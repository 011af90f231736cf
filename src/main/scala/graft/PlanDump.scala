package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: print a SparkEntry query's EXECUTED (post-AQE) plan.
  *   sbt "runMain graft.PlanDump q43_tfidf /root/testdata/sf0.01"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir) = args.take(2)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect()
    println(df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head)
  }
}
