package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/codegen paths once so per-query numbers are stable,
    // then run in sorted order (Map iteration order is not deterministic).
    // Each query runs `reps` times and reports the MIN: a single pass is
    // at the mercy of host contention (a contended run once read 3-8x
    // slow across queries untouched by any code change) — min-of-n is
    // the standard noise floor estimator for wall-clock benchmarks.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
        val elapsed = (System.nanoTime() - t0) / 1e9
        // operators cache intermediates (tf, postings, signatures) —
        // release them OUTSIDE the timed region so a rep is a cold run
        // (and repeated invocations don't pin executor storage) without
        // billing the eviction to the query
        spark.catalog.clearCache()
        (ok, elapsed)
      }
      // a failing query must read as a FAILURE (-1), not as its
      // time-to-exception masquerading as a speedup
      val succeeded = times.filter(_._1).map(_._2)
      name -> (if (succeeded.nonEmpty) succeeded.min else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
