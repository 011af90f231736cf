package graft

import org.apache.spark.sql.SparkSession

/** Probe main for builder-time extension injection, run in a DEDICATED
  * JVM by `ExtensionsProbeSpec`: the `spark.sql.extensions` path only
  * takes effect when the session is CREATED, so it cannot be tested
  * against the suite's shared session (getOrCreate ignores the config
  * once a session exists). Prints `EXTENSIONS_OK` when every injected
  * SQL function resolves and evaluates. */
object ExtensionsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val checks = Seq(
      "SELECT vector_dot(array(1.0D, 2.0D), array(3.0D, 4.0D))" -> 11.0,
      "SELECT CAST(size(gram_hashes(array('a','b','c'), 2)) AS DOUBLE)" -> 2.0,
      "SELECT CAST(size(minhash_tokens(array('a','b','c'), 2, 8)) AS DOUBLE)" -> 8.0,
      "SELECT CAST(signature_agreement(array(1L, 2L), array(1L, 3L)) AS DOUBLE)" -> 1.0,
      "SELECT CAST(length(normalize_text('  A  B ')) AS DOUBLE)" -> 3.0,
      "SELECT CAST(size(lsh_signatures(array(1.0D, -1.0D), 2, 4, 3)) AS DOUBLE)" -> 3.0,
      "SELECT CAST(size(minhash_signature(array('x y'), 4)) AS DOUBLE)" -> 4.0,
      // selected-min count depends on the md5 values — assert non-empty
      "SELECT CAST(size(winnow_fingerprints(array('a','b','c','d'), 2, 2)) >= 1 AS DOUBLE)" -> 1.0)
    checks.foreach { case (sql, expected) =>
      val got = spark.sql(sql).head().getDouble(0)
      require(got == expected, s"$sql => $got, expected $expected")
    }
    println("EXTENSIONS_OK")
    spark.stop()
  }
}
