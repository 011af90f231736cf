package graft

import graft.operators.SkewOps
import org.apache.spark.sql.functions._

class SkewOpsSpec extends SparkSpec {
  import spark.implicits._

  // 90% of rows share one hot key
  private def skewed = spark.range(10000)
    .select(when($"id" % 10 === 0, $"id" % 7).otherwise(lit(999L)).as("key"),
      $"id".as("rid"), ($"id" % 100 / 10.0).as("value"))

  test("saltedAggregate equals the direct aggregation") {
    val direct = skewed.groupBy("key")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast("decimal(18,4)")).cast("double").as("sum_value"))
    val salted = SkewOps.saltedAggregate(skewed, Seq("key"), Seq("value"),
      salts = 8, saltSource = $"rid")
    assert(direct.except(salted).isEmpty && salted.except(direct).isEmpty)
  }

  test("saltedJoin equals the direct join on a skewed probe side") {
    val dim = Seq((999L, "hot"), (0L, "a"), (1L, "b"), (2L, "c"),
      (3L, "d"), (4L, "e"), (5L, "f"), (6L, "g")).toDF("key", "name")
    val direct = skewed.join(dim, Seq("key")).select("rid", "name")
    val salted = SkewOps.saltedJoin(skewed, dim, "key", salts = 8, probeSalt = $"rid")
      .select("rid", "name")
    assert(direct.except(salted).isEmpty && salted.except(direct).isEmpty)
    assert(salted.count() === 10000)
  }

  test("keySkewProfile: exact order stats off the count-of-counts frame") {
    // keys: a×6, b×2, c×1, d×1 → count-of-counts {1→2, 2→1, 6→1};
    // p50 = value at rank ⌈0.5·4⌉=2 → 1; p99 at rank 4 → 6
    val rows = (Seq.fill(6)("a") ++ Seq.fill(2)("b") ++ Seq("c", "d"))
      .zipWithIndex.map { case (k, i) => (i.toLong, k) }.toDF("rid", "key")
    val r = SkewOps.keySkewProfile(rows, $"key")
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(r === ((4L, 10L, 6L, 1L, 6L, 600000L)))
  }

  test("keySkewProfile: uniform keys put every order stat at the shared count") {
    val rows = (0 until 12).map(i => (i.toLong, s"k${i % 4}")).toDF("rid", "key")
    val r = SkewOps.keySkewProfile(rows, $"key")
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(r === ((4L, 12L, 3L, 3L, 3L, 250000L)))
  }

  test("sessionFeatures stays exact under a 1e5-distinct-type session (data-dependent domain)") {
    // COUNT(DISTINCT type) is the suite's one aggregate whose state
    // tracks a data-dependent domain: Spark expands one row per
    // (session, distinct type) before the final aggregate. That
    // expansion is keyed on the USER (spillable, distributed), never
    // driver-sized — this planted worst case (one user, one session,
    // every event a fresh type) documents that the exact path completes
    // and stays exact at 10⁵ types. Unbounded-domain callers should
    // swap in the KMV estimate instead (ARCHITECTURE.md, q52/q90
    // machinery).
    val n = 100000
    // user must not be a FOLDABLE literal: constant-folding a grouping
    // column under session_window + the distinct expand trips an
    // ATTRIBUTE_NOT_FOUND internal error in Spark 4.1's binding
    val events = spark.range(n).select(
      concat(lit("u"), ($"id" % 1).cast("string")).as("user"),
      timestamp_micros($"id" * 1000L).as("ts"), // 1 ms apart → one session
      concat(lit("t"), $"id").as("type"),
      lit(0.5).as("value"))
    val got = graft.operators.WindowOps
      .sessionFeatures(events, "user", "ts", "type", "value")
      .select("user", "n_events", "n_errors", "n_types", "sum_value")
      .as[(String, Long, Long, Long, Double)].collect()
    assert(got.length === 1, "1 ms gaps must merge into a single session")
    assert(got.head === (("u0", n.toLong, 0L, n.toLong, n * 0.5)))
  }
}
