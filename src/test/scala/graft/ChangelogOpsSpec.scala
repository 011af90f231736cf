package graft

import graft.operators.ChangelogOps
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class ChangelogOpsSpec extends SparkSpec {
  import spark.implicits._

  private def events = Seq(
    // (user, ts, id, type, value)
    (1L, 10L, 100L, "click", 1.0),
    (1L, 20L, 101L, "click", 2.0),
    (1L, 20L, 102L, "view", 3.0), // same ts as 101: id breaks the tie
    (2L, 5L, 103L, "click", 4.0),
    (2L, 50L, 104L, "error", 5.0)
  ).toDF("user_id", "ts", "event_id", "event_type", "value")

  test("latestByKey picks the max (orderBy tuple) row per key") {
    val got = ChangelogOps.latestByKey(events, Seq("user_id"), Seq("ts", "event_id"))
      .select("user_id", "event_id").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 102L, 2L -> 104L))
  }

  test("latestByKey equals the row_number oracle") {
    val w = Window.partitionBy("user_id").orderBy(desc("ts"), desc("event_id"))
    val oracle = events.withColumn("rn", row_number().over(w)).where($"rn" === 1).drop("rn")
    val got = ChangelogOps.latestByKey(events, Seq("user_id"), Seq("ts", "event_id"))
    assert(got.select(oracle.columns.map(col).toIndexedSeq: _*).except(oracle).isEmpty)
    assert(oracle.except(got.select(oracle.columns.map(col).toIndexedSeq: _*)).isEmpty)
  }

  test("firstByKey picks the min row per key") {
    val got = ChangelogOps.firstByKey(events, Seq("user_id"), Seq("ts", "event_id"))
      .select("user_id", "event_id").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 100L, 2L -> 103L))
  }

  test("windowedDedupFirst keeps the earliest row per (key, tumble) and counts suppressed dups") {
    import graft.operators.WindowOps
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    val ev = Seq(
      (1L, "click", ts(10), 100L, 1.0),   // window 0: first
      (1L, "click", ts(20), 101L, 2.0),   // window 0: dup
      (1L, "click", ts(25), 102L, 3.0),   // window 0: dup
      (1L, "click", ts(70), 103L, 4.0),   // window 1 (60s tumble): new first
      (2L, "view", ts(10), 104L, 5.0)     // other key, alone
    ).toDF("user_id", "event_type", "ts", "event_id", "value")
    val got = WindowOps.windowedDedupFirst(ev, "ts", "event_id",
        Seq("user_id", "event_type"), windowMicros = 60000000L, Seq("value"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)) ->
        ((r.getLong(4), r.getDouble(5), r.getLong(6)))).toMap
    assert(got((1L, "click", 0L)) === ((100L, 1.0, 2L)))
    assert(got((1L, "click", 60000000L)) === ((103L, 4.0, 0L)))
    assert(got((2L, "view", 0L)) === ((104L, 5.0, 0L)))
    assert(got.size === 3)
  }

  test("conversionWithin counts in-window conversions from the FIRST from-event only") {
    import graft.operators.WindowOps
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    val ev = Seq(
      (1L, "click", ts(100)), (1L, "purchase", ts(200)),      // converts, delay 100s
      (2L, "click", ts(100)), (2L, "purchase", ts(100 + 7200)), // too late (>1h)
      (3L, "click", ts(100)),                                   // never purchases
      (4L, "purchase", ts(50)), (4L, "click", ts(100)),         // purchase BEFORE click only
      (5L, "purchase", ts(500))                                 // no click: not in funnel
    ).toDF("user_id", "event_type", "ts")
    val r = WindowOps.conversionWithin(ev, "user_id", "event_type", "ts",
      "click", "purchase", withinMicros = 3600000000L).head
    assert(r.getLong(0) === 4L, "four users clicked")
    assert(r.getLong(1) === 1L, "only user 1 converted in-window")
    assert(r.getDouble(2) === 0.25)
    assert(r.getDouble(3) === 100000000.0)  // 100s in micros
    assert(r.getLong(4) === 100000000L)
    // degenerate funnels must not ANSI-divide by zero
    val noConv = WindowOps.conversionWithin(ev, "user_id", "event_type", "ts",
      "click", "error", withinMicros = 1L).head
    assert(noConv.getLong(1) === 0L && noConv.getDouble(2) === 0.0 && noConv.isNullAt(3))
    val noFrom = WindowOps.conversionWithin(ev, "user_id", "event_type", "ts",
      "view", "purchase", withinMicros = 1L).head
    assert(noFrom.getLong(0) === 0L && noFrom.getDouble(2) === 0.0)
  }

  test("funnelSteps: out-of-order steps don't count; ratios are exact micros") {
    import graft.operators.WindowOps
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    val ev = Seq(
      (1L, "view", ts(1)), (1L, "click", ts(2)), (1L, "purchase", ts(3)), // full funnel
      (2L, "purchase", ts(1)), (2L, "view", ts(2)), (2L, "click", ts(3)), // buys BEFORE clicking
      (3L, "click", ts(1))                                                // never views
    ).toDF("user_id", "event_type", "ts")
    val got = WindowOps.funnelSteps(ev, "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"))
      .as[(Long, String, Long, Option[Long], Option[Long])].collect()
      .sortBy(_._1)
    assert(got(0) === ((0L, "view", 2L, None, Some(1000000L))))
    assert(got(1) === ((1L, "click", 2L, Some(1000000L), Some(1000000L))),
      "user 3's click without a view is not step 2")
    assert(got(2) === ((2L, "purchase", 1L, Some(500000L), Some(500000L))),
      "user 2's purchase precedes their click — sequential order is the point")
  }

  test("funnelSteps: empty input reports 0 users (not NULL); quoted step names are safe") {
    import graft.operators.WindowOps
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    // empty events: the global sum's all-NULL row must coalesce to 0
    val empty = Seq.empty[(Long, String, java.sql.Timestamp)]
      .toDF("user_id", "event_type", "ts")
    val zeros = WindowOps.funnelSteps(empty, "user_id", "event_type", "ts",
      Seq("view", "click"))
      .as[(Long, String, Long, Option[Long], Option[Long])].collect().sortBy(_._1)
    assert(zeros === Seq((0L, "view", 0L, None, None), (1L, "click", 0L, None, None)))
    // a step literal containing quotes must not break plan construction
    // (typed Column literals, not interpolated SQL)
    val quoted = Seq((1L, "it's', -- odd", ts(1)), (1L, "buy", ts(2)))
      .toDF("user_id", "event_type", "ts")
    val q = WindowOps.funnelSteps(quoted, "user_id", "event_type", "ts",
      Seq("it's', -- odd", "buy"))
      .as[(Long, String, Long, Option[Long], Option[Long])].collect().sortBy(_._1)
    assert(q(0) === ((0L, "it's', -- odd", 1L, None, Some(1000000L))))
    assert(q(1) === ((1L, "buy", 1L, Some(1000000L), Some(1000000L))))
  }

  test("burstWindows: the spike window flags, steady windows don't; z-test is exact") {
    import graft.operators.WindowOps
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    // type A: 20 quiet windows (1 event) + 1 spike of 10 → W=21, S=30,
    // Sq=120: (cW−S)² = 180² = 32400 > 9·(W·Sq−S²) = 9·1620 = 14580 —
    // only the spike clears μ + 3σ (a lone spike among FEW windows
    // would mask itself by inflating σ: with 4 quiet windows the same
    // spike doesn't flag, which is correct z-test behavior).
    // Type B constant → σ = 0, nothing flags (cW > S fails).
    val quiet = (0 until 20).map(i => ("A", ts(i)))
    val spike = Seq.fill(10)(("A", ts(20)))
    val steady = (0 until 3).map(i => ("B", ts(i)))
    val ev = (quiet ++ spike ++ steady).toDF("event_type", "ts")
    val got = WindowOps.burstWindows(ev, "event_type", "ts",
      windowMicros = 1000000L)
      .as[(String, Long, Long, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    spark.catalog.clearCache()
    // mean_micro = half-up of 30/21 ·1e6
    assert(got(("A", 20000000L)) === (("A", 20000000L, 10L, 1428571L, true)))
    (0 until 20).foreach(i =>
      assert(!got(("A", i * 1000000L))._5, s"quiet window $i must not flag"))
    (0 until 3).foreach(i =>
      assert(got(("B", i * 1000000L)) === (("B", i * 1000000L, 1L, 1000000L, false)),
        "zero-variance type never bursts"))
  }

  test("sessionFeatures: gap splits sessions; error rate, breadth, span, value are exact") {
    import graft.operators.WindowOps
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    val ev = Seq(
      // user 1, session A: 3 events over 120s, one error, 2 types
      (1L, "click", ts(0), 1.5), (1L, "error", ts(60), 2.5), (1L, "click", ts(120), 1.0),
      // >30min gap → session B: a lone view
      (1L, "view", ts(120 + 1801), 4.0),
      // user 2: single-event session — span 0, rate 0
      (2L, "view", ts(10), 7.25)
    ).toDF("user_id", "event_type", "ts", "value")
    val got = WindowOps.sessionFeatures(ev, "user_id", "ts", "event_type", "value")
      .as[(Long, Long, Long, Long, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(got((1L, 0L)) === ((1L, 0L, 3L, 120000000L, 1L, 333333L, 2L, 5.0)))
    assert(got((1L, 1921000000L)) === ((1L, 1921000000L, 1L, 0L, 0L, 0L, 1L, 4.0)))
    assert(got((2L, 10000000L)) === ((2L, 10000000L, 1L, 0L, 0L, 0L, 1L, 7.25)))
    assert(got.size === 3)
  }

  test("materializeRetract nets out inserts and retracts, drops fully-retracted keys") {
    val changelog = Seq(
      (1L, 1, 10.0), (1L, 1, 5.0), (1L, -1, 10.0), // user 1: net 1 row, 5.0
      (2L, 1, 7.0), (2L, -1, 7.0) // user 2: fully retracted
    ).toDF("user_id", "op", "value")
    val got = ChangelogOps.materializeRetract(changelog, "op", Seq("user_id"), Seq("value"))
    val rows = got.as[(Long, Long, Double)].collect()
    assert(rows.toSeq === Seq((1L, 1L, 5.0)))
  }
}
