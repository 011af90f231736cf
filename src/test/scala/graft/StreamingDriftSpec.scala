package graft

import graft.streaming.StreamingDrift
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingDriftSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000)

  case class CatEv(category: String, event_time: java.sql.Timestamp)

  private val baseline = Map("A" -> 0.5, "B" -> 0.5)

  test("windowedPsi: a window emits once when the watermark closes it, with hand-computed terms") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[CatEv]
    val out = StreamingDrift.windowedPsi(in.toDF(), "category", "event_time",
      windowLen = "10 seconds", windowMillis = 10000L, delay = "0 seconds", baseline)
    val q = out.writeStream.format("memory").queryName("psi_t")
      .outputMode("append").start()
    // window [0,10): 3×A + 1×B — a shift vs the 50/50 baseline
    in.addData(CatEv("A", ts(1)), CatEv("A", ts(2)), CatEv("A", ts(3)), CatEv("B", ts(4)))
    q.processAllAvailable()
    // window still open (watermark at 4s): nothing emitted yet
    assert(spark.table("psi_t").count() === 0)
    // an event at 25s pushes the watermark past 10s → [0,10) closes
    in.addData(CatEv("B", ts(25)))
    q.processAllAvailable()
    val rows = spark.table("psi_t")
      .as[(Long, String, Long, Double, Double)].collect()
      .map(r => r._2 -> r).toMap
    assert(rows.keySet === Set("A", "B"))
    // smoothed shares: tot=4, K=2 → p(A)=(3+1)/6, p(B)=(1+1)/6
    // (HALF_UP on the decimal repr — Spark round()'s semantics, the
    // same tie side as batch Drift.psiDrift)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val (pA, pB) = (4.0 / 6.0, 2.0 / 6.0)
    assert(rows("A")._1 === 0L && rows("A")._3 === 3L)
    assert(rows("A")._4 === r6(pA))
    assert(rows("A")._5 === r6((pA - 0.5) * math.log(pA / 0.5)))
    assert(rows("B")._3 === 1L)
    assert(rows("B")._5 === r6((pB - 0.5) * math.log(pB / 0.5)))
    // PSI terms are non-negative by construction
    assert(rows.values.forall(_._5 >= 0.0))
    q.stop()
  }

  test("windowedPsi: vanished baseline category still gets a row; state is per-window") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[CatEv]
    val out = StreamingDrift.windowedPsi(in.toDF(), "category", "event_time",
      windowLen = "10 seconds", windowMillis = 10000L, delay = "0 seconds", baseline)
    val q = out.writeStream.format("memory").queryName("psi_t2")
      .outputMode("append").start()
    // [0,10): only A; [10,20): only B; both close when watermark hits 45
    in.addData(CatEv("A", ts(1)), CatEv("A", ts(2)))
    q.processAllAvailable()
    in.addData(CatEv("B", ts(12)), CatEv("B", ts(13)), CatEv("B", ts(14)))
    q.processAllAvailable()
    in.addData(CatEv("A", ts(45)))
    q.processAllAvailable()
    val rows = spark.table("psi_t2")
      .as[(Long, String, Long, Double, Double)].collect()
    val byWin = rows.groupBy(_._1).map { case (w, g) =>
      w -> g.map(r => r._2 -> r._3).toMap
    }
    // every closed window emits BOTH baseline categories, zeros included
    assert(byWin(0L) === Map("A" -> 2L, "B" -> 0L))
    assert(byWin(10000000L) === Map("A" -> 0L, "B" -> 3L))
    // the vanished category carries positive drift, not a dropped row
    val vanishedB = rows.find(r => r._1 == 0L && r._2 == "B").get
    assert(vanishedB._5 > 0.0)
    q.stop()
  }

  test("windowedPsi: exact 6th-decimal tie rounds HALF_UP, matching batch round()") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[CatEv]
    val out = StreamingDrift.windowedPsi(in.toDF(), "category", "event_time",
      windowLen = "10 seconds", windowMillis = 10000L, delay = "0 seconds", baseline)
    val q = out.writeStream.format("memory").queryName("psi_tie")
      .outputMode("append").start()
    // 126 A-events in [0,10s): tot+K = 128 → share(B) = 1/128 =
    // 0.0078125 EXACTLY (power-of-two denominator, exact in binary):
    // micro-units 7812.5 is a true tie. HALF_UP → 0.007813; half-even
    // (math.rint, the old bug) would emit 0.007812.
    in.addData((1 to 126).map(i => CatEv("A", new java.sql.Timestamp(i.toLong))): _*)
    q.processAllAvailable()
    in.addData(CatEv("B", ts(25)))
    q.processAllAvailable()
    val rows = spark.table("psi_tie")
      .as[(Long, String, Long, Double, Double)].collect()
      .filter(_._1 == 0L).map(r => r._2 -> r).toMap
    assert(rows("B")._3 === 0L)
    assert(rows("B")._4 === 0.007813)
    assert(rows("A")._4 === 0.992188) // 127/128 = 0.9921875, tie up
    // parity: Spark's round() sends the same value to the same side
    val sparkSide = Seq(0.0078125).toDF("x")
      .select(org.apache.spark.sql.functions.round($"x", 6)).as[Double].head()
    assert(rows("B")._4 === sparkSide)
    q.stop()
  }

  test("windowedPsi: delay>0 — a straggler behind the watermark is DROPPED, and the query survives") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[CatEv]
    val out = StreamingDrift.windowedPsi(in.toDF(), "category", "event_time",
      windowLen = "10 seconds", windowMillis = 10000L, delay = "15 seconds", baseline)
    val q = out.writeStream.format("memory").queryName("psi_t3")
      .outputMode("append").start()
    // watermark reaches 40−15 = 25 — already past window [10,20)'s end
    in.addData(CatEv("A", ts(40)))
    q.processAllAvailable()
    // straggler at 18s is behind the watermark: the watermark filter
    // drops it BEFORE the stateful operator (which is also why a
    // passing row can never carry a window end ≤ watermark — any row
    // that survives has ts ≥ wm and its window end > ts; the timeout
    // clamp in windowedPsi is defense-in-depth, not a reachable path)
    in.addData(CatEv("B", ts(18)))
    q.processAllAvailable()
    in.addData(CatEv("A", ts(90)))
    q.processAllAvailable()
    in.addData(CatEv("A", ts(200)))
    q.processAllAvailable()
    val rows = spark.table("psi_t3")
      .as[(Long, String, Long, Double, Double)].collect()
    // the dropped straggler's window never materializes…
    assert(!rows.exists(_._1 == 10000000L))
    // …while on-time windows close and emit normally
    assert(rows.exists(r => r._1 == 40000000L && r._2 == "A" && r._3 == 1L))
    assert(rows.exists(r => r._1 == 90000000L && r._2 == "A" && r._3 == 1L))
    q.stop()
  }

  case class DocEv(text: String, event_time: java.sql.Timestamp)

  /** The operator's portable bucket, replayed in plain Scala. */
  private def bucketOf(token: String, buckets: Int): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(token.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.substring(0, 8), 16) % buckets).toInt
  }

  test("windowedTokenJs: window matching the reference scores 0; disjoint vocab near 2·ln 2") {
    implicit val sqlCtx = spark.sqlContext
    // reference = the exact share doubles of the window's own mix →
    // every per-bucket term is ln(1) = 0 exactly, no floor slack
    val matchRef = Seq("alpha", "alpha", "beta", "gamma")
      .groupBy(t => bucketOf(t, 1024)).map { case (b, ts) => b -> ts.size / 4.0 }
    val in = MemoryStream[DocEv]
    val out = StreamingDrift.windowedTokenJs(in.toDF(), "text", "event_time",
      windowLen = "10 seconds", windowMillis = 10000L, delay = "0 seconds",
      matchRef, buckets = 1024)
    val q = out.writeStream.format("memory").queryName("js_t")
      .outputMode("append").start()
    in.addData(DocEv("alpha alpha beta gamma", ts(1)))
    q.processAllAvailable()
    assert(spark.table("js_t").count() === 0, "open window must not emit")
    // [10,20): four tokens DISJOINT from the reference support
    in.addData(DocEv("delta eps zeta theta", ts(12)))
    q.processAllAvailable()
    in.addData(DocEv("closer", ts(45)))
    q.processAllAvailable()
    val rows = spark.table("js_t").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows(0L)._2 === 4L && rows(0L)._3 === 0L,
      s"matching mix must score exactly 0: ${rows(0L)}")
    // disjoint support: 2·JS = 2·ln 2 ≈ 1386294 micro, floor slack ≤
    // |support| buckets
    val dj = rows(10000000L)
    assert(dj._2 === 4L)
    assert(dj._3 > 1386000L && dj._3 <= 1386295L, s"disjoint 2·JS: $dj")
    // exactly-once: one row per closed window
    assert(rows.size === 2)
    q.stop()
  }

  test("windowedTokenJs: novel buckets are legal drift, not an error; state is per-window") {
    implicit val sqlCtx = spark.sqlContext
    val ref = Map(bucketOf("alpha", 64) -> 1.0)
    val in = MemoryStream[DocEv]
    val out = StreamingDrift.windowedTokenJs(in.toDF(), "text", "event_time",
      windowLen = "10 seconds", windowMillis = 10000L, delay = "0 seconds",
      ref, buckets = 64)
    val q = out.writeStream.format("memory").queryName("js_t2")
      .outputMode("append").start()
    // half the window's mass is a token the reference never saw —
    // must emit (not throw), with positive divergence
    in.addData(DocEv("alpha novelword", ts(1)))
    q.processAllAvailable()
    in.addData(DocEv("alpha", ts(25)))
    q.processAllAvailable()
    in.addData(DocEv("alpha", ts(45)))
    q.processAllAvailable()
    val rows = spark.table("js_t2").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows(0L)._3 > 0L, "novel-vocab window must carry positive drift")
    // the all-alpha window [20,30) matches the reference exactly
    assert(rows(20000000L)._2 === 1L && rows(20000000L)._3 === 0L)
    q.stop()
  }

  test("windowedBursts: live flags agree with the batch z-test against the same baseline moments") {
    implicit val sqlCtx = spark.sqlContext
    // the batch-side baseline from ChangelogOpsSpec's planted case:
    // type A over 21 windows — W=21, S=30, Sq=120. The z-test flags a
    // window of 10 ((180)² = 32400 > 9·1620 = 14580) and not one of 1.
    val baseline = Map("A" -> ((21L, 30L, 120L)))
    val in = MemoryStream[CatEv]
    val out = graft.streaming.StreamingDrift.windowedBursts(in.toDF(),
      "category", "event_time", windowLen = "10 seconds",
      delay = "0 seconds", baseline)
    val q = out.writeStream.format("memory").queryName("burst_t")
      .outputMode("append").start()
    // [0,10): a single event (quiet) — watermark at 1s, nothing closes
    in.addData(CatEv("A", ts(1)))
    q.processAllAvailable()
    assert(spark.table("burst_t").count() === 0, "open windows must not emit")
    // [10,20): a 10-event spike (its batch closes [0,10)); the late
    // lone event then closes [10,20)
    in.addData((1 to 10).map(i => CatEv("A", ts(11))): _*)
    q.processAllAvailable()
    in.addData(CatEv("A", ts(45)))
    q.processAllAvailable()
    val rows = spark.table("burst_t")
      .as[(Long, String, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows(0L) === ((0L, "A", 1L, false)))
    assert(rows(10000000L) === ((10000000L, "A", 10L, true)),
      "the spike window must flag against the batch moments")
    // parity with the batch operator's algebra on the same numbers
    val batchFlag = {
      val (w, s, sq) = baseline("A")
      val lhs = 10L * w - s
      lhs * lhs > 9L * (w * sq - s * s) && 10L * w > s
    }
    assert(batchFlag === rows(10000000L)._4)
    q.stop()
  }
}
