package graft

import graft.streaming.StreamingCorpusStats
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingCorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000)

  case class TokEv(token: String, event_time: java.sql.Timestamp)

  test("windowedHeavyHitters: heavy token survives with the MG bound; exactly-once; state per window") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[TokEv]
    val out = StreamingCorpusStats.windowedHeavyHitters(in.toDF(), "token",
      "event_time", windowLen = "10 seconds", windowMillis = 10000L,
      delay = "0 seconds", k = 2)
    val q = out.writeStream.format("memory").queryName("mg_t")
      .outputMode("append").start()
    // window [0,10): hot×6 among 4 distinct others — n=10, k=2:
    // any token with count > n/(k+1) = 3.33 MUST survive
    // start at 1s: a ts-0 row sits ON the initial watermark and drops
    val tokens = Seq("hot", "a", "hot", "b", "hot", "c", "hot", "d", "hot", "hot")
    in.addData(tokens.zipWithIndex.map { case (t, i) =>
      TokEv(t, new java.sql.Timestamp(1000L + i.toLong * 500))
    }: _*)
    q.processAllAvailable()
    assert(spark.table("mg_t").count() === 0) // window still open
    in.addData(TokEv("x", ts(25)))
    q.processAllAvailable()
    val rows = spark.table("mg_t")
      .as[(Long, Int, String, Long, Long)].collect().filter(_._1 == 0L)
    assert(rows.nonEmpty && rows.length <= 2, rows.toSeq.toString) // ≤ k counters survive
    assert(rows.forall(_._5 === 10L), rows.toSeq.toString)
    val hot = rows.find(_._3 == "hot")
    assert(hot.isDefined, s"frequency-6 token must survive MG with k=2: ${rows.toSeq}")
    // MG bound: true − n/(k+1) ≤ mg ≤ true
    assert(hot.get._4 <= 6L && hot.get._4 >= 6L - 10L / 3L)
    assert(hot.get._2 === 1) // ranked first: no other count can exceed it
    // second window closes independently with its own state
    in.addData(TokEv("solo", ts(26)), TokEv("solo", ts(27)))
    q.processAllAvailable()
    in.addData(TokEv("y", ts(55)))
    q.processAllAvailable()
    val w2 = spark.table("mg_t")
      .as[(Long, Int, String, Long, Long)].collect().filter(_._1 == 20000000L)
    assert(w2.exists(r => r._3 == "solo" && r._4 == 2L && r._5 == 3L))
    q.stop()
  }

  case class DocEv(text: String, event_time: java.sql.Timestamp)

  test("windowedCorpusCard: closed window matches the batch corpusCard bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val in = MemoryStream[DocEv]
    val out = StreamingCorpusStats.windowedCorpusCard(in.toDF(), "text",
      "event_time", windowLen = "10 seconds", delay = "0 seconds")
    val q = out.writeStream.format("memory").queryName("card_t")
      .outputMode("append").start()
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "short one",
      "a much longer document with many more words in it than the others have")
    in.addData(texts.zipWithIndex.map { case (t, i) => DocEv(t, ts(i + 1)) }: _*)
    q.processAllAvailable()
    in.addData(DocEv("closer", ts(25)))
    q.processAllAvailable()
    val rows = spark.table("card_t")
      .as[(Long, Long, Long, Long, Long, Double)].collect().filter(_._1 == 0L)
    assert(rows.length === 1)
    val stream = rows.head
    // batch parity: same docs through the batch card (one group)
    import spark.implicits._
    val batch = graft.operators.CorpusStats.corpusCard(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t, "g", "g") }
        .toDF("doc_id", "text", "source", "lang"),
      "doc_id", "text", Seq("source", "lang"))
      .select("n_docs", "n_tokens", "min_toks", "max_toks", "mean_quality")
      .as[(Long, Long, Int, Int, Double)].head()
    assert((stream._2, stream._3, stream._4, stream._5, stream._6) ===
      ((batch._1, batch._2, batch._3.toLong, batch._4.toLong, batch._5)))
    q.stop()
  }

  case class VecEv(embedding: Array[Float], event_time: java.sql.Timestamp)

  test("windowedNormProfile: closed window replays the q133 moment formulas; zero vector counted") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[VecEv]
    val out = StreamingCorpusStats.windowedNormProfile(in.toDF(), "embedding",
      "event_time", windowLen = "10 seconds", delay = "0 seconds")
    val q = out.writeStream.format("memory").queryName("norm_t")
      .outputMode("append").start()
    // norms: 1.0, 2.0, 0.0 → micros {1e6, 2e6, 0}
    in.addData(
      VecEv(Array(1f, 0f), ts(1)), VecEv(Array(0f, 2f), ts(2)),
      VecEv(Array(0f, 0f), ts(3)))
    q.processAllAvailable()
    assert(spark.table("norm_t").count() === 0, "window still open")
    in.addData(VecEv(Array(1f, 0f), ts(25)))
    q.processAllAvailable()
    val rows = spark.table("norm_t")
      .as[(Long, Long, Long, Long, Long)].collect().filter(_._1 == 0L)
    assert(rows.length === 1)
    // mean = (2·3e6+3)//6 = 1000000; E[x²] = (2·5e12+3)//6 =
    // 1666666666667; var = E[x²] − mean² = 666666666667
    assert(rows.head === ((0L, 3L, 1L, 1000000L, 666666666667L)))
    q.stop()
  }

  test("windowedCalibration: closed window matches batch calibrationBins bit-for-bit") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[DocEv]
    val out = StreamingCorpusStats.windowedCalibration(in.toDF(), "text",
      "event_time", windowLen = "10 seconds", delay = "0 seconds")
    val q = out.writeStream.format("memory").queryName("cal_t")
      .outputMode("append").start()
    // a long stopword-rich doc (Gopher keep candidate) + short rejects
    // spread across score bins
    val long = ("the cat and the dog walk to the park and it is a fine day " * 4) +
      "of an or in is it the a an of and or to in is it"
    val texts = Seq(long, "short one", "tiny", "a b c d e f g h")
    in.addData(texts.zipWithIndex.map { case (t, i) => DocEv(t, ts(i + 1)) }: _*)
    q.processAllAvailable()
    in.addData(DocEv("closer", ts(25)))
    q.processAllAvailable()
    val stream = spark.table("cal_t")
      .as[(Long, Long, Long, Long, Long, Long)].collect().filter(_._1 == 0L)
      .map(r => (r._2, r._3, r._4, r._5, r._6)).sortBy(_._1)
    import spark.implicits._
    val batch = graft.operators.Curation.calibrationBins(
        texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(stream.nonEmpty && stream.toSeq === batch.toSeq)
    q.stop()
  }

  test("windowedKmvDistinct: exact below k, arrival-order independent, matches hand KMV above k") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[TokEv]
    val out = StreamingCorpusStats.windowedKmvDistinct(in.toDF(), "token",
      "event_time", windowLen = "10 seconds", windowMillis = 10000L,
      delay = "0 seconds", k = 4)
    val q = out.writeStream.format("memory").queryName("kmv_t")
      .outputMode("append").start()
    // window [0,10): 3 distinct values (< k) repeated — exact count
    in.addData(TokEv("u", ts(1)), TokEv("v", ts(2)), TokEv("u", ts(3)),
      TokEv("w", ts(4)), TokEv("v", ts(5)))
    q.processAllAvailable()
    // window [10,20): 8 distinct values (> k) — KMV estimate; feed in
    // one order here, compare against the hand fold in sorted order
    val vals = Seq("p1", "p2", "p3", "p4", "p5", "p6", "p7", "p8")
    in.addData(vals.zipWithIndex.map { case (v, i) =>
      TokEv(v, new java.sql.Timestamp(12000L + i))
    }: _*)
    q.processAllAvailable()
    in.addData(TokEv("z", ts(45)))
    q.processAllAvailable()
    val rows = spark.table("kmv_t")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(rows(0L)._2 === 5L && rows(0L)._3 === 3L && rows(0L)._4 === 3.0)
    // hand KMV: same md5-48 hash, k smallest of the SORTED distinct set
    def h48(s: String): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString, 16)
    val hs = vals.map(h48).distinct.sorted.take(4)
    val expected = 3.0 * 281474976710656.0 / hs.last.toDouble
    assert(rows(10000000L)._3 === 4L)
    assert(rows(10000000L)._4 === expected)
    q.stop()
  }

  test("windowedHllDistinct: dup-blind registers, per-window state, estimator replay") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[TokEv]
    val out = StreamingCorpusStats.windowedHllDistinct(in.toDF(), "token",
      "event_time", windowLen = "10 seconds", windowMillis = 10000L,
      delay = "0 seconds")
    val q = out.writeStream.format("memory").queryName("hll_t")
      .outputMode("append").start()
    // window [0,10): 3 distinct among 5 rows — linear counting is
    // exact this small (the q144 batch spec's case)
    in.addData(TokEv("u", ts(1)), TokEv("v", ts(2)), TokEv("u", ts(3)),
      TokEv("w", ts(4)), TokEv("v", ts(5)))
    q.processAllAvailable()
    // window [10,20): 300 distinct values, duplicates interleaved —
    // registers are idempotent, dups must not move the estimate
    val vals = (0 until 300).map(i => s"val$i")
    in.addData((vals ++ vals.take(50)).zipWithIndex.map { case (v, i) =>
      TokEv(v, new java.sql.Timestamp(12000L + i.toLong))
    }: _*)
    q.processAllAvailable()
    in.addData(TokEv("z", ts(45)))
    q.processAllAvailable()
    val rows = spark.table("hll_t")
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(rows(0L)._2 === 5L && rows(0L)._5 === 3L)
    // replay the second window through the shared estimator on the
    // same portable hashes — the stream adds only plumbing, not math
    def h48(s: String): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString, 16)
    val regs = new Array[Int](64)
    vals.foreach(v => graft.operators.CorpusStats.hllObserve(regs, h48(v)))
    val (vZero, zInt, est) = graft.operators.CorpusStats.hllEstimate(regs)
    assert(rows(10000000L) === ((10000000L, 350L, vZero, zInt, est)))
    assert(est > 180L && est < 450L, s"estimate $est should track 300")
    q.stop()
  }
}
