package graft

import graft.streaming.StreamingProfiling
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingProfilingSpec extends SparkSpec {
  import spark.implicits._

  case class UserEv(user_id: Long, ts: java.sql.Timestamp, event_type: String)

  private val us = 86400000000L
  private def dayTs(day: Long, offMs: Long = 0L) =
    new java.sql.Timestamp(day * 86400000L + offMs)

  test("noveltyPresence: one row per (entity, day), is_new on the first day only; batch parity") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[UserEv]
    val out = StreamingProfiling.noveltyPresence(in.toDF(), "user_id", "ts",
      delay = "0 seconds")
    val q = out.writeStream.format("memory").queryName("nov_t")
      .outputMode("append").start()
    // the q164 spec's 3-day scenario, fed in event-time order —
    // duplicates within a day must collapse to one presence row
    in.addData(
      UserEv(1L, dayTs(0), "a"), UserEv(1L, dayTs(0, 5), "a"),
      UserEv(2L, dayTs(0, 9), "a"))
    q.processAllAvailable()
    in.addData(UserEv(1L, dayTs(1), "b"), UserEv(3L, dayTs(1, 3), "a"))
    q.processAllAvailable()
    in.addData(
      UserEv(1L, dayTs(2), "a"), UserEv(2L, dayTs(2, 2), "a"),
      UserEv(3L, dayTs(2, 4), "a"))
    q.processAllAvailable()
    val rows = spark.table("nov_t").as[(Long, Long, Boolean)].collect().toSet
    assert(rows === Set(
      (1L, 0L, true), (2L, 0L, true),
      (1L, 1L, false), (3L, 1L, true),
      (1L, 2L, false), (2L, 2L, false), (3L, 2L, false)))
    // per-day rollup over the emitted rows ≡ the batch operator's
    // user curve on the same events
    val curve = spark.table("nov_t").groupBy("day")
      .agg(count(lit(1)).as("active"), sum(when($"is_new", 1L).otherwise(0L)).as("nu"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val batchEvents = Seq(
      (1L, 0L, "a"), (1L, 5L, "a"), (2L, 9L, "a"),
      (1L, us, "b"), (3L, us + 3, "a"),
      (1L, 2 * us, "a"), (2L, 2 * us + 2, "a"), (3L, 2 * us + 4, "a"))
      .toDF("user_id", "eus", "event_type")
      .select($"user_id", timestamp_micros($"eus").as("ts"), $"event_type")
    val batch = graft.operators.Profiling
      .noveltyTimeline(batchEvents, "user_id", "ts", "event_type")
      .select("day", "active_users", "new_users")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    spark.catalog.clearCache()
    assert(curve === batch)
    // a re-delivered old day (already emitted, inside the 63-day
    // window) is dropped, not double-emitted
    in.addData(UserEv(1L, dayTs(0, 7), "a"))
    q.processAllAvailable()
    assert(spark.table("nov_t").count() === 7)
    // an out-of-order day NEVER seen before, inside the window, still
    // emits its presence row (is_new=false — the flag is arrival-order
    // exactly-once): user 2 was active on days 0 and 2, day 1 arrives
    // late
    in.addData(UserEv(2L, dayTs(1, 11), "a"))
    q.processAllAvailable()
    val late = spark.table("nov_t").as[(Long, Long, Boolean)].collect().toSet
    assert(late.contains((2L, 1L, false)) && late.size === 8)
    // beyond the 63-day recent window: dropped (bounded state)
    in.addData(UserEv(2L, dayTs(-70, 1), "a"))
    q.processAllAvailable()
    assert(spark.table("nov_t").count() === 8)
    q.stop()
  }

  case class DocEv(source: String, lang: String, text: String,
                   ts: java.sql.Timestamp)

  test("windowedLangAgreement: closed-window cells match the batch matrix counts") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[DocEv]
    val out = StreamingProfiling.windowedLangAgreement(in.toDF(),
      "source", "lang", "text", "ts", windowLen = "10 seconds",
      delay = "0 seconds")
    val q = out.writeStream.format("memory").queryName("lang_t")
      .outputMode("append").start()
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    val docs = Seq(
      ("s", "en", "the cat is in the hat"),
      ("s", "en", "el perro es un animal que ladra"),
      ("s", "en", "it is a good day to code"))
    in.addData(docs.zipWithIndex.map { case ((src, l, txt), i) =>
      DocEv(src, l, txt, ts(1 + i)) }: _*)
    q.processAllAvailable()
    in.addData(DocEv("s", "en", "later window row", ts(25)))
    q.processAllAvailable()
    val cells = spark.table("lang_t")
      .as[(Long, String, String, String, Long)].collect()
      .filter(_._1 == 0L).map(r => (r._2, r._3, r._4) -> r._5).toMap
    val batch = graft.operators.Curation
      .langAgreementMatrix(docs.toDF("source", "lang", "text"),
        "source", "lang", "text")
      .as[(String, String, String, Long, Long)].collect()
      .map(r => (r._1, r._2, r._3) -> r._4).toMap
    assert(cells === batch, s"window cells $cells vs batch $batch")
    q.stop()
  }
}
