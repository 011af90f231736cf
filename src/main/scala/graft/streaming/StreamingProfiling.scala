package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** One emitted row per (entity, day) first occurrence. */
case class NoveltyPresence(entity: Long, day: Long, is_new: Boolean)

/** LIVE intake profiling — the streaming twin of
  * [[graft.operators.Profiling.noveltyTimeline]]'s first-seen core.
  *
  * Keyed by entity, state = (first flagged day, max emitted day, a
  * 64-day bitmask of recently emitted days): exactly ONE
  * `NoveltyPresence` row per (entity, day), `is_new` on the FIRST day
  * observed for the entity (arrival order — exactly-once per entity).
  * A per-day `groupBy(day).agg(count, count_if(is_new))` over the
  * output reproduces the batch active/new curve (parity spec) — the
  * split keeps this operator's state at THREE longs per entity while
  * the day-aggregation stays a plain aggregate downstream.
  *
  * Out-of-order contract (review fix): a day EARLIER than the
  * entity's max emitted day still emits its presence row as long as
  * it lies within the recent window — the bitmask covers days
  * maxEmitted−0 .. maxEmitted−63, a 64-day window INCLUDING the
  * current max day — and remembers which of those days already
  * emitted, so in-window late data is neither lost nor
  * double-emitted. Days more than 63 days behind the max emitted day
  * are dropped (bounded state is the point; set the watermark delay
  * ≤ 63 days so anything older is behind the watermark anyway).
  * `is_new` keeps exact batch parity when each entity's FIRST event
  * arrives before its others (any later event may be arbitrarily
  * disordered); a first-day row arriving late is emitted with
  * is_new = false — the flag is exactly-once, never retracted.
  *
  * State grows with |entities| — inherent to any exact "seen before?"
  * question (same cost class as the streaming dedup gate); a KMV/HLL
  * sketch answers the aggregate-rate version with constant state but
  * cannot flag individual rows.
  */
object StreamingProfiling {

  /** Tumbling-window declared-vs-predicted language confusion cells —
    * the LIVE twin of `Curation.langAgreementMatrix`'s cell counts:
    * per (event-time window, source, declared, predicted), the doc
    * count, with prediction from THE one q16 `langId` expression. A
    * mislabeled-feed alarm is `pred_lang != lang` cells growing in a
    * live window. Like `StreamingCorpusStats.windowedCorpusCard` this
    * is one NATIVE watermarked windowed aggregation (append mode,
    * exactly-once on close, state = open-window cells pruned by the
    * watermark) — no custom state. The batch op's share_ppm is
    * deliberately absent: it needs the per-(source, lang) total,
    * a second windowed aggregate that append mode can't chain;
    * consumers derive shares from the emitted cells. */
  def windowedLangAgreement(df: DataFrame, srcCol: String, langCol: String,
                            textCol: String, tsCol: String,
                            windowLen: String, delay: String): DataFrame =
    df.withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), windowLen), col(srcCol).as("source"),
        col(langCol).as("lang"),
        graft.functions.TextAnalysis.langId(col(textCol)).as("pred_lang"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("source"), col("lang"), col("pred_lang"), col("n"))

  def noveltyPresence(df: DataFrame, entityCol: String, tsCol: String,
                      delay: String): Dataset[NoveltyPresence] = {
    val spark = df.sparkSession
    import spark.implicits._
    val outEnc: Encoder[NoveltyPresence] = Encoders.product[NoveltyPresence]
    // kryo for the STATE only, passed EXPLICITLY — an implicit tuple
    // kryo encoder would shadow the product encoder `.as` needs
    val stateEnc: Encoder[(Long, Long, Long)] = Encoders.kryo[(Long, Long, Long)]
    val rows = df
      .withWatermark(tsCol, delay)
      .select(col(entityCol).cast("long").as("_1"),
        graft.expressions.HashExpressions
          .intDiv(unix_micros(col(tsCol)), lit(86400000000L)).as("_2"))
      .as[(Long, Long)]
    rows.groupByKey(_._1)(Encoders.scalaLong)
      .flatMapGroupsWithState[(Long, Long, Long), NoveltyPresence](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (entity: Long, it: Iterator[(Long, Long)],
         state: org.apache.spark.sql.streaming.GroupState[(Long, Long, Long)]) =>
          val days = it.map(_._2).toArray.distinct.sorted
          // recentMask bit i (0 ≤ i < 64) ⟺ day (maxEmitted − i) emitted
          var (first, maxEmitted, recentMask) =
            state.getOption.getOrElse((Long.MaxValue, Long.MinValue, 0L))
          val out = Array.newBuilder[NoveltyPresence]
          days.foreach { d =>
            if (first == Long.MaxValue) {
              first = d; maxEmitted = d; recentMask = 1L
              out += NoveltyPresence(entity, d, is_new = true)
            } else if (d > maxEmitted) {
              val shift = d - maxEmitted
              recentMask = (if (shift >= 64) 0L else recentMask << shift) | 1L
              maxEmitted = d
              out += NoveltyPresence(entity, d, is_new = false)
            } else {
              val back = maxEmitted - d
              if (back < 64 && (recentMask & (1L << back)) == 0L) {
                recentMask |= 1L << back
                out += NoveltyPresence(entity, d, is_new = false)
              } // emitted already, or >63 days behind maxEmitted: drop
            }
          }
          state.update((first, maxEmitted, recentMask))
          out.result().iterator
      }(stateEnc, outEnc)
  }
}
