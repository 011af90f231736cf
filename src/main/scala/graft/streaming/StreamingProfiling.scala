package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** One emitted row per (entity, day) first occurrence. */
case class NoveltyPresence(entity: Long, day: Long, is_new: Boolean)

/** LIVE intake profiling — the streaming twin of
  * [[graft.operators.Profiling.noveltyTimeline]]'s first-seen core.
  *
  * Keyed by entity, state = (first-seen day, max emitted day): exactly
  * ONE `NoveltyPresence` row per (entity, day), flagged `is_new` on
  * the entity's very first day. A per-day `groupBy(day).agg(count,
  * count_if(is_new))` over the output reproduces the batch
  * active/new curve (asserted by the parity spec) — the split keeps
  * this operator's state at TWO longs per entity while the
  * day-aggregation stays a plain (re-startable, watermarkable)
  * aggregate downstream.
  *
  * State grows with |entities| — inherent to any exact "seen before?"
  * question (same cost class as the streaming dedup gate); a KMV/HLL
  * sketch answers the aggregate-rate version with constant state but
  * cannot flag individual rows. Exactness contract: per-entity
  * nondecreasing DAY order (the watermark's job at day granularity);
  * a day older than the entity's max emitted day arrives only behind
  * the watermark and is dropped, never double-emitted.
  */
object StreamingProfiling {

  def noveltyPresence(df: DataFrame, entityCol: String, tsCol: String,
                      delay: String): Dataset[NoveltyPresence] = {
    val spark = df.sparkSession
    import spark.implicits._
    val outEnc: Encoder[NoveltyPresence] = Encoders.product[NoveltyPresence]
    // kryo for the STATE only, passed EXPLICITLY — an implicit tuple
    // kryo encoder would shadow the product encoder `.as` needs
    val stateEnc: Encoder[(Long, Long)] = Encoders.kryo[(Long, Long)]
    val rows = df
      .withWatermark(tsCol, delay)
      .select(col(entityCol).cast("long").as("_1"),
        graft.expressions.HashExpressions
          .intDiv(unix_micros(col(tsCol)), lit(86400000000L)).as("_2"))
      .as[(Long, Long)]
    rows.groupByKey(_._1)(Encoders.scalaLong)
      .flatMapGroupsWithState[(Long, Long), NoveltyPresence](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (entity: Long, it: Iterator[(Long, Long)],
         state: org.apache.spark.sql.streaming.GroupState[(Long, Long)]) =>
          val days = it.map(_._2).toArray.distinct.sorted
          var (first, maxEmitted) =
            state.getOption.getOrElse((Long.MaxValue, Long.MinValue))
          val out = Array.newBuilder[NoveltyPresence]
          days.foreach { d =>
            if (d > maxEmitted) {
              val isNew = first == Long.MaxValue
              if (isNew) first = d
              out += NoveltyPresence(entity, d, isNew)
              maxEmitted = d
            }
          }
          state.update((first, maxEmitted))
          out.result().iterator
      }(stateEnc, outEnc)
  }
}
