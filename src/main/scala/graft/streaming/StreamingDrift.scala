package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One emitted drift row per (closed window, baseline category). */
case class WindowDrift(window_start_us: Long, category: String, n: Long,
                       share: Double, psi_term: Double)

/** LIVE distribution-drift monitoring — the streaming counterpart of
  * [[graft.operators.Drift.psiDrift]]: per event-time tumbling window,
  * the category mix is scored against a FIXED reference distribution
  * (yesterday's mix, the training-corpus mix…), and the window's PSI
  * terms are emitted exactly once when the watermark closes it.
  *
  * Why custom state and not two windowed aggregates: shares need the
  * per-window TOTAL next to the per-category counts, and chained
  * streaming aggregations aren't allowed in append mode — a keyed
  * state holding the window's count map IS the single-pass form.
  */
object StreamingDrift {

  /** Tumbling-window PSI vs a fixed baseline distribution.
    *
    * State per open window = one Map[category → count] (bounded by the
    * category cardinality — monitoring-sized, not data-sized), sharded
    * by the groupByKey exchange; closed windows REMOVE their state, so
    * total state is (open windows × categories). Emission is
    * watermark-driven (EventTimeTimeout at window end): each window's
    * rows come out exactly once, late events past `delay` are dropped
    * by the watermark — the same lateness contract as the windowed
    * aggregates.
    *
    * Every baseline category gets a row (n = 0 when unseen: drift in
    * a vanished category is exactly what PSI must surface); an
    * observed category MISSING from the baseline fails loudly (the
    * repo's fail-loudly contract — a silent epsilon would understate
    * drift where it matters most). Laplace smoothing and 6-dp
    * rounding as in the batch op: share = (n+1)/(tot+K), K =
    * |baseline|, psi = (share − p_b)·ln(share/p_b).
    *
    * `windowLen` must match `windowMillis` (the string form feeds the
    * window expression, the numeric form the timeout arithmetic). */
  def windowedPsi(df: DataFrame, catCol: String, tsCol: String,
                  windowLen: String, windowMillis: Long, delay: String,
                  baseline: Map[String, Double]): Dataset[WindowDrift] = {
    require(baseline.nonEmpty && baseline.values.forall(_ > 0.0),
      "baseline must assign positive probability to every category")
    implicit val outEnc: Encoder[WindowDrift] = Encoders.product[WindowDrift]
    implicit val stateEnc: Encoder[Map[String, Long]] =
      Encoders.kryo[Map[String, Long]]
    implicit val rowEnc: Encoder[(java.sql.Timestamp, String, java.sql.Timestamp)] =
      Encoders.product[(java.sql.Timestamp, String, java.sql.Timestamp)]
    val k = baseline.size
    // the WATERMARKED event-time column itself must survive into the
    // stateful operator (EventTimeTimeout resolves the watermark from
    // its tag, and `window(...).start` does NOT inherit it) — so the
    // raw tsCol rides along as _3, unused by the state function
    val winRows = df
      .withWatermark(tsCol, delay)
      .select(window(col(tsCol), windowLen).getField("start").as("_1"),
        col(catCol).cast("string").as("_2"),
        col(tsCol).as("_3"))
      .as[(java.sql.Timestamp, String, java.sql.Timestamp)]
    winRows.groupByKey(_._1.getTime)(Encoders.scalaLong)
      .flatMapGroupsWithState[Map[String, Long], WindowDrift](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (wsMs: Long, rows: Iterator[(java.sql.Timestamp, String, java.sql.Timestamp)],
         state: GroupState[Map[String, Long]]) =>
          if (state.hasTimedOut) {
            val counts = state.getOption.getOrElse(Map.empty[String, Long])
            state.remove()
            val tot = counts.values.sum
            counts.keys.find(!baseline.contains(_)).foreach { c =>
              throw new IllegalArgumentException(
                s"category '$c' observed in window $wsMs but absent from the baseline")
            }
            // Spark round()'s semantics (HALF_UP on the shortest decimal
            // repr), NOT math.rint (half-even on the scaled binary):
            // batch Drift.psiDrift emits Spark round(x, 6), and the two
            // disagree on exact 6th-decimal ties — batch/stream parity
            // requires the same tie side.
            def r6(x: Double) =
              BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
            baseline.toSeq.sortBy(_._1).map { case (cat, pB) =>
              val n = counts.getOrElse(cat, 0L)
              val pA = (n + 1).toDouble / (tot + k).toDouble
              WindowDrift(wsMs * 1000L, cat, n, r6(pA),
                r6((pA - pB) * math.log(pA / pB)))
            }.iterator
          } else {
            val counts = rows.foldLeft(state.getOption.getOrElse(Map.empty[String, Long])) {
              case (m, (_, c, _)) => m.updated(c, m.getOrElse(c, 0L) + 1L)
            }
            state.update(counts)
            // fire once the WATERMARK (not processing time) passes the
            // window end — the window is then complete by definition.
            // The max-clamp is defense-in-depth: a row that passes the
            // watermark filter has ts ≥ watermark, so its window end is
            // always > watermark and the plain timeout is legal — but a
            // timeout ≤ watermark THROWS (killing the query), so guard
            // the invariant rather than assume it of every future
            // caller/source shape (spec pins the drop behavior).
            state.setTimeoutTimestamp(
              math.max(wsMs + windowMillis, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }
}
