package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One emitted drift row per (closed window, baseline category). */
case class WindowDrift(window_start_us: Long, category: String, n: Long,
                       share: Double, psi_term: Double)

/** One emitted lexical-drift row per closed window: 2·JS divergence of
  * the window's hashed-unigram mix vs the reference, in exact integer
  * micro-units (the q108 convention). */
case class WindowJs(window_start_us: Long, n_tokens: Long, js2_micro: Long)

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

  /** LIVE lexical drift — the streaming counterpart of
    * [[graft.operators.CorpusStats.sourceJsDivergence]]: per event-time
    * tumbling window, the window's hashed-unigram bucket distribution
    * is scored against a FIXED reference distribution (the training-
    * corpus mix) as 2·JS in integer micro-units, emitted exactly once
    * when the watermark closes the window.
    *
    * Same math as the batch op — per-bucket term2 = p·ln(p/m) +
    * q·ln(q/m), m = (p+q)/2, zero-mass side contributes 0, ⌊1e6·term⌋
    * summed as exact integers — so a reference whose shares are the
    * batch op's own c_b/n_tot double ratios reproduces the batch
    * micro-values bit-for-bit (identical double-op order). Unlike the
    * PSI gate, a NOVEL bucket (observed, absent from the reference) is
    * legal: its mass lands as p·ln 2 — JS is defined on disjoint
    * support, and "the stream speaks words the corpus never did" is
    * precisely the drift to surface, not an error.
    *
    * State per open window = one Map[bucket → count] (≤ `buckets`
    * entries — monitoring-sized); closed windows remove their state;
    * the md5 bucketing runs as a codegen column BEFORE the stateful
    * operator, so state never sees token strings. */
  def windowedTokenJs(df: DataFrame, textCol: String, tsCol: String,
                      windowLen: String, windowMillis: Long, delay: String,
                      reference: Map[Int, Double],
                      buckets: Int = 1024): Dataset[WindowJs] = {
    require(buckets > 0 && reference.nonEmpty &&
      reference.values.forall(_ > 0.0) && reference.keys.forall(b => b >= 0 && b < buckets),
      "reference must assign positive shares to in-range buckets")
    implicit val outEnc: Encoder[WindowJs] = Encoders.product[WindowJs]
    implicit val stateEnc: Encoder[Map[Int, Long]] =
      Encoders.kryo[Map[Int, Long]]
    implicit val rowEnc: Encoder[(java.sql.Timestamp, Int, java.sql.Timestamp)] =
      Encoders.product[(java.sql.Timestamp, Int, java.sql.Timestamp)]
    val bucket = (conv(substring(md5(col("__tok").cast("binary")), 1, 8), 16, 10)
      .cast("long") % buckets).cast("int")
    val winRows = df
      .withWatermark(tsCol, delay)
      .select(col(tsCol), explode(graft.functions.TextAnalysis.tokens(col(textCol))).as("__tok"))
      .select(window(col(tsCol), windowLen).getField("start").as("_1"),
        bucket.as("_2"), col(tsCol).as("_3"))
      .as[(java.sql.Timestamp, Int, java.sql.Timestamp)]
    winRows.groupByKey(_._1.getTime)(Encoders.scalaLong)
      .flatMapGroupsWithState[Map[Int, Long], WindowJs](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (wsMs: Long, rows: Iterator[(java.sql.Timestamp, Int, java.sql.Timestamp)],
         state: GroupState[Map[Int, Long]]) =>
          if (state.hasTimedOut) {
            val counts = state.getOption.getOrElse(Map.empty[Int, Long])
            state.remove()
            val tot = counts.values.sum
            val support = (counts.keySet ++ reference.keySet).toSeq.sorted
            val js2 = support.map { b =>
              val p = if (tot == 0) 0.0
                      else counts.getOrElse(b, 0L).toDouble / tot.toDouble
              val q = reference.getOrElse(b, 0.0)
              val m = (p + q) / 2.0
              val term2 = (if (p > 0) p * math.log(p / m) else 0.0) +
                (if (q > 0) q * math.log(q / m) else 0.0)
              math.floor(1e6 * term2).toLong
            }.sum
            Iterator.single(WindowJs(wsMs * 1000L, tot, js2))
          } else {
            val counts = rows.foldLeft(state.getOption.getOrElse(Map.empty[Int, Long])) {
              case (m, (_, b, _)) => m.updated(b, m.getOrElse(b, 0L) + 1L)
            }
            state.update(counts)
            // watermark-driven firing; same sub-watermark guard as the
            // PSI gate (a timeout ≤ watermark kills the query)
            state.setTimeoutTimestamp(
              math.max(wsMs + windowMillis, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  /** LIVE burst monitoring — the streaming twin of
    * [[graft.operators.WindowOps.burstWindows]]: per event-time
    * tumbling window and type, the count is flagged against a FIXED
    * baseline's moments (yesterday's windows, computed batch-side by
    * [[graft.operators.WindowOps.burstMoments]]) with the same
    * division-free exact z-test — (c·W − S)² > z²·(W·Sq − S²) ∧ c·W > S
    * — so the live flag and a batch replay over the same events agree
    * bit-for-bit.
    *
    * No custom state: ONE windowed aggregation under the watermark
    * (append mode emits each (window, type) exactly once on close) and
    * a stateless broadcast join against the |types|-row baseline.
    * A type ABSENT from the baseline fails loudly (the repo's
    * fail-loudly contract — a silently unjudged burst is the one you
    * needed): `assert_true` kills the query naming the type.
    *
    * `baseline`: event_type → (n_windows, sum_n, sum_sq). Output:
    * (window_start_us, event_type, n_events, is_burst). */
  def windowedBursts(df: DataFrame, typeCol: String, tsCol: String,
                     windowLen: String, delay: String,
                     baseline: Map[String, (Long, Long, Long)],
                     z: Int = 3): DataFrame = {
    require(baseline.nonEmpty && z > 0)
    val spark = df.sparkSession
    import spark.implicits._
    val base = broadcast(
      baseline.toSeq.map { case (t, (w, s, sq)) => (t, w, s, sq) }
        .toDF("event_type", "__bw", "__bs", "__bsq"))
    val counts = df
      .withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), windowLen).as("__win"),
        col(typeCol).cast("string").as("event_type"))
      .agg(count(lit(1)).as("n_events"))
    val c = col("n_events").cast("decimal(38,0)")
    val bw = col("__bw").cast("decimal(38,0)")
    val bs = col("__bs").cast("decimal(38,0)")
    val bsq = col("__bsq").cast("decimal(38,0)")
    val lhs = c * bw - bs
    counts.join(base, Seq("event_type"), "left")
      .select(
        unix_micros(col("__win").getField("start")).as("window_start_us"),
        col("event_type"),
        col("n_events"),
        when(col("__bw").isNotNull,
          lhs * lhs > lit(z.toLong * z).cast("decimal(38,0)") *
            (bw * bsq - bs * bs) && c * bw > bs)
          .otherwise(coalesce(
            assert_true(col("__bw").isNotNull,
              concat(lit("windowedBursts: type without baseline moments: "),
                col("event_type"))).cast("boolean"),
            lit(false)))
          .as("is_burst"))
  }
}
