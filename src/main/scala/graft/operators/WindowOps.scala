package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Window shapes beyond Spark's built-in tumble/hop/session: the
  * CUMULATE TVF from the reference's dialect (lab-time scope, SURVEY.md
  * §2.3) — windows share a start aligned to `maxSize` and grow by
  * `step` until they cover `maxSize`:
  *
  *   [T0, T0+step), [T0, T0+2·step), ..., [T0, T0+maxSize)
  *
  * Lowered to an explode over the (maxSize/step) expansions each row
  * belongs to + a normal groupBy — stateless row-local expansion, one
  * shuffle on (window_start, window_end), streaming-compatible when a
  * watermark is present on `tsCol`.
  */
object WindowOps {

  /** Adds `window_start_us` / `window_end_us` (epoch micros) columns,
    * one output row per cumulate expansion containing the row. */
  def cumulate(df: DataFrame, tsCol: String, maxSizeMicros: Long,
               stepMicros: Long): DataFrame = {
    require(maxSizeMicros % stepMicros == 0, "step must divide maxSize")
    val steps = (maxSizeMicros / stepMicros).toInt
    val tsUs: Column = unix_micros(col(tsCol))
    val ws = expr(s"unix_micros($tsCol) div ${maxSizeMicros}L") * maxSizeMicros
    df.withColumn("window_start_us", ws)
      .withColumn("__k", explode(sequence(lit(1), lit(steps))))
      .withColumn("window_end_us",
        col("window_start_us") + col("__k").cast("long") * stepMicros)
      .where(tsUs < col("window_end_us"))
      .drop("__k")
  }

  /** Tumbling-window burst detection per event type — the rate-spike
    * alarm an ingestion pipeline runs over its own telemetry (a crawler
    * gone hot, a retry storm, a bot flood): a window is a burst when
    * its count exceeds the type's mean by `z` standard deviations,
    * decided ENTIRELY in exact integer arithmetic — the z-test
    * c > μ + z·σ is algebraically cleared of divisions to
    *
    *   (c·W − S)² > z²·(W·Sq − S²)   ∧   c·W > S
    *
    * (W = windows for the type, S = Σc, Sq = Σc², population σ), so
    * there is no float boundary two engines could bracket differently.
    * mean_micro is the shifted half-up intDiv report column.
    *
    * Scale shape: one (type, window) combinable count shuffle; the
    * per-type moment frame (|types| rows, DECIMAL(38,0) exact — Sq
    * sums c² so long would overflow first) BROADCASTS back onto the
    * window frame; flags are stateless integer comparisons. Windows
    * with zero events contribute nothing (W counts OCCUPIED windows —
    * the gap-free variant would densify against the time axis first).
    * Output: (event_type, window_start_us, n_events, mean_micro,
    * is_burst). */
  def burstWindows(events: DataFrame, typeCol: String, tsCol: String,
                   windowMicros: Long, z: Int = 3): DataFrame = {
    require(windowMicros > 0 && z > 0)
    import graft.expressions.HashExpressions.intDiv
    val win = events
      .select(col(typeCol).as("event_type"),
        expr(s"unix_micros($tsCol) div ${windowMicros}L").as("__w"))
      .groupBy("event_type", "__w").agg(count(lit(1)).as("n_events"))
      .cache()
    val stats = win.groupBy("event_type").agg(
      count(lit(1)).cast("decimal(38,0)").as("__wn"),
      sum("n_events").cast("decimal(38,0)").as("__S"),
      sum(col("n_events").cast("decimal(38,0)") * col("n_events")).as("__Sq"))
    val c = col("n_events").cast("decimal(38,0)")
    val lhs = (c * col("__wn") - col("__S"))
    CacheScope.scoped(
      win.join(broadcast(stats), "event_type")
        .select(col("event_type"),
          (col("__w") * windowMicros).as("window_start_us"),
          col("n_events"),
          intDiv(lit(2L) * col("__S").cast("long") * 1000000L + col("__wn").cast("long"),
            lit(2L) * col("__wn").cast("long")).as("mean_micro"),
          (lhs * lhs > lit(z).cast("decimal(38,0)") * lit(z) *
            (col("__wn") * col("__Sq") - col("__S") * col("__S")) &&
            c * col("__wn") > col("__S")).as("is_burst")),
      win)
  }

  /** The per-type burst baseline MOMENTS frame — (event_type,
    * n_windows, sum_n, sum_sq) over occupied tumbling windows, the
    * [[burstWindows]] statistics exposed for the STREAMING gate
    * ([[graft.streaming.StreamingDrift.windowedBursts]]): batch
    * computes yesterday's moments once, the live stream flags against
    * them. |types|-row output (collect-safe by construction). */
  def burstMoments(events: DataFrame, typeCol: String, tsCol: String,
                   windowMicros: Long): DataFrame = {
    require(windowMicros > 0)
    events
      .select(col(typeCol).as("event_type"),
        expr(s"unix_micros($tsCol) div ${windowMicros}L").as("__w"))
      .groupBy("event_type", "__w").agg(count(lit(1)).as("__n"))
      .groupBy("event_type").agg(
        count(lit(1)).as("n_windows"),
        sum("__n").as("sum_n"),
        sum(col("__n").cast("decimal(38,0)") * col("__n"))
          .cast("decimal(38,0)").as("sum_sq"))
  }

  /** Tumbling-window dedup: the FIRST row per (keys, window) by
    * (tsCol, tieCol), plus how many duplicates the window suppressed —
    * time-bounded duplicate suppression (retry storms, at-least-once
    * ingestion) where whole-stream dedup ([[graft.operators.ChangelogOps.firstByKey]])
    * would hold state forever. Same plan discipline as the S1/S3 upsert:
    * ONE map-combinable `min_by(struct)` aggregation — no rank window,
    * no per-partition sort. The streaming twin is
    * `StreamOps.dedupWithinWatermark` (native
    * `dropDuplicatesWithinWatermark`, state pruned by the watermark). */
  /** Conversion funnel over an event stream: of the users whose FIRST
    * `fromType` event exists, how many produced a `toType` event within
    * `withinMicros` of it, and how fast. The product-analytics
    * staple (signup→activation, click→purchase) — and the shape is two
    * filtered pre-aggregations meeting in ONE user-key equi-join, so
    * neither event type is ever scanned twice nor joined row-to-row
    * before aggregation. Delay stats are exact integer micros; the
    * rate and mean delay are rounded 6dp. Output: one summary row
    * (n_from_users, n_converted, conv_rate, avg_delay_us_of
    * converted users, min_delay_us). */
  def conversionWithin(events: DataFrame, userCol: String, typeCol: String,
                       tsCol: String, fromType: String, toType: String,
                       withinMicros: Long): DataFrame = {
    val from = events.where(col(typeCol) === fromType)
      .groupBy(col(userCol))
      .agg(min(unix_micros(col(tsCol))).as("from_us"))
    val to = events.where(col(typeCol) === toType)
      .select(col(userCol), unix_micros(col(tsCol)).as("to_us"))
    val conv = from.join(to, Seq(userCol))
      .where(col("to_us") >= col("from_us") &&
        col("to_us") <= col("from_us") + withinMicros)
      .groupBy(col(userCol))
      .agg(min(col("to_us") - col("from_us")).as("delay_us"))
    // guard the zero denominators (no from-events / no conversions) —
    // ANSI mode turns them into DIVIDE_BY_ZERO errors, not NaN/null
    from.join(conv, Seq(userCol), "left")
      .agg(count(lit(1)).as("n_from_users"),
        count(col("delay_us")).as("n_converted"),
        round(when(count(lit(1)) === 0, lit(0.0))
          .otherwise(count(col("delay_us")).cast("double") / count(lit(1)).cast("double")), 6)
          .as("conv_rate"),
        round(when(count(col("delay_us")) === 0, lit(null).cast("double"))
          .otherwise(sum(col("delay_us")).cast("double") / count(col("delay_us")).cast("double")), 6)
          .as("avg_delay_us"),
        min(col("delay_us")).as("min_delay_us"))
  }

  /** Per-session behavioral feature extraction — the featurization pass
    * that turns a raw event stream into one training example per
    * (user, session): gap-based sessions (the q09/SURVEY §2.3 session
    * semantics) carrying the features a ranking/propensity model
    * consumes — intensity (n_events, span), health (error count and
    * rate), breadth (distinct event types) and value mass.
    *
    * Error rate is the exact-integer half-up micro ratio (CLAUDE.md
    * rule); the value sum goes through DECIMAL (the money rule); span
    * is exact epoch-micros arithmetic.
    *
    * Scale shape: ONE `session_window` aggregation — Spark's native
    * session merge, shuffle keyed on the user, map-side partials, no
    * rank window, no self-join; COUNT(DISTINCT type) rewrites to the
    * standard expand (bounded: the type domain is small). Streaming
    * twin: the same groupBy under a watermark. Output: (user,
    * session_start_us, n_events, span_us, n_errors, error_micro,
    * n_types, sum_value). */
  def sessionFeatures(events: DataFrame, userCol: String, tsCol: String,
                      typeCol: String, valueCol: String,
                      gap: String = "30 minutes",
                      errorType: String = "error"): DataFrame = {
    import graft.expressions.HashExpressions.intDiv
    events
      .groupBy(session_window(col(tsCol), gap), col(userCol))
      .agg(count(lit(1)).as("n_events"),
        min(unix_micros(col(tsCol))).as("__first_us"),
        max(unix_micros(col(tsCol))).as("__last_us"),
        sum(when(col(typeCol) === errorType, 1L).otherwise(0L)).as("n_errors"),
        countDistinct(col(typeCol)).as("n_types"),
        sum(col(valueCol).cast("decimal(18,4)")).cast("double").as("sum_value"))
      .select(col(userCol),
        unix_micros(col("session_window.start")).as("session_start_us"),
        col("n_events"),
        (col("__last_us") - col("__first_us")).as("span_us"),
        col("n_errors"),
        intDiv(lit(2L) * col("n_errors") * 1000000L + col("n_events"),
          lit(2L) * col("n_events")).cast("long").as("error_micro"),
        col("n_types"), col("sum_value"))
  }

  def windowedDedupFirst(df: DataFrame, tsCol: String, tieCol: String,
                         keys: Seq[String], windowMicros: Long,
                         valueCols: Seq[String]): DataFrame = {
    val ws = expr(s"unix_micros($tsCol) div ${windowMicros}L") * windowMicros
    val payload = struct((Seq(tsCol, tieCol) ++ valueCols).map(col): _*)
    val order = struct(col(tsCol), col(tieCol))
    df.withColumn("window_start_us", ws)
      .groupBy((keys.map(col) :+ col("window_start_us")): _*)
      .agg(min_by(payload, order).as("__first"), count(lit(1)).as("n_rows"))
      .select((keys.map(col) :+ col("window_start_us")) ++
        Seq(unix_micros(col(s"__first.$tsCol")).as("first_ts_us"),
          col(s"__first.$tieCol").as(s"first_$tieCol")) ++
        valueCols.map(c => col(s"__first.$c").as(s"first_$c")) :+
        (col("n_rows") - 1).as("n_dups"): _*)
  }

  /** N-step sequential funnel — the generalization of
    * [[conversionWithin]]'s two-step form: a user reaches step k when
    * an event of step k's type occurs STRICTLY AFTER the timestamp at
    * which they reached step k−1 (the "first view, then first click
    * after that view, then first purchase after that click" sequential
    * semantics — a purchase BEFORE the click does not count, which a
    * per-type min-timestamp pivot would get wrong).
    *
    * Exact epoch-micros comparisons end-to-end; step-over-step and
    * overall conversion in shifted half-up micro (CLAUDE.md rule).
    *
    * Scale shape: every reach timestamp m_k is a conditional min over
    * the SAME user-key window — Spark plans ONE hashpartitioning
    * exchange and chains the Window operators on it (no self-joins, no
    * per-step scan); the per-user frame folds to one row per step via
    * a `stack` on the |steps|-row summary, and the only rank-free
    * single-partition window runs on that ≤|steps|-row frame.
    * Output: (step, event_type, n_users, from_prev_micro,
    * from_first_micro). */
  def funnelSteps(events: DataFrame, userCol: String, typeCol: String,
                  tsCol: String, steps: Seq[String]): DataFrame = {
    import graft.expressions.HashExpressions.intDiv
    import org.apache.spark.sql.expressions.Window
    require(steps.nonEmpty)
    val w = Window.partitionBy("__u")
    var df = events.select(col(userCol).as("__u"), col(typeCol).as("__t"),
      unix_micros(col(tsCol)).as("__us"))
    steps.zipWithIndex.foreach { case (st, i) =>
      val reached = if (i == 0) col("__t") === st
        else col("__t") === st && col("__us") > col(s"__m${i - 1}")
      df = df.withColumn(s"__m$i", min(when(reached, col("__us"))).over(w))
    }
    val perUser = df.groupBy("__u")
      .agg(max(col("__m0")).as("__m0"),
        steps.indices.drop(1).map(i => max(col(s"__m$i")).as(s"__m$i")): _*)
    // coalesce: a global sum over ZERO rows is one all-NULL row — the
    // empty-events funnel must report n_users = 0, not NULL (oracle
    // count() semantics). Typed lit() columns (not interpolated SQL)
    // so a step name containing a quote can't break the plan.
    val counts = perUser.select(
      steps.indices.map(i =>
        coalesce(sum(when(col(s"__m$i").isNotNull, 1L).otherwise(0L)),
          lit(0L)).as(s"__n$i")): _*)
    val stackArgs = steps.indices.flatMap(i =>
      Seq(lit(i.toLong), lit(steps(i)), col(s"__n$i")))
    val stacked = counts.select(
      stack((lit(steps.size) +: stackArgs): _*)
        .as(Seq("step", "event_type", "n_users")),
      col("__n0").as("__first"))
    val wStep = Window.partitionBy().orderBy("step")
      .rowsBetween(Window.unboundedPreceding, -1)
    // the lag window sees |steps| rows — bounded by the parameter list
    stacked
      .withColumn("__prev", last("n_users").over(wStep))
      .select(col("step"), col("event_type"), col("n_users"),
        when(col("__prev") > 0L,
          intDiv(lit(2L) * col("n_users") * 1000000L + col("__prev"),
            lit(2L) * col("__prev")).cast("long")).as("from_prev_micro"),
        when(col("__first") > 0L,
          intDiv(lit(2L) * col("n_users") * 1000000L + col("__first"),
            lit(2L) * col("__first")).cast("long")).as("from_first_micro"))
  }
}
