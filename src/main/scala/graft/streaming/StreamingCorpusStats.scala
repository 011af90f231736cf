package graft.streaming

import graft.operators.CorpusStats.KmvBuf
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One emitted row per (closed window, surviving counter). */
case class WindowHeavyHitter(window_start_us: Long, rank: Int, token: String,
                             mg_count: Long, n_rows: Long)

/** One emitted row per closed window. */
case class WindowDistinct(window_start_us: Long, n_rows: Long, n_kept: Long,
                          estimate: Double)

/** One emitted row per closed window. */
case class WindowHll(window_start_us: Long, n_rows: Long, v_zero: Long,
                     z_int: Long, est_hll: Long)

/** One emitted row per closed window: exact grid-quantiles of the
  * window's values in integer micro-units. */
case class WindowQuantiles(window_start_us: Long, n_rows: Long,
                           p50_micro: Long, p90_micro: Long, p99_micro: Long)

/** LIVE corpus statistics — streaming counterparts of the batch
  * [[graft.operators.CorpusStats]] sketches, following the
  * [[StreamingDrift]] shape: custom keyed state per OPEN event-time
  * window, watermark-driven exactly-once emission (EventTimeTimeout at
  * window end), closed windows remove their state.
  *
  * Why custom state: both sketches need sub-linear PER-WINDOW state
  * (k counters / k hashes) with merge-on-arrival semantics — a plain
  * windowed `groupBy(token)` would carry data-sized state (every
  * distinct token of the open windows) to produce a k-sized answer. */
object StreamingCorpusStats {

  /** Tumbling-window corpus data card — the NO-custom-state member of
    * the live monitoring family: per event-time window, doc count,
    * token mass, token-count range and mean quality, all ALGEBRAIC
    * aggregates over per-row codegen columns, so this is one native
    * watermarked windowed aggregation (append mode, exactly-once on
    * window close, state pruned by the watermark — nothing bespoke).
    * Quality aggregates as exact integer micro-units and the mean uses
    * the shifted intDiv half-up form — bit-identical to the batch
    * `CorpusStats.corpusCard` mean (asserted by the parity spec).
    * The batch card's n_dup_docs is deliberately absent: it needs a
    * count-distinct of the fingerprint, which append-mode streaming
    * can't chain under a windowed aggregate — run the batch card (or
    * [[windowedKmvDistinct]] on the fingerprint) for dup monitoring. */
  def windowedCorpusCard(df: DataFrame, textCol: String, tsCol: String,
                         windowLen: String, delay: String): DataFrame = {
    import graft.expressions.HashExpressions.intDiv
    import graft.functions.TextAnalysis
    val toks = TextAnalysis.tokenCount(col(textCol)).cast("long")
    val sq = sum(TextAnalysis.qualityMicro(col(textCol)))
    val n = count(lit(1))
    df.withWatermark(tsCol, delay)
      .groupBy(window(col(tsCol), windowLen))
      .agg(
        n.as("n_docs"),
        sum(toks).as("n_tokens"),
        min(toks).as("min_toks"),
        max(toks).as("max_toks"),
        (intDiv(sq * lit(2L) + n, n * lit(2L)).cast("double") / 1e6)
          .as("mean_quality"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("n_docs"), col("n_tokens"), col("min_toks"), col("max_toks"),
        col("mean_quality"))
  }

  /** Tumbling-window classifier-calibration monitor — the LIVE twin of
    * `Curation.calibrationBins`: per (event-time window, score bin),
    * doc count, mean hashed-classifier score and observed Gopher keep
    * rate, in the SAME exact half-up intDiv micro units as the batch
    * op (bit-identical per window, asserted by the parity spec). Feed
    * it the ingest stream and alert on |gap_micro| drift: a score the
    * rules stop agreeing with means the cheap gate is rotting.
    *
    * Like [[windowedCorpusCard]], this is all ALGEBRAIC aggregates
    * over per-row codegen kernels — one native watermarked windowed
    * aggregation, append mode, exactly-once on window close, state =
    * ≤ bins rows per open window, pruned by the watermark. */
  def windowedCalibration(df: DataFrame, textCol: String, tsCol: String,
                          windowLen: String, delay: String,
                          bins: Int = 10): DataFrame = {
    import graft.expressions.HashExpressions.intDiv
    import graft.functions.TextAnalysis
    val c = TextAnalysis.hashedClassifier(col(textCol))
    val g = TextAnalysis.gopherRules(col(textCol))
    val n = count(lit(1))
    df.withWatermark(tsCol, delay)
      .select(col(tsCol), c.getField("w_sum").as("__w"),
        c.getField("n_tokens").cast("long").as("__n"),
        g.getField("keep").as("__keep"))
      .withColumn("__s",
        intDiv((col("__w") + lit(500L) * col("__n")) * lit(2000000L)
            + lit(1000L) * col("__n"),
          lit(2000L) * col("__n")))
      .withColumn("bin", intDiv(col("__s") * lit(bins.toLong), lit(1000001L)))
      .groupBy(window(col(tsCol), windowLen), col("bin"))
      .agg(n.as("n_docs"), sum("__s").as("__ssum"),
        sum(when(col("__keep"), 1L).otherwise(0L)).as("__keeps"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("bin"), col("n_docs"),
        intDiv(lit(2L) * col("__ssum") + col("n_docs"),
          lit(2L) * col("n_docs")).as("mean_score_micro"),
        intDiv(lit(2000000L) * col("__keeps") + col("n_docs"),
          lit(2L) * col("n_docs")).as("keep_rate_micro"))
      .withColumn("gap_micro", col("mean_score_micro") - col("keep_rate_micro"))
  }

  /** Tumbling-window Misra–Gries heavy hitters (Misra & Gries 1982):
    * at most `k` counters per open window; an arriving token
    * increments its counter, claims a free slot, or — when all `k`
    * slots are taken — decrements every counter (zeroed counters free
    * their slots). On window close the surviving counters emit ranked
    * by (count DESC, token ASC).
    *
    * Guarantee (the MG bound, asserted by the spec): for every token,
    * true_count − n_rows/(k+1) ≤ mg_count ≤ true_count — any token
    * with frequency above n/(k+1) is guaranteed a surviving counter.
    * The COUNTS are arrival-order-dependent (inherent to MG — state
    * merge is not commutative beyond the bound), so downstream logic
    * must rely on the bound, not on exact values; the batch exact
    * counterpart is `CorpusStats.heavyHitterTokens` (q42).
    *
    * State per open window: ≤ k (token, count) pairs + one row count —
    * monitoring-sized, never data-sized. */
  def windowedHeavyHitters(df: DataFrame, tokenCol: String, tsCol: String,
                           windowLen: String, windowMillis: Long,
                           delay: String, k: Int): Dataset[WindowHeavyHitter] = {
    require(k >= 1)
    implicit val outEnc: Encoder[WindowHeavyHitter] =
      Encoders.product[WindowHeavyHitter]
    implicit val stateEnc: Encoder[(Map[String, Long], Long)] =
      Encoders.kryo[(Map[String, Long], Long)]
    implicit val rowEnc: Encoder[(java.sql.Timestamp, String, java.sql.Timestamp)] =
      Encoders.product[(java.sql.Timestamp, String, java.sql.Timestamp)]
    // the WATERMARKED event-time column itself must survive into the
    // stateful operator (EventTimeTimeout resolves the watermark from
    // its tag; `window(...).start` does NOT inherit it) — the raw
    // tsCol rides along as _3, unused by the state function
    val winRows = df
      .withWatermark(tsCol, delay)
      .select(window(col(tsCol), windowLen).getField("start").as("_1"),
        col(tokenCol).cast("string").as("_2"),
        col(tsCol).as("_3"))
      .as[(java.sql.Timestamp, String, java.sql.Timestamp)]
    winRows.groupByKey(_._1.getTime)(Encoders.scalaLong)
      .flatMapGroupsWithState[(Map[String, Long], Long), WindowHeavyHitter](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (wsMs: Long, rows: Iterator[(java.sql.Timestamp, String, java.sql.Timestamp)],
         state: GroupState[(Map[String, Long], Long)]) =>
          if (state.hasTimedOut) {
            val (counters, nRows) = state.getOption.getOrElse((Map.empty[String, Long], 0L))
            state.remove()
            counters.toSeq.sortBy { case (tok, c) => (-c, tok) }.zipWithIndex
              .map { case ((tok, c), i) =>
                WindowHeavyHitter(wsMs * 1000L, i + 1, tok, c, nRows)
              }.iterator
          } else {
            var (counters, nRows) = state.getOption.getOrElse((Map.empty[String, Long], 0L))
            rows.foreach { case (_, tok, _) =>
              nRows += 1L
              counters.get(tok) match {
                case Some(c) => counters = counters.updated(tok, c + 1L)
                case None if counters.size < k => counters = counters.updated(tok, 1L)
                case None => // decrement-all; zeroed counters free their slot
                  counters = counters.view.mapValues(_ - 1L).filter(_._2 > 0L).toMap
              }
            }
            state.update((counters, nRows))
            state.setTimeoutTimestamp(
              math.max(wsMs + windowMillis, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  /** Tumbling-window KMV distinct-count estimate — the streaming twin
    * of `CorpusStats.kmvDistinctGrams` (q52): per open window the
    * ≤ k smallest DISTINCT md5-48 hashes of the value column
    * ([[KmvBuf]], whose insert/merge is COMMUTATIVE — unlike
    * Misra–Gries, the emitted estimate is independent of arrival
    * order and partitioning), estimate = (k−1)·2⁴⁸/h_k, exact when
    * fewer than k distinct values were seen.
    *
    * The hash is computed as a COLUMN expression before the stateful
    * operator (codegen, engine-portable md5), so state never sees raw
    * values: per-window state is ≤ k longs + one row count. */
  def windowedKmvDistinct(df: DataFrame, valueCol: String, tsCol: String,
                          windowLen: String, windowMillis: Long,
                          delay: String, k: Int): Dataset[WindowDistinct] = {
    require(k >= 2)
    implicit val outEnc: Encoder[WindowDistinct] = Encoders.product[WindowDistinct]
    implicit val stateEnc: Encoder[(KmvBuf, Long)] = Encoders.kryo[(KmvBuf, Long)]
    implicit val rowEnc: Encoder[(java.sql.Timestamp, Long, java.sql.Timestamp)] =
      Encoders.product[(java.sql.Timestamp, Long, java.sql.Timestamp)]
    val h48 = conv(substring(md5(col(valueCol).cast("string").cast("binary")), 1, 12),
      16, 10).cast("long")
    // raw tsCol rides along as _3 to carry the watermark tag (see
    // windowedHeavyHitters)
    val winRows = df
      .withWatermark(tsCol, delay)
      .select(window(col(tsCol), windowLen).getField("start").as("_1"),
        h48.as("_2"),
        col(tsCol).as("_3"))
      .as[(java.sql.Timestamp, Long, java.sql.Timestamp)]
    winRows.groupByKey(_._1.getTime)(Encoders.scalaLong)
      .flatMapGroupsWithState[(KmvBuf, Long), WindowDistinct](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (wsMs: Long, rows: Iterator[(java.sql.Timestamp, Long, java.sql.Timestamp)],
         state: GroupState[(KmvBuf, Long)]) =>
          if (state.hasTimedOut) {
            val (buf, nRows) = state.getOption.getOrElse((KmvBuf(k, Nil), 0L))
            state.remove()
            // the ONE estimator implementation — batch (q52), this
            // window close, and the spec all agree by construction
            val (kept, est) =
              new graft.operators.CorpusStats.KmvDistinct(k).finish(buf)
            Iterator.single(WindowDistinct(wsMs * 1000L, nRows, kept, est))
          } else {
            var (buf, nRows) = state.getOption.getOrElse((KmvBuf(k, Nil), 0L))
            rows.foreach { case (_, h, _) => buf = buf.insert(h); nRows += 1L }
            state.update((buf, nRows))
            state.setTimeoutTimestamp(
              math.max(wsMs + windowMillis, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  /** Tumbling-window HLL distinct-count estimate — the streaming twin
    * of `CorpusStats.hllDistinctTokens` (q144) and the CONSTANT-state
    * alternative to [[windowedKmvDistinct]]: per open window exactly
    * 64 one-byte registers whatever the precision target, max-merged
    * on arrival. Register updates are commutative AND idempotent, so
    * the emitted estimate is independent of arrival order,
    * partitioning and duplicate delivery (KMV's insert is commutative
    * but its buffer is k-bounded; HLL's state bound is unconditional).
    *
    * The hash is the same portable md5-48 COLUMN expression before
    * the stateful operator (state never sees raw values), and the
    * window close calls `CorpusStats.hllEstimate` — the ONE estimator
    * implementation shared with the batch op and the spec's replay. */
  def windowedHllDistinct(df: DataFrame, valueCol: String, tsCol: String,
                          windowLen: String, windowMillis: Long,
                          delay: String): Dataset[WindowHll] = {
    implicit val outEnc: Encoder[WindowHll] = Encoders.product[WindowHll]
    implicit val stateEnc: Encoder[(Array[Int], Long)] =
      Encoders.kryo[(Array[Int], Long)]
    implicit val rowEnc: Encoder[(java.sql.Timestamp, Long, java.sql.Timestamp)] =
      Encoders.product[(java.sql.Timestamp, Long, java.sql.Timestamp)]
    val h48 = conv(substring(md5(col(valueCol).cast("string").cast("binary")), 1, 12),
      16, 10).cast("long")
    val winRows = df
      .withWatermark(tsCol, delay)
      .select(window(col(tsCol), windowLen).getField("start").as("_1"),
        h48.as("_2"),
        col(tsCol).as("_3"))
      .as[(java.sql.Timestamp, Long, java.sql.Timestamp)]
    winRows.groupByKey(_._1.getTime)(Encoders.scalaLong)
      .flatMapGroupsWithState[(Array[Int], Long), WindowHll](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (wsMs: Long, rows: Iterator[(java.sql.Timestamp, Long, java.sql.Timestamp)],
         state: GroupState[(Array[Int], Long)]) =>
          if (state.hasTimedOut) {
            val (regs, nRows) = state.getOption.getOrElse((new Array[Int](64), 0L))
            state.remove()
            val (vZero, zInt, est) = graft.operators.CorpusStats.hllEstimate(regs)
            Iterator.single(WindowHll(wsMs * 1000L, nRows, vZero, zInt, est))
          } else {
            val (regs0, n0) = state.getOption.getOrElse((new Array[Int](64), 0L))
            val regs = regs0.clone()
            var n = n0
            rows.foreach { case (_, h, _) =>
              n += 1L
              graft.operators.CorpusStats.hllObserve(regs, h)
            }
            state.update((regs, n))
            state.setTimeoutTimestamp(
              math.max(wsMs + windowMillis, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  /** Tumbling-window EXACT grid quantiles — the live value/latency
    * quantile monitor (p50/p90/p99 per closed window), the
    * deterministic alternative to a mergeable float sketch: the value
    * is snapped to the exact integer micro lattice as a COLUMN (a
    * DECIMAL(18,4) cast, so a 2-dp source column round-trips exactly),
    * per-window state is a micro→count histogram bounded by the
    * column's VALUE GRID (monitoring-sized for bounded metrics — a
    * 2-dp metric in [0,100) is ≤10k entries — never row-sized), and
    * the close computes each quantile by exact integer rank:
    * rank_p = ⌈p·n⌉ as (num·n + den − 1) div den, answer = smallest
    * micro with cumulative count ≥ rank_p. Integer in, integer out —
    * bit-portable across engines, no sketch error bar, emitted
    * exactly once per window (EventTimeTimeout, same shape as the
    * KMV/HLL monitors). */
  def windowedGridQuantiles(df: DataFrame, valueCol: String, tsCol: String,
                            windowLen: String, windowMillis: Long,
                            delay: String): Dataset[WindowQuantiles] = {
    implicit val outEnc: Encoder[WindowQuantiles] = Encoders.product[WindowQuantiles]
    implicit val stateEnc: Encoder[Map[Long, Long]] =
      Encoders.kryo[Map[Long, Long]]
    implicit val rowEnc: Encoder[(java.sql.Timestamp, Long, java.sql.Timestamp)] =
      Encoders.product[(java.sql.Timestamp, Long, java.sql.Timestamp)]
    val micro = (col(valueCol).cast("decimal(18,4)") * lit(1000000L))
      .cast("long")
    val winRows = df
      .withWatermark(tsCol, delay)
      .select(window(col(tsCol), windowLen).getField("start").as("_1"),
        micro.as("_2"), col(tsCol).as("_3"))
      .as[(java.sql.Timestamp, Long, java.sql.Timestamp)]
    winRows.groupByKey(_._1.getTime)(Encoders.scalaLong)
      .flatMapGroupsWithState[Map[Long, Long], WindowQuantiles](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (wsMs: Long, rows: Iterator[(java.sql.Timestamp, Long, java.sql.Timestamp)],
         state: GroupState[Map[Long, Long]]) =>
          if (state.hasTimedOut) {
            val hist = state.getOption.getOrElse(Map.empty[Long, Long])
            state.remove()
            val n = hist.values.sum
            val sorted = hist.toSeq.sortBy(_._1)
            def q(num: Long, den: Long): Long = {
              val rank = (num * n + den - 1) / den // ⌈num·n/den⌉, exact
              var cum = 0L
              sorted.find { case (_, c) => cum += c; cum >= rank }
                .map(_._1).getOrElse(sorted.last._1)
            }
            Iterator.single(WindowQuantiles(wsMs * 1000L, n,
              q(1, 2), q(9, 10), q(99, 100)))
          } else {
            val hist = rows.foldLeft(state.getOption.getOrElse(Map.empty[Long, Long])) {
              case (m, (_, v, _)) => m.updated(v, m.getOrElse(v, 0L) + 1L)
            }
            state.update(hist)
            state.setTimeoutTimestamp(
              math.max(wsMs + windowMillis, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  /** Tumbling-window embedding-norm profile — the LIVE twin of the
    * q133 batch outlier audit's moment frame
    * ([[graft.operators.Similarity.embeddingOutlierProfile]]): per
    * event-time window, vector count, zero-vector count, and the EXACT
    * integer micro moments of ‖v‖ (norm floor-snaps to micro; mean is
    * the half-up intDiv form on non-negative micros; var =
    * max(0, E[x²] − mean²), Σx² in DECIMAL(38,0)) — bit-identical per
    * window to the batch formulas (asserted by the parity spec). An
    * encoder that starts emitting zero vectors or a norm-mean
    * excursion shows up one window after it happens, not at the next
    * batch audit.
    *
    * Per-row FLAGS stay batch-side: a window's own μ/σ aren't known
    * until it closes, so a streaming gate thresholds the NEXT window
    * against this frame (the [[StreamingDrift]] bounds-broadcast
    * pattern). All aggregates are algebraic → one native watermarked
    * windowed aggregation, append mode, state = one moment row per
    * open window, pruned by the watermark. */
  def windowedNormProfile(df: DataFrame, vecCol: String, tsCol: String,
                          windowLen: String, delay: String): DataFrame = {
    import graft.expressions.HashExpressions.intDiv
    import graft.expressions.VectorExpressions.vecNorm
    val dec = "decimal(38,0)"
    val n = count(lit(1))
    df.withWatermark(tsCol, delay)
      .select(col(tsCol),
        floor(vecNorm(col(vecCol)) * lit(1e6)).cast("long").as("__nm"))
      .groupBy(window(col(tsCol), windowLen))
      .agg(n.as("n_vecs"),
        sum(when(col("__nm") === 0L, 1L).otherwise(0L)).as("n_zero"),
        sum("__nm").as("__s"),
        sum(col("__nm").cast(dec) * col("__nm").cast(dec)).as("__s2"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("n_vecs"), col("n_zero"),
        intDiv(lit(2L) * col("__s") + col("n_vecs"),
          lit(2L) * col("n_vecs")).cast("long").as("mean_micro"),
        greatest(lit(0L),
          intDiv(lit(2L) * col("__s2") + col("n_vecs").cast(dec),
            lit(2L) * col("n_vecs").cast(dec)).cast("long")
            - intDiv(lit(2L) * col("__s") + col("n_vecs"),
              lit(2L) * col("n_vecs")).cast("long")
              * intDiv(lit(2L) * col("__s") + col("n_vecs"),
                lit(2L) * col("n_vecs")).cast("long")).as("var_micro2"))
  }
}
