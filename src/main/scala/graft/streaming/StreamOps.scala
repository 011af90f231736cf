package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming forms of the reference's dynamic-table operators
  * (SURVEY.md §1.1): zero-delay watermarks (S9/S10), upsert
  * materialization (S1/S3), dedup, windowed aggregation (lab-time), and
  * the interval join (lab-joins). Batch forms live in
  * `graft.operators.ChangelogOps`; the stream-vs-batch differential spec
  * asserts they agree — the "dynamic table = table" contract the course
  * teaches.
  *
  * State scale: every stateful op here keys its state by the same
  * column the shuffle keys on, so state is sharded across executors by
  * the exchange; per-key state is O(1) (latest row) or O(versions)
  * (temporal join history) — no operator holds unbounded per-key state.
  */
object StreamOps {

  /** `WATERMARK FOR ts AS ts` (reference `terraform/lab-joins/main.tf:
    * 531,564`): zero tolerance — rows later than the max seen event
    * time are dropped by the stateful operators downstream. */
  def withZeroDelayWatermark(df: DataFrame, tsCol: String): DataFrame =
    df.withWatermark(tsCol, "0 seconds")

  /** Streaming upsert materialization (latest row per key) in update
    * mode, as `PRIMARY KEY ... NOT ENFORCED` tables materialize.
    * Emits the new latest row whenever a key's latest changes.
    * State = exactly one row per key. */
  def latestByKey[K: Encoder, T: Encoder](ds: Dataset[T], key: T => K,
                                          newer: (T, T) => Boolean): Dataset[T] = {
    ds.groupByKey(key)
      .flatMapGroupsWithState[T, T](OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (_: K, rows: Iterator[T], state: GroupState[T]) =>
          var cur = state.getOption
          var changed = false
          rows.foreach { r =>
            if (cur.forall(c => newer(r, c))) { cur = Some(r); changed = true }
          }
          cur.filter(_ => changed).foreach(state.update)
          if (changed) Iterator.single(cur.get) else Iterator.empty
      }
  }

  /** Streaming dedup, first row per key (Flink `ROW_NUMBER()=1` dedup):
    * native `dropDuplicates` — state expires with the watermark when
    * the key includes an event-time bound. */
  def firstPerKey(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.dropDuplicates(keyCols)

  /** Streaming token-budget admission gate — the LIVE-ingest analog of
    * `Sampling.tokenBudgetMix`: each domain carries a running admitted-
    * token total in keyed state; a document is admitted iff the total
    * plus its tokens stays within `budgetTokens` (greedy skip-and-
    * continue: an over-size doc is rejected but later smaller docs may
    * still fit). State per domain = ONE long, sharded by the group-by
    * exchange. Emits every doc once with its verdict (append mode).
    *
    * Ordering contract: verdicts depend on arrival order WITHIN a
    * micro-batch per domain (the iterator order of the shuffled group);
    * cross-batch order is the trigger order. Deterministic replay needs
    * a deterministic source order — the same caveat every first-come
    * admission policy carries. */
  def tokenBudgetGate(ds: Dataset[BudgetDoc], budgetTokens: Long): Dataset[BudgetVerdict] = {
    implicit val verdictEnc: Encoder[BudgetVerdict] = Encoders.product[BudgetVerdict]
    implicit val stateEnc: Encoder[Long] = Encoders.scalaLong
    ds.groupByKey(_.domain)(Encoders.STRING)
      .flatMapGroupsWithState[Long, BudgetVerdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (domain: String, rows: Iterator[BudgetDoc], state: GroupState[Long]) =>
          var total = state.getOption.getOrElse(0L)
          val out = rows.map { r =>
            val admit = total + r.n_tokens <= budgetTokens
            if (admit) total += r.n_tokens
            BudgetVerdict(domain, r.id, r.n_tokens, admit, total)
          }.toList // materialize BEFORE the state update below runs
          state.update(total)
          out.iterator
      }
  }

  /** Time-bounded streaming dedup: suppress key repeats arriving within
    * the watermark delay of the first occurrence — the
    * at-least-once-ingest guard whose state is PRUNED as the watermark
    * advances (unbounded `dropDuplicates` state grows with the key
    * cardinality forever). Native `dropDuplicatesWithinWatermark`; the
    * batch analog over closed windows is
    * [[graft.operators.WindowOps.windowedDedupFirst]]. */
  def dedupWithinWatermark(df: DataFrame, keyCols: Seq[String],
                           tsCol: String, delay: String): DataFrame =
    df.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark(keyCols)

  /** Tumbling/hopping event-time window aggregation (lab-time). */
  def windowedCounts(df: DataFrame, tsCol: String, windowLen: String,
                     slide: Option[String], groupCols: Seq[String]): DataFrame = {
    val w = slide.map(s => window(col(tsCol), windowLen, s))
      .getOrElse(window(col(tsCol), windowLen))
    df.groupBy((w +: groupCols.map(col)): _*)
      .agg(count(lit(1)).as("n_events"))
      .select((Seq(col("window.start").as("window_start"),
        col("window.end").as("window_end")) ++ groupCols.map(col) :+ col("n_events")): _*)
  }

  /** Stream-stream interval join (SURVEY.md §2.3: order ↔ preceding
    * clicks): native Spark time-range join; both sides watermarked so
    * join state is pruned to the interval width.
    *
    * `joinType` supports the outer forms (`left_outer` etc.): an
    * unmatched outer row emits NULL-padded only when the watermark
    * proves no match can still arrive — the Flink interval-outer-join
    * contract, state-evicted, never buffered indefinitely. */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
                   leftTs: String, rightTs: String,
                   lowerBound: String, upperBound: String,
                   joinType: String = "inner",
                   watermarkDelay: String = "0 seconds"): DataFrame = {
    // watermarkDelay: out-of-orderness tolerance on BOTH sides. The
    // ordered replay harness keeps the zero default exact; production
    // callers with disordered arrival pass a real delay, or late rows
    // are dropped — and in the outer forms a left row whose match WAS
    // in the data would emit NULL-padded (ADVICE r12).
    val l = left.withWatermark(leftTs, watermarkDelay).alias("l")
    val r = right.withWatermark(rightTs, watermarkDelay).alias("r")
    l.join(r,
      col(s"l.$keyCol") === col(s"r.$keyCol") &&
        col(s"r.$rightTs") >= col(s"l.$leftTs") - expr(s"INTERVAL $lowerBound") &&
        col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL $upperBound"),
      joinType)
  }

  /** Streaming Top-N per key (Flink `ROW_NUMBER() <= n` over a
    * changelog, SURVEY §2.3): bounded per-key heap in state; emits the
    * refreshed top list whenever it changes. Update-mode output — each
    * emission is the key's CURRENT top-n (retraction of the previous
    * list is implied, as in Flink's update stream). */
  def topNPerKey[K: Encoder, T: Encoder](ds: Dataset[T], key: T => K, n: Int,
                                         better: (T, T) => Boolean)(
      implicit listEnc: Encoder[List[T]], outEnc: Encoder[(K, List[T])]): Dataset[(K, List[T])] = {
    ds.groupByKey(key)
      .flatMapGroupsWithState[List[T], (K, List[T])](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (k: K, rows: Iterator[T], state: GroupState[List[T]]) =>
          val before = state.getOption.getOrElse(Nil)
          var top = before
          rows.foreach { r =>
            top = (r :: top).sortWith(better).take(n)
          }
          if (top != before) {
            state.update(top)
            Iterator.single((k, top))
          } else Iterator.empty
      }
  }

  /** PROCESSING-TIME temporal (versioned-table / as-of) join — the
    * reference's `FOR SYSTEM_TIME AS OF` setup (compacted dim topics +
    * watermarked fact stream, `terraform/lab-joins/main.tf:106,122,531`).
    * Spark has no built-in; this is the custom stateful co-process of
    * SURVEY §4.
    *
    * Both inputs are unioned (dim rows tagged), shuffled once on the
    * join key; per key the state holds the dim VERSION HISTORY (ts-sorted)
    * and each fact row is emitted with the latest dim version at-or-before
    * its event time. Facts are joined ON ARRIVAL: a dim version that
    * arrives in a LATER micro-batch than a fact it should have matched is
    * missed (Flink's processing-time temporal join has the same caveat).
    * For cross-batch event-time correctness use
    * [[temporalJoinEventTime]].
    *
    * `maxVersions` bounds per-key state (compaction analog).
    */
  def temporalJoin(facts: Dataset[TemporalRow], dims: Dataset[TemporalRow],
                   maxVersions: Int = 64): Dataset[TemporalMatch] = {
    import facts.sparkSession.implicits._
    temporalJoinTagged(
      facts.map(_.copy(isDim = false)).unionByName(dims.map(_.copy(isDim = true))),
      maxVersions)
  }

  /** [[temporalJoin]] over a PRE-TAGGED union (rows carry `isDim`) —
    * the single-source replay form. On an EVENT-TIME-ORDERED stream the
    * join-on-arrival semantics coincide with the event-time-correct
    * ones (every dim version a fact can need has already arrived), which
    * is what lets q207 share q200's batch AS-OF oracle. */
  def temporalJoinTagged(tagged: Dataset[TemporalRow],
                         maxVersions: Int = 64): Dataset[TemporalMatch] = {
    import tagged.sparkSession.implicits._
    tagged.groupByKey(_.key)
      .flatMapGroupsWithState[List[TemporalRow], TemporalMatch](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[TemporalRow], state: GroupState[List[TemporalRow]]) =>
          var versions = state.getOption.getOrElse(Nil) // newest-first
          val out = scala.collection.mutable.ArrayBuffer.empty[TemporalMatch]
          // process in event-time order within the batch for determinism
          rows.toSeq.sortBy(r => (r.tsMillis, !r.isDim)).foreach { r =>
            if (r.isDim) {
              versions = (r :: versions).sortBy(-_.tsMillis).take(maxVersions)
            } else {
              val m = versions.find(_.tsMillis <= r.tsMillis)
              out += TemporalMatch(key, r.id, r.tsMillis, m.map(_.id), m.map(_.payload))
            }
          }
          state.update(versions)
          out.iterator
      }
  }
  /** EVENT-TIME-correct temporal join (Flink's `FOR SYSTEM_TIME AS OF`
    * with event-time semantics): facts are BUFFERED in state until the
    * query watermark passes their event time, then joined against the
    * dim version that was valid AT their event time — so a dim version
    * arriving in a later micro-batch (but with an earlier event time)
    * is still matched correctly, PROVIDED it is within the watermark
    * tolerance. Emission is watermark-delayed, the price of correctness.
    *
    * `watermarkDelay` is the allowed out-of-orderness of the UNION of
    * both inputs (the fact and dim streams share the query watermark).
    * With the zero-delay default, a fact at time T immediately advances
    * the watermark to T and any dim version older than T arriving later
    * is LATE and dropped by Spark — the standard watermark contract; give
    * a real delay to tolerate cross-batch dim lateness.
    *
    * State per key = version history (≤ maxVersions) + pending facts
    * (bounded by watermark lag). Versions older than the newest version
    * at-or-before the watermark are pruned once no pending fact can need
    * them; quiet keys are flushed by an event-time timeout when the
    * watermark passes their oldest pending fact.
    */
  def temporalJoinEventTime(facts: Dataset[TemporalRow], dims: Dataset[TemporalRow],
                            maxVersions: Int = 64,
                            watermarkDelay: String = "0 seconds"): Dataset[TemporalMatch] = {
    import facts.sparkSession.implicits._
    temporalJoinEventTimeTagged(
      facts.map(_.copy(isDim = false)).unionByName(dims.map(_.copy(isDim = true))),
      maxVersions, watermarkDelay)
  }

  /** [[temporalJoinEventTime]] over a PRE-TAGGED union (rows carry their
    * own `isDim` flag) — the form a single replay/topic source feeds
    * without splitting into two streaming branches of one source. */
  def temporalJoinEventTimeTagged(tagged0: Dataset[TemporalRow],
                                  maxVersions: Int = 64,
                                  watermarkDelay: String = "0 seconds"): Dataset[TemporalMatch] = {
    import tagged0.sparkSession.implicits._
    // the watermarked event-time column must remain visible to the fMGWS
    // input (a projection dropping it loses the event-time attribute and
    // getCurrentWatermarkMs refuses to run) — hence the widened row type
    val tagged = tagged0
      .withColumn("eventTime", timestamp_millis(col("tsMillis")))
      .withWatermark("eventTime", watermarkDelay)
      .as[TemporalRowTs]
    tagged.groupByKey(_.key)
      .flatMapGroupsWithState[TemporalState, TemporalMatch](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rowsTs: Iterator[TemporalRowTs], state: GroupState[TemporalState]) =>
          val rows = rowsTs.map(r => TemporalRow(r.key, r.id, r.tsMillis, r.payload, r.isDim))
          val st = state.getOption.getOrElse(TemporalState(Nil, Nil))
          var versions = st.versions // newest-first
          var pending = st.pending
          rows.foreach { r =>
            if (r.isDim) versions = (r :: versions).sortBy(-_.tsMillis).take(maxVersions)
            else pending = r :: pending
          }
          val wm = state.getCurrentWatermarkMs()
          // STRICTLY below the watermark: a dim version with ts == wm is
          // still on-time (Spark drops only eventTime < watermark) and
          // could arrive in a later batch, so ts == wm facts must wait
          val (ready, stillPending) = pending.partition(_.tsMillis < wm)
          val out = ready.sortBy(f => (f.tsMillis, f.id)).map { f =>
            val m = versions.find(_.tsMillis <= f.tsMillis)
            TemporalMatch(key, f.id, f.tsMillis, m.map(_.id), m.map(_.payload))
          }
          // prune versions no future fact can need: every pending fact
          // has ts >= wm (by the partition above), and future facts have
          // ts >= wm (watermark), so keep the newest version <= wm and
          // everything after it
          val keptIdx = versions.indexWhere(_.tsMillis <= wm)
          if (keptIdx >= 0) versions = versions.take(keptIdx + 1)
          state.update(TemporalState(versions, stillPending))
          // wake this key when the watermark passes its oldest pending
          // fact — without this, facts on quiet keys flush only if the
          // key happens to receive more rows
          if (stillPending.nonEmpty) {
            state.setTimeoutTimestamp(stillPending.map(_.tsMillis).min + 1)
          }
          out.iterator
      }
  }
}

/** Temporal-join state: dim version history (newest-first) + facts
  * buffered until the watermark passes their event time. */
final case class BudgetDoc(domain: String, id: Long, n_tokens: Long)
final case class BudgetVerdict(domain: String, id: Long, n_tokens: Long,
                               admitted: Boolean, total_after: Long)

final case class TemporalState(versions: List[TemporalRow], pending: List[TemporalRow])

/** TemporalRow widened with the watermarked event-time column (must stay
  * in the fMGWS input plan for `getCurrentWatermarkMs` to be legal). */
final case class TemporalRowTs(key: String, id: Long, tsMillis: Long,
                               payload: String, isDim: Boolean,
                               eventTime: java.sql.Timestamp)

/** Generic keyed, timestamped row for the temporal join: `key` = join
  * key, `id` = unique row id, `payload` = carried dim attribute. */
final case class TemporalRow(key: String, id: Long, tsMillis: Long,
                             payload: String, isDim: Boolean = false)
final case class TemporalMatch(key: String, factId: Long, factTsMillis: Long,
                               dimId: Option[Long], dimPayload: Option[String])
