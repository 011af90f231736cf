package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift monitoring over an event/ingest stream — the
  * data-quality gate a training pipeline runs between snapshots: has
  * the category mix (event types, sources, languages…) shifted enough
  * to re-examine the feed?
  *
  * The reference's streams carry exactly this shape (clickstream
  * events with a type column; reference
  * `terraform/lab-aggregations/main.tf:103-129` datagen topics), and
  * PSI (population stability index, the standard banking/ML-ops drift
  * score; Σ (p_a−p_b)·ln(p_a/p_b) over categories) is the metric the
  * monitoring side of such a pipeline computes.
  */
object Drift {

  /** Per-category PSI terms between the FIRST and SECOND half of the
    * event time range (split at min + (max−min)/2, integer
    * micro-epoch arithmetic — exact on any engine).
    *
    * Laplace-smoothed shares p = (n+1)/(tot+|categories|) so a
    * category absent from one half contributes a finite, well-defined
    * term instead of ln(0) (standard PSI practice). ln is libm-close
    * cross-engine (the q67 contract); every emitted double is rounded
    * 6 dp (metric rule).
    *
    * Scale shape: one map-combined scan → |categories| rows; the
    * bounds and totals are broadcast 1-row aggregates computed IN the
    * plan (no driver action). At 100 TB this is a single pass with a
    * tiny fan-in — the per-category frame is monitoring-dashboard
    * sized.
    *
    * Output: (category, n_first, n_second, p_first, p_second,
    * psi_term), one row per category seen in either half. */
  def psiDrift(events: DataFrame, catCol: String, tsCol: String): DataFrame = {
    val ev = events.select(col(catCol).as("category"),
      unix_micros(col(tsCol)).as("__us"))
    val bounds = ev.agg(min("__us").as("__lo"), max("__us").as("__hi"))
    // `div`, not `/`: Spark `/` on longs is DOUBLE division — the split
    // point must be exact integral micros (DuckDB `//`) on both engines
    val mid: Column = col("__lo") + expr("(__hi - __lo) div 2")
    val perCat = ev.crossJoin(broadcast(bounds))
      .select(col("category"), (col("__us") < mid).as("__first"))
      .groupBy("category")
      .agg(sum(when(col("__first"), 1L).otherwise(0L)).as("n_first"),
        sum(when(!col("__first"), 1L).otherwise(0L)).as("n_second"))
    // totals fold into an unpartitioned window over the |categories|-
    // sized frame (one tiny partition) — a separate totals aggregate
    // would rebuild the per-category shuffle for a 1-row result
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    val pA = (col("n_first") + 1L).cast("double") /
      (col("__tot_a") + col("__k")).cast("double")
    val pB = (col("n_second") + 1L).cast("double") /
      (col("__tot_b") + col("__k")).cast("double")
    perCat
      .withColumn("__tot_a", sum("n_first").over(w))
      .withColumn("__tot_b", sum("n_second").over(w))
      .withColumn("__k", count(lit(1)).over(w))
      .select(col("category"), col("n_first"), col("n_second"),
        round(pA, 6).as("p_first"), round(pB, 6).as("p_second"),
        round((pA - pB) * log(pA / pB), 6).as("psi_term"))
  }

  /** Two-sample Kolmogorov–Smirnov statistic between the `a` and `b`
    * slices of an INTEGER-valued metric column — the nonparametric
    * complement of [[psiDrift]]: PSI needs a binning policy and reacts
    * to share shifts; KS is binning-free and reacts to ANY CDF
    * displacement (median creep, tail growth), which is the earlier
    * signal when a source's length/quality distribution drifts.
    *
    * Entirely EXACT integer arithmetic: D = max_v |F_a(v) − F_b(v)| =
    * max_v |cum_a(v)·n_b − cum_b(v)·n_a| / (n_a·n_b) — the numerator
    * and denominator are exact DECIMAL(38,0) products, the max is an
    * integer max, and only the final ratio rounds (shifted half-up
    * intDiv micro form). `ks_at_value` reports the v achieving the
    * max (smallest such v on ties — deterministic).
    *
    * Scale shape: one combinable shuffle to the |distinct values|
    * frame; the cumulative window runs over THAT bounded frame (the
    * metric domain — token counts, char lengths, micro-bucketed
    * scores — not the corpus; callers pre-bucket continuous metrics),
    * and totals ride the same frame as a window, not a second scan.
    * Output: one row (n_a, n_b, ks_micro, ks_at_value). */
  def ksDrift(df: DataFrame, valueCol: Column, groupCol: Column,
              a: String, b: String): DataFrame = {
    import graft.expressions.HashExpressions.intDiv
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val counts = df
      .select(valueCol.cast("long").as("v"), groupCol.as("__g"))
      .where(col("__g").isin(a, b))
      .groupBy("v")
      .agg(sum(when(col("__g") === a, 1L).otherwise(0L)).as("__ca"),
        sum(when(col("__g") === b, 1L).otherwise(0L)).as("__cb"))
    val wCum = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy()
    val gap = abs(col("__cuma").cast(dec) * col("__nb").cast(dec) -
      col("__cumb").cast(dec) * col("__na").cast(dec))
    counts
      .withColumn("__cuma", sum("__ca").over(wCum))
      .withColumn("__cumb", sum("__cb").over(wCum))
      .withColumn("__na", sum("__ca").over(wAll))
      .withColumn("__nb", sum("__cb").over(wAll))
      .select(col("v"), col("__na"), col("__nb"), gap.as("__gap"))
      // max by (gap DESC, v ASC): negate v inside the comparison struct
      .agg(max(struct(col("__gap"), (-col("v")).as("__negv"))).as("__m"),
        max("__na").as("n_a"), max("__nb").as("n_b"))
      .select(col("n_a"), col("n_b"),
        intDiv(lit(2L) * col("__m.__gap") * 1000000L +
            col("n_a").cast(dec) * col("n_b").cast(dec),
          lit(2L) * col("n_a").cast(dec) * col("n_b").cast(dec))
          .cast("long").as("ks_micro"),
        (-col("__m.__negv")).as("ks_at_value"))
  }
}
