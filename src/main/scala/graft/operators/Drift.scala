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
}
