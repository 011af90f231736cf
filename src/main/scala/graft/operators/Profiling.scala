package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Numeric column profiling — the data-quality card a pipeline renders
  * for every metric/money/measurement column at intake: fixed-width
  * histogram + moments in ONE result, engine-exact.
  *
  * Everything is computed in EXACT integer fixed-point (the 2-dp/4-dp
  * base column snaps losslessly to `round(v·10⁴)` micro-units via the
  * repo's decimal rule) so every aggregate — min, max, Σ, Σ² — is
  * order-independent integer math; the only doubles are final derived
  * values computed by the identical op sequence on both engines, and
  * the bin assignment is pure integral arithmetic (`div` on
  * non-negative operands), never a float boundary that two engines
  * could bracket differently.
  */
object Profiling {

  /** Fixed-width histogram + moments of a ≤4-dp numeric column.
    *
    * Output: one row per OCCUPIED bin — (bin, bin_lo, bin_hi, n, frac,
    * mean, stddev); mean/stddev (population) repeat on every row so the
    * result is a self-contained profile card. bin = (v−lo)·bins div
    * (hi−lo) clamped to bins−1 (the max lands in the last bin).
    *
    * Scale shape: one scan for the bounds/moments 1-row aggregate
    * (broadcast back — the q86 bounds pattern), one scan + ONE
    * ≤`bins`-group combinable shuffle for the histogram. Σv fits a
    * long to ~9e14 micro-units × rows (document-scale corpora: fine;
    * beyond, widen to decimal); Σv² accumulates in DECIMAL(38,0)
    * (squares reach ~e19 — decimal, not long, and exact). */
  def numericProfile(df: DataFrame, valueCol: String, bins: Int): DataFrame = {
    import graft.expressions.HashExpressions.intDiv
    require(bins >= 1)
    // exact fixed-point: base → decimal (tie-free for ≤4-dp bases) → micro-units
    val vFix = (col(valueCol).cast("decimal(18,4)") * 10000).cast("long")
    val rows = df.select(vFix.as("__v"))
    val stats = rows.agg(
      count(lit(1)).as("__n"),
      min("__v").as("__lo"), max("__v").as("__hi"),
      sum("__v").as("__s1"),
      sum(col("__v").cast("decimal(38,0)") * col("__v").cast("decimal(38,0)")).as("__s2"))
    val binned = rows.crossJoin(broadcast(stats))
      .select(
        // degenerate hi==lo → single bin 0; else integral div, clamped
        when(col("__hi") === col("__lo"), lit(0L))
          .otherwise(least(lit(bins - 1L),
            intDiv((col("__v") - col("__lo")) * bins, col("__hi") - col("__lo"))))
          .as("bin"),
        col("__n"), col("__lo"), col("__hi"), col("__s1"), col("__s2"))
    val nD = col("__n").cast("double")
    val meanMicro = col("__s1").cast("double") / nD
    val varMicro2 = col("__s2").cast("double") / nD - meanMicro * meanMicro
    val width = col("__hi") - col("__lo")
    binned
      .groupBy("bin", "__n", "__lo", "__hi", "__s1", "__s2")
      .agg(count(lit(1)).as("n"))
      .select(
        col("bin"),
        round((col("__lo") + col("bin") * width / bins).cast("double") / 1e4, 6).as("bin_lo"),
        round((col("__lo") + (col("bin") + 1) * width / bins).cast("double") / 1e4, 6).as("bin_hi"),
        col("n"),
        // n/total can land exactly on a 6th-decimal tie → integer half-up
        (intDiv(col("n") * lit(2000000L) + col("__n"), col("__n") * 2)
          .cast("double") / 1e6).as("frac"),
        round(meanMicro / 1e4, 6).as("mean"),
        round(sqrt(greatest(varMicro2, lit(0.0))) / 1e4, 6).as("stddev"))
  }

  /** Per-group winsorization: clip a numeric column to its group's
    * [pLo, pHi] interpolated percentile bounds — the robust-scaling
    * step a pipeline runs before thresholding a quality/length signal
    * globally (a source with a heavy tail would otherwise dominate any
    * corpus-wide cutoff). Bounds use EXACTLY the q45
    * ([[CorpusStats.tokenQuantiles]]) contribution-sum interpolation —
    * one copy of the rank/frac formulas per engine pair, rounded 6 dp;
    * the clip compares the raw value against the ROUNDED bounds (a tie
    * lands on the bound itself, where clipping is the identity).
    *
    * Scale shape: ONE corpus scan — the rank/count windows shuffle
    * once per group key (spillable sort, never a group in memory), the
    * catalog-sized bounds frame broadcasts back onto the SAME ranked
    * stream (no second scan, no re-shuffle: the join key is the
    * window's own partitioning). Output: (id, group, v, lo, hi,
    * v_winsor). */
  def winsorize(df: DataFrame, idCol: String, groupCol: String,
                valueCol: Column, pLo: Double, pHi: Double): DataFrame = {
    require(pLo >= 0 && pLo < pHi && pHi <= 1)
    import org.apache.spark.sql.expressions.Window
    val ranked = df
      .select(col(idCol), col(groupCol).as("__grp"), valueCol.cast("double").as("v"))
      .withColumn("__rn", row_number().over(Window.partitionBy("__grp").orderBy("v")))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy("__grp")))
      .cache()
    def bound(p: Double, name: String) = {
      val idx = (col("__n") - 1).cast("double") * lit(p)
      val lo = floor(idx) + 1 // __rn is 1-based
      val frac = idx - floor(idx)
      // ties in v make rank assignment among equals irrelevant (q45)
      val contrib = when(col("__rn") === lo, col("v") * (lit(1.0) - frac))
        .when(col("__rn") === lo + 1, col("v") * frac)
        .otherwise(lit(0.0))
      round(sum(contrib), 6).as(name)
    }
    val bounds = ranked.groupBy("__grp").agg(bound(pLo, "lo"), bound(pHi, "hi"))
    CacheScope.scoped(
      ranked.join(broadcast(bounds), "__grp")
        .select(col(idCol), col("__grp").as(groupCol), col("v"),
          col("lo"), col("hi"),
          least(greatest(col("v"), col("lo")), col("hi")).as("v_winsor")),
      ranked)
  }

  /** k-anonymity risk profile (Sweeney 2002) over quasi-identifier
    * columns: group by the QI tuple and flag equivalence classes with
    * fewer than k members — the re-identification audit a privacy pass
    * runs before release. Complements the direct-PII scrub (q79):
    * redaction removes explicit identifiers; this measures whether the
    * REMAINING attributes still single records out (a class of size 1
    * IS an identifier, whatever the columns are named). Continuous
    * quasi-identifiers must be pre-bucketed by the caller (pass e.g.
    * `col("n_chars").divide(500).cast("long")` — generalization is a
    * policy choice, not the operator's).
    *
    * Scale shape: ONE map-combinable shuffle onto the QI grouping —
    * no joins, no windows; cardinality is the QI domain, not the
    * corpus. Output: QI columns + (n_rows, at_risk). */
  def kAnonymityProfile(df: DataFrame, k: Int, qiCols: Column*): DataFrame = {
    require(k > 0 && qiCols.nonEmpty)
    df.groupBy(qiCols: _*)
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("at_risk", col("n_rows") < k)
  }

  /** Corpus↔embedding referential-integrity audit — the join-coverage
    * card a pipeline checks before ANY embedding-driven stage
    * (SemDeDup, ANN, clustering): a doc without a vector silently
    * drops out of embedding dedup (an unverified doc reaches
    * training), and a vector without a doc means id drift between the
    * text and embedding extraction runs (every downstream join is
    * keyed on a lie). One full-outer join, grouped per source; vectors
    * matching no doc land in the sentinel `(orphan)` source row.
    *
    * Coverage is the exact-integer n_matched/n_docs in half-up micro
    * (CLAUDE.md rule); NULL for the orphan row (no doc denominator).
    *
    * Scale shape: ONE id-keyed shuffle join (both sides co-partition
    * on the join key; bucketed tables make it exchange-free), folded
    * to |sources|+1 rows. Output: (source, n_docs, n_vecs, n_matched,
    * coverage_micro). */
  def embeddingCoverage(docs: DataFrame, emb: DataFrame,
                        docIdCol: String = "doc_id",
                        vecIdCol: String = "vec_id",
                        sourceCol: String = "source"): DataFrame = {
    import graft.expressions.HashExpressions.intDiv
    val d = docs.select(col(docIdCol).as("__did"), col(sourceCol).as("__src"))
    val e = emb.select(col(vecIdCol).as("__vid"))
    d.join(e, d("__did") === e("__vid"), "full_outer")
      .groupBy(coalesce(col("__src"), lit("(orphan)")).as("source"))
      .agg(count(col("__did")).as("n_docs"),
        count(col("__vid")).as("n_vecs"),
        sum(when(col("__did").isNotNull && col("__vid").isNotNull, 1L)
          .otherwise(0L)).as("n_matched"))
      .select(col("source"), col("n_docs"), col("n_vecs"), col("n_matched"),
        when(col("n_docs") > 0L,
          intDiv(lit(2L) * col("n_matched") * 1000000L + col("n_docs"),
            lit(2L) * col("n_docs")).cast("long")).as("coverage_micro"))
  }

  /** Per-group robust outlier profile — median/MAD instead of
    * mean/stddev: ONE corrupt mega-row drags a z-score gate's own
    * μ/σ toward itself (masking), while the median and the median
    * absolute deviation have a 50% breakdown point — the robust gate
    * an intake pipeline runs on length/metric columns BEFORE any
    * moment-based profile ([[numericProfile]]) is trustworthy.
    *
    * All-integer and tie-free by construction: the input is an
    * integral column, both medians are the LOWER median (the smallest
    * value whose cumulative count reaches ⌈n/2⌉ — an order statistic,
    * never an interpolated double), deviations are exact |v − med|,
    * and a row is an outlier iff |v − med| > `cut`·MAD (strict,
    * integer compare). outlier_micro is the shifted half-up ratio
    * (CLAUDE.md integer-ratio rule).
    *
    * Scale shape: two corpus-sized map-combinable shuffles — (grp, v)
    * counts, then (grp, |v−med|) counts — each folded through a
    * cumulative window over the per-group DISTINCT-VALUE frame (the
    * q143 count-of-counts pattern: the window never sees |rows|), with
    * the catalog-sized med/MAD frames broadcast back onto the scan.
    * Output: (group, n, median, mad, n_outliers, outlier_micro). */
  def madOutlierProfile(df: DataFrame, groupCol: String, valueCol: Column,
                        cut: Long = 3L): DataFrame = {
    import graft.expressions.HashExpressions.intDiv
    import org.apache.spark.sql.expressions.Window
    require(cut >= 1)
    def lowerMedian(rows: DataFrame, vName: String, outName: String): DataFrame = {
      val cc = rows.groupBy("__grp", vName).agg(count(lit(1)).as("__k"))
      val wCum = Window.partitionBy("__grp").orderBy(vName)
        .rowsBetween(Window.unboundedPreceding, 0)
      val wAll = Window.partitionBy("__grp")
      cc.withColumn("__cum", sum("__k").over(wCum))
        .withColumn("__n", sum("__k").over(wAll))
        .groupBy("__grp")
        .agg(max("__n").as("__n"),
          min(when(col("__cum") * 2 >= col("__n"), col(vName))).as(outName))
    }
    val rows = df.select(col(groupCol).as("__grp"), valueCol.cast("long").as("__v")).cache()
    val med = lowerMedian(rows, "__v", "median")
    val devs = rows.join(broadcast(med), "__grp")
      .select(col("__grp"), abs(col("__v") - col("median")).as("__d"))
    val mad = lowerMedian(devs, "__d", "mad").drop("__n")
    CacheScope.scoped(
      rows.join(broadcast(med), "__grp").join(broadcast(mad), "__grp")
        .groupBy(col("__grp").as(groupCol))
        .agg(max("__n").as("n"), max("median").as("median"), max("mad").as("mad"),
          sum(when(abs(col("__v") - col("median")) > col("mad") * cut, 1L)
            .otherwise(0L)).as("n_outliers"))
        .select(col(groupCol), col("n"), col("median"), col("mad"), col("n_outliers"),
          intDiv(lit(2L) * col("n_outliers") * 1000000L + col("n"),
            lit(2L) * col("n")).cast("long").as("outlier_micro")),
      rows)
  }

  /** Spearman rank correlation between two integer-valued document
    * signals — the signal-redundancy audit a curation pipeline runs
    * before gating on two scores (ρ ≈ 1 means the second filter adds
    * nothing; ρ ≈ 0 means it prunes an independent dimension). Rank
    * correlation, not Pearson, because quality-style signals are
    * bounded, skewed, and monotone-transformed at will — Spearman is
    * invariant to all of that.
    *
    * Ranks are AVERAGE (fractional) ranks, tie-correct, computed
    * DISTRIBUTEDLY: per-value counts (one combinable shuffle), a
    * cumulative sum over the ≤|distinct-values| frame, and an
    * equi-join back on the value. No corpus-wide sort, no global
    * window over data rows — the only ordered window runs on the
    * value-histogram frame (bounded by signal cardinality: micro-unit
    * scores ≤ ~10⁶ distinct values), the exact shape q45/q93 use for
    * bounded rank frames. To keep everything integral, DOUBLED ranks
    * are used (2·avgRank = 2·minRank + ties − 1, an integer; Pearson
    * is scale-invariant so ρ is unchanged).
    *
    * Determinism: all five sums are exact DECIMAL(38,0) integers; the
    * final ρ is one fixed double op sequence — (n·Sxy − Sx·Sy) /
    * (√(n·Sxx − Sx²) · √(n·Syy − Sy²)) — on doubles converted from
    * those exact integers, rounded at 6 dp (the metric-double rule;
    * a constant signal yields NULL). Output: (n_docs, rho). */
  /** Cramér's V association between two categorical columns (source ×
    * lang, shard × source…) — the provenance-dependence audit: V ≈ 0
    * means the two labelings cut the corpus independently; V ≈ 1 means
    * one determines the other (so stratifying by both is redundant,
    * and a split keyed on one leaks the other).
    *
    * χ² over occupied cells only, via the identity
    * χ² = n·(Σ o²/(rₐ·c_b) − 1) — empty cells contribute nothing, so
    * the sparse contingency frame is enough. Each cell's term is
    * floor-snapped to 1e12 "pico" units from one PINNED double op
    * sequence (IEEE divides/multiplies are correctly rounded, so both
    * engines floor the same double — the q132 ln-snap contract), and
    * the snapped integers sum exactly; V = √(χ²/(n·(min(r,c)−1))) is
    * the only unsnapped double, rounded at 6 dp (metric-double rule).
    * min(r,c) = 1 (a constant column) yields NULL.
    *
    * Scale shape: one (a, b) combinable shuffle to the occupied-cell
    * frame; margins are two aggregates OF that frame (≤ |a|, ≤ |b|
    * rows) broadcast back; everything after is cell-frame-sized.
    * Output: (n_rows, n_a, n_b, chi2, cramers_v) — chi2 emitted as the
    * one pinned decimal→double division (chi2_pico may exceed a
    * BIGINT at petabyte n·k, so the exact integer stays internal). */
  def categoricalAssociation(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    val cells = df.select(aCol.as("__a"), bCol.as("__b"))
      .groupBy("__a", "__b").agg(count(lit(1)).as("__o"))
      .cache()
    val ra = cells.groupBy("__a").agg(sum("__o").as("__ra"))
    val cb = cells.groupBy("__b").agg(sum("__o").as("__cb"))
    val terms = cells
      .join(broadcast(ra), "__a").join(broadcast(cb), "__b")
      .select(floor(
        col("__o").cast("double") * col("__o") /
          (col("__ra").cast("double") * col("__cb")) * lit(1e12))
        .cast("decimal(38,0)").as("__t"))
    val s = terms.agg(sum("__t").as("__st"))
    val dims = cells.agg(
      countDistinct("__a").as("n_a"), countDistinct("__b").as("n_b"),
      sum("__o").as("n_rows"))
    CacheScope.scoped(
      dims.crossJoin(broadcast(s))
        // clamp at 0: floor snapping under-counts each term by < 1
        // pico, so an independent table can land a hair below zero —
        // and sqrt of that hair is NaN, not a small V
        .select(col("n_rows"), col("n_a"), col("n_b"),
          greatest(((col("__st") - lit(1000000000000L)) * col("n_rows"))
            .cast("decimal(38,0)").cast("double") / lit(1e12), lit(0.0)).as("chi2"))
        .withColumn("cramers_v",
          when(least(col("n_a"), col("n_b")) > 1,
            round(sqrt(col("chi2") /
              (col("n_rows").cast("double") *
                (least(col("n_a"), col("n_b")).cast("double") - 1.0))), 6)))
        .select(col("n_rows").cast("long").as("n_rows"),
          col("n_a").cast("long").as("n_a"), col("n_b").cast("long").as("n_b"),
          col("chi2"), col("cramers_v")),
      cells)
  }

  def signalSpearman(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sig = df.select(xCol.cast("long").as("__x"), yCol.cast("long").as("__y"))
      .where(col("__x").isNotNull && col("__y").isNotNull)
      .cache()
    // doubled average rank per distinct value: 2·(count of smaller) +
    // (count of equal) + 1 — the window runs over the VALUE HISTOGRAM,
    // never the corpus rows
    def rank2(c: String): DataFrame = {
      val w = Window.orderBy(col(c))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      sig.groupBy(col(c)).agg(count(lit(1)).as("__c"))
        .select(col(c),
          (lit(2L) * (sum("__c").over(w) - col("__c")) + col("__c") + lit(1L))
            .cast("decimal(38,0)").as(s"__r$c"))
    }
    val ranked = sig.join(rank2("__x"), "__x").join(rank2("__y"), "__y")
      .select(col("__r__x").as("rx"), col("__r__y").as("ry"))
    val s = ranked.agg(
      count(lit(1)).cast("double").as("n"),
      sum("rx").cast("double").as("sx"), sum("ry").cast("double").as("sy"),
      sum(col("rx") * col("ry")).cast("double").as("sxy"),
      sum(col("rx") * col("rx")).cast("double").as("sxx"),
      sum(col("ry") * col("ry")).cast("double").as("syy"))
    CacheScope.scoped(
      s.select(col("n").cast("long").as("n_docs"),
        when(col("n") * col("sxx") - col("sx") * col("sx") > 0 &&
             col("n") * col("syy") - col("sy") * col("sy") > 0,
          round((col("n") * col("sxy") - col("sx") * col("sy")) /
            (sqrt(col("n") * col("sxx") - col("sx") * col("sx")) *
             sqrt(col("n") * col("syy") - col("sy") * col("sy"))), 6))
          .as("rho")),
      sig)
  }

  /** Per-day entity-novelty curve of an event stream — the intake
    * profile of an INCREMENTAL pipeline: of the entities active each
    * day, how many were never seen before? A healthy crawl's novelty
    * rate decays smoothly; a spike means a new source came online, a
    * collapse means the crawler is re-reading old ground. Two
    * granularities side by side: the entity itself (`userCol`) and the
    * (entity, `typeCol`) behavior pair — pair novelty keeps rising
    * after user novelty flattens iff known users are still exploring
    * new behaviors.
    *
    * Day = epoch_us div 86400·10⁶ (non-negative, floor-exact both
    * engines). First-seen day per key is a map-combinable `min`
    * aggregate keyed on the entity — state is |entities|, not
    * |events|, and at 100 TB it is the same "first occurrence" shape
    * every dedup op here uses. Novelty shares are exact half-up
    * micro-units (`intDiv`, both operands non-negative — the q82
    * integer-ratio rule: a new/active ratio CAN land on an exact
    * 6th-decimal tie, so no double rounding anywhere).
    */
  /** Lead–lag cross-correlation between two event types' hourly
    * activity: Pearson corr(x_t, y_{t+ℓ}) for ℓ ∈ [−maxLag, maxLag] —
    * does activity of type A LEAD type B (peak at ℓ > 0), lag it, or
    * co-move (peak at 0)? The funnel/causality screen a metrics
    * pipeline runs before pairing signals.
    *
    * Empty hours COUNT as zeros (a correlation over only-active hours
    * is biased toward bursts), so the series is materialized on the
    * full [min, max] hour grid — a `sequence` explode of a 1-row
    * broadcast bounds aggregate, never a driver loop. All Pearson
    * sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²) are EXACT
    * integers accumulated in DECIMAL(38,0) (hourly counts at 100 TB
    * put Σxy past BIGINT — the q121 overflow rule); the only doubles
    * are the final formula, evaluated in the same op order both
    * engines (each statistic is < 2⁵³ after the cast at any plausible
    * hourly rate, so the doubles are exact), round-6, NULL on a
    * zero-variance side.
    *
    * Scale shape: one scan → two |hours|-sized count frames; the
    * lag×grid pair frame is |lags|·|hours| rows — calendar-sized, not
    * data-sized; one combinable shuffle to |lags| rows. */
  def leadLagCorrelation(events: DataFrame, typeCol: String, tsCol: String,
                         typeA: String, typeB: String,
                         maxLag: Int = 3): DataFrame = {
    import graft.expressions.HashExpressions.intDiv
    val dec = "decimal(38,0)"
    val hr = intDiv(unix_micros(col(tsCol)), lit(3600000000L))
    val h = events.select(hr.as("hr"), col(typeCol).as("ty")).cache()
    val bounds = h.agg(min("hr").as("lo"), max("hr").as("hi"))
    val grid = broadcast(bounds)
      .select(explode(sequence(col("lo"), col("hi"))).as("hr"))
    def counts(t: String, out: String) = h.where(col("ty") === t)
      .groupBy("hr").agg(count(lit(1)).as(out))
    val series = grid
      .join(counts(typeA, "__x"), Seq("hr"), "left")
      .join(counts(typeB, "__y"), Seq("hr"), "left")
      .select(col("hr"), coalesce(col("__x"), lit(0L)).as("x"),
        coalesce(col("__y"), lit(0L)).as("y"))
      .cache()
    val lagFrame = series.sparkSession.range(-maxLag, maxLag + 1)
      .select(col("id").as("lag"))
    val pairs = broadcast(lagFrame).crossJoin(series.select(col("hr"), col("x")))
      .join(series.select(col("hr").as("hr_y"), col("y")),
        col("hr_y") === col("hr") + col("lag"))
    // cast EACH FACTOR to decimal before multiplying: a Long×Long
    // product overflows (ANSI throw / silent wrap) at exactly the
    // hourly rates the decimal sums exist to protect
    val (xd, yd) = (col("x").cast(dec), col("y").cast(dec))
    val s = pairs.groupBy("lag").agg(
      count(lit(1)).as("n_buckets"),
      sum(xd).as("sx"), sum(yd).as("sy"),
      sum(xd * yd).as("sxy"),
      sum(xd * xd).as("sxx"),
      sum(yd * yd).as("syy"))
    val n = col("n_buckets").cast("double")
    val (sx, sy, sxy, sxx, syy) = (col("sx").cast("double"),
      col("sy").cast("double"), col("sxy").cast("double"),
      col("sxx").cast("double"), col("syy").cast("double"))
    CacheScope.scoped(
      s.select(col("lag"), col("n_buckets"),
        when(n * sxx - sx * sx > 0 && n * syy - sy * sy > 0,
          round((n * sxy - sx * sy) /
            (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6))
          .as("corr")),
      h, series)
  }

  def noveltyTimeline(events: DataFrame, userCol: String, tsCol: String,
                      typeCol: String): DataFrame = {
    import graft.expressions.HashExpressions.intDiv
    val day = intDiv(unix_micros(col(tsCol)), lit(86400000000L))
    val base = events.select(col(userCol).as("u"), col(typeCol).as("ty"),
      day.as("day")).cache()
    // per-day active/new USERS: first-seen day rides the same groupBy
    // as the per-day presence (min over day ≡ first-seen), one
    // |users|-keyed combinable shuffle, then a |users × active-days|
    // frame aggregates to |days| rows
    def curve(keyCols: Seq[String], active: String, fresh: String,
              ppm: String): DataFrame = {
      val perKeyDay = base.groupBy(keyCols.map(col) :+ col("day"): _*)
        .agg(count(lit(1)).as("__n"))
      val withFirst = perKeyDay
        .withColumn("__first",
          min("day").over(org.apache.spark.sql.expressions.Window
            .partitionBy(keyCols.map(col): _*)))
      withFirst.groupBy("day")
        .agg(count(lit(1)).as(active),
          count(when(col("day") === col("__first"), 1)).as(fresh))
        .withColumn(ppm,
          intDiv(lit(2L) * col(fresh) * lit(1000000L) + col(active),
            lit(2L) * col(active)))
    }
    val users = curve(Seq("u"), "active_users", "new_users", "new_user_ppm")
    val pairs = curve(Seq("u", "ty"), "active_pairs", "new_pairs", "new_pair_ppm")
    CacheScope.scoped(users.join(pairs, "day"), base)
  }
}
