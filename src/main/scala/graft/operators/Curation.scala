package graft.operators

import graft.functions.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The end-to-end per-document curation decision a training-data
  * pipeline runs after the corpus-level passes (dedup, decontamination):
  * every row gets a verdict — `keep`, or the FIRST failing drop reason
  * in a fixed precedence order — plus the signals that produced it, so
  * downstream audits can recount any funnel stage.
  *
  * Entirely per-row `Column` arithmetic over one scan: token/quality/
  * language signals from [[TextAnalysis]] (whole-stage codegen, no
  * UDFs), the repetition signal from the one-pass `GramHashes` kernel.
  * Zero shuffles, zero joins — the 100 TB cost is exactly one read of
  * the text column. Signal values reuse the oracle-exact formulations
  * of q14–q16/q46, so the whole funnel is DuckDB-hash-checkable.
  */
object Curation {

  /** Precedence: short-circuit order of the drop reasons. Cheap and
    * unambiguous checks first; language last (it is the fuzziest). */
  def verdictFor(nTokens: Column, repetition: Column, quality: Column,
                 langMatches: Column, minTokens: Int, maxRepetition: Double,
                 minQuality: Double): Column =
    when(nTokens < minTokens, "drop:too_short")
      .when(repetition > maxRepetition, "drop:repetitive")
      .when(quality < minQuality, "drop:low_quality")
      .when(!langMatches, "drop:lang_mismatch")
      .otherwise("keep")

  /** Per-doc funnel row: (id, declared lang, n_tokens, repetition_ratio
    * [null when < 2 tokens — no bigrams to judge], quality, pred_lang,
    * verdict). Repetition compares the ROUNDED ratio (6 dp) so the
    * threshold test is engine-portable; quality is double-exact by
    * construction (integer counts through IEEE ops — the q15 rule). */
  def funnel(docs: DataFrame, idCol: String, textCol: String,
             declaredLangCol: String, minTokens: Int = 20,
             maxRepetition: Double = 0.2, minQuality: Double = 0.5): DataFrame = {
    val withToks = docs.select(col(idCol), col(declaredLangCol).as("lang"),
      col(textCol).as("__text"), TextAnalysis.tokens(col(textCol)).as("__toks"))
    val nTokens = size(col("__toks"))
    val nGrams = nTokens - 1
    val nDistinct = size(graft.expressions.HashExpressions.gramHashes(col("__toks"), 2))
    val repetition = when(nTokens >= 2,
      round(lit(1.0) - nDistinct.cast("double") / nGrams.cast("double"), 6))
    val sig = withToks.select(col(idCol), col("lang"),
      nTokens.as("n_tokens"),
      repetition.as("repetition_ratio"),
      TextAnalysis.qualityScore(col("__text")).as("quality"),
      TextAnalysis.langId(col("__text")).as("pred_lang"))
    sig.withColumn("verdict",
      verdictFor(col("n_tokens"), col("repetition_ratio"), col("quality"),
        col("pred_lang") === col("lang"), minTokens, maxRepetition, minQuality))
  }

  /** The END-TO-END curation manifest — every corpus-level gate's
    * verdict for every document in ONE frame, the composition a real
    * pipeline materializes before writing the curated corpus:
    *
    *  - `keep_funnel`: the per-row [[funnel]] verdict (length /
    *    repetition / quality / language) — zero-shuffle scan signals;
    *  - `keep_dedup`: the doc survives MinHash-LSH near-dup clustering
    *    ([[Dedup.dedupClusters]] — lowest id per cluster survives);
    *  - `keep_budget`: the doc's portable md5 bucket falls inside its
    *    source's token-budget keep set ([[Sampling.tokenBudgetMix]]);
    *  - `keep`: the conjunction — the final curated-corpus membership.
    *
    * Per-gate flags (not just the conjunction) are the point: pipeline
    * audits recount any stage without re-running the others.
    *
    * Scale shape: the funnel rides the scan; dedup is the default
    * alternating-star cluster path (LSH index + sparse component
    * joins, O(log n) rounds — the 100-TB shape, labels identical to
    * the min-label variant by the shared min-id fixpoint oracle); the
    * budget table is
    * |sources| rows and BROADCASTS; everything meets in id-keyed joins
    * (the drop set is cluster members only — corpus-sized text never
    * joins anything). */
  def pipelineManifest(docs: DataFrame, idCol: String, textCol: String,
                       declaredLangCol: String, sourceCol: String,
                       budgetTokens: Long, shingleN: Int = 3,
                       numHashes: Int = 64, bands: Int = 16,
                       minJaccard: Double = 0.8): DataFrame = {
    val fun = funnel(docs, idCol, textCol, declaredLangCol)
      .select(col(idCol), col("lang"),
        (col("verdict") === lit("keep")).as("keep_funnel"))
    val drop = Dedup.dedupClusters(docs, idCol, textCol, shingleN, numHashes,
        bands, minJaccard)
      .where(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as(idCol), lit(true).as("__dropped"))
    val budget = Sampling.tokenBudgetMix(docs, idCol, sourceCol,
        TextAnalysis.tokenCount(col(textCol)), budgetTokens)
      .select(col("domain").as(sourceCol), col("keep_buckets"))
    docs.select(col(idCol), col(sourceCol),
        Sampling.md5Bucket(idCol, 100).cast("long").as("__bucket"))
      .join(fun, Seq(idCol))
      .join(drop, Seq(idCol), "left")
      .join(broadcast(budget), Seq(sourceCol))
      .select(col(idCol), col("lang"), col(sourceCol),
        col("keep_funnel"),
        col("__dropped").isNull.as("keep_dedup"),
        (col("__bucket") < col("keep_buckets")).as("keep_budget"),
        (col("keep_funnel") && col("__dropped").isNull &&
          col("__bucket") < col("keep_buckets")).as("keep"))
  }

  /** Funnel attrition summary — the numbers a pipeline report leads
    * with: rows and token volume per (declared language, verdict). One
    * map-combinable shuffle over ≤ |langs|·|reasons| groups. */
  def funnelSummary(docs: DataFrame, idCol: String, textCol: String,
                    declaredLangCol: String, minTokens: Int = 20,
                    maxRepetition: Double = 0.2, minQuality: Double = 0.5): DataFrame =
    funnel(docs, idCol, textCol, declaredLangCol, minTokens, maxRepetition,
      minQuality)
      .groupBy("lang", "verdict")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens").cast("long")).as("n_tokens"))

  /** PII density per source — the "can we ship this crawl" rollup of
    * the per-doc [[graft.functions.PiiScrub]] counts: per source, the
    * total matches per PII type and the fraction of documents carrying
    * ANY match. A source whose density clears policy gets the q79
    * redaction pass (or is dropped) BEFORE tokens are spent on it.
    *
    * Determinism: counts are exact integers from the shared Java∩RE2
    * pattern contract; the rate is the shifted half-up intDiv micro
    * form (integer-ratio tie rule).
    *
    * Scale shape: one codegen kernel riding the scan → one combinable
    * shuffle to |sources| rows; no joins. Output: (source, n_docs,
    * n_email, n_ipv4, n_ssn, n_phone, pii_doc_rate_micro). */
  def piiDensityBySource(docs: DataFrame, textCol: String,
                         sourceCol: String = "source"): DataFrame = {
    import graft.expressions.HashExpressions.intDiv
    import graft.functions.PiiScrub
    val c = PiiScrub.piiCounts(col(textCol))
    val n = count(lit(1))
    val hasAny = (col("__e") + col("__i") + col("__s") + col("__p")) > 0
    docs
      .select(col(sourceCol).as("source"),
        c.getField("n_email").cast("long").as("__e"),
        c.getField("n_ipv4").cast("long").as("__i"),
        c.getField("n_ssn").cast("long").as("__s"),
        c.getField("n_phone").cast("long").as("__p"))
      .withColumn("__any", when(hasAny, 1L).otherwise(0L))
      .groupBy("source")
      .agg(n.as("n_docs"), sum("__e").as("n_email"), sum("__i").as("n_ipv4"),
        sum("__s").as("n_ssn"), sum("__p").as("n_phone"),
        sum("__any").as("__na"))
      .withColumn("pii_doc_rate_micro",
        intDiv(lit(2000000L) * col("__na") + col("n_docs"),
          lit(2L) * col("n_docs")))
      .drop("__na")
  }

  /** Reliability diagram for the hashed-feature classifier: bin the
    * [0,1] score against the Gopher rule verdict as the observed
    * label — the audit that says whether the cheap model's scores can
    * be TRUSTED as probabilities before they gate a 100-TB keep/drop
    * decision (per-bin gap = score − observed keep rate; large |gap|
    * means threshold on ranks, not on the raw score).
    *
    * Determinism: the score is the exact half-up micro-unit rational
    * (w_sum + 500n)/(1000n) ∈ [0, 1e6] (`HashExpressions.intDiv`,
    * non-negative operands — the integer-ratio tie rule), the bin is
    * an integral comparison, and both per-bin means are again half-up
    * intDiv micro forms; `gap_micro` is a difference of those exact
    * integers. No doubles anywhere.
    *
    * Scale shape: two codegen kernels riding ONE scan, then a single
    * map-combinable shuffle to ≤ `bins` rows. Output: (bin, n_docs,
    * mean_score_micro, keep_rate_micro, gap_micro). */
  def calibrationBins(docs: DataFrame, idCol: String, textCol: String,
                      bins: Int = 10): DataFrame = {
    import graft.expressions.HashExpressions.intDiv
    val c = TextAnalysis.hashedClassifier(col(textCol))
    val g = TextAnalysis.gopherRules(col(textCol))
    val scored = docs
      .select(col(idCol), c.getField("w_sum").as("w_sum"),
        c.getField("n_tokens").cast("long").as("n"),
        g.getField("keep").as("keep"))
      .select(col("keep"),
        intDiv((col("w_sum") + lit(500L) * col("n")) * lit(2000000L)
            + lit(1000L) * col("n"),
          lit(2000L) * col("n")).as("s_micro"))
      .select(col("keep"), col("s_micro"),
        intDiv(col("s_micro") * lit(bins.toLong), lit(1000001L)).as("bin"))
    scored.groupBy("bin")
      .agg(count(lit(1)).as("n_docs"),
        sum("s_micro").as("__s_sum"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("__keeps"))
      .select(col("bin"), col("n_docs"),
        intDiv(lit(2L) * col("__s_sum") + col("n_docs"),
          lit(2L) * col("n_docs")).as("mean_score_micro"),
        intDiv(lit(2000000L) * col("__keeps") + col("n_docs"),
          lit(2L) * col("n_docs")).as("keep_rate_micro"))
      .withColumn("gap_micro",
        col("mean_score_micro") - col("keep_rate_micro"))
  }

  /** Declared-vs-predicted language confusion matrix per source — the
    * metadata-trust audit: a source whose declared `lang` disagrees
    * with the content's n-gram language ID is mislabeled at ingest
    * (wrong-language training mass for every lang-filtered run).
    * Prediction is the ONE q16 `TextAnalysis.langId` expression —
    * never an inlined copy that could drift from the audited op.
    * Output per (source, declared, predicted) cell: count and the
    * share of that source's declared-lang docs landing in the cell
    * (exact half-up micro — the q82 integer-ratio rule).
    *
    * Scale shape: ONE corpus scan into a combinable (source, lang,
    * pred) aggregate; the share window runs over the CELL frame
    * (catalog-sized: |sources|·|langs|²), never corpus rows. */
  def langAgreementMatrix(docs: DataFrame, srcCol: String, langCol: String,
                          textCol: String): DataFrame = {
    import graft.expressions.HashExpressions.intDiv
    import org.apache.spark.sql.expressions.Window
    val cells = docs
      .groupBy(col(srcCol).as("source"), col(langCol).as("lang"),
        TextAnalysis.langId(col(textCol)).as("pred_lang"))
      .agg(count(lit(1)).as("n"))
    val tot = sum("n").over(Window.partitionBy("source", "lang"))
    cells
      .withColumn("__tot", tot)
      .select(col("source"), col("lang"), col("pred_lang"), col("n"),
        intDiv(lit(2L) * col("n") * lit(1000000L) + col("__tot"),
          lit(2L) * col("__tot")).as("share_ppm"))
  }

  /** Snapshot-diff data card: what changed between two corpus versions,
    * per source — the release note every dataset version bump needs
    * (and the guard against a silently shrinking or text-churning
    * source). Rows are matched by id; content equality is the md5
    * fingerprint (the q17 contract), so a re-crawled page with
    * identical bytes is `stable`, not `changed`. Output per source:
    * added/removed/changed/stable row counts, token mass entering
    * (added) and leaving (removed), and the net token delta including
    * in-place edits.
    *
    * Scale shape: one id-keyed FULL OUTER join of (id, source,
    * fingerprint, token count) projections — fingerprints and counts
    * computed on the scan, text itself never joins — then one
    * |sources|-row combinable aggregate. */
  def corpusDiffCard(oldDocs: DataFrame, newDocs: DataFrame, idCol: String,
                     textCol: String, srcCol: String): DataFrame = {
    // presence is a literal flag, NOT hash-null (a null-text row in one
    // snapshot must read as changed/stable by id presence, never
    // masquerade as added/removed); content compare is null-safe <=>
    def prep(df: DataFrame, side: String) = df.select(
      col(idCol).as("__id"),
      lit(true).as(s"__p_$side"),
      col(srcCol).as(s"__src_$side"),
      md5(col(textCol).cast("binary")).as(s"__h_$side"),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as(s"__t_$side"))
    val j = prep(oldDocs, "o")
      .join(prep(newDocs, "n"), Seq("__id"), "full_outer")
    val added = col("__p_o").isNull
    val removed = col("__p_n").isNull
    val changed = col("__p_o").isNotNull && col("__p_n").isNotNull &&
      !(col("__h_o") <=> col("__h_n"))
    j.groupBy(coalesce(col("__src_n"), col("__src_o")).as("source"))
      .agg(
        sum(when(added, 1L).otherwise(0L)).as("n_added"),
        sum(when(removed, 1L).otherwise(0L)).as("n_removed"),
        sum(when(changed, 1L).otherwise(0L)).as("n_changed"),
        sum(when(!added && !removed && !changed, 1L).otherwise(0L)).as("n_stable"),
        // coalesce INSIDE the when: a side whose every row is added (or
        // removed) with null text would otherwise sum to NULL while the
        // oracle's COALESCE'd filtered sum reads 0
        sum(when(added, coalesce(col("__t_n"), lit(0L))).otherwise(0L)).as("tok_added"),
        sum(when(removed, coalesce(col("__t_o"), lit(0L))).otherwise(0L)).as("tok_removed"),
        (sum(coalesce(col("__t_n"), lit(0L))) -
          sum(coalesce(col("__t_o"), lit(0L)))).as("tok_net"))
  }
}
