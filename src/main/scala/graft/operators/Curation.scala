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
}
