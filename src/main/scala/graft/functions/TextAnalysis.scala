package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale document pipelines:
  * normalization, fingerprinting, token statistics, quality scoring and
  * n-gram-heuristic language ID. All are pure `Column` expressions
  * (whole-stage-codegen'd, no UDFs) so they stay inside the scan's
  * codegen span and scale linearly over 100 TB of documents.
  *
  * Every function has an exact ANSI-SQL twin (see `SparkEntry.oracleSql`)
  * so results are DuckDB-verifiable.
  */
object TextAnalysis {

  /** Lowercase, strip non-alphanumerics, collapse whitespace.
    * Single-scan codegen kernel (`NormalizeText`); semantically equal to
    * `trim(regexp_replace(regexp_replace(lower(t),'[^a-z0-9 ]',' '),' +',' '))`
    * — the formulation the DuckDB oracles keep using. */
  def normText(text: Column): Column =
    graft.expressions.NormalizeText.normText(text)

  /** Deterministic document fingerprint: md5 of the normalized text.
    * (md5 is bit-identical across engines, unlike murmur/xxhash.) */
  def fingerprint(text: Column): Column = md5(normText(text))

  def tokens(text: Column): Column = split(normText(text), " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish sub-token count: alpha runs, digit runs, other symbols. */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  val EnStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "or", "to", "in", "is", "it")

  def stopwordCount(text: Column, stop: Seq[String] = EnStopwords): Column =
    size(filter(tokens(text), t => t.isin(stop.map(lit(_)): _*)))

  /** Heuristic quality score in [0,1]:
    * 0.4 * length saturation (chars/500 capped at 1)
    * + 0.3 * stopword-ratio saturation (ratio/0.1 capped at 1)
    * + 0.3 * mean-token-length plausibility (in [3,8] chars).
    * Arithmetic is double-only on integer counts → bit-exact vs DuckDB.
    */
  def qualityScore(text: Column): Column = {
    val nChars = length(text).cast("double")
    val nToks = tokenCount(text).cast("double")
    val nStop = stopwordCount(text).cast("double")
    val lenScore = least(nChars / 500.0, lit(1.0))
    val stopScore = least(nStop / nToks / 0.1, lit(1.0))
    val meanTok = length(regexp_replace(normText(text), " ", "")).cast("double") / nToks
    val tokScore = when(meanTok >= 3.0 && meanTok <= 8.0, 1.0).otherwise(0.0)
    lenScore * 0.4 + stopScore * 0.3 + tokScore * 0.3
  }

  /** Exact 6-dp micro-units of [[qualityScore]], computed ENTIRELY in
    * integer arithmetic (the CLAUDE.md integer-ratio tie rule): the
    * score is a sum of exact-integer ratios — 0.4·min(c,500)/500 is
    * integral (= 800·min(c,500) micro), the mean-token-length band is
    * two integer comparisons, and the only fractional term,
    * 0.3·min(10s/n, 1), is rounded half-up in micro-units via the
    * shifted intDiv form (2x+y) div (2y) with x = 3·10⁶·s, y = n ≥ 1
    * (normText of "" splits to [""], so n is never 0). A
    * round(double·1e6) here can land on an exact 6th-decimal tie where
    * Spark's shortest-repr HALF_UP and DuckDB's exact-binary round
    * diverge — and downstream a one-ulp flip moves a whole row in or
    * out of a sample (q85) or shifts a mean (q81). */
  def qualityMicro(text: Column): Column = {
    import graft.expressions.HashExpressions.intDiv
    val c = length(text).cast("long")
    val n = tokenCount(text).cast("long")
    val s = stopwordCount(text).cast("long")
    val t1 = least(c, lit(500L)) * lit(800L)
    val t2 = when(s * lit(10L) >= n, lit(300000L))
      .otherwise(intDiv(s * lit(6000000L) + n, n * lit(2L)))
    val nc = length(regexp_replace(normText(text), " ", "")).cast("long")
    val t3 = when(nc >= n * lit(3L) && nc <= n * lit(8L), lit(300000L))
      .otherwise(lit(0L))
    t1 + t2 + t3
  }

  /** Character-distribution stats over the RAW text's codepoints:
    * `struct<n_chars, n_unique, entropy>` in one codegen pass (see
    * `graft.expressions.CharEntropy`). Low entropy = repeated-char
    * spam / degenerate boilerplate; the standard cheap quality filter
    * next to length and stopword ratios. Entropy is unrounded — round
    * at 6 dp before emitting (metric-double rule). */
  def charStats(text: Column): Column =
    graft.expressions.CharEntropy.charEntropyStats(text)

  /** Marker stopword sets per language for the n-gram-heuristic
    * language ID. Deterministic argmax with fixed preference order. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is", "to", "in", "it"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "es" -> Seq("el", "la", "de", "y", "es", "que", "un"),
    "fr" -> Seq("le", "la", "et", "les", "des", "est", "une"))

  def langScore(text: Column, lang: String): Column = {
    val markers = LangMarkers.toMap.apply(lang)
    size(filter(tokens(text), t => t.isin(markers.map(lit(_)): _*)))
  }

  /** Gopher-style document quality rules (Rae et al. 2021, "Scaling
    * Language Models: ... Gopher", Appendix A1.1), adapted to the
    * signals available from normalized text — each rule is an
    * independent boolean column so the filter REASON is observable
    * (pipelines report per-rule rejection rates, not just a keep bit):
    *
    *  - `r_words`:    token count within [minWords, maxWords]
    *  - `r_mean_len`: mean token length within [3, 10] chars
    *  - `r_stop`:     ≥ 2 DISTINCT stopword hits (the "contains
    *                  common English words" rule)
    *  - `r_alpha`:    ≥ 80% of tokens contain an alphabetic char
    *  - `r_rep`:      2-gram repetition ratio ≤ 0.5 (the duplicate
    *                  n-gram rule; line-based duplicate rules don't
    *                  apply to single-line normalized text)
    *  - `keep`:       conjunction of all rules
    *
    * All per-row `Column` arithmetic over integer counts (gram
    * distincts via the codegen `GramHashes` kernel) — no UDFs, no
    * shuffle; the whole rule set rides the document scan. */
  def gopherRules(text: Column, minWords: Int = 50,
                  maxWords: Int = 100000): Column = {
    val toks = tokens(text)
    val nToks = size(toks).cast("double")
    val meanLen = length(regexp_replace(normText(text), " ", "")).cast("double") / nToks
    val nStopDistinct = size(array_intersect(toks,
      array(EnStopwords.map(lit(_)): _*)))
    val nAlpha = size(filter(toks, t => t.rlike("[a-z]"))).cast("double")
    val nGrams = size(toks) - 1
    val nDistinct = size(graft.expressions.HashExpressions.gramHashes(toks, 2))
    val rWords = size(toks) >= minWords && size(toks) <= maxWords
    val rMeanLen = meanLen >= 3.0 && meanLen <= 10.0
    val rStop = nStopDistinct >= 2
    val rAlpha = nAlpha / nToks >= 0.8
    // docs too short to form a 2-gram have nothing to repeat → ratio 0
    val rRep = when(nGrams >= 1,
      lit(1.0) - nDistinct.cast("double") / nGrams.cast("double"))
      .otherwise(lit(0.0)) <= 0.5
    struct(
      rWords.as("r_words"), rMeanLen.as("r_mean_len"), rStop.as("r_stop"),
      rAlpha.as("r_alpha"), rRep.as("r_rep"),
      (rWords && rMeanLen && rStop && rAlpha && rRep).as("keep"))
  }

  /** Hashed-feature linear quality classifier (fasttext-style shape
    * with a deterministic pseudo-weight table — see
    * [[graft.expressions.HashedWeightSum]]):
    * `struct<n_tokens, w_sum, logit, label>` where
    * logit = w_sum / (n_tokens · 500) ∈ [-1, 1] at 6 dp and
    * label = (w_sum >= 0). (Deliberately NOT sigmoid: exp is not
    * correctly rounded cross-engine.)
    *
    * The 6-dp logit is computed ENTIRELY in integer arithmetic: the
    * exact rational w_sum/(500n) lands exactly on 6th-decimal ties
    * (seen at sf0.1: −2094/32000 = −0.0654375, which Spark's
    * shortest-repr HALF_UP and DuckDB's exact-binary round send to
    * DIFFERENT sides — the CLAUDE.md derived-double trap), so instead
    * of round(double): shift to a' = w_sum + 500n ≥ 0 (every operand
    * non-negative, so floor-div ≡ `div` ≡ DuckDB `//`), then
    * half-up micro-units = (2·a'·10⁶ + 500n) div (1000n), unshift,
    * and the ONLY double op is the final /10⁶ (correctly rounded,
    * identical everywhere). Fits a long for any n < 4.6e9 tokens.
    * Pure per-row kernel riding the scan: at 100 TB this classifies
    * in the map phase with zero shuffle. */
  def hashedClassifier(text: Column, vocab: Int = 4096): Column = {
    import graft.expressions.HashExpressions.intDiv
    val toks = tokens(text)
    val wSum = graft.expressions.HashExpressions.hashedWeightSum(toks, vocab, 1001)
    val n = size(toks).cast("long")
    val aPrime = wSum + lit(500L) * n
    val micro = intDiv(aPrime * lit(2000000L) + lit(500L) * n, lit(1000L) * n)
    struct(
      size(tokens(text)).as("n_tokens"), wSum.as("w_sum"),
      ((micro - lit(1000000L)).cast("double") / 1e6).as("logit"),
      (wSum >= 0).as("label"))
  }

  /** Predicted language = first language (in LangMarkers order) whose
    * marker count equals the max; "und" if no marker hits at all. */
  def langId(text: Column): Column = {
    val scores = LangMarkers.map { case (l, _) => l -> langScore(text, l) }
    val mx = greatest(scores.map(_._2): _*)
    // first language (in LangMarkers order) reaching the max wins
    val first = scores.foldLeft(lit(null).cast("string")) { case (acc, (l, s)) =>
      coalesce(acc, when(s === mx, lit(l)))
    }
    when(mx === 0, lit("und")).otherwise(first)
  }
}
