package graft.operators

import graft.functions.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking: split each document into fixed-size token windows
  * with overlap — the context-window packing step between curation and
  * tokenization in a training-data pipeline (and the unit RAG indexes
  * embed). Pure per-row explosion: chunk i of a doc covers tokens
  * `[i·step, i·step + chunkTokens)` with `step = chunkTokens − overlap`,
  * the last chunk may run short, and a short doc yields exactly one
  * chunk.
  *
  * Scale shape: zero shuffles, zero joins — one `explode` over a
  * per-row `sequence` whose length is ⌈tokens/step⌉; output row count
  * is ~(1 + overlap/step)× the token volume, the inherent cost of
  * overlapping windows. Chunk counts use pure INTEGER arithmetic
  * (`div`), so a SQL oracle reproduces the exact chunk boundaries.
  */
object Chunking {

  def chunkDocuments(docs: DataFrame, idCol: String, textCol: String,
                     chunkTokens: Int, overlap: Int): DataFrame = {
    require(chunkTokens >= 1 && overlap >= 0 && overlap < chunkTokens,
      "need chunkTokens >= 1 and 0 <= overlap < chunkTokens")
    val step = chunkTokens - overlap
    val n = col("__n")
    // n <= chunkTokens -> 1 chunk; else 1 + ceil((n - chunkTokens)/step)
    // in integer math: 1 + (n - chunkTokens + step - 1) div step
    val nStarts = when(n <= chunkTokens, lit(1L))
      .otherwise(expr(s"1L + (__n - $chunkTokens + ${step - 1}) div $step"))
    docs
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")).cast("long"))
      .where(n >= 1)
      .withColumn("chunk_id", explode(sequence(lit(0L), nStarts - 1)))
      .select(col(idCol), col("chunk_id"),
        least(lit(chunkTokens.toLong), n - col("chunk_id") * step).as("chunk_tokens"),
        array_join(slice(col("__toks"),
          (col("chunk_id") * step + 1).cast("int"), lit(chunkTokens)), " ").as("chunk_text"))
  }

  /** Greedy training-sequence packing (the GPT-style concat-and-slice
    * step): per domain, documents concatenate in ascending-id order
    * into one token stream that is then cut into `seqTokens`-sized
    * sequences; each doc is labeled with the sequence its FIRST token
    * falls in and its offset there (a doc may spill into the next
    * sequence — that is the packing contract; samplers mask across the
    * boundary). All integer arithmetic over an exclusive running sum —
    * deterministic on any engine/partitioning.
    *
    * Scale shape: ONE window sort per domain (spillable, no driver
    * state) over rows that carry only (id, n_tokens) — the text column
    * never enters the window. */
  def packSequences(docs: DataFrame, idCol: String, domainCol: String,
                    nTokens: org.apache.spark.sql.Column,
                    seqTokens: Int): DataFrame = {
    require(seqTokens >= 1)
    // explicit ROWS frame: the default RANGE frame treats duplicate
    // (domain, id) rows as peers and folds BOTH into each row's
    // "exclusive" prefix — the ROWS frame (what the oracle also
    // specifies) keeps the running sum per physical row
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(domainCol)).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    docs
      .select(col(idCol), col(domainCol), nTokens.cast("long").as("n_tokens"))
      .withColumn("__start",
        coalesce(sum(col("n_tokens")).over(w) - col("n_tokens"), lit(0L)))
      .select(col(idCol), col(domainCol), col("n_tokens"),
        expr(s"__start div $seqTokens").as("seq_id"),
        (col("__start") % seqTokens).as("seq_offset"))
  }

  /** Packing-efficiency report: for each candidate context length, the
    * padding bill of one-doc-per-sequence packing (each doc split to
    * ⌈n/L⌉ sequences, the last padded to L) vs the zero-pad
    * cross-document concat baseline of [[sequencePack]] — the table
    * that decides a training run's context length and whether concat
    * packing is worth its attention-mask complexity (the efficiency
    * gap IS the token budget recovered).
    *
    * Determinism: pure integer arithmetic end-to-end — ⌈⌉ via the
    * (a + b − 1) div b idiom on non-negative operands; both efficiency
    * ratios are shifted half-up intDiv micro forms.
    *
    * Scale shape: ONE corpus scan; the per-L explosion multiplies rows
    * by |seqLens| BEFORE a combinable agg to |seqLens| rows — no join,
    * no window, corpus-order independent. Output: (seq_len, n_docs,
    * total_tokens, n_seqs_padded, pad_tokens, eff_padded_micro,
    * eff_concat_micro). */
  def packingEfficiency(docs: DataFrame, textCol: String,
                        seqLens: Seq[Int] = Seq(512, 1024, 2048)): DataFrame = {
    import graft.expressions.HashExpressions.intDiv
    require(seqLens.nonEmpty && seqLens.forall(_ >= 1), "need positive seq lens")
    val n = TextAnalysis.tokenCount(col(textCol)).cast("long")
    // ·2e6 in DECIMAL(38,0): BIGINT·2e6 overflows first at ~5e12 total
    // tokens — mirrors the oracle's HUGEINT sum arithmetic (q121 rule)
    def effMicro(tok: Column, cap: Column): Column =
      intDiv(tok.cast("decimal(38,0)") * lit(2000000L) + cap.cast("decimal(38,0)"),
        lit(2L) * cap.cast("decimal(38,0)"))
    docs.select(n.as("__n"))
      .select(col("__n"),
        explode(array(seqLens.map(l => lit(l.toLong)): _*)).as("seq_len"))
      .withColumn("__seqs", intDiv(col("__n") + col("seq_len") - 1, col("seq_len")))
      .groupBy("seq_len")
      .agg(count(lit(1)).as("n_docs"), sum("__n").as("total_tokens"),
        sum("__seqs").as("n_seqs_padded"))
      .withColumn("pad_tokens",
        col("n_seqs_padded") * col("seq_len") - col("total_tokens"))
      .withColumn("eff_padded_micro",
        effMicro(col("total_tokens"), col("n_seqs_padded") * col("seq_len")))
      .withColumn("eff_concat_micro",
        effMicro(col("total_tokens"),
          intDiv(col("total_tokens") + col("seq_len") - 1, col("seq_len"))
            * col("seq_len")))
  }
}
