package graft.operators

import graft.functions.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** Corpus-level term statistics for training-data curation: the
  * vocabulary views a pipeline consults before filtering (heavy
  * hitters), weighting (TF-IDF) or profiling (token-count quantiles) a
  * document set. All plans are shuffle-minimal and skew-aware:
  * per-(token, doc) pre-aggregation bounds any hot token's partition to
  * the distinct-doc count, and quantiles are computed with a
  * distributed sort — never by buffering a group's values in memory
  * (Spark's exact `percentile` aggregate does, which caps it at
  * driver-scale groups; this formulation survives 100 TB).
  */
object CorpusStats {

  private def tokenized(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      explode(TextAnalysis.tokens(col(textCol))).as("token"))

  /** Top-k corpus tokens by total occurrences (ties broken by token).
    * Two map-combinable shuffles: (token, doc) pre-agg — which also
    * de-skews ubiquitous tokens — then per-token totals; the top-k is a
    * TakeOrderedAndProject, not a global sort. Output: rank, token,
    * n_occurrences, n_docs. */
  def heavyHitterTokens(docs: DataFrame, idCol: String, textCol: String,
                        k: Int): DataFrame = {
    val perDoc = tokenized(docs, idCol, textCol)
      .groupBy("token", "doc_id").agg(count(lit(1)).as("n_in_doc"))
    val counts = perDoc.groupBy("token").agg(
      sum("n_in_doc").as("n_occurrences"), count(lit(1)).as("n_docs"))
    val topK = counts.orderBy(desc("n_occurrences"), asc("token")).limit(k)
    // the window ranks only the k surviving rows — not the vocabulary
    topK.withColumn("rank",
        row_number().over(Window.orderBy(desc("n_occurrences"), asc("token"))))
      .select("rank", "token", "n_occurrences", "n_docs")
  }

  /** Per-group corpus "data card": the one-pass summary a curation
    * pipeline publishes alongside a released dataset (docs, tokens,
    * exact-dup counts, token-count range, quality mass) grouped by
    * arbitrary columns — typically (source, lang).
    *
    * ONE scan + two map-combinable shuffles: the exact dup count
    * (count-distinct of the fingerprint) forces a (keys, fp) dedup
    * stage before the group-key stage — both partial-aggregate
    * map-side, so per-mapper output is bounded by distinct keys, not
    * rows. Every other statistic is algebraic (count / sum / min /
    * max) and rides the same stages. Quality is aggregated as exact integer
    * MICRO-units — `round(q·1e6)` of the 6-dp-rounded score — because
    * summing doubles is order-dependent under distribution and casting
    * a derived double to DECIMAL is the known Spark/DuckDB tie-rounding
    * trap (CLAUDE.md); the integer sum is order-independent and
    * engine-exact, and the mean divides it back out deterministically.
    *
    * Output per group: n_docs, n_dup_docs (docs beyond the first with
    * an identical normalized fingerprint), n_tokens, min_toks,
    * max_toks, mean_quality (6 dp). */
  def corpusCard(docs: DataFrame, idCol: String, textCol: String,
                 groupCols: Seq[String]): DataFrame = {
    val perDoc = docs.select(
      groupCols.map(col) :+
        TextAnalysis.fingerprint(col(textCol)).as("__fp") :+
        TextAnalysis.tokenCount(col(textCol)).as("__toks") :+
        TextAnalysis.qualityMicro(col(textCol)).as("__q_micro"): _*)
    // mean_quality: Σq_micro/n is a ratio of exact integers — half-up
    // micro via the shifted intDiv form, never round(double, 6)
    // (CLAUDE.md tie rule; both operands non-negative).
    val sq = sum(col("__q_micro"))
    val n = count(lit(1))
    perDoc.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_docs"),
        (count(lit(1)) - countDistinct(col("__fp"))).as("n_dup_docs"),
        sum(col("__toks")).as("n_tokens"),
        min(col("__toks")).as("min_toks"),
        max(col("__toks")).as("max_toks"),
        (graft.expressions.HashExpressions.intDiv(sq * lit(2L) + n, n * lit(2L))
          .cast("double") / 1e6).as("mean_quality"))
  }

  /** Top-`topPerDoc` TF-IDF terms per document.
    *
    * idf = ln(N / df) with N computed IN the plan (a broadcast 1-row
    * aggregate, no driver action); tf ⋈ df is a token-key shuffle join
    * (df can be vocabulary-sized — never broadcast it). Ranking uses
    * the ROUNDED score (6 dp) with the token as tiebreak, so the
    * ranking is reproducible engine-to-engine even where libm `ln`
    * differs in the last ulp (the repo's metric-double rule). */
  def tfIdf(docs: DataFrame, idCol: String, textCol: String,
            topPerDoc: Int): DataFrame = {
    // cached: tf feeds BOTH the df aggregation and the join — uncached,
    // Catalyst re-scans and re-tokenizes the whole corpus for each use.
    // tf is the per-(doc, token) aggregate (~10× smaller than the text;
    // spills to disk if memory-tight), the standard thing to persist.
    // Lifecycle: CacheScope-scoped — released after the first action on
    // the returned frame.
    val tf = tokenized(docs, idCol, textCol)
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
      .cache()
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, "token").crossJoin(broadcast(n))
      .withColumn("tfidf", round(col("tf") * log(col("n_docs") / col("df")), 6))
    val w = Window.partitionBy("doc_id").orderBy(desc("tfidf"), asc("token"))
    CacheScope.scoped(scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= topPerDoc)
      .select("doc_id", "rank", "token", "tfidf"), tf)
  }

  /** Exact token-count distribution per group: count, total, mean and
    * linearly-interpolated quantiles (the `quantile_cont` definition:
    * idx = (n-1)·p; v = v_lo·(1-frac) + v_hi·frac).
    *
    * Distributed: one window sort per group (spillable), then one
    * combinable aggregation — each quantile is a conditional sum over
    * the two bracketing ranks, so NO group's values are ever buffered.
    * The interpolation arithmetic is spelled out (not a built-in) so an
    * oracle running the same IEEE ops reproduces it bit-for-bit. */
  def tokenQuantiles(docs: DataFrame, groupCol: String, textCol: String,
                     ps: Seq[Double] = Seq(0.5, 0.9, 0.99)): DataFrame = {
    val base = docs.select(col(groupCol).as("grp"),
      TextAnalysis.tokenCount(col(textCol)).cast("double").as("v"))
    val ranked = base
      .withColumn("rn", row_number().over(Window.partitionBy("grp").orderBy("v")))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("grp")))
    val quantileCols = ps.map { p =>
      val idx = (col("n") - 1).cast("double") * lit(p)
      val lo = floor(idx) + 1 // rn is 1-based
      val frac = idx - floor(idx)
      // ties in v make rank assignment among equals irrelevant: the
      // bracketing values are equal whichever row got the rank
      val contrib = when(col("rn") === lo, col("v") * (lit(1.0) - frac))
        .when(col("rn") === lo + 1, col("v") * frac)
        .otherwise(lit(0.0))
      round(sum(contrib), 6).as(s"p${(p * 100).toInt}_tokens")
    }
    val aggs = Seq(count(lit(1)).as("n_docs"),
      sum(col("v").cast("long")).as("total_tokens")) ++ quantileCols
    ranked.groupBy(col("grp").as(groupCol))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("avg_tokens",
        round(col("total_tokens").cast("double") / col("n_docs").cast("double"), 6))
  }

  /** KMV sketch buffer: the ≤ k smallest DISTINCT hashes seen, ascending.
    * Inserts short-circuit once full unless the hash beats the current
    * max, so steady-state cost is O(1) per row. */
  final case class KmvBuf(k: Int, items: List[Long]) {
    def insert(h: Long): KmvBuf =
      if (items.length >= k && h >= items.last) this
      else if (items.contains(h)) this
      else copy(items = (h :: items).sorted.take(k))
    def merge(o: KmvBuf): KmvBuf =
      copy(items = (items ++ o.items).distinct.sorted.take(k))
  }

  /** Mergeable k-minimum-values distinct-count aggregator over 48-bit
    * hashes: n̂ = (k−1)·2⁴⁸ / h₍ₖ₎ (Bar-Yossef '02), exact when fewer
    * than k distinct values were seen. Emits (n_kept, estimate). */
  final class KmvDistinct(k: Int)
      extends Aggregator[Long, KmvBuf, (Long, Double)] {
    override def zero: KmvBuf = KmvBuf(k, Nil)
    override def reduce(b: KmvBuf, h: Long): KmvBuf = b.insert(h)
    override def merge(a: KmvBuf, b: KmvBuf): KmvBuf = a.merge(b)
    override def finish(r: KmvBuf): (Long, Double) = {
      val kept = r.items.length.toLong
      val est =
        if (kept < k) kept.toDouble
        else (k - 1).toDouble * 281474976710656.0 / r.items.last.toDouble
      (kept, est)
    }
    override def bufferEncoder: Encoder[KmvBuf] = Encoders.kryo[KmvBuf]
    override def outputEncoder: Encoder[(Long, Double)] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long, Double)]()
  }

  /** [[KmvDistinct]]'s VALUE-emitting sibling: the sorted bottom-k
    * distinct hashes themselves (for set-operation estimates that need
    * the sample, not just its size — [[kmvSourceOverlap]]). Same
    * dedup-in-buffer semantics, so the input needs no global distinct:
    * the sketch build is one map-combinable shuffle of ≤k-value
    * buffers. */
  final class KmvSketch(k: Int) extends Aggregator[Long, KmvBuf, Seq[Long]] {
    override def zero: KmvBuf = KmvBuf(k, Nil)
    override def reduce(b: KmvBuf, h: Long): KmvBuf = b.insert(h)
    override def merge(a: KmvBuf, b: KmvBuf): KmvBuf = a.merge(b)
    override def finish(r: KmvBuf): Seq[Long] = r.items
    override def bufferEncoder: Encoder[KmvBuf] = Encoders.kryo[KmvBuf]
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Per-group distinct word-n-gram cardinality: exact count next to the
    * KMV estimate — the sketch a 100 TB profile pass ships INSTEAD of
    * the exact count (the exact column here is the built-in contrast;
    * drop it at scale and the whole operator is one map-combinable
    * shuffle of k-sized buffers, O(k) state per group — no
    * distinct-value shuffle at all).
    *
    * Hashes are the md5-48 `Md5GramHashes48` kernel values, so the
    * order statistic entering the estimate — and therefore the emitted
    * DOUBLE itself — is reproduced exactly by a SQL oracle (a rare
    * property for an approximate operator: the approximation is
    * deterministic and engine-portable, not a random sketch). */
  def kmvDistinctGrams(docs: DataFrame, groupCol: String, textCol: String,
                       n: Int, k: Int): DataFrame = {
    val kmv = udaf(new KmvDistinct(k))
    val hashes = docs
      .select(col(groupCol).as("grp"), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .where(size(col("__toks")) >= n)
      .select(col("grp"),
        explode(graft.expressions.HashExpressions.md5GramHashes48(col("__toks"), n)).as("h"))
    hashes.groupBy(col("grp").as(groupCol))
      .agg(countDistinct(col("h")).as("n_exact"), kmv(col("h")).as("__kmv"))
      .select(col(groupCol), col("n_exact"),
        col("__kmv._1").as("n_kept"),
        round(col("__kmv._2"), 6).as("est_distinct_grams"))
  }

  /** Mean unigram log-probability per document — the LM-free
    * perplexity proxy a curation pipeline uses to rank docs by
    * "typicality" under the corpus's own unigram distribution (very
    * low = gibberish/OCR noise, very high = stopword soup; both tails
    * get filtered). p(tok) = corpus count / total tokens; score =
    * mean over the doc's tokens of ln p(tok), rounded 6dp.
    *
    * Plan: the [[tfIdf]] shape minus the rank window — the vocabulary
    * aggregate (cached, plan-keyed) feeds a token-key shuffle join
    * back to the token stream (the vocabulary can be corpus-scale:
    * never broadcast), with the total-token count computed IN-plan as
    * a broadcast 1-row aggregate. One corpus-sized combinable shuffle
    * + one token-key join + one per-doc aggregate. */
  def unigramLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = tokenized(docs, idCol, textCol).cache()
    val vocab = tok.groupBy("token").agg(count(lit(1)).as("c"))
    val total = tok.agg(count(lit(1)).as("n_total"))
    CacheScope.scoped(tok.join(vocab, "token").crossJoin(broadcast(total))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(log(col("c").cast("double") / col("n_total").cast("double"))) /
          count(lit(1)), 6).as("mean_logprob"))
      .select(col("doc_id").as(idCol), col("n_tokens"), col("mean_logprob")), tok)
  }

  /** Idf-weighted gram-cosine near-dup pairs: document similarity
    * through the INVERTED INDEX (gram-key join), never an embedding or
    * an all-pairs product — the WEIGHTED lexical complement to
    * `Dedup.ngramJaccardPairs` (Jaccard counts every shared gram
    * equally; here a rare shared gram outweighs a common one). Docs
    * are binary vectors over their DISTINCT n-gram hashes with weight
    * w = ln(N/df); cos = Σ_shared w² / (|w_a||w_b|). Same hot-gram
    * guard as q18: df > maxGramDf grams are boilerplate — broadcast
    * anti-join drops them (near-zero weight, quadratic pair volume).
    *
    * Determinism: weights are exact-input doubles; per-pair and
    * per-doc Σ run in engine-arbitrary order, so the emitted cosine is
    * rounded 6dp and the threshold compares the ROUNDED value (metric
    * rule). Output: (id_a, id_b, n_shared, cos_sim) with id_a < id_b. */
  /** Cross-SOURCE contamination matrix: for every source pair, how
    * many distinct word n-grams they share and the gram-set Jaccard —
    * the provenance diagnostic ("is src A scraping src B?", "are two
    * dumps the same crawl?") a corpus intake runs BEFORE doc-level
    * dedup decides what to drop.
    *
    * Scale shape: grams dedup to DISTINCT (source, gram) rows first
    * (the per-doc explode never survives), so the self-join on the
    * gram key emits ≤ C(s_g, 2) rows per gram where s_g ≤ |sources| —
    * pair volume is bounded by |sources|²·grams, NOT docs². The
    * |sources|-is-catalog-sized assumption (tens to hundreds) is the
    * documented contract; with thousands of sources, pre-bucket
    * sources first. Output rows: ≤ C(|sources|, 2).
    *
    * Output: (source_a < source_b, n_shared, jaccard 6 dp). */
  def sourceOverlapMatrix(docs: DataFrame, srcCol: String, textCol: String,
                          n: Int): DataFrame = {
    val g = docs
      .select(col(srcCol).as("__src"), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .where(size(col("__toks")) >= n)
      .select(col("__src"),
        explode(graft.expressions.HashExpressions.gramHashes(col("__toks"), n)).as("gh"))
      .distinct()
      .cache()
    val sizes = g.groupBy("__src").agg(count(lit(1)).as("__n"))
    val shared = g.select(col("__src").as("source_a"), col("gh"))
      .join(g.select(col("__src").as("source_b"), col("gh")), "gh")
      .where(col("source_a") < col("source_b"))
      .groupBy("source_a", "source_b").agg(count(lit(1)).as("n_shared"))
    CacheScope.scoped(shared
      .join(sizes.select(col("__src").as("source_a"), col("__n").as("__na")), "source_a")
      .join(sizes.select(col("__src").as("source_b"), col("__n").as("__nb")), "source_b")
      .select(col("source_a"), col("source_b"), col("n_shared"),
        round(col("n_shared").cast("double") /
          (col("__na") + col("__nb") - col("n_shared")).cast("double"), 6)
          .as("jaccard")), g)
  }

  /** KMV-sketch pairwise source overlap — [[sourceOverlapMatrix]]'s
    * scale path for the MANY-sources regime its contract excludes:
    * per source, the k smallest distinct 48-bit gram hashes (the KMV
    * bottom-k sketch, q52's estimator); for each source pair, the k
    * smallest of the MERGED sample give
    *   jaccard_est = |in both| / k            (Beyer et al. 2007)
    *   union_est   = (k−1)·2^48 / h_k         (q52's KMV form)
    * so the pairwise pass touches only |sources|·k sketch rows —
    * corpus-size-independent — instead of q89's |sources|²·grams join
    * volume.
    *
    * The sketch is DETERMINISTIC (bottom-k of md5-derived hashes — no
    * RNG), so even the estimation ERROR is engine-exact and the whole
    * estimate has an exact DuckDB oracle (the q69 profile-on-a-sample
    * property). jaccard_est's 6-dp rounding uses the integer half-up
    * form (q82's rule: n/m can land exactly on a 6th-decimal tie);
    * union_est mirrors q52's double form. Emits ALL pairs (n_both = 0
    * included) — the sketch makes the full matrix cheap.
    *
    * Output: (source_a < source_b, sample_k = |merged sample| ≤ k,
    * n_both, jaccard_est, union_est). */
  def kmvSourceOverlap(docs: DataFrame, srcCol: String, textCol: String,
                       n: Int, k: Int = 64): DataFrame = {
    import graft.expressions.HashExpressions.intDiv
    import org.apache.spark.sql.expressions.Window
    // the sketch build is ONE map-combinable shuffle of ≤k-value
    // buffers ([[KmvSketch]] dedups in-buffer) — NOT a corpus-wide
    // distinct + per-source sort, which costs a full shuffle+sort of
    // every distinct gram for a k-row result
    val sketch = udaf(new KmvSketch(k))
    val bk = docs
      .select(col(srcCol).as("__src"), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .where(size(col("__toks")) >= n)
      .select(col("__src"),
        explode(graft.expressions.HashExpressions.md5GramHashes48(col("__toks"), n)).as("h"))
      .groupBy("__src").agg(sketch(col("h")).as("__bk"))
      .select(col("__src"), explode(col("__bk")).as("h"))
      .cache()
    val srcs = bk.select("__src").distinct()
    val prs = broadcast(srcs.select(col("__src").as("source_a")))
      .crossJoin(broadcast(srcs.select(col("__src").as("source_b"))))
      .where(col("source_a") < col("source_b"))
    val fromA = prs.join(bk.withColumnRenamed("__src", "source_a"), Seq("source_a"))
      .select(col("source_a"), col("source_b"), col("h"),
        lit(1).as("__ina"), lit(0).as("__inb"))
    val fromB = prs.join(bk.withColumnRenamed("__src", "source_b"), Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("h"),
        lit(0).as("__ina"), lit(1).as("__inb"))
    val merged = fromA.unionByName(fromB)
      .groupBy("source_a", "source_b", "h")
      .agg(max(col("__ina")).as("__ina"), max(col("__inb")).as("__inb"))
    val topk = merged
      .withColumn("__r", row_number().over(
        Window.partitionBy("source_a", "source_b").orderBy("h")))
      .where(col("__r") <= k)
    CacheScope.scoped(topk.groupBy("source_a", "source_b")
      .agg(count(lit(1)).as("sample_k"),
        max(when(col("__r") === k, col("h"))).as("__hk"),
        sum(when(col("__ina") === 1 && col("__inb") === 1, 1L).otherwise(0L)).as("n_both"))
      .select(col("source_a"), col("source_b"), col("sample_k"), col("n_both"),
        (intDiv(col("n_both") * lit(2000000L) + col("sample_k"),
          col("sample_k") * lit(2L)).cast("double") / 1e6).as("jaccard_est"),
        // sample smaller than k ⟹ the union was fully sampled: exact
        round(when(col("__hk").isNull, col("sample_k").cast("double"))
          .otherwise(lit((k - 1).toDouble * 281474976710656.0) /
            col("__hk").cast("double")), 6).as("union_est")), bk)
  }

  def idfGramCosinePairs(docs: DataFrame, idCol: String, textCol: String,
                         n: Int, minCosine: Double, maxGramDf: Int): DataFrame = {
    val g = docs
      .select(col(idCol).as("doc_id"), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .where(size(col("__toks")) >= n)
      .select(col("doc_id"),
        explode(graft.expressions.HashExpressions.md5GramHashes48(col("__toks"), n)).as("h"))
      .cache()
    val dfreq = g.groupBy("h").agg(count(lit(1)).as("df"))
    val hot = dfreq.where(col("df") > maxGramDf).select("h")
    val nd = docs.agg(count(lit(1)).as("n_docs"))
    val w = g.join(broadcast(hot), Seq("h"), "left_anti")
      .join(dfreq, "h").crossJoin(broadcast(nd))
      .select(col("doc_id"), col("h"),
        log(col("n_docs").cast("double") / col("df").cast("double")).as("w"))
      // df == N grams weigh exactly 0: they add nothing to any dot or
      // norm, and a doc made ONLY of them would have a zero norm —
      // which under ANSI mode turns the cosine into a divide-by-zero
      .where(col("w") > 0)
      .cache()
    val norms = w.groupBy("doc_id")
      .agg(sqrt(sum(col("w") * col("w"))).as("nrm"))
    val pairDots = w.select(col("doc_id").as("id_a"), col("h"), col("w").as("wa"))
      .join(w.select(col("doc_id").as("id_b"), col("h"), col("w").as("wb")), "h")
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_shared"), sum(col("wa") * col("wb")).as("dot"))
    CacheScope.scoped(pairDots
      .join(norms.select(col("doc_id").as("id_a"), col("nrm").as("na")), "id_a")
      .join(norms.select(col("doc_id").as("id_b"), col("nrm").as("nb")), "id_b")
      .select(col("id_a"), col("id_b"), col("n_shared"),
        round(col("dot") / (col("na") * col("nb")), 6).as("cos_sim"))
      .where(col("cos_sim") >= minCosine), g, w)
  }

  /** BM25 full-text ranking (Robertson–Spärck Jones; k1/b literals):
    * score(d, q) = Σ_{t∈q} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·len/avgdl))
    * with idf = ln(1 + (N−df+0.5)/(df+0.5)). The retrieval operator a
    * corpus-search surface exposes; also the standard hard-negative
    * miner for embedding training.
    *
    * Plan: query terms are a literal filter pushed into the tf
    * aggregate; N/avgdl are a broadcast 1-row aggregate — ONE
    * corpus-sized combinable shuffle, one per-doc aggregate, top-k as
    * TakeOrderedAndProject. Scores are double sums over ≤|q| terms,
    * rounded 6dp, rank ties broken by doc id. */
  def bm25Search(docs: DataFrame, idCol: String, textCol: String,
                 queryTerms: Seq[String], k: Int,
                 k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty && k >= 1)
    val lens = docs.select(col(idCol).as("doc_id"),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("dl"))
    val stats = lens.agg(count(lit(1)).as("n_docs"), sum("dl").as("total_dl"))
    val tf = tokenized(docs, idCol, textCol)
      .where(col("token").isin(queryTerms.map(x => x: Any): _*))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(dfreq), "token")
      .join(lens, "doc_id").crossJoin(broadcast(stats))
      .withColumn("avgdl", col("total_dl").cast("double") / col("n_docs").cast("double"))
      .withColumn("idf", log(lit(1.0) +
        (col("n_docs").cast("double") - col("df").cast("double") + 0.5) /
          (col("df").cast("double") + 0.5)))
      .withColumn("term_score", col("idf") * (col("tf").cast("double") * lit(k1 + 1)) /
        (col("tf").cast("double") +
          lit(k1) * (lit(1 - b) + lit(b) * col("dl").cast("double") / col("avgdl"))))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_matched"), round(sum("term_score"), 6).as("score"))
    scored.orderBy(desc("score"), asc("doc_id")).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(desc("score"), asc("doc_id"))))
      .select("rank", "doc_id", "n_matched", "score")
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) of two rankings:
    * rrf(d) = Σ_lists 1/(c + rank_d), documents missing from a list
    * contribute nothing for it — the standard way to fuse a lexical
    * (BM25) and a dense (ANN) retriever without score calibration.
    * Inputs are (id, rank) frames; both are top-k-sized by
    * construction, so the fusion is a join of two SMALL lists — cost
    * lives in the retrievers, not here. 1/(c+rank) is a division of
    * exact integers and the two-term sum has a fixed order, so the
    * fused score is the same double on any engine (rounded 6dp for the
    * metric rule anyway). Ties break by id. */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String, k: Int,
              c: Int = 60): DataFrame = {
    val fa = a.select(col(idCol), (lit(1.0) / (col("rank").cast("double") + c)).as("sa"))
    val fb = b.select(col(idCol), (lit(1.0) / (col("rank").cast("double") + c)).as("sb"))
    fa.join(fb, Seq(idCol), "full_outer")
      .select(col(idCol),
        round(coalesce(col("sa"), lit(0.0)) + coalesce(col("sb"), lit(0.0)), 6)
          .as("rrf_score"),
        col("sa").isNotNull.as("in_lexical"), col("sb").isNotNull.as("in_dense"))
      .orderBy(desc("rrf_score"), asc(idCol)).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(desc("rrf_score"), asc(idCol))))
      .select("rank", idCol, "rrf_score", "in_lexical", "in_dense")
  }

  /** Count-min sketch over token frequencies (Cormode & Muthukrishnan
    * 2005): `d` hash rows × `w` buckets, cell = Σ counts of tokens
    * hashing there; estimate = min over the d cells — never an
    * UNDERcount. The fixed-size mergeable summary a pipeline ships
    * instead of a vocabulary when it only needs approximate frequencies
    * (trend monitors, per-shard token accounting).
    *
    * Built from the VOCABULARY aggregate, not the raw token stream:
    * counting (token → n) first is semantically identical and turns the
    * sketch build into a pass over |vocab| rows instead of the full
    * corpus token stream. Hash = md5-48("cms|r|token") mod w — exact
    * integers on any engine, so even the approximate estimates are
    * oracle-exact (same property as [[kmvDistinctGrams]]).
    *
    * Scale shape: ONE corpus-sized combinable shuffle (the vocab agg,
    * reused via the plan-keyed cache — see [[tfIdf]]'s lifecycle note);
    * the sketch agg has d·w groups and the d·w-row sketch BROADCASTS to
    * the top-k probe join. Output (top `topK` exact tokens, ties by
    * token): (rank, token, n_exact, n_est, overcount ≥ 0). */
  def cmsTokenEstimates(docs: DataFrame, idCol: String, textCol: String,
                        d: Int = 4, w: Int = 512, topK: Int = 30): DataFrame = {
    require(d >= 1 && w >= 1 && topK >= 1)
    val vocab = tokenized(docs, idCol, textCol)
      .groupBy("token").agg(count(lit(1)).as("n_exact"))
      .cache()
    def bucketOf(rCol: org.apache.spark.sql.Column, token: org.apache.spark.sql.Column) =
      conv(substring(md5(concat(lit("cms|"), rCol.cast("string"), lit("|"), token)
        .cast("binary")), 1, 12), 16, 10).cast("long") % w
    val rows = vocab.select(col("token"), col("n_exact"),
        explode(sequence(lit(0), lit(d - 1))).as("r"))
      .withColumn("bucket", bucketOf(col("r"), col("token")))
    val sketch = rows.groupBy("r", "bucket").agg(sum("n_exact").as("cell"))
    val top = vocab.orderBy(desc("n_exact"), asc("token")).limit(topK)
      .select(col("token"), col("n_exact"),
        explode(sequence(lit(0), lit(d - 1))).as("r"))
      .withColumn("bucket", bucketOf(col("r"), col("token")))
    CacheScope.scoped(top.join(broadcast(sketch), Seq("r", "bucket"))
      .groupBy("token", "n_exact")
      .agg(min("cell").as("n_est"))
      .withColumn("rank", row_number().over(
        Window.orderBy(desc("n_exact"), asc("token"))))
      .select(col("rank"), col("token"), col("n_exact"), col("n_est"),
        (col("n_est") - col("n_exact")).as("overcount")), vocab)
  }

  /** Top-V vocabulary with cumulative token-mass coverage — the
    * vocab-sizing / tokenizer-training diagnostic ("how many types
    * cover 90% of the corpus?", Zipf mass curve).
    *
    * Scale shape: ONE corpus-sized combinable shuffle (the vocab
    * aggregate); top-V via TakeOrderedAndProject (the `limit` runs
    * BEFORE the rank window, so the single-partition window frame is
    * ≤V rows — the repo's bounded-frame rule); total token mass is
    * Σn over the vocab aggregate (no second corpus scan), broadcast
    * as a 1-row aggregate. coverage = cum/total is a ratio of exact
    * integers → shifted intDiv half-up micro form (tie rule;
    * DECIMAL(38)-widened — cum·2·10⁶ overflows a long past ~4.6e12
    * corpus tokens, well inside the 100-TB design scale).
    *
    * Output: (rank, token, n, cum_n, coverage 6 dp). */
  def vocabCoverage(docs: DataFrame, idCol: String, textCol: String,
                    topV: Int): DataFrame = {
    import graft.expressions.HashExpressions.intDiv
    val vocab = tokenized(docs, idCol, textCol)
      .groupBy("token").agg(count(lit(1)).as("n"))
    val total = vocab.agg(sum("n").as("__tot"))
    val top = vocab.orderBy(desc("n"), asc("token")).limit(topV)
    val w = Window.orderBy(desc("n"), asc("token"))
    top
      .withColumn("rank", row_number().over(w))
      .withColumn("cum_n", sum("n").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(total))
      .select(col("rank"), col("token"), col("n"), col("cum_n"),
        (intDiv(
          col("cum_n").cast("decimal(38,0)") * lit(2000000L) + col("__tot"),
          col("__tot").cast("decimal(38,0)") * lit(2L))
          .cast("double") / 1e6).as("coverage"))
  }

  /** Adjacent-token (bigram) PMI collocations — phrase-mining /
    * multi-word-expression detection over the corpus:
    * pmi = ln p(ab) − ln p(a) − ln p(b) with p from the unigram/bigram
    * streams, reported for the top-K bigrams by count (count ranking is
    * exact; the PMI itself is the metric double, rounded 6 dp under the
    * q67 libm-parity contract with a FIXED evaluation order both
    * engines replay).
    *
    * Scale shape: bigram extraction is columnar slice/zip (codegen, no
    * lambda HOF) exploding to ~token-count rows; unigram and bigram
    * counts are each ONE map-combinable shuffle; the top-K frame
    * (`limit` before the rank window) BROADCASTS into the two unigram
    * lookups — the vocabulary (corpus-scale) is never broadcast and
    * never re-shuffled.
    *
    * Output: (rank, tok_a, tok_b, n_ab, n_a, n_b, pmi). */
  def pmiBigrams(docs: DataFrame, idCol: String, textCol: String,
                 minCount: Int, topK: Int): DataFrame = {
    val bi = docs
      .select(TextAnalysis.tokens(col(textCol)).as("__toks"))
      .where(size(col("__toks")) >= 2)
      .select(explode(arrays_zip(
        slice(col("__toks"), lit(1), size(col("__toks")) - 1).as("a"),
        slice(col("__toks"), lit(2), size(col("__toks")) - 1).as("b"))).as("__p"))
      .select(col("__p.a").as("tok_a"), col("__p.b").as("tok_b"))
    val uni = tokenized(docs, idCol, textCol)
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    val totals = uni.agg(sum("cnt").as("__u"))
    val big = bi.groupBy("tok_a", "tok_b").agg(count(lit(1)).as("n_ab"))
    val totB = big.agg(sum("n_ab").as("__b"))
    val top = big.where(col("n_ab") >= minCount)
      .orderBy(desc("n_ab"), asc("tok_a"), asc("tok_b")).limit(topK)
    val w = Window.orderBy(desc("n_ab"), asc("tok_a"), asc("tok_b"))
    // evaluation order is FIXED and mirrored in the oracle:
    // ((((ln n_ab + ln U) + ln U) − ln n_a) − ln n_b) − ln B
    val pmi =
      log(col("n_ab").cast("double")) + log(col("__u").cast("double")) +
        log(col("__u").cast("double")) - log(col("n_a").cast("double")) -
        log(col("n_b").cast("double")) - log(col("__b").cast("double"))
    broadcast(top)
      .join(uni.select(col("token").as("tok_a"), col("cnt").as("n_a")), "tok_a")
      .join(uni.select(col("token").as("tok_b"), col("cnt").as("n_b")), "tok_b")
      .crossJoin(broadcast(totals)).crossJoin(broadcast(totB))
      .withColumn("rank", row_number().over(w))
      .select(col("rank"), col("tok_a"), col("tok_b"), col("n_ab"),
        col("n_a"), col("n_b"), round(pmi, 6).as("pmi"))
  }

  /** Zipf rank-frequency fit over the top-R vocabulary: OLS of
    * ln(freq) on ln(rank) — slope (≈ −1 for natural text; far off
    * flags templated/synthetic corpora), intercept, and r². The
    * corpus-card regression a curation pipeline reads next to the
    * coverage curve ([[vocabCoverage]]).
    *
    * Determinism: Σx, Σy, Σxy, Σx², Σy² over the R points are DOUBLE
    * sums — order-dependent — so the ≤R-row frame is collected into
    * ONE rank-ordered array and folded left-to-right (`aggregate`,
    * interpreted but R-bounded, once per query — not hot-path) exactly
    * like the oracle's ordered `list_sum` folds (the q59 precedent);
    * `ln` under the q67 libm-parity contract.
    *
    * Scale shape: vocab aggregate (one combinable shuffle) →
    * TakeOrderedAndProject top-R → a single ≤R-element array on one
    * row. Output: one row (n_terms, slope, intercept, r2; 6 dp). */
  def zipfFit(docs: DataFrame, idCol: String, textCol: String,
              topR: Int): DataFrame = {
    val vocab = tokenized(docs, idCol, textCol)
      .groupBy("token").agg(count(lit(1)).as("n"))
    val top = vocab.orderBy(desc("n"), asc("token")).limit(topR)
    val w = Window.orderBy(desc("n"), asc("token"))
    val ranked = top.withColumn("rank", row_number().over(w))
      .select(col("rank"),
        log(col("rank").cast("double")).as("x"),
        log(col("n").cast("double")).as("y"))
    val arr = ranked.agg(
      array_sort(collect_list(struct(col("rank"), col("x"), col("y")))).as("a"))
    def fold(f: Column => Column): Column =
      aggregate(col("a"), lit(0.0), (acc, e) => acc + f(e))
    val sums = arr.select(
      size(col("a")).cast("long").as("n_terms"),
      fold(_.getField("x")).as("sx"), fold(_.getField("y")).as("sy"),
      fold(e => e.getField("x") * e.getField("y")).as("sxy"),
      fold(e => e.getField("x") * e.getField("x")).as("sxx"),
      fold(e => e.getField("y") * e.getField("y")).as("syy"))
    val nD = col("n_terms").cast("double")
    val cov = nD * col("sxy") - col("sx") * col("sy")
    val varx = nD * col("sxx") - col("sx") * col("sx")
    val vary = nD * col("syy") - col("sy") * col("sy")
    // degenerate corpora (≤1 term → varx = 0; uniform counts → vary =
    // 0; empty → n = 0) have no defined fit — emit NULL, don't crash
    // the whole job on ANSI DIVIDE_BY_ZERO
    sums.select(col("n_terms"),
      when(varx =!= 0.0, round(cov / varx, 6)).as("slope"),
      when(varx =!= 0.0 && nD =!= 0.0,
        round((col("sy") - (cov / varx) * col("sx")) / nD, 6)).as("intercept"),
      when(varx * vary =!= 0.0,
        round((cov * cov) / (varx * vary), 6)).as("r2"))
  }

  /** Heaps'-law vocabulary-growth fit (V = K·N^β, Heaps 1978): split
    * the id range into `parts` equal-width prefixes (the deterministic
    * ingestion-order proxy — no global sort anywhere), accumulate
    * cumulative token mass N_p and cumulative distinct vocabulary V_p
    * at each boundary, and least-squares fit ln V on ln N over the
    * boundary points. The growth-curve companion of [[zipfFit]]'s
    * rank-frequency law — together they are the corpus-scaling card:
    * β near 1 means more data is still adding lexical diversity
    * (unsaturated vocabulary), β near 0 means the corpus has converged.
    *
    * Determinism: a token's first occurrence is min(doc id) — order-
    * and partitioning-free; prefix assignment is integral
    * ((id−lo)·parts div (hi−lo+1) — exact integer, no float boundary
    * two engines could bracket differently); the fit replays q95's
    * exact double-op order (part-ordered fold). Degenerate corpora
    * (empty, one point, zero variance) emit NULL fit columns.
    *
    * Scale shape: ONE cached tokenize feeds both corpus-sized
    * aggregates — token mass combines onto ≤`parts` groups, vocabulary
    * onto the (token → min id) shuffle (map-combinable); the 1-row id
    * range broadcasts onto each; everything downstream is
    * ≤`parts`-row algebra. The corpus is never globally sorted and
    * never joined to itself. Output, one row per nonempty-prefix
    * boundary: (part, n_tokens_cum, vocab_cum, beta, log_k, r2). */
  def heapsFit(docs: DataFrame, idCol: String, textCol: String,
               parts: Int = 10): DataFrame = {
    import graft.expressions.HashExpressions.intDiv
    require(parts > 0)
    val tok = tokenized(docs, idCol, textCol).cache()
    val idRange = docs.agg(min(col(idCol).cast("long")).as("__lo"),
      max(col(idCol).cast("long")).as("__hi"))
    def part(id: Column): Column = least(lit(parts - 1L),
      intDiv((id - col("__lo")) * parts, col("__hi") - col("__lo") + 1))
    val massB = tok.select(col("doc_id").cast("long").as("__id"))
      .crossJoin(broadcast(idRange))
      .groupBy(part(col("__id")).as("part")).agg(count(lit(1)).as("__m"))
    val vocabB = tok.groupBy("token")
      .agg(min(col("doc_id").cast("long")).as("__id"))
      .crossJoin(broadcast(idRange))
      .groupBy(part(col("__id")).as("part")).agg(count(lit(1)).as("__v"))
    val spine = docs.sparkSession.range(parts).select(col("id").as("part"))
    val cw = Window.orderBy("part")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pts = spine
      .join(massB, Seq("part"), "left").join(vocabB, Seq("part"), "left")
      .na.fill(0L, Seq("__m", "__v"))
      .withColumn("n_tokens_cum", sum("__m").over(cw))
      .withColumn("vocab_cum", sum("__v").over(cw))
      .where(col("n_tokens_cum") > 0 && col("vocab_cum") > 0)
      .select(col("part"), col("n_tokens_cum"), col("vocab_cum"),
        log(col("n_tokens_cum").cast("double")).as("x"),
        log(col("vocab_cum").cast("double")).as("y"))
      .cache()
    val arr = pts.agg(
      array_sort(collect_list(struct(col("part"), col("x"), col("y")))).as("a"))
    def fold(f: Column => Column): Column =
      aggregate(col("a"), lit(0.0), (acc, e) => acc + f(e))
    val sums = arr.select(
      size(col("a")).cast("long").as("__n"),
      fold(_.getField("x")).as("sx"), fold(_.getField("y")).as("sy"),
      fold(e => e.getField("x") * e.getField("y")).as("sxy"),
      fold(e => e.getField("x") * e.getField("x")).as("sxx"),
      fold(e => e.getField("y") * e.getField("y")).as("syy"))
    val nD = col("__n").cast("double")
    val cov = nD * col("sxy") - col("sx") * col("sy")
    val varx = nD * col("sxx") - col("sx") * col("sx")
    val vary = nD * col("syy") - col("sy") * col("sy")
    val fit = sums.select(
      when(varx =!= 0.0, round(cov / varx, 6)).as("beta"),
      when(varx =!= 0.0 && nD =!= 0.0,
        round((col("sy") - (cov / varx) * col("sx")) / nD, 6)).as("log_k"),
      when(varx * vary =!= 0.0,
        round((cov * cov) / (varx * vary), 6)).as("r2"))
    CacheScope.scoped(
      pts.crossJoin(broadcast(fit))
        .select(col("part"), col("n_tokens_cum"), col("vocab_cum"),
          col("beta"), col("log_k"), col("r2")),
      tok, pts)
  }

  /** Perplexity-band curation gate (the CCNet / Wenzek et al. 2020
    * middle-band idea): keep documents whose unigram mean log-prob
    * ([[unigramLogProb]], the LM-free perplexity proxy) falls inside
    * the [pLo, pHi] quantile band — both tails go (low = gibberish,
    * high = stopword soup).
    *
    * Scale shape: band bounds are interpolated quantiles (the q45
    * spelled-out formula) over the `sampleKeep`/100 PORTABLE sample
    * (q44's md5 bucket — deterministic, engine-exact), so the one
    * window sort is over the sample, not the corpus (tune sampleKeep
    * down as the corpus grows — the q69 estimate-on-a-sample
    * pattern); bounds broadcast back as a 1-row aggregate. The band
    * compare uses the 6-dp-ROUNDED score on both sides (metric rule).
    *
    * Output: one row per doc — (id, n_tokens, mean_logprob, lo_bound,
    * hi_bound, keep). */
  def logprobBandGate(docs: DataFrame, idCol: String, textCol: String,
                      pLo: Double, pHi: Double,
                      sampleKeep: Int = 20): DataFrame = {
    val scored = unigramLogProb(docs, idCol, textCol).cache()
    val samp = scored.where(Sampling.md5Bucket(idCol, 100, "ppl") < sampleKeep)
    val ranked = samp
      .withColumn("rn", row_number().over(
        Window.orderBy(col("mean_logprob"), col(idCol))))
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy()))
    def q(p: Double): Column = {
      val idx = (col("cnt") - 1).cast("double") * lit(p)
      val lo = floor(idx) + 1
      val frac = idx - floor(idx)
      val contrib = when(col("rn") === lo, col("mean_logprob") * (lit(1.0) - frac))
        .when(col("rn") === lo + 1, col("mean_logprob") * frac)
        .otherwise(lit(0.0))
      round(sum(contrib), 6)
    }
    val bounds = ranked.agg(q(pLo).as("lo_bound"), q(pHi).as("hi_bound"))
    CacheScope.scoped(
      scored.crossJoin(broadcast(bounds))
        .select(col(idCol), col("n_tokens"), col("mean_logprob"),
          col("lo_bound"), col("hi_bound"),
          (col("mean_logprob") >= col("lo_bound") &&
            col("mean_logprob") <= col("hi_bound")).as("keep")),
      scored)
  }

  /** Per-doc add-one-smoothed bigram LM score: mean over the doc's
    * adjacent token pairs of ln p(b|a), p(b|a) = (c(ab)+1)/(c(a)+V)
    * with counts from the corpus itself and V = |unigram vocab| — the
    * next quality signal up from [[unigramLogProb]] (a KenLM-style
    * fluency proxy without an external model: word-salad docs score
    * low even when their unigrams are common).
    *
    * Scale shape: the bigram stream (columnar slice/zip explode, no
    * lambda HOF) is cached — it feeds the corpus bigram-count
    * aggregate AND the join back; counts meet the stream in TWO
    * hash-key equi-joins ((a,b) then a) — both corpus-sized
    * combinable shuffles, nothing broadcast except the 1-row V.
    * Σ ln over a doc's bigrams is the q67 aggregation contract
    * (round(Σ/n, 6); libm parity).
    *
    * Output (docs with ≥ 2 tokens): (id, n_bigrams, mean_logprob). */
  /** Vocabulary richness card per source: Good–Turing unseen mass
    * (P₀ = n₁/N — the probability the NEXT token is a never-seen type;
    * the "how much novel vocabulary is left to crawl" signal) and the
    * bias-corrected Chao1 richness estimate
    * (V + n₁(n₁−1)/(2(n₂+1)) — defined even when no doubletons exist)
    * from exact type-frequency counts. Everything integer: unseen mass
    * in half-up micro-units, Chao1 half-up to a whole type count —
    * both operands non-negative (q82 rule).
    *
    * Scale shape: one tokenize → ONE (source, token) combinable count
    * shuffle; all statistics then fold from the TYPE-sized frame —
    * never a second corpus pass. */
  def vocabRichness(docs: DataFrame, srcCol: String,
                    textCol: String): DataFrame = {
    import graft.expressions.HashExpressions.intDiv
    val counts = docs
      .select(col(srcCol).as("source"),
        explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy("source", "token").agg(count(lit(1)).as("c"))
    counts.groupBy("source").agg(
      sum("c").as("n_tokens"),
      count(lit(1)).as("vocab"),
      sum(when(col("c") === 1, 1L).otherwise(0L)).as("n1"),
      sum(when(col("c") === 2, 1L).otherwise(0L)).as("n2"))
      .select(col("source"), col("n_tokens"), col("vocab"), col("n1"), col("n2"),
        // decimal(38,0) widening (oracle mirrors with HUGEINT): 2·n1·10⁶
        // overflows Long at n1 ≈ 4.6e12 and the chao1 numerator 2·n1·(n1−1)
        // already at n1 ≈ 2.1e9 hapax types — reachable for a web-scale
        // source. IntegralDivide on decimals still emits BIGINT.
        intDiv(col("n1").cast("decimal(38,0)") * lit(2000000L)
            + col("n_tokens").cast("decimal(38,0)"),
          col("n_tokens").cast("decimal(38,0)") * lit(2L)).as("unseen_ppm"),
        (col("vocab") + intDiv(
          col("n1").cast("decimal(38,0)") * (col("n1") - 1) * lit(2L)
            + (col("n2").cast("decimal(38,0)") + 1) * lit(2L),
          (col("n2").cast("decimal(38,0)") + 1) * lit(4L))).as("chao1"))
  }

  /** Interpolated Kneser–Ney bigram fluency score (Kneser & Ney 1995;
    * the standard upgrade of q98's add-one smoothing): per doc, mean
    * ln P_KN(b|a) with
    *   P_KN(b|a) = (max(c(ab)−D, 0) + D·N1+(a·)·P_cont(b)) / c(a·)
    *   P_cont(b) = N1+(·b) / N1+(··),  D = 3/4 (dyadic-exact)
    * — continuation probability ranks a word by how many CONTEXTS it
    * follows, not raw frequency, so boilerplate tokens glued to one
    * template stop inflating fluency. All inputs are exact integer
    * counts off ONE bigram aggregate; the formula is evaluated in the
    * documented left-to-right order on both engines; ln under the
    * libm-parity contract (q98), round-6 output.
    *
    * Scale shape: the cached bigram stream feeds the (a,b) count agg
    * AND the per-doc join-back (q98's plan); N1+(a·)/c(a·) and
    * N1+(·b) derive from the TYPE-sized (a,b) frame, never a second
    * corpus pass; only the 1-row type total broadcasts. */
  def knBigramLogProb(docs: DataFrame, idCol: String, textCol: String,
                      discount: Double = 0.75): DataFrame = {
    val bi = docs
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .where(size(col("__toks")) >= 2)
      .select(col(idCol), explode(arrays_zip(
        slice(col("__toks"), lit(1), size(col("__toks")) - 1).as("a"),
        slice(col("__toks"), lit(2), size(col("__toks")) - 1).as("b"))).as("__p"))
      .select(col(idCol), col("__p.a").as("tok_a"), col("__p.b").as("tok_b"))
      .cache()
    val big = bi.groupBy("tok_a", "tok_b").agg(count(lit(1)).as("c_ab")).cache()
    val ctxA = big.groupBy("tok_a")
      .agg(sum("c_ab").as("c_a"), count(lit(1)).as("n1_a"))
    val leftB = big.groupBy("tok_b").agg(count(lit(1)).as("n1_b"))
    val types = big.agg(count(lit(1)).as("__nt"))
    val p = (greatest(col("c_ab").cast("double") - lit(discount), lit(0.0)) +
      lit(discount) * col("n1_a").cast("double") * col("n1_b").cast("double") /
        col("__nt").cast("double")) / col("c_a").cast("double")
    CacheScope.scoped(
      bi.join(big, Seq("tok_a", "tok_b"))
        .join(ctxA, "tok_a")
        .join(leftB, "tok_b")
        .crossJoin(broadcast(types))
        .groupBy(col(idCol))
        .agg(count(lit(1)).as("n_bigrams"),
          round(sum(log(p)) / count(lit(1)), 6).as("mean_kn_logprob")),
      bi, big)
  }

  def bigramLogProb(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bi = docs
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .where(size(col("__toks")) >= 2)
      .select(col(idCol), explode(arrays_zip(
        slice(col("__toks"), lit(1), size(col("__toks")) - 1).as("a"),
        slice(col("__toks"), lit(2), size(col("__toks")) - 1).as("b"))).as("__p"))
      .select(col(idCol), col("__p.a").as("tok_a"), col("__p.b").as("tok_b"))
      .cache()
    val big = bi.groupBy("tok_a", "tok_b").agg(count(lit(1)).as("c_ab"))
    // uni cached too: the V 1-row aggregate and the join-back branch
    // apply different pushed filters, which defeats Spark's exchange
    // reuse — uncached, V re-scans and re-tokenizes the whole corpus
    // for a single number (vocab-sized frame, same class as tfIdf's tf)
    val uni = tokenized(docs, idCol, textCol)
      .groupBy("token").agg(count(lit(1)).as("c_a"))
      .cache()
    val v = uni.agg(count(lit(1)).as("__v"))
    CacheScope.scoped(
      bi.join(big, Seq("tok_a", "tok_b"))
        .join(uni.select(col("token").as("tok_a"), col("c_a")), "tok_a")
        .crossJoin(broadcast(v))
        .groupBy(col(idCol))
        .agg(count(lit(1)).as("n_bigrams"),
          round(sum(log((col("c_ab").cast("double") + lit(1.0)) /
            (col("c_a").cast("double") + col("__v").cast("double")))) /
            count(lit(1)), 6).as("mean_logprob")),
      bi, uni)
  }

  /** DSIR importance weights (Data Selection via Importance Resampling,
    * Xie et al. 2023): score every raw document by how much more likely
    * its hashed-unigram features are under a TARGET domain's
    * distribution than under the raw corpus's — the standard
    * "select pretraining data that looks like the high-quality target"
    * step, here with Laplace-smoothed bucket distributions.
    *
    * Features are md5-derived token buckets (first 32 md5 bits mod
    * `buckets` — the engine-portable hash contract every sampling op
    * shares), so any SQL engine reproduces the exact bucketing.
    * Per-bucket log-ratio λ_b = ln((c_t[b]+1)/(T+B)) −
    * ln((c_r[b]+1)/(R+B)) is snapped to integer MICRO-units on the
    * B-row bucket frame (floor(λ·1e6) — one floor of a double per
    * bucket, not per token), so the per-doc score Σ λ_micro is EXACT
    * integer arithmetic: no FP-accumulation-order dependence, and the
    * output is all-BIGINT (no 6-dp rounding surface at all).
    *
    * Scale shape: ONE corpus tokenize feeding both sides (cached): a
    * map-combinable shuffle onto ≤ B groups for the counts, then the
    * tiny λ table (B rows) BROADCASTS back onto the token stream — the
    * per-token join never shuffles the corpus, and the per-doc Σ is the
    * only corpus-keyed shuffle. At 100 TB the λ table is built once and
    * reused across selection runs.
    *
    * Output: (doc_id, n_tokens, logw_micro) — logw_micro/1e6 ≈ the DSIR
    * log importance weight; resample by thresholding or by feeding it
    * as the weight into [[Sampling.weightedSampleTopK]]. */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
                  targetPred: Column, buckets: Int = 1024): DataFrame = {
    require(buckets > 0)
    val tok = docs
      .select(col(idCol).as("doc_id"), targetPred.as("__tgt"),
        explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .withColumn("bucket",
        (conv(substring(md5(col("token").cast("binary")), 1, 8), 16, 10)
          .cast("long") % buckets).cast("int"))
      .cache()
    val counts = tok.groupBy("bucket").agg(
        sum(when(col("__tgt"), 1L).otherwise(0L)).as("c_t"),
        sum(when(col("__tgt"), 0L).otherwise(1L)).as("c_r"))
      .cache()
    // totals fold the ≤B-row counts frame — NOT a third pass over the
    // (corpus-sized, possibly disk-spilled) cached token stream
    val totals = counts.agg(
      sum("c_t").cast("long").as("t_tot"), sum("c_r").cast("long").as("r_tot"))
    val lam = counts.crossJoin(broadcast(totals))
      .select(col("bucket"),
        floor(lit(1e6) *
          (log((col("c_t") + 1).cast("double") /
               (col("t_tot") + buckets).cast("double")) -
           log((col("c_r") + 1).cast("double") /
               (col("r_tot") + buckets).cast("double"))))
          .cast("long").as("lam_micro"))
    CacheScope.scoped(
      tok.join(broadcast(lam), "bucket")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"), sum("lam_micro").as("logw_micro"))
        .select(col("doc_id").as(idCol), col("n_tokens"), col("logw_micro")),
      tok, counts)
  }

  /** Per-source Jensen–Shannon divergence against the whole corpus's
    * hashed-unigram distribution — the "which source's vocabulary is
    * drifting from the mix" diagnostic (the lexical complement to
    * q86's numeric-feature PSI): 0 = the source speaks exactly like
    * the corpus, ln 2 ≈ 0.693 = disjoint vocabulary.
    *
    * Emitted as `js2_micro` = Σ_b ⌊1e6·(p·ln(p/m) + q·ln(q/m))⌋ over
    * the corpus's occupied buckets (p = source share, q = corpus
    * share, m = (p+q)/2; the p = 0 term is 0 by convention) — i.e.
    * 2·JS in integer micro-units: the per-bucket snap happens on the
    * ≤ |sources|·B-row frame (never per token), the cross-bucket Σ is
    * exact integer, and the output carries no rounded double at all.
    *
    * Scale shape: ONE corpus-sized shuffle onto ≤ |sources|·B groups;
    * the bucket/source marginals, the (source × occupied-bucket)
    * frame and the term algebra are all tiny-frame derivations of
    * that aggregate — the corpus text is read exactly once. */
  def sourceJsDivergence(docs: DataFrame, srcCol: String, textCol: String,
                         buckets: Int = 1024): DataFrame = {
    require(buckets > 0)
    val sb = docs
      .select(col(srcCol).as("source"),
        explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .select(col("source"),
        (conv(substring(md5(col("token").cast("binary")), 1, 8), 16, 10)
          .cast("long") % buckets).cast("int").as("bucket"))
      .groupBy("source", "bucket").agg(count(lit(1)).as("c_sb"))
      .cache()
    val g = sb.groupBy("bucket").agg(sum("c_sb").cast("long").as("c_b"))
    val ns = sb.groupBy("source").agg(sum("c_sb").cast("long").as("n_s"))
    val nTot = sb.agg(sum("c_sb").cast("long").as("n_tot"))
    // every source must see every OCCUPIED bucket (a source missing a
    // bucket still pays the q·ln 2 mass there) — |sources|·B rows, tiny
    val p = col("c_sb").cast("double") / col("n_s").cast("double")
    val q = col("c_b").cast("double") / col("n_tot").cast("double")
    val m = (p + q) / lit(2.0)
    val term2 = when(col("c_sb") > 0, p * log(p / m)).otherwise(lit(0.0)) +
      q * log(q / m)
    CacheScope.scoped(
      ns.crossJoin(g)
        .join(sb, Seq("source", "bucket"), "left")
        .na.fill(0L, Seq("c_sb"))
        .crossJoin(broadcast(nTot))
        .withColumn("term2_micro", floor(lit(1e6) * term2).cast("long"))
        .groupBy("source")
        .agg(max("n_s").as("n_tokens"), sum("term2_micro").as("js2_micro")),
      sb)
  }

  /** Token-mass concentration across sources, per language: the Gini
    * coefficient + largest-source share — the one-row-per-language
    * answer to "is this slice of the mix dominated by a single
    * crawl?" (a concentration audit runs before any mixture-weight
    * decision; high Gini means the α-temperature reweighting of q83
    * has nothing to rebalance WITHIN the language).
    *
    * Determinism: Gini via the rank formula over the ascending
    * (x, source) order — G = (2·Σi·xᵢ − (n+1)·Σx)/(n·Σx), numerator
    * provably ≥ 0 for ascending ranks — emitted as the shifted
    * half-up intDiv micro form (integer-ratio tie rule). The ·1e6
    * products run in DECIMAL(38,0) on the Spark side to mirror
    * DuckDB's HUGEINT sum arithmetic (BIGINT·1e6 would overflow first
    * at ~1e12-token sources).
    *
    * Scale shape: one combinable shuffle to |lang×source| rows, then
    * a lang-partitioned window over those few rows — never a global
    * sort, cost independent of corpus size after the scan. Output:
    * (lang, n_sources, total_tokens, gini_micro, top_share_micro). */
  def tokenConcentration(docs: DataFrame, textCol: String,
                         groupCol: String = "lang",
                         unitCol: String = "source"): DataFrame = {
    import graft.expressions.HashExpressions.intDiv
    val perUnit = docs
      .groupBy(col(groupCol).as("grp"), col(unitCol).as("unit"))
      .agg(sum(TextAnalysis.tokenCount(col(textCol)).cast("long")).as("x"))
    val w = Window.partitionBy("grp").orderBy(asc("x"), asc("unit"))
    val dec = "decimal(38,0)"
    perUnit.withColumn("i", row_number().over(w).cast("long"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n"), sum("x").as("sx"),
        sum(col("i") * col("x")).as("six"), max("x").as("mx"))
      .select(col("grp").as(groupCol), col("n").as("n_sources"),
        col("sx").as("total_tokens"),
        intDiv((lit(2L) * col("six") - (col("n") + lit(1L)) * col("sx"))
            .cast(dec) * lit(2000000L) + (col("n") * col("sx")).cast(dec),
          (lit(2L) * col("n") * col("sx")).cast(dec)).as("gini_micro"),
        intDiv(col("mx").cast(dec) * lit(2000000L) + col("sx").cast(dec),
          (lit(2L) * col("sx")).cast(dec)).as("top_share_micro"))
  }

  /** Tokenizer-fertility proxy per language: chars-per-token and
    * tokens-per-doc — the compression-ratio table a tokenizer choice
    * is judged on per language slice (a language whose chars/token
    * ratio is far from the corpus norm pays more context budget per
    * character; Rust/BPE tokenizer fertility reports are this table).
    *
    * Exact integer ratios in shifted half-up intDiv micro form; one
    * combinable shuffle to |langs| rows. Output: (lang, n_docs,
    * n_chars, n_tokens, chars_per_token_micro, tokens_per_doc_micro). */
  def tokenFertility(docs: DataFrame, textCol: String,
                     langCol: String = "lang"): DataFrame = {
    import graft.expressions.HashExpressions.intDiv
    docs
      .select(col(langCol).as("lang"), length(col(textCol)).cast("long").as("__c"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("__t"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("__c").as("n_chars"),
        sum("__t").as("n_tokens"))
      .select(col("lang"), col("n_docs"), col("n_chars"), col("n_tokens"),
        // decimal(38,0) widening (oracle: HUGEINT): per-language char/
        // token masses pass 4.6e12 well before 100 TB, where the
        // 2e6-scaled numerator wraps Long
        intDiv(col("n_chars").cast("decimal(38,0)") * lit(2000000L)
            + col("n_tokens").cast("decimal(38,0)"),
          col("n_tokens").cast("decimal(38,0)") * lit(2L)).as("chars_per_token_micro"),
        intDiv(col("n_tokens").cast("decimal(38,0)") * lit(2000000L)
            + col("n_docs").cast("decimal(38,0)"),
          col("n_docs").cast("decimal(38,0)") * lit(2L)).as("tokens_per_doc_micro"))
  }

  /** Log-length moments per source (the lognormal doc-length model:
    * doc lengths are classically lognormal, and (μ, σ) of ln n_tokens
    * is the 2-parameter fit): each doc's ln(tokens) SNAPS to integer
    * micro-units BEFORE the cross-doc sums (the q83 √-snap rule — raw
    * double Σ would be FP-order-dependent), so mean/variance are exact
    * integer arithmetic on the snapped values; σ² uses the standard
    * E[x²]−E[x]² form with the half-up micro mean. A source whose σ
    * collapses is length-templated (pagination chunks, fixed forms).
    *
    * One combinable shuffle to |sources| rows. Output: (source,
    * n_docs, mean_ln_micro, var_ln_micro2). `var_ln_micro2` is in
    * squared-micro units (µ²) — divide by 1e12 for nats². */
  def logLengthMoments(docs: DataFrame, textCol: String,
                       sourceCol: String = "source"): DataFrame = {
    import graft.expressions.HashExpressions.intDiv
    val lnMicro = floor(log(TextAnalysis.tokenCount(col(textCol))
      .cast("double")) * lit(1e6)).cast("long")
    val dec = "decimal(38,0)"
    docs
      .select(col(sourceCol).as("source"), lnMicro.as("__l"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("__l").as("__s"),
        sum(col("__l").cast(dec) * col("__l").cast(dec)).as("__s2"))
      .withColumn("mean_ln_micro",
        intDiv(lit(2L) * col("__s") + col("n_docs"), lit(2L) * col("n_docs")))
      .select(col("source"), col("n_docs"), col("mean_ln_micro"),
        // E[x²]−E[x]² on the half-up micros; clamp the ±1-unit rounding
        // undershoot a zero-variance group can produce
        greatest(lit(0L),
          intDiv(lit(2L) * col("__s2") + col("n_docs").cast(dec),
            lit(2L) * col("n_docs").cast(dec))
            - col("mean_ln_micro") * col("mean_ln_micro"))
          .as("var_ln_micro2"))
  }

  /** Per-source bigram conditional entropy H(token | previous token) —
    * the sequence-level predictability signal one step up from token
    * Gini: templated or machine-generated sources have LOW conditional
    * entropy (each token is near-determined by its predecessor) even
    * when their unigram mix looks normal. H = Σ_{a,b} (c_ab/N) ·
    * ln(c_a/c_ab), counts from the source's own adjacent-pair stream
    * (the q98 bigram convention).
    *
    * Determinism: each ln of an INTEGER count snaps to micro
    * (floor(ln·1e6) — the q130 snap rule) BEFORE the weighted sum, so
    * ln(c_a/c_ab) becomes the exact integer lnµ(c_a) − lnµ(c_ab) ≥ 0
    * (floor is monotone, c_a ≥ c_ab) and Σ c_ab·Δ is exact integer
    * arithmetic in DECIMAL(38,0) (Σ ≤ N·lnµ(N) overflows i64 at
    * corpus scale — the q121 HUGEINT-mirror rule). The mean is the
    * shifted half-up intDiv micro form.
    *
    * Scale shape: one bigram explode → (source, a, b) combinable
    * count; c_a derives from THAT vocab-sized frame (no second corpus
    * scan); final agg is |sources| rows. Output: (source, n_bigrams,
    * n_distinct_bigrams, cond_entropy_micro). */
  def bigramCondEntropy(docs: DataFrame, textCol: String,
                        sourceCol: String = "source"): DataFrame = {
    import graft.expressions.HashExpressions.intDiv
    val dec = "decimal(38,0)"
    val cab = docs
      .select(col(sourceCol).as("source"), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .where(size(col("__toks")) >= 2)
      .select(col("source"), explode(arrays_zip(
        slice(col("__toks"), lit(1), size(col("__toks")) - 1).as("a"),
        slice(col("__toks"), lit(2), size(col("__toks")) - 1).as("b"))).as("__p"))
      .select(col("source"), col("__p.a").as("tok_a"), col("__p.b").as("tok_b"))
      .groupBy("source", "tok_a", "tok_b").agg(count(lit(1)).as("c_ab"))
    val ca = cab.groupBy("source", "tok_a").agg(sum("c_ab").as("c_a"))
    val lnMicro = (c: Column) => floor(log(c.cast("double")) * lit(1e6)).cast("long")
    cab.join(ca, Seq("source", "tok_a"))
      .groupBy("source")
      .agg(sum("c_ab").as("n_bigrams"),
        count(lit(1)).as("n_distinct_bigrams"),
        sum(col("c_ab").cast(dec) *
          (lnMicro(col("c_a")) - lnMicro(col("c_ab")))).as("__s"))
      .select(col("source"), col("n_bigrams"), col("n_distinct_bigrams"),
        intDiv(lit(2L) * col("__s") + col("n_bigrams").cast(dec),
          lit(2L) * col("n_bigrams").cast(dec))
          .cast("long").as("cond_entropy_micro"))
  }

  /** Lexical diversity per source — distinct-1 / distinct-2 (Li et al.
    * 2016): the type-token ratio and distinct-bigram ratio that flag a
    * TEMPLATED or machine-generated source (low diversity at high
    * volume) before it floods the mix; the source-level companion of
    * the per-doc repetition filter (q46).
    *
    * Determinism: counts are exact; both ratios are shifted half-up
    * intDiv micro forms (integer-ratio tie rule).
    *
    * Scale shape: ONE tokenize pass (cached) feeds both gram orders;
    * each is a (source, gram) pre-agg — the same de-skew shape as
    * heavyHitterTokens — then a combinable distinct-count to
    * |sources| rows; the final join is |sources|-sized. Output:
    * (source, n_tokens, n_bigrams, distinct_1, distinct_2, ttr_micro,
    * distinct2_micro). */
  def lexicalDiversity(docs: DataFrame, textCol: String,
                       sourceCol: String = "source"): DataFrame = {
    import graft.expressions.HashExpressions.intDiv
    val toks = docs.select(col(sourceCol).as("source"),
      TextAnalysis.tokens(col(textCol)).as("__toks")).cache()
    val uni = toks.select(col("source"), explode(col("__toks")).as("g"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_tokens"), countDistinct("g").as("distinct_1"))
    val bi = toks.where(size(col("__toks")) >= 2)
      .select(col("source"), explode(arrays_zip(
        slice(col("__toks"), lit(1), size(col("__toks")) - 1).as("a"),
        slice(col("__toks"), lit(2), size(col("__toks")) - 1).as("b"))).as("__p"))
      .select(col("source"),
        concat_ws(" ", col("__p.a"), col("__p.b")).as("g"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_bigrams"), countDistinct("g").as("distinct_2"))
    def ratio(num: Column, den: Column): Column =
      when(den === 0, lit(null).cast("long"))
        .otherwise(intDiv(lit(2000000L) * num + den, lit(2L) * den))
    CacheScope.scoped(
      uni.join(bi, Seq("source"), "left")
        .na.fill(0L, Seq("n_bigrams", "distinct_2"))
        .select(col("source"), col("n_tokens"), col("n_bigrams"),
          col("distinct_1"), col("distinct_2"),
          ratio(col("distinct_1"), col("n_tokens")).as("ttr_micro"),
          ratio(col("distinct_2"), col("n_bigrams")).as("distinct2_micro")),
      toks)
  }

  /** BPE first-merge candidates (Sennrich et al. 2016 §3.2, one merge
    * step): corpus-weighted adjacent-CHARACTER pair frequencies inside
    * tokens — freq(a,b) = Σ_tokens count(token)·occurrences(ab in
    * token) — ranked top-k. The table a tokenizer-training run
    * consults to pick its first merge, and the cheap "is this corpus's
    * character bigram mass what the tokenizer expects" drift probe.
    *
    * Scale shape: ONE corpus scan builds the (token, count) vocab
    * frame; the pair explosion and agg run on that VOCAB-BOUNDED frame
    * (distinct tokens × token length), independent of corpus row
    * count; top-k is a TakeOrderedAndProject and the rank window runs
    * on the pre-limited ≤ k rows. All-integer output. Output: (rank,
    * left_unit, right_unit, freq). */
  def bpeMergeCandidates(docs: DataFrame, idCol: String, textCol: String,
                         topK: Int = 30): DataFrame = {
    val uni = tokenized(docs, idCol, textCol)
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .where(length(col("token")) >= 2)
    val chars = split(col("token"), "")
    val pairs = uni
      .select(col("cnt"), explode(arrays_zip(
        slice(chars, lit(1), size(chars) - 1).as("a"),
        slice(chars, lit(2), size(chars) - 1).as("b"))).as("__p"))
      .select(col("__p.a").as("left_unit"), col("__p.b").as("right_unit"),
        col("cnt"))
      .groupBy("left_unit", "right_unit").agg(sum("cnt").as("freq"))
    val top = pairs
      .orderBy(desc("freq"), asc("left_unit"), asc("right_unit")).limit(topK)
    val w = Window.orderBy(desc("freq"), asc("left_unit"), asc("right_unit"))
    top.withColumn("rank", row_number().over(w).cast("long"))
      .select("rank", "left_unit", "right_unit", "freq")
  }

  /** TextRank keyword extraction (Mihalcea & Tarau 2004): weighted
    * PageRank over the adjacent-token co-occurrence graph, restricted
    * to the top-`vocab` tokens — the unsupervised keyword list a
    * corpus card leads with, and the classic "what is this corpus
    * about" sanity check before mixing sources.
    *
    * Determinism: ranks live in exact half-micro INTEGER units — r₀ =
    * 1e6, rᵥ ← 150000 + Σᵤ (85·rᵤ·w_uv) div (100·Sᵤ) with Sᵤ the node
    * strength — so every iteration is an order-independent BIGINT sum
    * (a double PageRank would be FP-fold-order-dependent and
    * unhashable). All div operands non-negative. Headroom: 85·r·w
    * stays under 2^63 to ~1e8-unit hub ranks × 1e6-count edges.
    *
    * Scale shape: vocab selection is a TakeOrderedAndProject (never a
    * global sort); the pair stream is filtered to vocab×vocab by two
    * BROADCAST semi-joins BEFORE the edge count, so the edge shuffle
    * carries only in-vocab pairs; the iteration state is ≤ vocab²
    * edges + vocab ranks — iteration cost is independent of corpus
    * size after the one edge-building scan. Output: (rank, token,
    * cnt, score_micro). */
  def textRank(docs: DataFrame, idCol: String, textCol: String,
               vocab: Int = 100, iters: Int = 5): DataFrame = {
    val toksDf = docs.select(TextAnalysis.tokens(col(textCol)).as("__toks"))
    val uni = toksDf.select(explode(col("__toks")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    val nodes = uni.orderBy(desc("cnt"), asc("token")).limit(vocab).cache()
    val vtok = nodes.select("token")
    val bi = toksDf.where(size(col("__toks")) >= 2)
      .select(explode(arrays_zip(
        slice(col("__toks"), lit(1), size(col("__toks")) - 1).as("a"),
        slice(col("__toks"), lit(2), size(col("__toks")) - 1).as("b"))).as("__p"))
      .select(col("__p.a").as("tok_a"), col("__p.b").as("tok_b"))
      .where(col("tok_a") =!= col("tok_b"))
      .join(broadcast(vtok.withColumnRenamed("token", "tok_a")), "tok_a")
      .join(broadcast(vtok.withColumnRenamed("token", "tok_b")), "tok_b")
    val und = bi
      .select(least(col("tok_a"), col("tok_b")).as("u"),
        greatest(col("tok_a"), col("tok_b")).as("v"))
      .groupBy("u", "v").agg(count(lit(1)).as("w"))
    val sym = und.select(col("u").as("src"), col("v").as("dst"), col("w"))
      .unionAll(und.select(col("v").as("src"), col("u").as("dst"), col("w")))
    val strength = sym.groupBy("src").agg(sum("w").as("s_src"))
    val e = sym.join(broadcast(strength), "src").cache()
    var ranks = nodes.select(col("token"), lit(1000000L).as("r"))
    for (_ <- 1 to iters) {
      val contribs = e
        .join(broadcast(ranks), col("src") === col("token"))
        .select(col("dst"), expr("(85 * r * w) div (100 * s_src)").as("__c"))
        .groupBy("dst").agg(sum("__c").as("__in"))
      ranks = nodes.select("token")
        .join(contribs, col("token") === col("dst"), "left")
        .select(col("token"),
          (lit(150000L) + coalesce(col("__in"), lit(0L))).as("r"))
    }
    val wWin = Window.orderBy(desc("r"), asc("token"))
    CacheScope.scoped(
      nodes.join(ranks, "token")
        .withColumn("rank", row_number().over(wWin).cast("long"))
        .select(col("rank"), col("token"), col("cnt"),
          col("r").as("score_micro")),
      nodes, e)
  }

  /** Per-source character-class profile over the RAW text — the
    * encoding/extraction sanity card: a source whose digit or "other"
    * (non-letter, non-digit, non-space) mass jumps is emitting tables,
    * markup residue, or mojibake rather than prose, and the space
    * ratio bounds the tokenizability of the bytes. Classes are counted
    * with `translate` deletion (length difference), not regex — one
    * codegen string pass per class, no pattern engine in the hot path.
    *
    * Ratios are exact-integer class-count / char-count in half-up
    * micro-units (the CLAUDE.md integer-ratio rule; all operands
    * non-negative). Sources with zero characters emit NULL ratios.
    *
    * Scale shape: stateless per-row counting folded by ONE combinable
    * shuffle to |sources| rows. Output: (source, n_chars, n_letters,
    * n_digits, n_spaces, n_other, letter_micro, digit_micro,
    * space_micro, other_micro). */
  def charClassProfile(docs: DataFrame, textCol: String,
                       sourceCol: String = "source"): DataFrame = {
    import graft.expressions.HashExpressions.intDiv
    val letters = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
    val digits = "0123456789"
    val t = col(textCol)
    val cnt = (alphabet: String) =>
      length(t) - length(translate(t, alphabet, ""))
    // decimal(38,0) widening (oracle: HUGEINT): per-source char-class
    // masses wrap the 2e6-scaled Long numerator at web scale
    val micro = (c: Column, n: Column) =>
      when(n > 0L, intDiv(c.cast("decimal(38,0)") * lit(2000000L)
          + n.cast("decimal(38,0)"),
        n.cast("decimal(38,0)") * lit(2L)).cast("long"))
    docs
      .select(col(sourceCol).as("source"),
        length(t).cast("long").as("__c"),
        cnt(letters).cast("long").as("__l"),
        cnt(digits).cast("long").as("__d"),
        cnt(" ").cast("long").as("__s"))
      .groupBy("source")
      .agg(sum("__c").as("n_chars"), sum("__l").as("n_letters"),
        sum("__d").as("n_digits"), sum("__s").as("n_spaces"))
      .select(col("source"), col("n_chars"), col("n_letters"),
        col("n_digits"), col("n_spaces"),
        (col("n_chars") - col("n_letters") - col("n_digits") - col("n_spaces")).as("n_other"),
        micro(col("n_letters"), col("n_chars")).as("letter_micro"),
        micro(col("n_digits"), col("n_chars")).as("digit_micro"),
        micro(col("n_spaces"), col("n_chars")).as("space_micro"),
        micro(col("n_chars") - col("n_letters") - col("n_digits") - col("n_spaces"),
          col("n_chars")).as("other_micro"))
  }

  /** Per-source hapax legomena stats — the vocabulary-richness signal
    * orthogonal to [[lexicalDiversity]]'s distinct ratios: hapaxes
    * (tokens occurring exactly once in the source) dominate natural
    * prose vocabularies (~40–60% of types, per Zipf), so a COLLAPSED
    * hapax share flags template/machine text while an INFLATED one
    * flags OCR noise or tokenizer breakage (every garbled word is a
    * fresh hapax). Reported against both denominators: share of the
    * vocabulary (types) and share of the token mass.
    *
    * Ratios are exact-integer half-up micro (CLAUDE.md rule).
    *
    * Scale shape: one token explode → (source, token) combinable
    * count (the vocab frame), folded to |sources| rows — no joins, no
    * second scan. Output: (source, vocab_size, n_hapax, n_tokens,
    * hapax_vocab_micro, hapax_mass_micro). */
  def hapaxStats(docs: DataFrame, textCol: String,
                 sourceCol: String = "source"): DataFrame = {
    import graft.expressions.HashExpressions.intDiv
    val micro = (c: Column, n: Column) =>
      when(n > 0L, intDiv(lit(2L) * c * 1000000L + n, lit(2L) * n).cast("long"))
    docs
      .select(col(sourceCol).as("source"),
        explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("__c"))
      .groupBy("source")
      .agg(count(lit(1)).as("vocab_size"),
        sum(when(col("__c") === 1L, 1L).otherwise(0L)).as("n_hapax"),
        sum("__c").as("n_tokens"))
      .select(col("source"), col("vocab_size"), col("n_hapax"),
        col("n_tokens"),
        micro(col("n_hapax"), col("vocab_size")).as("hapax_vocab_micro"),
        micro(col("n_hapax"), col("n_tokens")).as("hapax_mass_micro"))
  }

  /** Hill tail-index estimator over the document token-count
    * distribution (Hill 1975) — the heavy-tail diagnostic a capacity
    * planner reads before sizing packing/sharding: α̂ answers "how fast
    * does the length tail decay?" (α ≲ 2 ⇒ giant docs dominate token
    * mass and length-capped chunking is mandatory; the
    * [[zipfFit]] regression answers the same question for token
    * FREQUENCIES). α̂ = k / Σ_{i≤k} ln(x_(i) / x_(k+1)) over the k
    * largest values.
    *
    * Determinism: each ln of an INTEGER length floor-snaps to micro
    * (the q130 snap rule) BEFORE the sum, so every lnµ(x_i) − lnµ(x_k1)
    * term is an exact non-negative integer (floor is monotone) and the
    * sum is exact; α̂ = k·1e6/(Σ/1e6) emits via the shifted half-up
    * intDiv as alpha_micro. Boundary ties cost nothing: rows tied at
    * the cutoff have EQUAL values, so whichever rows the limit keeps,
    * the value multiset — and the estimator — is identical.
    *
    * Scale shape: per-doc token counts ride the scan; the top-(k+1)
    * selection is a TakeOrderedAndProject (bounded k+1-row frame, no
    * global sort); everything after runs on k+1 rows. Degenerate
    * corpora (x_(k+1) = 0 or Σ = 0, i.e. a flat head) emit NULL alpha.
    * Output: one row (k, x_k1, sum_ln_micro, alpha_micro). */
  def hillTailIndex(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    import graft.expressions.HashExpressions.intDiv
    require(k >= 1)
    val lnMicro = (c: Column) => floor(log(c.cast("double")) * lit(1e6)).cast("long")
    val top = docs
      .select(TextAnalysis.tokenCount(col(textCol)).cast("long").as("x"))
      .orderBy(desc("x")).limit(k + 1)
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy()
    // the (k+1)-th value = min over the k+1-row frame (window, no
    // join); the Hill numerator sums over ALL k+1 rows — the cutoff
    // row's own term is lnµ(x_k1)−lnµ(x_k1) = 0, and boundary-tied
    // rows contribute 0 identically, so ties need no row selection
    top
      .withColumn("__xk1", min("x").over(wAll))
      .agg((count(lit(1)) - 1L).as("__k"), max("__xk1").as("x_k1"),
        sum(when(col("__xk1") > 0L, lnMicro(col("x")) - lnMicro(col("__xk1")))).as("sum_ln_micro"))
      .select(col("__k").as("k"), col("x_k1"), col("sum_ln_micro"),
        when(col("x_k1") > 0L && col("sum_ln_micro") > 0L,
          intDiv(lit(2L) * col("__k") * lit(1000000000000L) + col("sum_ln_micro"),
            lit(2L) * col("sum_ln_micro")).cast("long")).as("alpha_micro"))
  }

  /** Per-document OOV rate against the corpus's own top-V vocabulary —
    * the tokenizer-coverage twin of [[vocabCoverage]]: that op sizes
    * the vocab from the corpus side (what mass does top-V hold?), this
    * scores each DOCUMENT against a fixed V (how much of THIS doc
    * would an in-vocab tokenizer shatter into UNK/bytes?) — the
    * per-example signal a curation pass thresholds to drop docs that
    * are mostly out-of-vocabulary noise for the target tokenizer.
    *
    * Vocabulary = top V tokens by (count DESC, token) — the exact
    * [[heavyHitterTokens]] ranking, ties token-lexicographic so the
    * cut is deterministic. oov_micro is the shifted half-up ratio.
    *
    * Scale shape: one cached tokenize feeds the vocab aggregate AND
    * the scoring pass; top-V is TakeOrderedAndProject (never a global
    * sort) and V is bounded by contract, so membership is a BROADCAST
    * left join onto the token stream; one per-doc combinable fold.
    * Output: (id, n_tokens, n_oov, oov_micro). */
  def oovRate(docs: DataFrame, idCol: String, textCol: String,
              vocabSize: Int): DataFrame = {
    import graft.expressions.HashExpressions.intDiv
    require(vocabSize >= 1)
    val tok = tokenized(docs, idCol, textCol).cache()
    val vocab = tok.groupBy("token").agg(count(lit(1)).as("__c"))
      .orderBy(desc("__c"), asc("token")).limit(vocabSize)
      .select(col("token"), lit(1).as("__in"))
    CacheScope.scoped(
      tok.join(broadcast(vocab), Seq("token"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
        .select(col("doc_id").as(idCol), col("n_tokens"), col("n_oov"),
          intDiv(lit(2L) * col("n_oov") * 1000000L + col("n_tokens"),
            lit(2L) * col("n_tokens")).cast("long").as("oov_micro")),
      tok)
  }

  /** Doc-level token co-occurrence with association strength — the
    * frequent-itemset/collocation pass at DOCUMENT granularity
    * ([[pmiBigrams]] is the ADJACENCY twin): for every pair of top-V
    * vocabulary tokens appearing in ≥ `minSupport` common documents,
    * the support, a→b confidence and the symmetric lift — the "these
    * topics travel together" diagnostic that surfaces template
    * families and topical clusters before any embedding exists.
    *
    * Counts are document frequencies over DISTINCT (doc, token) — the
    * association-rule convention (a token repeated in one doc counts
    * once). Confidence/lift in shifted half-up micro; the lift product
    * n_ab·N·10⁶ runs in DECIMAL(38,0) (q121 HUGEINT-mirror rule).
    *
    * Scale shape: the pair join is the inverted-index self-join
    * RESTRICTED to the broadcast top-V vocabulary — per-doc pair
    * volume is ≤ V², bounded by the parameter, never by the corpus's
    * own vocabulary; one cached distinct-postings shuffle feeds the
    * vocab ranking AND both join sides; df/N lookups broadcast.
    * Output: (tok_a, tok_b, n_a, n_b, n_ab, conf_micro, lift_micro). */
  def tokenCooccurrence(docs: DataFrame, idCol: String, textCol: String,
                        vocabSize: Int, minSupport: Long): DataFrame = {
    import graft.expressions.HashExpressions.intDiv
    require(vocabSize >= 2 && minSupport >= 1)
    val dec = "decimal(38,0)"
    val tok = tokenized(docs, idCol, textCol).distinct().cache()
    val vocab = tok.groupBy("token").agg(count(lit(1)).as("df"))
      .orderBy(desc("df"), asc("token")).limit(vocabSize).cache()
    val postings = tok.join(broadcast(vocab.select("token")), "token")
    val a = postings.select(col("doc_id"), col("token").as("tok_a"))
    val b = postings.select(col("doc_id"), col("token").as("tok_b"))
    val pairs = a.join(b, "doc_id").where(col("tok_a") < col("tok_b"))
      .groupBy("tok_a", "tok_b").agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minSupport)
    val total = docs.agg(count(lit(1)).as("__N"))
    val dfA = vocab.select(col("token").as("tok_a"), col("df").as("n_a"))
    val dfB = vocab.select(col("token").as("tok_b"), col("df").as("n_b"))
    CacheScope.scoped(
      pairs.join(broadcast(dfA), "tok_a").join(broadcast(dfB), "tok_b")
        .crossJoin(broadcast(total))
        .select(col("tok_a"), col("tok_b"), col("n_a"), col("n_b"), col("n_ab"),
          intDiv(lit(2L) * col("n_ab") * 1000000L + col("n_a"),
            lit(2L) * col("n_a")).cast("long").as("conf_micro"),
          intDiv(lit(2L).cast(dec) * col("n_ab").cast(dec) * col("__N").cast(dec)
              * lit(1000000L).cast(dec) + col("n_a").cast(dec) * col("n_b").cast(dec),
            lit(2L).cast(dec) * col("n_a").cast(dec) * col("n_b").cast(dec))
            .cast("long").as("lift_micro")),
      tok, vocab)
  }

  /** HyperLogLog distinct-token estimate per group (Flajolet et al.
    * 2007) — the O(m)-state complement to [[kmvDistinctGrams]]: KMV
    * keeps the k smallest hashes (state grows with k for precision),
    * HLL keeps m = 64 one-byte registers whatever the precision
    * target, and registers MERGE by element-wise max — the sketch a
    * 100 TB cardinality dashboard actually ships between nodes.
    *
    * Deterministic by construction: the "random" hash is the portable
    * md5-48 contract (same bits in any engine), so registers, the
    * integer Z-sum and both estimates are engine-exact — even the
    * APPROXIMATION error is reproducible, which is what makes the
    * oracle hash-comparable. Register index = top 6 hash bits, rank
    * ρ = leading-zero count of the remaining 42 bits + 1 (via the
    * minimal-binary-string length, identical in both engines; rem = 0
    * ⇒ ρ = 43). Z is summed in exact integer units 2^(50−M_j) (each
    * term ≤ 2^50, 64 terms < 2^56 — BIGINT), empty registers
    * contribute 2^50 each. Raw estimate = α₆₄·m²·2^50/Z with α₆₄
    * snapped to the spec constant 709341 micro BY DEFINITION (the
    * bias constant is a modeling choice, not a computed value); the
    * ≤ 2.5m small-range regime reports linear counting m·ln(m/V)
    * (V = empty registers) under the ln libm-parity contract. The
    * exact `n_exact` contrast column is droppable at scale.
    *
    * Plan: one DISTINCT (grp, hash) combinable shuffle (the cached
    * frame feeds the exact count AND the registers), one (grp,
    * register) max-agg, then a fold to |groups| rows. Nothing after
    * the distinct is corpus-sized. */
  /** The ONE Scala-side HLL estimator — register array → (v_zero,
    * z_int, est_hll) by EXACTLY the [[hllDistinctTokens]] column
    * formulas (same α constant, same integer Z units, same linear
    *-counting branch); the streaming window close
    * ([[graft.streaming.StreamingCorpusStats.windowedHllDistinct]])
    * and the spec's hand replay both call this, so batch SQL, stream
    * state and test oracle cannot drift apart. */
  def hllEstimate(registers: Array[Int]): (Long, Long, Long) = {
    require(registers.length == 64)
    val vZero = registers.count(_ == 0).toLong
    var z = 0L
    registers.foreach(r => z += 1L << (50 - r))
    val estRaw = ((BigInt(2) * 709341L * 4096L * (BigInt(1) << 50) +
      BigInt(1000000) * z) / (BigInt(2000000) * z)).toLong
    val est =
      if (estRaw <= 160L && vZero > 0L) {
        val lnMicro = math.floor(math.log(64.0 / vZero) * 1e6).toLong
        (2L * 64L * lnMicro + 1000000L) / 2000000L
      } else estRaw
    (vZero, z, est)
  }

  /** Register updates for one 48-bit hash: index = top 6 bits, rank =
    * leading-zero count of the remaining 42 + 1. Max-merge —
    * commutative AND idempotent, so arrival order, partitioning and
    * duplicate delivery are all invisible. */
  def hllObserve(registers: Array[Int], h: Long): Unit = {
    val b = (h >>> 42).toInt
    val rem = h & ((1L << 42) - 1)
    val rho =
      if (rem == 0L) 43
      else 43 - (64 - java.lang.Long.numberOfLeadingZeros(rem))
    if (rho > registers(b)) registers(b) = rho
  }

  def hllDistinctTokens(docs: DataFrame, groupCol: String,
                        textCol: String): DataFrame = {
    import graft.expressions.HashExpressions.intDiv
    val m = 64L                 // 2^6 registers
    val remBits = 42            // 48-bit hash minus the 6 index bits
    val alphaMicro = 709341L    // α₆₄ = .7213/(1+1.079/64), spec-snapped
    val dec = "decimal(38,0)"
    val distinctHashes = docs
      .select(col(groupCol).as("grp"), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .where(size(col("__toks")) >= 1)
      .select(col("grp"),
        explode(graft.expressions.HashExpressions.md5GramHashes48(col("__toks"), 1)).as("h"))
      .distinct().cache()
    val regs = distinctHashes
      .select(col("grp"), intDiv(col("h"), lit(1L << remBits)).as("b"),
        (col("h") % lit(1L << remBits)).as("rem"))
      .select(col("grp"), col("b"),
        when(col("rem") === 0L, lit(remBits + 1))
          .otherwise(lit(remBits + 1) - length(bin(col("rem")))).as("rho"))
      .groupBy("grp", "b").agg(max("rho").as("mr"))
      // 2^(50−mr): mr ≤ 43 so the exponent ∈ [7, 49] — double-exact,
      // the cast is an integer identity
      .groupBy("grp").agg(count(lit(1)).as("__present"),
        sum(pow(lit(2.0), lit(50) - col("mr")).cast("long")).as("__zp"))
    val exact = distinctHashes.groupBy("grp").agg(count(lit(1)).as("n_exact"))
    val zInt = col("__zp") + (lit(m) - col("__present")) * lit(1L << 50)
    val vZero = (lit(m) - col("__present")).cast("long")
    // round(α·m²·2^50 / Z) in DECIMAL(38,0) (the q121 HUGEINT-mirror
    // rule: α·m²·2^50 ≈ 2^84 overflows BIGINT)
    val estRaw = intDiv(
      lit(2L).cast(dec) * lit(alphaMicro).cast(dec) * lit(m * m).cast(dec) *
        lit(1L << 50).cast(dec) + lit(1000000L).cast(dec) * zInt.cast(dec),
      lit(2000000L).cast(dec) * zInt.cast(dec)).cast("long")
    // linear counting m·ln(m/V): m/V is one IEEE divide, ln under the
    // libm-parity contract, floor-snapped to micro before the half-up
    val lnMicro = floor(log(lit(m.toDouble) / vZero.cast("double")) * lit(1e6)).cast("long")
    val estLin = intDiv(lit(2L) * lit(m) * lnMicro + lit(1000000L), lit(2000000L)).cast("long")
    CacheScope.scoped(
      regs.join(exact, "grp")
        .select(col("grp").as(groupCol), col("n_exact"),
          vZero.as("v_zero"), zInt.cast("long").as("z_int"),
          estRaw.as("est_raw"),
          when(estRaw <= lit(160L) && vZero > 0L, estLin)
            .otherwise(estRaw).as("est_hll")),
      distinctHashes)
  }

  /** Head-position token bias — template/boilerplate-header detection:
    * tokens systematically OVERREPRESENTED in the first `headLen`
    * positions of documents (navigation chrome, license banners, form
    * labels — the q138 head-anchor dup's token-level sibling: anchors
    * catch verbatim headers, this catches templated VOCABULARY whose
    * surrounding text varies). For the global top-`topN` tokens
    * (count DESC, token ASC — the q42 ranking convention):
    * head_micro = the token's own share of occurrences landing at
    * position < headLen; lift_micro = that share over the corpus
    * baseline share — both exact integer ratios in half-up micro,
    * the lift's cross products through DECIMAL(38,0) (the q121
    * overflow rule: n_head·total·2e6 passes 2⁶³ at ~1e12-token
    * corpora).
    *
    * Scale shape: ONE corpus scan (posexplode off the tokenizer
    * kernel) → ONE map-combinable shuffle to |vocab| rows (cached,
    * vocab-sized — feeds the top-N rank and the 1-row totals) →
    * TakeOrdered top-N → one broadcast of the totals row. Output:
    * (token, n_total, n_head, head_micro, lift_micro). */
  def headTokenBias(docs: DataFrame, textCol: String, headLen: Int = 10,
                    topN: Int = 200): DataFrame = {
    import graft.expressions.HashExpressions.intDiv
    val dec = "decimal(38,0)"
    val per = docs
      .select(posexplode(TextAnalysis.tokens(col(textCol))))
      .select(col("pos"), col("col").as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("pos") < headLen, 1L).otherwise(0L)).as("n_head"))
      .cache()
    val totals = broadcast(per.agg(sum("n_total").as("__t"),
      sum("n_head").as("__th")))
    val top = per.orderBy(desc("n_total"), asc("token")).limit(topN)
    CacheScope.scoped(
      top.crossJoin(totals)
        .select(col("token"), col("n_total"), col("n_head"),
          // widened: a degenerate corpus can put ~all token mass on
          // one type, overflowing the 2e6-scaled Long numerator
          intDiv(col("n_head").cast("decimal(38,0)") * lit(2000000L)
              + col("n_total").cast("decimal(38,0)"),
            col("n_total").cast("decimal(38,0)") * lit(2L)).as("head_micro"),
          intDiv(
            lit(2L).cast(dec) * col("n_head").cast(dec) * col("__t").cast(dec)
              * lit(1000000L) + col("n_total").cast(dec) * col("__th").cast(dec),
            lit(2L).cast(dec) * col("n_total").cast(dec) * col("__th").cast(dec))
            .cast("long").as("lift_micro")),
      per)
  }
}
