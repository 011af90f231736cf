package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Deterministic, distributed-safe sampling for training-data pipelines.
  *
  * Spark's `df.sample` is partition-layout-dependent; at 100 TB a
  * repeatable sample must be a pure function of row CONTENT. Both ops
  * here key off `xxhash64` of an id column:
  *
  *  - `deterministicSample`: keep rows whose hash falls under a
  *    threshold — embarrassingly parallel, no shuffle, exact-ish rate.
  *  - `BottomKSample`: an `Aggregator` keeping the k smallest hashes —
  *    a mergeable uniform-without-replacement sample (the bottom-k
  *    sketch), usable as a UDAF in SQL and per-group.
  */
object Sampling {

  /** THE portable bucket: first 32 bits of md5(seed ':' id) mod
    * `outOf`. Every content-keyed sampling op derives from this one
    * expression — it is the cross-engine determinism contract the
    * q44/q50/q57 oracles replicate, so it must exist exactly once.
    * Public so OTHER operators that must agree with the sample
    * (e.g. the split-leakage audit's holdout predicate) call this
    * instead of re-inlining the formula — a drifted copy would
    * silently audit a different holdout than the sampler produced. */
  def md5Bucket(idCol: String, outOf: Int, seed: String = "graft"): Column = {
    val hx = md5(concat(lit(seed), lit(":"), col(idCol).cast("string")).cast("binary"))
    (conv(substring(hx, 1, 8), 16, 10).cast("long") % outOf).cast("int")
  }

  /** Content-keyed Bernoulli sample: deterministic across runs,
    * partitionings and cluster sizes. */
  def deterministicSample(df: DataFrame, idCol: String, fraction: Double,
                          seed: Long = 42L): DataFrame = {
    require(fraction >= 0 && fraction <= 1)
    val threshold = (fraction * Long.MaxValue).toLong
    df.where(abs(xxhash64(lit(seed), col(idCol))) < threshold)
  }

  /** Engine-portable content-keyed sample: keep rows whose bucket —
    * the first 32 bits of md5(seed ':' id) taken mod `outOf` — falls
    * below `keep`. Same contract as `deterministicSample` (pure
    * function of content: no shuffle, stable across partitionings and
    * cluster sizes) but md5-derived, so any SQL engine reproduces the
    * exact row set (xxhash64 seeds/variants differ between engines).
    * The bucket column is also how a pipeline splits train/holdout
    * deterministically. */
  def portableSample(df: DataFrame, idCol: String, keep: Int, outOf: Int = 100,
                     seed: String = "graft"): DataFrame = {
    require(keep >= 0 && keep <= outOf && outOf > 0)
    df.withColumn("bucket", md5Bucket(idCol, outOf, seed))
      .where(col("bucket") < keep)
  }

  /** Stratified engine-portable sample: per-stratum keep rates over the
    * same md5 bucket as `portableSample`. The rate lookup is a literal
    * CASE chain (strata maps are small by definition — languages,
    * sources, quality tiers), so the whole operator stays a stateless
    * per-row filter: no shuffle, no join, deterministic across runs,
    * partitionings and engines. This is how a curation pipeline
    * rebalances a corpus (e.g. downsample English to X%, keep all of a
    * low-resource language) without ever materializing per-stratum
    * row numbers.
    *
    * Strata absent from `rates` fall back to `defaultKeep`. */
  def stratifiedPortableSample(df: DataFrame, idCol: String, strataCol: String,
                               rates: Map[String, Int], defaultKeep: Int,
                               outOf: Int = 100, seed: String = "graft"): DataFrame = {
    require(defaultKeep >= 0 && defaultKeep <= outOf && outOf > 0)
    rates.values.foreach(r => require(r >= 0 && r <= outOf))
    // deterministic CASE order (sorted keys) — plan text is reproducible
    val keepFor = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultKeep)) {
      case (acc, (stratum, keep)) =>
        when(col(strataCol) === stratum, lit(keep)).otherwise(acc)
    }
    df.withColumn("bucket", md5Bucket(idCol, outOf, seed))
      .where(col("bucket") < keepFor)
  }

  /** Per-group deterministic holdout: the k rows with the smallest
    * md5(seed ':' id) per group — a uniform-without-replacement sample
    * that is a pure function of row content (same contract as
    * `portableSample`, but an exact per-GROUP count instead of a
    * global rate). The md5 hex STRING is the ordering key, so any SQL
    * engine picks the identical rows. One window sort per group,
    * spillable, never buffers a group in memory. For a shuffle-free
    * sketch version of the same idea see [[BottomKSample]]. */
  def groupHoldout(df: DataFrame, idCol: String, groupCol: String, k: Int,
                   seed: String = "graft"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hx = md5(concat(lit(seed), lit(":"), col(idCol).cast("string")).cast("binary"))
    df.withColumn("__hx", hx)
      .withColumn("holdout_rank", row_number().over(
        Window.partitionBy(col(groupCol)).orderBy(col("__hx"), col(idCol))))
      .where(col("holdout_rank") <= k)
      .drop("__hx")
  }

  /** Token-budget domain mixing: give every domain (source, language,
    * quality tier…) at most `budgetTokens` tokens in the output mix by
    * downsampling over-represented domains with the [[portableSample]]
    * md5 bucket — the data-mixing step a pretraining pipeline runs to
    * hit a per-domain token allocation (cf. the domain-weighting setup
    * in Gopher/DoReMi-style mixes, re-expressed as deterministic
    * bucket filtering).
    *
    * A domain keeps `keep_buckets = min(outOf, ⌊budget·outOf /
    * total_tokens⌋)` of `outOf` content-keyed buckets — all integer
    * arithmetic, so the mix is exact-reproducible on any engine, any
    * partitioning, any cluster size. A domain under budget keeps
    * everything.
    *
    * Scale shape: ONE corpus scan into a (domain, bucket) pre-aggregate
    * (≤ |domains|·outOf groups, map-combined); totals, rates and kept
    * counts all derive from that tiny frame — the text column is never
    * rescanned and no per-row join ever happens. To materialize the
    * kept ROWS at scale, reuse the same bucket predicate as a stateless
    * filter (`portableSample` contract) in a second scan.
    *
    * Output: one row per domain — (domain, total_docs, total_tokens,
    * keep_buckets, kept_docs, kept_tokens). */
  def tokenBudgetMix(df: DataFrame, idCol: String, domainCol: String,
                     nTokens: Column, budgetTokens: Long, outOf: Int = 100,
                     seed: String = "graft"): DataFrame = {
    require(budgetTokens > 0 && outOf > 0)
    val perBucket = df
      .select(col(domainCol).as("domain"),
        md5Bucket(idCol, outOf, seed).as("bucket"),
        nTokens.cast("long").as("n_tokens"))
      .groupBy("domain", "bucket")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("domain")
    perBucket
      .withColumn("total_docs", sum("n_docs").over(w))
      .withColumn("total_tokens", sum("n_tokens").over(w))
      // `div` = exact integral division (Spark `div`, DuckDB `//`) — a
      // double `/` + floor can misround within an ulp of an integer.
      // A zero-token domain (possible with a caller-supplied count
      // expression) keeps everything rather than ANSI-throwing on the
      // zero divisor.
      .withColumn("keep_buckets",
        when(col("total_tokens") <= 0, lit(outOf.toLong))
          .otherwise(least(lit(outOf.toLong),
            expr(s"${budgetTokens}L * $outOf div total_tokens"))))
      .groupBy(col("domain"), col("total_docs"), col("total_tokens"), col("keep_buckets"))
      .agg(
        sum(when(col("bucket") < col("keep_buckets"), col("n_docs")).otherwise(0L)).as("kept_docs"),
        sum(when(col("bucket") < col("keep_buckets"), col("n_tokens")).otherwise(0L)).as("kept_tokens"))
      .select("domain", "total_docs", "total_tokens", "keep_buckets",
        "kept_docs", "kept_tokens")
  }

  /** Temperature-scaled domain mixture weights (the α-sampling rule of
    * multilingual/multi-domain pretraining, e.g. mBERT/XLM-R's
    * p_i ∝ p_i^α): per domain, the raw token share p_raw, the
    * α=0.5-tempered share p_temp ∝ √n_tokens, and the resampling
    * factor epochs = p_temp / p_raw a mixer must apply to hit the
    * tempered mix (>1 = upsample rare domain, <1 = downsample).
    *
    * Cross-engine determinism: √ is IEEE-correctly-rounded (unlike
    * exp/pow — α is therefore FIXED at 0.5 rather than a parameter),
    * and each √n_tokens is snapped to integer micro-units
    * (⌊√n·10⁶⌋) BEFORE the cross-domain Σ, so both sums are exact
    * integer math with no FP-order dependence; the emitted ratios are
    * single correctly-rounded divides, rounded 6 dp.
    *
    * Scale shape: ONE map-combined corpus scan → |domains| rows; the
    * cross-domain totals are an unpartitioned window over that tiny
    * frame (the [[tokenBudgetMix]] idiom — a separate totals aggregate
    * would re-scan the corpus for a 1-row result). Nothing per-row
    * survives the pre-aggregate. */
  def domainMixture(df: DataFrame, domainCol: String, nTokens: Column): DataFrame = {
    val perDom = df
      .select(col(domainCol).as("domain"), nTokens.cast("long").as("__t"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"), sum("__t").as("n_tokens"))
      .withColumn("__s_micro",
        floor(sqrt(col("n_tokens").cast("double")) * 1e6).cast("long"))
    // empty partitionBy = every domain row in ONE window partition —
    // correct here precisely because the frame is |domains|-sized
    val w = org.apache.spark.sql.expressions.Window.partitionBy()
    perDom
      .withColumn("__tot_tokens", sum("n_tokens").over(w))
      .withColumn("__tot_s", sum("__s_micro").over(w))
      .select(
        col("domain"), col("n_docs"), col("n_tokens"),
        round(col("n_tokens").cast("double") / col("__tot_tokens").cast("double"), 6)
          .as("p_raw"),
        round(col("__s_micro").cast("double") / col("__tot_s").cast("double"), 6)
          .as("p_temp"),
        round((col("__s_micro").cast("double") / col("__tot_s").cast("double")) /
          (col("n_tokens").cast("double") / col("__tot_tokens").cast("double")), 6)
          .as("epochs"))
  }

  /** DoReMi-style iterative domain reweighting (Xie et al. 2023's
    * multiplicative-weights loop, with a per-domain PROXY loss instead
    * of a trained proxy model): domains whose loss exceeds the current
    * mixture's weighted mean get up-weighted, the mixture re-normalizes,
    * and the loop repeats — the fixed-point concentrates sampling
    * weight on the domains a model would currently learn the most
    * from. Update per iteration (η snapped to a power of two so the
    * factor is IEEE-exact):
    *   L̄ = Σ w_s·L_s;  w_s ← w_s·(1 + η·(L_s − L̄)/L̄);  w ← w/Σw
    * 1 + η·A ≥ 1 − η > 0 since A ≥ −1, so weights stay positive for
    * ANY loss vector.
    *
    * Scale shape: ONE corpus scan folds to a |domains|-row (count,
    * loss-sum) frame; the iteration runs driver-side on that
    * catalog-sized vector (k ≈ tens — parameter-bounded, never
    * data-sized) — the same bounded-collect contract as the IVF
    * centroid build. Cross-engine determinism: L_s is one IEEE divide
    * of exact integers; the loop is +,−,×,÷ only (no transcendentals),
    * so both engines walk the same correctly-rounded op sequence —
    * the only slack is k-element sum ORDER (≈1e-16, absorbed by the
    * round-6 output like every cosine here). mean-loss is emitted as
    * exact half-up micro-units (an integer ratio CAN tie at the 6th
    * decimal — q82 rule), DECIMAL-widened against 100-TB token sums.
    * Precondition: Σ w·L > 0 (any non-empty corpus with a counting
    * loss); a zero mixture loss freezes the weights rather than
    * dividing by zero (the SQL oracle shares the non-zero
    * precondition — its CASE-free update would NULL out instead).
    */
  def domainReweightMW(df: DataFrame, domainCol: String, lossCol: Column,
                       eta: Double = 0.25, iters: Int = 10): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val per = df
      .select(col(domainCol).as("domain"), lossCol.cast("long").as("__l"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n"), coalesce(sum("__l"), lit(0L)).as("ls"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val k = per.length
    if (k == 0) return Seq.empty[(String, Long, Long, Double)]
      .toDF("source", "n_docs", "loss_micro", "weight")
    val loss = per.map { case (_, n, ls) => ls.toDouble / n }
    var w = Array.fill(k)(1.0 / k)
    var it = 0
    while (it < iters) {
      var lbar = 0.0
      var i = 0
      while (i < k) { lbar += w(i) * loss(i); i += 1 }
      if (lbar > 0) {
        i = 0
        while (i < k) { w(i) = w(i) * (1 + eta * ((loss(i) - lbar) / lbar)); i += 1 }
      }
      var tot = 0.0
      i = 0
      while (i < k) { tot += w(i); i += 1 }
      i = 0
      while (i < k) { w(i) = w(i) / tot; i += 1 }
      it += 1
    }
    per.zipWithIndex.map { case ((s, n, ls), i) =>
      // exact half-up micros in BigInt (2·ls·10⁶ overflows Long at
      // ~4.6e12 tokens per domain — real at 100 TB)
      val micro = ((BigInt(2) * ls * 1000000 + n) / (BigInt(2) * n)).toLong
      val wr = BigDecimal(w(i)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
      (s, n, micro, wr)
    }.toSeq.toDF("source", "n_docs", "loss_micro", "weight")
  }

  /** UniMax-style epoch-capped budget allocation (Chung et al. 2023,
    * "UniMax: Fairer and More Effective Language Sampling for
    * Large-Scale Multilingual Pretraining"): distribute a token budget
    * B across languages so no language repeats more than `maxEpochs`
    * times, giving low-resource languages their full capped mass and
    * splitting the remainder evenly.
    *
    * Computed via the WATER-FILLING closed form rather than the
    * paper's sequential greedy loop: with languages ascending by size,
    * a language takes its cap n·E iff every smaller language did AND
    * n_i·E·(L−i+1) ≤ B − E·cum_{i−1} (once a language falls to the
    * fair share, every larger one does too, and the fair share
    * rem/(langs left) is INVARIANT from there on — so the greedy
    * recursion collapses to prefix sums). That makes the whole
    * allocation window arithmetic over the |langs|-row aggregate: no
    * driver loop, no iteration, exact integers end-to-end (epochs via
    * the shifted intDiv half-up micro form, DECIMAL-widened so the
    * ·2·10⁶ shift can't overflow at 100-TB token counts).
    *
    * Scale shape: ONE corpus-sized map-combinable shuffle (per-lang
    * counts) → a catalog-sized frame (windows over |langs| rows — the
    * bounded-frame rule) + a 1-row broadcast of the capped totals.
    *
    * Output: (lang, n_docs, n_tokens, capped, alloc_tokens,
    * epochs 6 dp). */
  def epochCappedMix(docs: DataFrame, langCol: String, textCol: String,
                     budgetTokens: Long, maxEpochs: Int): DataFrame = {
    import graft.expressions.HashExpressions.intDiv
    val w = org.apache.spark.sql.expressions.Window
    require(budgetTokens >= 0 && maxEpochs >= 1)
    val perLang = docs
      .select(col(langCol).as("lang"),
        graft.functions.TextAnalysis.tokenCount(col(textCol)).cast("long").as("__t"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("__t").as("n_tokens"))
    val wOrd = w.orderBy(asc("n_tokens"), asc("lang"))
    val ranked = perLang
      .withColumn("__i", row_number().over(wOrd))
      .withColumn("__L", count(lit(1)).over(w.partitionBy()))
      .withColumn("__cum", coalesce(sum("n_tokens").over(
        wOrd.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)),
        lit(0L)))
    val cond = col("n_tokens") * lit(maxEpochs.toLong) * (col("__L") - col("__i") + 1) <=
      lit(budgetTokens) - lit(maxEpochs.toLong) * col("__cum")
    // cached: `flagged` (a |langs|-row frame) feeds BOTH the caps 1-row
    // aggregate and the final select — uncached, each branch re-scans
    // the whole corpus for the per-lang aggregate. CacheScope-scoped.
    val flagged = ranked.withColumn("__capped",
      min(when(cond, 1L).otherwise(0L)).over(
        wOrd.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)) === 1L)
      .cache()
    val caps = flagged.agg(
      coalesce(sum(when(col("__capped"), col("n_tokens"))), lit(0L)).as("__capTok"),
      coalesce(sum(when(col("__capped"), 1L)), lit(0L)).as("__nCap"),
      count(lit(1)).as("__L2"))
    val alloc = when(col("__capped"), col("n_tokens") * lit(maxEpochs.toLong))
      .otherwise(intDiv(
        lit(budgetTokens) - lit(maxEpochs.toLong) * col("__capTok"),
        col("__L2") - col("__nCap")))
    CacheScope.scoped(
      flagged.crossJoin(broadcast(caps))
        .withColumn("alloc_tokens", alloc)
        .select(col("lang"), col("n_docs"), col("n_tokens"), col("__capped").as("capped"),
          col("alloc_tokens"),
          // epochs = alloc/n_tokens — exact-integer ratio; DECIMAL(38)
          // operands keep alloc·2·10⁶ exact far past the long range
          (intDiv(
            col("alloc_tokens").cast("decimal(38,0)") * lit(2000000L) + col("n_tokens"),
            col("n_tokens").cast("decimal(38,0)") * lit(2L))
            .cast("double") / 1e6).as("epochs")),
      flagged)
  }

  /** Quality-proportional deterministic sampling ("soft" quality
    * filtering à la FineWeb: don't hard-threshold, keep each document
    * with probability = its quality score): keep iff
    * md5Bucket(id, 10⁶, seed) < round(quality·10⁶) — the
    * content-keyed Bernoulli trial at the document's own rate.
    *
    * Both sides of the comparison are INTEGERS (the [[md5Bucket]]
    * contract on the left; quality as EXACT 6-dp micro-units on the
    * right — e.g. [[graft.functions.TextAnalysis.qualityMicro]], never
    * a `round(double·1e6)`: a one-ulp tie flip would move a whole row
    * in or out of the sample), so the kept set is an exact pure
    * function of content — reproducible on any engine or partitioning,
    * and auditable: a row's keep decision can be re-derived from the
    * row alone. Zero shuffle: a stateless filter riding the scan,
    * trivially parallel at 100 TB. */
  def qualityProportionalSample(df: DataFrame, idCol: String,
                                qualityMicro: Column,
                                seed: String = "qs"): DataFrame = {
    df.withColumn("q_micro", qualityMicro.cast("long"))
      .withColumn("bucket", md5Bucket(idCol, 1000000, seed).cast("long"))
      .where(col("bucket") < col("q_micro"))
  }

  /** Buffer: k smallest (hash, payload) pairs seen so far. */
  final case class BottomK(k: Int, items: List[(Long, String)]) {
    // distinct BEFORE take in both paths: duplicate values must occupy
    // one slot regardless of whether they met in insert or merge, or the
    // sample would depend on partitioning
    def insert(h: Long, v: String): BottomK =
      copy(items = ((h, v) :: items).distinct.sortBy(_._1).take(k))
    def merge(o: BottomK): BottomK =
      copy(items = (items ++ o.items).distinct.sortBy(_._1).take(k))
  }

  /** Uniform-without-replacement sample of k values per group, as an
    * order- and partitioning-independent aggregate. */
  final class BottomKSample(k: Int, seed: Long = 42L)
      extends Aggregator[String, BottomK, Seq[String]] {
    override def zero: BottomK = BottomK(k, Nil)
    override def reduce(b: BottomK, v: String): BottomK = {
      val h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashUnsafeBytes(
        v.getBytes("UTF-8"), org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET,
        v.getBytes("UTF-8").length, seed.toInt).toLong
      b.insert(h, v)
    }
    override def merge(a: BottomK, b: BottomK): BottomK = a.merge(b)
    override def finish(r: BottomK): Seq[String] = r.items.map(_._2)
    override def bufferEncoder: Encoder[BottomK] = Encoders.kryo[BottomK]
    override def outputEncoder: Encoder[Seq[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
  }

  /** Column form: `bottom_k_sample(expr)` usable in `agg(...)`. */
  def bottomKSample(c: Column, k: Int, seed: Long = 42L): Column =
    udaf(new BottomKSample(k, seed)).apply(c)

  /** Buffer: k largest (es_key, value) pairs seen so far — the
    * WEIGHTED counterpart of [[BottomK]]. distinct-by-value before
    * take in both paths (a duplicate value must occupy one slot
    * regardless of where copies met) keeps the result partitioning-
    * independent; ordering is (key DESC, value ASC) — the same
    * tiebreak contract as [[weightedSampleTopK]]. */
  final case class WeightedRes(k: Int, items: List[(Double, String)]) {
    private def top(xs: List[(Double, String)]): List[(Double, String)] =
      xs.distinctBy(_._2).sortBy { case (key, v) => (-key, v) }.take(k)
    def insert(key: Double, v: String): WeightedRes =
      copy(items = top((key, v) :: items))
    def merge(o: WeightedRes): WeightedRes =
      copy(items = top(items ++ o.items))
  }

  /** Mergeable Efraimidis–Spirakis weighted-without-replacement sample
    * of k values, as an order- and partitioning-independent aggregate:
    * the distributed-reduction form of [[weightedSampleTopK]] — usable
    * per-GROUP in `agg(...)`, and in a Structured Streaming aggregation
    * (insert/merge are commutative, state is ≤ k pairs). Input rows are
    * (value, weight); weight ≤ 0 rows are ignored. The key replays the
    * EXACT [[esKey]] contract (md5-32 uniform, ln(u)/w, 6-dp half-up,
    * value tiebreak), so the sampled SET matches the window/TakeOrdered
    * form bit-for-bit on the same data. */
  final class WeightedReservoir(k: Int, seed: String = "es")
      extends Aggregator[(String, Long), WeightedRes, Seq[String]] {
    private def key(v: String, w: Long): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$seed:$v".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      val u = (java.lang.Long.parseLong(hex, 16) + 1).toDouble / 4294967296.0
      BigDecimal(math.log(u) / w).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }
    override def zero: WeightedRes = WeightedRes(k, Nil)
    override def reduce(b: WeightedRes, in: (String, Long)): WeightedRes =
      if (in._2 <= 0) b else b.insert(key(in._1, in._2), in._1)
    override def merge(a: WeightedRes, b: WeightedRes): WeightedRes = a.merge(b)
    override def finish(r: WeightedRes): Seq[String] = r.items.map(_._2)
    override def bufferEncoder: Encoder[WeightedRes] = Encoders.kryo[WeightedRes]
    override def outputEncoder: Encoder[Seq[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
  }

  /** Column form: `weighted_reservoir(struct(value, weight))`. */
  def weightedReservoir(value: Column, weight: Column, k: Int,
                        seed: String = "es"): Column =
    udaf(new WeightedReservoir(k, seed))
      .apply(value.cast("string"), weight.cast("long"))

  /** WEIGHTED sampling without replacement, top-k form (Efraimidis &
    * Spirakis 2006): each row draws a content-keyed uniform u ∈ (0, 1]
    * and is ranked by key = ln(u)/w (monotone in u^(1/w)); the k
    * largest keys are a weight-proportional without-replacement sample
    * — the "sample 100k docs proportional to token count / quality
    * score" primitive a curation pipeline uses where Bernoulli rates
    * ([[qualityProportionalSample]]) can't hit an exact output size.
    *
    * u derives from the SAME portable md5 contract as [[md5Bucket]]:
    * the first 32 md5 bits m of (seed ':' id) give u = (m+1)/2³² —
    * exact dyadic rational, so the only transcendental is ln. The key
    * is ROUNDED to 6 dp and ties broken by id (the metric rule:
    * ln differs across engines in the last ulp; a 6-dp landing
    * exactly on a tie is not representable for ln outputs, unlike
    * integer ratios). Weights must be positive integers.
    *
    * Scale shape: the key is a stateless per-row expression riding the
    * scan; the top-k is `orderBy(...).limit(k)` — a per-partition
    * partial top-k merged on the driver-side take (TakeOrdered), NEVER
    * a global sort shuffle; the rank window then runs on ≤ k rows.
    * Output: (rank, id, weight, es_key). */
  /** The Efraimidis–Spirakis ranking key: ln(u)/w with u =
    * (md5-32(seed ':' id) + 1)/2³² — an exact dyadic rational off the
    * same portable md5 contract as [[md5Bucket]], so the only
    * transcendental is ln. Rounded 6 dp (metric rule: ln outputs
    * cannot land exactly on decimal ties, unlike integer ratios);
    * callers tiebreak on the id. Larger key = more likely sampled. */
  private def esKey(idCol: String, weight: Column, seed: String): Column = {
    val m = conv(substring(
      md5(concat(lit(seed), lit(":"), col(idCol).cast("string")).cast("binary")),
      1, 8), 16, 10).cast("long")
    val u = (m + 1).cast("double") / lit(4294967296.0)
    round(log(u) / weight.cast("double"), 6)
  }

  def weightedSampleTopK(df: DataFrame, idCol: String, weightCol: Column,
                         k: Int, seed: String = "es"): DataFrame = {
    require(k > 0)
    import org.apache.spark.sql.expressions.Window
    val top = df
      .select(col(idCol), weightCol.cast("long").as("weight"))
      .where(col("weight") > 0)
      .withColumn("es_key", esKey(idCol, col("weight"), seed))
      .orderBy(desc("es_key"), col(idCol).asc)
      .limit(k)
    top.withColumn("rank", row_number().over(
        Window.orderBy(desc("es_key"), col(idCol).asc)))
      .select(col("rank"), col(idCol), col("weight"), col("es_key"))
  }

  /** Per-GROUP weighted sampling without replacement: the k largest
    * [[esKey]] rows per group — [[groupHoldout]]'s exact-count-per-
    * group contract with WEIGHT-proportional (instead of uniform)
    * inclusion, e.g. "per language, hold out 1k docs proportional to
    * token count". Same determinism contract as [[weightedSampleTopK]]
    * (pure function of content; 6-dp key, id tiebreak).
    *
    * Scale shape: one window sort per group — keyed, spillable, never
    * buffers a group in memory; Spark's WindowGroupLimit prunes to k
    * rows per group BEFORE the exchange when the filter is on
    * row_number. Output: (group, sample_rank, id, weight, es_key). */
  /** LEAKAGE-SAFE train/holdout split: the split bucket keys off the
    * doc's near-dup CLUSTER representative, not the doc itself — so a
    * document and all its near-duplicates land in the SAME split. The
    * per-doc [[portableSample]] split (q44) silently leaks: at
    * real-corpus duplication rates a held-out doc's near-twin sits in
    * train and the eval measures memorization (the failure q76's audit
    * DETECTS; this operator prevents it by construction).
    *
    * cluster_id comes from [[Dedup.dedupClusters]] (MinHash-LSH pairs →
    * alternating-stars components); un-clustered docs are their own
    * singleton representative, so their assignment degenerates to
    * exactly the q44 bucket on their own id (same md5 contract).
    *
    * Scale shape: clustering touches only ids/signatures (never doc
    * text); the verdict is one id-keyed LEFT join of the label frame
    * back to the id column + a stateless bucket expression. Output:
    * (doc_id, cluster_id, bucket, split ∈ {holdout, train}). */
  def leakageSafeSplit(docs: DataFrame, idCol: String, textCol: String,
                       shingleN: Int, numHashes: Int, bands: Int,
                       minJaccard: Double, holdoutKeep: Int, outOf: Int = 100,
                       seed: String = "graft",
                       pairsIn: Option[DataFrame] = None,
                       clustersIn: Option[DataFrame] = None): DataFrame = {
    require(holdoutKeep >= 0 && holdoutKeep <= outOf && outOf > 0)
    val clusters = Dedup.dedupClusters(docs, idCol, textCol, shingleN,
        numHashes, bands, minJaccard, pairsIn = pairsIn, clustersIn = clustersIn)
      .select(col("doc_id").as(idCol), col("cluster_id"))
    docs.select(col(idCol))
      .join(clusters, Seq(idCol), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col(idCol)))
      .withColumn("bucket", md5Bucket("cluster_id", outOf, seed))
      .withColumn("split",
        when(col("bucket") < holdoutKeep, lit("holdout")).otherwise(lit("train")))
  }

  def weightedGroupSample(df: DataFrame, idCol: String, groupCol: String,
                          weightCol: Column, k: Int,
                          seed: String = "es"): DataFrame = {
    require(k > 0)
    import org.apache.spark.sql.expressions.Window
    df.select(col(groupCol), col(idCol), weightCol.cast("long").as("weight"))
      .where(col("weight") > 0)
      .withColumn("es_key", esKey(idCol, col("weight"), seed))
      .withColumn("sample_rank", row_number().over(
        Window.partitionBy(col(groupCol))
          .orderBy(desc("es_key"), col(idCol).asc)))
      .where(col("sample_rank") <= k)
      .select(col(groupCol), col("sample_rank"), col(idCol), col("weight"),
        col("es_key"))
  }

  /** Output-shard balance report: assign every doc to one of `shards`
    * via the portable [[md5Bucket]] contract and report each shard's
    * doc/token load and its deviation from the ideal 1/shards share —
    * the audit a 100-TB write runs BEFORE committing a sharding key
    * (a skewed shard is the straggler that holds the whole job's
    * tail; hash-sharding is the fix and this is its proof).
    *
    * Determinism: shares and deviations are shifted half-up intDiv
    * micro forms of exact integer ratios (deviation may be negative —
    * computed as a DIFFERENCE of two non-negative half-up micros, so
    * the `//` operands stay non-negative on both engines).
    *
    * Scale shape: one combinable shuffle to `shards` rows; the 1-row
    * token total broadcasts back. Output: (shard, n_docs, n_tokens,
    * share_micro, dev_micro). */
  def shardBalance(docs: DataFrame, idCol: String, textCol: String,
                   shards: Int = 32, seed: String = "graft"): DataFrame = {
    import graft.expressions.HashExpressions.intDiv
    import graft.functions.TextAnalysis
    val perShard = docs
      .select(md5Bucket(idCol, shards, seed).cast("long").as("shard"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("__n"))
      .groupBy("shard")
      .agg(count(lit(1)).as("n_docs"), sum("__n").as("n_tokens"))
    val tot = perShard.agg(sum("n_tokens").as("__tot"))
    val dec = "decimal(38,0)"
    val share = intDiv(col("n_tokens").cast(dec) * lit(2000000L) + col("__tot").cast(dec),
      lit(2L) * col("__tot").cast(dec))
    val ideal = intDiv(lit(2000000L).cast(dec) + lit(shards.toLong).cast(dec),
      lit(2L) * lit(shards.toLong).cast(dec))
    perShard.crossJoin(broadcast(tot))
      .select(col("shard"), col("n_docs"), col("n_tokens"),
        share.as("share_micro"), (share - ideal).as("dev_micro"))
  }

  /** Per-shard source-composition entropy — the companion audit to
    * [[shardBalance]]: that op checks shards carry EQUAL LOAD, this
    * checks each shard carries the SAME MIX. A sharding key correlated
    * with provenance (crawl batch ids, time-prefixed ids) gives every
    * shard a different source distribution, so any per-shard worker —
    * a curriculum epoch, a distillation job, an eval slice — trains on
    * a biased sub-corpus while the load numbers look perfectly flat.
    * Near-zero entropy on a multi-source corpus is the alarm.
    *
    * Shannon entropy in exact integer micro-units under the repo's
    * ln-snap contract (the q132 rule: each ln of an INTEGER count
    * floor-snaps to micro BEFORE the weighted sum, the mean divide is
    * shifted half-up): H = lnµ(n) − ⌈Σ c·lnµ(c) / n⌋. Evenness
    * normalizes by lnµ(n_sources) — 1e6 ⇒ the shard mirrors a uniform
    * mix over its sources. Both are engine-exact BIGINTs.
    *
    * Scale shape: the [[md5Bucket]] shard is a stateless per-row
    * expression; ONE map-combinable shuffle onto (shard, source) —
    * ≤ shards·|sources| groups — and every window-free derivation
    * after it runs on that tiny frame. Output: (shard, n_docs,
    * n_sources, entropy_micro, evenness_micro). */
  def shardCompositionEntropy(docs: DataFrame, idCol: String,
                              sourceCol: String, shards: Int = 16,
                              seed: String = "graft"): DataFrame = {
    import graft.expressions.HashExpressions.intDiv
    require(shards >= 1)
    val lnMicro = (c: Column) => floor(log(c.cast("double")) * lit(1e6)).cast("long")
    val per = docs
      .select(md5Bucket(idCol, shards, seed).cast("long").as("shard"),
        col(sourceCol).as("__src"))
      .groupBy("shard", "__src").agg(count(lit(1)).as("__c"))
      .groupBy("shard").agg(
        sum("__c").as("n_docs"),
        count(lit(1)).as("n_sources"),
        sum(col("__c") * lnMicro(col("__c"))).as("__term"))
    val h = lnMicro(col("n_docs")) -
      intDiv(lit(2L) * col("__term") + col("n_docs"), lit(2L) * col("n_docs"))
    per.select(col("shard"), col("n_docs"), col("n_sources"),
      h.cast("long").as("entropy_micro"),
      when(col("n_sources") > 1L,
        intDiv(lit(2000000L) * h + lnMicro(col("n_sources")),
          lit(2L) * lnMicro(col("n_sources"))).cast("long")).as("evenness_micro"))
  }

  /** Deterministic global shuffle ordinal — the reproducible corpus
    * permutation every training dataloader consumes (examples must be
    * visited in a fixed pseudo-random order, identical across reruns,
    * cluster sizes and partitionings; seed changes give independent
    * permutations per epoch).
    *
    * A naive global `orderBy(rand)` is non-reproducible AND funnels the
    * ranking through one task. This is the two-phase form: shard =
    * [[md5Bucket]] (the portable hash contract), rank WITHIN shard by
    * the md5 hex key (window partitioned by shard — corpus/`shards`
    * rows per partition), and the global ordinal = shard's exclusive
    * count-offset + within-shard rank. The only single-partition window
    * is the offset scan over `shards` rows.
    *
    * Output: (id, shard INT, ordinal BIGINT) — ordinals are a dense
    * permutation of [0, n). */
  def globalShuffleOrdinal(df: DataFrame, idCol: String,
                           shards: Int = 32, seed: String = "shuf"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hx = md5(concat(lit(seed), lit(":"), col(idCol).cast("string")).cast("binary"))
    val keyed = df
      .select(col(idCol), hx.as("__h"), md5Bucket(idCol, shards, seed).as("shard"))
    // ties on __h broken by the unique id (the repo ranking rule)
    val ranked = keyed.withColumn("__pos",
      row_number().over(Window.partitionBy("shard").orderBy(col("__h"), col(idCol)))
        .cast("long") - lit(1L))
    val offsets = keyed.groupBy("shard").agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(
        sum("__n").over(Window.orderBy("shard")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("shard", "__off")
    ranked.join(broadcast(offsets), "shard")
      .select(col(idCol), col("shard"), (col("__off") + col("__pos")).as("ordinal"))
  }
}
