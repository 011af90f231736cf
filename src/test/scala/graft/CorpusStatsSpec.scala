package graft

import graft.operators.{CorpusStats, Sampling}
import org.apache.spark.sql.functions._

/** Behavioral checks for the corpus-statistics operators (their exact
  * engine-vs-oracle equivalence is covered by the driver queries
  * q42–q45; these pin the semantics on hand-computed inputs). */
class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  test("heavyHitterTokens: counts, doc frequencies and deterministic tie ranking") {
    val docs = Seq(
      (1L, "alpha beta alpha"),
      (2L, "beta gamma"),
      (3L, "alpha")).toDF("doc_id", "text")
    val top = CorpusStats.heavyHitterTokens(docs, "doc_id", "text", k = 10)
      .as[(Int, String, Long, Long)].collect().toSeq
    // alpha: 3 occurrences / 2 docs; beta: 2/2; gamma: 1/1
    assert(top === Seq((1, "alpha", 3L, 2L), (2, "beta", 2L, 2L), (3, "gamma", 1L, 1L)))
  }

  test("tfIdf: a token present in every document scores zero; ranking tiebreaks on token") {
    val docs = Seq(
      (1L, "common rare rare"),
      (2L, "common solo")).toDF("doc_id", "text")
    val scores = CorpusStats.tfIdf(docs, "doc_id", "text", topPerDoc = 3)
      .as[(Long, Int, String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._3, r._4)).toSeq).toMap
    // idf(common) = ln(2/2) = 0 → always ranked below any positive score
    assert(scores(1L) === Seq(("rare", math.rint(2 * math.log(2.0) * 1e6) / 1e6), ("common", 0.0)))
    assert(scores(2L).head._1 === "solo")
    assert(scores(2L).last === (("common", 0.0)))
  }

  test("tokenQuantiles: linear interpolation matches the hand-computed values") {
    // token counts 1,2,3,4,5 → p50 = 3; p90: idx 3.6 → 4·0.4 + 5·0.6 = 4.6;
    // p99: idx 3.96 → 4·0.04 + 5·0.96 = 4.96
    val docs = Seq(
      ("en", "a"), ("en", "a b"), ("en", "a b c"),
      ("en", "a b c d"), ("en", "a b c d e")).toDF("lang", "text")
    val row = CorpusStats.tokenQuantiles(docs, "lang", "text")
      .select("lang", "n_docs", "total_tokens", "avg_tokens",
        "p50_tokens", "p90_tokens", "p99_tokens")
      .as[(String, Long, Long, Double, Double, Double, Double)].head()
    assert(row === (("en", 5L, 15L, 3.0, 3.0, 4.6, 4.96)))
  }

  test("portableSample: deterministic under repartitioning; buckets partition the rows") {
    val docs = spark.range(0, 1000).toDF("doc_id")
    val a = Sampling.portableSample(docs, "doc_id", keep = 10)
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.portableSample(docs.repartition(13), "doc_id", keep = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(a === b, "sample must be a pure function of content")
    assert(a.nonEmpty && a.size < 1000)
    // keep = outOf keeps everything; buckets stay inside [0, outOf)
    val all = Sampling.portableSample(docs, "doc_id", keep = 100)
    assert(all.count() === 1000)
    assert(all.agg(min(col("bucket")), max(col("bucket")))
      .as[(Int, Int)].head() match { case (lo, hi) => lo >= 0 && hi < 100 })
  }

  test("kmvDistinctGrams: exact when a group has fewer than k distinct grams") {
    import spark.implicits._
    import graft.operators.CorpusStats
    val docs = Seq((1L, "a b c d", "g1"), (2L, "a b c d e", "g1"))
      .toDF("doc_id", "text", "grp")
    val r = CorpusStats.kmvDistinctGrams(docs, "grp", "text", n = 2, k = 64).head
    // bigrams: {a b, b c, c d} ∪ {a b, b c, c d, d e} = 4 distinct
    assert(r.getAs[Long]("n_exact") === 4L)
    assert(r.getAs[Long]("n_kept") === 4L)
    assert(r.getAs[Double]("est_distinct_grams") === 4.0)
  }

  test("kmvDistinctGrams: estimate within 30% of exact on a >k vocabulary, invariant to partitioning") {
    import spark.implicits._
    import graft.operators.CorpusStats
    // 500 docs of unique bigrams: "w<i> w<i+1>" -> ~999 distinct bigrams
    val docs = (0 until 500).map(i => (i.toLong, s"w${2 * i} w${2 * i + 1} w${2 * i + 2}", "g"))
      .toDF("doc_id", "text", "grp")
    val r = CorpusStats.kmvDistinctGrams(docs, "grp", "text", n = 2, k = 64).head
    val exact = r.getAs[Long]("n_exact").toDouble
    val est = r.getAs[Double]("est_distinct_grams")
    assert(r.getAs[Long]("n_kept") === 64L)
    assert(math.abs(est - exact) / exact < 0.3, s"est $est vs exact $exact")
    // mergeable sketch: result is independent of the partition layout
    val r1 = CorpusStats.kmvDistinctGrams(docs.repartition(13), "grp", "text", n = 2, k = 64).head
    assert(r1.getAs[Double]("est_distinct_grams") === est)
  }

  test("cmsTokenEstimates: never undercounts; exact when the sketch is wide enough") {
    import spark.implicits._
    import graft.operators.CorpusStats
    val docs = (0 until 60).map(i =>
      (i.toLong, s"tok${i % 7} tok${i % 7} tok${i % 13} filler${i % 29}")).toDF("doc_id", "text")
    // narrow sketch: collisions guaranteed (>> 8 distinct tokens), but
    // the CMS invariant est >= exact must hold for every row
    val narrow = CorpusStats.cmsTokenEstimates(docs, "doc_id", "text",
      d = 2, w = 8, topK = 20).collect()
    assert(narrow.nonEmpty)
    narrow.foreach { r =>
      assert(r.getAs[Long]("n_est") >= r.getAs[Long]("n_exact"),
        s"CMS undercounted: $r")
      assert(r.getAs[Long]("overcount") === r.getAs[Long]("n_est") - r.getAs[Long]("n_exact"))
    }
    // ranks are 1..n in exact-count order
    val ranks = narrow.sortBy(_.getAs[Int]("rank"))
    assert(ranks.map(_.getAs[Int]("rank")).toSeq === (1 to narrow.length))
    assert(ranks.sliding(2).forall(p => p.head.getAs[Long]("n_exact") >= p.last.getAs[Long]("n_exact")))
    // wide sketch over a tiny vocabulary: no collisions, estimates exact
    val wide = CorpusStats.cmsTokenEstimates(docs, "doc_id", "text",
      d = 4, w = 4096, topK = 20).collect()
    wide.foreach(r => assert(r.getAs[Long]("overcount") === 0L, s"collision at w=4096: $r"))
    spark.catalog.clearCache()
  }

  test("idfGramCosinePairs: identical docs score 1; rare shared grams outweigh common ones") {
    import spark.implicits._
    import graft.operators.CorpusStats
    val shared = "alpha beta gamma delta"          // one shared passage
    val boiler = "standard footer text here"       // boilerplate in MANY docs
    val docs = (Seq(
      (1L, s"$shared unique1 u2 u3"),
      (2L, s"$shared unique4 u5 u6"),
      (3L, "totally unrelated content with nothing else whatsoever")) ++
      (10L until 20L).map(i => (i, s"$boiler filler$i f$i ff$i")))
      .toDF("doc_id", "text")
    val pairs = CorpusStats.idfGramCosinePairs(docs, "doc_id", "text",
        n = 3, minCosine = 0.1, maxGramDf = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(pairs.contains((1L, 2L)), s"shared-passage pair missing: $pairs")
    assert(!pairs.keys.exists(p => p._1 == 3L || p._2 == 3L))
    // identical docs -> cosine 1 (third doc keeps their grams df < N)
    val ident = CorpusStats.idfGramCosinePairs(
        Seq((1L, shared), (2L, shared),
          (3L, "some other words entirely different")).toDF("doc_id", "text"),
        "doc_id", "text", n = 3, minCosine = 0.1, maxGramDf = 100)
      .collect()
    assert(ident.length === 1 && ident.head.getDouble(3) === 1.0)
    // degenerate corpus where EVERY gram is in every doc: all weights
    // are zero -> no pairs, and no ANSI divide-by-zero
    val degen = CorpusStats.idfGramCosinePairs(
        Seq((1L, shared), (2L, shared)).toDF("doc_id", "text"),
        "doc_id", "text", n = 3, minCosine = 0.0, maxGramDf = 100)
      .collect()
    assert(degen.isEmpty)
    spark.catalog.clearCache()
  }

  test("bm25Search: more matched terms rank higher; shorter docs beat longer at equal tf") {
    import spark.implicits._
    import graft.operators.CorpusStats
    val docs = Seq(
      (1L, "needle one fill fill fill fill"),                 // 1 hit, short
      (2L, "needle two needle fill fill fill fill fill fill fill fill fill"), // 2 hits, long
      (3L, "needle three fill fill fill fill fill fill fill fill fill fill fill fill"), // 1 hit, longer
      (4L, "nothing relevant at all here whatsoever")
    ).toDF("doc_id", "text")
    val got = CorpusStats.bm25Search(docs, "doc_id", "text",
        queryTerms = Seq("needle"), k = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(!got.exists(_._2 == 4L), "no-hit doc must not appear")
    assert(got.map(_._1).toSeq === (1 to got.length))
    val byDoc = got.map(g => g._2 -> g._4).toMap
    assert(byDoc(2L) > byDoc(1L), "double tf must outrank single tf here")
    assert(byDoc(1L) > byDoc(3L), "shorter doc must outrank longer at equal tf")
  }

  test("rrfFuse: both-list docs outrank single-list docs; exact 1/(c+rank) scores") {
    import spark.implicits._
    import graft.operators.CorpusStats
    val lex = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("doc_id", "rank")
    val dense = Seq((20L, 1), (40L, 2)).toDF("doc_id", "rank")
    val got = CorpusStats.rrfFuse(lex, dense, "doc_id", k = 10)
      .collect().map(r => r.getLong(1) ->
        ((r.getInt(0), r.getDouble(2), r.getBoolean(3), r.getBoolean(4)))).toMap
    def s(r: Int) = 1.0 / (60 + r)
    def rd(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(20L)._1 === 1, "doc in both lists must fuse to the top")
    assert(got(20L)._2 === rd(s(2) + s(1)))
    assert(got(20L)._3 && got(20L)._4)
    assert(got(10L)._2 === rd(s(1)) && got(10L)._3 && !got(10L)._4)
    assert(got(40L)._2 === rd(s(2)) && !got(40L)._3 && got(40L)._4)
    // full ordering: 20 (both), then 10 (lex#1), then 40 (dense#2), then 30
    assert(got.toSeq.sortBy(_._2._1).map(_._1) === Seq(20L, 10L, 40L, 30L))
  }

  test("unigramLogProb: uniform corpus scores ln(p); rare-token docs score lower") {
    import spark.implicits._
    import graft.operators.CorpusStats
    // a:4 b:4 of 8 tokens -> p = 0.5 for every token of docs 1/2
    val uniform = Seq((1L, "a b a b"), (2L, "b a b a")).toDF("doc_id", "text")
    val gotU = CorpusStats.unigramLogProb(uniform, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val expected = BigDecimal(math.log(0.5))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(gotU(1L) === ((4L, expected)) && gotU(2L) === ((4L, expected)))
    spark.catalog.clearCache()
    // doc 9's token appears once in 9 tokens -> much lower mean logprob
    val skewed = Seq((1L, "c c c c"), (2L, "c c c c"), (9L, "zzz")).toDF("doc_id", "text")
    val gotS = CorpusStats.unigramLogProb(skewed, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(gotS(9L) < gotS(1L))
    assert(gotS(1L) === BigDecimal(math.log(8.0 / 9.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    spark.catalog.clearCache()
  }

  test("corpusCard: dup counting, token totals and exact quality mass per group") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "web", "en"),
      (2L, "the quick brown fox jumps over the lazy dog", "web", "en"), // exact dup of 1
      (3L, "completely different text in the same group here", "web", "en"),
      (4L, "short", "books", "en")
    ).toDF("doc_id", "text", "source", "lang")
    val got = CorpusStats.corpusCard(docs, "doc_id", "text", Seq("source", "lang"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val web = got(("web", "en"))
    assert(web.getAs[Long]("n_docs") === 3L)
    assert(web.getAs[Long]("n_dup_docs") === 1L)      // docs 1+2 share a fingerprint
    assert(web.getAs[Long]("n_tokens") === 9L + 9L + 8L)
    assert(web.getAs[Int]("min_toks") === 8)
    assert(web.getAs[Int]("max_toks") === 9)
    val books = got(("books", "en"))
    assert(books.getAs[Long]("n_dup_docs") === 0L)
    // quality mass: mean over ONE doc equals that doc's rounded score
    val q4 = docs.where($"doc_id" === 4L)
      .select(round(graft.functions.TextAnalysis.qualityScore($"text"), 6))
      .as[Double].head()
    assert(math.abs(books.getAs[Double]("mean_quality") - q4) < 1e-9)
  }

  test("sourceOverlapMatrix: shared grams counted once per source pair, disjoint pairs absent") {
    // srcA and srcB share exactly the grams of the common sentence
    // (present in TWO srcA docs — distinct-per-source must count it once);
    // srcC shares nothing with anyone
    val common = "alpha beta gamma delta epsilon"   // 5 toks → 3 trigrams
    val docs = Seq(
      (1L, common + " one two three", "srcA"),      // 8 toks → 6 grams
      (2L, common + " four five six", "srcA"),      // 6 more grams (3 shared w/ doc1)
      (3L, common, "srcB"),                         // exactly the 3 common grams
      (4L, "seven eight nine ten eleven twelve", "srcC")
    ).toDF("doc_id", "text", "source")
    val got = CorpusStats.sourceOverlapMatrix(docs, "source", "text", n = 3)
      .select("source_a", "source_b", "n_shared", "jaccard")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // srcA distinct grams: doc1 6 + doc2 6, overlapping in the 3 common → 9
    // srcB grams: 3, all shared → jaccard = 3/(9+3-3)
    assert(got(("srcA", "srcB")) ===
      ((3L, math.rint(3.0 / 9.0 * 1e6) / 1e6)))
    // disjoint sources emit NO row (sparse matrix, not a zero-filled one)
    assert(!got.contains(("srcA", "srcC")) && !got.contains(("srcB", "srcC")))
    spark.catalog.clearCache()
  }

  test("kmvSourceOverlap: exact when the union fits the sketch; tracks exact jaccard on the fixture") {
    val common = "alpha beta gamma delta epsilon"
    val docs = Seq(
      (1L, common + " one two three", "srcA"),
      (2L, common + " four five six", "srcA"),
      (3L, common, "srcB"),
      (4L, "seven eight nine ten eleven twelve", "srcC")
    ).toDF("doc_id", "text", "source")
    val got = CorpusStats.kmvSourceOverlap(docs, "source", "text", n = 3, k = 64)
      .select("source_a", "source_b", "sample_k", "n_both", "jaccard_est", "union_est")
      .as[(String, String, Long, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    // union (9 distinct grams) < k ⇒ the sketch IS the union: everything exact
    assert(got(("srcA", "srcB")) === ((9L, 3L, 0.333333, 9.0)))
    // zero-overlap pairs are EMITTED here (full matrix, unlike the exact op)
    assert(got(("srcA", "srcC"))._2 === 0L)
    assert(got(("srcB", "srcC"))._2 === 0L)
    spark.catalog.clearCache()

    // fixture: the k=64 estimate must track the exact jaccard closely
    val fixture = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val exact = CorpusStats.sourceOverlapMatrix(fixture, "source", "text", n = 3)
      .select("source_a", "source_b", "jaccard")
      .as[(String, String, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    spark.catalog.clearCache()
    val est = CorpusStats.kmvSourceOverlap(fixture, "source", "text", n = 3, k = 64)
      .select("source_a", "source_b", "jaccard_est")
      .as[(String, String, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    spark.catalog.clearCache()
    val errs = est.map { case (pair, j) => math.abs(j - exact.getOrElse(pair, 0.0)) }
    assert(errs.nonEmpty)
    val meanErr = errs.sum / errs.size
    assert(meanErr < 0.15, s"KMV jaccard mean error too high: $meanErr")
  }

  test("vocabCoverage: cumulative mass is monotone, ends at 1 when V ≥ vocab") {
    val docs = Seq(
      (1L, "a a a b b c"),
      (2L, "a b d")).toDF("doc_id", "text")
    val got = CorpusStats.vocabCoverage(docs, "doc_id", "text", topV = 10)
      .as[(Int, String, Long, Long, Double)].collect().sortBy(_._1)
    // a:4 b:3 c:1 d:1 of 9 total; ties (c, d) break on token
    assert(got.map(r => (r._2, r._3)).toSeq ===
      Seq(("a", 4L), ("b", 3L), ("c", 1L), ("d", 1L)))
    assert(got.map(_._4).toSeq === Seq(4L, 7L, 8L, 9L))
    // half-up micro of 4/9, 7/9, 8/9, 9/9
    assert(got.map(_._5).toSeq === Seq(0.444444, 0.777778, 0.888889, 1.0))
  }

  test("pmiBigrams: attracted pair scores positive, repelled negative; counts exact") {
    // "x y" always co-occur; "x z" never adjacent
    val docs = Seq(
      (1L, "x y x y x y"),
      (2L, "z q z q z q")).toDF("doc_id", "text")
    val got = CorpusStats.pmiBigrams(docs, "doc_id", "text", minCount = 1, topK = 10)
      .as[(Int, String, String, Long, Long, Long, Double)].collect()
      .map(r => (r._2, r._3) -> r).toMap
    // bigrams doc1: xy yx xy yx xy; doc2: zq qz zq qz zq
    assert(got(("x", "y"))._4 === 3L)
    assert(got(("y", "x"))._4 === 2L)
    // p(xy) = 3/10 ≫ p(x)p(y) = (3/12)(3/12) → strongly positive PMI
    assert(got(("x", "y"))._7 > 1.0)
    assert(got(("x", "y"))._5 === 3L && got(("x", "y"))._6 === 3L)
  }

  test("zipfFit: an exact power law recovers its slope") {
    // counts n(rank) = 1024 / rank  → ln n = ln 1024 − 1·ln rank
    val docs = (1 to 16).flatMap { r =>
      val tok = f"t$r%02d" // token names sort with rank so ties can't reorder
      Seq.fill(1024 / r)(tok)
    }.zipWithIndex.map { case (tok, i) => (i.toLong, tok) }.toDF("doc_id", "text")
    val got = CorpusStats.zipfFit(docs, "doc_id", "text", topR = 16)
      .as[(Long, Double, Double, Double)].head()
    assert(got._1 === 16L)
    // 1024/r truncates (not exact for r=3,5,…) → slope near −1, r² near 1
    assert(math.abs(got._2 - (-1.0)) < 0.02, s"slope ${got._2}")
    assert(got._4 > 0.999, s"r2 ${got._4}")
  }

  test("logprobBandGate: bounds bracket the kept set; tails dropped") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = CorpusStats.logprobBandGate(docs, "doc_id", "text",
      pLo = 0.10, pHi = 0.90, sampleKeep = 50)
      .as[(Long, Long, Double, Double, Double, Boolean)].collect()
    val (lo, hi) = (got.head._4, got.head._5)
    assert(lo < hi)
    assert(got.forall(r => r._6 === (r._3 >= lo && r._3 <= hi)))
    // both tails must actually exist and be dropped
    assert(got.exists(r => r._3 < lo))
    assert(got.exists(r => r._3 > hi))
    val kept = got.count(_._6).toDouble / got.length
    assert(kept > 0.5 && kept < 0.95, s"kept fraction $kept")
  }

  test("bigramLogProb: repeated bigram scores higher than word salad") {
    val docs = Seq(
      (1L, "a b a b a b a b"),   // one dominant bigram pattern
      (2L, "c d e f g h i j"))   // every bigram unique
      .toDF("doc_id", "text")
    val got = CorpusStats.bigramLogProb(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1L)._2 === 7L && got(2L)._2 === 7L)
    assert(got(1L)._3 > got(2L)._3)
    spark.catalog.clearCache()
  }

  test("dsirWeights: target-typical docs score above raw-typical docs; partition-invariant") {
    // target speaks only 'alpha beta', raw speaks only 'gamma delta';
    // the scored raw docs split into one target-like and one raw-like
    val docs = Seq(
      (1L, "tgt", "alpha beta alpha beta alpha beta"),
      (2L, "tgt", "beta alpha beta alpha"),
      (3L, "raw", "gamma delta gamma delta gamma delta"),
      (4L, "raw", "alpha beta alpha beta"),   // looks like target
      (5L, "raw", "gamma delta gamma delta")) // looks like raw
      .toDF("doc_id", "source", "text")
    val got = CorpusStats.dsirWeights(docs, "doc_id", "text",
        targetPred = col("source") === "tgt", buckets = 64)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(4L)._2 === 4L && got(5L)._2 === 4L)
    assert(got(4L)._3 > 0L, "target-like doc must carry positive log weight")
    assert(got(5L)._3 < 0L, "raw-like doc must carry negative log weight")
    assert(got(4L)._3 > got(5L)._3)
    // pure function of content: same result under any partitioning
    val re = CorpusStats.dsirWeights(docs.repartition(7), "doc_id", "text",
        targetPred = col("source") === "tgt", buckets = 64)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(re === got)
    spark.catalog.clearCache()
  }

  test("weightedSampleTopK: exact E-S keys, weight monotonicity and repartition stability") {
    val docs = (1L to 200L).map(i => (i, i)).toDF("doc_id", "w")
    val got = Sampling.weightedSampleTopK(docs, "doc_id", col("w"), k = 50)
      .as[(Int, Long, Long, Double)].collect()
    assert(got.length === 50)
    assert(got.map(_._1).toSeq === (1 to 50))
    // recompute the key from the portable md5 contract in plain Scala
    def key(id: Long, w: Long): Double = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"es:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      val u = (java.lang.Long.parseLong(hex, 16) + 1).toDouble / 4294967296.0
      BigDecimal(math.log(u) / w).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }
    got.foreach { case (_, id, w, k) => assert(k === key(id, w), s"doc $id") }
    // ranks strictly follow (key desc, id asc)
    val pairs = got.sortBy(_._1).map(r => (r._4, r._2))
    assert(pairs.sliding(2).forall { case Array((k1, i1), (k2, i2)) =>
      k1 > k2 || (k1 == k2 && i1 < i2) })
    // sample is a pure function of content
    val re = Sampling.weightedSampleTopK(docs.repartition(13), "doc_id",
      col("w"), k = 50).as[(Int, Long, Long, Double)].collect()
    assert(re.toSeq === got.toSeq)
    // weight-proportional: the top-weight half must dominate the sample
    assert(got.count(_._3 > 100L) > 30)
    // non-positive weights are excluded, k larger than n is the whole set
    val tiny = Seq((1L, 5L), (2L, 0L), (3L, -4L)).toDF("doc_id", "w")
    val kept = Sampling.weightedSampleTopK(tiny, "doc_id", col("w"), k = 10)
      .as[(Int, Long, Long, Double)].collect()
    assert(kept.map(_._2).toSeq === Seq(1L))
  }

  test("weightedGroupSample: exact k per group, groups ranked independently") {
    val docs = (1L to 60L).map(i => (i, if (i % 3 == 0) "a" else "b", i))
      .toDF("doc_id", "grp", "w")
    val got = Sampling.weightedGroupSample(docs, "doc_id", "grp", col("w"), k = 7)
      .as[(String, Int, Long, Long, Double)].collect()
    val byGrp = got.groupBy(_._1)
    assert(byGrp("a").length === 7 && byGrp("b").length === 7)
    assert(byGrp.values.forall(_.map(_._2).sorted.toSeq === (1 to 7)))
    // within a group, ranks follow (key desc, id asc); the global
    // top-k operator must agree with the per-group ranking on a
    // single-group input (same key, same tiebreak)
    byGrp.values.foreach { rows =>
      val sorted = rows.sortBy(_._2).map(r => (r._5, r._3))
      assert(sorted.sliding(2).forall { case Array((k1, i1), (k2, i2)) =>
        k1 > k2 || (k1 == k2 && i1 < i2) })
    }
    val only = docs.where(col("grp") === "a")
    val global = Sampling.weightedSampleTopK(only, "doc_id", col("w"), k = 7)
      .as[(Int, Long, Long, Double)].collect().map(r => (r._1, r._2)).toSeq
    val grouped = byGrp("a").sortBy(_._2).map(r => (r._2, r._3)).toSeq
    assert(global === grouped)
  }

  test("WeightedReservoir: agrees with weightedSampleTopK; partitioning-independent") {
    val docs = (1L to 200L).map(i => (i, i)).toDF("doc_id", "w")
    val res = docs
      .agg(Sampling.weightedReservoir(col("doc_id"), col("w"), k = 25)
        .as("sample"))
      .as[Seq[String]].head().map(_.toLong)
    val topk = Sampling.weightedSampleTopK(docs, "doc_id", col("w"), k = 25)
      .as[(Int, Long, Long, Double)].collect().sortBy(_._1).map(_._2).toSeq
    assert(res === topk, "reduction form must match the window form exactly")
    val re = docs.repartition(17)
      .agg(Sampling.weightedReservoir(col("doc_id"), col("w"), k = 25)
        .as("sample"))
      .as[Seq[String]].head().map(_.toLong)
    assert(re === res)
    // per-group usage: k rows per group, disjoint value sets
    val grouped = (1L to 100L).map(i => (i, if (i % 2 == 0) "a" else "b", i))
      .toDF("doc_id", "grp", "w")
      .groupBy("grp")
      .agg(Sampling.weightedReservoir(col("doc_id"), col("w"), k = 10)
        .as("sample"))
      .as[(String, Seq[String])].collect().toMap
    assert(grouped("a").length === 10 && grouped("b").length === 10)
    assert(grouped("a").forall(_.toLong % 2 == 0))
    assert(grouped("b").forall(_.toLong % 2 == 1))
  }

  test("sourceJsDivergence: identical-mix sources score exactly 0; disjoint vocab scores near 2·ln 2") {
    // two sources with the SAME text → each equals the corpus mix → every
    // per-bucket term is ln(1) = 0 exactly (no floor slack)
    val same = Seq((1L, "s1", "alpha beta gamma delta"),
                   (2L, "s2", "alpha beta gamma delta"))
      .toDF("doc_id", "source", "text")
    val z = CorpusStats.sourceJsDivergence(same, "source", "text", buckets = 256)
      .as[(String, Long, Long)].collect()
    assert(z.length === 2 && z.forall(_._3 === 0L))
    // disjoint vocabularies, equal mass → 2·JS = 2·ln 2 ≈ 1.386e6 micro;
    // each source sees roughly half that against the 50/50 mix
    val disj = Seq((1L, "s1", "alpha beta gamma delta"),
                   (2L, "s2", "eps zeta eta theta"))
      .toDF("doc_id", "source", "text")
    val d = CorpusStats.sourceJsDivergence(disj, "source", "text", buckets = 256)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    // analytic: p·ln(4/3) + (p/2)·ln(2/3) + (q/2)·ln 2 masses → ≈ 431523
    assert(d.values.forall(v => v > 420000L && v < 440000L), d.toString)
    spark.catalog.clearCache()
  }

  test("heapsFit: cumulative masses exact; all-unique vocab is the pure power law β = 1") {
    // ids 0..9 land one per part; doc i carries i+1 GLOBALLY unique
    // tokens → V_p = N_p at every boundary → ln V = ln N exactly:
    // beta = 1, log_k = 0, r2 = 1 (no floor slack anywhere)
    val docs = (0 to 9).map { i =>
      (i.toLong, (0 to i).map(j => s"t${i}x$j").mkString(" "))
    }.toDF("doc_id", "text")
    val got = CorpusStats.heapsFit(docs, "doc_id", "text", parts = 10)
      .as[(Long, Long, Long, Double, Double, Double)].collect()
      .sortBy(_._1)
    assert(got.length === 10)
    // triangular cumulative: N_p = V_p = (p+1)(p+2)/2
    got.foreach { case (p, n, v, beta, logk, r2) =>
      assert(n === (p + 1) * (p + 2) / 2 && v === n, s"part $p")
      assert(beta === 1.0 && logk === 0.0 && r2 === 1.0)
    }
    spark.catalog.clearCache()
  }

  test("heapsFit: saturated vocabulary bends the curve (β < 1); degenerate corpus yields NULL fit") {
    // same 4 tokens repeated everywhere: vocab saturates at part 0
    val sat = (0 to 9).map(i => (i.toLong, "a b c d a b c d"))
      .toDF("doc_id", "text")
    val s = CorpusStats.heapsFit(sat, "doc_id", "text", parts = 10)
      .select("part", "vocab_cum", "beta", "r2")
      .as[(Long, Long, Double, Option[Double])].collect()
    // V is constant → y has zero variance → cov = 0 → beta = 0 exactly;
    // r2's varx·vary denominator is 0 → NULL by the degenerate contract
    assert(s.forall(r => r._2 === 4L && r._3 === 0.0 && r._4.isEmpty))
    // single doc → one point → varx = 0 → no defined fit, row survives
    val one = Seq((1L, "solo doc tokens here")).toDF("doc_id", "text")
    val row = CorpusStats.heapsFit(one, "doc_id", "text", parts = 10)
      .select("part", "n_tokens_cum", "vocab_cum").as[(Long, Long, Long)]
      .collect()
    assert(row.length === 10 && row.forall(_._3 === 4L),
      "every prefix at/after the only doc is populated")
    spark.catalog.clearCache()
  }

  test("textRank: the hub token outranks leaves; leaves share one exact integral score") {
    import spark.implicits._
    // star graph: b adjacent to a, c, d — strengths: b = 3, leaves = 1.
    // After ONE iteration: r(b) = 150000 + 3·(85·1e6)//100 = 2700000;
    // each leaf gets (85·1e6)//(100·3) = 283333 → 433333.
    val docs = Seq((1L, "a b"), (2L, "b c"), (3L, "b d"))
      .toDF("doc_id", "text")
    val one = CorpusStats.textRank(docs, "doc_id", "text", vocab = 10,
        iters = 1)
      .select("rank", "token", "score_micro").as[(Long, String, Long)]
      .collect().sortBy(_._1)
    spark.catalog.clearCache()
    assert(one.map(_._2).toSeq === Seq("b", "a", "c", "d"),
      "hub first, leaf ties broken by token")
    assert(one.head._3 === 2700000L)
    assert(one.tail.map(_._3).distinct.toSeq === Seq(433333L))
    // self-adjacency ("x x") contributes no edge: the pair stream
    // drops self-loops, so a repeated-token doc adds rank mass nowhere
    val rep = CorpusStats.textRank(
        docs.unionAll(Seq((4L, "b b")).toDF("doc_id", "text")),
        "doc_id", "text", vocab = 10, iters = 1)
      .select("token", "score_micro").as[(String, Long)].collect().toMap
    spark.catalog.clearCache()
    assert(rep("b") === 2700000L && rep("a") === 433333L)
  }

  test("tokenConcentration: planted Gini and top-share in exact micro units") {
    import spark.implicits._
    // en: sources with 1 and 3 tokens → x=[1,3]: Σx=4, Σi·x=7,
    // G = (14−12)/8 = 0.25; top share 3/4. de: single source → G = 0.
    val docs = Seq(
      (1L, "alpha", "en", "s1"),
      (2L, "alpha beta gamma", "en", "s2"),
      (3L, "uno dos", "de", "s9")
    ).toDF("doc_id", "text", "lang", "source")
    val got = CorpusStats.tokenConcentration(docs, "text")
      .select("lang", "n_sources", "total_tokens", "gini_micro", "top_share_micro")
      .as[(String, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got("en") === (("en", 2L, 4L, 250000L, 750000L)))
    assert(got("de") === (("de", 1L, 2L, 0L, 1000000L)))
  }

  test("tokenFertility: planted exact chars-per-token and tokens-per-doc micros") {
    import spark.implicits._
    val docs = Seq((1L, "abcd efg", "en"), (2L, "xy", "en"))
      .toDF("doc_id", "text", "lang")
    val r = CorpusStats.tokenFertility(docs, "text")
      .as[(String, Long, Long, Long, Long, Long)].collect().head
    // chars 10, tokens 3, docs 2 → 10/3 → 3333333 (half-up), 3/2 → 1500000
    assert(r === (("en", 2L, 10L, 3L, 3333333L, 1500000L)))
  }

  test("logLengthMoments: identical lengths give zero variance; mixed lengths replay the snap") {
    import spark.implicits._
    val same = Seq((1L, "a b c", "s"), (2L, "d e f", "s"))
      .toDF("doc_id", "text", "source")
    val r0 = CorpusStats.logLengthMoments(same, "text")
      .as[(String, Long, Long, Long)].collect().head
    val ln3 = math.floor(math.log(3.0) * 1e6).toLong
    assert(r0 === (("s", 2L, ln3, 0L)))
    // one 1-token doc (ln = 0) + one 2-token doc: replay the integer form
    val mixed = Seq((1L, "a", "s"), (2L, "a b", "s"))
      .toDF("doc_id", "text", "source")
    val r1 = CorpusStats.logLengthMoments(mixed, "text")
      .as[(String, Long, Long, Long)].collect().head
    val l = math.floor(math.log(2.0) * 1e6).toLong
    val mean = (2 * l + 2) / 4
    val ex2 = (2 * l * l + 2) / 4
    assert(r1 === (("s", 2L, mean, ex2 - mean * mean)))
  }

  test("bigramCondEntropy: deterministic source scores zero; planted mix replays the ln-micro form") {
    import spark.implicits._
    val docs = Seq((1L, "a a a", "det"), (2L, "x y x z", "mix"))
      .toDF("doc_id", "text", "source")
    val got = CorpusStats.bigramCondEntropy(docs, "text")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // "a a a": both bigrams are (a,a), c_a = c_ab = 2 → H = 0
    assert(got("det") === (("det", 2L, 1L, 0L)))
    // "x y x z": (x,y),(y,x),(x,z); x→{y,z} each ln2, y→x determined.
    // Σ = 2·floor(ln2·1e6) over 3 bigrams, half-up micro
    val ln2 = math.floor(math.log(2.0) * 1e6).toLong
    assert(got("mix") === (("mix", 3L, 3L, (2 * 2 * ln2 + 3) / 6)))
  }

  test("charClassProfile: hand-counted classes on raw text; micro ratios half-up") {
    import spark.implicits._
    val docs = Seq((1L, "ab 12 c!", "s"), (2L, "XY", "s")).toDF("doc_id", "text", "source")
    val r = CorpusStats.charClassProfile(docs, "text")
      .as[(String, Long, Long, Long, Long, Long, Option[Long], Option[Long], Option[Long], Option[Long])]
      .collect().head
    // 10 chars: letters a,b,c,X,Y=5; digits 1,2=2; spaces=2; other '!'=1
    assert(r === (("s", 10L, 5L, 2L, 2L, 1L,
      Some(500000L), Some(200000L), Some(200000L), Some(100000L))))
  }

  test("hillTailIndex: planted lengths replay the ln-micro sum; cutoff ties cost zero") {
    import spark.implicits._
    def doc(n: Int, id: Long) = (id, (1 to n).map(i => s"w$i").mkString(" "))
    // lengths 8,4,2,1,1, k=2 → top3 {8,4,2}, x_k1=2
    val docs = Seq(doc(8, 1), doc(4, 2), doc(2, 3), doc(1, 4), doc(1, 5))
      .toDF("doc_id", "text")
    val lnu = (x: Long) => math.floor(math.log(x.toDouble) * 1e6).toLong
    val s = (lnu(8) - lnu(2)) + (lnu(4) - lnu(2))
    val r = CorpusStats.hillTailIndex(docs, "text", k = 2)
      .as[(Long, Long, Long, Option[Long])].collect().head
    assert(r === ((2L, 2L, s, Some((2L * 2L * 1000000000000L + s) / (2L * s)))))
    // boundary tie: {5,3,3,3} → top3 {5,3,3}; tied rows contribute 0
    val tied = Seq(doc(5, 1), doc(3, 2), doc(3, 3), doc(3, 4)).toDF("doc_id", "text")
    val rt = CorpusStats.hillTailIndex(tied, "text", k = 2)
      .as[(Long, Long, Long, Option[Long])].collect().head
    assert(rt._1 === 2L && rt._2 === 3L && rt._3 === lnu(5) - lnu(3))
    // flat head → zero sum → NULL alpha, not a divide
    val flat = Seq(doc(4, 1), doc(4, 2), doc(4, 3)).toDF("doc_id", "text")
    assert(CorpusStats.hillTailIndex(flat, "text", k = 2)
      .as[(Long, Long, Long, Option[Long])].collect().head._4.isEmpty)
  }

  test("hapaxStats: planted counts; both micro denominators replay exactly") {
    import spark.implicits._
    val docs = Seq((1L, "a a b c", "s")).toDF("doc_id", "text", "source")
    val r = CorpusStats.hapaxStats(docs, "text")
      .as[(String, Long, Long, Long, Option[Long], Option[Long])].collect().head
    // vocab {a,b,c}; hapaxes {b,c}; 4 tokens
    // 2/3 → 666667 (half-up); 2/4 → exactly 500000.5 floored half-up = 500000
    assert(r === (("s", 3L, 2L, 4L, Some(666667L), Some(500000L))))
  }

  test("lexicalDiversity: planted distinct-n ratios; bigram-free source gets NULL distinct-2") {
    import spark.implicits._
    // A: "a b a b" → ttr 2/4, distinct-2 2/3; B: one token → no bigrams
    val docs = Seq((1L, "a b a b", "A"), (2L, "x", "B"))
      .toDF("doc_id", "text", "source")
    val got = CorpusStats.lexicalDiversity(docs, "text")
      .as[(String, Long, Long, Long, Long, Option[Long], Option[Long])]
      .collect().map(r => r._1 -> r).toMap
    spark.catalog.clearCache()
    assert(got("A") === (("A", 4L, 3L, 2L, 2L, Some(500000L), Some(666667L))))
    assert(got("B") === (("B", 1L, 0L, 1L, 0L, Some(1000000L), None)))
  }

  test("bpeMergeCandidates: pair mass is token-count-weighted; single-char tokens drop") {
    import spark.implicits._
    // "ab" ×2, "cd" ×1, "x" ×2 (no pairs) → (a,b)=2 then (c,d)=1
    val docs = Seq((1L, "ab x ab"), (2L, "cd x")).toDF("doc_id", "text")
    val got = CorpusStats.bpeMergeCandidates(docs, "doc_id", "text", topK = 10)
      .as[(Long, String, String, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((1L, "a", "b", 2L), (2L, "c", "d", 1L)))
  }

  test("hllDistinctTokens: small sets land in linear counting and recover the exact count") {
    import spark.implicits._
    // 3 distinct tokens: est_raw ≈ α·m²·2^50/Z ≤ 160 with 61 empty
    // registers ⇒ linear counting 64·ln(64/61) rounds to exactly 3
    val docs = Seq((1L, "alpha beta alpha", "en"), (2L, "gamma", "en"))
      .toDF("doc_id", "text", "lang")
    val r = CorpusStats.hllDistinctTokens(docs, "lang", "text")
      .as[(String, Long, Long, Long, Long, Long)].collect().head
    spark.catalog.clearCache()
    assert(r._1 === "en" && r._2 === 3L)
    assert(r._3 >= 61L, "≥61 of 64 registers stay empty")
    val lnMicro = math.floor(math.log(64.0 / r._3) * 1e6).toLong
    assert(r._6 === (2L * 64L * lnMicro + 1000000L) / 2000000L,
      "small-range estimate replays the linear-counting formula")
    assert(r._6 === 3L)
    // partitioning cannot move a register: max is commutative
    val again = CorpusStats.hllDistinctTokens(docs.repartition(7), "lang", "text")
      .as[(String, Long, Long, Long, Long, Long)].collect().head
    spark.catalog.clearCache()
    assert(again === r)
  }

  test("hllDistinctTokens: estimate tracks a large distinct set within HLL error") {
    import spark.implicits._
    // 2000 distinct tokens, one per doc row batch — est within ~3σ
    // of 1.04/√64 = 13% relative error
    val docs = (0 until 100).map(i =>
      (i.toLong, (0 until 20).map(j => s"tok${i}x$j").mkString(" "), "en"))
      .toDF("doc_id", "text", "lang")
    val r = CorpusStats.hllDistinctTokens(docs, "lang", "text")
      .as[(String, Long, Long, Long, Long, Long)].collect().head
    spark.catalog.clearCache()
    assert(r._2 === 2000L)
    assert(r._6 > 1200L && r._6 < 2800L,
      s"HLL estimate ${r._6} should sit within ~40% of 2000")
  }

  test("tokenCooccurrence: df convention, confidence direction, exact lift") {
    import spark.implicits._
    // docs: {a,b} ×3, {a} ×1, {b,c} ×1, N = 5
    // df: a=4, b=4, c=1; pair (a,b): n_ab=3
    val docs = Seq((1L, "a b"), (2L, "a b b"), (3L, "b a"), (4L, "a"), (5L, "b c"))
      .toDF("doc_id", "text")
    val got = CorpusStats.tokenCooccurrence(docs, "doc_id", "text",
      vocabSize = 2, minSupport = 1L)
      .as[(String, String, Long, Long, Long, Long, Long)].collect()
    spark.catalog.clearCache()
    assert(got.length === 1, "only the (a,b) pair survives the top-2 vocab")
    val r = got.head
    // conf(a→b) = 3/4 = 750000; lift = 3·5/(4·4) = 0.9375 → 937500
    assert(r === (("a", "b", 4L, 4L, 3L, 750000L, 937500L)))
  }

  test("hllDistinctTokens: SQL columns agree with the shared Scala estimator") {
    import spark.implicits._
    // 120 distinct tokens — large enough to leave linear counting on
    // some registers' terms, small enough to stay cheap
    val docs = (0 until 12).map(i =>
      (i.toLong, (0 until 10).map(j => s"w${i}y$j").mkString(" "), "en"))
      .toDF("doc_id", "text", "lang")
    val r = CorpusStats.hllDistinctTokens(docs, "lang", "text")
      .as[(String, Long, Long, Long, Long, Long)].collect().head
    spark.catalog.clearCache()
    def h48(s: String): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString, 16)
    val regs = new Array[Int](64)
    (0 until 12).foreach(i => (0 until 10).foreach(j =>
      CorpusStats.hllObserve(regs, h48(s"w${i}y$j"))))
    val (vZero, zInt, est) = CorpusStats.hllEstimate(regs)
    assert((r._3, r._4, r._6) === ((vZero, zInt, est)),
      "batch SQL, stream state and spec replay share one estimator")
  }

  test("oovRate: top-V cut is deterministic; per-doc ratios are exact micros") {
    import spark.implicits._
    // counts: a=2, c=2, b=1, d=1 → top-2 by (count DESC, token) = {a, c}
    val docs = Seq((1L, "a a b"), (2L, "c c d")).toDF("doc_id", "text")
    val got = CorpusStats.oovRate(docs, "doc_id", "text", vocabSize = 2)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    spark.catalog.clearCache()
    assert(got(1L) === ((1L, 3L, 1L, 333333L)), "b is OOV: 1/3 half-up")
    assert(got(2L) === ((2L, 3L, 1L, 333333L)), "d is OOV")
    // a full-vocab cut zeroes every doc
    val all = CorpusStats.oovRate(docs, "doc_id", "text", vocabSize = 4)
      .as[(Long, Long, Long, Long)].collect()
    spark.catalog.clearCache()
    assert(all.forall(r => r._3 == 0L && r._4 == 0L))
  }

  test("headTokenBias: exact head shares and lifts on planted header tokens") {
    import spark.implicits._
    // headLen=2; T=12 tokens, TH=6 head slots (baseline head share ½).
    // h: 3 occurrences, 2 in head → share 2/3, lift (2·12)/(3·6)=4/3
    // c: 2 occurrences, 0 in head → share 0, lift 0
    val docs = Seq((1L, "h a b c"), (2L, "h b c a"), (3L, "x y h a"))
      .toDF("doc_id", "text")
    val got = CorpusStats.headTokenBias(docs, "text", headLen = 2, topN = 10)
      .as[(String, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    spark.catalog.clearCache()
    assert(got("h") === (("h", 3L, 2L, 666667L, 1333333L)))
    assert(got("c") === (("c", 2L, 0L, 0L, 0L)))
    assert(got("a") === (("a", 3L, 1L, 333333L, 666667L)))
    assert(got.size === 6) // full tiny vocab fits under topN
  }

  test("knBigramLogProb: hand-computed KN probabilities on a 2-doc corpus") {
    // corpus bigrams: doc1 "a b a c" → (a,b),(b,a),(a,c); doc2 "a b".
    // big: (a,b)=2, (b,a)=1, (a,c)=1; ctx a: c=3, n1=2; ctx b: c=1,
    // n1=1; left-contexts: each of b, a, c has n1_b=1; types nt=3.
    //   P(b|a) = (1.25 + 0.75·2·1/3)/3 = 1.75/3
    //   P(a|b) = (0.25 + 0.75·1·1/3)/1 = 0.5
    //   P(c|a) = (0.25 + 0.75·2·1/3)/3 = 0.25
    val docs = Seq((1L, "a b a c"), (2L, "a b")).toDF("doc_id", "text")
    val got = CorpusStats.knBigramLogProb(docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    spark.catalog.clearCache()
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val pba = (math.max(2.0 - 0.75, 0.0) + 0.75 * 2 * 1 / 3.0) / 3.0
    val pab = (math.max(1.0 - 0.75, 0.0) + 0.75 * 1 * 1 / 3.0) / 1.0
    val pca = (math.max(1.0 - 0.75, 0.0) + 0.75 * 2 * 1 / 3.0) / 3.0
    assert(got === Seq(
      (1L, 3L, r6((math.log(pba) + math.log(pab) + math.log(pca)) / 3)),
      (2L, 1L, r6(math.log(pba)))))
    // the repeated high-count bigram must outscore the hapax pair —
    // the fluency ordering the score exists for
    assert(got(1)._3 > got(0)._3)
  }

  test("vocabRichness: hand-computed Good-Turing mass and bias-corrected Chao1") {
    // source s: tokens a a a b b c d → N=7, V=4, n1=2 (c,d), n2=1 (b).
    // unseen = 2/7 → 285714 micro; chao1 = 4 + 2·1/(2·2) = 4.5 → 5.
    // source z: all-distinct "p q r" → n1=3, n2=0, chao1 = 3 + 3·2/2 = 6.
    val docs = Seq(("s", "a a a b b c d"), ("z", "p q r"))
      .toDF("source", "text")
    val got = CorpusStats.vocabRichness(docs, "source", "text")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("s") === (("s", 7L, 4L, 2L, 1L, 285714L, 5L)))
    assert(got("z") === (("z", 3L, 3L, 3L, 0L, 1000000L, 6L)))
  }
}
