package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and runs far away today"
  private def docs = Seq(
    (1L, base),
    (2L, base + " indeed"), // near-dup of 1
    (3L, base.replace("quick", "slow")), // near-dup of 1
    (4L, "completely different content about spark engines and data processing pipelines here"),
    (5L, base) // exact dup of 1
  ).toDF("doc_id", "text")

  test("exact dedup groups identical normalized text, keeps lowest id") {
    val got = Dedup.exact(docs, "doc_id", "text")
      .select("keep_id", "n_copies").as[(Long, Long)].collect().toMap
    assert(got(1L) === 2L) // docs 1 and 5 collapse
    assert(got.values.sum === 5L)
  }

  test("shingles are distinct per doc and n-sized") {
    val sh = Dedup.shingles(docs.where($"doc_id" === 1), "doc_id", "text", 3)
      .select("shingle").as[String].collect()
    assert(sh.length === sh.distinct.length)
    assert(sh.forall(_.split(" ").length === 3))
    // 14 tokens → 12 trigrams (minus dups: "the" appears twice but
    // trigrams are all distinct here)
    assert(sh.length === 12)
  }

  test("ngram Jaccard finds planted near-dups and not unrelated docs") {
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, minJaccard = 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 5L))) // exact dup → jaccard 1.0
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("shingles and jaccard tolerate documents shorter than n tokens") {
    val short = Seq((1L, "just two"), (2L, ""), (3L, "!!!"),
      (4L, base), (5L, base)).toDF("doc_id", "text")
    assert(Dedup.shingles(short.where($"doc_id" <= 3), "doc_id", "text", 3).count() === 0)
    val pairs = Dedup.ngramJaccardPairs(short, "doc_id", "text", 3, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((4L, 5L))) // short docs neither crash nor pair
  }

  test("minhash LSH candidates cover all high-jaccard pairs (recall) on fixture docs") {
    val fixtures = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val exact = Dedup.ngramJaccardPairs(fixtures, "doc_id", "text", n = 3, minJaccard = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minHashLshPairs(fixtures, "doc_id", "text",
      shingleN = 3, numHashes = 64, bands = 16, minJaccard = 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "fixture should contain planted near-dups")
    val recall = exact.intersect(lsh).size.toDouble / exact.size
    assert(recall >= 0.9, s"LSH recall $recall over ${exact.size} true pairs")
  }

  test("simhash: near-dups land within small hamming distance, unrelated far") {
    val hashes = Dedup.simHash64(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hashes(1L) === hashes(5L)) // identical text, identical hash
    assert(hamming(hashes(1L), hashes(2L)) <= 12)
    assert(hamming(hashes(1L), hashes(4L)) > 12)
  }

  test("winnowing fingerprints match a slow reference; shared runs share a fingerprint") {
    // slow reference: O(m·w) window mins over md5-48 gram hashes
    def slow(text: String, k: Int, w: Int): Set[Long] = {
      val toks = text.toLowerCase.replaceAll("[^a-z0-9 ]", " ")
        .replaceAll(" +", " ").trim.split(" ").toSeq
      if (toks.length < k) return Set.empty
      val md = java.security.MessageDigest.getInstance("MD5")
      val h = (0 to toks.length - k).map { i =>
        val dig = md.digest(toks.slice(i, i + k).mkString(" ").getBytes("UTF-8"))
        md.reset()
        (0 until 6).foldLeft(0L)((acc, b) => (acc << 8) | (dig(b) & 0xFFL))
      }
      val nWin = math.max(1, h.length - w + 1)
      (0 until nWin).map(i => h.slice(i, math.min(i + w, h.length)).min).toSet
    }
    val got = Dedup.winnowFingerprints(docs, "doc_id", "text", k = 4, w = 8)
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    docs.as[(Long, String)].collect().foreach { case (id, text) =>
      assert(got.getOrElse(id, Set.empty) === slow(text, 4, 8), s"doc $id")
    }
    // winnowing guarantee: docs 1 and 2 share a long token run ⇒ ≥1
    // shared fingerprint; doc 4 is unrelated ⇒ disjoint
    assert(got(1L).intersect(got(2L)).nonEmpty)
    assert(got(1L).intersect(got(4L)).isEmpty)
    assert(got(1L) === got(5L)) // identical docs, identical fingerprints
  }

  test("decontamination flags corpus docs overlapping the reference, leaves clean and tiny docs") {
    val reference = Seq((100L, base)).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, base),                      // full leak: overlap 1.0
      (2L, base + " extra tail words here today"),   // partial leak
      (3L, "completely different content about spark engines and data processing"),
      (4L, "ab cd")                    // < 3 tokens: no grams
    ).toDF("doc_id", "text")
    val got = Dedup.decontaminationScores(corpus, reference, "doc_id", "text",
        n = 3, threshold = 0.5)
      .as[(Long, Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L)._4 === 1.0 && got(1L)._5)
    assert(got(2L)._4 > 0.0 && got(2L)._4 < 1.0)
    assert(got(3L)._3 === 0L && got(3L)._4 === 0.0 && !got(3L)._5)
    assert(got(4L)._2 === 0L && !got(4L)._5) // gramless doc present, unflagged
    assert(got.size === 4)
  }

  test("winnowing handles short docs (fewer grams than the window) and tiny docs") {
    val tiny = Seq((1L, "one two three"), (2L, "a b c d e f"), (3L, "x")).toDF("doc_id", "text")
    val got = Dedup.winnowFingerprints(tiny, "doc_id", "text", k = 4, w = 8)
      .as[(Long, Long)].collect().groupBy(_._1).view.mapValues(_.length).toMap
    assert(!got.contains(1L)) // 3 tokens < k — no grams
    assert(got(2L) === 1)     // 3 grams < w — single truncated window min
    assert(!got.contains(3L))
  }

  test("connectedComponents labels chains and stars to the min id, sizes correct") {
    import spark.implicits._
    // two components: a 4-chain {1-2-3-4} (diameter 3 — exercises
    // multi-round propagation) and an edge {10,11}; 7 is absent (no pairs)
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got === Map(
      1L -> (1L, 4L), 2L -> (1L, 4L), 3L -> (1L, 4L), 4L -> (1L, 4L),
      10L -> (10L, 2L), 11L -> (10L, 2L)))
  }

  test("connectedComponents on an empty pair list returns no rows") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Dedup.connectedComponents(empty).count() === 0L)
  }

  test("dedupClusters groups the planted near-dup family into one cluster") {
    val got = Dedup.dedupClusters(docs, "doc_id", "text",
        shingleN = 3, numHashes = 64, bands = 16, minJaccard = 0.8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // docs 1, 2, 5 are mutual near/exact dups -> one cluster rooted at 1
    assert(got(1L) === 1L && got(2L) === 1L && got(5L) === 1L)
    assert(!got.contains(4L)) // unrelated doc never pairs, so never appears
  }

  test("fingerprintOverlapPairs finds the shared passage, containment in (0,1]") {
    val got = Dedup.fingerprintOverlapPairs(docs, "doc_id", "text",
        k = 4, w = 4, minShared = 2, maxFpFreq = None)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got.contains((1L, 5L))) // exact dup: every fingerprint shared
    val (_, ca, cb) = got((1L, 5L))
    assert(ca === 1.0 && cb === 1.0)
    got.values.foreach { case (n, a, b) =>
      assert(n >= 2L && a > 0 && a <= 1.0 && b > 0 && b <= 1.0)
    }
    assert(!got.keys.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("fingerprintOverlapPairs hot-fingerprint cap drops ubiquitous fingerprints") {
    import spark.implicits._
    // every doc shares the same text -> every fingerprint has df = 4 > cap
    val same = (1L to 4L).map(i => (i, base)).toDF("doc_id", "text")
    val capped = Dedup.fingerprintOverlapPairs(same, "doc_id", "text",
      k = 4, w = 4, minShared = 1, maxFpFreq = Some(3))
    assert(capped.count() === 0L)
    val uncapped = Dedup.fingerprintOverlapPairs(same, "doc_id", "text",
      k = 4, w = 4, minShared = 1, maxFpFreq = None)
    assert(uncapped.count() === 6L) // all C(4,2) pairs
  }

  test("connectedComponentsStar: equivalent to label propagation on random graphs, chains, stars") {
    import spark.implicits._
    def check(pairs: Seq[(Long, Long)]): Unit = {
      val df = pairs.toDF("id_a", "id_b")
      // lp needs O(diameter) rounds -- give it enough for the 40-chain
      val lp = Dedup.connectedComponents(df, maxIter = 45)
        .as[(Long, Long, Long)].collect().toSet
      val st = Dedup.connectedComponentsStar(df)
        .as[(Long, Long, Long)].collect().toSet
      assert(st === lp, s"pairs=$pairs")
    }
    // worst-case diameter: one long chain
    check((0L until 40L).sliding(2).map(s => (s(0), s(1))).toSeq)
    // star with high root id (exercises small-star re-rooting)
    check((0L until 10L).map(i => (50L, i)))
    // random graphs across densities, deterministic seeds
    for (seed <- 1 to 6) {
      val rnd = new scala.util.Random(seed)
      val n = 40
      val m = 10 + rnd.nextInt(50)
      val pairs = (0 until m).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter { case (a, b) => a != b }
      if (pairs.nonEmpty) check(pairs)
    }
  }

  test("connectedComponents refuses to return unconverged labels (high-diameter graph)") {
    import spark.implicits._
    val chain = (0L until 40L).sliding(2).map(s => (s(0), s(1))).toSeq.toDF("id_a", "id_b")
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, maxIter = 5).collect()
    }
    assert(e.getMessage.contains("connectedComponentsStar"))
  }

  test("interDocGramStats: shared passage counts against both docs, unique text scores zero") {
    import spark.implicits._
    val passage = "alpha beta gamma delta epsilon" // one shared 5-gram
    val docs = Seq(
      (1L, s"$passage zeta unique1 u2 u3 u4"),
      (2L, s"prefix1 p2 p3 p4 $passage"),
      (3L, "lone wolf text with nothing shared here at all")
    ).toDF("doc_id", "text")
    val got = Dedup.interDocGramStats(docs, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // doc1: 6 distinct 5-grams, 1 shared; doc2: 5 grams, 1 shared
    assert(got(1L)._1 === 6L && got(1L)._2 === 1L)
    assert(got(2L)._1 === 5L && got(2L)._2 === 1L)
    assert(got(3L)._2 === 0L && got(3L)._3 === 0.0)
    spark.catalog.clearCache()
  }

  test("bloomDecontaminationScores: bloom hits dominate exact hits; planted leak flagged") {
    import spark.implicits._
    val leak = "the quick brown fox jumps over the lazy dog"
    val corpus = Seq(
      (1L, s"irrelevant words only here nothing to see move along now"),
      (2L, s"contaminated doc contains $leak verbatim inside")
    ).toDF("doc_id", "text")
    val ref = Seq((100L, leak)).toDF("doc_id", "text")
    val got = Dedup.bloomDecontaminationScores(corpus, ref, "doc_id", "text",
        n = 3, m = 4096, k = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    got.values.foreach { case (_, bloom, exact, fp) =>
      assert(bloom >= exact, "Bloom filters never produce false negatives")
      assert(fp === bloom - exact && fp >= 0L)
    }
    assert(got(2L)._3 >= 7L, "planted leak's 3-grams must exact-hit")
    assert(got(1L)._3 === 0L, "clean doc has no exact hits")
    spark.catalog.clearCache()
  }

  test("splitLeakageScores: holdout grams found in train count as leaked; holdout-only don't") {
    import spark.implicits._
    val passage = "alpha beta gamma delta"
    val docs = Seq(
      (1L, s"$passage train filler words here"),          // train
      (2L, "other training material entirely unrelated"), // train
      (10L, s"$passage holdout tail words"),              // holdout: shares passage
      (11L, "completely novel holdout text nothing shared") // holdout: clean
    ).toDF("doc_id", "text")
    val got = Dedup.splitLeakageScores(docs, "doc_id", "text",
        holdoutPred = $"doc_id" >= 10L, n = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got.keySet === Set(10L, 11L), "only holdout docs are audited")
    assert(got(10L)._2 === 2L, "the two shared passage 3-grams leak") // alpha-beta-gamma, beta-gamma-delta
    assert(got(11L)._2 === 0L && got(11L)._3 === 0.0)
    spark.catalog.clearCache()
  }

  test("dedupedCorpus keeps exactly one representative (the lowest id) per near-dup group") {
    import spark.implicits._
    val dupText = "spark catalyst tungsten shuffle partition broadcast join aggregate window watermark"
    val docs = (Seq(5L, 9L, 17L).map(i => (i, dupText)) ++
      Seq((1L, "totally different first document about nothing in particular with many words"),
          (2L, "another unrelated second document mentioning entirely other topics and themes")))
      .toDF("doc_id", "text")
    val kept = Dedup.dedupedCorpus(docs, "doc_id", "text",
        shingleN = 3, numHashes = 64, bands = 16, minJaccard = 0.8)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L, 5L), s"got $kept")
    spark.catalog.clearCache()
  }

  test("gramNovelty: an exact copy has zero novelty, the original full novelty") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),   // first occurrence of everything
      (2L, "alpha beta gamma delta epsilon zeta"),   // exact copy -> novelty 0
      (3L, "one two three four five six"),           // disjoint -> novelty 1
      (4L, "alpha beta gamma one two three four")    // half borrowed, half new
    ).toDF("doc_id", "text")
    val got = Dedup.gramNovelty(docs, "doc_id", "text", n = 3)
      .select("doc_id", "n_grams", "n_seen", "novelty")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, 4L, 0L, 1.0)))
    assert(got(2L) === ((2L, 4L, 4L, 0.0)))
    assert(got(3L) === ((3L, 4L, 0L, 1.0)))
    // doc 4: grams "alpha beta gamma" (seen in doc 1), "beta gamma one",
    // "gamma one two" (new), "one two three", "two three four" (seen in doc 3...
    // no: doc 3 has lower id, so seen), -> 3 of 5 first-seen earlier
    assert(got(4L)._2 === 5L)
    assert(got(4L)._3 === 3L)
    spark.catalog.clearCache()
  }

  test("chunkDupStats: each block occurrence counts (within AND across docs); partials dropped") {
    val block = (1 to 10).map(i => "w" + i).mkString(" ")
    val docs = Seq(
      (1L, block + " " + block),                        // 20 toks → 2 identical blocks
      (2L, block + " tail tokens here"),                // 13 toks → 1 block (= doc 1's), partial dropped
      (3L, (11 to 25).map(i => "u" + i).mkString(" "))  // 15 toks → 1 unique block
    ).toDF("doc_id", "text")
    val got = Dedup.chunkDupStats(docs, "doc_id", "text", k = 10)
      .select("doc_id", "n_chunks", "n_dup", "dup_frac")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // the shared block occurs 3× corpus-wide → every occurrence is dup
    assert(got(1L) === ((2L, 2L, 1.0)))
    assert(got(2L) === ((1L, 1L, 1.0)))
    assert(got(3L) === ((1L, 0L, 0.0)))
    // docs shorter than one full block produce no row (nothing to measure)
    assert(Dedup.chunkDupStats(
      Seq((9L, "too short")).toDF("doc_id", "text"), "doc_id", "text", 10).count() === 0)
    spark.catalog.clearCache()
  }

  test("exactSubstrStats: interval union over covered gram starts recovers planted spans exactly") {
    val shared = (1 to 12).map(i => s"s$i").mkString(" ") // 12-token duplicated span
    val docs = Seq(
      (1L, "a1 a2 a3 " + shared + " a4 a5"),             // span at positions 3..14
      (2L, "b1 b2 " + shared + " b3"),                   // same span, different context
      (3L, "r1 r2 r3 r4 r5 r1 r2 r3 r4 r5 x"),          // WITHIN-doc repeat, k-sized
      (4L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11 u12")    // nothing repeated
    ).toDF("doc_id", "text")
    val got = Dedup.exactSubstrStats(docs, "doc_id", "text", k = 5)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    // the 12-token span covers 12−5+1 = 8 consecutive starts → ONE
    // island of (7−0)+5 = 12 tokens; boundary-crossing grams are
    // unique (different context) so nothing else is covered
    assert(got(1L) === ((1L, 17L, 8L, 12L, 12L, 0.705882)))
    assert(got(2L) === ((2L, 15L, 8L, 12L, 12L, 0.8)))
    // within-doc: the 5-gram r1..r5 occurs at starts 0 and 5 (gap 5 >
    // k−1 → two touching-but-separate islands of 5 tokens each)
    assert(got(3L) === ((3L, 11L, 2L, 10L, 5L, 0.909091)))
    assert(got(4L) === ((4L, 12L, 0L, 0L, 0L, 0.0)))
    spark.catalog.clearCache()
  }

  test("incrementalNearDup: exact dup, near dup and novel docs flagged against the OLD corpus only") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val old = Seq(
      (1L, base),
      (2L, "completely unrelated reference text about streaming engines")
    ).toDF("doc_id", "text")
    val fresh = Seq(
      (10L, base),                                  // exact dup of old 1
      (11L, base + " extra"),                       // near dup of old 1
      (12L, "entirely novel content nothing shares any shingle with this"),
      (13L, base + " extra")                        // batch-internal dup of 11 — NOT flagged (gate checks OLD only)
    ).toDF("doc_id", "text")
    val got = Dedup.incrementalNearDup(fresh, old, "doc_id", "text",
        shingleN = 3, numHashes = 64, bands = 16, minJaccard = 0.5)
      .as[(Long, Boolean, Long, Option[Double], Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(10L)._2 === true  && got(10L)._5 === false)
    assert(got(11L)._2 === false && got(11L)._3 >= 1L && got(11L)._5 === false)
    assert(got(11L)._4.exists(j => j >= 0.5 && j <= 1.0))
    assert(got(12L)._2 === false && got(12L)._3 === 0L &&
      got(12L)._4.isEmpty && got(12L)._5 === true)
    // 13 duplicates 11 (same BATCH) but nothing in the old corpus
    // exactly — still a near-dup of old 1 through the shared base text
    assert(got(13L)._2 === false && got(13L)._3 >= 1L)
    assert(got.size === 4) // every new doc gets a verdict row
  }

  test("boilerplateGrams: within-source relative threshold flags the template bigram") {
    import org.apache.spark.sql.functions.col
    // source A: 4 docs, 'legal footer' in 3 of them (df 3 ≥ 4·1/2? no —
    // use frac 1/2: 3·2 ≥ 4 ✓); source B: same bigram in only 1 of 4
    // docs (1·2 ≥ 4 ✗) — the flag must be PER-SOURCE
    val docs = Seq(
      (1L, "A", "legal footer alpha beta"),
      (2L, "A", "legal footer gamma delta"),
      (3L, "A", "legal footer epsilon zeta"),
      (4L, "A", "eta theta iota kappa"),
      (5L, "B", "legal footer lambda mu"),
      (6L, "B", "nu xi omicron pi"),
      (7L, "B", "rho sigma tau upsilon"),
      (8L, "B", "phi chi psi omega")).toDF("doc_id", "source", "text")
    val got = Dedup.boilerplateGrams(docs, "doc_id", "source", "text",
        n = 2, minFracNum = 1, minFracDen = 2, minDf = 2)
      .as[(Long, String, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    // every doc has 3 distinct bigrams; only A's 'legal footer' is boiler
    assert(got.values.forall(_._3 === 3L))
    Seq(1L, 2L, 3L).foreach { id =>
      assert(got(id)._4 === 1L, s"doc $id")
      // 1/3 in half-up micro units: (2·1e6·1 + 3) div 6 = 333333
      assert(got(id)._5 === 0.333333, s"doc $id")
    }
    Seq(4L, 5L, 6L, 7L, 8L).foreach { id =>
      assert(got(id)._4 === 0L && got(id)._5 === 0.0, s"doc $id")
    }
    // partition-invariant: df counting must not depend on layout
    val re = Dedup.boilerplateGrams(docs.repartition(5), "doc_id", "source",
        "text", n = 2, minFracNum = 1, minFracDen = 2, minDf = 2)
      .as[(Long, String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(re === got)
    spark.catalog.clearCache()
  }

  test("leakageSafeSplit: near-dup cluster members share a split; singletons use their own id") {
    import graft.operators.Sampling
    val base = "the quick brown fox jumps over the lazy dog again and again " * 3
    val docs = Seq(
      (1L, base + "one"), (2L, base + "two"),          // near-dup pair
      (3L, "completely different text about nothing at all with many words here"),
      (4L, base + "one more tail token variant"))      // near-dup of 1/2
      .toDF("doc_id", "text")
    val got = Sampling.leakageSafeSplit(docs, "doc_id", "text",
        shingleN = 3, numHashes = 64, bands = 16, minJaccard = 0.5,
        holdoutKeep = 50)
      .as[(Long, Long, Int, String)].collect().map(r => r._1 -> r).toMap
    assert(got.size === 4, "every doc gets exactly one verdict row")
    // clustered docs share representative AND split
    val cluster = Seq(1L, 2L, 4L).map(got(_))
    assert(cluster.map(_._2).distinct.size === 1, "one cluster representative")
    assert(cluster.map(_._4).distinct.size === 1, "cluster members split together")
    // the singleton's bucket replays the per-doc portable bucket on its own id
    assert(got(3L)._2 === 3L)
    val expect = docs.where($"doc_id" === 3L)
      .select(Sampling.md5Bucket("doc_id", 100)).as[Int].head()
    assert(got(3L)._3 === expect)
    spark.catalog.clearCache()
  }

  test("evalSpanContamination: train-side membership drives coverage; eval-internal repeats don't") {
    val shared = (1 to 12).map(i => s"s$i").mkString(" ") // 12-token leaked span
    val train = Seq(
      (1L, "a1 a2 " + shared + " a3"),
      (2L, "completely unrelated training prose about engines and pipelines running")
    ).toDF("doc_id", "text")
    val eval = Seq(
      (10L, "e1 e2 e3 " + shared + " e4 e5"),             // span leaked from train
      (11L, "clean holdout text that shares nothing with training at all honestly"),
      (12L, "short one two"),                             // < k tokens: still reported, zero
      (13L, "r1 r2 r3 r4 r5 x r1 r2 r3 r4 r5")            // EVAL-internal repeat only
    ).toDF("doc_id", "text")
    val got = Dedup.evalSpanContamination(train, eval, "doc_id", "text", k = 5)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.size === 4, "every eval doc gets a row")
    // 12-token span covers 12−5+1 = 8 consecutive starts → one island
    // of 12 tokens over 17; frac = (12·2e6 + 17) div 34 / 1e6
    assert(got(10L) === ((10L, 17L, 8L, 12L, 12L, 0.705882)))
    assert(got(11L) === ((11L, 11L, 0L, 0L, 0L, 0.0)))
    assert(got(12L) === ((12L, 3L, 0L, 0L, 0L, 0.0)))
    // the repeat lives only inside the EVAL doc — membership is against
    // the TRAIN gram set, so nothing is covered (the asymmetry contract)
    assert(got(13L) === ((13L, 11L, 0L, 0L, 0L, 0.0)))
    spark.catalog.clearCache()
  }

  test("evalSpanContamination longest_contam_span is exact across abutting train sources") {
    val A = (1 to 8).map(i => s"a$i")
    val B = (1 to 8).map(i => s"b$i")
    val train = Seq(
      (1L, (A ++ B.take(4)).mkString(" ")),       // A·b1..b4 — 12 tokens
      (2L, "c1 c2 " + B.mkString(" ") + " c3")    // B embedded elsewhere
    ).toDF("doc_id", "text")
    val ev = Seq((10L, (A ++ B).mkString(" "))).toDF("doc_id", "text")
    val got = Dedup.evalSpanContamination(train, ev, "doc_id", "text", k = 5)
      .select("doc_id", "contam_tokens", "longest_contam_span")
      .as[(Long, Long, Long)].collect().head
    spark.catalog.clearCache()
    // every eval gram occurs in SOME train doc (interval union = all
    // 16 tokens), but the longest single substring present in train is
    // A·b1..b4 (12) — the abutting doc1/doc2 contributions must not
    // merge into a 16-token "leak"
    assert(got === ((10L, 16L, 12L)))
  }

  test("dupClusterStats: histogram rows per size, singleton row balances to the corpus") {
    val fam = "the quick brown fox jumps over the lazy dog again and again " * 3
    val pair = "entirely different duplicated passage about corpus statistics " * 3
    val docs = Seq(
      (1L, fam + "one"), (2L, fam + "two"), (4L, fam + "one more tail"), // size-3 family
      (5L, pair), (6L, pair),                                            // exact-dup pair
      (3L, "completely different text about nothing at all with many words here"),
      (7L, "another unique document with its own vocabulary and no twin anywhere"))
      .toDF("doc_id", "text")
    val got = Dedup.dupClusterStats(docs, "doc_id", "text",
        shingleN = 3, numHashes = 64, bands = 16, minJaccard = 0.5)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(3L) === ((3L, 1L, 3L, 2L)))
    assert(got(2L) === ((2L, 1L, 2L, 1L)))
    assert(got(1L) === ((1L, 2L, 2L, 0L)), "singletons: corpus minus clustered, zero redundancy")
    assert(got.values.map(_._3).sum === 7L, "doc mass balances to the corpus")
    spark.catalog.clearCache()
  }

  test("qualityRepresentatives: the HIGHEST-quality member survives, not the lowest id") {
    import spark.implicits._
    // cluster {1, 2, 3, 5}: doc 2 is longer (higher length score) than
    // the others — the quality argmax must pick 2 over min-id 1
    val got = Dedup.qualityRepresentatives(docs, "doc_id", "text",
        shingleN = 3, numHashes = 64, bands = 16, minJaccard = 0.8)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    spark.catalog.clearCache()
    val c = got(1L) // cluster rooted at min reachable id 1
    assert(c._2 === 4L && c._6 === 3L, "4 members, 3 dropped")
    assert(c._3 === 2L, s"rep must be the longer doc 2, got ${c._3}")
    assert(c._4 > c._5, "rep quality strictly above the cluster minimum here")
  }

  test("lshJaccardRecall: planted family is fully recalled; micro ratios replay the counts") {
    import spark.implicits._
    val row = Dedup.lshJaccardRecall(docs, "doc_id", "text",
        shingleN = 3, numHashes = 64, bands = 16, minJaccard = 0.8,
        maxShingleFreq = Some(1000))
      .as[(Long, Long, Long, Option[Long], Option[Long])].collect().head
    spark.catalog.clearCache()
    val (nTrue, nCand, nHit, recall, precision) = row
    assert(nTrue > 0 && nHit <= math.min(nTrue, nCand))
    // the LSH config covers every ≥0.8-Jaccard pair on this fixture
    assert(nHit === nTrue && recall === Some(1000000L))
    assert(precision === Some((2000000L * nHit + nCand) / (2L * nCand)))
  }

  test("simhashHammingPairs: exact dup at hamming 0; unrelated doc never pairs; cap empties") {
    val got = Dedup.simhashHammingPairs(docs, "doc_id", "text")
      .as[(Long, Long, Int)].collect()
    spark.catalog.clearCache()
    val pairs = got.map(r => (r._1, r._2) -> r._3).toMap
    assert(pairs((1L, 5L)) === 0, "identical text → identical fingerprint")
    assert(got.forall(r => r._1 < r._2), "pairs are ordered")
    assert(got.length === got.map(r => (r._1, r._2)).distinct.length,
      "multi-band collisions must dedupe")
    assert(!got.exists(r => r._1 == 4L || r._2 == 4L),
      "unrelated content stays outside the hamming radius")
    // a zero cap marks every occupied band hot → no candidates at all
    val capped = Dedup.simhashHammingPairs(docs, "doc_id", "text",
      maxBandFreq = Some(0)).count()
    spark.catalog.clearCache()
    assert(capped === 0L)
  }

  test("headTailDupGroups: planted head/tail families; short docs excluded") {
    val withShort = docs.unionAll(Seq((6L, "too short here")).toDF("doc_id", "text"))
    val got = Dedup.headTailDupGroups(withShort, "doc_id", "text", k = 4)
      .as[(Long, Long, Long, Boolean, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    spark.catalog.clearCache()
    // heads: 1/2/5 share "the quick brown fox"; 3 diverges ("the slow…")
    // tails: 1/3/5 share "runs far away today"; 2 appends "indeed"
    assert(got(1L) === ((1L, 3L, 3L, true, true)))
    assert(got(2L) === ((2L, 3L, 1L, true, false)), "same template, different tail")
    assert(got(3L) === ((3L, 1L, 3L, false, true)))
    assert(got(4L) === ((4L, 1L, 1L, false, false)))
    assert(!got.contains(6L), "docs under k tokens have no anchor")
  }

  test("dupGraphDegrees: a planted triangle yields uniform degree 2; loners land at 0") {
    import spark.implicits._
    val dup = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq((1L, dup), (2L, dup), (3L, dup),
      (4L, "completely unrelated text about distributed query planning"))
      .toDF("doc_id", "text")
    val got = Dedup.dupGraphDegrees(docs, "doc_id", "text",
      shingleN = 3, numHashes = 64, bands = 16, minJaccard = 0.8)
      .as[(Long, Long)].collect().toMap
    spark.catalog.clearCache()
    // 3 identical docs → C(3,2)=3 pairs, every endpoint twice wired
    assert(got === Map(2L -> 3L, 0L -> 1L))
  }

  test("templateEditPairs: template near-copies pass, token-shuffled paraphrases are rejected") {
    val t = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    // doc 2: RAW-text edits that normalize away ("Alpha", trailing "!")
    // — identical token stream ⇒ identical simhash (guaranteed
    // candidate at hamming 0) but a real character-level distance
    val t2 = "Alpha " + t.stripPrefix("alpha ") + "!"
    val docs = Seq(
      (1L, t),
      (2L, t2),
      // same token MULTISET, different order: simhash also agrees (it
      // hashes the unordered multiset) but char-level structure
      // diverges → the edit verify must reject it
      (3L, t.split(" ").reverse.mkString(" ")),
      (4L, "completely different content that shares nothing with the template at all ever"))
      .toDF("doc_id", "text")
    val got = Dedup.templateEditPairs(docs, "doc_id", "text",
      maxDist = 3, prefixChars = 400, maxNedMicro = 300000L)
      .select("id_a", "id_b", "lev_edits", "ned_micro")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    spark.catalog.clearCache()
    assert(got.contains((1L, 2L)), "small-edit template pair must survive")
    // 'a'→'A' substitution + '!' insertion = 2 edits
    val den = math.max(t.length, t2.length).toLong
    assert(got((1L, 2L))._3 === 2L)
    assert(got((1L, 2L))._4 === (2L * 2L * 1000000L + den) / (2L * den))
    assert(!got.contains((1L, 3L)),
      "token-shuffled doc shares the simhash but must fail the edit verify")
    assert(!got.keys.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("templateEditPairs: multibyte raw text matches DuckDB's byte-level levenshtein") {
    // Cross-engine contract pin (round-9 ADVICE): DuckDB's builtin
    // levenshtein counts UTF-8 BYTE edits — measured in DuckDB 1.x:
    //   ('café münchen','cafe munchen') = 4   (é→e, ü→u: sub+del each)
    //   ('text é end','text 𝛼 end')     = 4   (2-byte é vs 4-byte 𝛼)
    //   ('東京 data','京都 data')        = 6   (3-byte CJK chars)
    //   ('a𝄞b','ab')                    = 4   (4-byte astral deletion)
    //   ('héllo','hello')               = 2
    // Spark's builtin counts code points (1, 1, 2, 1, 1) — the engine
    // therefore uses LevenshteinBytes, which must reproduce DuckDB's
    // byte values exactly:
    import graft.expressions.LevenshteinBytes.distOf
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    assert(distOf(u("café münchen"), u("cafe munchen")) === 4)
    assert(distOf(u("text é end"), u("text 𝛼 end")) === 4)
    assert(distOf(u("東京 data"), u("京都 data")) === 6)
    assert(distOf(u("a𝄞b"), u("ab")) === 4)
    assert(distOf(u("héllo"), u("hello")) === 2)
    assert(distOf(u(""), u("abc")) === 3)
    assert(distOf(u("same"), u("same")) === 0)

    // End-to-end: multibyte edits INSIDE the 400-char prefix. ¡ and é
    // normalize to spaces (identical token stream ⇒ guaranteed simhash
    // candidate at hamming 0) but differ at the byte level: ¡ = C2 A1,
    // é = C3 A9 → two byte substitutions.
    val t = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima"
    val docs = Seq((1L, t + " ¡!"), (2L, t + " é!")).toDF("doc_id", "text")
    val got = Dedup.templateEditPairs(docs, "doc_id", "text",
      maxDist = 3, prefixChars = 400, maxNedMicro = 300000L)
      .select("id_a", "id_b", "lev_edits", "ned_micro")
      .as[(Long, Long, Long, Long)].collect()
    spark.catalog.clearCache()
    assert(got.length === 1)
    val (_, _, lev, ned) = got.head
    assert(lev === 2L, "byte-level distance: two substituted continuation bytes")
    // denominator is BYTE length: |t| + ' ' + 2-byte char + '!'
    val den = (t.getBytes("UTF-8").length + 4).toLong
    assert(ned === (2L * 2L * 1000000L + den) / (2L * den))
  }

  test("ngramContainmentPairs: a quoted subset scores high containment where jaccard stays low") {
    val short = "one two three four five six seven eight"
    val long = short + " " + "nine ten eleven twelve thirteen fourteen fifteen sixteen " +
      "seventeen eighteen nineteen twenty twentyone twentytwo twentythree twentyfour " +
      "twentyfive twentysix twentyseven twentyeight twentynine thirty"
    val docs = Seq((1L, short), (2L, long),
      (3L, "unrelated filler text about engines and pipelines and planning today"))
      .toDF("doc_id", "text")
    val pairs = Dedup.ngramContainmentPairs(docs, "doc_id", "text",
      n = 3, minContainment = 0.6)
      .as[(Long, Long, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    spark.catalog.clearCache()
    // all 6 of doc 1's trigrams appear in doc 2 → containment_a = 1.0
    val p = pairs((1L, 2L))
    assert(p._3 === 6L)
    assert(p._4 === 1.0, "short doc fully contained")
    assert(p._5 < 0.3, "long side containment (≈ jaccard scale) stays low")
    // symmetric-jaccard would NOT have surfaced this pair at 0.6
    val jac = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    spark.catalog.clearCache()
    assert(!jac.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("crossSourceDupMatrix: within-source and cross-source dup mass land in the right cells") {
    val dup = "the quick brown fox jumps over the lazy dog again and again today"
    val other = "a completely different boilerplate block repeated across the mirror feeds here"
    val docs = Seq(
      (1L, dup, "web"), (2L, dup, "web"),          // within-web pair
      (3L, dup, "books"),                          // web↔books pairs (with 1 and 2)
      (4L, other, "web"), (5L, other, "mirror"),   // web↔mirror pair
      (6L, "nothing shared with anything else in this corpus at all", "web"))
      .toDF("doc_id", "text", "source")
    val got = Dedup.crossSourceDupMatrix(docs, "doc_id", "text", "source",
      shingleN = 3, numHashes = 64, bands = 16, minJaccard = 0.8)
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    spark.catalog.clearCache()
    // 4 pairs total: (1,2) web-web, (1,3)+(2,3) books-web, (4,5) mirror-web
    assert(got === Map(
      ("web", "web") -> ((1L, 250000L)),
      ("books", "web") -> ((2L, 500000L)),
      ("mirror", "web") -> ((1L, 250000L))))
  }

  test("components loop: convergence probes are folded into the materializing pass (no probe actions)") {
    import org.apache.spark.sql.GraftSqlBridge
    val names = java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit = names.add(funcName)
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = names.add(funcName)
    }
    cs.listenerManager.register(listener)
    try {
      // a 12-node path needs several star rounds — every round's only
      // action must be the checkpoint-materializing foreachPartition
      // (a separate head/collect would be a reintroduced probe job)
      val pairs = (1L to 11L).map(i => (i, i + 1)).toDF("id_a", "id_b")
      Dedup.connectedComponentsStar(pairs)
      GraftSqlBridge.awaitListenerBus(spark)
      val fired = names.toArray(Array.empty[String]).toSeq
      assert(fired.nonEmpty, "the loop must run at least one round")
      // "localCheckpoint" is the (job-less) lazy-checkpoint registration
      // event; the only job-running action allowed is the per-round
      // materializing foreachPartition — a head/collect here would be a
      // reintroduced scalar probe job
      assert(fired.forall(n => n == "foreachPartition" || n == "localCheckpoint"),
        s"non-fold probe actions fired during the components loop: $fired")
    } finally cs.listenerManager.unregister(listener)
  }

  test("exactSubstrStats longest_dup_span: exact on abutting dups and overlapping self-repeats") {
    val A = (1 to 14).map(i => s"a$i")
    val B = (1 to 24).map(i => s"b$i")
    // doc1 = A·B; doc2 shares doc1's 23-token prefix A·b1..b9; doc3
    // shares B (24 tokens). doc1's covered starts are one contiguous
    // run spanning the WHOLE doc, but A·B itself never occurs twice.
    val d1 = (A ++ B).mkString(" ")
    val d2 = (A ++ B.take(9) ++ (1 to 5).map(i => s"x$i")).mkString(" ")
    val d3 = ((1 to 5).map(i => s"y$i") ++ B).mkString(" ")
    val d4 = Seq.fill(20)("w").mkString(" ") // overlapping self-repeat
    val corpus = Seq((1L, d1), (2L, d2), (3L, d3), (4L, d4)).toDF("doc_id", "text")
    val got = Dedup.exactSubstrStats(corpus, "doc_id", "text", k = 10)
      .select("doc_id", "dup_tokens", "longest_dup_span")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    spark.catalog.clearCache()
    // interval-union dup_tokens stays 38 (all of doc1 lies in SOME
    // dup), but the longest single duplicated substring is B (24):
    // the abutting A·prefix(B) and B dups must not merge into 38
    assert(got(1L) === ((38L, 24L)))
    assert(got(2L)._2 === 23L) // shared prefix A·b1..b9 with doc1
    assert(got(3L)._2 === 24L) // B, shared with doc1
    // w×20 with k=10: w×19 occurs at offsets 0 and 1 (overlap counts)
    assert(got(4L) === ((20L, 19L)))
  }

  test("exactSubstrStats phase-2: fully-duplicated doc longer than the exhaustive cap") {
    // 150 distinct tokens duplicated verbatim → one covered run of 141
    // grams per doc, duplicated at every length: the exhaustive sweep
    // saturates at cap=128 and the binary-search tail must take
    // [128, 141] to the exact 141 (span 150)
    val toks = (1 to 150).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, toks), (2L, toks)).toDF("doc_id", "text")
    val got = Dedup.exactSubstrStats(docs, "doc_id", "text", k = 10)
      .select("doc_id", "longest_dup_span").as[(Long, Long)].collect().toMap
    spark.catalog.clearCache()
    assert(got === Map(1L -> 150L, 2L -> 150L))
  }

  test("stripDupSpans removes exactly the covered spans, keeps the rest in order") {
    val shared = (1 to 12).map(i => s"s$i").mkString(" ")
    val docs = Seq(
      (1L, "u1 u2 " + shared + " u3"),
      (2L, shared + " v1 v2 v3"),
      (3L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11") // ≥ k tokens, no dups
    ).toDF("doc_id", "text")
    val got = Dedup.stripDupSpans(docs, "doc_id", "text", k = 10)
      .select("doc_id", "n_tokens", "kept_tokens", "removed_tokens", "clean_text")
      .as[(Long, Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    spark.catalog.clearCache()
    // ALL copies of the 12-token span go (aggressive template strip);
    // unique prefix/suffix tokens survive in document order
    assert(got(1L) === ((1L, 15L, 3L, 12L, "u1 u2 u3")))
    assert(got(2L) === ((2L, 15L, 3L, 12L, "v1 v2 v3")))
    assert(got(3L) === ((3L, 11L, 11L, 0L,
      "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11")))
  }

  test("persisted LSH index reproduces minHashLshPairs exactly; probe prunes buckets") {
    val fixtures = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    Dedup.buildLshIndex(fixtures, "doc_id", "text", "lsh_idx_spec",
      shingleN = 3, numHashes = 64, bands = 16)
    try {
      val direct = Dedup.minHashLshPairs(fixtures, "doc_id", "text",
        shingleN = 3, numHashes = 64, bands = 16, minJaccard = 0.8)
        .as[(Long, Long, Double)].collect().toSet
      spark.catalog.clearCache()
      val indexed = Dedup.lshPairsIndexed(spark, "lsh_idx_spec", "doc_id",
        numHashes = 64, minJaccard = 0.8)
        .as[(Long, Long, Double)].collect().toSet
      assert(direct.nonEmpty, "fixture should contain planted near-dups")
      assert(indexed === direct)

      // point probe: pick one known near-dup pair, probe with one side
      val (pa, pb, est) = direct.head
      val probe = fixtures.where($"doc_id" === pa)
      val hits = Dedup.lshProbeIndexed(spark, "lsh_idx_spec", probe,
        "doc_id", "text", shingleN = 3, numHashes = 64, bands = 16,
        minJaccard = 0.8)
      val plan = hits.queryExecution.executedPlan.toString()
      assert(plan.contains("SelectedBucketsCount"),
        s"probe scan must bucket-prune the index:\n$plan")
      val got = hits.as[(Long, Long, Double)].collect().toSet
      assert(got.contains((pa, pb, est)),
        s"probe of $pa should find its near-dup $pb; got $got")
      assert(got.forall(_._1 == pa))
      // probe batches beyond the bound are rejected, not silently collected
      intercept[IllegalArgumentException] {
        Dedup.lshProbeIndexed(spark, "lsh_idx_spec", fixtures, "doc_id",
          "text", 3, 64, 16, 0.8, probeLimit = 3)
      }
    } finally spark.sql("DROP TABLE IF EXISTS lsh_idx_spec")
  }

  test("dupMassCurve: redundant mass excludes the kept min-id member; cumulative shares exact") {
    // cluster {1,2,5}: tokens 14 + 15 + 14; kept = doc 1 (min id) →
    // dup_tokens = 29. No other cluster (doc 3 is a near-dup of 1 at
    // low jaccard only; doc 4 unrelated) at 0.8 on these fixtures —
    // re-derive the expected cluster set from dedupClusters itself so
    // the test pins the CURVE math, not the clustering
    val clusters = Dedup.dedupClusters(docs, "doc_id", "text", 3, 64, 16, 0.8)
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toMap
    spark.catalog.clearCache()
    val tokens = docs.as[(Long, String)].collect()
      .map { case (id, t) => id -> t.split(" ").length.toLong }.toMap
    val expected = clusters.groupBy(_._2).map { case (cid, members) =>
      val ids = members.keys.toSeq
      cid -> (ids.size.toLong, ids.map(tokens).sum - tokens(ids.min))
    }.filter(_._2._2 > 0)
    val got = Dedup.dupMassCurve(docs, "doc_id", "text", 3, 64, 16, 0.8)
      .as[(Int, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    spark.catalog.clearCache()
    assert(got.map(_._2).toSet === expected.keySet)
    got.foreach { case (_, cid, nDocs, dup, _, _) =>
      assert((nDocs, dup) === expected(cid))
    }
    // last row's cumulative share covers everything → exactly 10⁶
    assert(got.last._6 === 1000000L)
    // cumulative column is the running sum in rank order
    assert(got.map(_._4).scanLeft(0L)(_ + _).drop(1).toSeq === got.map(_._5).toSeq)
  }

  test("dupEvidenceSpans: one-token edit splits the match into runs; longest certified span wins") {
    // 200 shared tokens, doc 2 edited at index 100: trigram positions
    // 98-100 break, leaving runs [0..97] (span 100) and [101..197]
    // (span 99) — the evidence is the longer run at (0, 0). (A 60-token
    // variant sat exactly ON the est=0.75 band boundary and was
    // filtered — the edit owns 3/58 shingles; at 198 shingles the
    // estimate stays safely above 0.8.)
    val toks = (0 until 200).map(i => s"w$i")
    val a = toks.mkString(" ")
    val b = toks.updated(100, "edit").mkString(" ")
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val got = Dedup.dupEvidenceSpans(docs, "doc_id", "text",
      shingleN = 3, numHashes = 64, bands = 16, minJaccard = 0.8)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    spark.catalog.clearCache()
    assert(got === Seq((1L, 2L, 0L, 0L, 100L)))
  }

  test("appendToLshIndex: incremental append ≡ full rebuild; consumers keep their shapes") {
    val fixtures = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    Dedup.buildLshIndex(fixtures.where($"doc_id" >= 25), "doc_id", "text",
      "lsh_idx_incr", shingleN = 3, numHashes = 64, bands = 16)
    try {
      Dedup.appendToLshIndex(fixtures.where($"doc_id" < 25), "doc_id", "text",
        "lsh_idx_incr", shingleN = 3, numHashes = 64, bands = 16)
      val direct = Dedup.minHashLshPairs(fixtures, "doc_id", "text",
        shingleN = 3, numHashes = 64, bands = 16, minJaccard = 0.8)
        .as[(Long, Long, Double)].collect().toSet
      spark.catalog.clearCache()
      val indexed = Dedup.lshPairsIndexed(spark, "lsh_idx_incr", "doc_id",
        numHashes = 64, minJaccard = 0.8)
        .as[(Long, Long, Double)].collect().toSet
      assert(direct.nonEmpty && indexed === direct,
        "appended index must reproduce the full-rebuild pair set")
      // probing an APPENDED doc still bucket-prunes and still hits
      val probeId = direct.map(p => math.min(p._1, p._2)).filter(_ < 25)
      if (probeId.nonEmpty) {
        val hits = Dedup.lshProbeIndexed(spark, "lsh_idx_incr",
          fixtures.where($"doc_id" === probeId.head), "doc_id", "text",
          shingleN = 3, numHashes = 64, bands = 16, minJaccard = 0.8)
        assert(hits.queryExecution.executedPlan.toString()
          .contains("SelectedBucketsCount"))
        assert(hits.count() > 0)
      }
    } finally spark.sql("DROP TABLE IF EXISTS lsh_idx_incr")
  }

  test("continuationChains: planted chain edges, self-loop excluded, boilerplate fanout capped") {
    val a = "alpha beta start mid one x y z"
    val b = "x y z continue two p q r"
    val c = "p q r ending three last words here"
    // doc 40: own head == own tail → must NOT self-edge
    val selfy = "s s s"
    val boiler = (100L until 120L).map(i => (i, s"same same same unique$i tail$i end$i"))
    val docs = (Seq((1L, a), (2L, b), (3L, c), (40L, selfy)) ++ boiler)
      .toDF("doc_id", "text")
    val got = Dedup.continuationChains(docs, "doc_id", "text", k = 3, maxFanout = 16)
      .as[(Long, Long, String)].collect().toSet
    spark.catalog.clearCache()
    // 20 docs share head "same same same" > 16 → capped out entirely
    assert(got === Set((1L, 2L, "x y z"), (2L, 3L, "p q r")))
  }

  test("bbitMinhashPairs: packed low bits reproduce the per-position estimator; identical docs score 1.0") {
    val fixtures = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // packed-XOR popcount identity vs a direct per-position recount
    val sig = Dedup.minHashSignatures(fixtures, "doc_id", "text",
      shingleN = 3, numHashes = 64)
      .withColumn("pack", graft.expressions.HashExpressions.packLowBits($"sig"))
    val rows = sig.select($"sig", $"pack").as[(Seq[Long], Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (s, p) =>
      val want = s.zipWithIndex.foldLeft(0L) { case (z, (h, i)) => z | ((h & 1L) << i) }
      assert(p === want)
    }
    // planted: identical docs → est_full = est_1bit = 1.0; the near-dup
    // corpus pairs must agree with the definitionally-recomputed 1-bit
    // estimate for every surviving pair
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val docs = Seq((1L, base), (2L, base),
      (3L, "totally different words live in this document about storage"))
      .toDF("doc_id", "text")
    val got = Dedup.bbitMinhashPairs(docs, "doc_id", "text",
      shingleN = 3, numHashes = 64, bands = 16, minJaccard = 0.8)
      .as[(Long, Long, Double, Double)].collect()
    spark.catalog.clearCache()
    assert(got.toSeq === Seq((1L, 2L, 1.0, 1.0)))
  }
}
