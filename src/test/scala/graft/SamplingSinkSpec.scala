package graft

import graft.operators.Sampling
import graft.sources.Datagen
import graft.streaming.ChangelogSink
import org.apache.spark.sql.functions._

class SamplingSinkSpec extends SparkSpec {
  import spark.implicits._

  test("deterministicSample is repeatable and partitioning-invariant") {
    val docs = spark.range(10000).toDF("doc_id")
    val a = Sampling.deterministicSample(docs, "doc_id", 0.1).as[Long].collect().toSet
    val b = Sampling.deterministicSample(docs.repartition(13), "doc_id", 0.1)
      .as[Long].collect().toSet
    assert(a === b)
    assert(math.abs(a.size / 10000.0 - 0.1) < 0.02)
    // different seed → different (but still deterministic) sample
    val c = Sampling.deterministicSample(docs, "doc_id", 0.1, seed = 7).as[Long].collect().toSet
    assert(c !== a)
  }

  test("bottomKSample returns k items, independent of partitioning") {
    val df = spark.range(1000).select(concat(lit("v"), col("id")).as("v"))
    val s1 = df.agg(Sampling.bottomKSample(col("v"), 10).as("s"))
      .as[Seq[String]].head()
    val s2 = df.repartition(17).agg(Sampling.bottomKSample(col("v"), 10).as("s"))
      .as[Seq[String]].head()
    assert(s1.size === 10)
    assert(s1.toSet === s2.toSet)
  }

  test("bottomKSample is partitioning-invariant even with duplicate values") {
    val dup = spark.range(200).select(concat(lit("v"), col("id") % 50).as("v")) // each value 4x
    val s1 = dup.coalesce(1).agg(Sampling.bottomKSample(col("v"), 10).as("s"))
      .as[Seq[String]].head()
    val s2 = dup.repartition(19).agg(Sampling.bottomKSample(col("v"), 10).as("s"))
      .as[Seq[String]].head()
    assert(s1 === s2)
    assert(s1.distinct.size === 10) // duplicates occupy one slot
  }

  test("changelog sink: upsert encoding emits tombstones, round trip restores state") {
    val changelog = Seq(
      ("k1", "a", 1L, "+I"),
      ("k1", "b", 2L, "+U"),
      ("k2", "c", 3L, "+I"),
      ("k2", "ignored", 4L, "-D"), // delete k2
      ("k3", "d", 5L, "+I")
    ).toDF("id", "payload", "seq", "__op")
    val frame = ChangelogSink.encodeUpsert(changelog, Seq("id"))
    assert(frame.columns.toSeq === Seq("key", "value"))
    // re-attach seq for the fold (a Kafka consumer would use offsets)
    val withSeq = ChangelogSink.encodeUpsert(changelog, Seq("id"))
      .withColumn("seq", get_json_object(col("value"), "$.seq"))
    // tombstone: null value present for k2
    assert(frame.where(col("value").isNull).count() === 1)
    val log = changelog.select(
      to_json(struct(col("id"))).as("key"),
      when(col("__op") === "-D", lit(null))
        .otherwise(to_json(struct(col("payload")))).as("value"),
      col("seq"))
    val state = ChangelogSink.materializeUpsertLog(log, "seq")
      .as[(String, String)].collect().toMap
    assert(state.keySet === Set("""{"id":"k1"}""", """{"id":"k3"}"""))
    assert(state("""{"id":"k1"}""") === """{"payload":"b"}""")
  }

  test("datagen projections are deterministic and cycle keys for upserts") {
    val c1 = Datagen.customersBatch(spark, 250).collect()
    val c2 = Datagen.customersBatch(spark, 250).collect()
    assert(c1.map(_.toString).toSeq === c2.map(_.toString).toSeq)
    // 250 rows over 100 keys → multiple versions per key
    val perKey = Datagen.customersBatch(spark, 250).groupBy("id").count()
    assert(perKey.agg(max("count")).as[Long].head() >= 2)
    val o = Datagen.ordersBatch(spark, 100)
    assert(o.columns.toSeq === Seq("order_id", "product_id", "customer_id", "ts"))
    // ts strictly ascending (zero-delay watermark compatible)
    val ts = o.orderBy("order_id").select("ts").as[java.sql.Timestamp].collect()
    assert(ts.sliding(2).forall(p => p(0).before(p(1))))
  }

  test("datagen rate stream produces the same shape as the batch form") {
    val stream = Datagen.customersStream(spark, rowsPerSecond = 100)
    assert(stream.isStreaming)
    assert(stream.schema.map(f => (f.name, f.dataType)) ===
      Datagen.customersBatch(spark, 1).schema.map(f => (f.name, f.dataType)))
    val q = stream.writeStream.format("memory").queryName("dg_t").start()
    try {
      val deadline = System.currentTimeMillis() + 15000
      while (spark.table("dg_t").isEmpty && System.currentTimeMillis() < deadline) {
        Thread.sleep(250)
      }
      assert(!spark.table("dg_t").isEmpty, "rate stream produced no rows in 15s")
    } finally q.stop()
  }

  test("stratifiedPortableSample applies per-stratum rates over the q44 bucket, no shuffle") {
    import spark.implicits._
    import graft.operators.Sampling
    val df = (0L until 2000L).map(i => (i, if (i % 2 == 0) "en" else "rare"))
      .toDF("id", "lang")
    val got = Sampling.stratifiedPortableSample(df, "id", "lang",
      rates = Map("en" -> 10), defaultKeep = 100)
    // rare stratum: defaultKeep = 100 keeps everything
    assert(got.where($"lang" === "rare").count() === 1000L)
    // en stratum: subset of the unstratified 10%-bucket sample, exactly
    val flat = Sampling.portableSample(df, "id", keep = 10)
    val gotEn = got.where($"lang" === "en").select("id").as[Long].collect().toSet
    val flatEn = flat.where($"lang" === "en").select("id").as[Long].collect().toSet
    assert(gotEn === flatEn)
    // stateless per-row filter: no exchange in the plan
    val plan = got.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange"), s"stratified sample must not shuffle:\n$plan")
  }

  test("groupHoldout picks exactly k rows per group, stable across partitionings") {
    import spark.implicits._
    import graft.operators.Sampling
    val df = (0L until 300L).map(i => (i, s"g${i % 3}")).toDF("id", "grp")
    val a = Sampling.groupHoldout(df, "id", "grp", k = 7)
    assert(a.groupBy("grp").count().collect().forall(_.getLong(1) === 7L))
    val b = Sampling.groupHoldout(df.repartition(11), "id", "grp", k = 7)
    assert(a.select("id").as[Long].collect().toSet === b.select("id").as[Long].collect().toSet)
    // rank is 1..k within each group
    assert(a.agg(max("holdout_rank")).head.getInt(0) === 7)
  }

  test("tokenBudgetMix: under-budget domains keep everything; over-budget ones cap at the integral rate") {
    import spark.implicits._
    import graft.operators.Sampling
    // "big" has 200 docs x 5 tokens = 1000 tokens; "small" has 10 x 5 = 50
    val docs = ((0L until 200L).map(i => (i, "big", "a b c d e")) ++
      (200L until 210L).map(i => (i, "small", "a b c d e")))
      .toDF("doc_id", "domain", "text")
    val mix = Sampling.tokenBudgetMix(docs, "doc_id", "domain",
        graft.functions.TextAnalysis.tokenCount($"text"), budgetTokens = 300L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val (bigDocs, bigToks, bigKeep, bigKeptD, bigKeptT) = mix("big")
    assert((bigDocs, bigToks) === ((200L, 1000L)))
    assert(bigKeep === 300L * 100L / 1000L) // = 30 of 100 buckets
    assert(bigKeptD < bigDocs && bigKeptT < bigToks)
    val (smDocs, smToks, smKeep, smKeptD, smKeptT) = mix("small")
    assert(smKeep === 100L, "under-budget domain must keep all buckets")
    assert((smKeptD, smKeptT) === ((smDocs, smToks)))
    // the summary's kept counts equal a direct portableSample-style
    // bucket filter at the same rate — the materialization predicate
    val direct = Sampling.portableSample(
      docs.where($"domain" === "big"), "doc_id", keep = bigKeep.toInt).count()
    assert(direct === bigKeptD)
    // partitioning-independent (pure content function)
    val again = Sampling.tokenBudgetMix(docs.repartition(17), "doc_id", "domain",
        graft.functions.TextAnalysis.tokenCount($"text"), budgetTokens = 300L)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(again("big") === bigKeptD && again("small") === smKeptD)
    // a zero-token domain keeps everything instead of ANSI-dividing by 0
    val zeroTok = Sampling.tokenBudgetMix(docs, "doc_id", "domain",
        lit(0L), budgetTokens = 300L)
      .collect().map(r => r.getString(0) -> ((r.getLong(3), r.getLong(4)))).toMap
    assert(zeroTok("big") === ((100L, 200L)) && zeroTok("small") === ((100L, 10L)))
  }

  test("domainMixture: α=0.5 tempering upsamples the rare domain with exact micro-unit sums") {
    import spark.implicits._
    val rows = (1 to 90).map(i => (i.toLong, "big", 100L)) ++
      (91 to 100).map(i => (i.toLong, "rare", 100L))
    val got = Sampling.domainMixture(
        rows.toDF("doc_id", "domain", "n"), "domain", $"n")
      .select("domain", "n_docs", "n_tokens", "p_raw", "p_temp", "epochs")
      .as[(String, Long, Long, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(got("big")._2 === 90L && got("big")._3 === 9000L)
    assert(got("big")._4 === 0.9 && got("rare")._4 === 0.1)
    // replicate the exact integer-micro-unit arithmetic
    val sBig = math.floor(math.sqrt(9000.0) * 1e6).toLong
    val sRare = math.floor(math.sqrt(1000.0) * 1e6).toLong
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(got("big")._5 === r6(sBig.toDouble / (sBig + sRare)))
    assert(got("rare")._5 === r6(sRare.toDouble / (sBig + sRare)))
    // tempering pulls toward uniform: rare upsampled, big downsampled
    assert(got("rare")._6 > 1.0 && got("big")._6 < 1.0)
    assert(got("rare")._5 > got("rare")._4 && got("big")._5 < got("big")._4)
  }

  test("epochCappedMix: water-filling matches the sequential UniMax greedy") {
    import spark.implicits._
    // langs sized 2, 10, 50, 200 tokens (docs of one token each)
    def mk(lang: String, n: Int, off: Long) =
      (0 until n).map(i => (off + i, lang, "tok"))
    val docs = (mk("aa", 2, 0) ++ mk("bb", 10, 100) ++ mk("cc", 50, 1000) ++
      mk("dd", 200, 10000)).toDF("doc_id", "lang", "text")
    def run(budget: Long, e: Int): Map[String, (Long, Boolean, Long, Double)] =
      Sampling.epochCappedMix(docs, "lang", "text", budget, e)
        .as[(String, Long, Long, Boolean, Long, Double)].collect()
        .map(r => r._1 -> (r._3, r._4, r._5, r._6)).toMap
    // reference: the paper's sequential greedy, smallest lang first.
    // Greedy ≡ the operator's water-filling closed form except when
    // integer floor-division dust cascades to later languages (e.g.
    // B=41 below would differ by 1 token); the (B, E) points chosen
    // here are dust-free, so the comparison is exact.
    def greedy(sizes: Seq[(String, Long)], budget: Long, e: Int): Map[String, Long] = {
      var rem = budget
      val sorted = sizes.sortBy(s => (s._2, s._1))
      sorted.zipWithIndex.map { case ((lang, n), i) =>
        val fair = rem / (sorted.length - i)
        val a = math.min(n * e, fair)
        rem -= a
        lang -> a
      }.toMap
    }
    val sizes = Seq("aa" -> 2L, "bb" -> 10L, "cc" -> 50L, "dd" -> 200L)
    for ((b, e) <- Seq((100L, 3), (1000L, 3), (40L, 2), (10000L, 5))) {
      val got = run(b, e)
      val want = greedy(sizes, b, e)
      for ((lang, alloc) <- want)
        assert(got(lang)._3 === alloc, s"B=$b E=$e lang=$lang")
      // budget never exceeded; epochs never exceed the cap
      assert(got.values.map(_._3).sum <= b)
      assert(got.values.forall(_._4 <= e + 1e-9))
    }
    // all-capped: budget exceeds E·total — everyone gets exactly n·E
    val cap = run(100000L, 4)
    assert(cap.values.forall(_._2))
    for ((lang, n) <- sizes) assert(cap(lang)._3 === n * 4)
    assert(cap("aa")._4 === 4.0)
  }

  test("qualityProportionalSample: keep iff bucket < quality micro-units, content-keyed") {
    import spark.implicits._
    val df = (1 to 200).map(_.toLong).toDF("id")
    // boundary rates (micro-units): q=10⁶ → bucket<10⁶ always; q=0 → never
    assert(Sampling.qualityProportionalSample(df, "id", lit(1000000L)).count() === 200)
    assert(Sampling.qualityProportionalSample(df, "id", lit(0L)).count() === 0)
    // per-row rate: the kept set is a pure content function — identical
    // across partitionings, and the empirical rate tracks q
    val kept = Sampling.qualityProportionalSample(df, "id", lit(300000L))
      .select("id").as[Long].collect().toSet
    val again = Sampling.qualityProportionalSample(df.repartition(13), "id", lit(300000L))
      .select("id").as[Long].collect().toSet
    assert(kept === again)
    assert(kept.size > 30 && kept.size < 90) // 200·0.3 = 60 expected
  }

  test("shardBalance: mass conserved, shares sum to ~1e6, deviation replays share − ideal") {
    import spark.implicits._
    val docs = (1L to 40L).map(i => (i, ("tok " * (i % 7 + 1).toInt).trim))
      .toDF("doc_id", "text")
    val got = Sampling.shardBalance(docs, "doc_id", "text", shards = 4)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.map(_._2).sum === 40L, "every doc lands in exactly one shard")
    assert(got.map(_._3).sum === (1L to 40L).map(_ % 7 + 1).sum)
    val shareSum = got.map(_._4).sum
    assert(math.abs(shareSum - 1000000L) <= got.length,
      s"shares must sum to 1e6 within per-shard rounding, got $shareSum")
    got.foreach { case (_, _, _, share, dev) =>
      assert(dev === share - 250000L) // ideal = 1/4
    }
    // partitioning-invariant (the md5Bucket contract)
    val again = Sampling.shardBalance(docs.repartition(13), "doc_id", "text",
      shards = 4).as[(Long, Long, Long, Long, Long)].collect()
    assert(again.sortBy(_._1).toSeq === got.sortBy(_._1).toSeq)
  }

  test("globalShuffleOrdinal: dense permutation, shard-contiguous, seed-keyed, layout-invariant") {
    import spark.implicits._
    val docs = (1L to 100L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val got = Sampling.globalShuffleOrdinal(docs, "doc_id", shards = 8)
      .as[(Long, Int, Long)].collect()
    assert(got.map(_._3).sorted.toSeq === (0L until 100L), "ordinals are a dense permutation")
    // ordinals are contiguous per shard and ordered by shard
    val byShard = got.groupBy(_._2).toSeq.sortBy(_._1)
    byShard.sliding(2).foreach {
      case Seq((_, a), (_, b)) => assert(a.map(_._3).max < b.map(_._3).min)
      case _ =>
    }
    // partitioning-invariant; a different seed permutes differently
    val again = Sampling.globalShuffleOrdinal(docs.repartition(13), "doc_id", shards = 8)
      .as[(Long, Int, Long)].collect()
    assert(again.sortBy(_._1).toSeq === got.sortBy(_._1).toSeq)
    val other = Sampling.globalShuffleOrdinal(docs, "doc_id", shards = 8, seed = "epoch2")
      .as[(Long, Int, Long)].collect()
    assert(other.sortBy(_._1).map(_._3).toSeq !== got.sortBy(_._1).map(_._3).toSeq)
  }

  test("shardCompositionEntropy: uniform mix hits ln-2 micro, single source hits zero") {
    // shards = 1 pins every row into one shard: sources A×2, B×2 →
    // H = lnµ(4) − (4·lnµ(2))/4 = exactly ln 2 in micro; evenness 1.0
    val docs = Seq((1L, "A"), (2L, "A"), (3L, "B"), (4L, "B"))
      .toDF("doc_id", "source")
    val r = Sampling.shardCompositionEntropy(docs, "doc_id", "source", shards = 1)
      .as[(Long, Long, Long, Long, Option[Long])].collect().head
    assert(r === ((0L, 4L, 2L, 693147L, Some(1000000L))))
    // one source → zero entropy and NO evenness (ln 1 = 0 must not divide)
    val mono = Seq((1L, "A"), (2L, "A")).toDF("doc_id", "source")
    val rm = Sampling.shardCompositionEntropy(mono, "doc_id", "source", shards = 1)
      .as[(Long, Long, Long, Long, Option[Long])].collect().head
    assert(rm === ((0L, 2L, 1L, 0L, None)))
  }

  test("domainReweightMW: high-loss domain gains, weights stay a distribution, degenerate cases freeze") {
    import org.apache.spark.sql.functions.length
    def run(rows: Seq[(String, String)], iters: Int = 10) = {
      val out = Sampling.domainReweightMW(rows.toDF("source", "text"),
        "source", length(col("text")), iters = iters)
        .as[(String, Long, Long, Double)].collect().sortBy(_._1)
      spark.catalog.clearCache()
      out
    }
    // domain B's docs are 3× longer → higher proxy loss → more weight;
    // A and C identical → identical weights; Σw = 1 (within round-6)
    val got = run(Seq(("A", "xx"), ("B", "xxxxxx"), ("C", "xx")))
    val byDom = got.map(r => r._1 -> r._4).toMap
    assert(byDom("B") > byDom("A") && byDom("A") === byDom("C"))
    assert(math.abs(got.map(_._4).sum - 1.0) < 1e-5)
    // one MW step by hand: L = (2, 6, 2), w0 = 1/3 → L̄ = 10/3;
    // w_B ∝ (1/3)(1 + 0.25·(6 − 10/3)/(10/3)) = (1/3)(1.2) — after
    // normalizing against 2×(1/3)(0.9): w_B = 1.2/3 = 0.4
    val one = run(Seq(("A", "xx"), ("B", "xxxxxx"), ("C", "xx")), iters = 1)
    val oneByDom = one.map(r => r._1 -> r._4).toMap
    assert(oneByDom("B") === 0.4)
    // equal losses: A = 0 every iteration → exactly uniform forever
    val eq = run(Seq(("A", "xx"), ("B", "xx")))
    assert(eq.forall(_._4 === 0.5))
    // zero loss everywhere: L̄ = 0 freezes the update (no NaN/div-0)
    val zero = run(Seq(("A", ""), ("B", "")))
    assert(zero.forall(_._4 === 0.5))
  }
}
