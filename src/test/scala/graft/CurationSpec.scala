package graft

import graft.operators.Curation
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {
  import spark.implicits._

  // one doc per funnel branch, in a declared language the detector knows
  private val enGood = ("the cat sat of and is to in it " +
    "walked around the garden while finding many interesting things " +
    "to look at and the day went on quietly with more words appearing") // long, stopworded, en
  private def docs = Seq(
    (1L, enGood, "en"),                       // keep
    (2L, "tiny doc", "en"),                   // drop:too_short
    (3L, ("spam spam " * 30).trim, "en"),     // drop:repetitive (but also short tokens…)
    (4L, enGood, "fr")                        // drop:lang_mismatch
  ).toDF("doc_id", "text", "lang")

  test("funnel assigns the first failing reason in precedence order") {
    val got = Curation.funnel(docs, "doc_id", "text", "lang")
      .select("doc_id", "verdict").as[(Long, String)].collect().toMap
    assert(got(1L) === "keep")
    assert(got(2L) === "drop:too_short")
    assert(got(3L) === "drop:repetitive")
    assert(got(4L) === "drop:lang_mismatch")
  }

  test("funnel emits null repetition for sub-bigram docs and never nulls the verdict") {
    val one = Seq((9L, "word", "en")).toDF("doc_id", "text", "lang")
    val row = Curation.funnel(one, "doc_id", "text", "lang").head
    assert(row.isNullAt(row.fieldIndex("repetition_ratio")))
    assert(row.getAs[String]("verdict") === "drop:too_short")
  }

  test("funnelSummary partitions the corpus exactly (docs and tokens conserved)") {
    val sum = Curation.funnelSummary(docs, "doc_id", "text", "lang")
    assert(sum.agg(org.apache.spark.sql.functions.sum("n_docs")).head.getLong(0) === 4L)
    val direct = Curation.funnel(docs, "doc_id", "text", "lang")
      .agg(org.apache.spark.sql.functions.sum(col("n_tokens").cast("long"))).head.getLong(0)
    assert(sum.agg(org.apache.spark.sql.functions.sum("n_tokens")).head.getLong(0) === direct)
  }

  test("funnel is one per-row scan: no exchange, no join in the plan") {
    val plan = Curation.funnel(docs, "doc_id", "text", "lang")
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"funnel must stay per-row:\n$plan")
  }

  test("pipelineManifest: each gate flag matches its standalone operator on the fixture") {
    import spark.implicits._
    val fixture = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val manifest = Curation.pipelineManifest(fixture, "doc_id", "text",
        "lang", "source", budgetTokens = 800L)
      .as[(Long, String, String, Boolean, Boolean, Boolean, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(manifest.size === fixture.count()) // every doc gets a verdict
    // keep = the exact conjunction, row by row
    assert(manifest.values.forall(r => r._7 === (r._4 && r._5 && r._6)))
    // keep_funnel ≡ the standalone funnel verdict
    val funnelKeep = Curation.funnel(fixture, "doc_id", "text", "lang")
      .where(col("verdict") === "keep").select("doc_id").as[Long].collect().toSet
    assert(manifest.values.forall(r => r._4 === funnelKeep.contains(r._1)))
    // keep_dedup ≡ survival of the standalone materialized dedup pass
    val survivors = graft.operators.Dedup.dedupedCorpus(fixture, "doc_id", "text",
        shingleN = 3, numHashes = 64, bands = 16, minJaccard = 0.8)
      .select("doc_id").as[Long].collect().toSet
    assert(manifest.values.forall(r => r._5 === survivors.contains(r._1)))
    spark.catalog.clearCache()
  }

  test("calibrationBins: bins partition the corpus; means stay inside their bin's score range") {
    import spark.implicits._
    val fixture = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val bins = Curation.calibrationBins(fixture, "doc_id", "text")
      .select("bin", "n_docs", "mean_score_micro", "keep_rate_micro", "gap_micro")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(bins.map(_._2).sum === fixture.count(), "every doc lands in exactly one bin")
    bins.foreach { case (b, n, mean, rate, gap) =>
      assert(b >= 0 && b <= 9 && n > 0)
      // bin b holds s_micro with (s·10)//1000001 == b
      assert(mean >= b * 100000 && mean <= (b + 1) * 100001,
        s"bin $b mean $mean outside its score range")
      assert(rate >= 0 && rate <= 1000000)
      assert(gap === mean - rate)
    }
  }

  test("corpusDiffCard: added/removed/changed/stable classification with token deltas") {
    import graft.operators.Curation
    val old = Seq((1L, "a b", "s"), (2L, "x", "s"), (3L, "gone", "s"),
      (10L, "other src row", "t")).toDF("doc_id", "text", "source")
    val neu = Seq((1L, "a b", "s"), (2L, "x y z", "s"), (4L, "fresh doc", "s"),
      (10L, "other src row", "t")).toDF("doc_id", "text", "source")
    val got = Curation.corpusDiffCard(old, neu, "doc_id", "text", "source")
      .as[(String, Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // source s: doc 1 stable, doc 2 changed (1→3 tokens), doc 3
    // removed (1 token), doc 4 added (2 tokens); net = 7 − 4 = 3
    assert(got("s") === (("s", 1L, 1L, 1L, 1L, 2L, 1L, 3L)))
    // source t: untouched snapshot → all-stable, zero deltas
    assert(got("t") === (("t", 0L, 0L, 0L, 1L, 0L, 0L, 0L)))
  }

  test("langAgreementMatrix: mislabeled cells split the declared-lang share exactly") {
    import graft.operators.Curation
    // source s declares 'en' for three docs: two really English, one
    // Spanish → cells (en,en) 2/3 and (en,es) 1/3; source t's single
    // doc has no stopwords → 'und'
    val docs = Seq(
      ("s", "en", "the cat is in the hat"),
      ("s", "en", "it is a good day to code"),
      ("s", "en", "el perro es un animal que ladra"),
      ("t", "en", "zzz qqq xxx")).toDF("source", "lang", "text")
    val got = Curation.langAgreementMatrix(docs, "source", "lang", "text")
      .as[(String, String, String, Long, Long)].collect().toSet
    assert(got === Set(
      ("s", "en", "en", 2L, 666667L),
      ("s", "en", "es", 1L, 333333L),
      ("t", "en", "und", 1L, 1000000L)))
  }
}
