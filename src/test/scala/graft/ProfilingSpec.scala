package graft

import graft.operators.Profiling
import org.apache.spark.sql.functions.{col, timestamp_micros}

class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  test("numericProfile: hand-computed bins, moments, and half-up fracs") {
    // values 0.00, 1.00, …, 9.00 in 5 bins of width 1.8: micro units
    // 0..90000, width 18000 → bins [0,1.8):{0,1}, [1.8,3.6):{2,3}, … and
    // 9.0 clamps into bin 4 → counts 2,2,2,2,2
    val df = (0 to 9).map(_.toDouble).toDF("v")
    val got = Profiling.numericProfile(df, "v", bins = 5)
      .orderBy("bin")
      .select("bin", "bin_lo", "bin_hi", "n", "frac", "mean", "stddev")
      .as[(Long, Double, Double, Long, Double, Double, Double)].collect()
    assert(got.map(_._1).toSeq === (0L to 4L))
    assert(got.map(_._4).forall(_ === 2L))
    assert(got.map(_._5).forall(_ === 0.2))
    assert(got.head._2 === 0.0 && got.head._3 === 1.8)
    assert(got.last._3 === 9.0)
    // mean 4.5; population stddev = sqrt(mean(v²) − mean²) = sqrt(8.25)
    assert(got.head._6 === 4.5)
    assert(got.head._7 === math.rint(math.sqrt(8.25) * 1e6) / 1e6)
  }

  test("numericProfile: constant column degenerates to one full bin with zero spread") {
    val df = Seq.fill(7)(3.25).toDF("v")
    val got = Profiling.numericProfile(df, "v", bins = 20)
      .select("bin", "n", "frac", "mean", "stddev")
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(got.length === 1)
    assert(got.head === ((0L, 7L, 1.0, 3.25, 0.0)))
  }

  test("numericProfile: 2-dp money snaps exactly — fracs sum to 1 and counts to n") {
    val df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val got = Profiling.numericProfile(df, "o_totalprice", bins = 20)
      .select("n", "frac").as[(Long, Double)].collect()
    assert(got.map(_._1).sum === df.count())
    // half-up micro fracs: each within 5e-7 of exact, so the sum lands
    // within 20·5e-7 of 1
    assert(math.abs(got.map(_._2).sum - 1.0) < 1e-5)
  }

  test("winsorize: hand-computed interpolated bounds clip exactly the tails") {
    import org.apache.spark.sql.functions.col
    // group a: v = 1..21 → idx_lo = 20·0.05 = 1.0 (rank 2, frac 0) →
    // lo = 2; idx_hi = 19.0 (rank 20) → hi = 20. Only the endpoints clip.
    val docs = ((1L to 21L).map(i => (i, "a", i)) ++
      Seq((100L, "b", 7L), (101L, "b", 9L))).toDF("doc_id", "grp", "v")
    val got = Profiling.winsorize(docs, "doc_id", "grp", col("v"),
        pLo = 0.05, pHi = 0.95)
      .as[(Long, String, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, "a", 1.0, 2.0, 20.0, 2.0)), "low tail clips up")
    assert(got(21L) === ((21L, "a", 21.0, 2.0, 20.0, 20.0)), "high tail clips down")
    (2L to 20L).foreach(i => assert(got(i)._6 === i.toDouble, s"v=$i untouched"))
    // group b (n = 2): idx_lo = 0.05 → 0.95·7 + 0.05·9 = 7.1;
    // idx_hi = 0.95 → 0.05·7 + 0.95·9 = 8.9 — interpolation BETWEEN ranks
    assert(got(100L)._4 === 7.1 && got(100L)._5 === 8.9)
    assert(got(100L)._6 === 7.1 && got(101L)._6 === 8.9)
    spark.catalog.clearCache()
  }

  test("kAnonymityProfile: classes below k are at risk, a singleton always is") {
    import org.apache.spark.sql.functions.col
    val rows = (Seq.fill(6)(("en", "web")) ++ Seq.fill(3)(("en", "books")) ++
      Seq(("fr", "web"))).zipWithIndex
      .map { case ((l, s), i) => (i.toLong, l, s) }
      .toDF("id", "lang", "source")
    val got = Profiling.kAnonymityProfile(rows, k = 5, col("lang"), col("source"))
      .as[(String, String, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got(("en", "web")) === ((6L, false)))
    assert(got(("en", "books")) === ((3L, true)))
    assert(got(("fr", "web")) === ((1L, true)), "a singleton class IS an identifier")
    assert(got.values.map(_._1).sum === 10L, "class sizes partition the corpus")
  }

  test("embeddingCoverage: missing vectors, orphan vectors, exact micro coverage") {
    val docs = Seq((1L, "s1"), (2L, "s1"), (3L, "s2")).toDF("doc_id", "source")
    val emb = Seq((1L, 0), (2L, 0), (4L, 0)).toDF("vec_id", "label")
    val got = Profiling.embeddingCoverage(docs, emb)
      .as[(String, Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    assert(got("s1") === (("s1", 2L, 2L, 2L, Some(1000000L))))
    assert(got("s2") === (("s2", 1L, 0L, 0L, Some(0L))), "doc 3 has no vector")
    assert(got("(orphan)") === (("(orphan)", 0L, 1L, 0L, None)),
      "vector 4 matches no doc — id drift must surface, not vanish")
  }

  test("madOutlierProfile: lower medians, strict cut, exact micro ratio") {
    val rows = Seq(("A", 10L), ("A", 12L), ("A", 14L), ("A", 1000L),
      ("B", 7L), ("B", 7L), ("B", 7L))
      .toDF("source", "v")
    val got = Profiling.madOutlierProfile(rows, "source", col("v"))
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    spark.catalog.clearCache()
    // A: sorted [10,12,14,1000] → lower median 12; devs [0,2,2,988] →
    // MAD 2; only 988 > 3·2 → 1/4 = exactly 250000 micro
    assert(got("A") === (("A", 4L, 12L, 2L, 1L, 250000L)))
    // B: constant column → MAD 0, zero deviation, zero outliers —
    // the degenerate case must not divide by the MAD
    assert(got("B") === (("B", 3L, 7L, 0L, 0L, 0L)))
  }

  test("madOutlierProfile: the outlier a mean/stddev gate would mask") {
    // one mega-row drags the MEAN to ~917 (z of 1000 ≈ 0.3 — invisible)
    // while the median/MAD gate flags it cleanly
    val rows = (Seq.fill(10)(("s", 5L)) :+ (("s", 10000L))).toDF("source", "v")
    val r = Profiling.madOutlierProfile(rows, "source", col("v"))
      .as[(String, Long, Long, Long, Long, Long)].collect().head
    spark.catalog.clearCache()
    assert(r._3 === 5L && r._4 === 0L && r._5 === 1L,
      "median 5, MAD 0, exactly the planted row flagged")
  }

  test("signalSpearman: monotone 1, anti-monotone -1, ties take average ranks, constant is NULL") {
    def rho(rows: Seq[(Long, Long)]): (Long, Option[Double]) = {
      val r = Profiling.signalSpearman(rows.toDF("x", "y"), col("x"), col("y"))
        .as[(Long, Option[Double])].collect().head
      spark.catalog.clearCache()
      r
    }
    assert(rho(Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L))) === ((4L, Some(1.0))))
    assert(rho(Seq((1L, 40L), (2L, 30L), (3L, 20L), (4L, 10L))) === ((4L, Some(-1.0))))
    // ties: x = (1,2,2,3) → avg ranks (1, 2.5, 2.5, 4); y strictly
    // increasing → ranks (1,2,3,4). Hand-computed Pearson on doubled
    // ranks (2,5,5,8)/(2,4,6,8): 72/(√72·√80) = 0.948683…
    assert(rho(Seq((1L, 10L), (2L, 20L), (2L, 30L), (3L, 40L)))
      === ((4L, Some(0.948683))))
    // constant signal: zero variance → ρ undefined, never a div-by-0
    assert(rho(Seq((5L, 10L), (5L, 20L), (5L, 30L))) === ((3L, None)))
  }

  test("categoricalAssociation: determined ⇒ V = 1, independent ⇒ V ≈ 0, constant ⇒ NULL") {
    def v(rows: Seq[(String, String)]): (Long, Long, Long, Double, Option[Double]) = {
      val r = Profiling.categoricalAssociation(rows.toDF("a", "b"), col("a"), col("b"))
        .as[(Long, Long, Long, Double, Option[Double])].collect().head
      spark.catalog.clearCache()
      r
    }
    // b determined by a (2×2, diagonal): χ² = n, V = 1
    val det = v(Seq(("x", "1"), ("x", "1"), ("y", "2"), ("y", "2")))
    assert(det._1 === 4L && det._2 === 2L && det._3 === 2L)
    assert(det._5 === Some(1.0))
    // perfectly independent 2×2 (every cell equal): χ² = 0, V = 0 —
    // and the floor-snap clamp must not let it go NaN
    val ind = v(Seq(("x", "1"), ("x", "2"), ("y", "1"), ("y", "2")))
    assert(ind._4 === 0.0 && ind._5 === Some(0.0))
    // constant b: min(r, c) = 1 → V undefined
    assert(v(Seq(("x", "1"), ("y", "1")))._5 === None)
  }

  test("leadLagCorrelation: planted +1h shift peaks at lag 1; zero variance yields NULL") {
    val hourUs = 3600000000L
    // A's hourly counts are the NON-linear pattern 1,3,2,5 over hours
    // 0–3 (a ramp would be linear at every lag — Pearson is
    // shift-invariant); B is the same pattern one hour later; 'flat'
    // is constant (zero variance)
    val pat = Seq(1, 3, 2, 5)
    val evs = pat.zipWithIndex.flatMap { case (c, h) =>
      (1 to c).map(_ => ("view", h.toLong * hourUs)) ++
        (1 to c).map(_ => ("purchase", (h + 1).toLong * hourUs))
    } ++ (0 to 4).flatMap(h => Seq(("flat", h.toLong * hourUs), ("flat", h.toLong * hourUs)))
    val df = evs.toDF("event_type", "eus")
      .select($"event_type", timestamp_micros($"eus").as("ts"))
    val got = Profiling.leadLagCorrelation(df, "event_type", "ts",
      "view", "purchase", maxLag = 2)
      .as[(Long, Long, Option[Double])].collect().map(r => r._1 -> r).toMap
    spark.catalog.clearCache()
    assert(got(1L)._3 === Some(1.0), s"shifted ramp must peak at +1: $got")
    assert(got(-1L)._3.get < 1.0 && got(0L)._3.get < 1.0 && got(2L)._3.get < 1.0)
    // n_buckets shrinks by |lag| off the 5-hour grid
    assert(got(0L)._2 === 5L && got(1L)._2 === 4L && got(2L)._2 === 3L)
    val flat = Profiling.leadLagCorrelation(df, "event_type", "ts",
      "flat", "purchase", maxLag = 1)
      .as[(Long, Long, Option[Double])].collect()
    spark.catalog.clearCache()
    assert(flat.forall(_._3.isEmpty), s"constant side must yield NULL: ${flat.toSeq}")
  }

  test("noveltyTimeline: first-seen days, pair novelty outlives user novelty, exact micro shares") {
    val us = 86400000000L // one day of epoch micros
    // day 0: users 1,2 appear (type a). day 1: user 1 returns with a
    // NEW type b; user 3 is brand new. day 2: all three return with
    // types already seen — zero novelty on both curves.
    val rows = Seq(
      (1L, 0L, "a"), (2L, 0L, "a"),
      (1L, us, "b"), (3L, us, "a"),
      (1L, 2 * us, "a"), (2L, 2 * us, "a"), (3L, 2 * us, "a"))
      .toDF("user_id", "eus", "event_type")
      .select($"user_id", timestamp_micros($"eus").as("ts"), $"event_type")
    val got = Profiling.noveltyTimeline(rows, "user_id", "ts", "event_type")
      .orderBy("day")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    spark.catalog.clearCache()
    assert(got === Seq(
      // day, active_u, new_u, ppm_u, active_p, new_p, ppm_p
      (0L, 2L, 2L, 1000000L, 2L, 2L, 1000000L),
      (1L, 2L, 1L, 500000L, 2L, 2L, 1000000L), // user 1 old, pair (1,b) new
      (2L, 3L, 0L, 0L, 3L, 0L, 0L)))
  }
}
