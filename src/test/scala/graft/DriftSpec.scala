package graft

import graft.operators.Drift
import org.apache.spark.sql.functions._

class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: Seq[(String, Long)]) =
    rows.toDF("etype", "us").withColumn("ts", timestamp_micros($"us"))

  test("psiDrift: planted mix shift yields the hand-computed smoothed PSI terms") {
    // first half (us ≤ 100): 100 A + 100 B; second half: 100 A + 300 B
    val rows = (1 to 100).map(i => ("A", i.toLong)) ++
      (1 to 100).map(i => ("B", i.toLong)) ++
      (1 to 100).map(i => ("A", 1000000L + i)) ++
      (1 to 300).map(i => ("B", 1000000L + i))
    val got = Drift.psiDrift(ev(rows), "etype", "ts")
      .select("category", "n_first", "n_second", "p_first", "p_second", "psi_term")
      .as[(String, Long, Long, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(got("A")._2 === 100L && got("A")._3 === 100L)
    assert(got("B")._2 === 100L && got("B")._3 === 300L)
    // replicate the smoothing: p = (n+1)/(tot+k), tot_a=200 tot_b=400 k=2
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    val (paA, pbA) = (101.0 / 202.0, 101.0 / 402.0)
    assert(got("A")._4 === r6(paA) && got("A")._5 === r6(pbA))
    assert(got("A")._6 === r6((paA - pbA) * math.log(paA / pbA)))
    // a PSI term is (p_a−p_b)·ln(p_a/p_b) ≥ 0 — both factors share sign
    assert(got.values.forall(_._6 >= 0.0))
  }

  test("psiDrift: a category absent from one half gets a finite smoothed term, not ln(0)") {
    val rows = (1 to 50).map(i => ("A", i.toLong)) ++
      (1 to 50).map(i => ("C", i.toLong)) ++          // C only in first half
      (1 to 50).map(i => ("A", 1000000L + i))
    val got = Drift.psiDrift(ev(rows), "etype", "ts")
      .select("category", "n_second", "psi_term")
      .as[(String, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("C")._1 === 0L)
    assert(!got("C")._2.isNaN && !got("C")._2.isInfinite && got("C")._2 > 0.0)
  }

  test("psiDrift: identical halves give near-zero drift on every category") {
    val rows = (1 to 80).flatMap(i =>
      Seq(("A", i.toLong), ("B", i.toLong), ("A", 1000000L + i), ("B", 1000000L + i)))
    val terms = Drift.psiDrift(ev(rows), "etype", "ts")
      .select("psi_term").as[Double].collect()
    assert(terms.length === 2 && terms.forall(_ === 0.0))
  }

  test("ksDrift: hand-computed CDF gaps; ties on the max pick the smallest value") {
    import org.apache.spark.sql.functions.col
    // a: {1,1,2}; b: {2,3,3} → na=nb=3; gaps×9 at v=1,2,3: 6,6,0 —
    // max 6 first reached at v=1; KS = 6/9 → 666667 half-up micro
    val df = (Seq((1L, "a"), (1L, "a"), (2L, "a")) ++
      Seq((2L, "b"), (3L, "b"), (3L, "b"))).toDF("v", "g")
    val r = Drift.ksDrift(df, col("v"), col("g"), "a", "b")
      .as[(Long, Long, Long, Long)].collect().head
    assert(r === ((3L, 3L, 666667L, 1L)))
  }

  test("ksDrift: identical samples score zero; disjoint supports score 1e6") {
    import org.apache.spark.sql.functions.col
    val same = Seq((1L, "a"), (2L, "a"), (1L, "b"), (2L, "b")).toDF("v", "g")
    assert(Drift.ksDrift(same, col("v"), col("g"), "a", "b")
      .as[(Long, Long, Long, Long)].collect().head._3 === 0L)
    val disjoint = Seq((1L, "a"), (2L, "a"), (10L, "b"), (11L, "b")).toDF("v", "g")
    assert(Drift.ksDrift(disjoint, col("v"), col("g"), "a", "b")
      .as[(Long, Long, Long, Long)].collect().head._3 === 1000000L)
  }
}
