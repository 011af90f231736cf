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
}
