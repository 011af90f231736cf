package graft

import org.apache.spark.sql.functions._

/** Approximate aggregates (SURVEY §2.3: distinct → approx variant at
  * scale): HLL++ must track exact counts within its error bound on the
  * fixture data. No DuckDB oracle (different sketch), so the exact
  * count is the oracle here. */
class ApproxAggSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct within 5% of exact on fixture columns") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    Seq("user_id", "event_type", "value").foreach { c =>
      val exact = ev.select(countDistinct(col(c))).as[Long].head()
      val approx = ev.select(approx_count_distinct(col(c), 0.02)).as[Long].head()
      assert(math.abs(approx - exact).toDouble / exact <= 0.05,
        s"$c: approx=$approx exact=$exact")
    }
  }

  test("approximate quantiles bracket the exact median") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val Array(q25, q50, q75) =
      li.stat.approxQuantile("l_extendedprice", Array(0.25, 0.5, 0.75), 0.01)
    assert(q25 < q50 && q50 < q75)
    val exactMedianBounds = li.select(col("l_extendedprice")).as[Double].collect().sorted
    val m = exactMedianBounds(exactMedianBounds.length / 2)
    assert(math.abs(q50 - m) / m < 0.05)
  }
}
