package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities — the manual fallbacks for when AQE's
  * runtime skew handling isn't available (streaming state, custom
  * operators) or a key is hot enough to melt a single reducer at
  * 100 TB.
  *
  *  - `saltedAggregate`: two-phase aggregation — phase 1 groups on
  *    (keys, salt) spreading each hot key over `salts` reducers, phase 2
  *    merges the partials. Works for any algebraic aggregate
  *    (sum/count/min/max).
  *  - `saltedJoin`: replicates the (small) build side `salts`× and
  *    salts the probe side deterministically by row content, so one hot
  *    join key fans across `salts` tasks instead of one.
  *
  * Salt is `pmod(xxhash64(content), salts)` — deterministic, so results
  * are reproducible and partitioning-independent (same property as
  * `Sampling.deterministicSample`).
  */
object SkewOps {

  /** Two-phase count+sum per key. `valueCols` are decimal-summed (exact,
    * merge-safe). */
  def saltedAggregate(df: DataFrame, keys: Seq[String], valueCols: Seq[String],
                      salts: Int, saltSource: Column): DataFrame = {
    val salted = df.withColumn("__salt", pmod(xxhash64(saltSource), lit(salts)))
    val partials = count(lit(1)).as("__n") +:
      valueCols.map(c => sum(col(c).cast("decimal(18,4)")).as(s"__sum_$c"))
    val phase1 = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partials.head, partials.tail: _*)
    val merges = sum(col("__n")).cast("long").as("n") +:
      valueCols.map(c => sum(col(s"__sum_$c")).cast("double").as(s"sum_$c"))
    phase1
      .groupBy(keys.map(col): _*)
      .agg(merges.head, merges.tail: _*)
  }

  /** Inner equi-join with a salted probe side and a `salts`×-replicated
    * build side. `probe` may be arbitrarily skewed on `key`; `build`
    * must be small enough to replicate (it usually is — that's why the
    * skew hurts: many probe rows per build key). */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
                 salts: Int, probeSalt: Column): DataFrame = {
    val p = probe.withColumn("__salt", pmod(xxhash64(probeSalt), lit(salts)))
    val b = build.withColumn("__salt",
      explode(sequence(lit(0L), lit((salts - 1).toLong))))
    p.join(b, Seq(key, "__salt")).drop("__salt")
  }
}
