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

  /** Key-skew diagnostic — the profile that decides WHETHER the salted
    * paths above (or a broadcast, or AQE skew hints) are needed before
    * a groupBy/join ships to the cluster: exact order statistics (p50/
    * p99/max) of the per-key row count, plus the hot key's share of all
    * rows. A max_n far above p99_n, or a top share in whole percents,
    * is the one-reducer-melts signal.
    *
    * The order statistics are EXACT lower order stats (value at rank
    * ⌈q·n_keys⌉ — integers, no interpolation, no engine-specific
    * percentile sketch), computed from the COUNT-OF-COUNTS frame: the
    * multiset of per-key counts compresses to (count → how many keys
    * have it), whose size is the number of DISTINCT load levels — tiny
    * even when |keys| is corpus-scale — so the cumulative rank window
    * runs over a bounded frame, never over |keys| rows. Top share is
    * the shifted half-up intDiv micro.
    *
    * Scale shape: one combinable shuffle to |keys| (the groupBy being
    * diagnosed — unavoidable and linear), one combinable fold to the
    * count-of-counts frame, then window + aggregate over that bounded
    * frame. Output: one row (n_keys, n_rows, max_n, p50_n, p99_n,
    * top_share_micro). */
  def keySkewProfile(df: DataFrame, keyCols: Column*): DataFrame = {
    import graft.expressions.HashExpressions.intDiv
    import org.apache.spark.sql.expressions.Window
    require(keyCols.nonEmpty)
    val perKey = df.groupBy(keyCols: _*).agg(count(lit(1)).as("__n"))
    val cc = perKey.groupBy("__n").agg(count(lit(1)).as("__k"))
    val wCum = Window.orderBy("__n").rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy()
    val ranked = cc
      .withColumn("__cum", sum("__k").over(wCum))
      .withColumn("__keys", sum("__k").over(wAll))
      .withColumn("__rows", sum(col("__n") * col("__k")).over(wAll))
    // ⌈q·n⌉ as exact integers: (q_num·n + q_den − 1) div q_den
    def atRank(num: Long, den: Long) = min(when(
      col("__cum") * den >= col("__keys") * num, col("__n")))
    ranked.agg(
        max("__keys").as("n_keys"), max("__rows").as("n_rows"),
        max("__n").as("max_n"),
        atRank(1L, 2L).as("p50_n"), atRank(99L, 100L).as("p99_n"))
      .select(col("n_keys"), col("n_rows"), col("max_n"),
        col("p50_n"), col("p99_n"),
        // widened: the skew card's POINT is extreme keys — row masses
        // at 100 TB wrap the 2e6-scaled Long numerator
        intDiv(col("max_n").cast("decimal(38,0)") * lit(2000000L)
            + col("n_rows").cast("decimal(38,0)"),
          lit(2L) * col("n_rows").cast("decimal(38,0)"))
          .cast("long").as("top_share_micro"))
  }
}
