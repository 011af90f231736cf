package graft

import graft.exec.StreamingStatementRunner
import graft.sources.{TopicConf, Topics}
import org.apache.spark.sql.types._

/** Randomized soak of the merge-on-write aggregate engine (round 19,
  * companion to RegularJoinFuzzSpec): seeded random upsert/revision/
  * tombstone schedules over a keyed account table drive a continuous
  * aggregate combining the sum-decomposable raws (count/sum), the
  * retractable order statistics (min/max), and the value-multiset
  * shapes (count(DISTINCT), exact percentile) — then every drain's
  * final state is compared against an EXACT driver-side oracle over
  * the latest-per-key state: groups must enter, revise, and LEAVE
  * (empty group ⇒ row deleted downstream) precisely.
  *
  * Amounts are small integers as doubles, so sums are exact and the
  * median's 0.5 interpolation is dyadic — bit-exact comparison, no
  * rounding. Deterministic seeds; failures replay exactly. */
class MergeAggFuzzSpec extends SparkSpec {
  import spark.implicits._

  (0 until 4).foreach { idx =>
    test(s"fuzz: retractable count/sum/min/max/distinct/median over a random upsert schedule (seed $idx)") {
      val rnd = new scala.util.Random(4242 + idx * 13)
      val tag = s"mafz$idx"
      val conf = TopicConf(
        java.nio.file.Files.createTempDirectory(s"graft-$tag").toString)
      val r = new StreamingStatementRunner(spark, topicConf = Some(conf))
      r.registerTopicSource(s"${tag}_feed", StructType(Seq(
        StructField("k", StringType), StructField("grp", StringType),
        StructField("amt", DoubleType), StructField("__op", StringType))))
      r.runScript(s"""
        CREATE TABLE ${tag}_acct (k STRING, grp STRING, amt DOUBLE, __op STRING,
          PRIMARY KEY (k) NOT ENFORCED) DISTRIBUTED INTO 1 BUCKETS;
        INSERT INTO ${tag}_acct SELECT k, grp, amt, __op FROM ${tag}_feed;
        CREATE TABLE ${tag}_out (grp STRING, n BIGINT, s DOUBLE,
          mn DOUBLE, mx DOUBLE, nd BIGINT, p50 DOUBLE,
          PRIMARY KEY (grp) NOT ENFORCED) DISTRIBUTED INTO 1 BUCKETS;
        INSERT INTO ${tag}_out
        SELECT grp, count(*) AS n, sum(amt) AS s, min(amt) AS mn,
               max(amt) AS mx, count(DISTINCT amt) AS nd,
               percentile(amt, 0.5) AS p50
        FROM ${tag}_acct GROUP BY grp""")

      val keys = (1 to 8).map(i => s"k$i")
      val groups = Seq("g1", "g2", "g3")
      val state = scala.collection.mutable.Map.empty[String, (String, Double)]
      var epoch = 0

      def expected(): Map[String, (Long, Double, Double, Double, Long, Double)] =
        state.values.groupBy(_._1).map { case (g, vs) =>
          val xs = vs.map(_._2).toSeq.sorted
          val n = xs.size
          // Spark's exact Percentile: rank (n-1)·p, linear interpolation
          val rank = (n - 1) * 0.5
          val lo = rank.toInt
          val frac = rank - lo
          val p50 =
            if (frac == 0.0) xs(lo)
            else xs(lo) + (xs(lo + 1) - xs(lo)) * frac
          g -> ((n.toLong, xs.sum, xs.min, xs.max,
            xs.distinct.size.toLong, p50))
        }

      def actual(): Map[String, (Long, Double, Double, Double, Long, Double)] =
        spark.table(s"${tag}_out")
          .as[(String, Long, Double, Double, Double, Long, Double)]
          .collect().map(t => t._1 -> ((t._2, t._3, t._4, t._5, t._6, t._7)))
          .toMap

      (0 until 5).foreach { _ =>
        // distinct keys per feed batch (intra-batch revision order of
        // one key is undefined through the JSON staging)
        val ks = rnd.shuffle(keys.toList).take(1 + rnd.nextInt(4))
        val rows = ks.map { k =>
          if (state.contains(k) && rnd.nextInt(4) == 0) {
            state.remove(k); (k, "g1", 0.0, "-D")
          } else {
            val g = groups(rnd.nextInt(groups.size))
            val amt = (1 + rnd.nextInt(6)).toDouble // small ints: exact
            state(k) = (g, amt); (k, g, amt, "+U")
          }
        }
        epoch += 1
        Topics.appendJson(rows.toDF("k", "grp", "amt", "__op"),
          s"${tag}_feed", conf, Nil, epoch)
        r.processAllAvailable()
        assert(actual() === expected(),
          s"[seed $idx, epoch $epoch] merged state diverged from the " +
            s"latest-per-key oracle\n  state: $state")
      }
      r.stopAll()
    }
  }
}
