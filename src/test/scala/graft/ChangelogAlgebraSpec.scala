package graft

import graft.operators.ChangelogOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Property-style invariants of the changelog algebra (SURVEY.md §5
  * item 3) over seeded-random changelogs: materialization must be
  * incremental-consistent, idempotent, and retraction must annihilate.
  */
class ChangelogAlgebraSpec extends SparkSpec {
  import spark.implicits._

  private def randomChangelog(seed: Int, n: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { i =>
      (rnd.nextInt(8).toLong, i.toLong, rnd.nextInt(1000), rnd.nextInt(100) / 10.0)
    }.toDF("key", "seq", "payload", "value")
  }

  test("incremental consistency: latest(all) == latest(latest(prefix) ∪ suffix)") {
    (1 to 10).foreach { seed =>
      val full = randomChangelog(seed, 200)
      val prefix = full.where($"seq" <= 120)
      val suffix = full.where($"seq" > 120)
      val direct = ChangelogOps.latestByKey(full, Seq("key"), Seq("seq"))
      val incremental = ChangelogOps.latestByKey(
        ChangelogOps.latestByKey(prefix, Seq("key"), Seq("seq")).unionByName(suffix),
        Seq("key"), Seq("seq"))
      assert(direct.except(incremental).isEmpty && incremental.except(direct).isEmpty,
        s"seed=$seed")
    }
  }

  test("idempotence: latest(latest(x)) == latest(x); first(first(x)) == first(x)") {
    (1 to 5).foreach { seed =>
      val x = randomChangelog(seed, 150)
      val l1 = ChangelogOps.latestByKey(x, Seq("key"), Seq("seq"))
      val l2 = ChangelogOps.latestByKey(l1, Seq("key"), Seq("seq"))
      assert(l1.except(l2).isEmpty && l2.except(l1).isEmpty, s"seed=$seed latest")
      val f1 = ChangelogOps.firstByKey(x, Seq("key"), Seq("seq"))
      val f2 = ChangelogOps.firstByKey(f1, Seq("key"), Seq("seq"))
      assert(f1.except(f2).isEmpty && f2.except(f1).isEmpty, s"seed=$seed first")
    }
  }

  test("annihilation: inserting then retracting every row materializes to nothing") {
    (1 to 5).foreach { seed =>
      val x = randomChangelog(seed, 100)
      val inserts = x.withColumn("op", lit(1))
      val retracts = x.withColumn("op", lit(-1))
      val out = ChangelogOps.materializeRetract(
        inserts.unionByName(retracts), "op", Seq("key"), Seq("value"))
      assert(out.isEmpty, s"seed=$seed")
    }
  }

  test("retract partial: net state equals the un-retracted remainder") {
    (1 to 5).foreach { seed =>
      val x = randomChangelog(seed, 100)
      val retracted = x.where($"seq" % 3 === 0)
      val changelog = x.withColumn("op", lit(1))
        .unionByName(retracted.withColumn("op", lit(-1)))
      val got = ChangelogOps.materializeRetract(changelog, "op", Seq("key"), Seq("value"))
        .select($"key", $"net_count")
      val expected = x.where($"seq" % 3 =!= 0)
        .groupBy($"key").agg(count(lit(1)).as("net_count"))
      assert(got.except(expected).isEmpty && expected.except(got).isEmpty, s"seed=$seed")
    }
  }
}
