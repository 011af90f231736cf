package graft

import graft.operators.Bucketing
import org.apache.spark.sql.functions._

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("same-bucketed tables join without a shuffle exchange") {
    val left = spark.range(1000).select($"id".as("k"), ($"id" * 2).as("lv"))
    val right = spark.range(500).select($"id".as("k"), ($"id" + 7).as("rv"))
    Bucketing.writeBucketed(left, "bk_left", "k", 4)
    Bucketing.writeBucketed(right, "bk_right", "k", 4)
    try {
      // force a non-broadcast join so the exchange question is real
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.bucketedJoin(spark, "bk_left", "bk_right", "k")
      assert(Bucketing.isShuffleFree(joined),
        s"expected no exchange:\n${joined.queryExecution.executedPlan}")
      assert(joined.count() === 500)
      // contrast: the same join over unbucketed data DOES shuffle
      val unbucketed = left.join(right, "k")
      assert(!Bucketing.isShuffleFree(unbucketed))
      // aggregation on the bucket key is exchange-free too
      val agg = spark.table("bk_left").groupBy("k").agg(sum($"lv"))
      assert(Bucketing.isShuffleFree(agg))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS bk_left")
      spark.sql("DROP TABLE IF EXISTS bk_right")
    }
  }
}
