package graft

import graft.exec.StreamingStatementRunner
import graft.sources.{TopicConf, Topics}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.types._

final case class VsRow(k: String, grp: String, amt: Double)

/** Retractable min/max and exact DISTINCT aggregates over changelog
  * drivers (round 14, closing the last rejected foldable shapes): a
  * per-(group, value) net-count multiset rides a helper topic next to
  * the target (Flink's retractable MIN/MAX and exact distinct
  * aggregates keep the same state), merged per batch with the same
  * replay-idempotent offset discipline as the main merge path, and the
  * stats are RECOMPUTED over live values for the touched groups. */
class ValueSetAggSpec extends SparkSpec {
  import spark.implicits._

  private def newConf(tag: String): TopicConf =
    TopicConf(java.nio.file.Files.createTempDirectory(s"graft-$tag").toString)

  private val srcSchema = StructType(Seq(
    StructField("k", StringType), StructField("grp", StringType),
    StructField("amt", DoubleType)))

  private def runner(conf: TopicConf, src: String, aggSelect: String): StreamingStatementRunner = {
    val r = new StreamingStatementRunner(spark, topicConf = Some(conf))
    r.registerTopicSource(src, srcSchema)
    r.runScript(s"""
      CREATE TABLE vs_acct (k STRING, grp STRING, amt DOUBLE, __op STRING,
        PRIMARY KEY (k) NOT ENFORCED) DISTRIBUTED INTO 1 BUCKETS;
      INSERT INTO vs_acct
      SELECT k, grp, amt, CASE WHEN grp = 'DEL' THEN '-D' ELSE '+U' END FROM $src;
      $aggSelect""")
    r
  }

  test("retractable min/max over an upsert driver: retracting the current min recomputes from the rest") {
    val conf = newConf("vs-minmax")
    val r = runner(conf, "vs_src1", """
      CREATE TABLE vs_extremes (grp STRING, n BIGINT, min_amt DOUBLE, max_amt DOUBLE,
        PRIMARY KEY (grp) NOT ENFORCED) DISTRIBUTED INTO 1 BUCKETS;
      INSERT INTO vs_extremes
      SELECT grp, count(*) AS n, min(amt) AS min_amt, max(amt) AS max_amt
      FROM vs_acct GROUP BY grp""")
    def state() = spark.table("vs_extremes")
      .as[(String, Long, Double, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap

    Topics.appendJson(Seq(VsRow("k1", "g1", 10.0), VsRow("k2", "g1", 20.0),
      VsRow("k3", "g1", 30.0)).toDF(), "vs_src1", conf, Nil, 1)
    r.processAllAvailable()
    assert(state() === Map("g1" -> ((3L, 10.0, 30.0))))

    // k1 held the MIN — its revision must force a recompute to 20,
    // which a naive min-merge (min of old-min and new values) cannot do
    Topics.appendJson(Seq(VsRow("k1", "g1", 25.0)).toDF(), "vs_src1", conf, Nil, 2)
    r.processAllAvailable()
    assert(state() === Map("g1" -> ((3L, 20.0, 30.0))),
      "retracting the current min must recompute from the remaining values")

    // tombstone k3 (the MAX holder)
    Topics.appendJson(Seq(VsRow("k3", "DEL", 0.0)).toDF(), "vs_src1", conf, Nil, 3)
    r.processAllAvailable()
    assert(state() === Map("g1" -> ((2L, 20.0, 25.0))))

    // k2 moves to g2: g1 keeps only k1
    Topics.appendJson(Seq(VsRow("k2", "g2", 5.0)).toDF(), "vs_src1", conf, Nil, 4)
    r.processAllAvailable()
    assert(state() === Map("g1" -> ((1L, 25.0, 25.0)), "g2" -> ((1L, 5.0, 5.0))))
    r.stopAll()
  }

  test("exact count/sum(DISTINCT) over an upsert driver: a duplicated value survives until its LAST holder leaves") {
    val conf = newConf("vs-distinct")
    val r = runner(conf, "vs_src2", """
      CREATE TABLE vs_distinct (grp STRING, n_vals BIGINT, sum_vals DOUBLE,
        PRIMARY KEY (grp) NOT ENFORCED) DISTRIBUTED INTO 1 BUCKETS;
      INSERT INTO vs_distinct
      SELECT grp, count(DISTINCT amt) AS n_vals,
             sum(DISTINCT amt) AS sum_vals
      FROM vs_acct GROUP BY grp""")
    def state() = spark.table("vs_distinct")
      .as[(String, Long, Double)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap

    // k1 and k2 both hold amt=10 — one distinct value
    Topics.appendJson(Seq(VsRow("k1", "g1", 10.0), VsRow("k2", "g1", 10.0),
      VsRow("k3", "g1", 30.0)).toDF(), "vs_src2", conf, Nil, 1)
    r.processAllAvailable()
    assert(state() === Map("g1" -> ((2L, 40.0))))

    // k1 revises to 20: 10 is STILL held by k2 — distinct {10,20,30}
    Topics.appendJson(Seq(VsRow("k1", "g1", 20.0)).toDF(), "vs_src2", conf, Nil, 2)
    r.processAllAvailable()
    assert(state() === Map("g1" -> ((3L, 60.0))),
      "a duplicated value must survive while another key still holds it")

    // k2 revises to 20 too: now 10 has no holder — distinct {20,30}
    Topics.appendJson(Seq(VsRow("k2", "g1", 20.0)).toDF(), "vs_src2", conf, Nil, 3)
    r.processAllAvailable()
    assert(state() === Map("g1" -> ((2L, 50.0))))
    r.stopAll()
  }

  test("exact streaming count(DISTINCT) over an external stream (no native Spark form)") {
    implicit val sqlCtx = spark.sqlContext
    val orders = MemoryStream[SOrd]
    orders.toDF().createOrReplaceTempView("vs_orders_s")
    val r = new StreamingStatementRunner(spark, topicConf = Some(newConf("vs-ext")))
    r.run("""CREATE TABLE vs_cust_counts (product_id STRING, n_cust BIGINT,
             PRIMARY KEY (product_id) NOT ENFORCED) DISTRIBUTED INTO 1 BUCKETS""")
    r.run("""INSERT INTO vs_cust_counts
             SELECT product_id, count(DISTINCT customer_id) AS n_cust
             FROM vs_orders_s GROUP BY product_id""")
    orders.addData(SOrd(1, "p1", "c1"), SOrd(2, "p1", "c2"), SOrd(3, "p2", "c1"))
    r.processAllAvailable()
    assert(spark.table("vs_cust_counts").as[(String, Long)].collect().toMap
      === Map("p1" -> 2L, "p2" -> 1L))
    // a repeat customer in a LATER batch must not inflate the count
    orders.addData(SOrd(4, "p1", "c1"), SOrd(5, "p1", "c3"))
    r.processAllAvailable()
    assert(spark.table("vs_cust_counts").as[(String, Long)].collect().toMap
      === Map("p1" -> 3L, "p2" -> 1L),
      "cross-batch duplicate values must not re-count")
    r.stopAll()
  }

  test("avg(DISTINCT) and guards: timestamp multiset values reject with guidance") {
    implicit val sqlCtx = spark.sqlContext
    val orders = MemoryStream[SOrd]
    orders.toDF().createOrReplaceTempView("vs_avg_s")
    val r = new StreamingStatementRunner(spark, topicConf = Some(newConf("vs-avg")))
    r.run("""CREATE TABLE vs_avg_out (product_id STRING, avg_cust DOUBLE,
             PRIMARY KEY (product_id) NOT ENFORCED) DISTRIBUTED INTO 1 BUCKETS""")
    r.run("""INSERT INTO vs_avg_out
             SELECT product_id, avg(DISTINCT order_id) AS avg_cust
             FROM vs_avg_s GROUP BY product_id""")
    orders.addData(SOrd(2, "p1", "c1"), SOrd(2, "p1", "c2"), SOrd(4, "p1", "c3"))
    r.processAllAvailable()
    assert(spark.table("vs_avg_out").as[(String, Double)].collect().toMap
      === Map("p1" -> 3.0)) // distinct {2, 4} → avg 3
    r.stopAll()
  }
}
