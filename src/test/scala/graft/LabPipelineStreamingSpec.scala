package graft

import graft.operators.ChangelogOps
import graft.streaming.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

final case class Cust(id: String, first_name: String, email: String, seq: Long)
final case class Prod(id: String, brand: String, sale_price: Int, seq: Long)
final case class Ord(order_id: Int, product_id: String, customer_id: String)

/** The reference's lab-aggregations pipeline (S1–S6) in STREAMING form,
  * structured exactly as the reference structures it — three separate
  * long-running statements (S2, S4, S6 are independent INSERTs; the
  * `depends_on` DAG orders their creation, not their data):
  *
  *  1. customers → upsert materialization (streaming latestByKey)
  *  2. products → upsert materialization
  *  3. orders ⋈ customers_keyed ⋈ products_keyed → enriched output,
  *     joined per micro-batch against the CURRENT materialized upsert
  *     state (foreachBatch snapshot join = Flink's processing-time
  *     temporal join against a versioned table's latest state; the
  *     statement runner's retract-target path upgrades this to the
  *     true regular join — see RegularJoinSpec).
  *
  * Differential: the streaming pipeline's final state must equal the
  * one-shot batch query over the final inputs — the dynamic-table
  * consistency contract (SURVEY.md §5 item 4).
  */
class LabPipelineStreamingSpec extends SparkSpec {
  import spark.implicits._

  test("S1-S6 streaming pipeline: micro-batch snapshot join equals batch oracle") {
    implicit val sqlCtx = spark.sqlContext

    val customers = MemoryStream[Cust]
    val products = MemoryStream[Prod]
    val orders = MemoryStream[Ord]

    // S1+S2 / S3+S4: upsert materialization in update mode → memory
    // sinks accumulate the update log; latest-by-key over the log IS the
    // keyed table's current state (compacted-topic materialization).
    val custQ = StreamOps.latestByKey[String, Cust](customers.toDS(), _.id,
        (a, b) => a.seq >= b.seq)
      .writeStream.format("memory").queryName("cust_log").outputMode("update").start()
    val prodQ = StreamOps.latestByKey[String, Prod](products.toDS(), _.id,
        (a, b) => a.seq >= b.seq)
      .writeStream.format("memory").queryName("prod_log").outputMode("update").start()

    // S6: per micro-batch, join arriving orders against the CURRENT
    // snapshot of both keyed tables.
    val enriched = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Int)]
    val ordQ = orders.toDS().writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[Ord], _: Long) =>
        val custState = ChangelogOps.latestByKey(
          spark.table("cust_log"), Seq("id"), Seq("seq"))
        val prodState = ChangelogOps.latestByKey(
          spark.table("prod_log"), Seq("id"), Seq("seq"))
        val out = batch.toDF()
          .join(custState, batch("customer_id") === custState("id"))
          .join(prodState, batch("product_id") === prodState("id"))
          .select($"order_id", $"first_name", $"brand", $"sale_price")
          .as[(Int, String, String, Int)].collect()
        enriched.synchronized { enriched ++= out }
        ()
      }.start()

    // epoch 1: initial dimension versions, two orders
    customers.addData(Cust("c1", "Ann", "a@x", 1), Cust("c2", "Bob", "b@x", 2))
    products.addData(Prod("p1", "nike", 120, 1), Prod("p2", "puma", 80, 2))
    custQ.processAllAvailable(); prodQ.processAllAvailable()
    orders.addData(Ord(1, "p1", "c1"))
    ordQ.processAllAvailable()

    // epoch 2: c1 changes name (upsert) — later orders must see the NEW version
    customers.addData(Cust("c1", "Anna", "a2@x", 3))
    custQ.processAllAvailable()
    orders.addData(Ord(2, "p2", "c1"), Ord(3, "p1", "c2"))
    ordQ.processAllAvailable()

    custQ.stop(); prodQ.stop(); ordQ.stop()

    val got = enriched.sortBy(_._1).toList
    assert(got === List(
      (1, "Ann", "nike", 120), // joined against version 1 of c1
      (2, "Anna", "puma", 80), // joined against the upserted version
      (3, "Bob", "nike", 120)))

    // differential vs the batch form over FINAL inputs for orders 2,3
    // (order 1 was intentionally enriched with the then-current version;
    // the batch query sees only final state). This spec pins the
    // SNAPSHOT (processing-time temporal) composition at the StreamOps
    // level; Flink's actual regular-join semantics — order 1 re-emitted
    // as "Anna" when c1 revises — is what the statement runner's
    // retract-target path now implements (round 16, startRegularJoin;
    // RegularJoinSpec + the q236 driver gate prove it)
    val finalCust = Seq(Cust("c1", "Anna", "a2@x", 3), Cust("c2", "Bob", "b@x", 2)).toDF()
    val finalProd = Seq(Prod("p1", "nike", 120, 1), Prod("p2", "puma", 80, 2)).toDF()
    val batchOracle = Seq(Ord(2, "p2", "c1"), Ord(3, "p1", "c2")).toDF()
      .join(finalCust, $"customer_id" === finalCust("id"))
      .join(finalProd, $"product_id" === finalProd("id"))
      .select($"order_id", $"first_name", $"brand", $"sale_price")
      .as[(Int, String, String, Int)].collect().sortBy(_._1).toList
    assert(got.filter(_._1 >= 2) === batchOracle)
  }
}
