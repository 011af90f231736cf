package graft

import graft.sources.AvroCodec

class AvroCodecSpec extends SparkSpec {
  import spark.implicits._

  // ORDERS-quickstart-shaped schema incl. a nested record (FIXTURES.md §A1)
  private val ordersSchema =
    """{"type":"record","name":"orders","fields":[
       {"name":"ordertime","type":"long"},
       {"name":"orderid","type":"int"},
       {"name":"itemid","type":"string"},
       {"name":"orderunits","type":"double"},
       {"name":"address","type":{"type":"record","name":"addr","fields":[
         {"name":"city","type":"string"},
         {"name":"state","type":["null","string"],"default":null},
         {"name":"zipcode","type":"long"}]}}]}"""

  test("decodeAvro round-trips the ORDERS quickstart shape incl. nested record and nullable union") {
    val recs = Seq(
      Map("ordertime" -> 1700000000000L, "orderid" -> 1, "itemid" -> "item_1",
        "orderunits" -> 3.5,
        "address" -> Map("city" -> "Berlin", "state" -> "BE", "zipcode" -> 10115L)),
      Map("ordertime" -> 1700000001000L, "orderid" -> 2, "itemid" -> "item_2",
        "orderunits" -> 1.0,
        "address" -> Map("city" -> "Austin", "state" -> null, "zipcode" -> 73301L)))
    val frames = recs.zipWithIndex.map { case (r, i) =>
      (s"key$i", AvroCodec.encodeRecord(ordersSchema, r))
    }
    val df = frames.toDF("key", "value")
    val decoded = AvroCodec.decodeAvro(df, "value", ordersSchema)
    assert(decoded.columns.toSeq ===
      Seq("key", "ordertime", "orderid", "itemid", "orderunits", "address"))
    val rows = decoded.orderBy("orderid").collect()
    assert(rows(0).getAs[Long]("ordertime") === 1700000000000L)
    assert(rows(0).getAs[String]("itemid") === "item_1")
    val addr0 = rows(0).getStruct(rows(0).fieldIndex("address"))
    assert(addr0.getAs[String]("city") === "Berlin")
    assert(addr0.getAs[Long]("zipcode") === 10115L)
    val addr1 = rows(1).getStruct(rows(1).fieldIndex("address"))
    assert(addr1.isNullAt(addr1.fieldIndex("state"))) // nullable union
    // key column carried through untouched
    assert(rows.map(_.getAs[String]("key")).toSeq === Seq("key0", "key1"))
  }

  test("schema subjects registry: inference = subject lookup") {
    val reg = new AvroCodec.SchemaSubjects
    reg.register("orders-value", ordersSchema)
    assert(reg.lookup("orders-value").isDefined)
    assert(reg.lookup("missing").isEmpty)
    val spark2 = spark
    val sparkType = AvroCodec.toSparkType(
      new org.apache.avro.Schema.Parser().parse(reg.lookup("orders-value").get))
    assert(sparkType.asInstanceOf[org.apache.spark.sql.types.StructType]
      .fieldNames.toSeq ===
      Seq("ordertime", "orderid", "itemid", "orderunits", "address"))
  }
}
