package graft.sources

import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicLong

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SaveMode}
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider,
  DataSourceRegister, RelationProvider, TableScan}
import org.apache.spark.sql.types._

/** In-process stand-in for a Kafka broker (test scope only, NOT
  * testcontainers): an in-memory topic → record-log store plus a
  * DataSource V1 provider REGISTERED UNDER THE SHORT NAME `kafka`
  * (`META-INF/services/org.apache.spark.sql.sources.DataSourceRegister`
  * in test resources), so `graft.sources.Topics`' REAL `kafka`
  * transport branch — `spark.read/write.format("kafka")` with the
  * bootstrap/subscribe/offset options — resolves here verbatim in an
  * environment with no broker and no spark-sql-kafka jars. The test
  * double asserts the OPTION WIRING and the record-shape contract; on
  * a real cluster the same branch hits the Confluent-documented
  * connector with identical options.
  *
  * Fidelity notes:
  *  - the relation's schema is the Kafka source's 7-column projection
  *    (key, value, topic, partition, offset, timestamp, timestampType);
  *    `Topics` selects its 6-column record shape from it, exactly as
  *    it would from the real source;
  *  - like a real broker, the WRITE path accepts only (key, value)
  *    and the broker assigns partition/offset/timestamp — monotone
  *    offsets per topic;
  *  - every read/write/stream-schema call captures its full option map
  *    for assertion.
  */
object StubKafkaBroker {
  final case class Rec(key: Array[Byte], value: Array[Byte], topic: String,
                       partition: Int, offset: Long, timestamp: Timestamp)

  private val log = mutable.Map.empty[String, mutable.ArrayBuffer[Rec]]
  private val nextOffset = mutable.Map.empty[String, AtomicLong]
  @volatile var lastReadOptions: Map[String, String] = Map.empty
  @volatile var lastWriteOptions: Map[String, String] = Map.empty
  @volatile var lastStreamOptions: Map[String, String] = Map.empty

  def reset(): Unit = synchronized {
    log.clear(); nextOffset.clear()
    lastReadOptions = Map.empty; lastWriteOptions = Map.empty
    lastStreamOptions = Map.empty
  }

  def append(topic: String, key: Array[Byte], value: Array[Byte]): Unit =
    synchronized {
      val off = nextOffset.getOrElseUpdate(topic, new AtomicLong(0)).getAndIncrement()
      log.getOrElseUpdate(topic, mutable.ArrayBuffer.empty) +=
        Rec(key, value, topic, 0, off, new Timestamp(System.currentTimeMillis()))
    }

  def records(topic: String): Seq[Rec] = synchronized {
    log.getOrElse(topic, mutable.ArrayBuffer.empty).toSeq
  }

  /** The real Kafka batch/stream source's fixed output schema. */
  val kafkaSchema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType)))
}

/** The service-loaded provider behind `format("kafka")` in tests. */
class StubKafkaSourceProvider extends RelationProvider
    with CreatableRelationProvider
    with org.apache.spark.sql.sources.StreamSourceProvider
    with DataSourceRegister {
  import StubKafkaBroker._

  override def shortName(): String = "kafka"

  private def relationFor(ctx: SQLContext, topic: String): BaseRelation =
    new BaseRelation with TableScan {
      override def sqlContext: SQLContext = ctx
      override def schema: StructType = kafkaSchema
      override def buildScan(): RDD[Row] = {
        val rows = records(topic).map(r =>
          Row(r.key, r.value, r.topic, r.partition, r.offset, r.timestamp, 0))
        ctx.sparkContext.parallelize(rows, math.max(1, rows.size.min(4)))
      }
    }

  // batch read: spark.read.format("kafka").option("subscribe", t).load()
  override def createRelation(ctx: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    lastReadOptions = parameters
    val topic = parameters.getOrElse("subscribe",
      sys.error("stub kafka: 'subscribe' option is required"))
    relationFor(ctx, topic)
  }

  // batch write: df.select(key, value).write.format("kafka").save()
  override def createRelation(ctx: SQLContext, mode: SaveMode,
                              parameters: Map[String, String],
                              data: DataFrame): BaseRelation = {
    lastWriteOptions = parameters
    val topic = parameters.getOrElse("topic",
      sys.error("stub kafka: 'topic' option is required"))
    // broker-side assignment: accept ONLY key/value from the producer
    data.select("key", "value").collect()
      .foreach(r => append(topic, r.getAs[Array[Byte]](0), r.getAs[Array[Byte]](1)))
    relationFor(ctx, topic)
  }

  // streaming read schema: spark.readStream.format("kafka")...load()
  // calls this eagerly — enough to verify the stream branch's option
  // wiring and schema without running a query
  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) = {
    lastStreamOptions = parameters
    ("stub-kafka", kafkaSchema)
  }

  override def createSource(ctx: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): org.apache.spark.sql.execution.streaming.Source =
    throw new UnsupportedOperationException(
      "stub kafka broker supports batch read/write and stream schema only")
}
