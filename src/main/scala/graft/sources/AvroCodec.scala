package graft.sources

import java.io.ByteArrayOutputStream

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Avro wire-format decode/encode for binary value columns — the
  * reference's "Avro + Schema Registry" source path
  * (`output.data.format = "AVRO"`, `terraform/lab-tables/main.tf:173`;
  * SR cluster `:29-40`) without a connector dependency: built directly
  * on avro-core, driven by a schema held in the engine catalog (the
  * Schema Registry stand-in — see `SchemaSubjects`).
  *
  * Decode runs in `mapPartitions`: reader/decoder instances are created
  * once per partition and reused per record (BinaryDecoder reuse), the
  * per-record cost is one datum read + one Row build. Supported Avro
  * types = the quickstart surface (SURVEY.md §1.3): primitives,
  * nullable unions, nested records.
  */
object AvroCodec {

  /** subject → schema JSON: the in-memory [[SchemaRegistryClient]] —
    * the engine-catalog stand-in for a live Schema Registry (a REST
    * implementation of the same trait is the env-limited seam, one
    * class away — see `SchemaRegistry.scala`).
    *
    * Assigns GLOBAL schema ids with Schema Registry's semantics: an id
    * names a schema (not a subject) cluster-wide, so registering the
    * same schema text under two subjects yields ONE id, and the 4-byte
    * id in a framed record is resolvable without knowing which topic
    * it came from. Ids are what the Confluent wire format
    * (`wireFrame`/`unframe`) embeds after the 0x00 magic byte. */
  final class SchemaSubjects extends SchemaRegistryClient {
    private val subjects = scala.collection.concurrent.TrieMap.empty[String, String]
    private val idBySchema = scala.collection.concurrent.TrieMap.empty[String, Int]
    private val schemaById = scala.collection.concurrent.TrieMap.empty[Int, String]
    private val nextId = new java.util.concurrent.atomic.AtomicInteger(0)
    def register(subject: String, schemaJson: String): Int = {
      subjects(subject) = schemaJson
      val id = idBySchema.getOrElseUpdate(schemaJson, nextId.incrementAndGet())
      schemaById(id) = schemaJson
      id
    }
    def lookup(subject: String): Option[String] = subjects.get(subject)
    def idFor(subject: String): Option[Int] = subjects.get(subject).flatMap(idBySchema.get)
    def lookupById(id: Int): Option[String] = schemaById.get(id)
    /** Immutable id → schema snapshot — the SERIALIZABLE form the
      * framed-decode closure ships to executors (the registry itself is
      * driver-side mutable state and must not enter a closure). */
    def idSchemas: Map[Int, String] = schemaById.toMap
  }

  /** Confluent Schema Registry wire format: 1 magic byte (0x00) +
    * 4-byte big-endian schema id + Avro binary payload. This framing —
    * not bare Avro — is what every SR-backed topic carries
    * (`/root/reference/terraform/lab-tables/main.tf:29-40`,
    * `"output.data.format" = "AVRO"` at `:173`). */
  val WireMagic: Byte = 0x00
  private val WireHeaderLen = 5

  def wireFrame(schemaId: Int, payload: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](WireHeaderLen + payload.length)
    out(0) = WireMagic
    out(1) = (schemaId >>> 24).toByte
    out(2) = (schemaId >>> 16).toByte
    out(3) = (schemaId >>> 8).toByte
    out(4) = schemaId.toByte
    System.arraycopy(payload, 0, out, WireHeaderLen, payload.length)
    out
  }

  /** (schemaId, payloadOffset) if `bytes` carries the SR frame; None
    * for bare Avro. The magic byte alone is NOT proof of framing — a
    * bare record whose first field zigzag-encodes to 0 also starts
    * with 0x00 — so callers must additionally check the extracted id
    * against the registry before trusting the frame (what
    * `decodeAvro(_, _, _, idSchemas)` does). */
  def unframe(bytes: Array[Byte]): Option[(Int, Int)] =
    if (bytes != null && bytes.length >= WireHeaderLen && bytes(0) == WireMagic)
      Some((((bytes(1) & 0xff) << 24) | ((bytes(2) & 0xff) << 16) |
        ((bytes(3) & 0xff) << 8) | (bytes(4) & 0xff), WireHeaderLen))
    else None

  def toSparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.STRING => StringType
    case Schema.Type.INT => IntegerType
    case Schema.Type.LONG => LongType
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.BYTES => BinaryType
    case Schema.Type.RECORD =>
      StructType(s.getFields.asScala.map(f =>
        StructField(f.name(), toSparkType(f.schema()), nullable = true)).toSeq)
    case Schema.Type.ARRAY => ArrayType(toSparkType(s.getElementType))
    case Schema.Type.UNION =>
      // nullable union [null, T] → T (nullable); other unions unsupported
      val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1, s"unsupported union: $s")
      toSparkType(nonNull.head)
    case other => throw new IllegalArgumentException(s"unsupported avro type: $other")
  }

  private def toRowValue(v: Any, s: Schema): Any = v match {
    case null => null
    case u: org.apache.avro.util.Utf8 => u.toString
    case r: GenericRecord =>
      val rs = resolveNonNull(s)
      Row.fromSeq(rs.getFields.asScala.map(f =>
        toRowValue(r.get(f.pos()), f.schema())).toSeq)
    case b: java.nio.ByteBuffer =>
      val arr = new Array[Byte](b.remaining()); b.duplicate().get(arr); arr
    case l: java.util.Collection[_] =>
      val es = resolveNonNull(s).getElementType
      l.asScala.map(toRowValue(_, es)).toSeq
    case other => other
  }

  private def resolveNonNull(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION)
      s.getTypes.asScala.find(_.getType != Schema.Type.NULL).get
    else s

  /** Decode a binary Avro value column into typed columns; key columns
    * (everything except `valueCol`) are carried through.
    *
    * Accepts BOTH bare Avro and Confluent-SR-framed records: a record
    * is treated as framed iff it starts with the 0x00 magic byte AND
    * its 4-byte schema id is present in `idSchemas` (the magic byte
    * alone is ambiguous — see [[unframe]]). Framed records decode with
    * their WRITER schema (resolved per record by id) projected onto
    * `schemaJson` as the READER schema, so a topic whose producer
    * evolved the schema mid-log still yields one fixed output shape —
    * Schema Registry consumer semantics. With `idSchemas` empty every
    * record is bare Avro (the pre-SR behavior, unchanged). */
  def decodeAvro(df: DataFrame, valueCol: String, schemaJson: String,
                 idSchemas: Map[Int, String] = Map.empty): DataFrame = {
    val carried = df.schema.fields.filter(_.name != valueCol)
    val valueStruct = toSparkType(new Schema.Parser().parse(schemaJson))
      .asInstanceOf[StructType]
    val outSchema = StructType(carried ++ valueStruct.fields)
    val carriedIdx = carried.map(f => df.schema.fieldIndex(f.name))
    val valueIdx = df.schema.fieldIndex(valueCol)
    val enc = Encoders.row(outSchema)
    df.mapPartitions { rows =>
      // per-partition init: schema parse + one reusable reader per
      // writer schema (readers are stateful w.r.t. schema resolution,
      // so framed logs with k historical schema versions hold k reader
      // instances — k is small by construction)
      val readerSchema = new Schema.Parser().parse(schemaJson)
      val bareReader = new GenericDatumReader[GenericRecord](readerSchema)
      val framedReaders = scala.collection.mutable.Map.empty[Int, GenericDatumReader[GenericRecord]]
      var decoder: org.apache.avro.io.BinaryDecoder = null
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](valueIdx)
        val (reader, off) = unframe(bytes) match {
          case Some((id, o)) if idSchemas.contains(id) =>
            (framedReaders.getOrElseUpdate(id, new GenericDatumReader[GenericRecord](
              new Schema.Parser().parse(idSchemas(id)), readerSchema)), o)
          case _ => (bareReader, 0)
        }
        decoder = DecoderFactory.get().binaryDecoder(bytes, off, bytes.length - off, decoder)
        val rec = reader.read(null, decoder)
        val decoded = readerSchema.getFields.asScala.map(f =>
          toRowValue(rec.get(f.pos()), f.schema()))
        Row.fromSeq(carriedIdx.map(row.get).toSeq ++ decoded)
      }
    }(enc)
  }

  /** Test/sink-side helper: encode rows of `struct` columns to Avro
    * binary per the schema. Field order follows the schema. */
  def encodeRecord(schemaJson: String, values: Map[String, Any]): Array[Byte] = {
    val schema = new Schema.Parser().parse(schemaJson)
    val rec = new GenericData.Record(schema)
    schema.getFields.asScala.foreach { f =>
      rec.put(f.name(), values.getOrElse(f.name(), null) match {
        case s: String => new org.apache.avro.util.Utf8(s)
        case m: Map[_, _] =>
          val sub = resolveNonNull(f.schema())
          val subRec = new GenericData.Record(sub)
          m.asInstanceOf[Map[String, Any]].foreach { case (k, v) =>
            subRec.put(k, v match {
              case s: String => new org.apache.avro.util.Utf8(s)
              case o => o
            })
          }
          subRec
        case o => o
      })
    }
    val out = new ByteArrayOutputStream()
    val encoder = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, encoder)
    encoder.flush()
    out.toByteArray
  }

  /** Producer-side SR path: encode `values` under the subject's
    * registered schema and wrap in the wire frame. Fails loudly on an
    * unregistered subject — a producer without a registered schema has
    * no id to frame with, same as a real SR-backed producer. */
  def encodeFramedRecord(reg: SchemaRegistryClient, subject: String,
                         values: Map[String, Any]): Array[Byte] = {
    val schemaJson = reg.lookup(subject).getOrElse(
      throw new IllegalArgumentException(s"no schema registered for subject $subject"))
    wireFrame(reg.idFor(subject).get, encodeRecord(schemaJson, values))
  }
}
