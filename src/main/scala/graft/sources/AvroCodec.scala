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

  /** subject → schema JSON: the engine-catalog stand-in for Schema
    * Registry (schemas are *inferred* by looking up the subject). */
  final class SchemaSubjects {
    private val subjects = scala.collection.concurrent.TrieMap.empty[String, String]
    def register(subject: String, schemaJson: String): Unit = subjects(subject) = schemaJson
    def lookup(subject: String): Option[String] = subjects.get(subject)
  }

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
    * (everything except `valueCol`) are carried through. */
  def decodeAvro(df: DataFrame, valueCol: String, schemaJson: String): DataFrame = {
    val carried = df.schema.fields.filter(_.name != valueCol)
    val valueStruct = toSparkType(new Schema.Parser().parse(schemaJson))
      .asInstanceOf[StructType]
    val outSchema = StructType(carried ++ valueStruct.fields)
    val carriedIdx = carried.map(f => df.schema.fieldIndex(f.name))
    val valueIdx = df.schema.fieldIndex(valueCol)
    val enc = Encoders.row(outSchema)
    df.mapPartitions { rows =>
      // per-partition init: schema parse + reusable reader/decoder
      val schema = new Schema.Parser().parse(schemaJson)
      val reader = new GenericDatumReader[GenericRecord](schema)
      var decoder: org.apache.avro.io.BinaryDecoder = null
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](valueIdx)
        decoder = DecoderFactory.get().binaryDecoder(bytes, decoder)
        val rec = reader.read(null, decoder)
        val decoded = schema.getFields.asScala.map(f =>
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
}
