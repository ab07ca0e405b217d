package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import org.apache.avro.{Schema => AvroSchema}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

/**
 * Avro binary SerDe for the schema-registry surface (reference
 * SchemaType.AVRO — pulsar-client/.../schema/AvroSchema.java encodes
 * single records with the plain binary codec, no container file):
 * `avro_encode(struct, schemaJson)` / `avro_decode(binary, schemaJson)`
 * as Catalyst expressions over the real Avro runtime (avro-1.12 on the
 * Spark classpath), supporting the record shapes the envelope model
 * uses — flat records of boolean / int / long / float / double /
 * string / bytes and their `[null, T]` nullable unions. Field order
 * follows the AVRO schema (the wire format is positional); struct
 * fields are matched by NAME so column order in the plan is free.
 *
 * Scale notes: per-row en/decode through the datum reader/writer with
 * reused decoder instances; narrow, no shuffle — the same plumbing a
 * `from_avro` call would give, without requiring the external
 * spark-avro module.
 */
object AvroSerde {

  def avro_encode(struct: Column, schemaJson: String): Column =
    ColumnBridge.column(AvroEncodeExpr(ColumnBridge.expression(struct), schemaJson))

  def avro_decode(bytes: Column, schemaJson: String): Column =
    ColumnBridge.column(AvroDecodeExpr(ColumnBridge.expression(bytes), schemaJson))

  private[functions] def parse(json: String): AvroSchema =
    new AvroSchema.Parser().parse(json)

  /** The Catalyst type for an Avro field type (flat-record subset). */
  private[functions] def catalystType(s: AvroSchema): (DataType, Boolean) =
    s.getType match {
      case AvroSchema.Type.BOOLEAN => (BooleanType, false)
      case AvroSchema.Type.INT => (IntegerType, false)
      case AvroSchema.Type.LONG => (LongType, false)
      case AvroSchema.Type.FLOAT => (FloatType, false)
      case AvroSchema.Type.DOUBLE => (DoubleType, false)
      case AvroSchema.Type.STRING => (StringType, false)
      case AvroSchema.Type.BYTES => (BinaryType, false)
      case AvroSchema.Type.UNION =>
        val branches = s.getTypes
        require(branches.size() == 2 &&
          branches.get(0).getType == AvroSchema.Type.NULL,
          s"only [null, T] unions supported, got $s")
        (catalystType(branches.get(1))._1, true)
      case t => throw new IllegalArgumentException(
        s"unsupported avro type for flat-record serde: $t")
    }

  private[functions] def structTypeFor(s: AvroSchema): StructType = {
    require(s.getType == AvroSchema.Type.RECORD, s"need a record schema, got $s")
    StructType(s.getFields.toArray.map { f0 =>
      val f = f0.asInstanceOf[AvroSchema.Field]
      val (dt, nullable) = catalystType(f.schema())
      StructField(f.name(), dt, nullable)
    })
  }

}

/** struct → Avro single-record binary. */
case class AvroEncodeExpr(child: Expression, schemaJson: String)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  @transient private lazy val schema = AvroSerde.parse(schemaJson)
  @transient private lazy val writer = new GenericDatumWriter[GenericRecord](schema)
  @transient private lazy val fieldIndex: Array[(String, AvroSchema, Int)] = {
    val st = child.dataType.asInstanceOf[StructType]
    schema.getFields.toArray.map { f0 =>
      val f = f0.asInstanceOf[AvroSchema.Field]
      (f.name(), f.schema(), st.fieldIndex(f.name()))
    }
  }
  override def nullSafeEval(v: Any): Any = {
    val row = v.asInstanceOf[InternalRow]
    val st = child.dataType.asInstanceOf[StructType]
    val rec = new GenericData.Record(schema)
    fieldIndex.foreach { case (name, fs, i) =>
      val base = if (fs.getType == AvroSchema.Type.UNION) fs.getTypes.get(1) else fs
      val value: AnyRef =
        if (row.isNullAt(i)) {
          require(fs.getType == AvroSchema.Type.UNION,
            s"null in non-nullable avro field $name")
          null
        } else base.getType match {
          case AvroSchema.Type.BOOLEAN => java.lang.Boolean.valueOf(row.getBoolean(i))
          case AvroSchema.Type.INT => java.lang.Integer.valueOf(row.getInt(i))
          case AvroSchema.Type.LONG => java.lang.Long.valueOf(row.getLong(i))
          case AvroSchema.Type.FLOAT => java.lang.Float.valueOf(row.getFloat(i))
          case AvroSchema.Type.DOUBLE => java.lang.Double.valueOf(row.getDouble(i))
          case AvroSchema.Type.STRING => row.getUTF8String(i).toString
          case AvroSchema.Type.BYTES => ByteBuffer.wrap(row.getBinary(i))
          case t => throw new IllegalArgumentException(s"unsupported $t")
        }
      rec.put(name, value)
    }
    val out = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    writer.write(rec, enc)
    enc.flush()
    out.toByteArray
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "avro_encode"
}

/** Avro single-record binary → struct (schema-derived type). */
case class AvroDecodeExpr(child: Expression, schemaJson: String)
    extends UnaryExpression with CodegenFallback {
  @transient private lazy val schema = AvroSerde.parse(schemaJson)
  // dataType is called throughout analysis/planning — parse once
  @transient private lazy val cachedType: StructType =
    AvroSerde.structTypeFor(AvroSerde.parse(schemaJson))
  override def dataType: DataType = cachedType
  @transient private lazy val reader = new GenericDatumReader[GenericRecord](schema)
  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[Array[Byte]]
    val dec = DecoderFactory.get().binaryDecoder(bytes, null)
    val rec = reader.read(null, dec)
    val fields = schema.getFields
    val out = new Array[Any](fields.size())
    var i = 0
    while (i < fields.size()) {
      out(i) = rec.get(fields.get(i).name()) match {
        case null => null
        case s: org.apache.avro.util.Utf8 => UTF8String.fromBytes(s.getBytes, 0, s.getByteLength)
        case s: java.lang.String => UTF8String.fromString(s)
        case b: ByteBuffer =>
          val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
        case x => x // boxed primitives map 1:1 to Catalyst internal values
      }
      i += 1
    }
    InternalRow.fromSeq(out.toIndexedSeq)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "avro_decode"
}
