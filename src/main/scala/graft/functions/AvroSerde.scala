package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, SpecializedGetters, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
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
 * Spark classpath). Supported record shapes: boolean / int / long /
 * float / double / string / bytes, their `[null, T]` nullable unions,
 * and RECURSIVELY nested records, arrays and (string-keyed, per Avro)
 * maps — the schema surface the reference's POJO-derived schemas
 * produce (Schema.java:329-361). Field order follows the AVRO schema
 * (the wire format is positional); struct fields are matched by NAME at
 * every nesting level so column order in the plan is free.
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

  /** The Catalyst type for an Avro type (recursive). `seen` carries the
    * enclosing record names: Avro legally allows RECURSIVE record
    * schemas, which have no finite Catalyst type — reject them with a
    * clean error instead of a StackOverflowError during analysis. */
  private[functions] def catalystType(s: AvroSchema,
                                      seen: Set[String] = Set.empty): (DataType, Boolean) =
    s.getType match {
      case AvroSchema.Type.BOOLEAN => (BooleanType, false)
      case AvroSchema.Type.INT => (IntegerType, false)
      case AvroSchema.Type.LONG => (LongType, false)
      case AvroSchema.Type.FLOAT => (FloatType, false)
      case AvroSchema.Type.DOUBLE => (DoubleType, false)
      case AvroSchema.Type.STRING => (StringType, false)
      case AvroSchema.Type.BYTES => (BinaryType, false)
      case AvroSchema.Type.RECORD => (structTypeFor(s, seen), false)
      case AvroSchema.Type.ARRAY =>
        val (et, en) = catalystType(s.getElementType, seen)
        (ArrayType(et, containsNull = en), false)
      case AvroSchema.Type.MAP => // avro map keys are always strings
        val (vt, vn) = catalystType(s.getValueType, seen)
        (MapType(StringType, vt, valueContainsNull = vn), false)
      case AvroSchema.Type.UNION =>
        val branches = s.getTypes
        require(branches.size() == 2 &&
          branches.get(0).getType == AvroSchema.Type.NULL,
          s"only [null, T] unions supported, got $s")
        (catalystType(branches.get(1), seen)._1, true)
      case t => throw new IllegalArgumentException(
        s"unsupported avro type for record serde: $t")
    }

  private[functions] def structTypeFor(s: AvroSchema,
                                       seen: Set[String] = Set.empty): StructType = {
    require(s.getType == AvroSchema.Type.RECORD, s"need a record schema, got $s")
    require(!seen(s.getFullName),
      s"recursive avro schemas are not supported: ${s.getFullName}")
    val seen2 = seen + s.getFullName
    StructType(s.getFields.toArray.map { f0 =>
      val f = f0.asInstanceOf[AvroSchema.Field]
      val (dt, nullable) = catalystType(f.schema(), seen2)
      StructField(f.name(), dt, nullable)
    })
  }
}

/** struct → Avro single-record binary (recursive over nested records,
  * arrays and maps). */
case class AvroEncodeExpr(child: Expression, schemaJson: String)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  @transient private lazy val schema = AvroSerde.parse(schemaJson)
  @transient private lazy val writer = new GenericDatumWriter[GenericRecord](schema)

  override def nullSafeEval(v: Any): Any = {
    val rec = toRecord(v.asInstanceOf[InternalRow], schema,
      child.dataType.asInstanceOf[StructType])
    val out = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    writer.write(rec, enc)
    enc.flush()
    out.toByteArray
  }

  /** Per-(record schema, struct type) encode slots — resolved once per
    * distinct record node, not per row (expression instances are
    * per-task, so the identity cache is single-threaded). */
  @transient private lazy val slotCache =
    new java.util.IdentityHashMap[AvroSchema, Array[(AvroSchema.Field, Int, DataType)]]()

  private def slotsFor(rs: AvroSchema, st: StructType): Array[(AvroSchema.Field, Int, DataType)] = {
    val cached = slotCache.get(rs)
    if (cached != null) cached
    else {
      val built = rs.getFields.toArray.map { f0 =>
        val f = f0.asInstanceOf[AvroSchema.Field]
        val i = st.fieldIndex(f.name())
        (f, i, st.fields(i).dataType)
      }
      slotCache.put(rs, built): Unit
      built
    }
  }

  private def toRecord(row: InternalRow, rs: AvroSchema, st: StructType): GenericRecord = {
    val rec = new GenericData.Record(rs)
    slotsFor(rs, st).foreach { case (f, i, dt) =>
      val fs = f.schema()
      val value: AnyRef =
        if (row.isNullAt(i)) {
          require(fs.getType == AvroSchema.Type.UNION,
            s"null in non-nullable avro field ${f.name()}")
          null
        } else toAvro(row, i, fs, dt)
      rec.put(f.pos(), value)
    }
    rec
  }

  private def toAvro(g: SpecializedGetters, i: Int, fs: AvroSchema,
                     dt: DataType): AnyRef = {
    val base = if (fs.getType == AvroSchema.Type.UNION) fs.getTypes.get(1) else fs
    base.getType match {
      case AvroSchema.Type.BOOLEAN => java.lang.Boolean.valueOf(g.getBoolean(i))
      case AvroSchema.Type.INT => java.lang.Integer.valueOf(g.getInt(i))
      case AvroSchema.Type.LONG => java.lang.Long.valueOf(g.getLong(i))
      case AvroSchema.Type.FLOAT => java.lang.Float.valueOf(g.getFloat(i))
      case AvroSchema.Type.DOUBLE => java.lang.Double.valueOf(g.getDouble(i))
      case AvroSchema.Type.STRING => g.getUTF8String(i).toString
      case AvroSchema.Type.BYTES => ByteBuffer.wrap(g.getBinary(i))
      case AvroSchema.Type.RECORD =>
        val sub = dt.asInstanceOf[StructType]
        toRecord(g.getStruct(i, sub.size), base, sub)
      case AvroSchema.Type.ARRAY =>
        val arr = g.getArray(i)
        val elemDt = dt.asInstanceOf[ArrayType].elementType
        val es = base.getElementType
        val list = new java.util.ArrayList[AnyRef](arr.numElements())
        (0 until arr.numElements()).foreach { j =>
          list.add(if (arr.isNullAt(j)) {
            require(es.getType == AvroSchema.Type.UNION,
              "null element in array of non-nullable avro type")
            null
          } else toAvro(arr, j, es, elemDt))
        }
        list
      case AvroSchema.Type.MAP =>
        val m = g.getMap(i)
        val mt = dt.asInstanceOf[MapType]
        val vs = base.getValueType
        val keys = m.keyArray(); val vals = m.valueArray()
        // LinkedHashMap: avro serializes maps in iteration order — keep
        // the input's order so the bytes are deterministic per row
        val out = new java.util.LinkedHashMap[String, AnyRef](m.numElements())
        (0 until m.numElements()).foreach { j =>
          val k = keys.getUTF8String(j).toString
          out.put(k, if (vals.isNullAt(j)) {
            require(vs.getType == AvroSchema.Type.UNION,
              "null value in map of non-nullable avro type")
            null
          } else toAvro(vals, j, vs, mt.valueType))
        }
        out
      case t => throw new IllegalArgumentException(s"unsupported $t")
    }
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "avro_encode"
}

/** Avro single-record binary → struct (schema-derived type, recursive). */
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
    fromRecord(reader.read(null, dec))
  }

  private def fromRecord(rec: GenericRecord): InternalRow = {
    val fields = rec.getSchema.getFields
    val out = new Array[Any](fields.size())
    var i = 0
    while (i < fields.size()) {
      // by POSITION: generic records store values in schema order, and
      // the by-name get re-resolves the field index per call
      out(i) = fromAvro(rec.get(i))
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
  }

  private def fromAvro(v: AnyRef): Any = v match {
    case null => null
    case s: org.apache.avro.util.Utf8 => UTF8String.fromBytes(s.getBytes, 0, s.getByteLength)
    case s: java.lang.String => UTF8String.fromString(s)
    case b: ByteBuffer =>
      val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
    case r: GenericRecord => fromRecord(r)
    case l: java.util.List[_] =>
      val arr = new Array[Any](l.size())
      (0 until l.size()).foreach(j => arr(j) = fromAvro(l.get(j).asInstanceOf[AnyRef]))
      new GenericArrayData(arr)
    case m: java.util.Map[_, _] =>
      val ks = new Array[Any](m.size()); val vs = new Array[Any](m.size())
      var j = 0
      m.forEach { (k, value) =>
        ks(j) = fromAvro(k.asInstanceOf[AnyRef])
        vs(j) = fromAvro(value.asInstanceOf[AnyRef])
        j += 1
      }
      new ArrayBasedMapData(new GenericArrayData(ks), new GenericArrayData(vs))
    case x => x // boxed primitives map 1:1 to Catalyst internal values
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "avro_decode"
}
