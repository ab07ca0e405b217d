package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.io.ByteArrayOutputStream

/**
 * Protobuf wire-format SerDe for the schema-registry surface (reference
 * SchemaType.PROTOBUF_NATIVE — pulsar-client/.../schema/
 * ProtobufNativeSchema.java): flat messages encoded/decoded directly
 * from the PUBLIC wire format (protobuf.dev/programming-guides/encoding)
 * — no generated classes, no external protobuf runtime:
 *
 *  - varint (wire type 0): int64/int32 as plain two's-complement
 *    varints (negative values take 10 bytes, per spec), bool as 0/1;
 *  - fixed64 (type 1): double, little-endian IEEE bits;
 *  - length-delimited (type 2): string (UTF-8) and bytes;
 *  - fixed32 (type 5): float.
 *
 * proto3 semantics: a NULL struct field is simply omitted from the
 * encoding; on decode, missing fields surface as NULL (the engine keeps
 * explicit presence rather than proto3's zero-defaults — the
 * lossless choice for envelope tombstones). UNKNOWN field numbers are
 * SKIPPED by wire type on decode — the forward-compat behavior every
 * protobuf consumer relies on.
 *
 * The schema is a compact field spec `"<num>:<type>:<name>,…"` with
 * type ∈ int64|int32|bool|double|float|string|bytes, e.g.
 * `"1:int64:offset,2:string:key,3:string:value"`. Field numbers must be
 * distinct and in [1, 2^29−1].
 */
object ProtoSerde {

  final case class Field(num: Int, ptype: String, name: String) {
    require(num >= 1 && num < (1 << 29), s"field number out of range: $num")
    val wireType: Int = ptype match {
      case "int64" | "int32" | "bool" => 0
      case "double" => 1
      case "string" | "bytes" => 2
      case "float" => 5
      case t => throw new IllegalArgumentException(s"unsupported proto type $t")
    }
    def catalystType: DataType = ptype match {
      case "int64" => LongType
      case "int32" => IntegerType
      case "bool" => BooleanType
      case "double" => DoubleType
      case "float" => FloatType
      case "string" => StringType
      case "bytes" => BinaryType
    }
  }

  private[graft] def parseSpec(spec: String): Seq[Field] = {
    val fields = spec.split(",").toSeq.map { part =>
      part.split(":") match {
        case Array(num, t, name) => Field(num.trim.toInt, t.trim, name.trim)
        case _ => throw new IllegalArgumentException(s"bad field spec '$part'")
      }
    }
    require(fields.map(_.num).distinct.size == fields.size,
      s"duplicate field numbers in '$spec'")
    fields
  }

  def proto_encode(struct: Column, spec: String): Column =
    ColumnBridge.column(ProtoEncodeExpr(ColumnBridge.expression(struct), spec))

  def proto_decode(bytes: Column, spec: String): Column =
    ColumnBridge.column(ProtoDecodeExpr(ColumnBridge.expression(bytes), spec))

  // ---- wire primitives ----

  private[functions] def writeVarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0L) {
      out.write(((v & 0x7F) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt & 0x7F)
  }

  /** Returns (value, next offset). */
  private[functions] def readVarint(b: Array[Byte], off: Int): (Long, Int) = {
    var v = 0L; var shift = 0; var i = off
    while ({
      require(i < b.length && shift < 64, "truncated varint")
      val x = b(i); i += 1
      v |= (x & 0x7FL) << shift
      shift += 7
      (x & 0x80) != 0
    }) ()
    (v, i)
  }
}

/** struct → protobuf message bytes. */
case class ProtoEncodeExpr(child: Expression, spec: String)
    extends UnaryExpression with CodegenFallback {
  import ProtoSerde._
  override def dataType: DataType = BinaryType
  @transient private lazy val fields = parseSpec(spec)
  @transient private lazy val indices: Array[Int] = {
    val st = child.dataType.asInstanceOf[StructType]
    fields.map(f => st.fieldIndex(f.name)).toArray
  }
  override def nullSafeEval(v: Any): Any = {
    val row = v.asInstanceOf[InternalRow]
    val out = new ByteArrayOutputStream()
    fields.zip(indices).foreach { case (f, i) =>
      if (!row.isNullAt(i)) {
        writeVarint(out, ((f.num.toLong << 3) | f.wireType))
        f.ptype match {
          case "int64" => writeVarint(out, row.getLong(i))
          case "int32" => writeVarint(out, row.getInt(i).toLong) // sign-extended, per spec
          case "bool" => writeVarint(out, if (row.getBoolean(i)) 1L else 0L)
          case "double" =>
            val bits = java.lang.Double.doubleToLongBits(row.getDouble(i))
            (0 until 8).foreach(k => out.write(((bits >>> (8 * k)) & 0xFF).toInt))
          case "float" =>
            val bits = java.lang.Float.floatToIntBits(row.getFloat(i))
            (0 until 4).foreach(k => out.write((bits >>> (8 * k)) & 0xFF))
          case "string" =>
            val b = row.getUTF8String(i).getBytes
            writeVarint(out, b.length.toLong); out.write(b)
          case "bytes" =>
            val b = row.getBinary(i)
            writeVarint(out, b.length.toLong); out.write(b)
        }
      }
    }
    out.toByteArray
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "proto_encode"
}

/** protobuf message bytes → struct; missing fields NULL, unknown
  * field numbers skipped by wire type. */
case class ProtoDecodeExpr(child: Expression, spec: String)
    extends UnaryExpression with CodegenFallback {
  import ProtoSerde._
  @transient private lazy val fields = parseSpec(spec)
  // dataType is called throughout analysis/planning — parse once
  @transient private lazy val cachedType: StructType = StructType(
    parseSpec(spec).map(f => StructField(f.name, f.catalystType, nullable = true)))
  override def dataType: DataType = cachedType
  @transient private lazy val byNum: Map[Int, (Field, Int)] =
    fields.zipWithIndex.map { case (f, i) => f.num -> ((f, i)) }.toMap
  override def nullSafeEval(v: Any): Any = {
    val b = v.asInstanceOf[Array[Byte]]
    val out = new Array[Any](fields.size)
    var off = 0
    while (off < b.length) {
      val (tag, o1) = readVarint(b, off)
      val num = (tag >>> 3).toInt
      val wt = (tag & 7).toInt
      byNum.get(num) match {
        case Some((f, i)) =>
          require(wt == f.wireType, s"field $num: wire type $wt, expected ${f.wireType}")
          off = f.ptype match {
            case "int64" =>
              val (x, o2) = readVarint(b, o1); out(i) = x; o2
            case "int32" =>
              val (x, o2) = readVarint(b, o1); out(i) = x.toInt; o2
            case "bool" =>
              val (x, o2) = readVarint(b, o1); out(i) = (x != 0L); o2
            case "double" =>
              require(o1 + 8 <= b.length, "truncated fixed64")
              var bits = 0L
              (0 until 8).foreach(k => bits |= (b(o1 + k) & 0xFFL) << (8 * k))
              out(i) = java.lang.Double.longBitsToDouble(bits); o1 + 8
            case "float" =>
              require(o1 + 4 <= b.length, "truncated fixed32")
              var bits = 0
              (0 until 4).foreach(k => bits |= (b(o1 + k) & 0xFF) << (8 * k))
              out(i) = java.lang.Float.intBitsToFloat(bits); o1 + 4
            case "string" =>
              val (len, o2) = readVarint(b, o1)
              // a malformed 10-byte negative varint would move the
              // offset BACKWARDS through o2 + len — hang/corrupt decode
              require(len >= 0 && o2 + len <= b.length, "truncated string")
              out(i) = UTF8String.fromBytes(b, o2, len.toInt); o2 + len.toInt
            case "bytes" =>
              val (len, o2) = readVarint(b, o1)
              require(len >= 0 && o2 + len <= b.length, "truncated bytes")
              out(i) = java.util.Arrays.copyOfRange(b, o2, o2 + len.toInt); o2 + len.toInt
          }
        case None => // unknown field: skip by wire type (forward compat)
          off = wt match {
            case 0 => readVarint(b, o1)._2
            case 1 => o1 + 8
            case 2 =>
              val (len, o2) = readVarint(b, o1)
              require(len >= 0 && o2 + len <= b.length, "truncated unknown field")
              o2 + len.toInt
            case 5 => o1 + 4
            case other =>
              throw new IllegalArgumentException(s"unsupported wire type $other")
          }
      }
    }
    InternalRow.fromSeq(out.toIndexedSeq)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "proto_decode"
}
