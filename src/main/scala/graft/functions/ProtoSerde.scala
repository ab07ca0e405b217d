package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, SpecializedGetters, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.io.ByteArrayOutputStream
import scala.collection.mutable.ArrayBuffer

/**
 * Protobuf wire-format SerDe for the schema-registry surface (reference
 * SchemaType.PROTOBUF_NATIVE — pulsar-client/.../schema/
 * ProtobufNativeSchema.java): messages encoded/decoded directly from the
 * PUBLIC wire format (protobuf.dev/programming-guides/encoding) — no
 * generated classes, no external protobuf runtime:
 *
 *  - varint (wire type 0): int64/int32 as plain two's-complement
 *    varints (negative values take 10 bytes, per spec), bool as 0/1;
 *  - fixed64 (type 1): double, little-endian IEEE bits;
 *  - length-delimited (type 2): string (UTF-8), bytes, NESTED MESSAGES,
 *    packed repeated scalars, and map entries;
 *  - fixed32 (type 5): float.
 *
 * Composite types (matching the reference's PROTOBUF_NATIVE surface,
 * which handles nested messages, repeated fields and maps):
 *
 *  - `message{<subspec>}` → Catalyst struct, encoded as a
 *    length-delimited submessage (recursive);
 *  - `repeated <type>` → Catalyst array. Numeric scalars encode PACKED
 *    (one length-delimited block of concatenated payloads — the proto3
 *    default); strings/bytes/messages encode one tag per element. The
 *    decoder accepts BOTH packed and expanded numeric encodings, as the
 *    protobuf spec requires of every parser;
 *  - `map{<ktype>,<vtype>}` → Catalyst map, encoded per spec as a
 *    repeated `message{1:k:key,2:v:value}` entry per pair; a map entry
 *    with an omitted key/value decodes to the proto3 default.
 *
 * proto3 semantics: a NULL struct field is simply omitted from the
 * encoding; on decode, missing scalar/message fields surface as NULL
 * (the engine keeps explicit presence rather than proto3's
 * zero-defaults — the lossless choice for envelope tombstones), while
 * missing repeated/map fields surface as EMPTY collections (proto3
 * cannot distinguish empty from absent). UNKNOWN field numbers are
 * SKIPPED by wire type on decode — the forward-compat behavior every
 * protobuf consumer relies on. A re-occurring non-repeated field is
 * last-wins (documented divergence: the protobuf runtime MERGES
 * re-occurring submessages; this SerDe never emits such bytes).
 *
 * The schema is a compact field spec `"<num>:<type>:<name>,…"` with
 * type ∈ int64|int32|bool|double|float|string|bytes|message{…}|
 * repeated <t>|map{k,v}, e.g.
 * `"1:int64:offset,2:map{string,string}:props,3:message{1:string:lang,2:repeated int64:ids}:meta"`.
 * Field numbers must be distinct per message and in [1, 2^29−1].
 */
object ProtoSerde {

  sealed trait PType { def catalystType: DataType }

  final case class PScalar(t: String) extends PType {
    val wireType: Int = t match {
      case "int64" | "int32" | "bool" => 0
      case "double" => 1
      case "string" | "bytes" => 2
      case "float" => 5
      case other => throw new IllegalArgumentException(s"unsupported proto type $other")
    }
    def catalystType: DataType = t match {
      case "int64" => LongType
      case "int32" => IntegerType
      case "bool" => BooleanType
      case "double" => DoubleType
      case "float" => FloatType
      case "string" => StringType
      case "bytes" => BinaryType
    }
  }

  final case class PMessage(fields: Seq[PField]) extends PType {
    def catalystType: DataType =
      StructType(fields.map(f => StructField(f.name, f.tpe.catalystType, nullable = true)))
  }

  final case class PRepeated(elem: PType) extends PType {
    require(!elem.isInstanceOf[PRepeated] && !elem.isInstanceOf[PMap],
      "repeated elements must be scalar or message (wrap a map/repeated in a message)")
    def catalystType: DataType = ArrayType(elem.catalystType, containsNull = false)
  }

  final case class PMap(key: PScalar, value: PType) extends PType {
    require(key.t != "double" && key.t != "float" && key.t != "bytes",
      s"map keys must be integral/bool/string, got ${key.t}")
    require(!value.isInstanceOf[PRepeated] && !value.isInstanceOf[PMap],
      "map values must be scalar or message, per the protobuf spec")
    def catalystType: DataType =
      MapType(key.catalystType, value.catalystType, valueContainsNull = false)
  }

  final case class PField(num: Int, tpe: PType, name: String) {
    require(num >= 1 && num < (1 << 29), s"field number out of range: $num")
  }

  /** Split on `sep` at brace depth 0 only, so nested specs stay intact. */
  private def splitTop(s: String, sep: Char): Seq[String] = {
    val parts = ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    s.foreach {
      case '{' => depth += 1; cur += '{'
      case '}' =>
        depth -= 1; require(depth >= 0, s"unbalanced braces in '$s'"); cur += '}'
      case c if c == sep && depth == 0 => parts += cur.toString; cur.clear()
      case c => cur += c
    }
    require(depth == 0, s"unbalanced braces in '$s'")
    parts += cur.toString
    parts.toSeq
  }

  private[graft] def parseSpec(spec: String): Seq[PField] = {
    val fields = splitTop(spec, ',').map(_.trim).filter(_.nonEmpty).map { part =>
      val segs = splitTop(part, ':')
      require(segs.length >= 3, s"bad field spec '$part'")
      PField(segs.head.trim.toInt,
        parseType(segs.slice(1, segs.length - 1).mkString(":").trim),
        segs.last.trim)
    }
    require(fields.nonEmpty, s"empty field spec '$spec'")
    require(fields.map(_.num).distinct.size == fields.size,
      s"duplicate field numbers in '$spec'")
    require(fields.map(_.name).distinct.size == fields.size,
      s"duplicate field names in '$spec'")
    fields
  }

  private[graft] def parseType(t: String): PType =
    if (t.startsWith("repeated ")) PRepeated(parseType(t.stripPrefix("repeated ").trim))
    else if (t.startsWith("message{") && t.endsWith("}"))
      PMessage(parseSpec(t.substring("message{".length, t.length - 1)))
    else if (t.startsWith("map{") && t.endsWith("}")) {
      val kv = splitTop(t.substring("map{".length, t.length - 1), ',')
      require(kv.length == 2, s"map type needs exactly key,value: '$t'")
      parseType(kv.head.trim) match {
        case k: PScalar => PMap(k, parseType(kv(1).trim))
        case other => throw new IllegalArgumentException(s"map key must be scalar, got $other")
      }
    } else PScalar(t)

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

  // ---- scalar payloads (shared by fields, packed elements, map entries) ----

  private[functions] def writeScalarPayload(out: ByteArrayOutputStream,
                                            s: PScalar, g: SpecializedGetters,
                                            i: Int): Unit = s.t match {
    case "int64" => writeVarint(out, g.getLong(i))
    case "int32" => writeVarint(out, g.getInt(i).toLong) // sign-extended, per spec
    case "bool" => writeVarint(out, if (g.getBoolean(i)) 1L else 0L)
    case "double" =>
      val bits = java.lang.Double.doubleToLongBits(g.getDouble(i))
      (0 until 8).foreach(k => out.write(((bits >>> (8 * k)) & 0xFF).toInt))
    case "float" =>
      val bits = java.lang.Float.floatToIntBits(g.getFloat(i))
      (0 until 4).foreach(k => out.write((bits >>> (8 * k)) & 0xFF))
    case "string" =>
      val b = g.getUTF8String(i).getBytes
      writeVarint(out, b.length.toLong); out.write(b)
    case "bytes" =>
      val b = g.getBinary(i)
      writeVarint(out, b.length.toLong); out.write(b)
  }

  /** Returns (decoded value, next offset). The length guard rejects a
    * malformed 10-byte negative varint that would otherwise move the
    * offset BACKWARDS through `o2 + len` — hang/corrupt decode. */
  private[functions] def readScalarPayload(b: Array[Byte], off: Int,
                                           s: PScalar): (Any, Int) = s.t match {
    case "int64" => readVarint(b, off)
    case "int32" => val (x, o) = readVarint(b, off); (x.toInt, o)
    case "bool" => val (x, o) = readVarint(b, off); (x != 0L, o)
    case "double" =>
      require(off + 8 <= b.length, "truncated fixed64")
      var bits = 0L
      (0 until 8).foreach(k => bits |= (b(off + k) & 0xFFL) << (8 * k))
      (java.lang.Double.longBitsToDouble(bits), off + 8)
    case "float" =>
      require(off + 4 <= b.length, "truncated fixed32")
      var bits = 0
      (0 until 4).foreach(k => bits |= (b(off + k) & 0xFF) << (8 * k))
      (java.lang.Float.intBitsToFloat(bits), off + 4)
    case "string" =>
      val (len, o2) = readVarint(b, off)
      require(len >= 0 && o2 + len <= b.length, "truncated string")
      (UTF8String.fromBytes(b, o2, len.toInt), o2 + len.toInt)
    case "bytes" =>
      val (len, o2) = readVarint(b, off)
      require(len >= 0 && o2 + len <= b.length, "truncated bytes")
      (java.util.Arrays.copyOfRange(b, o2, o2 + len.toInt), o2 + len.toInt)
  }

  private[functions] def proto3Default(t: PType): Any = t match {
    case PScalar("int64") => 0L
    case PScalar("int32") => 0
    case PScalar("bool") => false
    case PScalar("double") => 0.0
    case PScalar("float") => 0f
    case PScalar("string") => UTF8String.EMPTY_UTF8
    case PScalar("bytes") => Array.emptyByteArray
    case _ => null // absent submessage stays NULL
  }
}

/** struct → protobuf message bytes (recursive over nested messages,
  * repeated fields and maps). */
case class ProtoEncodeExpr(child: Expression, spec: String)
    extends UnaryExpression with CodegenFallback {
  import ProtoSerde._
  override def dataType: DataType = BinaryType
  @transient private lazy val fields = parseSpec(spec)

  override def nullSafeEval(v: Any): Any = {
    val out = new ByteArrayOutputStream()
    encodeMessage(v.asInstanceOf[InternalRow], fields,
      child.dataType.asInstanceOf[StructType], out)
    out.toByteArray
  }

  /** Spec fields resolve input ordinals BY NAME per message level, so
    * the input struct's field order never has to match the spec. */
  private def encodeMessage(row: InternalRow, fs: Seq[PField],
                            st: StructType, out: ByteArrayOutputStream): Unit =
    fs.foreach { f =>
      val i = st.fieldIndex(f.name)
      if (!row.isNullAt(i)) encodeField(out, f.num, f.tpe, row, i, st.fields(i).dataType)
    }

  private def encodeField(out: ByteArrayOutputStream, num: Int, t: PType,
                          g: SpecializedGetters, i: Int, dt: DataType): Unit = t match {
    case s: PScalar =>
      writeVarint(out, (num.toLong << 3) | s.wireType)
      writeScalarPayload(out, s, g, i)
    case m: PMessage =>
      val bo = new ByteArrayOutputStream()
      encodeMessage(g.getStruct(i, m.fields.size), m.fields,
        dt.asInstanceOf[StructType], bo)
      writeVarint(out, (num.toLong << 3) | 2)
      writeVarint(out, bo.size.toLong); bo.writeTo(out)
    case PRepeated(elem) =>
      val arr = g.getArray(i)
      val elemDt = dt.asInstanceOf[ArrayType].elementType
      elem match {
        case s: PScalar if s.wireType != 2 =>
          // packed (proto3 default for numeric scalars): ONE tag + one
          // length-delimited block of concatenated payloads
          if (arr.numElements() > 0) {
            val bo = new ByteArrayOutputStream()
            (0 until arr.numElements()).foreach { j =>
              require(!arr.isNullAt(j), "null element in repeated field")
              writeScalarPayload(bo, s, arr, j)
            }
            writeVarint(out, (num.toLong << 3) | 2)
            writeVarint(out, bo.size.toLong); bo.writeTo(out)
          }
        case _ => // strings/bytes/messages: one tag per element
          (0 until arr.numElements()).foreach { j =>
            require(!arr.isNullAt(j), "null element in repeated field")
            encodeField(out, num, elem, arr, j, elemDt)
          }
      }
    case PMap(k, v) =>
      // per spec: map<K,V> IS repeated message{1:K:key,2:V:value}
      val m = g.getMap(i)
      val mt = dt.asInstanceOf[MapType]
      val keys = m.keyArray(); val vals = m.valueArray()
      (0 until m.numElements()).foreach { j =>
        val bo = new ByteArrayOutputStream()
        encodeField(bo, 1, k, keys, j, mt.keyType)
        if (!vals.isNullAt(j)) encodeField(bo, 2, v, vals, j, mt.valueType)
        writeVarint(out, (num.toLong << 3) | 2)
        writeVarint(out, bo.size.toLong); bo.writeTo(out)
      }
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "proto_encode"
}

/** protobuf message bytes → struct; missing scalar/message fields NULL,
  * missing repeated/map fields EMPTY, unknown field numbers skipped by
  * wire type. */
case class ProtoDecodeExpr(child: Expression, spec: String)
    extends UnaryExpression with CodegenFallback {
  import ProtoSerde._
  // dataType is called throughout analysis/planning — parse once
  @transient private lazy val cachedType: StructType =
    PMessage(parseSpec(spec)).catalystType.asInstanceOf[StructType]
  override def dataType: DataType = cachedType

  /** Per-message-node decode tables resolved ONCE (field-number map +
    * child nodes for nested messages) — building them per row was the
    * decode path's dominant allocation. */
  private final class Resolved(val fs: IndexedSeq[PField]) {
    val byNum: Map[Int, (PField, Int)] =
      fs.zipWithIndex.map { case (f, i) => f.num -> ((f, i)) }.toMap
    val children: Map[Int, Resolved] = fs.collect {
      case PField(n, m: PMessage, _) => n -> new Resolved(m.fields.toIndexedSeq)
      case PField(n, PRepeated(m: PMessage), _) => n -> new Resolved(m.fields.toIndexedSeq)
      case PField(n, PMap(_, m: PMessage), _) => n -> new Resolved(m.fields.toIndexedSeq)
    }.toMap
  }
  @transient private lazy val root = new Resolved(parseSpec(spec).toIndexedSeq)

  override def nullSafeEval(v: Any): Any = {
    val b = v.asInstanceOf[Array[Byte]]
    decodeMessage(b, 0, b.length, root)
  }

  private def decodeMessage(b: Array[Byte], from: Int, until: Int,
                            r: Resolved): InternalRow = {
    val fs = r.fs
    val byNum = r.byNum
    val out = new Array[Any](fs.size)
    val acc: Array[ArrayBuffer[Any]] = fs.map {
      case PField(_, _: PRepeated, _) => ArrayBuffer.empty[Any]
      case PField(_, _: PMap, _) => ArrayBuffer.empty[Any] // of (k, v)
      case _ => null
    }.toArray
    var off = from
    while (off < until) {
      val (tag, o1) = readVarint(b, off)
      val num = (tag >>> 3).toInt
      val wt = (tag & 7).toInt
      byNum.get(num) match {
        case Some((f, i)) => off = f.tpe match {
          case s: PScalar =>
            require(wt == s.wireType, s"field $num: wire type $wt, expected ${s.wireType}")
            val (x, o2) = readScalarPayload(b, o1, s); out(i) = x; o2
          case _: PMessage =>
            require(wt == 2, s"field $num: wire type $wt, expected 2 (message)")
            val (len, o2) = readVarint(b, o1)
            require(len >= 0 && o2 + len <= b.length, "truncated message")
            out(i) = decodeMessage(b, o2, o2 + len.toInt, r.children(num)); o2 + len.toInt
          case PRepeated(elem) => elem match {
            case s: PScalar if s.wireType != 2 =>
              if (wt == 2) { // packed block: parse payloads back-to-back
                val (len, o2) = readVarint(b, o1)
                require(len >= 0 && o2 + len <= b.length, "truncated packed field")
                var p = o2
                while (p < o2 + len) {
                  val (x, np) = readScalarPayload(b, p, s); acc(i) += x; p = np
                }
                o2 + len.toInt
              } else { // expanded occurrence — parsers must accept both
                require(wt == s.wireType, s"field $num: wire type $wt")
                val (x, o2) = readScalarPayload(b, o1, s); acc(i) += x; o2
              }
            case s: PScalar =>
              require(wt == 2, s"field $num: wire type $wt, expected 2")
              val (x, o2) = readScalarPayload(b, o1, s); acc(i) += x; o2
            case _: PMessage =>
              require(wt == 2, s"field $num: wire type $wt, expected 2")
              val (len, o2) = readVarint(b, o1)
              require(len >= 0 && o2 + len <= b.length, "truncated repeated message")
              acc(i) += decodeMessage(b, o2, o2 + len.toInt, r.children(num)); o2 + len.toInt
          }
          case pm: PMap =>
            require(wt == 2, s"field $num: wire type $wt, expected 2 (map entry)")
            val (len, o2) = readVarint(b, o1)
            require(len >= 0 && o2 + len <= b.length, "truncated map entry")
            acc(i) += decodeMapEntry(b, o2, o2 + len.toInt, pm,
              r.children.get(num)); o2 + len.toInt
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
    // finalize collections: absent repeated/map == empty, per proto3
    fs.zipWithIndex.foreach {
      case (PField(_, _: PRepeated, _), i) =>
        out(i) = new GenericArrayData(acc(i).toArray)
      case (PField(_, _: PMap, _), i) =>
        val pairs = acc(i).asInstanceOf[ArrayBuffer[Any]].map(_.asInstanceOf[(Any, Any)])
        out(i) = new ArrayBasedMapData(
          new GenericArrayData(pairs.map(_._1).toArray),
          new GenericArrayData(pairs.map(_._2).toArray))
      case _ =>
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
  }

  /** Map entry = message{1:key,2:value}; omitted key/value decode to the
    * proto3 default, matching every protobuf runtime. */
  private def decodeMapEntry(b: Array[Byte], from: Int, until: Int,
                             pm: PMap, child: Option[Resolved]): (Any, Any) = {
    var key: Any = proto3Default(pm.key)
    var value: Any = proto3Default(pm.value)
    var off = from
    while (off < until) {
      val (tag, o1) = readVarint(b, off)
      val num = (tag >>> 3).toInt
      off = num match {
        case 1 =>
          val (x, o2) = readScalarPayload(b, o1, pm.key); key = x; o2
        case 2 => pm.value match {
          case s: PScalar =>
            val (x, o2) = readScalarPayload(b, o1, s); value = x; o2
          case _: PMessage =>
            val (len, o2) = readVarint(b, o1)
            require(len >= 0 && o2 + len <= b.length, "truncated map value")
            value = decodeMessage(b, o2, o2 + len.toInt, child.get); o2 + len.toInt
          case other =>
            throw new IllegalArgumentException(s"illegal map value type $other")
        }
        case _ => // unknown entry field: skip (wire type from tag)
          (tag & 7).toInt match {
            case 0 => readVarint(b, o1)._2
            case 1 => o1 + 8
            case 2 =>
              val (len, o2) = readVarint(b, o1)
              require(len >= 0 && o2 + len <= b.length, "truncated unknown entry field")
              o2 + len.toInt
            case 5 => o1 + 4
            case other =>
              throw new IllegalArgumentException(s"unsupported wire type $other")
          }
      }
    }
    (key, value)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "proto_decode"
}
