package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, SpecializedGetters, UnaryExpression}
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
 *    repeated `message{1:k:key,2:v:value}` entry per pair. An omitted
 *    entry key/value decodes to the proto3 default — for message
 *    values that is the DEFAULT INSTANCE (empty message), exactly what
 *    the protobuf runtime produces, never null (the Catalyst MapType
 *    advertises valueContainsNull=false and decode honors it). A
 *    duplicate map key is LAST-WINS, matching every protobuf runtime.
 *
 * All length-delimited reads are bounded by the ENCLOSING message/block
 * boundary, not just the buffer end — an element that straddles its
 * container's end is malformed input and fails loudly instead of
 * silently re-parsing bytes that belong to the next field.
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

  /** Returns (value, next offset); reads never pass `limit` (the
    * enclosing message/block boundary). */
  private[functions] def readVarint(b: Array[Byte], off: Int, limit: Int): (Long, Int) = {
    var v = 0L; var shift = 0; var i = off
    while ({
      require(i < limit && shift < 64, "truncated varint")
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

  /** Returns (decoded value, next offset), bounded by `limit`. The
    * length guard rejects a malformed 10-byte negative varint that
    * would otherwise move the offset BACKWARDS through `o2 + len`. */
  private[functions] def readScalarPayload(b: Array[Byte], off: Int, limit: Int,
                                           s: PScalar): (Any, Int) = s.t match {
    case "int64" => readVarint(b, off, limit)
    case "int32" => val (x, o) = readVarint(b, off, limit); (x.toInt, o)
    case "bool" => val (x, o) = readVarint(b, off, limit); (x != 0L, o)
    case "double" =>
      require(off + 8 <= limit, "truncated fixed64")
      var bits = 0L
      (0 until 8).foreach(k => bits |= (b(off + k) & 0xFFL) << (8 * k))
      (java.lang.Double.longBitsToDouble(bits), off + 8)
    case "float" =>
      require(off + 4 <= limit, "truncated fixed32")
      var bits = 0
      (0 until 4).foreach(k => bits |= (b(off + k) & 0xFF) << (8 * k))
      (java.lang.Float.intBitsToFloat(bits), off + 4)
    case "string" =>
      val (len, o2) = readVarint(b, off, limit)
      require(len >= 0 && o2 + len <= limit, "truncated string")
      (UTF8String.fromBytes(b, o2, len.toInt), o2 + len.toInt)
    case "bytes" =>
      val (len, o2) = readVarint(b, off, limit)
      require(len >= 0 && o2 + len <= limit, "truncated bytes")
      (java.util.Arrays.copyOfRange(b, o2, o2 + len.toInt), o2 + len.toInt)
  }

  /** Skip an unknown field's payload by wire type, bounded by `limit`. */
  private[functions] def skipField(b: Array[Byte], off: Int, limit: Int,
                                   wt: Int): Int = wt match {
    case 0 => readVarint(b, off, limit)._2
    case 1 => require(off + 8 <= limit, "truncated fixed64 skip"); off + 8
    case 2 =>
      val (len, o2) = readVarint(b, off, limit)
      require(len >= 0 && o2 + len <= limit, "truncated unknown field")
      o2 + len.toInt
    case 5 => require(off + 4 <= limit, "truncated fixed32 skip"); off + 4
    case other =>
      throw new IllegalArgumentException(s"unsupported wire type $other")
  }

  private[functions] def proto3Default(t: PScalar): Any = t.t match {
    case "int64" => 0L
    case "int32" => 0
    case "bool" => false
    case "double" => 0.0
    case "float" => 0f
    case "string" => UTF8String.EMPTY_UTF8
    case "bytes" => Array.emptyByteArray
  }
}

/** struct → protobuf message bytes (recursive over nested messages,
  * repeated fields and maps). */
case class ProtoEncodeExpr(child: Expression, spec: String)
    extends UnaryExpression with CodegenFallback {
  import ProtoSerde._
  override def dataType: DataType = BinaryType

  /** Per-message-node encode tables resolved ONCE: spec fields resolve
    * input ordinals BY NAME per level (the input struct's field order
    * never has to match the spec), so the hot path never re-resolves
    * names per row. */
  private final class EncNode(fs: Seq[PField], st: StructType) {
    val slots: Array[(PField, Int, DataType)] = fs.map { f =>
      val i = st.fieldIndex(f.name)
      (f, i, st.fields(i).dataType)
    }.toArray
    val children: Map[Int, EncNode] = fs.flatMap { f =>
      val dt = st.fields(st.fieldIndex(f.name)).dataType
      f.tpe match {
        case m: PMessage =>
          Some(f.num -> new EncNode(m.fields, dt.asInstanceOf[StructType]))
        case PRepeated(m: PMessage) =>
          Some(f.num -> new EncNode(m.fields,
            dt.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]))
        case PMap(_, m: PMessage) =>
          Some(f.num -> new EncNode(m.fields,
            dt.asInstanceOf[MapType].valueType.asInstanceOf[StructType]))
        case _ => None
      }
    }.toMap
  }
  @transient private lazy val encRoot =
    new EncNode(parseSpec(spec), child.dataType.asInstanceOf[StructType])

  override def nullSafeEval(v: Any): Any = {
    val out = new ByteArrayOutputStream()
    encodeMessage(v.asInstanceOf[InternalRow], encRoot, out)
    out.toByteArray
  }

  private def encodeMessage(row: InternalRow, node: EncNode,
                            out: ByteArrayOutputStream): Unit =
    node.slots.foreach { case (f, i, dt) =>
      if (!row.isNullAt(i)) encodeField(out, f.num, f.tpe, row, i, dt, node)
    }

  private def encodeField(out: ByteArrayOutputStream, num: Int, t: PType,
                          g: SpecializedGetters, i: Int, dt: DataType,
                          node: EncNode): Unit = t match {
    case s: PScalar =>
      writeVarint(out, (num.toLong << 3) | s.wireType)
      writeScalarPayload(out, s, g, i)
    case m: PMessage =>
      val bo = new ByteArrayOutputStream()
      encodeMessage(g.getStruct(i, m.fields.size), node.children(num), bo)
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
            encodeField(out, num, elem, arr, j, elemDt, node)
          }
      }
    case PMap(k, v) =>
      // per spec: map<K,V> IS repeated message{1:K:key,2:V:value}
      val m = g.getMap(i)
      val mt = dt.asInstanceOf[MapType]
      val keys = m.keyArray(); val vals = m.valueArray()
      (0 until m.numElements()).foreach { j =>
        val bo = new ByteArrayOutputStream()
        encodeField(bo, 1, k, keys, j, mt.keyType, node)
        // a null value encodes as an omitted entry value = the proto3
        // default instance on decode (never a null inside the map)
        if (!vals.isNullAt(j)) encodeField(bo, 2, v, vals, j, mt.valueType, node)
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
      val (tag, o1) = readVarint(b, off, until)
      val num = (tag >>> 3).toInt
      val wt = (tag & 7).toInt
      byNum.get(num) match {
        case Some((f, i)) => off = f.tpe match {
          case s: PScalar =>
            require(wt == s.wireType, s"field $num: wire type $wt, expected ${s.wireType}")
            val (x, o2) = readScalarPayload(b, o1, until, s); out(i) = x; o2
          case _: PMessage =>
            require(wt == 2, s"field $num: wire type $wt, expected 2 (message)")
            val (len, o2) = readVarint(b, o1, until)
            require(len >= 0 && o2 + len <= until, "truncated message")
            out(i) = decodeMessage(b, o2, o2 + len.toInt, r.children(num)); o2 + len.toInt
          case PRepeated(elem) => elem match {
            case s: PScalar if s.wireType != 2 =>
              if (wt == 2) { // packed block: parse payloads back-to-back
                val (len, o2) = readVarint(b, o1, until)
                require(len >= 0 && o2 + len <= until, "truncated packed field")
                val blockEnd = o2 + len.toInt
                var p = o2
                while (p < blockEnd) {
                  // bounded by the BLOCK: an element straddling the
                  // block end is malformed, not a read into the next field
                  val (x, np) = readScalarPayload(b, p, blockEnd, s); acc(i) += x; p = np
                }
                blockEnd
              } else { // expanded occurrence — parsers must accept both
                require(wt == s.wireType, s"field $num: wire type $wt")
                val (x, o2) = readScalarPayload(b, o1, until, s); acc(i) += x; o2
              }
            case s: PScalar =>
              require(wt == 2, s"field $num: wire type $wt, expected 2")
              val (x, o2) = readScalarPayload(b, o1, until, s); acc(i) += x; o2
            case _: PMessage =>
              require(wt == 2, s"field $num: wire type $wt, expected 2")
              val (len, o2) = readVarint(b, o1, until)
              require(len >= 0 && o2 + len <= until, "truncated repeated message")
              acc(i) += decodeMessage(b, o2, o2 + len.toInt, r.children(num)); o2 + len.toInt
          }
          case pm: PMap =>
            require(wt == 2, s"field $num: wire type $wt, expected 2 (map entry)")
            val (len, o2) = readVarint(b, o1, until)
            require(len >= 0 && o2 + len <= until, "truncated map entry")
            acc(i) += decodeMapEntry(b, o2, o2 + len.toInt, pm,
              r.children.get(num)); o2 + len.toInt
        }
        case None => // unknown field: skip by wire type (forward compat)
          off = skipField(b, o1, until, wt)
      }
    }
    // finalize collections: absent repeated/map == empty, per proto3;
    // duplicate map keys are LAST-WINS like every protobuf runtime
    fs.zipWithIndex.foreach {
      case (PField(_, _: PRepeated, _), i) =>
        out(i) = new GenericArrayData(acc(i).toArray)
      case (PField(_, _: PMap, _), i) =>
        val dedup = new java.util.LinkedHashMap[Any, Any]()
        acc(i).foreach { p =>
          val (k, v2) = p.asInstanceOf[(Any, Any)]
          dedup.remove(k): Unit // re-insert so a dup key takes the LAST position
          dedup.put(k, v2): Unit
        }
        val ks = new Array[Any](dedup.size()); val vs = new Array[Any](dedup.size())
        var j = 0
        dedup.forEach { (k, v2) => ks(j) = k; vs(j) = v2; j += 1 }
        out(i) = new ArrayBasedMapData(new GenericArrayData(ks), new GenericArrayData(vs))
      case _ =>
    }
    new GenericInternalRow(out)
  }

  /** Map entry = message{1:key,2:value}; omitted key/value decode to the
    * proto3 default — for message values the DEFAULT INSTANCE (empty
    * message), matching the protobuf runtime and never putting a null
    * inside a valueContainsNull=false map. */
  private def decodeMapEntry(b: Array[Byte], from: Int, until: Int,
                             pm: PMap, child: Option[Resolved]): (Any, Any) = {
    var key: Any = proto3Default(pm.key)
    var value: Any = pm.value match {
      case s: PScalar => proto3Default(s)
      case _: PMessage => decodeMessage(b, 0, 0, child.get) // default instance
      case other => throw new IllegalArgumentException(s"illegal map value type $other")
    }
    var off = from
    while (off < until) {
      val (tag, o1) = readVarint(b, off, until)
      val num = (tag >>> 3).toInt
      val wt = (tag & 7).toInt
      off = num match {
        case 1 =>
          require(wt == pm.key.wireType,
            s"map key: wire type $wt, expected ${pm.key.wireType}")
          val (x, o2) = readScalarPayload(b, o1, until, pm.key); key = x; o2
        case 2 => pm.value match {
          case s: PScalar =>
            require(wt == s.wireType,
              s"map value: wire type $wt, expected ${s.wireType}")
            val (x, o2) = readScalarPayload(b, o1, until, s); value = x; o2
          case _: PMessage =>
            require(wt == 2, s"map value: wire type $wt, expected 2 (message)")
            val (len, o2) = readVarint(b, o1, until)
            require(len >= 0 && o2 + len <= until, "truncated map value")
            value = decodeMessage(b, o2, o2 + len.toInt, child.get); o2 + len.toInt
          case other =>
            throw new IllegalArgumentException(s"illegal map value type $other")
        }
        case _ => // unknown entry field: skip by wire type
          skipField(b, o1, until, wt)
      }
    }
    (key, value)
  }

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "proto_decode"
}
