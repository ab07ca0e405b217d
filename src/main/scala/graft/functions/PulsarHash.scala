package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Murmur3 x86 32-bit (seed = 0) over a key's UTF-8 bytes, masked to
 * non-negative — the sticky-key hash the reference uses for Key_Shared
 * dispatch and key-based routing.
 *
 * Behavioral spec (no code reuse): reference
 * pulsar-common/.../util/Murmur3_32Hash.java:55 (`makeHash = murmur3_32 &
 * Integer.MAX_VALUE`); consumers map it onto a 65536-slot ring
 * (pulsar-client-api/.../KeySharedPolicy.java:81 DEFAULT_HASH_RANGE_SIZE).
 * MurmurHash3 itself is public domain (Austin Appleby).
 *
 * Implemented as a Catalyst Expression with codegen so routing stays inside
 * whole-stage codegen (a Scala UDF here would break the hot path on every
 * produce/dispatch at 100 TB).
 */
object Murmur3Pulsar {
  final val HashRangeSize = 65536 // KeySharedPolicy.java:81

  def hashBytes(bytes: Array[Byte]): Int = {
    val c1 = 0xcc9e2d51
    val c2 = 0x1b873593
    val len = bytes.length
    var h1 = 0 // seed
    var i = 0
    // 4-byte little-endian chunks
    while (i + 4 <= len) {
      var k1 = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8) |
        ((bytes(i + 2) & 0xff) << 16) | ((bytes(i + 3) & 0xff) << 24)
      k1 *= c1
      k1 = Integer.rotateLeft(k1, 15)
      k1 *= c2
      h1 ^= k1
      h1 = Integer.rotateLeft(h1, 13)
      h1 = h1 * 5 + 0xe6546b64
      i += 4
    }
    // tail
    var k1 = 0
    var shift = 0
    while (i < len) {
      k1 ^= (bytes(i) & 0xff) << shift
      shift += 8
      i += 1
    }
    // finalize: the reference XORs the mixed tail into h1 (not the
    // standard h1 ^= which is identical for the tail mix), then len, fmix
    var kk = k1
    kk *= c1
    kk = Integer.rotateLeft(kk, 15)
    kk *= c2
    h1 ^= kk
    h1 ^= len
    h1 ^= h1 >>> 16
    h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13
    h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1 & Integer.MAX_VALUE
  }

  def hashString(s: UTF8String): Int = hashBytes(s.getBytes)

  /** murmur3_32 (seed 0) of a 4-byte little-endian int — equal to
    * `hashBytes` of the int's LE bytes, but branch-free. Used as the
    * deterministic "randomness" for LSH hyperplanes because it is
    * reproducible in pure DuckDB SQL (the `mm3_i4` oracle macro),
    * unlike splitmix64 whose 64-bit wrapping arithmetic is not. */
  def hashInt(k0: Int): Int = {
    var k1 = k0 * 0xcc9e2d51
    k1 = Integer.rotateLeft(k1, 15)
    k1 *= 0x1b873593
    var h1 = k1 // seed 0
    h1 = Integer.rotateLeft(h1, 13)
    h1 = h1 * 5 + 0xe6546b64
    h1 ^= 4 // length
    h1 ^= h1 >>> 16
    h1 *= 0x85ebca6b
    h1 ^= h1 >>> 13
    h1 *= 0xc2b2ae35
    h1 ^= h1 >>> 16
    h1 & Integer.MAX_VALUE
  }

  /** Column API: non-negative murmur3_32 of the UTF-8 key. */
  def pulsar_hash(c: Column): Column =
    ColumnBridge.column(PulsarHashExpr(ColumnBridge.expression(c)))

  /** Slot on the 65536-slot Key_Shared ring. */
  def sticky_key_slot(c: Column): Column = pulsar_hash(c) % HashRangeSize
}

case class PulsarHashExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes() = {
    if (child.dataType == StringType || child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"pulsar_hash needs STRING or BINARY, got ${child.dataType}")
  }

  override def nullSafeEval(v: Any): Any = v match {
    case s: UTF8String  => Murmur3Pulsar.hashString(s)
    case b: Array[Byte] => Murmur3Pulsar.hashBytes(b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val hasher = Murmur3Pulsar.getClass.getName.stripSuffix("$") + "$.MODULE$"
    val conv = if (child.dataType == StringType) ".getBytes()" else ""
    defineCodeGen(ctx, ev, c => s"$hasher.hashBytes($c$conv)")
  }

  override protected def withNewChildInternal(newChild: Expression): PulsarHashExpr =
    copy(child = newChild)

  override def prettyName: String = "pulsar_hash"
}
