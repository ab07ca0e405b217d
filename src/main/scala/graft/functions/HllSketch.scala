package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * HyperLogLog distinct-count sketch as a TypedImperativeAggregate with an
 * exposed, mergeable binary representation (Flajolet et al. 2007;
 * standard m=2^p registers, max-rank update, harmonic-mean estimate with
 * small-range linear counting).
 *
 * Why custom when Spark has approx_count_distinct: that sketch is opaque
 * — it cannot be persisted per topic/partition and merged later. At
 * 100 TB the winning pattern is sketch-per-partition materialized views
 * merged at query time (counts across topics/days without rescanning);
 * [[hll_merge]] aggregates the binary sketches themselves.
 *
 * Registers are byte ranks; union = element-wise max — the same algebra
 * the reference relies on for cursor-state merges, applied to
 * cardinality.
 */
object Hll {
  val DefaultP = 12 // 4096 registers, ~1.6% standard error

  def hll_sketch(c: Column, p: Int = DefaultP): Column =
    ColumnBridge.column(
      HllSketchAgg(ColumnBridge.expression(c), p).toAggregateExpression())

  def hll_merge(sketches: Column): Column =
    ColumnBridge.column(
      HllMergeAgg(ColumnBridge.expression(sketches)).toAggregateExpression())

  def hll_estimate(sketch: Column): Column =
    ColumnBridge.column(HllEstimateExpr(ColumnBridge.expression(sketch)))

  // ---- core register math ----
  def emptyRegisters(p: Int): Array[Byte] = new Array[Byte](1 << p)

  def update(regs: Array[Byte], hash: Long): Unit = {
    val p = Integer.numberOfTrailingZeros(regs.length)
    val idx = (hash >>> (64 - p)).toInt
    val rest = hash << p
    val rank = (java.lang.Long.numberOfLeadingZeros(rest) + 1).min(64 - p).toByte
    if (rank > regs(idx)) regs(idx) = rank
  }

  def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    require(a.length == b.length, "sketch precision mismatch")
    val out = new Array[Byte](a.length)
    var i = 0
    while (i < a.length) { out(i) = if (a(i) >= b(i)) a(i) else b(i); i += 1 }
    out
  }

  def estimate(regs: Array[Byte]): Long = {
    val m = regs.length
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      sum += 1.0 / (1L << regs(i))
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val raw = alpha * m * m / sum
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) // linear counting
      else raw
    math.round(est)
  }

  def hashAny(v: Any): Long = v match {
    case s: UTF8String => org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
    case b: Array[Byte] => org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length, 42L)
    case l: Long => org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(l, 42L)
    case i: Int => org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(i.toLong, 42L)
    case other => org.apache.spark.sql.catalyst.expressions.XXH64
      .hashLong(other.hashCode().toLong, 42L)
  }
}

/** Aggregate raw values into an HLL sketch (BINARY). */
case class HllSketchAgg(child: Expression, p: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {
  require(p >= 4 && p <= 16, "precision p in [4,16]")
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def createAggregationBuffer(): Array[Byte] = Hll.emptyRegisters(p)
  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) Hll.update(buf, Hll.hashAny(v))
    buf
  }
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = Hll.merge(a, b)
  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes
  override def withNewMutableAggBufferOffset(o: Int) = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int) = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
  override def prettyName: String = "hll_sketch"
}

/** Merge pre-computed sketches (BINARY column of sketches → one sketch). */
case class HllMergeAgg(child: Expression,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray
  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val sk = v.asInstanceOf[Array[Byte]]
      if (buf.isEmpty) sk.clone() else Hll.merge(buf, sk)
    }
  }
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    if (a.isEmpty) b else if (b.isEmpty) a else Hll.merge(a, b)
  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes
  override def withNewMutableAggBufferOffset(o: Int) = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int) = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
  override def prettyName: String = "hll_merge"
}

/** Scalar estimate from a sketch. */
case class HllEstimateExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    Hll.estimate(v.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "hll_estimate"
}
