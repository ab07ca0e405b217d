package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Count-Min sketch (Cormode & Muthukrishnan 2005) as a
 * TypedImperativeAggregate with an exposed, mergeable binary
 * representation — the frequency-sketch sibling of [[Hll]]: HLL answers
 * "how many distinct", CMS answers "how often does X occur" from the
 * same sketch-per-partition-merge-at-query-time pattern that wins at
 * 100 TB (the reference's rate/backlog accounting keeps per-key counters
 * in cursor state — reference
 * pulsar-broker/.../persistent/PersistentSubscription.java backlog
 * tracking; a CMS gives the same signal in O(d·w) space for unbounded
 * key domains).
 *
 * Guarantees (d rows × w counters, row r hashed with seed r):
 * estimate = min over rows ≥ true count ALWAYS (counters only ever
 * overcount); estimate ≤ true + ε·N with probability 1−δ for ε = e/w,
 * δ = e^−d. Merge = element-wise sum — exact, order-independent.
 *
 * Binary layout: [depth:int][width:int][d·w big-endian longs]; merge
 * validates the geometry so sketches of different shapes fail loudly.
 */
object Cms {
  val DefaultDepth = 5
  val DefaultWidth = 2048

  def cms_sketch(c: Column, depth: Int = DefaultDepth,
                 width: Int = DefaultWidth): Column =
    ColumnBridge.column(
      CmsSketchAgg(ColumnBridge.expression(c), depth, width).toAggregateExpression())

  /** Merge pre-computed sketches (BINARY column → one sketch). */
  def cms_merge(sketches: Column): Column =
    ColumnBridge.column(
      CmsMergeAgg(ColumnBridge.expression(sketches)).toAggregateExpression())

  /** Point-frequency estimate of `value` from a sketch. */
  def cms_estimate(sketch: Column, value: Column): Column =
    ColumnBridge.column(CmsEstimateExpr(
      ColumnBridge.expression(sketch), ColumnBridge.expression(value)))

  // ---- core counter math ----

  def empty(depth: Int, width: Int): Array[Long] = {
    require(depth >= 1 && depth <= 16, s"depth in [1,16], got $depth")
    require(width >= 16 && (width & (width - 1)) == 0,
      s"width must be a power of two >= 16, got $width")
    val a = new Array[Long](2 + depth * width)
    a(0) = depth; a(1) = width
    a
  }

  def depth(sk: Array[Long]): Int = sk(0).toInt
  def width(sk: Array[Long]): Int = sk(1).toInt

  def hashAny(v: Any, seed: Long): Long = v match {
    case s: UTF8String =>
      XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)
    case b: Array[Byte] =>
      XXH64.hashUnsafeBytes(b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length, seed)
    case l: Long => XXH64.hashLong(l, seed)
    case i: Int => XXH64.hashLong(i.toLong, seed)
    case other => XXH64.hashLong(other.hashCode().toLong, seed)
  }

  def update(sk: Array[Long], v: Any, n: Long = 1L): Unit = {
    val d = depth(sk); val w = width(sk)
    var r = 0
    while (r < d) {
      val idx = (hashAny(v, r.toLong) & (w - 1)).toInt
      sk(2 + r * w + idx) += n
      r += 1
    }
  }

  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    require(a(0) == b(0) && a(1) == b(1),
      s"sketch geometry mismatch: ${a(0)}x${a(1)} vs ${b(0)}x${b(1)}")
    val out = a.clone()
    var i = 2
    while (i < out.length) { out(i) += b(i); i += 1 }
    out
  }

  def estimate(sk: Array[Long], v: Any): Long = {
    val d = depth(sk); val w = width(sk)
    var best = Long.MaxValue
    var r = 0
    while (r < d) {
      val idx = (hashAny(v, r.toLong) & (w - 1)).toInt
      val c = sk(2 + r * w + idx)
      if (c < best) best = c
      r += 1
    }
    best
  }

  def serialize(sk: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(sk.length * 8)
    sk.foreach(bb.putLong)
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }
}

/** Aggregate raw values into a CMS (BINARY). */
case class CmsSketchAgg(child: Expression, d: Int, w: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def createAggregationBuffer(): Array[Long] = Cms.empty(d, w)
  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) Cms.update(buf, v)
    buf
  }
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = Cms.merge(a, b)
  override def eval(buf: Array[Long]): Any = Cms.serialize(buf)
  override def serialize(buf: Array[Long]): Array[Byte] = Cms.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] = Cms.deserialize(bytes)
  override def withNewMutableAggBufferOffset(o: Int) = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int) = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
  override def prettyName: String = "cms_sketch"
}

/** Merge pre-computed CMS sketches. */
case class CmsMergeAgg(child: Expression,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray
  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val sk = Cms.deserialize(v.asInstanceOf[Array[Byte]])
      if (buf.isEmpty) sk else Cms.merge(buf, sk)
    }
  }
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.isEmpty) b else if (b.isEmpty) a else Cms.merge(a, b)
  override def eval(buf: Array[Long]): Any = Cms.serialize(buf)
  override def serialize(buf: Array[Long]): Array[Byte] = Cms.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] = Cms.deserialize(bytes)
  override def withNewMutableAggBufferOffset(o: Int) = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int) = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
  override def prettyName: String = "cms_merge"
}

/** Scalar point estimate: cms_estimate(sketch, value). */
case class CmsEstimateExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(sk: Any, v: Any): Any =
    Cms.estimate(Cms.deserialize(sk.asInstanceOf[Array[Byte]]), v)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "cms_estimate"
}
