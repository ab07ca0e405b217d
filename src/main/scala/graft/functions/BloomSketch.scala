package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/**
 * Bloom filter (Bloom 1970) as a TypedImperativeAggregate with an
 * exposed, mergeable binary form — the membership member of the sketch
 * family (HLL distinct / CMS frequency / KMV quantiles / Bloom
 * membership). k probe positions per element via double hashing
 * (Kirsch & Mitzenmacher 2006: h_i = h1 + i·h2 over xxhash64 seeds 0/1
 * — full k-independence is unnecessary for the standard FP bound).
 *
 * Guarantees: NO false negatives ever (bits only turn on); false
 * positive rate ≈ (1 − e^(−k·n/m))^k. Merge = bitwise OR — exact,
 * order-independent. The 100 TB pattern it unlocks: broadcast a
 * kilobytes-to-megabytes bloom of a small set (eval-set shingles,
 * known-URL fingerprints) and pre-filter a TB-scale corpus map-side,
 * with an exact join afterwards only over the survivors — see
 * [[graft.ext.TextOps.contaminationReportBloom]].
 *
 * Binary layout: [k:int][nWords:int][words: long…]; m = 64·nWords bits.
 */
object Bloom {
  val DefaultBits = 1 << 17 // 16 KiB
  val DefaultK = 5

  def bloom_sketch(c: Column, bits: Int = DefaultBits, k: Int = DefaultK): Column =
    ColumnBridge.column(BloomSketchAgg(
      ColumnBridge.expression(c), bits, k).toAggregateExpression())

  /** Merge pre-computed blooms (BINARY column → one bloom). */
  def bloom_merge(sketches: Column): Column =
    ColumnBridge.column(
      BloomMergeAgg(ColumnBridge.expression(sketches)).toAggregateExpression())

  /** Membership probe: false = definitely absent, true = probably present. */
  def bloom_contains(sketch: Column, value: Column): Column =
    ColumnBridge.column(BloomContainsExpr(
      ColumnBridge.expression(sketch), ColumnBridge.expression(value)))

  // ---- bit math ----

  def empty(bits: Int, k: Int): Array[Long] = {
    require(bits >= 64 && (bits & (bits - 1)) == 0,
      s"bits must be a power of two >= 64, got $bits")
    require(k >= 1 && k <= 16, s"k in [1,16], got $k")
    val a = new Array[Long](2 + bits / 64)
    a(0) = k; a(1) = bits / 64
    a
  }

  private def h1(v: Any): Long = Cms.hashAny(v, 0L)
  private def h2(v: Any): Long = Cms.hashAny(v, 1L) | 1L // odd => all-bit coverage

  def add(bf: Array[Long], v: Any): Unit = {
    val k = bf(0).toInt; val nWords = bf(1).toInt
    val mask = nWords * 64 - 1
    val a = h1(v); val b = h2(v)
    var i = 0
    while (i < k) {
      val bit = ((a + i * b) & mask).toInt
      bf(2 + (bit >> 6)) |= 1L << (bit & 63)
      i += 1
    }
  }

  def contains(bf: Array[Long], v: Any): Boolean = {
    val k = bf(0).toInt; val nWords = bf(1).toInt
    val mask = nWords * 64 - 1
    val a = h1(v); val b = h2(v)
    var i = 0
    while (i < k) {
      val bit = ((a + i * b) & mask).toInt
      if ((bf(2 + (bit >> 6)) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** Probe straight off the serialized bytes — the per-row path of the
    * broadcast-bloom pre-filter must not copy the whole filter per row;
    * this is k word reads. */
  def containsBytes(bytes: Array[Byte], v: Any): Boolean = {
    // a zero-row bloom_merge yields the canonical empty sketch (k=0
    // header, or legacy zero-length bytes): nothing was ever added, so
    // every probe is definitely absent — never an out-of-bounds read.
    if (bytes.length < 16) return false
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val k = bb.getLong(0).toInt
    val nWords = bb.getLong(8).toInt
    if (k == 0 || nWords == 0) return false
    val mask = nWords * 64 - 1
    val a = h1(v); val b = h2(v)
    var i = 0
    while (i < k) {
      val bit = ((a + i * b) & mask).toInt
      if ((bb.getLong(16 + (bit >> 6) * 8) & (1L << (bit & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** True for the canonical empty sketch (k=0 header from a zero-row
    * bloom_merge) or a legacy zero-length buffer. */
  def isEmptySketch(bf: Array[Long]): Boolean =
    bf.length < 2 || bf(0) == 0L || bf(1) == 0L

  def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    // the empty sketch is the merge IDENTITY: a group with only-null
    // inputs rolls up into real sketches without a geometry mismatch
    if (isEmptySketch(x)) return y
    if (isEmptySketch(y)) return x
    require(x(0) == y(0) && x(1) == y(1),
      s"bloom geometry mismatch: k=${x(0)},words=${x(1)} vs k=${y(0)},words=${y(1)}")
    val out = x.clone()
    var i = 2
    while (i < out.length) { out(i) |= y(i); i += 1 }
    out
  }

  def serialize(bf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(bf.length * 8)
    bf.foreach(bb.putLong)
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }
}

/** Aggregate raw values into a bloom (BINARY). */
case class BloomSketchAgg(child: Expression, bits: Int, k: Int,
                          mutableAggBufferOffset: Int = 0,
                          inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def createAggregationBuffer(): Array[Long] = Bloom.empty(bits, k)
  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) Bloom.add(buf, v)
    buf
  }
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = Bloom.merge(a, b)
  override def eval(buf: Array[Long]): Any = Bloom.serialize(buf)
  override def serialize(buf: Array[Long]): Array[Byte] = Bloom.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] = Bloom.deserialize(bytes)
  override def withNewMutableAggBufferOffset(o: Int) = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int) = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
  override def prettyName: String = "bloom_sketch"
}

/** Merge pre-computed blooms. */
case class BloomMergeAgg(child: Expression,
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
    else Bloom.merge(buf, Bloom.deserialize(v.asInstanceOf[Array[Byte]]))
  }
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] =
    if (a.isEmpty) b else if (b.isEmpty) a else Bloom.merge(a, b)
  // zero input rows → canonical empty bloom (k=0 header) rather than a
  // zero-length BINARY, so a downstream bloom_contains probe reads a
  // well-formed header and answers "definitely absent".
  override def eval(buf: Array[Long]): Any =
    Bloom.serialize(if (buf.isEmpty) Array(0L, 0L) else buf)
  override def serialize(buf: Array[Long]): Array[Byte] = Bloom.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] = Bloom.deserialize(bytes)
  override def withNewMutableAggBufferOffset(o: Int) = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int) = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
  override def prettyName: String = "bloom_merge"
}

/** Scalar membership probe: bloom_contains(sketch, value). */
case class BloomContainsExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override protected def nullSafeEval(bf: Any, v: Any): Any =
    Bloom.containsBytes(bf.asInstanceOf[Array[Byte]], v)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "bloom_contains"
}
