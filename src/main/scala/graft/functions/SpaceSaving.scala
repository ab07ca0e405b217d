package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.nio.charset.StandardCharsets.UTF_8
import scala.collection.mutable

/**
 * SpaceSaving heavy-hitters sketch (Metwally, Agrawal & El Abbadi 2005,
 * "Efficient computation of frequent and top-k elements in data
 * streams") as a TypedImperativeAggregate — the deterministic-guarantee
 * sibling of [[Cms]]: CMS answers point frequencies probabilistically;
 * SpaceSaving TRACKS the heavy items themselves with hard bounds from m
 * counters (reference counterpart: the per-key backlog/rate rankings the
 * broker keeps, e.g. pulsar-broker/.../TopKBundles.java — top-k over an
 * unbounded key domain in bounded space).
 *
 * Per-stream guarantees (m counters over N updates):
 *  - tracked items: `count − err ≤ true ≤ count` (count never
 *    undercounts);
 *  - any item with `true > N/m` IS tracked;
 *  - err ≤ N/m for every counter.
 *
 * Merge follows the parallel SpaceSaving rule (Cafaro, Pulimeno &
 * Tempesta 2016): an item absent from one side is charged that side's
 * minimum count (its maximum possible hidden frequency) as both count
 * and error, then the union is truncated to the top m by count. The
 * three guarantees above survive the merge with N = N_A + N_B.
 *
 * Update is O(1) amortized via a HashMap; eviction scans for the min
 * counter, O(m) — at the sketch sizes that matter (m ≤ 4096) the scan is
 * a cache-resident pass, and the aggregate stays map-side-combined: the
 * only thing that crosses the wire per partition is the serialized
 * sketch, never per-key rows.
 *
 * Binary layout: [m:int][n:int] then n × ([len:int][utf8][count:long]
 * [err:long]); merge validates capacity equality so mismatched sketches
 * fail loudly.
 */
object SpaceSaving {
  val DefaultCapacity = 256

  def ss_sketch(c: Column, m: Int = DefaultCapacity): Column =
    ColumnBridge.column(
      SsSketchAgg(ColumnBridge.expression(c), m).toAggregateExpression())

  /** Merge pre-computed sketches (BINARY column → one sketch). */
  def ss_merge(sketches: Column): Column =
    ColumnBridge.column(
      SsMergeAgg(ColumnBridge.expression(sketches)).toAggregateExpression())

  /** Probe one item: struct(tracked, est, err). Untracked items report
    * est = err = the sketch's min count (their maximum possible count —
    * the same charge the merge applies). */
  def ss_probe(sketch: Column, item: Column): Column =
    ColumnBridge.column(SsProbeExpr(
      ColumnBridge.expression(sketch), ColumnBridge.expression(item)))

  /** Top-k tracked items: array of struct(item, est, err), ordered by
    * (est desc, item asc) — deterministic for a given sketch. */
  def ss_topk(sketch: Column, k: Int): Column =
    ColumnBridge.column(SsTopkExpr(ColumnBridge.expression(sketch), k))

  // ---- core counter math ----

  /** counters: item → (count, err). */
  final class Buffer(val m: Int,
                     val counters: mutable.HashMap[String, (Long, Long)]) {
    def minCount: Long =
      if (counters.isEmpty) 0L else counters.valuesIterator.map(_._1).min
  }

  def empty(m: Int): Buffer = {
    require(m >= 1 && m <= (1 << 20), s"capacity in [1, 2^20], got $m")
    new Buffer(m, mutable.HashMap.empty)
  }

  def keyOf(v: Any): String = v match {
    case u: UTF8String => u.toString
    case other => String.valueOf(other)
  }

  def update(buf: Buffer, item: String): Unit = {
    buf.counters.get(item) match {
      case Some((c, e)) => buf.counters.update(item, (c + 1, e))
      case None if buf.counters.size < buf.m =>
        buf.counters.update(item, (1L, 0L))
      case None =>
        // evict a minimum-count item; tie-break lexicographically so a
        // given input order always yields the same sketch
        val (victim, (minC, _)) = buf.counters.iterator.reduce { (a, b) =>
          if (a._2._1 < b._2._1 || (a._2._1 == b._2._1 && a._1 < b._1)) a else b
        }
        buf.counters.remove(victim)
        buf.counters.update(item, (minC + 1, minC))
    }
  }

  /** Cafaro-Pulimeno-Tempesta parallel merge: absent items are charged
    * the other side's min count as count AND error, union truncated to
    * the top m by (count desc, item asc). */
  def merge(a: Buffer, b: Buffer): Buffer = {
    require(a.m == b.m, s"sketch capacity mismatch: ${a.m} vs ${b.m}")
    if (a.counters.isEmpty) return b
    if (b.counters.isEmpty) return a
    val epsA = if (a.counters.size == a.m) a.minCount else 0L
    val epsB = if (b.counters.size == b.m) b.minCount else 0L
    val out = mutable.HashMap.empty[String, (Long, Long)]
    (a.counters.keysIterator ++ b.counters.keysIterator).foreach { item =>
      if (!out.contains(item)) {
        val (ca, ea) = a.counters.getOrElse(item, (epsA, epsA))
        val (cb, eb) = b.counters.getOrElse(item, (epsB, epsB))
        out.update(item, (ca + cb, ea + eb))
      }
    }
    val kept =
      if (out.size <= a.m) out
      else mutable.HashMap.from(out.toSeq
        .sortBy { case (item, (c, _)) => (-c, item) }.take(a.m))
    new Buffer(a.m, kept)
  }

  def serialize(buf: Buffer): Array[Byte] = {
    val entries = buf.counters.toSeq.sortBy { case (item, (c, _)) => (-c, item) }
    val itemBytes = entries.map { case (item, _) => item.getBytes(UTF_8) }
    val size = 8 + itemBytes.map(_.length + 20).sum
    val bb = java.nio.ByteBuffer.allocate(size)
    bb.putInt(buf.m); bb.putInt(entries.size)
    entries.zip(itemBytes).foreach { case ((_, (c, e)), ib) =>
      bb.putInt(ib.length); bb.put(ib); bb.putLong(c); bb.putLong(e)
    }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Buffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val m = bb.getInt; val n = bb.getInt
    val counters = mutable.HashMap.empty[String, (Long, Long)]
    (0 until n).foreach { _ =>
      val ib = new Array[Byte](bb.getInt)
      bb.get(ib)
      counters.update(new String(ib, UTF_8), (bb.getLong, bb.getLong))
    }
    new Buffer(m, counters)
  }

  val ProbeType: StructType = StructType(Seq(
    StructField("tracked", BooleanType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("err", LongType, nullable = false)))

  val TopkEntryType: StructType = StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("err", LongType, nullable = false)))
}

/** Aggregate raw values into a SpaceSaving sketch (BINARY). */
case class SsSketchAgg(child: Expression, m: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[SpaceSaving.Buffer] {
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def createAggregationBuffer(): SpaceSaving.Buffer = SpaceSaving.empty(m)
  override def update(buf: SpaceSaving.Buffer, input: InternalRow): SpaceSaving.Buffer = {
    val v = child.eval(input)
    if (v != null) SpaceSaving.update(buf, SpaceSaving.keyOf(v))
    buf
  }
  override def merge(a: SpaceSaving.Buffer, b: SpaceSaving.Buffer): SpaceSaving.Buffer =
    SpaceSaving.merge(a, b)
  override def eval(buf: SpaceSaving.Buffer): Any = SpaceSaving.serialize(buf)
  override def serialize(buf: SpaceSaving.Buffer): Array[Byte] = SpaceSaving.serialize(buf)
  override def deserialize(bytes: Array[Byte]): SpaceSaving.Buffer =
    SpaceSaving.deserialize(bytes)
  override def withNewMutableAggBufferOffset(o: Int) = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int) = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
  override def prettyName: String = "ss_sketch"
}

/** Merge pre-computed SpaceSaving sketches. */
case class SsMergeAgg(child: Expression,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[SpaceSaving.Buffer] {
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def createAggregationBuffer(): SpaceSaving.Buffer =
    new SpaceSaving.Buffer(-1, scala.collection.mutable.HashMap.empty)
  override def update(buf: SpaceSaving.Buffer, input: InternalRow): SpaceSaving.Buffer = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val sk = SpaceSaving.deserialize(v.asInstanceOf[Array[Byte]])
      if (buf.m == -1) sk else SpaceSaving.merge(buf, sk)
    }
  }
  override def merge(a: SpaceSaving.Buffer, b: SpaceSaving.Buffer): SpaceSaving.Buffer =
    if (a.m == -1) b else if (b.m == -1) a else SpaceSaving.merge(a, b)
  override def eval(buf: SpaceSaving.Buffer): Any =
    SpaceSaving.serialize(if (buf.m == -1) SpaceSaving.empty(1) else buf)
  override def serialize(buf: SpaceSaving.Buffer): Array[Byte] = SpaceSaving.serialize(buf)
  override def deserialize(bytes: Array[Byte]): SpaceSaving.Buffer =
    SpaceSaving.deserialize(bytes)
  override def withNewMutableAggBufferOffset(o: Int) = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int) = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]) =
    copy(child = c.head)
  override def prettyName: String = "ss_merge"
}

/** Scalar probe: ss_probe(sketch, item) → struct(tracked, est, err). */
case class SsProbeExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = SpaceSaving.ProbeType
  override protected def nullSafeEval(sk: Any, item: Any): Any = {
    val buf = SpaceSaving.deserialize(sk.asInstanceOf[Array[Byte]])
    buf.counters.get(SpaceSaving.keyOf(item)) match {
      case Some((c, e)) => InternalRow(true, c, e)
      case None => val min = buf.minCount; InternalRow(false, min, min)
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "ss_probe"
}

/** Scalar top-k: ss_topk(sketch, k) → array<struct(item, est, err)>. */
case class SsTopkExpr(child: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression with CodegenFallback {
  require(k >= 1, s"k must be >= 1, got $k")
  override def dataType: DataType = ArrayType(SpaceSaving.TopkEntryType, containsNull = false)
  override protected def nullSafeEval(sk: Any): Any = {
    val buf = SpaceSaving.deserialize(sk.asInstanceOf[Array[Byte]])
    val top = buf.counters.toSeq
      .sortBy { case (item, (c, _)) => (-c, item) }.take(k)
      .map { case (item, (c, e)) =>
        InternalRow(UTF8String.fromString(item), c, e) }
    new GenericArrayData(top.toArray[Any])
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "ss_topk"
}
