package graft

import org.apache.spark.sql.functions._

import graft.model.Envelope
import graft.operators.Dispatch

/**
 * Key_Shared per-key ORDER-DURING-REBALANCE guarantee (VERDICT r8 #3).
 *
 * Reference semantics (behavioral spec only):
 *  - `DrainingHashesTracker.java` — when a hash slot moves to a joining
 *    consumer, the hash is tracked as "draining": the NEW consumer
 *    receives nothing for that hash until every pending (unacked)
 *    message on the OLD consumer is acked (`reduceRefCount` →
 *    `unblockingHandler` once the refcount hits zero).
 *  - `PersistentStickyKeyDispatcherMultipleConsumers.java:181` — pending
 *    acks are registered per (consumer, stickyKeyHash) at dispatch, so
 *    the drain point is exactly the old consumer's highest in-flight
 *    position for that hash.
 *
 * The consequence the reference buys with all that machinery: for every
 * key, the dispatch sequence ordered by position is a PREFIX on the old
 * owner followed by a SUFFIX on the new owner — never old→new→old
 * interleaving, and never concurrent delivery of one key to two
 * consumers. [[Dispatch.keySharedRebalance]] models the drain point as
 * the per-partition `drainedUpTo` cursor; this spec proves the same
 * prefix property holds for every key under that model, and that the
 * static-assignment default (no cursor) is the degenerate strongest
 * case (handover exactly at the membership-change epoch).
 */
class KeySharedDrainSpec extends SparkSpec {

  private val oldC = Seq("c1", "c2", "c3")
  private val newC = Seq("c1", "c2", "c3", "c4")

  private def rebalanced(drained: Map[Int, Long]) =
    Dispatch.keySharedRebalance(
      Envelope.fromEvents(spark, sf001), oldC, newC, drainedUpTo = drained)
      .select(col(Envelope.Key), col(Envelope.Partition), col(Envelope.Offset),
        col("slot"), col("consumer_before"), col("consumer_after"),
        col("moved"), col("consumer_id"))
      .cache()

  // mid-partition drain cursors (median offset per partition) so moved
  // slots really split across the handover
  private lazy val cursors: Map[Int, Long] =
    Envelope.fromEvents(spark, sf001)
      .groupBy(Envelope.Partition)
      .agg(expr(s"percentile_approx(${Envelope.Offset}, 0.5)").as("c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap

  test("unmoved keys never change consumer across the membership change") {
    val df = rebalanced(cursors)
    assert(df.filter(!col("moved") &&
      (col("consumer_id") =!= col("consumer_before") ||
        col("consumer_id") =!= col("consumer_after"))).count() == 0L)
  }

  test("consistent-hash ADD moves slots only TO the joining consumer") {
    val df = rebalanced(cursors)
    val moved = df.filter(col("moved"))
    assert(moved.count() > 0L, "fixture produced no moved slots — widen the ring change")
    assert(moved.filter(col("consumer_after") =!= "c4").count() == 0L)
  }

  test("per-key dispatch is a prefix on the old owner then a suffix on the new owner") {
    val df = rebalanced(cursors)
    // For every moved key: max offset routed to the old owner must be
    // strictly below min offset routed to the new owner — the reference's
    // drain guarantee (no interleave, no concurrent two-consumer delivery).
    val perKey = df.filter(col("moved"))
      .groupBy(Envelope.Key, Envelope.Partition)
      .agg(
        max(when(col("consumer_id") === col("consumer_before"),
          col(Envelope.Offset))).as("old_max"),
        min(when(col("consumer_id") === col("consumer_after"),
          col(Envelope.Offset))).as("new_min"))
    val interleaved = perKey
      .filter(col("old_max").isNotNull && col("new_min").isNotNull &&
        col("old_max") >= col("new_min"))
    assert(interleaved.count() == 0L)
    // and the split is real: some moved key actually has rows on both
    // sides of the drain point, so the prefix property is exercised,
    // not vacuous
    assert(perKey.filter(col("old_max").isNotNull &&
      col("new_min").isNotNull).count() > 0L)
  }

  test("rows at or below the drain cursor stay with the old owner; above go to the new") {
    val df = rebalanced(cursors)
    val cur = typedLit(cursors)
    val wrongSide = df.filter(col("moved")).filter(
      (col(Envelope.Offset) <= element_at(cur, col(Envelope.Partition)) &&
        col("consumer_id") =!= col("consumer_before")) ||
      (col(Envelope.Offset) > element_at(cur, col(Envelope.Partition)) &&
        col("consumer_id") =!= col("consumer_after")))
    assert(wrongSide.count() == 0L)
  }

  test("a key with nothing in flight hands over wholesale (drain already complete)") {
    // cursors PRESENT but below every offset == no pending messages on
    // the old owner: the reference unblocks immediately and the new
    // consumer takes the whole key; our model must route every moved
    // row to the new owner. This is the present-but-below-min cursor
    // path — distinct from the absent-cursor (static) test below, which
    // exercises the coalesce-to-MinValue fallback instead.
    val belowMin = Envelope.fromEvents(spark, sf001)
      .select(Envelope.Partition).distinct()
      .collect().map(_.getInt(0) -> -1L).toMap
    assert(belowMin.nonEmpty)
    val df = rebalanced(belowMin)
    assert(df.filter(col("moved") &&
      col("consumer_id") =!= col("consumer_after")).count() == 0L)
  }

  test("static assignment (no cursor) is the strongest case: handover exactly at the epoch") {
    // the documented "static assignment is stronger, no rebalance" claim
    // (SURVEY §7.4): with no drain cursor the old owner keeps NOTHING
    // past the membership change — per-key order holds trivially because
    // each epoch's assignment is a pure function of the key
    val df = rebalanced(Map.empty)
    val twoOwners = df.filter(col("moved"))
      .groupBy(Envelope.Key, Envelope.Partition)
      .agg(countDistinct("consumer_id").as("owners"))
      .filter(col("owners") > 1)
    assert(twoOwners.count() == 0L)
  }
}
