package graft

import graft.model.Envelope
import graft.operators.Dispatch
import org.apache.spark.sql.functions._

/**
 * Pins for the dispatch-tier review fixes: one sticky-key rule across
 * every Key_Shared selector (Commands.peekStickyKey: orderingKey →
 * key → NONE_KEY), cursor retention in skipMessages, and the
 * nack-time backoff anchor in dlqRoute.
 */
class DispatchFixesSpec extends SparkSpec {
  import spark.implicits._

  private def rows(withOrdering: Boolean) = {
    val base = Seq(
      ("a", Some("ok-a"), 0L),    // keyed, ordering key present
      ("b", None, 1L),            // keyed, no ordering key
      (null, None, 2L),           // keyless → NONE_KEY
      (null, Some("ok-d"), 3L))   // keyless but ordering-keyed
      .toDF(Envelope.Key, "ok_s", Envelope.Offset)
    val df = base
      .withColumn(Envelope.Topic, lit("persistent://public/default/t"))
      .withColumn(Envelope.Partition, lit(0))
    if (withOrdering)
      df.withColumn(Envelope.OrderingKey, col("ok_s").cast("binary")).drop("ok_s")
    else df.drop("ok_s")
  }

  test("every Key_Shared selector routes a row to the SAME consumer (sticky-key parity)") {
    val consumers = Seq("c1", "c2", "c3")
    val log = rows(withOrdering = true)
    def byOffset(df: org.apache.spark.sql.DataFrame, col0: String): Map[Long, Any] =
      df.select(col(Envelope.Offset), col(col0)).collect()
        .map(r => r.getLong(0) -> r.get(1)).toMap
    // slot parity is the strong claim: identical sticky key ⇒ identical
    // 65536-ring slot in every selector (consumer ids then differ only
    // by each algorithm's documented range layout)
    val even = byOffset(Dispatch.keySharedAssign(log, 3), "slot")
    val auto = byOffset(Dispatch.keySharedAutoSplit(log, consumers), "slot")
    val ring = byOffset(Dispatch.keySharedConsistentHash(log, consumers), "slot")
    assert(even == auto && auto == ring,
      s"selectors disagree on slots: even=$even auto=$auto ring=$ring")
    // null key + null ordering key: deterministic NONE_KEY slot, never a
    // null consumer and never a pile-up artifact of null propagation
    val keyless = Dispatch.keySharedConsistentHash(log, consumers)
      .filter(col(Envelope.Offset) === 2L).select("consumer_id").head()
    assert(!keyless.isNullAt(0), "keyless row must get a real consumer")
    // ordering key overrides key: offsets 0 (key=a, ok=ok-a) and a row
    // keyed ok-a directly must share a slot
    val okDirect = rows(withOrdering = false)
      .withColumn(Envelope.Key, lit("ok-a"))
    val slotDirect = byOffset(Dispatch.keySharedAssign(okDirect, 3), "slot")(0L)
    assert(even(0L) == slotDirect, "ordering key must decide the slot")
  }

  test("skipMessages keeps fully-consumed partitions in the returned cursor") {
    val log = Seq((0, 10L), (0, 11L), (1, 20L), (1, 21L))
      .toDF(Envelope.Partition, Envelope.Offset)
    // partition 0 fully consumed (cursor at its head); partition 1 has
    // two rows left
    val out = Dispatch.skipMessages(log, Map(0 -> 11L, 1 -> 19L), n = 1)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out(1) == 20L, "partition 1 advances by one")
    assert(out(0) == 11L,
      "fully-consumed partition must KEEP its cursor, not vanish " +
        "(absence reads as 'consumed nothing' and would redeliver all)")
  }

  test("dlqRoute nack-time anchor: aged messages still pause their backoff") {
    val log = Seq(("m1", 0), ("m2", 2))
      .toDF(Envelope.Value, Envelope.RedeliveryCnt)
      .withColumn(Envelope.Topic, lit("persistent://public/default/t"))
      // published an hour ago — with the publish-time anchor every
      // retry would already be due
      .withColumn(Envelope.PublishTime,
        current_timestamp() - expr("INTERVAL 1 HOUR"))
    val routed = Dispatch.dlqRoute(log, "sub", maxRedeliverCount = 5,
      backoffBaseSeconds = 60L, nackTime = Some(current_timestamp()))
    val due = routed.select(col(Envelope.Value),
      (col("next_deliver_at") > current_timestamp()).as("future")).collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(due("m1") && due("m2"),
      "nack-anchored backoff must schedule in the FUTURE for aged messages")
    // default (publish-time anchor) on the same aged rows: immediately
    // due — the documented batch-replay semantics
    val defaulted = Dispatch.dlqRoute(log, "sub", maxRedeliverCount = 5)
      .select((col("next_deliver_at") <= current_timestamp()).as("past"))
      .collect().map(_.getBoolean(0))
    assert(defaulted.forall(identity))
  }
}
