package graft.operators

import graft.model.Envelope
import graft.functions.Murmur3Pulsar
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Consumption-side dispatch operators: delayed delivery, TTL, retention,
 * admin scans (peek / last ids / skip), Key_Shared routing, negative-ack
 * redelivery, DLQ/retry routing, geo-replication loop filter.
 *
 * Each maps a broker-side imperative mechanism onto a declarative Catalyst
 * plan (SURVEY.md §2.3/2.6/2.10/2.11/2.13).
 */
object Dispatch {

  /**
   * Delayed delivery: only rows whose `deliver_at` is due dispatch at a
   * trigger; not-yet-due rows stay in the log for the next trigger.
   * Reference: InMemoryDelayedDeliveryTracker.java:117,170 (priority queue
   * of (deliverAt, ledger, entry)), dispatched in deliver-at order.
   * The log being re-readable replaces the in-memory queue; at 100 TB the
   * due check is a pruned `deliver_at <= T` parquet filter (bucket the log
   * by due-date for the BucketDelayedDeliveryTracker.java:68 analog).
   */
  def dueMessages(log: DataFrame, batchTime: Column): DataFrame =
    log.filter(col(Envelope.DeliverAt).isNull ||
      col(Envelope.DeliverAt) <= batchTime)

  /** Rows held back (scheduled in the future) at `batchTime`. */
  def scheduledAfter(log: DataFrame, batchTime: Column): DataFrame =
    log.filter(col(Envelope.DeliverAt) > batchTime)

  /**
   * TTL expiry (PersistentMessageExpiryMonitor.java:88,134): messages older
   * than ttl relative to `now` are expired (acked past); survivors remain.
   */
  def applyTtl(log: DataFrame, now: Column, ttlSeconds: Long): DataFrame =
    log.filter(col(Envelope.PublishTime) >= now - expr(s"INTERVAL $ttlSeconds SECOND"))

  /**
   * Peek first N messages per partition from a position (Topics.peekMessages):
   * smallest offsets ≥ cursor. Window-ranked; per-partition sort only.
   */
  def peek(log: DataFrame, n: Int, fromOffset: Long = 0L): DataFrame = {
    val w = Window.partitionBy(Envelope.Partition).orderBy(Envelope.Offset)
    log.filter(col(Envelope.Offset) >= fromOffset)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= n).drop("_rn")
  }

  /** Last message id per partition (Consumer.getLastMessageIds). */
  def lastMessageIds(log: DataFrame): DataFrame =
    log.groupBy(col(Envelope.Partition))
      .agg(max(Envelope.Offset).as("last_offset"))

  /**
   * Examine the single message at 1-based position `n` per partition,
   * counting from the earliest or the latest message (reference
   * Topics.examineMessage / admin `examinemessages`
   * --initialPosition earliest|latest --messagePosition N). Same
   * WindowGroupLimit shape as peek: per-partition rank, map-side
   * top-n, never a global sort.
   */
  def examineMessage(log: DataFrame, initialPosition: String, n: Long): DataFrame = {
    val order = initialPosition match {
      case "earliest" => col(Envelope.Offset).asc
      case "latest"   => col(Envelope.Offset).desc
      case other => throw new IllegalArgumentException(
        s"initialPosition must be earliest|latest, got $other")
    }
    val w = Window.partitionBy(Envelope.Partition).orderBy(order)
    log.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === n).drop("_rn")
  }

  /**
   * Key_Shared consumer assignment over the 65536-slot hash ring
   * (ConsistentHashingStickyKeyConsumerSelector.java:104; AUTO_SPLIT
   * divides the range evenly). `numConsumers` even split of [0, 65536).
   */
  /** The reference's sticky key per message (Commands.peekStickyKey,
    * pulsar-common Commands.java:1995-2023): the ordering key when
    * present, else the partition key, else the literal "NONE_KEY".
    * ONE definition for every Key_Shared selector — before this, only
    * the even-split selector honored ordering_key (the ring/auto-split/
    * sticky selectors hashed the partition key, so an ordering-keyed
    * row routed to DIFFERENT consumers depending on selector), and a
    * null key NULL-propagated through least()/element_at into either
    * the last consumer or a null consumer id instead of the reference's
    * deterministic NONE_KEY slot. */
  private[graft] def stickyRoutingKey(log: DataFrame): Column = {
    val base =
      if (log.columns.contains(Envelope.OrderingKey))
        coalesce(col(Envelope.OrderingKey).cast("string"), col(Envelope.Key))
      else col(Envelope.Key)
    coalesce(base, lit("NONE_KEY"))
  }

  def keySharedAssign(log: DataFrame, numConsumers: Int): DataFrame = {
    val slot = Murmur3Pulsar.pulsar_hash(stickyRoutingKey(log)) % Murmur3Pulsar.HashRangeSize
    val rangeSize = Murmur3Pulsar.HashRangeSize / numConsumers
    log.withColumn("slot", slot)
      .withColumn("consumer_id", least(col("slot") / rangeSize,
        lit(numConsumers - 1)).cast("int"))
  }

  /**
   * AUTO_SPLIT fixed-hash-range selector, faithful to the reference
   * algorithm (HashRangeAutoSplitStickyKeyConsumerSelector.java:94-195):
   * consumers join ONE AT A TIME; the first owns the whole range, each
   * later joiner splits the current biggest range in half (ties resolve
   * to the smallest upper bound — findBiggestRange iterates ascending
   * with a strict >), the joiner taking the LOWER half; a slot routes to
   * ceilingEntry(slot) over the range upper bounds. Note this is NOT an
   * even split by consumer index even when the count is a power of two:
   * for c1..c4 the final layout is c3 [0,16384], c2 (16384,32768],
   * c4 (32768,49152], c1 (49152,65535] — the join ORDER decides
   * ownership. [[keySharedAssign]] keeps the simple even-split model;
   * this one reproduces the reference's actual assignment.
   */
  def keySharedAutoSplit(log: DataFrame, consumers: Seq[String],
                         rangeSize: Int = Murmur3Pulsar.HashRangeSize): DataFrame = {
    require(consumers.nonEmpty)
    require(rangeSize >= 2 && (rangeSize & (rangeSize - 1)) == 0,
      "range size must be a power of two (reference is2Power check)")
    val rangeMap = scala.collection.mutable.TreeMap[Int, String]()
    consumers.foreach { c =>
      if (rangeMap.isEmpty) rangeMap.put(rangeSize, c): Unit
      else {
        var slots = 0
        var busiest = rangeSize
        var lower = 0
        rangeMap.foreach { case (upper, _) => // ascending; strict > keeps first
          if (upper - lower > slots) { slots = upper - lower; busiest = upper }
          lower = upper
        }
        val lowerKey = rangeMap.keysIterator.takeWhile(_ < busiest)
          .foldLeft(0)((_, k) => k)
        require(busiest - lowerKey > 1,
          s"no more range can be assigned (consumers=${rangeMap.size})")
        val split = busiest - ((busiest - lowerKey) >> 1)
        rangeMap.put(split, c): Unit
      }
    }
    val slot = Murmur3Pulsar.pulsar_hash(stickyRoutingKey(log)) % rangeSize
    log.withColumn("slot", slot)
      .withColumn("consumer_id",
        ringAssign(rangeMap.toSeq, col("slot"), rangeSize)) // ceiling lookup, top key ≥ every slot
  }

  /**
   * AUTO_SPLIT consistent-hash-ring selector (reference
   * ConsistentHashingStickyKeyConsumerSelector.java:40,104): each consumer
   * owns `pointsPerConsumer` ring points at murmur3(name + "-" + i) %
   * 65536; a key's slot is served by the first point clockwise (ceiling,
   * wrapping to the first point — NavigableMap.ceilingEntry semantics).
   * Consumer churn therefore only moves the keys between the leaving/
   * joining consumer's points and their predecessors — the minimal-
   * movement property the reference buys with this structure.
   *
   * The ring is computed driver-side (tiny) and compiled into an O(1)
   * per-row array lookup over the materialized 65536-slot owner table —
   * no UDF, no broadcast, no per-row ring walk.
   */
  def keySharedConsistentHash(log: DataFrame, consumers: Seq[String],
                              pointsPerConsumer: Int = 100): DataFrame = {
    require(consumers.nonEmpty)
    val slot = Murmur3Pulsar.pulsar_hash(stickyRoutingKey(log)) %
      Murmur3Pulsar.HashRangeSize
    log.withColumn("slot", slot)
      .withColumn("consumer_id",
        ringAssign(ringPoints(consumers, pointsPerConsumer), col("slot")))
  }

  /** Each consumer's `pointsPerConsumer` ring points at
    * murmur3(name + "-" + i) % 65536, sorted by (point, owner) — ties on
    * colliding ring points break on consumer name so assignment is
    * independent of the order the consumer list was given in (the
    * keyshared_rebalance oracle orders the same way in SQL). */
  private def ringPoints(consumers: Seq[String],
                         pointsPerConsumer: Int): Seq[(Int, String)] =
    consumers.flatMap { c =>
      (0 until pointsPerConsumer).map { i =>
        Murmur3Pulsar.hashBytes(s"$c-$i".getBytes("UTF-8")) %
          Murmur3Pulsar.HashRangeSize -> c
      }
    }.sorted

  /** Ceiling lookup over the ring, materialized driver-side into the full
    * 65536-entry slot→owner table and compiled to one `element_at` on an
    * array literal: O(1) per row (the earlier flat-CaseWhen form walked
    * up to 100×C branches per row — measurably slower at 1M rows and at
    * risk of falling out of codegen on large consumer sets). Wrap-around
    * past the last point goes to the first point's owner
    * (NavigableMap.ceilingEntry semantics); point collisions resolve to
    * the lexicographically-smallest owner because `ring` arrives sorted
    * by (point, owner). `domain` is the slot space the table must cover —
    * [[keySharedAutoSplit]] accepts any power-of-two `rangeSize`, and a
    * table sized to the 65536 default would silently `element_at` → NULL
    * for every slot ≥ 65536. Capped at 2^20: the owner table is a plan
    * literal, and a multi-million-entry array literal is a driver/codegen
    * hazard, not a real ring size (the reference default is 65536). */
  private def ringAssign(ring: Seq[(Int, String)], slot: Column,
                         domain: Int = Murmur3Pulsar.HashRangeSize): Column = {
    require(domain > 0 && domain <= (1 << 20),
      s"ring domain $domain exceeds the 2^20 owner-table literal bound")
    val arr = ring.toArray
    val owners = new Array[String](domain)
    var ri = 0
    var s = 0
    while (s < owners.length) {
      while (ri < arr.length && arr(ri)._1 < s) ri += 1
      owners(s) = if (ri < arr.length) arr(ri)._2 else arr(0)._2
      s += 1
    }
    element_at(typedLit(owners.toSeq), slot.cast("int") + lit(1))
  }

  /**
   * Key_Shared membership change (reference
   * ConsistentHashingStickyKeyConsumerSelector.java:104 addConsumer/
   * removeConsumer + DrainingHashesTracker): assign every row under the
   * ring BEFORE and AFTER the change. Consistent hashing guarantees
   * minimal movement — on ADD, a key either keeps its owner or moves to
   * a joining consumer; on REMOVE, only the leaving consumers' keys move.
   *
   * Draining preserves per-key order through the handover exactly as the
   * reference does: rows on a moved slot at or below the per-partition
   * `drainedUpTo` cursor are still in flight on the old owner, so they
   * stay with it (`consumer_id` = old); the new owner only receives
   * offsets strictly above the cursor. Columns out: `slot`,
   * `consumer_before`, `consumer_after`, `moved`, `consumer_id`
   * (the effective post-rebalance route).
   */
  def keySharedRebalance(log: DataFrame,
                         oldConsumers: Seq[String], newConsumers: Seq[String],
                         drainedUpTo: Map[Int, Long] = Map.empty,
                         pointsPerConsumer: Int = 100): DataFrame = {
    require(oldConsumers.nonEmpty && newConsumers.nonEmpty)
    val slot = Murmur3Pulsar.pulsar_hash(stickyRoutingKey(log)) %
      Murmur3Pulsar.HashRangeSize
    val drained = typedLit(drainedUpTo.map { case (p, o) => p -> o })
    log.withColumn("slot", slot)
      .withColumn("consumer_before",
        ringAssign(ringPoints(oldConsumers, pointsPerConsumer), col("slot")))
      .withColumn("consumer_after",
        ringAssign(ringPoints(newConsumers, pointsPerConsumer), col("slot")))
      .withColumn("moved", col("consumer_before") =!= col("consumer_after"))
      .withColumn("consumer_id",
        when(col("moved") &&
            col(Envelope.Offset) <= coalesce(
              element_at(drained, col(Envelope.Partition)), lit(Long.MinValue)),
          col("consumer_before"))
          .otherwise(col("consumer_after")))
  }

  /**
   * Shared-subscription priority-level dispatch (reference
   * ConsumerBuilder.priorityLevel, ConsumerBuilder.java:530-549;
   * AbstractDispatcherMultipleConsumers.java:79-108): the broker
   * dispatches to max-priority consumers while they have permits,
   * round-robin within a level, then falls to the next level. For
   * consumers C1(p0,2) C2(p0,1) C3(p0,1) C4(p1,2) C5(p1,1) the
   * documented dispatch order is C1,C2,C3,C1,C4,C5,C4 — one slot per
   * permit ordered by (priority, round-robin round, list position).
   *
   * Batch model: that permit cycle IS the steady-state schedule (each
   * ack returns its permit, so the cycle repeats): message `rn` (per-
   * partition arrival rank) goes to `cycle[rn % cycle.length]`. The
   * schedule is computed driver-side (tiny) and applied as an O(1)
   * array-literal lookup — same shape as the Key_Shared ring.
   *
   * `consumers` = (name, priorityLevel, permits); lower level wins.
   */
  def sharedPriorityDispatch(log: DataFrame,
                             consumers: Seq[(String, Int, Int)]): DataFrame = {
    require(consumers.nonEmpty && consumers.forall(_._3 > 0))
    val cycle: Seq[String] = consumers.zipWithIndex
      .flatMap { case ((name, prio, permits), pos) =>
        (0 until permits).map(round => (prio, round, pos, name))
      }
      .sortBy { case (prio, round, pos, _) => (prio, round, pos) }
      .map(_._4)
    val w = Window.partitionBy(Envelope.Partition).orderBy(Envelope.Offset)
    log.withColumn("_rn", row_number().over(w) - 1)
      .withColumn("consumer_id",
        element_at(typedLit(cycle), (col("_rn") % cycle.length).cast("int") + 1))
      .drop("_rn")
  }

  /** Failover active-consumer selection for partitioned topics
    * (ConsumerBuilder.java:551-569): partitions are spread evenly over
    * the HIGHEST-priority consumers only (lower level = higher
    * priority), lexicographic name order within the tier; lower-priority
    * consumers are pure standbys. */
  def failoverActiveConsumer(log: DataFrame,
                             consumers: Seq[(String, Int)]): DataFrame = {
    require(consumers.nonEmpty)
    val top = consumers.map(_._2).min
    val tier = consumers.filter(_._2 == top).map(_._1).sorted
    log.withColumn("consumer_id",
      element_at(typedLit(tier),
        pmod(col(Envelope.Partition), lit(tier.length)).cast("int") + 1))
  }

  /**
   * STICKY explicit hash ranges (HashRangeExclusiveStickyKeyConsumerSelector;
   * KeySharedPolicy.ranges): route by [start, end] slot ranges.
   */
  def keySharedSticky(log: DataFrame, ranges: Seq[(Int, Int, String)]): DataFrame = {
    // the reference's HashRangeExclusiveStickyKeyConsumerSelector REJECTS
    // overlapping ranges (Range.intersect check on join) — enforce the
    // same here rather than silently resolving overlaps by list order
    ranges.sortBy(_._1).sliding(2).foreach {
      case Seq((_, hiA, ca), (loB, _, cb)) =>
        require(hiA < loB,
          s"sticky ranges overlap: [$ca ..$hiA] and [$cb $loB..] — the " +
            "reference rejects intersecting ranges")
      case _ => ()
    }
    val slot = Murmur3Pulsar.pulsar_hash(stickyRoutingKey(log)) % Murmur3Pulsar.HashRangeSize
    val assigned = ranges.foldLeft(lit(null).cast("string")) {
      case (acc, (lo, hi, consumer)) =>
        when(slot.between(lo, hi), lit(consumer)).otherwise(acc)
    }
    log.withColumn("slot", slot).withColumn("consumer_id", assigned)
  }

  /**
   * DLQ / retry routing (DeadLetterPolicy.java:46-64; reconsumeLater):
   * rows past maxRedeliverCount go to `<topic>-<sub>-DLQ`; others to the
   * retry topic with a backoff deliver_at (NegativeAcksTracker semantics:
   * redelivery after backoff(redeliveryCount)).
   */
  def dlqRoute(log: DataFrame, subscription: String, maxRedeliverCount: Int,
               backoffBaseSeconds: Long = 60L,
               nackTime: Option[Column] = None): DataFrame = {
    val dlqTopic = concat(col(Envelope.Topic), lit(s"-$subscription-DLQ"))
    val retryTopic = concat(col(Envelope.Topic), lit(s"-$subscription-RETRY"))
    // dead-letter at >= maxRedeliverCount, matching the reference's
    // possibleToDeadLetter (redeliveryCount >= policy.maxRedeliverCount)
    val toDlq = col(Envelope.RedeliveryCnt) >= maxRedeliverCount
    // the reference anchors the backoff at the NACK instant
    // (NegativeAcksTracker schedules at nackTime + backoff) — a live
    // dispatcher passes `nackTime` (current_timestamp() or the
    // microbatch time), otherwise a message older than its backoff is
    // immediately due on every retry (the backoff degenerates to a
    // no-op for aged messages). The publish-time default remains for
    // replaying a log snapshot where the nack instants aren't recorded
    // — the only deterministic anchor such a batch has.
    val anchor = nackTime.getOrElse(col(Envelope.PublishTime))
    log.withColumn("route_topic", when(toDlq, dlqTopic).otherwise(retryTopic))
      .withColumn("next_deliver_at",
        when(toDlq, lit(null).cast("timestamp"))
          .otherwise(anchor +
            expr(s"make_interval(0,0,0,0,0,0,$backoffBaseSeconds * pow(2, redelivery_count))")))
  }

  /**
   * Geo-replication copy filter (PersistentReplicator.java:372 +
   * MessageDeduplication.isDuplicateReplV1:345 cycle rule): when
   * replicating to `targetCluster`, skip rows that originated there and
   * rows the local cluster already re-published (replicated_from = self).
   */
  def replicateTo(log: DataFrame, selfCluster: String, targetCluster: String): DataFrame =
    log.filter((col(Envelope.ReplicatedFrom).isNull ||
        (col(Envelope.ReplicatedFrom) =!= targetCluster)) &&
      (col(Envelope.ReplicatedFrom).isNull ||
        col(Envelope.ReplicatedFrom) =!= selfCluster))

  /**
   * Admin skip N messages (Topics.skip:1538): advance the cursor past the
   * next N offsets per partition; returns the new cursor per partition.
   */
  def skipMessages(log: DataFrame, cursor: Map[Int, Long], n: Int): DataFrame = {
    val w = Window.partitionBy(Envelope.Partition).orderBy(Envelope.Offset)
    val cursorDf = log.sparkSession.createDataFrame(cursor.toSeq.map {
      case (p, o) => (p, o)
    }).toDF(Envelope.Partition, "cursor")
    val advanced = log.join(broadcast(cursorDf), Seq(Envelope.Partition), "left")
      .filter(col("cursor").isNull || col(Envelope.Offset) > col("cursor"))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= n)
      .groupBy(Envelope.Partition)
      .agg(max(Envelope.Offset).as("advanced"))
    // a fully-consumed partition has no rows left to skip but must KEEP
    // its cursor entry — dropping it from the returned map would read as
    // "this partition has consumed nothing" and redeliver everything
    advanced.join(broadcast(cursorDf), Seq(Envelope.Partition), "full_outer")
      .select(col(Envelope.Partition),
        coalesce(col("advanced"), col("cursor")).as("new_cursor"))
  }
}
