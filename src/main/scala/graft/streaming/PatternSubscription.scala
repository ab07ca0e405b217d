package graft.streaming

import graft.log.{TopicLog, Topics}
import graft.model.{Envelope, TopicName}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.log.PathIO
import scala.collection.JavaConverters._

/**
 * Regex-subscription topic filter (reference RegexSubscriptionMode.java:
 * 34-44). This log layout stores only persistent topics (a
 * non-persistent topic has no durable storage — in-memory dispatch only,
 * NonPersistentTopic.java), so `PersistentOnly` and `AllTopics` resolve
 * the same topic set and `NonPersistentOnly` always resolves empty —
 * exactly the subset of each mode that has replayable data.
 */
sealed trait RegexSubscriptionMode
object RegexSubscriptionMode {
  case object PersistentOnly extends RegexSubscriptionMode
  case object NonPersistentOnly extends RegexSubscriptionMode
  case object AllTopics extends RegexSubscriptionMode
}

/**
 * DYNAMIC pattern subscription — the reference's regex consumer with a
 * live topic watcher (PatternMultiTopicsConsumerImpl.java:51 +
 * TopicListWatcher.java; wire `CommandWatchTopicList`,
 * PulsarApi.proto:794): the topic regex is RE-RESOLVED on every
 * microbatch, so topics created after the subscription starts are picked
 * up (recheckTopicsChange → onTopicsAdded), topics that stop matching or
 * are deleted stop contributing (onTopicsRemoved), and an INITIALLY
 * EMPTY match set is legal — watching an empty namespace until its first
 * topic appears is the watcher's normal startup state.
 *
 * Spark mapping (SURVEY.md §2.1 "dynamic discovery = re-resolve glob per
 * microbatch"): each [[poll]] is one microbatch — a driver-side
 * `Topics.listMatching` re-resolution (the reference's watcher is the
 * same metadata-store read on the broker), then a DISTRIBUTED read of
 * each matching topic's committed rows strictly above this
 * subscription's durable cursor. The cursor is namespaced per
 * (pattern, subscription) under `checkpointRoot` and records one offset
 * per (topic, partition) — bounded by TOPOLOGY (topic × partition
 * count), never by data volume, so the 100 TB footprint of the cursor
 * is a few KB. Delivery is at-least-once: the cursor advances with an
 * atomic tmp+move AFTER `process` returns, so a crash mid-process
 * redelivers that batch (the reference's unacked-redelivery semantics).
 *
 * Scale notes: topics with no new rows beyond the cursor are skipped
 * without planning a scan (one manifest high-water read per topic — a
 * driver metadata op); per-topic reads are manifest-gated
 * ([[TopicLog.read]]) and union into ONE DataFrame, so Spark plans a
 * single multi-source scan per batch with filters pushed to each
 * topic's parquet.
 */
final class PatternSubscription(
    val spark: SparkSession,
    val root: String,
    val tenant: String,
    val namespace: String,
    val pattern: String,
    val name: String,
    val checkpointRoot: String,
    val mode: RegexSubscriptionMode = RegexSubscriptionMode.PersistentOnly,
    val numPartitions: Int = 4,
    // Per-poll topic cap (the multi-topic analog of BatchReceivePolicy's
    // flow control): a microbatch plans at most this many fresh topics'
    // reads — each fresh topic contributes a scan branch to the union,
    // so an uncapped catch-up over a big namespace pays O(topics)
    // ANALYSIS cost in one batch (probe: 500 all-fresh topics planned
    // 47 s in one poll; capped polls bound it and [[drain]] spreads the
    // backlog across triggers). Topics beyond the cap keep their cursor
    // and dispatch on the next poll — no data is skipped.
    val maxTopicsPerPoll: Int = 64) {

  /** Cursor location: one directory per (pattern, subscription) — the
    * pattern is content-addressed so two patterns over the same
    * namespace never share a cursor (the reference keys the watcher by
    * its pattern string the same way). */
  def cursorDir: String = {
    val patternId = java.security.MessageDigest.getInstance("MD5")
      .digest(pattern.getBytes("UTF-8")).map("%02x".format(_)).mkString
    s"$checkpointRoot/$tenant/$namespace/_patterns/$patternId/$name"
  }

  private def cursorFile = PathIO.path(cursorDir, "cursor.tsv")

  /** Rotation cursor for the per-poll topic cap (fairness across polls
    * when more topics are fresh than one batch plans). */
  private val rotation = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Durable consumed position: (topic fqn, partition) → highest
    * dispatched offset. Entries persist for topics that currently do
    * not match (deleted or renamed out of the pattern) so a topic that
    * re-matches later resumes instead of replaying — the reference
    * keeps the per-topic subscription cursor on the broker across
    * unsubscribe/resubscribe of the pattern consumer the same way. */
  private[streaming] def readCursor(): Map[(String, Int), Long] =
    if (!PathIO.exists(cursorFile)) Map.empty
    else PathIO.readLines(cursorFile).filter(_.nonEmpty).map { l =>
      val Array(fqn, p, o) = l.split("\t")
      (fqn, p.toInt) -> o.toLong
    }.toMap

  private def writeCursor(c: Map[(String, Int), Long]): Unit = {
    PathIO.mkdirs(PathIO.path(cursorDir))
    val tmp = PathIO.path(cursorDir,
      s".cursor.${java.util.UUID.randomUUID}.tmp")
    PathIO.writeString(tmp, c.toSeq.sortBy(e => (e._1._1, e._1._2))
      .map { case ((fqn, p), o) => s"$fqn\t$p\t$o" }.mkString("\n"))
    PathIO.moveReplace(tmp, cursorFile)
  }

  /** The CURRENT match set — re-resolved on every call (the watcher
    * read). Empty is legal at any point in the subscription's life. */
  def matchingTopics(): Seq[TopicName] = mode match {
    case RegexSubscriptionMode.NonPersistentOnly => Seq.empty
    case _ => Topics.listMatching(root, tenant, namespace, pattern)
  }

  /**
   * One microbatch: re-resolve the pattern, read every matching topic's
   * committed rows strictly above the cursor, dispatch the union to
   * `process`, then durably advance the cursor. Returns the number of
   * (topic, partition) ranges dispatched — 0 means nothing new (and
   * `process` is NOT invoked, matching a consumer loop that simply has
   * no message to deliver). The high-water snapshot is taken BEFORE the
   * read and the filter is bounded on BOTH sides (`cursor < offset <=
   * hw`), so a producer appending concurrently with the poll can never
   * make the cursor claim rows the batch did not carry.
   */
  def poll(process: (DataFrame, Long) => Unit): Int = {
    val topics = matchingTopics()
    val cursor = readCursor()
    val epoch = cursor.hashCode().toLong ^ System.nanoTime()
    // the full match set is probed for freshness (cheap — one manifest
    // read per topic), but at most maxTopicsPerPoll fresh topics are
    // PLANNED this batch; the rest dispatch on later polls (their
    // cursors are untouched below because the cursor merge only covers
    // planned topics)
    val freshTopics = topics.flatMap { t =>
      val log = new TopicLog(spark, root, t, numPartitions)
      val hw = log.highWater()
      // effective per-partition resume point. A high-water BELOW the
      // stored cursor means the topic was deleted and RECREATED under
      // the same name (offsets are monotonic within one incarnation —
      // retention/truncate never lower the manifest high-water): the
      // stale cursor belongs to the dead incarnation, so the new topic
      // replays from the start, matching the reference where the
      // subscription cursor dies with its topic. Equal high-water =
      // nothing new.
      val fresh = hw.flatMap { case (p, o) =>
        val cur = cursor.getOrElse((t.fqn, p), -1L)
        if (o < cur) Some(p -> (o, -1L))
        else if (o > cur) Some(p -> (o, cur))
        else None
      }
      if (fresh.isEmpty) None else Some((t, log, fresh))
    }
    // ROTATING cap window, not take(): Topics.list is fqn-sorted, so a
    // plain head-take under sustained producers would re-select the
    // same lexicographically-first topics every poll and STARVE the
    // rest forever. The rotation cursor advances by the planned count
    // each poll — every fresh topic is reached within
    // ceil(fresh/cap) polls whatever the load. Per-instance fairness
    // (a restart restarts the rotation; no data is ever skipped —
    // un-planned topics keep their cursors).
    val capped =
      if (freshTopics.size <= maxTopicsPerPoll) freshTopics
      else {
        val start = ((rotation.getAndAdd(maxTopicsPerPoll)
          % freshTopics.size) + freshTopics.size) % freshTopics.size
        (freshTopics.drop(start) ++ freshTopics.take(start))
          .take(maxTopicsPerPoll)
      }
    val perTopic = capped.map { case (t, log, fresh) =>
      // reads are constructed only for the CAPPED set — spark.read's
      // listing + schema inference run at construction, so building a
      // read per fresh topic before capping would defeat the cap
      val cond = fresh.map { case (p, (o, cur)) =>
        col(Envelope.Partition) === p &&
          col(Envelope.Offset) > cur &&
          col(Envelope.Offset) <= o
      }.reduce(_ || _)
      (t, fresh, log.read().filter(cond))
    }
    if (perTopic.isEmpty) 0
    else {
      val batch = perTopic.map(_._3)
        .reduce(_.unionByName(_, allowMissingColumns = true))
      process(batch, epoch)
      // advance AFTER process: at-least-once on a crash mid-dispatch
      writeCursor(cursor ++ perTopic.flatMap { case (t, fresh, _) =>
        fresh.map { case (p, (o, _)) => (t.fqn, p) -> o }
      })
      perTopic.map(_._2.size).sum
    }
  }

  /** Poll until a poll dispatches nothing — the drain-the-backlog loop
    * (each iteration re-resolves the pattern, so topics created while
    * draining are still picked up). Returns total ranges dispatched. */
  def drain(process: (DataFrame, Long) => Unit): Int = {
    var total = 0
    var last = -1
    while (last != 0) { last = poll(process); total += last }
    total
  }

  /**
   * Run the watcher as a real [[StreamingQuery]]: a rate-source tick is
   * the discovery timer (the reference's `patternAutoDiscoveryPeriod`,
   * ConsumerBuilder.java) and each tick runs one [[poll]]. The query
   * handle gives the caller the reference consumer's lifecycle —
   * `stop()` to unsubscribe, `awaitTermination` to block — while
   * discovery/dispatch stay exactly the [[poll]] semantics above.
   */
  def consume(trigger: Trigger = Trigger.ProcessingTime("1 second"),
              rowsPerSecond: Int = 1)(
              process: (DataFrame, Long) => Unit): StreamingQuery =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond).load()
      .writeStream
      .option("checkpointLocation", s"$cursorDir/_clock")
      .trigger(trigger)
      .foreachBatch { (_: DataFrame, _: Long) =>
        poll(process): Unit
      }
      .start()
}
