package graft

import graft.log.{TopicLog, Topics}
import graft.model.{Envelope, TopicName}
import graft.streaming.{PatternSubscription, RegexSubscriptionMode}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.Files

/**
 * Dynamic regex-topic discovery (reference
 * PatternMultiTopicsConsumerImpl + TopicListWatcher; behaviors from
 * pulsar-broker/src/test/.../api/PatternTopicsConsumerTest): topics
 * created AFTER the subscription starts are picked up on the next
 * recheck, non-matching topics are ignored, and starting against an
 * empty namespace is legal.
 */
class PatternSubscribeSpec extends SparkSpec {
  import spark.implicits._

  private def rows(ids: Range, key: String = "k") =
    ids.map(i => (s"$key${i % 3}", s"v$i", "p0", i.toLong))
      .toDF(Envelope.Key, Envelope.Value, Envelope.ProducerName, Envelope.SequenceId)
      .withColumn(Envelope.PublishTime, timestamp_seconds(col(Envelope.SequenceId)))

  private def newSub(root: String, pattern: String,
                     mode: RegexSubscriptionMode = RegexSubscriptionMode.PersistentOnly) =
    new PatternSubscription(spark, root, "public", "default", pattern,
      name = "sub1",
      checkpointRoot = Files.createTempDirectory("graft-pat-ckpt").toString,
      mode = mode)

  test("empty-start is legal; a topic created mid-subscription is discovered") {
    val root = Files.createTempDirectory("graft-pat").toString
    val sub = newSub(root, "evt-.*")
    var seen = Vector.empty[(String, Long)]
    def collect(df: DataFrame, @annotation.unused epoch: Long): Unit =
      seen ++= df.groupBy(Envelope.Topic).count()
        .collect().map(r => (r.getString(0), r.getLong(1)))

    // namespace empty: a poll dispatches nothing and does not throw
    assert(sub.poll(collect) == 0)
    assert(seen.isEmpty)

    // topic appears AFTER the subscription started → next poll sees it
    new TopicLog(spark, root, TopicName.parse("evt-a")).append(rows(0 until 10))
    assert(sub.poll(collect) > 0)
    assert(seen.map(_._2).sum == 10)

    // a second matching topic AND more rows on the first
    new TopicLog(spark, root, TopicName.parse("evt-b")).append(rows(0 until 6))
    new TopicLog(spark, root, TopicName.parse("evt-a")).append(rows(10 until 15))
    assert(sub.poll(collect) > 0)
    assert(seen.map(_._2).sum == 21)
    assert(seen.map(_._1).toSet ==
      Set("persistent://public/default/evt-a", "persistent://public/default/evt-b"))

    // nothing new → no dispatch, cursor holds (no redelivery)
    assert(sub.poll(collect) == 0)
    assert(seen.map(_._2).sum == 21)
  }

  test("non-matching topics never contribute; AllTopics equals PersistentOnly here") {
    val root = Files.createTempDirectory("graft-pat2").toString
    new TopicLog(spark, root, TopicName.parse("evt-a")).append(rows(0 until 5))
    new TopicLog(spark, root, TopicName.parse("other-x")).append(rows(0 until 7))
    val sub = newSub(root, "evt-.*")
    var n = 0L
    sub.drain((df, _) => n += df.count())
    assert(n == 5)
    // AllTopics resolves the same set (only persistent topics have
    // storage in this layout); NonPersistentOnly resolves empty
    assert(newSub(root, "evt-.*", RegexSubscriptionMode.AllTopics)
      .matchingTopics().map(_.topic) == Seq("evt-a"))
    assert(newSub(root, "evt-.*", RegexSubscriptionMode.NonPersistentOnly)
      .matchingTopics().isEmpty)
  }

  test("cursor is namespaced per (pattern, subscription) and survives re-instantiation") {
    val root = Files.createTempDirectory("graft-pat3").toString
    new TopicLog(spark, root, TopicName.parse("evt-a")).append(rows(0 until 8))
    val ckpt = Files.createTempDirectory("graft-pat3-ckpt").toString
    def sub(pattern: String) = new PatternSubscription(spark, root,
      "public", "default", pattern, "sub1", ckpt)
    var n1 = 0L
    sub("evt-.*").drain((df, _) => n1 += df.count())
    assert(n1 == 8)
    // same pattern + same name + same checkpoint root → resumes, no replay
    var n2 = 0L
    sub("evt-.*").drain((df, _) => n2 += df.count())
    assert(n2 == 0)
    // DIFFERENT pattern (same match set) → its own cursor → full replay
    var n3 = 0L
    sub("evt-[a-z]").drain((df, _) => n3 += df.count())
    assert(n3 == 8)
  }

  test("drain picks up a topic created between polls; concurrent append stays exact") {
    val root = Files.createTempDirectory("graft-pat4").toString
    new TopicLog(spark, root, TopicName.parse("evt-a")).append(rows(0 until 4))
    val sub = newSub(root, "evt-.*")
    var total = 0L
    var created = false
    sub.drain { (df, _) =>
      total += df.count()
      if (!created) { // mid-drain topic creation — the watcher's raison d'être
        created = true
        new TopicLog(spark, root, TopicName.parse("evt-late")).append(rows(0 until 9))
      }
    }
    assert(total == 13)
  }

  test("one-shot subscribePattern accepts an empty match set") {
    val root = Files.createTempDirectory("graft-pat5").toString
    val df = Topics.subscribePattern(spark, root, "public", "default", "none-.*")
    assert(df.count() == 0)
    assert(df.schema == Envelope.schema)
  }

  test("consume() runs discovery as a StreamingQuery") {
    val root = Files.createTempDirectory("graft-pat6").toString
    new TopicLog(spark, root, TopicName.parse("evt-a")).append(rows(0 until 5))
    val sub = newSub(root, "evt-.*")
    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    val q = sub.consume(org.apache.spark.sql.streaming.Trigger.ProcessingTime("200 milliseconds"),
      rowsPerSecond = 10)((df, _) => { seen.addAndGet(df.count()): Unit })
    try {
      val deadline = System.nanoTime() + 30_000_000_000L
      while (seen.get() < 5 && System.nanoTime() < deadline) Thread.sleep(100)
      assert(seen.get() == 5)
      // topic created while the query is LIVE — discovered without restart
      new TopicLog(spark, root, TopicName.parse("evt-live")).append(rows(0 until 3))
      val deadline2 = System.nanoTime() + 30_000_000_000L
      while (seen.get() < 8 && System.nanoTime() < deadline2) Thread.sleep(100)
      assert(seen.get() == 8)
    } finally q.stop()
  }
}
