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

  test("a poll with nothing new runs ZERO Spark jobs — idle topics cost driver metadata only") {
    val root = Files.createTempDirectory("graft-pat-idle").toString
    // many topics, all idle after the first drain: the watcher's steady
    // state on a big namespace must not plan a scan (or any job) per
    // poll — discovery is a directory walk + one manifest read per
    // topic, exactly the reference watcher's metadata cost
    (0 until 20).foreach(i =>
      new TopicLog(spark, root, TopicName.parse(s"evt-$i")).append(rows(0 until 3)))
    val sub = newSub(root, "evt-.*")
    sub.drain((df, _) => { df.count(): Unit })
    // let the async listener bus drain the drain()'s own JobStart events
    // BEFORE registering — a lagging queue would otherwise deliver them
    // to the new listener and fail the zero-jobs assertion spuriously
    Thread.sleep(1000)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(): Unit
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      assert(sub.poll((_, _) => fail("process must not run on an empty poll")) == 0)
      // listener delivery is async; a job-start event for a job launched
      // during the poll lands well inside this bound
      Thread.sleep(1000)
      assert(jobs.get() == 0,
        s"an idle poll over 20 topics launched ${jobs.get()} Spark jobs")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("the per-poll cap ROTATES — sustained producers cannot starve later topics") {
    val root = Files.createTempDirectory("graft-pat-rotate").toString
    (0 until 9).foreach(i =>
      new TopicLog(spark, root, TopicName.parse(f"evt-$i%02d")).append(rows(0 until 2)))
    val sub = new PatternSubscription(spark, root, "public", "default",
      "evt-.*", "sub1",
      Files.createTempDirectory("graft-pat-rotate-ckpt").toString,
      maxTopicsPerPoll = 3)
    val seen = scala.collection.mutable.Set.empty[String]
    var next = 2
    (0 until 5).foreach { _ =>
      sub.poll((df, _) => { seen ++= df.select(Envelope.Topic).distinct()
        .collect().map(_.getString(0)): Unit })
      // keep EVERY topic fresh before the next poll — the starvation
      // scenario a head-take cap fails (fqn-first topics win forever)
      (0 until 9).foreach(i =>
        new TopicLog(spark, root, TopicName.parse(f"evt-$i%02d"))
          .append(rows(next until next + 1)))
      next += 1
    }
    assert(seen.size == 9,
      s"rotation must reach every fresh topic under sustained load, saw $seen")
  }

  test("a deleted-and-recreated topic replays from the start, not from the dead cursor") {
    val root = Files.createTempDirectory("graft-pat-recreate").toString
    new TopicLog(spark, root, TopicName.parse("evt-a")).append(rows(0 until 20))
    val sub = newSub(root, "evt-.*")
    var n = 0L
    sub.drain((df, _) => n += df.count())
    assert(n == 20)
    // delete the topic (its cursor is now stale garbage of a dead
    // incarnation) and recreate it with FEWER rows — offsets restart
    // below the stored cursor
    val topicDir = java.nio.file.Paths.get(root, "public", "default", "evt-a")
    val w = java.nio.file.Files.walk(topicDir)
    try w.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(p => { java.nio.file.Files.deleteIfExists(p): Unit })
    finally w.close()
    new TopicLog(spark, root, TopicName.parse("evt-a")).append(rows(0 until 7))
    var n2 = 0L
    sub.drain((df, _) => n2 += df.count())
    assert(n2 == 7, "the new incarnation's rows must ALL dispatch " +
      "(a stale high cursor would silently skip them)")
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
