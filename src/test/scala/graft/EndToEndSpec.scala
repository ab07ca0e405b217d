package graft

import graft.log.TopicLog
import graft.model.{Envelope, TopicName}
import graft.operators.Compaction
import graft.streaming.{BatchReceivePolicy, Subscription, SubscriptionType}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/**
 * SURVEY §7.2 minimum end-to-end slice: events → produce into
 * `public/default/events` (key = user_id) → Shared subscription →
 * tumbling event-time window count per event_type → produce into an
 * output topic → TableView over the output → assert against a batch
 * recomputation. Exercises lifecycle §3.1 + §3.2 + §3.3 in one pipeline.
 */
class EndToEndSpec extends SparkSpec {
  import spark.implicits._

  test("produce -> subscribe -> window agg -> output topic -> TableView") {
    val root = Files.createTempDirectory("graft-e2e").toString
    val inTopic = new TopicLog(spark, root,
      TopicName.parse("persistent://public/default/events"), numPartitions = 4)
    val outTopic = new TopicLog(spark, root,
      TopicName.parse("persistent://public/default/events-hourly"), numPartitions = 1)

    // ---- produce (lifecycle §3.1): events -> envelope -> topic log
    val ev = Envelope.normalizeTs(spark.read.parquet(s"$sf001/events.parquet"))
    val batch = ev.select(
      col("user_id").cast("string").as(Envelope.Key),
      col("event_type").as(Envelope.Value),
      lit("p0").as(Envelope.ProducerName),
      col("event_id").as(Envelope.SequenceId),
      col("ts").as(Envelope.PublishTime),
      col("ts").as(Envelope.EventTime))
    assert(inTopic.append(batch) == ev.count())

    // ---- consume + window function (§3.2 + §3.3): Shared subscription,
    // 6h tumbling count per event_type, re-produce into the output topic
    val sub = new Subscription(inTopic, "agg-sub", SubscriptionType.Shared,
      checkpointRoot = s"$root/_cursors")
    val q = sub.consume { (microbatch, _) =>
      val agg = microbatch
        .groupBy(window(col(Envelope.EventTime), "6 hours"),
          col(Envelope.Value).as("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(
          concat_ws("|", date_format(col("window.start"), "yyyy-MM-dd HH:mm"),
            col("event_type")).as(Envelope.Key),
          col("n").cast("string").as(Envelope.Value),
          lit("fn-agg").as(Envelope.ProducerName),
          monotonically_increasing_id().as(Envelope.SequenceId),
          current_timestamp().as(Envelope.PublishTime),
          col("window.start").as(Envelope.EventTime))
      if (!agg.isEmpty) outTopic.append(agg): Unit
    }
    q.awaitTermination(120000)

    // ---- TableView over the output topic (last value per window|type key)
    val view = Compaction.tableView(outTopic.read())
      .as[(String, String)].collect().toMap

    // ---- oracle: batch recomputation straight from the source
    val expected = ev
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(concat_ws("|", date_format(col("window.start"), "yyyy-MM-dd HH:mm"),
        col("event_type")), col("n").cast("string"))
      .as[(String, String)].collect().toMap

    assert(view.sizeIs > 0)
    assert(view == expected,
      s"TableView diverges: ${(view.toSet -- expected.toSet).take(3)} ...")
    ()
  }

  test("Key_Shared subscription preserves per-key partition affinity end-to-end") {
    val root = Files.createTempDirectory("graft-e2e-ks").toString
    val topic = new TopicLog(spark, root, TopicName.parse("ks-topic"), 4)
    val batch = (0 until 400).map(i => (s"user-${i % 20}", s"m$i"))
      .toDF(Envelope.Key, Envelope.Value)
      .withColumn(Envelope.ProducerName, lit("p"))
      .withColumn(Envelope.SequenceId, monotonically_increasing_id())
      .withColumn(Envelope.PublishTime, current_timestamp())
      .withColumn(Envelope.EventTime, col(Envelope.PublishTime))
    topic.append(batch)

    val sub = new Subscription(topic, "ks-sub", SubscriptionType.KeyShared,
      checkpointRoot = s"$root/_cursors", numWorkers = 4)
    val seen = scala.collection.mutable.Map[String, scala.collection.mutable.Set[Int]]()
    val q = sub.consume { (mb, _) =>
      mb.select(col(Envelope.Key)).rdd
        .mapPartitionsWithIndex { (pid, rows) =>
          rows.map(r => (r.getString(0), pid))
        }.collect().foreach { case (k, pid) =>
          seen.getOrElseUpdate(k, scala.collection.mutable.Set()) += pid
        }
    }
    q.awaitTermination(120000)
    assert(seen.nonEmpty)
    val multiHomed = seen.filter(_._2.size > 1)
    assert(multiHomed.isEmpty, s"keys on >1 worker: ${multiHomed.keys.take(5)}")
  }
}
