package graft

import graft.log.TopicLog
import graft.model.{Envelope, TopicName}
import graft.streaming.{Subscription, SubscriptionType}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Seek semantics: reposition a subscription cursor by offset and by
  * timestamp (reference Consumer.seek:513,525; PersistentMessageFinder). */
class SeekSpec extends SparkSpec {
  import spark.implicits._

  private def mk(root: String): TopicLog = {
    val tl = new TopicLog(spark, root, TopicName.parse("seek-topic"), 2)
    tl.append((0 until 100).map(i => (s"k${i % 4}", s"v$i", "p", i.toLong))
      .toDF(Envelope.Key, Envelope.Value, Envelope.ProducerName, Envelope.SequenceId)
      .withColumn(Envelope.PublishTime, timestamp_seconds(col(Envelope.SequenceId))))
    tl
  }

  test("seekFilter restarts consumption from a given offset") {
    val root = Files.createTempDirectory("graft-seek").toString
    val tl = mk(root)
    val sub = new Subscription(tl, "s1", SubscriptionType.Exclusive, s"$root/_c")
    val seen = scala.collection.mutable.ListBuffer[Long]()
    val q = sub.seekFilter(fromOffset = 30L).writeStream
      .option("checkpointLocation", s"$root/_c/seek")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        seen ++= b.select(Envelope.Offset).as[Long](spark.implicits.newLongEncoder).collect()
        ()
      }.trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    assert(seen.nonEmpty && seen.forall(_ >= 30L), s"offsets below seek point: ${seen.filter(_ < 30).take(5)}")
  }

  test("seek by timestamp finds the first qualifying offset per partition") {
    val root = Files.createTempDirectory("graft-seek-ts").toString
    val tl = mk(root)
    val seek = tl.seekByTime(java.sql.Timestamp.valueOf("1970-01-01 00:00:40"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(seek.nonEmpty)
    // replaying from the seek offsets yields exactly the rows >= ts
    val replayCond = seek.map { case (p, o) =>
      (col(Envelope.Partition) === p) && (col(Envelope.Offset) >= o)
    }.reduce(_ || _)
    val replayed = tl.read().filter(replayCond)
    assert(replayed.filter(col(Envelope.PublishTime) <
      lit("1970-01-01 00:00:40").cast("timestamp")).count() == 0)
    assert(replayed.count() ==
      tl.read().filter(col(Envelope.PublishTime) >=
        lit("1970-01-01 00:00:40").cast("timestamp")).count())
  }
}
