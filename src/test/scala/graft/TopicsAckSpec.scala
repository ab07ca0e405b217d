package graft

import graft.log.{TopicLog, Topics}
import graft.model.{Envelope, TopicName}
import graft.streaming.AckState
import org.apache.spark.sql.functions._
import java.nio.file.Files

class TopicsAckSpec extends SparkSpec {
  import spark.implicits._

  private def mkTopic(root: String, fqn: String): TopicLog = {
    val tl = new TopicLog(spark, root, TopicName.parse(fqn), 2)
    tl.append(Seq(("k", "v", "p", 0L))
      .toDF(Envelope.Key, Envelope.Value, Envelope.ProducerName, Envelope.SequenceId)
      .withColumn(Envelope.PublishTime, current_timestamp()))
    tl
  }

  test("topic catalog lists and regex-matches topics across namespaces") {
    val root = Files.createTempDirectory("graft-topics").toString
    mkTopic(root, "persistent://public/default/orders-eu")
    mkTopic(root, "persistent://public/default/orders-us")
    mkTopic(root, "persistent://public/default/audit")
    mkTopic(root, "persistent://tenant2/ns/orders-eu")

    assert(Topics.list(root).map(_.fqn).size == 4)
    val matched = Topics.listMatching(root, "public", "default", "orders-.*")
    assert(matched.map(_.topic).toSet == Set("orders-eu", "orders-us"))

    val union = Topics.subscribePattern(spark, root, "public", "default", "orders-.*")
    assert(union.count() == 2)
    assert(union.select(Envelope.Topic).distinct().count() == 2)
  }

  test("partitioned-topic metadata round trip") {
    val root = Files.createTempDirectory("graft-meta").toString
    val tn = TopicName.parse("persistent://public/default/pt")
    Topics.createPartitioned(root, tn, 16)
    assert(Topics.partitionCount(root, tn).contains(16))
    assert(Topics.partitionCount(root, TopicName.parse("missing")).isEmpty)
  }

  test("mark-delete position: dense prefix only; holes keep it back") {
    val acks = Seq((0, 0L), (0, 1L), (0, 2L), (0, 5L), (1, 3L))
      .toDF("partition", "offset")
    val md = AckState.markDeletePosition(acks)
      .as[(Int, Long)].collect().toMap
    assert(md(0) == 2L, "offset 5 acked out of order must not advance markDelete")
    assert(!md.contains(1), "partition 1 has no dense prefix from 0")
  }

  test("batch-index acks: entry completes only when every index is acked") {
    val entrySizes = Seq((0, 0L, 2L), (0, 1L, 3L), (0, 2L, 1L))
      .toDF("partition", "offset", "batch_size")
    val acks = Seq(
      (0, 0L, 0), (0, 0L, 1),          // entry 0 fully acked (2/2)
      (0, 1L, 0), (0, 1L, 2),          // entry 1 partial (2/3)
      (0, 2L, 0))                      // entry 2 fully acked (1/1)
      .toDF("partition", "offset", "batch_index")
    val completed = AckState.completedEntries(acks, entrySizes)
      .select("offset").as[Long].collect().toSet
    assert(completed == Set(0L, 2L))
    // markDelete stops at 0: offset 1 is incomplete, so 2 can't join the prefix
    val md = AckState.markDeleteWithBatchAcks(acks, entrySizes)
      .select("mark_delete").as[Long].collect().toSeq
    assert(md == Seq(0L))
  }

  test("ack-timeout redelivery bumps count and schedules backoff") {
    val log = Seq((0, 0L, "a", 0), (0, 1L, "b", 0), (0, 2L, "c", 0))
      .toDF(Envelope.Partition, Envelope.Offset, Envelope.Value, Envelope.RedeliveryCnt)
    val now = java.sql.Timestamp.valueOf("2024-01-01 00:10:00")
    val delivered = Seq(
      (0, 0L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),  // timed out
      (0, 1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),  // timed out but acked
      (0, 2L, java.sql.Timestamp.valueOf("2024-01-01 00:09:50")))  // fresh
      .toDF("partition", "offset", "delivered_at")
    val acks = Seq((0, 1L)).toDF("partition", "offset")
    val redeliver = AckState.redeliverOnTimeout(log, delivered, acks, now,
      ackTimeoutMs = 60000L)
    val rows = redeliver.select(Envelope.Offset, Envelope.RedeliveryCnt)
      .as[(Long, Int)].collect().toMap
    assert(rows.keySet == Set(0L), s"only the unacked timed-out message: $rows")
    assert(rows(0L) == 1)
    val da = redeliver.select(Envelope.DeliverAt)
      .as[java.sql.Timestamp].head()
    assert(da.after(now), "backoff must schedule in the future")
  }
}
