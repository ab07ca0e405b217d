package graft

import graft.log.TopicLog
import graft.model.{Envelope, TopicName}
import graft.operators.{Compaction, Windows}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

class CompactionJobSpec extends SparkSpec {
  import spark.implicits._

  test("triggerCompaction materializes a snapshot; readCompacted = snapshot + tail") {
    val root = Files.createTempDirectory("graft-compact").toString
    val tl = new TopicLog(spark, root, TopicName.parse("c-topic"), 2)
    tl.append(Seq(("k1", "v1", "p", 0L), ("k2", "a", "p", 1L), ("k1", "v2", "p", 2L))
      .toDF(Envelope.Key, Envelope.Value, Envelope.ProducerName, Envelope.SequenceId)
      .withColumn(Envelope.PublishTime, current_timestamp()))

    val horizon = Compaction.triggerCompaction(tl)
    assert(horizon.nonEmpty)
    val compactedOnly = Compaction.readCompactedTopic(tl)
    // snapshot holds exactly the latest value per key
    val snap = compactedOnly.groupBy(Envelope.Key)
      .agg(max_by(col(Envelope.Value), col(Envelope.Offset)).as("v"))
      .as[(String, String)].collect().toMap
    assert(snap == Map("k1" -> "v2", "k2" -> "a"))

    // new appends after the snapshot appear as tail
    tl.append(Seq(("k3", "new", "p", 10L))
      .toDF(Envelope.Key, Envelope.Value, Envelope.ProducerName, Envelope.SequenceId)
      .withColumn(Envelope.PublishTime, current_timestamp()))
    val withTail = Compaction.readCompactedTopic(tl)
    assert(withTail.filter(col(Envelope.Key) === "k3").count() == 1)
    // snapshot part did not grow
    assert(withTail.count() == snap.size + 1)
  }

  test("streaming windowed aggregation with watermark emits finalized windows (append mode)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val stream = input.toDF().toDF("event_type", "t")
      .withColumn("event_time", timestamp_seconds(col("t")))
    val agg = stream
      .withWatermark("event_time", "10 seconds")
      .groupBy(window(col("event_time"), "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))
    val q = agg.writeStream.format("memory").queryName("ww")
      .outputMode("append").start()
    try {
      input.addData(("a", 10L), ("a", 20L), ("b", 30L))
      q.processAllAvailable()
      assert(spark.table("ww").count() == 0) // window [0,60) not finalized
      input.addData(("a", 130L))             // watermark -> 120s, closes [0,60)
      q.processAllAvailable()
      input.addData(("a", 200L))             // watermark -> 190s, closes [120,180)
      q.processAllAvailable()
      val rows = spark.table("ww").as[(java.sql.Timestamp, String, Long)]
        .collect().map { case (ws, et, n) => (ws.getTime / 1000, et, n) }.toSet
      assert(rows == Set((0L, "a", 2L), (0L, "b", 1L), (120L, "a", 1L)),
        s"finalized window counts wrong: $rows")
    } finally q.stop()
  }
}
