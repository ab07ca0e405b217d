package graft

import graft.log.TopicLog
import graft.model.{Envelope, TopicName}
import graft.streaming.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

class ReplicatorJoinSpec extends SparkSpec {
  import spark.implicits._

  test("geo-replicator copies the topic, stamps origin, and never loops") {
    val dir = Files.createTempDirectory("graft-repl").toString
    val topic = new TopicLog(spark, dir, TopicName.parse("r-topic"), 2)
    // local rows + a row that already came FROM the remote (must not bounce)
    topic.append(Seq(
      ("k1", "local-1", "p", 0L, null),
      ("k2", "local-2", "p", 1L, null),
      ("k3", "from-west", "p", 2L, "west"))
      .toDF(Envelope.Key, Envelope.Value, Envelope.ProducerName,
        Envelope.SequenceId, Envelope.ReplicatedFrom)
      .withColumn(Envelope.PublishTime, current_timestamp()))

    val remotePath = s"$dir/remote-west"
    val stream = spark.readStream
      .schema(spark.read.parquet(topic.name.path(topic.root)).schema)
      .parquet(topic.name.path(topic.root))
    // replicating east->west: the replicator itself must skip rows that
    // originated at west (no pre-filtering here — that's the contract)
    val q = StreamOps.replicator(stream, selfCluster = "east",
      targetCluster = "west", targetPath = remotePath,
      checkpoint = s"$dir/ckpt")
    q.processAllAvailable(); q.stop()

    val remote = spark.read.parquet(remotePath)
    assert(remote.count() == 2, "the west-origin row must not bounce back")
    // copies carry the origin stamp (isDuplicateReplV1 cycle rule input)
    assert(remote.filter(col(Envelope.ReplicatedFrom) === "east").count() == 2)
  }

  test("stream-stream inner join with watermarks (inherited §2.16 surface)") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Long)]  // (user, t)
    val buys = MemoryStream[(Long, Long)]
    val c = clicks.toDF().toDF("user_id", "tc")
      .withColumn("click_time", timestamp_seconds(col("tc")))
      .withWatermark("click_time", "10 seconds")
    val b = buys.toDF().toDF("buser", "tb")
      .withColumn("buy_time", timestamp_seconds(col("tb")))
      .withWatermark("buy_time", "10 seconds")
    val joined = c.join(b,
      col("user_id") === col("buser") &&
        col("buy_time").between(col("click_time"),
          col("click_time") + expr("INTERVAL 30 SECONDS")))
    val q = joined.writeStream.format("memory").queryName("ssj")
      .outputMode("append").start()
    try {
      clicks.addData((1L, 100L), (2L, 100L))
      buys.addData((1L, 110L))        // within 30s of user 1's click
      q.processAllAvailable()
      buys.addData((2L, 200L))        // outside the interval
      q.processAllAvailable()
      val rows = spark.table("ssj").select("user_id", "tc", "tb")
        .as[(Long, Long, Long)].collect().toSet
      assert(rows == Set((1L, 100L, 110L)), s"got $rows")
    } finally q.stop()
  }
}
