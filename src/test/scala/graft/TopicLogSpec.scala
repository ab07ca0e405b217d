package graft

import graft.log.TopicLog
import graft.model.{Envelope, TopicName}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Produce-path specs: offset assignment, manifest commit, reader/seek. */
class TopicLogSpec extends SparkSpec {
  import spark.implicits._

  private def freshLog(): TopicLog = {
    val root = Files.createTempDirectory("graft-topic").toString
    new TopicLog(spark, root, TopicName.parse("persistent://public/default/t1"),
      numPartitions = 4)
  }

  private def batch(ids: Range) =
    ids.map(i => (s"u${i % 7}", s"payload-$i", s"prod-${i % 3}", i.toLong, i.toLong))
      .toDF(Envelope.Key, Envelope.Value, Envelope.ProducerName,
        Envelope.SequenceId, "t")
      .withColumn(Envelope.PublishTime, timestamp_seconds(col("t"))).drop("t")

  test("append assigns dense per-partition offsets from 0") {
    val log = freshLog()
    assert(log.append(batch(0 until 100)) == 100)
    val offs = log.read().groupBy(Envelope.Partition)
      .agg(count(lit(1)).as("n"), min(Envelope.Offset).as("lo"),
        max(Envelope.Offset).as("hi"))
      .select(col("n"), col("lo"), col("hi")).as[(Long, Long, Long)].collect()
    offs.foreach { case (n, lo, hi) =>
      assert(lo == 0L); assert(hi == n - 1)
    }
  }

  test("second append continues offsets; high-water advances") {
    val log = freshLog()
    log.append(batch(0 until 50))
    val hw1 = log.highWater()
    log.append(batch(50 until 120))
    val hw2 = log.highWater()
    assert(hw2.values.sum > hw1.values.sum)
    // dense: per partition max = count - 1
    val byPart = log.read().groupBy(Envelope.Partition)
      .agg(count(lit(1)).as("n"), max(Envelope.Offset).as("hi"))
      .select(col("n"), col("hi")).as[(Long, Long)].collect()
    byPart.foreach { case (n, hi) => assert(hi == n - 1) }
    assert(log.read().count() == 120)
  }

  test("same key always routes to the same partition") {
    val log = freshLog()
    log.append(batch(0 until 200))
    val multi = log.read().groupBy(Envelope.Key)
      .agg(countDistinct(Envelope.Partition).as("np")).filter(col("np") > 1)
    assert(multi.count() == 0)
  }

  test("reader from offset and seek-by-time") {
    val log = freshLog()
    log.append(batch(0 until 100))
    val from5 = log.readFrom(0, 5L)
    assert(from5.agg(min(Envelope.Offset)).as[Long].head() == 5L)
    val seek = log.seekByTime(java.sql.Timestamp.valueOf("1970-01-01 00:00:50"))
    // every partition's seek offset exists and points at publish_time >= ts
    val joined = log.read().join(seek, Seq(Envelope.Partition))
      .filter(col(Envelope.Offset) === col("seek_offset"))
      .filter(col(Envelope.PublishTime) <
        lit("1970-01-01 00:00:50").cast("timestamp"))
    assert(joined.count() == 0)
  }

  test("uncommitted files are invisible (manifest gate)") {
    val log = freshLog()
    log.append(batch(0 until 40))
    val before = log.read().count()
    // simulate a torn write: parquet lands but no manifest commit
    batch(1000 until 1050)
      .withColumn(Envelope.Partition, lit(0))
      .withColumn(Envelope.Topic, lit("t"))
      .withColumn(Envelope.Offset, col(Envelope.SequenceId) + 100000L)
      .write.mode("append").partitionBy(Envelope.Partition)
      .parquet(log.name.path(log.root))
    assert(log.read().count() == before, "reader must not see uncommitted offsets")
  }
}
