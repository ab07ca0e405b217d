package graft

import graft.log.{AckLog, TopicLog, Txn}
import graft.model.{Envelope, TopicName}
import graft.streaming.AckState
import org.apache.spark.sql.functions._
import java.nio.file.Files

/**
 * Ack-log compaction — bounded cursor state (reference
 * ManagedCursorImpl: the durable cursor is markDeletePosition +
 * individualDeletedMessages above it, never every historical ack).
 * Compaction must be ANSWER-PRESERVING: markDelete and backlog are
 * identical before and after, while the stored rows shrink to the
 * above-floor survivors.
 */
class AckCompactionSpec extends SparkSpec {
  import spark.implicits._

  private def batch(ids: Range) =
    ids.map(i => (s"u${i % 7}", s"payload-$i", s"prod-${i % 3}", i.toLong, i.toLong))
      .toDF(Envelope.Key, Envelope.Value, Envelope.ProducerName,
        Envelope.SequenceId, "t")
      .withColumn(Envelope.PublishTime, timestamp_seconds(col("t"))).drop("t")

  private def mdMap(df: org.apache.spark.sql.DataFrame): Map[Int, Long] =
    df.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap

  private def blMap(df: org.apache.spark.sql.DataFrame): Map[Int, Long] =
    df.collect().map(r => r.getInt(0) -> r.getLong(1)).toMap

  test("compaction preserves markDelete and backlog while shrinking storage") {
    val root = Files.createTempDirectory("graft-ackc").toString
    val in = new TopicLog(spark, root, TopicName.parse("in"), 2)
    in.append(batch(0 until 60))
    val acks = new AckLog(spark, in.name.path(root), "sub-a")
    // dense prefix + sparse tail: offsets ≤ 15 and every 4th above
    acks.ack(in.read()
      .filter(col(Envelope.Offset) <= 15 || col(Envelope.Offset) % 4 === 0)
      .select(col(Envelope.Partition).as("partition"),
        col(Envelope.Offset).as("offset"))): Unit

    // pre-compaction: floor-aware accessors ≡ the plain AckState forms
    val md0 = mdMap(AckState.markDeletePosition(acks.read()))
    val bl0 = blMap(AckState.backlog(in.read(), acks.read()))
    assert(mdMap(acks.markDelete()) == md0,
      "floor-aware markDelete must equal the dense-prefix rule pre-compaction")
    assert(blMap(acks.backlogAgainst(in.read())) == bl0)

    val rowsBefore = acks.read().count()
    val removed = acks.compact()
    assert(removed > 0, "the dense prefix must fold into the cursor")
    assert(acks.read().count() == rowsBefore - removed)
    assert(acks.cursor() == md0, "cursor floor = the markDelete at compaction")
    // no surviving row at/below the floor
    val below = acks.read().join(
        acks.markDelete().withColumnRenamed("mark_delete", "f"), Seq("partition"))
      .filter(col("offset") <= col("f") &&
        col("offset") <= lit(md0.values.max)).count()
    assert(acks.read().collect().forall(r => r.getLong(1) > md0(r.getInt(0))),
      s"rows at/below the floor must be gone (found $below)")

    // post-compaction answers identical
    assert(mdMap(acks.markDelete()) == md0)
    assert(blMap(acks.backlogAgainst(in.read())) == bl0)

    // a second compaction with nothing new to fold removes nothing
    assert(acks.compact() == 0L)
    assert(mdMap(acks.markDelete()) == md0)
  }

  test("acks after compaction advance the cursor ACROSS the floor boundary") {
    val root = Files.createTempDirectory("graft-ackc").toString
    val in = new TopicLog(spark, root, TopicName.parse("in"), 2)
    in.append(batch(0 until 40))
    val acks = new AckLog(spark, in.name.path(root), "sub-a")
    acks.ack(in.read().filter(col(Envelope.Offset) <= 7)
      .select(col(Envelope.Partition).as("partition"),
        col(Envelope.Offset).as("offset"))): Unit
    acks.compact(): Unit
    assert(acks.cursor().values.forall(_ == 7L))
    // ack 8..10: the dense run must continue from the FLOOR, not from 0
    acks.ack(in.read()
      .filter(col(Envelope.Offset) >= 8 && col(Envelope.Offset) <= 10)
      .select(col(Envelope.Partition).as("partition"),
        col(Envelope.Offset).as("offset"))): Unit
    assert(mdMap(acks.markDelete()).values.forall(_ == 10L),
      "markDelete must bridge the compacted prefix and the new acks")
    // and a txn ack still lands through the same store — key-hash
    // routing is uneven, so offset 11 exists only on partitions whose
    // high-water reaches it; those advance to 11, the rest stay at 10
    Txn.begin(root).ack(acks, in.read()
      .filter(col(Envelope.Offset) === 11)
      .select(col(Envelope.Partition).as("partition"),
        col(Envelope.Offset).as("offset"))).commit()
    val want = in.highWater().map { case (p, hw) => p -> math.min(11L, hw) }
    assert(mdMap(acks.markDelete()) == want,
      "txn ack after compaction must advance the floor-aware cursor")
  }

  test("crash leftovers (old ack file resurfacing) are harmless duplicates") {
    val root = Files.createTempDirectory("graft-ackc").toString
    val in = new TopicLog(spark, root, TopicName.parse("in"), 2)
    in.append(batch(0 until 30))
    val acks = new AckLog(spark, in.name.path(root), "sub-a")
    acks.ack(in.read().filter(col(Envelope.Offset) <= 9)
      .select(col(Envelope.Partition).as("partition"),
        col(Envelope.Offset).as("offset"))): Unit
    // snapshot an ack file as a "crash left the old file behind" relic
    import scala.collection.JavaConverters._
    val w = Files.walk(java.nio.file.Paths.get(acks.basePath))
    val anyFile = try w.iterator().asScala
      .find(p => p.toString.endsWith(".parquet") &&
        !p.toString.contains("_staging")).get
    finally w.close()
    val relic = Files.createTempDirectory("graft-relic").resolve("relic.parquet")
    Files.copy(anyFile, relic): Unit

    val md0 = mdMap(acks.markDelete())
    val bl0 = blMap(acks.backlogAgainst(in.read()))
    acks.compact(): Unit
    // resurrect the pre-compaction file next to the survivors
    Files.copy(relic, java.nio.file.Paths.get(acks.basePath, "relic.parquet")): Unit
    assert(mdMap(acks.markDelete()) == md0,
      "duplicate/stale ack rows must not change the cursor (acks are idempotent facts)")
    assert(blMap(acks.backlogAgainst(in.read())) == bl0)
  }
}
