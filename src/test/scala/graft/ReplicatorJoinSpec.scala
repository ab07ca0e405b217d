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

  private def envRows(producer: String, seqs: Range, keyPrefix: String) =
    seqs.map(i => (s"$keyPrefix$i", s"v$i", producer, i.toLong, 1700000000L + i))
      .toDF(Envelope.Key, Envelope.Value, Envelope.ProducerName,
        Envelope.SequenceId, "t")
      .withColumn(Envelope.PublishTime, timestamp_seconds(col("t"))).drop("t")

  test("replicated subscription: cursor travels to the replica at an equivalent position") {
    import graft.streaming.ReplicatedCursors
    val dir = Files.createTempDirectory("graft-repl-cur").toString
    val primary = new TopicLog(spark, s"$dir/east", TopicName.parse("rs-topic"), 2)
    val replica = new TopicLog(spark, s"$dir/west", TopicName.parse("rs-topic"), 2)
    primary.append(envRows("p", 0 until 20, "k"))

    // replication lagging: first half only -> snapshot must NOT complete
    val all = primary.read()
      .select(Envelope.Key, Envelope.Value, Envelope.ProducerName,
        Envelope.SequenceId, Envelope.PublishTime)
      .withColumn(Envelope.ReplicatedFrom, lit("east"))
    replica.append(all.filter(col(Envelope.SequenceId) < 10))
    assert(ReplicatedCursors.snapshot(primary.read(), replica.read()).isEmpty,
      "a consistent cut must not form while replication is draining")

    // drained: snapshot gives the per-partition consistent cut
    replica.append(all.filter(col(Envelope.SequenceId) >= 10))
    val snap = ReplicatedCursors.snapshot(primary.read(), replica.read())
    assert(snap.nonEmpty)
    assert(snap.get._1 == primary.highWater() && snap.get._2 == replica.highWater())

    // local subscription consumed through the 3rd row of each partition;
    // then the primary cluster dies — resume on the replica
    val localCursor = primary.read()
      .groupBy(Envelope.Partition)
      .agg(expr(s"sort_array(collect_list(${Envelope.Offset}))[2]").as("md"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val acked = primary.read().filter(localCursor.map { case (p, o) =>
        (col(Envelope.Partition) === p) && (col(Envelope.Offset) <= o)
      }.reduce(_ || _))
      .select(Envelope.ProducerName, Envelope.SequenceId)
      .as[(String, Long)].collect().toSet
    val travelled = ReplicatedCursors.translateCursor(
      primary.read(), replica.read(), localCursor)
    val resumed = ReplicatedCursors.applyCursor(replica.read(), travelled)
      .select(Envelope.ProducerName, Envelope.SequenceId)
      .as[(String, Long)].collect().toSeq
    val unacked = primary.read()
      .select(Envelope.ProducerName, Envelope.SequenceId)
      .as[(String, Long)].collect().toSet -- acked
    // same per-partition order on both clusters -> EXACT handover:
    // every unacked row re-readable, no acked row re-delivered
    assert(resumed.size == resumed.toSet.size)
    assert(resumed.toSet == unacked,
      s"resume must hand over exactly the unacked rows; got ${resumed.toSet}")
  }

  test("replicated subscription: an unacked foreign row bounds cumulative ack (at-least-once)") {
    import graft.streaming.ReplicatedCursors
    val dir = Files.createTempDirectory("graft-repl-gap").toString
    val primary = new TopicLog(spark, s"$dir/east", TopicName.parse("rs-gap"), 2)
    val replica = new TopicLog(spark, s"$dir/west", TopicName.parse("rs-gap"), 2)
    primary.append(envRows("p", 0 until 12, "k"))
    val all = primary.read()
      .select(Envelope.Key, Envelope.Value, Envelope.ProducerName,
        Envelope.SequenceId, Envelope.PublishTime)
      .withColumn(Envelope.ReplicatedFrom, lit("east"))
    // the replica topic ALSO carries a west-local row (active-active),
    // interleaved mid-stream in k0's partition: same key -> same routing,
    // publish_time between the replicated rows
    val foreign = Seq(("k0", "west-local", "w", 0L))
      .toDF(Envelope.Key, Envelope.Value, Envelope.ProducerName, Envelope.SequenceId)
      .withColumn(Envelope.PublishTime,
        expr("timestamp_millis(1700000005500)")) // between seq 5 and 6
    replica.append(all.unionByName(foreign, allowMissingColumns = true))

    // local cursor: EVERYTHING on the primary is consumed
    val localCursor = primary.highWater()
    val travelled = ReplicatedCursors.translateCursor(
      primary.read(), replica.read(), localCursor)
    val resumed = ReplicatedCursors.applyCursor(replica.read(), travelled)
      .select(Envelope.ProducerName, Envelope.SequenceId)
      .as[(String, Long)].collect().toSet
    // the foreign row is NOT acked by the travelling subscription, so
    // cumulative ack stops below it: the row itself plus the acked
    // replicated rows ABOVE the gap re-deliver (at-least-once), and
    // nothing unacked is skipped
    assert(resumed.contains(("w", 0L)), "the unacked foreign row must re-deliver")
    val foreignPartition = replica.read()
      .filter(col(Envelope.ProducerName) === "w")
      .select(Envelope.Partition).as[Int].head()
    val aboveGap = replica.read()
      .filter(col(Envelope.Partition) === foreignPartition &&
        col(Envelope.PublishTime) > expr("timestamp_millis(1700000005500)"))
      .select(Envelope.ProducerName, Envelope.SequenceId)
      .as[(String, Long)].collect().toSet
    assert(resumed == aboveGap + (("w", 0L)),
      "re-delivery is exactly the gap row and what sits above it")
    // the OTHER partition has no gap: its cursor travels to the top
    val otherTop = replica.read()
      .filter(col(Envelope.Partition) =!= foreignPartition)
      .agg(max(Envelope.Offset)).head().getLong(0)
    assert(travelled(if (foreignPartition == 0) 1 else 0) == otherTop)
  }

  test("torn snapshot: a MID-STREAM replication hole blocks the cut even when tops line up") {
    import graft.streaming.ReplicatedCursors
    val dir = Files.createTempDirectory("graft-repl-torn").toString
    val primary = new TopicLog(spark, s"$dir/east", TopicName.parse("rs-torn"), 2)
    val replica = new TopicLog(spark, s"$dir/west", TopicName.parse("rs-torn"), 2)
    primary.append(envRows("p", 0 until 20, "k"))
    val all = primary.read()
      .select(Envelope.Key, Envelope.Value, Envelope.ProducerName,
        Envelope.SequenceId, Envelope.PublishTime)
      .withColumn(Envelope.ReplicatedFrom, lit("east"))
    // the replica is missing a MIDDLE slice (seq 8-11) but has the tail:
    // per-partition high-waters match the primary's shape, so a snapshot
    // that only compared top positions would wrongly declare the cut
    // consistent — the identity-level check must refuse it (the
    // reference's not-ready snapshot, SnapshotBuilder isTimedOut path)
    replica.append(all.filter(col(Envelope.SequenceId) < 8 ||
      col(Envelope.SequenceId) >= 12))
    assert(ReplicatedCursors.snapshot(primary.read(), replica.read()).isEmpty,
      "a torn (mid-stream hole) replica must not form a consistent cut")
    // and cursor translation over the torn replica still never skips the
    // hole: with everything local acked, resume hands over nothing below
    // the hole twice and nothing above it is lost
    val travelled = ReplicatedCursors.translateCursor(
      primary.read(), replica.read(), primary.highWater())
    val resumed = ReplicatedCursors.applyCursor(replica.read(), travelled)
      .select(Envelope.ProducerName, Envelope.SequenceId)
      .as[(String, Long)].collect().toSet
    // every row present on the replica is acked locally, so the whole
    // replica prefix closes and nothing re-delivers
    assert(resumed.isEmpty,
      "fully-acked torn replica: cumulative ack may advance to its top")
    // healing the hole re-forms the cut
    replica.append(all.filter(col(Envelope.SequenceId) >= 8 &&
      col(Envelope.SequenceId) < 12))
    assert(ReplicatedCursors.snapshot(primary.read(), replica.read()).nonEmpty)
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
