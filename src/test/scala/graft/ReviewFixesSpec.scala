package graft

import graft.log.{Admin, TopicLog, Txn}
import graft.model.{Envelope, SchemaRegistry, TopicName}
import graft.operators.Compaction
import graft.streaming.{StreamOps, Subscription, SubscriptionType}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}

/** Regression tests for the code-review findings: txn recovery,
  * read-committed subscriptions, admin vs compaction snapshots,
  * connector replay idempotence, watermark persistence, widened decode. */
class ReviewFixesSpec extends SparkSpec {
  import spark.implicits._

  private def batch(ids: Range) =
    ids.map(i => (s"u${i % 5}", s"v$i", "p", i.toLong))
      .toDF(Envelope.Key, Envelope.Value, Envelope.ProducerName, Envelope.SequenceId)
      .withColumn(Envelope.PublishTime, timestamp_seconds(col(Envelope.SequenceId)))

  test("txn recovery republishes manifests lost after the commit marker") {
    val root = Files.createTempDirectory("graft-txn-rec").toString
    val l1 = new TopicLog(spark, root, TopicName.parse("ta"))
    val l2 = new TopicLog(spark, root, TopicName.parse("tb"))
    Txn.begin(root).produce(l1, batch(0 until 10))
      .produce(l2, batch(0 until 6)).commit()
    assert(l1.read().count() == 10 && l2.read().count() == 6)

    // simulate a crash mid-publish: the marker exists but one topic's
    // manifest vanished before readers saw it
    import scala.collection.JavaConverters._
    val manifests = Files.list(Paths.get(l2.name.path(root), "_manifest"))
      .iterator().asScala.toSeq
    manifests.foreach(Files.delete(_))
    assert(l2.read().count() == 0, "manifest gone -> nothing visible")

    val replayed = Txn.recover(root)
    assert(replayed >= 1, "recover must republish from the marker")
    assert(l2.read().count() == 6, "all rows visible again after recovery")
  }

  test("subscription never delivers uncommitted (orphaned) rows") {
    val root = Files.createTempDirectory("graft-sub-rc").toString
    val tl = new TopicLog(spark, root, TopicName.parse("rc-topic"), 2)
    tl.append(batch(0 until 20))
    // orphan: data file present, no manifest (producer crash window)
    batch(100 until 120)
      .withColumn(Envelope.Partition, lit(0))
      .withColumn(Envelope.Topic, lit("t"))
      .withColumn(Envelope.Offset, col(Envelope.SequenceId) + 50000L)
      .write.mode("append").partitionBy(Envelope.Partition)
      .parquet(tl.name.path(root))

    val sub = new Subscription(tl, "rc-sub", SubscriptionType.Exclusive,
      checkpointRoot = s"$root/_cursors")
    var delivered = 0L
    var sawOrphan = false
    val q = sub.consume { (mb, _) =>
      delivered += mb.count()
      sawOrphan ||= mb.filter(col(Envelope.Offset) >= 50000L).count() > 0
    }
    q.awaitTermination(60000)
    assert(delivered == 20, s"delivered $delivered")
    assert(!sawOrphan, "uncommitted rows must be invisible to subscribers")
  }

  test("admin retention/offload/coalesce leave compaction snapshots intact") {
    val root = Files.createTempDirectory("graft-admin-snap").toString
    val tl = new TopicLog(spark, root, TopicName.parse("snap-topic"), 2)
    tl.append(batch(0 until 20))
    Compaction.triggerCompaction(tl)
    val before = Compaction.readCompactedTopic(tl).count()
    assert(before > 0)
    // ancient publish_times -> retention deletes every DATA file
    assert(Admin.retentionTrim(tl, nowMs = 10_000_000L, retentionMs = 1000L) > 0)
    // snapshot untouched and still readable
    val snapDir = Paths.get(tl.name.path(root), "_compacted")
    assert(Files.exists(snapDir))
    assert(spark.read.parquet(snapDir.toString).count() == before)
  }

  test("file connector replay (checkpoint loss) appends zero duplicates") {
    import graft.sources.Connectors
    val dir = Files.createTempDirectory("graft-replay").toString
    val inDir = s"$dir/in"; Files.createDirectories(Paths.get(inDir))
    Files.writeString(Paths.get(s"$inDir/a.json"),
      """{"id": 1, "v": "x"}
        |{"id": 2, "v": "y"}""".stripMargin)
    val schema = StructType(Seq(StructField("id", LongType), StructField("v", StringType)))
    val topic = new TopicLog(spark, s"$dir/log", TopicName.parse("replay"), 1)
    val q1 = Connectors.fileSourceToTopic(spark, inDir, schema, "json",
      topic, "id", s"$dir/ckpt1")
    q1.awaitTermination(60000)
    assert(topic.read().count() == 2)
    // full replay with a FRESH checkpoint (worst case: all batches redone)
    val q2 = Connectors.fileSourceToTopic(spark, inDir, schema, "json",
      topic, "id", s"$dir/ckpt2")
    q2.awaitTermination(60000)
    assert(topic.read().count() == 2, "replay must be idempotent")
  }

  test("late-data watermark survives a query restart") {
    implicit val sqlCtx = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft-wm-restart").toString
    def run(input: MemoryStream[(String, Long)],
            main: scala.collection.mutable.ListBuffer[Long],
            late: scala.collection.mutable.ListBuffer[Long]) =
      StreamOps.withLateDataSplit(
        input.toDF().toDF("k", "t")
          .withColumn("event_time", timestamp_seconds(col("t"))),
        "event_time", 10000L, ckpt,
        b => main ++= b.select("t").as[Long](spark.implicits.newLongEncoder).collect(),
        b => late ++= b.select("t").as[Long](spark.implicits.newLongEncoder).collect())
    val in1 = MemoryStream[(String, Long)]
    val m1 = scala.collection.mutable.ListBuffer[Long]()
    val l1 = scala.collection.mutable.ListBuffer[Long]()
    val q1 = run(in1, m1, l1)
    in1.addData(("a", 1000L), ("a", 2000L))
    q1.processAllAvailable(); q1.stop()
    // restart: a NEW query over the same source + checkpoint dir; fresh
    // listener buffers prove the state came from disk, not the closure
    val m2 = scala.collection.mutable.ListBuffer[Long]()
    val l2 = scala.collection.mutable.ListBuffer[Long]()
    val q2 = run(in1, m2, l2)
    try {
      in1.addData(("a", 100L)) // far behind the persisted watermark (1990s)
      q2.processAllAvailable()
      assert(l2.contains(100L),
        s"restarted query lost the watermark: late=$l2 main=$m2")
    } finally q2.stop()
  }

  test("txn with two produces to the SAME topic commits both without offset collision") {
    val root = Files.createTempDirectory("graft-txn-same").toString
    val l1 = new TopicLog(spark, root, TopicName.parse("same-topic"))
    Txn.begin(root).produce(l1, batch(0 until 10))
      .produce(l1, batch(10 until 25)).commit()
    assert(l1.read().count() == 25)
    // offsets dense per partition — no collisions from double staging
    val dup = l1.read().groupBy(Envelope.Partition, Envelope.Offset)
      .count().filter(col("count") > 1)
    assert(dup.count() == 0, "colliding offsets detected")
  }

  test("staged-but-unpublished appends are invisible to streams AND batch; recovery heals mid-publish crash") {
    val root = Files.createTempDirectory("graft-staging").toString
    val tl = new TopicLog(spark, root, TopicName.parse("stage-topic"), 2)
    tl.append(batch(0 until 10))
    // stage without publishing: nothing visible anywhere
    val stagedAppend = tl.stageAppend(batch(10 until 30))
    assert(tl.read().count() == 10)
    import scala.collection.JavaConverters._
    val listed = spark.read.parquet(tl.name.path(root)).count()
    assert(listed == 10, "staged files must be invisible to raw file listing")
    // simulate crash after manifest write but before moves:
    // write the manifest manually, leave files staged
    val manifestFile = Paths.get(tl.name.path(root), "_manifest",
      stagedAppend.manifestPath)
    Files.write(manifestFile, stagedAppend.manifestLines.getBytes)
    assert(spark.read.parquet(tl.name.path(root)).count() == 10,
      "rows still not in readable dirs")
    val healed = TopicLog.recoverStaging(tl.name.path(root))
    assert(healed == 1)
    assert(tl.read().count() == 30, "recovery completes the publish")
  }

  test("repetition ratio survives documents shorter than the n-gram") {
    val docs = Seq((1L, "single"), (2L, ""), (3L, "two words here"))
      .toDF("doc_id", "text")
    val r = graft.ext.TextOps.withRepetitionRatio(docs)
    assert(r.count() == 3) // no crash; short docs get null ratio
    assert(r.filter(col("doc_id") === 3L)
      .select("top_bigram_ratio").head().getDouble(0) == 0.5)
  }

  test("versioned decode widens int->long instead of corrupting") {
    val v1 = StructType(Seq(StructField("a", IntegerType)))
    val v2 = StructType(Seq(StructField("a", LongType)))
    val df = Seq(("""{"a": 5}""", 1), ("""{"a": 3000000000}""", 2))
      .toDF("value", "schema_version")
    val out = SchemaRegistry.decodeVersioned(df, "value", Map(1 -> v1, 2 -> v2))
      .select("decoded.a").as[Long].collect()
    assert(out.toSeq == Seq(5L, 3000000000L),
      "later-widened values must not be narrowed")
  }
}
