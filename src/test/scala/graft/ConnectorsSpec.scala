package graft

import graft.log.TopicLog
import graft.model.{SchemaRegistry, TopicName}
import graft.sources.Connectors
import graft.streaming.{BatchReceivePolicy, Subscription, SubscriptionType}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

class ConnectorsSpec extends SparkSpec {
  import spark.implicits._

  test("file IO source -> topic -> file IO sink round trip") {
    val dir = Files.createTempDirectory("graft-io").toString
    val inDir = s"$dir/in"; Files.createDirectories(java.nio.file.Paths.get(inDir))
    Files.writeString(java.nio.file.Paths.get(s"$inDir/a.json"),
      """{"id": 1, "name": "x"}
        |{"id": 2, "name": "y"}
        |{"id": 3, "name": "z"}""".stripMargin)
    val schema = StructType(Seq(StructField("id", LongType),
      StructField("name", StringType)))
    val topic = new TopicLog(spark, s"$dir/log", TopicName.parse("io-in"), 2)

    val q1 = Connectors.fileSourceToTopic(spark, inDir, schema, "json",
      topic, keyCol = "id", checkpoint = s"$dir/ckpt-src")
    q1.awaitTermination(60000)
    assert(topic.read().count() == 3)

    val outDir = s"$dir/out"
    val q2 = Connectors.topicToFileSink(topic, outDir, "parquet", s"$dir/ckpt-sink")
    q2.awaitTermination(60000)
    val out = spark.read.parquet(outDir)
    assert(out.count() == 3)
    // payload JSON preserved through the envelope
    val names = out.select(get_json_object(col("value"), "$.name"))
      .as[String].collect().toSet
    assert(names == Set("x", "y", "z"))
  }

  test("batch source reads discovered splits in parallel") {
    val dir = Files.createTempDirectory("graft-batch-src").toString
    Seq((1L, "a")).toDF("id", "v").write.json(s"$dir/p1")
    Seq((2L, "b")).toDF("id", "v").write.json(s"$dir/p2")
    val schema = StructType(Seq(StructField("id", LongType), StructField("v", StringType)))
    val df = Connectors.batchSource(spark, Seq(s"$dir/p1", s"$dir/p2"), schema, "json")
    assert(df.count() == 2)
  }

  test("AUTO_PRODUCE validation rejects incompatible writer schemas") {
    val topicSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true)))
    // writer with id+name: ok
    assert(SchemaRegistry.validateProduce(topicSchema, Seq(topicSchema)).isEmpty)
    // writer missing non-nullable id: rejected
    val bad = StructType(Seq(StructField("name", StringType)))
    assert(SchemaRegistry.validateProduce(bad, Seq(topicSchema)).isDefined)
    // schema-less topic accepts anything
    assert(SchemaRegistry.validateProduce(bad, Seq.empty).isEmpty)
  }

  test("flow control: maxFilesPerTrigger bounds each microbatch") {
    val dir = Files.createTempDirectory("graft-flow").toString
    val topic = new TopicLog(spark, dir, TopicName.parse("flow"), 1)
    // three separate appends -> at least 3 data files
    (0 until 3).foreach { i =>
      topic.append(Seq((s"k$i", s"v$i", "p", i.toLong))
        .toDF(graft.model.Envelope.Key, graft.model.Envelope.Value,
          graft.model.Envelope.ProducerName, graft.model.Envelope.SequenceId)
        .withColumn(graft.model.Envelope.PublishTime, current_timestamp()))
    }
    val sub = new Subscription(topic, "flow-sub", SubscriptionType.Exclusive,
      checkpointRoot = s"$dir/_cursors",
      policy = BatchReceivePolicy(maxFilesPerTrigger = Some(1)))
    val batchSizes = scala.collection.mutable.ListBuffer[Long]()
    val q = sub.consume { (mb, _) => batchSizes += mb.count() }
    q.awaitTermination(60000)
    assert(batchSizes.sum == 3)
    assert(batchSizes.forall(_ <= 1), s"microbatches not bounded: $batchSizes")
    assert(batchSizes.size >= 3)
  }
}
