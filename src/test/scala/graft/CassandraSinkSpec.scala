package graft

import graft.log.TopicLog
import graft.model.{Envelope, TopicName}
import graft.sources.CassandraSink

import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

class CassandraSinkSpec extends SparkSpec {

  test("CQL shaping: bound markers only, validated identifiers") {
    // every mutation carries an explicit USING TIMESTAMP bound to the
    // row offset: inside an UNLOGGED BATCH Cassandra shares one
    // timestamp across statements, and at equal timestamps a tombstone
    // beats a later insert — delete-then-reinsert of a key in one
    // batch would resolve to deleted without it
    assert(CassandraSink.insertCql("ks", "cf", "k", "v") ===
      "INSERT INTO ks.cf (k, v) VALUES (?, ?) USING TIMESTAMP ?")
    assert(CassandraSink.deleteCql("ks", "cf", "k") ===
      "DELETE FROM ks.cf USING TIMESTAMP ? WHERE k = ?")
    intercept[IllegalArgumentException] {
      CassandraSink.insertCql("ks", "cf; DROP TABLE x", "k", "v")
    }
    intercept[IllegalArgumentException] {
      CassandraSink.deleteCql("ks", "cf", "k\"quoted")
    }
  }

  test("batchCql frames a single-partition unlogged batch") {
    assert(CassandraSink.batchCql(Seq("A", "B")) ===
      "BEGIN UNLOGGED BATCH\nA;\nB;\nAPPLY BATCH")
  }

  test("topic -> cassandra: same-key runs batch atomically, tombstones delete") {
    val dir = Files.createTempDirectory("cass-sink").toString
    val topic = new TopicLog(spark, s"$dir/log", TopicName.parse("cass-in"), 2)
    topic.append(spark.createDataFrame(Seq(
      ("a", "1"), ("b", "2"), ("a", "3") // a twice -> one 2-statement batch
    )).toDF(Envelope.Key, Envelope.Value)
      .withColumn(Envelope.ProducerName, lit("p0"))
      .withColumn(Envelope.SequenceId, monotonically_increasing_id())
      .withColumn(Envelope.PublishTime, current_timestamp())
      .withColumn(Envelope.EventTime, current_timestamp()))
    topic.append(spark.createDataFrame(Seq(Tuple1("b"))).toDF(Envelope.Key)
      .withColumn(Envelope.Value, lit(null).cast("string"))
      .withColumn(Envelope.ProducerName, lit("p0"))
      .withColumn(Envelope.SequenceId, lit(99L))
      .withColumn(Envelope.PublishTime, current_timestamp())
      .withColumn(Envelope.EventTime, current_timestamp()))

    val capture = Files.createTempDirectory("cass-capture").toString
    CassandraSink.topicToCassandraSink(topic, "ks", "cf",
      "k", "v", CassandraSinkSpec.capturingTransport(capture),
      checkpoint = s"$dir/ckpt").awaitTermination()

    val calls = Files.list(Paths.get(capture)).iterator().asScala.toSeq
      .sortBy(_.getFileName.toString)
      .map(p => new String(Files.readAllBytes(p), UTF_8))
    // key a: both inserts in ONE single-partition batch, offset order,
    // each with its offset riding as the bound write timestamp
    val aBatch = calls.find(c =>
      c.matches("(?s).*params=a,1,\\d+,a,3,\\d+.*"))
    assert(aBatch.isDefined, calls.mkString("\n---\n"))
    assert(aBatch.get.startsWith("BEGIN UNLOGGED BATCH") &&
      !aBatch.get.contains("DELETE"), aBatch.get)
    // key b: insert + tombstone delete, one atomic same-key batch,
    // insert BEFORE delete (offset order)
    val bBatch = calls.find(c =>
      c.matches("(?s).*params=b,2,\\d+,\\d+,b.*"))
    assert(bBatch.isDefined, calls.mkString("\n---\n"))
    assert(bBatch.get.startsWith("BEGIN UNLOGGED BATCH") &&
      bBatch.get.indexOf("INSERT") < bBatch.get.indexOf("DELETE"), bBatch.get)
  }
}

object CassandraSinkSpec {
  def capturingTransport(dir: String): (String, Seq[String]) => Unit = { (cql, params) =>
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, f"c${System.nanoTime()}%020d.txt"),
      s"$cql\nparams=${params.mkString(",")}".getBytes(UTF_8)): Unit
  }
}
