package graft

import graft.log.TopicLog
import graft.model.{Envelope, SchemaRegistry, TopicName}
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

  test("push source: callback-style records drain into the topic across pushes") {
    val dir = Files.createTempDirectory("graft-push").toString
    val topic = new TopicLog(spark, s"$dir/log", TopicName.parse("push-in"), 2)
    val src = new Connectors.PushSource[(String, String)](spark, topic,
      toEnvelope = ds => ds.toDF("k", "v").select(
        col("k").as(graft.model.Envelope.Key),
        col("v").as(graft.model.Envelope.Value),
        lit("push-src").as(graft.model.Envelope.ProducerName),
        xxhash64(col("v")).as(graft.model.Envelope.SequenceId),
        current_timestamp().as(graft.model.Envelope.PublishTime),
        current_timestamp().as(graft.model.Envelope.EventTime)),
      checkpoint = s"$dir/ckpt")
    val q = src.start()
    src.push("a" -> "1", "b" -> "2")
    q.processAllAvailable()
    assert(topic.read().count() == 2)
    // the callback keeps feeding while the query runs (PushSource contract)
    src.push("c" -> "3")
    q.processAllAvailable()
    assert(topic.read().count() == 3)
    // keys routed by murmur3 like any produce path
    assert(topic.read().select(graft.model.Envelope.Partition)
      .distinct().count() >= 1)
    q.stop()
  }

  test("jdbc sink: insert, upsert (update-else-insert), delete against embedded Derby") {
    val dir = Files.createTempDirectory("graft-jdbc").toString
    val url = s"jdbc:derby:$dir/db;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    conn.createStatement().executeUpdate(
      "CREATE TABLE sink_t (k VARCHAR(64) PRIMARY KEY, v VARCHAR(256))")
    conn.close()

    def envelopeBatch(rows: Seq[(String, String)]) =
      rows.toDF(graft.model.Envelope.Key, graft.model.Envelope.Value)
        .withColumn(graft.model.Envelope.ProducerName, lit("p0"))
        .withColumn(graft.model.Envelope.SequenceId,
          xxhash64(col(graft.model.Envelope.Value)))
        .withColumn(graft.model.Envelope.PublishTime, current_timestamp())
        .withColumn(graft.model.Envelope.EventTime, current_timestamp())

    def tableRows(): Map[String, String] = {
      val c = java.sql.DriverManager.getConnection(url)
      try {
        val rs = c.createStatement().executeQuery("SELECT k, v FROM sink_t")
        val b = Map.newBuilder[String, String]
        while (rs.next()) b += rs.getString(1) -> rs.getString(2)
        b.result()
      } finally c.close()
    }

    val topic = new TopicLog(spark, s"$dir/log", TopicName.parse("jdbc-in"), 2)
    topic.append(envelopeBatch(Seq("a" -> "1", "b" -> "2", "c" -> "3")))
    val q1 = Connectors.topicToJdbcSink(topic, url, "sink_t",
      keyCols = Seq(graft.model.Envelope.Key -> "k"),
      valueCols = Seq(graft.model.Envelope.Value -> "v"),
      mode = Connectors.JdbcMode.Upsert, checkpoint = s"$dir/ckpt1")
    q1.awaitTermination(60000)
    assert(tableRows() == Map("a" -> "1", "b" -> "2", "c" -> "3"))

    // second run on the SAME checkpoint: only the new append is delivered;
    // existing keys update in place, new keys insert
    topic.append(envelopeBatch(Seq("a" -> "10", "d" -> "4")))
    val q2 = Connectors.topicToJdbcSink(topic, url, "sink_t",
      keyCols = Seq(graft.model.Envelope.Key -> "k"),
      valueCols = Seq(graft.model.Envelope.Value -> "v"),
      mode = Connectors.JdbcMode.Upsert, checkpoint = s"$dir/ckpt1")
    q2.awaitTermination(60000)
    assert(tableRows() == Map("a" -> "10", "b" -> "2", "c" -> "3", "d" -> "4"))

    // delete mode on a FRESH checkpoint replays the whole log as deletes —
    // every key seen in the topic (a, b, c, d) is removed, idempotently
    // even though keys repeat across appends
    val q3 = Connectors.topicToJdbcSink(topic, url, "sink_t",
      keyCols = Seq(graft.model.Envelope.Key -> "k"),
      valueCols = Seq(graft.model.Envelope.Value -> "v"),
      mode = Connectors.JdbcMode.Delete, checkpoint = s"$dir/ckpt-del")
    q3.awaitTermination(60000)
    assert(tableRows().isEmpty)

    // duplicate keys WITHIN one replayed batch: the first occurrence
    // inserts, later ones update — no primary-key violation, and the
    // last value (highest offset) wins
    topic.append(envelopeBatch(Seq("e" -> "1", "e" -> "2")))
    val q5 = Connectors.topicToJdbcSink(topic, url, "sink_t",
      keyCols = Seq(graft.model.Envelope.Key -> "k"),
      valueCols = Seq(graft.model.Envelope.Value -> "v"),
      mode = Connectors.JdbcMode.Upsert, checkpoint = s"$dir/ckpt-dup")
    q5.awaitTermination(60000)
    assert(tableRows() == Map("a" -> "10", "b" -> "2", "c" -> "3",
      "d" -> "4", "e" -> "2"), tableRows().toString)

    // insert mode appends rows verbatim into a PK-less table: all 7
    // produced envelope rows land, including both values of key 'a'
    val c2 = java.sql.DriverManager.getConnection(url)
    c2.createStatement().executeUpdate(
      "CREATE TABLE sink_ins (k VARCHAR(64), v VARCHAR(256))")
    c2.close()
    val q4 = Connectors.topicToJdbcSink(topic, url, "sink_ins",
      keyCols = Seq(graft.model.Envelope.Key -> "k"),
      valueCols = Seq(graft.model.Envelope.Value -> "v"),
      mode = Connectors.JdbcMode.Insert, checkpoint = s"$dir/ckpt-ins")
    q4.awaitTermination(60000)
    val c3 = java.sql.DriverManager.getConnection(url)
    val rs = c3.createStatement().executeQuery("SELECT COUNT(*) FROM sink_ins")
    rs.next()
    assert(rs.getInt(1) == 7)
    c3.close()
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

  test("jdbc source: incremental polls resume from the log, replay-safe, no re-reads") {
    val dir = Files.createTempDirectory("graft-jdbc-src").toString
    val url = s"jdbc:derby:$dir/db;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    conn.createStatement().executeUpdate(
      "CREATE TABLE src_t (id BIGINT PRIMARY KEY, name VARCHAR(64))")
    def insert(rows: (Long, String)*): Unit = {
      val c = java.sql.DriverManager.getConnection(url)
      val ps = c.prepareStatement("INSERT INTO src_t VALUES (?, ?)")
      rows.foreach { case (i, n) =>
        ps.setLong(1, i); ps.setString(2, n); ps.executeUpdate() }
      c.close()
    }
    conn.close()
    insert(1L -> "a", 2L -> "b", 3L -> "c")

    val topic = new TopicLog(spark, s"$dir/log", TopicName.parse("jdbc-src"), 2)
    assert(Connectors.jdbcSourceToTopic(topic, url, "src_t", "id", "id") == 3)
    assert(topic.read().count() == 3)

    // poll with no new rows: nothing read, nothing appended
    assert(Connectors.jdbcSourceToTopic(topic, url, "src_t", "id", "id") == 0)
    assert(topic.read().count() == 3)

    // new rows -> only the delta is read; earlier rows never re-append
    insert(4L -> "d", 5L -> "e")
    assert(Connectors.jdbcSourceToTopic(topic, url, "src_t", "id", "id") == 2)
    val log = topic.read()
    assert(log.count() == 5)
    assert(log.select(graft.model.Envelope.SequenceId).distinct().count() == 5)
    // payload integrity: the json value round-trips the source row
    val names = log
      .select(get_json_object(col(graft.model.Envelope.Value), "$.NAME"))
      .as[String].collect().toSet
    assert(names == Set("a", "b", "c", "d", "e"))
  }

  test("jdbc identifiers: injection-shaped table/column names are rejected, not interpolated") {
    val dir = Files.createTempDirectory("graft-jdbc-id").toString
    val url = s"jdbc:derby:$dir/db;create=true"
    val topic = new TopicLog(spark, s"$dir/log", TopicName.parse("jdbc-id"), 2)
    // source side: table and incrementingCol reach a raw bounds-probe SQL
    for (bad <- Seq("src_t; DROP TABLE x", "src_t WHERE 1=1 --", "a b",
        "src\"t", "1tab", "", "sch..t")) {
      intercept[IllegalArgumentException] {
        Connectors.jdbcSourceToTopic(topic, url, bad, "id", "id")
      }
      intercept[IllegalArgumentException] {
        Connectors.jdbcSourceToTopic(topic, url, "src_t", bad, "id")
      }
    }
    // sink side: table and mapped db column names reach prepared-stmt SQL;
    // rejected at wiring time, before any microbatch runs
    intercept[IllegalArgumentException] {
      Connectors.topicToJdbcSink(topic, url, "t; DELETE FROM t",
        keyCols = Seq(("key", "k")), valueCols = Seq(("value", "v")),
        mode = Connectors.JdbcMode.Insert, checkpoint = s"$dir/ckpt")
    }
    intercept[IllegalArgumentException] {
      Connectors.topicToJdbcSink(topic, url, "sink_t",
        keyCols = Seq(("key", "k = ?; --")), valueCols = Seq(("value", "v")),
        mode = Connectors.JdbcMode.Insert, checkpoint = s"$dir/ckpt")
    }
    // legitimate qualified names still pass the allowlist
    assert(Connectors.checkIdentifier("APP.src_t") == "APP.src_t")
    assert(Connectors.checkIdentifier("_t0") == "_t0")
  }

  test("cdcApply materializes Debezium envelopes: latest op wins, deletes drop keys") {
    // hand-written change envelopes with before-images and source
    // metadata — only op/after may influence the state
    val cdc = Seq(
      ("r1", 0L, """{"op":"c","after":{"id":1,"v":"a"},"source":{"lsn":10}}"""),
      ("r2", 1L, """{"op":"c","after":{"id":2,"v":"b"},"source":{"lsn":11}}"""),
      ("r1", 2L, """{"op":"u","before":{"id":1,"v":"a"},"after":{"id":1,"v":"a2"}}"""),
      ("r2", 3L, """{"op":"d","before":{"id":2,"v":"b"}}"""),
      ("r3", 4L, """{"op":"r","after":{"id":3,"v":"snap"}}"""),
      ("r4", 5L, """not a change envelope"""))
      .toDF(Envelope.Key, Envelope.Offset, Envelope.Value)
    val state = graft.sources.Connectors.cdcApply(cdc)
      .select(col(Envelope.Key), col("op"), col("after"))
      .as[(String, String, String)].collect().toSet
    assert(state == Set(
      ("r1", "u", """{"id":1,"v":"a2"}"""), // latest image, not the first
      ("r3", "r", """{"id":3,"v":"snap"}"""))) // snapshot-read op surfaces
    // r2 deleted, r4 unparseable (op null) -> neither materializes
  }

  test("canalApply: position-stamped replay resumes after the ack watermark, no re-apply, no skips") {
    def row(pk: String, file: String, pos: Long, t: String, d: String) =
      (pk, file, pos, t, d)
    // epoch 1: binlog file 000000 fully acked at (000000, 400)
    val epoch1 = Seq(
      row("u1", "mysql-bin.000000", 100L, "INSERT", """{"v":1}"""),
      row("u2", "mysql-bin.000000", 200L, "INSERT", """{"v":2}"""),
      row("u1", "mysql-bin.000000", 300L, "UPDATE", """{"v":10}"""),
      row("u3", "mysql-bin.000000", 400L, "INSERT", """{"v":3}"""))
    // epoch 2 (after restart): new file + a tail of file 000000 that was
    // NOT yet acked (pos 500) — must still apply
    val epoch2 = Seq(
      row("u2", "mysql-bin.000000", 500L, "DELETE", null),
      row("u1", "mysql-bin.000001", 50L, "UPDATE", """{"v":11}"""),
      row("u4", "mysql-bin.000001", 60L, "INSERT", """{"v":4}"""))
    val full = (epoch1 ++ epoch2)
      .toDF("pk", "binlog_file", "binlog_pos", "change_type", "data")

    // cold start (no watermark): the whole log materializes
    val cold = graft.sources.Connectors.canalApply(full)
      .select("pk", "data").as[(String, String)].collect().toSet
    assert(cold == Set(("u1", """{"v":11}"""), ("u3", """{"v":3}"""),
      ("u4", """{"v":4}"""))) // u2 deleted

    // restart from the acked position: exactly the unacked suffix applies
    val resumed = graft.sources.Connectors.canalApply(full,
        resumeFile = "mysql-bin.000000", resumePos = 400L)
      .select("pk", "change_type", "data", "binlog_file", "binlog_pos")
      .as[(String, String, String, String, Long)].collect().toSet
    assert(resumed == Set(
      ("u1", "UPDATE", """{"v":11}""", "mysql-bin.000001", 50L),
      ("u4", "INSERT", """{"v":4}""", "mysql-bin.000001", 60L)))
    // u2's DELETE at (000000, 500) > watermark: applied (key absent);
    // nothing at or before (000000, 400) re-applied — u3 untouched
    assert(!resumed.exists(_._1 == "u2") && !resumed.exists(_._1 == "u3"))

    // resumed delta == applying only the unacked suffix (restart parity)
    val suffixOnly = graft.sources.Connectors.canalApply(
        epoch2.toDF("pk", "binlog_file", "binlog_pos", "change_type", "data"))
      .select("pk", "change_type", "data", "binlog_file", "binlog_pos")
      .as[(String, String, String, String, Long)].collect().toSet
    assert(resumed == suffixOnly)

    // the ack watermark comes from the CHANGE STREAM, not the output:
    // append a trailing DELETE — the materialized output drops that row,
    // but the watermark must still advance past it or the restart
    // re-delivers an already-applied suffix
    val withTailDelete = (epoch1 ++ epoch2 :+
      row("u4", "mysql-bin.000001", 70L, "DELETE", null))
      .toDF("pk", "binlog_file", "binlog_pos", "change_type", "data")
    assert(graft.sources.Connectors.canalAckWatermark(withTailDelete) ===
      Some(("mysql-bin.000001", 70L)))
    // and from a resume point, only applied rows count
    assert(graft.sources.Connectors.canalAckWatermark(withTailDelete,
      resumeFile = "mysql-bin.000001", resumePos = 70L) === None)
  }

  // ---- elasticsearch sink (bulk/action plumbing; fake transport) ----

  test("elasticsearch sink: bulk actions, null-value delete, malformed routing, per-key order") {
    import graft.sources.ElasticSink
    import graft.sources.ElasticSink.{MalformedDocAction, NullValueAction}
    val dir = Files.createTempDirectory("graft-es").toString
    val topic = new TopicLog(spark, s"$dir/log", TopicName.parse("es-in"), 2)
    topic.append(Seq(
        ("k1", """{"a":1}""", 0L),
        ("k2", """{"a":2}""", 1L),
        ("k2", """{"a":3}""", 2L),   // same key, later offset: applies after
        ("k1", null, 3L),            // tombstone -> delete action
        ("k3", "not json {", 4L))    // malformed -> ignored in this run
      .toDF(Envelope.Key, Envelope.Value, Envelope.SequenceId)
      .withColumn(Envelope.ProducerName, lit("p"))
      .withColumn(Envelope.PublishTime,
        timestamp_seconds(lit(1700000000L) + col(Envelope.SequenceId))))
    val capDir = s"$dir/captured"
    Files.createDirectories(java.nio.file.Paths.get(capDir))
    // the pluggable wire: each bulk POST lands in its own file
    val transport: String => (Int, String) = { body =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(
        s"$capDir/${System.nanoTime()}-${java.util.UUID.randomUUID()}.ndjson"), body)
      (200, """{"took":1,"errors":false,"items":[]}""")
    }
    val q = ElasticSink.topicToElasticSink(topic, "docs-v1", transport,
      nullAction = NullValueAction.Delete,
      malformedAction = MalformedDocAction.Ignore,
      checkpoint = s"$dir/ckpt")
    q.awaitTermination(60000)
    val payloads = java.nio.file.Files.list(java.nio.file.Paths.get(capDir))
      .toArray.map(p => java.nio.file.Files.readString(
        p.asInstanceOf[java.nio.file.Path])).toSeq
    val lines = payloads.flatMap(_.split("\n"))
    // action census: 3 index (k1, k2 twice) + 1 delete; malformed skipped
    assert(lines.count(_.startsWith("""{"index"""")) == 3)
    assert(lines.count(_.startsWith("""{"delete"""")) == 1)
    assert(!lines.exists(_.contains("k3")), "malformed doc must not ship")
    assert(lines.contains("""{"delete":{"_index":"docs-v1","_id":"k1"}}"""))
    // per-key apply order: k1's index precedes its delete in the same
    // payload (same key -> same partition, offset-sorted), and k2's
    // updates apply in offset order — replays converge last-write-wins
    val k1Payload = payloads.find(_.contains(""""_id":"k1"""")).get.split("\n")
    assert(k1Payload.indexWhere(l => l.startsWith("""{"index"""") && l.contains("k1")) <
      k1Payload.indexWhere(_.startsWith("""{"delete"""")))
    val k2Payload = payloads.find(_.contains(""""_id":"k2"""")).get.split("\n")
    assert(k2Payload.indexOf("""{"a":2}""") < k2Payload.indexOf("""{"a":3}"""))
    // malformed + Fail: the batch errors instead of silently shipping
    val qf = ElasticSink.topicToElasticSink(topic, "docs-v1", transport,
      nullAction = NullValueAction.Delete,
      malformedAction = MalformedDocAction.Fail,
      checkpoint = s"$dir/ckpt-fail")
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      qf.processAllAvailable()
      qf.awaitTermination(60000)
    }: Unit
    // _id JSON escaping and index-name validation
    assert(ElasticSink.bulkLines("i", "k\"x\\", """{"v":1}""",
      NullValueAction.Ignore, MalformedDocAction.Fail).head
      == """{"index":{"_index":"i","_id":"k\"x\\"}}""")
    // pretty-printed (multi-line) valid JSON re-serializes compactly —
    // raw newlines in a doc would break the NDJSON bulk framing
    val pretty = "{\n  \"v\": 1,\n  \"w\": [1,\n 2]\n}"
    val shipped = ElasticSink.bulkLines("i", "k", pretty,
      NullValueAction.Ignore, MalformedDocAction.Fail)(1)
    assert(!shipped.contains("\n") && shipped == """{"v":1,"w":[1,2]}""")
    for (bad <- Seq("Upper", "has space", "a/b", "-lead", "", "x#y",
        "logs:2026", ".", "..")) {
      intercept[IllegalArgumentException] {
        ElasticSink.checkIndexName(bad)
      }: Unit
    }
    // ES _bulk answers 200 with "errors": true when individual actions
    // fail — that must fail the batch, not silently drop rows
    val qe = ElasticSink.topicToElasticSink(topic, "docs-v1",
      _ => (200, """{"took":1,"errors":true,"items":[{"index":{"status":409}}]}"""),
      nullAction = NullValueAction.Delete,
      malformedAction = MalformedDocAction.Ignore,
      checkpoint = s"$dir/ckpt-itemerr")
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      qe.processAllAvailable()
      qe.awaitTermination(60000)
    }: Unit
  }

  // ---- kafka connector (option/offset plumbing; fake broker) ----

  /** A Kafka record batch in the exact shape Spark's kafka source
    * exposes — the in-sandbox stand-in for the broker. */
  private def kafkaBatch(rows: (Int, Long, String, String)*) =
    rows.toDF("partition", "offset", "key", "value")
      .select(lit("clicks").as("topic"), col("partition"), col("offset"),
        col("key").cast("binary").as("key"),
        col("value").cast("binary").as("value"),
        to_timestamp(lit("2026-01-01 00:00:00")).as("timestamp"),
        array(struct(lit("h1").as("key"),
          lit("v1").cast("binary").as("value"))).as("headers"))

  test("kafka source: polls resume from the log per partition; replays append nothing") {
    import graft.sources.{KafkaConnector, KafkaSourceConfig}
    val dir = Files.createTempDirectory("graft-kafka").toString
    val cfg = KafkaSourceConfig("clicks", "broker:9092", "g1")
    val topic = new TopicLog(spark, s"$dir/log", TopicName.parse("kafka-in"), 2)

    val b1 = kafkaBatch((0, 0L, "a", "v0"), (0, 1L, "b", "v1"), (1, 0L, "c", "v2"))
    assert(KafkaConnector.pollToTopic(topic, cfg, b1) == 3)
    assert(topic.read().count() == 3)
    // exact replay of the same backlog (crash between poll and "commit"):
    // the log IS the committed offset, so nothing re-appends
    assert(KafkaConnector.pollToTopic(topic, cfg, b1) == 0)
    assert(topic.read().count() == 3)
    // per-partition resume: partition 0 advanced past 1, partition 1 past 0
    assert(KafkaConnector.resumeOffsets(topic, cfg) == Map(0 -> 1L, 1 -> 0L))
    // a rebalance hands partition 1 to another task: the delta poll sees
    // old + new records, only the new ones land — per partition
    val b2 = kafkaBatch((0, 0L, "a", "v0"), (0, 2L, "d", "v3"),
      (1, 0L, "c", "v2"), (1, 1L, "e", "v4"), (2, 0L, "f", "v5"))
    assert(KafkaConnector.pollToTopic(topic, cfg, b2) == 3)
    assert(KafkaConnector.resumeOffsets(topic, cfg) ==
      Map(0 -> 2L, 1 -> 1L, 2 -> 0L))
    // payloads string-decoded (KafkaStringSource counterpart)
    val vals = topic.read().select(graft.model.Envelope.Value)
      .as[String].collect().toSet
    assert(vals == Set("v0", "v1", "v2", "v3", "v4", "v5"))
    // a different group id is a different committed position (fresh resume)
    val cfg2 = cfg.copy(groupId = "g2")
    assert(KafkaConnector.resumeOffsets(topic, cfg2).isEmpty)
    assert(KafkaConnector.pollToTopic(topic, cfg2, b1) == 3)
  }

  test("kafka source: auto.offset.reset latest pins the reset once; later records flow") {
    import graft.sources.{KafkaConnector, KafkaSourceConfig}
    val dir = Files.createTempDirectory("graft-kafka-l").toString
    val cfg = KafkaSourceConfig("clicks", "broker:9092", "g1",
      autoOffsetReset = "latest")
    val topic = new TopicLog(spark, s"$dir/log", TopicName.parse("kafka-l"), 2)
    val backlog = kafkaBatch((0, 0L, "a", "v0"), (0, 5L, "b", "v1"))
    // no committed position: latest marks the current top consumed,
    // persisting it as an in-stream reset marker
    assert(KafkaConnector.pollToTopic(topic, cfg, backlog) == 0)
    assert(KafkaConnector.resumeOffsets(topic, cfg) == Map(0 -> 5L),
      "the reset position must persist, not re-anchor every poll")
    // a record arriving AFTER the reset flows on the very next poll —
    // the re-anchoring bug skipped everything forever
    val more = kafkaBatch((0, 5L, "b", "v1"), (0, 6L, "c", "v2"))
    assert(KafkaConnector.pollToTopic(topic, cfg, more) == 1)
    // consumers read data rows only; the marker is filtered
    val data = KafkaConnector.dataRows(topic.read())
    assert(data.count() == 1)
    assert(topic.read().count() == 2) // marker + data row
    // a foreign topic's offsets on the same partition number must not
    // anchor this topic's reset
    val cfg2 = cfg.copy(groupId = "g2")
    val mixed = kafkaBatch((1, 50L, "x", "other")).withColumn("topic",
      lit("other-topic")).unionByName(kafkaBatch((1, 2L, "y", "mine")))
    assert(KafkaConnector.pollToTopic(topic, cfg2, mixed) == 0) // backlog skipped
    assert(KafkaConnector.resumeOffsets(topic, cfg2) == Map(1 -> 2L),
      "reset must anchor to clicks' own top, not the foreign topic's 50")
    // an earliest group on the same log is unaffected by g1's markers
    val cfgE = cfg.copy(groupId = "gE", autoOffsetReset = "earliest")
    assert(KafkaConnector.pollToTopic(topic, cfgE, more) == 2)
    assert(KafkaConnector.pollToTopic(topic, cfgE,
      kafkaBatch((0, 7L, "d", "v3"))) == 1)
  }

  test("kafka source: resume honors topics written by the pre-length-prefix name format") {
    import graft.sources.{KafkaConnector, KafkaSourceConfig}
    val dir = Files.createTempDirectory("graft-kafka-leg").toString
    val cfg = KafkaSourceConfig("clicks", "broker:9092", "g1")
    val topic = new TopicLog(spark, s"$dir/log", TopicName.parse("kafka-leg"), 2)
    // rows written by an OLD build: producer names carry the unprefixed
    // "io-kafka-source-<topic>-<group>-p<P>" format — without read-side
    // acceptance a restarted source finds no high-water and re-ingests
    // the whole backlog under new names that dedup can't suppress
    val legacy = Seq((0, 3L, "a"), (1, 7L, "b")).toDF("p", "seq", "k")
      .select(col("k").as(graft.model.Envelope.Key),
        lit("v").as(graft.model.Envelope.Value),
        concat(lit("io-kafka-source-clicks-g1-p"), col("p").cast("string"))
          .as(graft.model.Envelope.ProducerName),
        col("seq").as(graft.model.Envelope.SequenceId),
        to_timestamp(lit("2026-01-01 00:00:00"))
          .as(graft.model.Envelope.PublishTime))
    topic.append(legacy)
    assert(KafkaConnector.resumeOffsets(topic, cfg) == Map(0 -> 3L, 1 -> 7L),
      "legacy-format high-waters must be visible to resume")
    // the replayed backlog at/below the legacy high-water appends nothing;
    // only the genuinely new record lands (under the new name format)
    assert(KafkaConnector.pollToTopic(topic, cfg,
      kafkaBatch((0, 3L, "a", "v"), (0, 4L, "c", "v2"))) == 1)
    // resume now merges both formats, max per partition
    assert(KafkaConnector.resumeOffsets(topic, cfg) == Map(0 -> 4L, 1 -> 7L))
    // a different group's legacy rows stay invisible
    assert(KafkaConnector.resumeOffsets(topic, cfg.copy(groupId = "gX")).isEmpty)
  }

  test("kafka source: group ids that extend another group's name never cross-talk") {
    import graft.sources.{KafkaConnector, KafkaSourceConfig}
    val dir = Files.createTempDirectory("graft-kafka-x").toString
    val topic = new TopicLog(spark, s"$dir/log", TopicName.parse("kafka-x"), 2)
    val g1 = KafkaSourceConfig("clicks", "broker:9092", "g1")
    val g1p1 = KafkaSourceConfig("clicks", "broker:9092", "g1-p1")
    // g1-p1's producer names start with g1's prefix; a bare startsWith
    // resume would crash on "1-p0".toInt or merge offsets across groups
    assert(KafkaConnector.pollToTopic(topic, g1p1,
      kafkaBatch((0, 9L, "a", "v0"))) == 1)
    assert(KafkaConnector.resumeOffsets(topic, g1).isEmpty,
      "g1 must not see g1-p1's committed offsets")
    assert(KafkaConnector.resumeOffsets(topic, g1p1) == Map(0 -> 9L))
    assert(KafkaConnector.pollToTopic(topic, g1,
      kafkaBatch((0, 1L, "b", "v1"))) == 1, "g1 still consumes from scratch")
  }

  test("kafka sink: config validation, writer options, record projection") {
    import graft.sources.{KafkaConnector, KafkaSinkConfig}
    val cfg = KafkaSinkConfig.load(Map(
      "topic" -> "out", "bootstrapServers" -> "b:9092", "acks" -> "1",
      "batchSize" -> "1024", "compression.type" -> "zstd"))
    val opts = cfg.sparkWriteOptions
    assert(opts("topic") == "out")
    assert(opts("kafka.acks") == "1")
    assert(opts("kafka.batch.size") == "1024")
    assert(opts("kafka.compression.type") == "zstd") // passthrough
    intercept[IllegalArgumentException] {
      KafkaSinkConfig("t", "b:9092", batchSize = 0)
    }
    intercept[IllegalArgumentException] {
      KafkaSinkConfig("t", "b:9092", maxRequestSize = -1)
    }
    intercept[IllegalArgumentException] { KafkaSinkConfig("", "b:9092") }: Unit
    // projection: spark kafka-writer shape, per-key offset order
    val log = Seq(("k1", "v-old", 0L), ("k1", "v-new", 5L), ("k2", "x", 1L))
      .toDF(Envelope.Key, Envelope.Value, Envelope.Offset)
    val frame = KafkaConnector.topicToKafkaFrame(log)
    assert(frame.schema.map(f => (f.name, f.dataType.typeName)) ==
      Seq(("key", "binary"), ("value", "binary")))
    val k1Vals = frame.collect()
      .filter(r => new String(r.getAs[Array[Byte]](0)) == "k1")
      .map(r => new String(r.getAs[Array[Byte]](1))).toSeq
    assert(k1Vals == Seq("v-old", "v-new"), "per-key offset order must hold")
  }

  test("kafka source: header copy and config load/validation mirror the reference") {
    import graft.sources.{KafkaConnector, KafkaSourceConfig}
    val dir = Files.createTempDirectory("graft-kafka-h").toString
    val topic = new TopicLog(spark, s"$dir/log", TopicName.parse("kafka-h"), 2)
    val cfg = KafkaSourceConfig("clicks", "broker:9092", "g1",
      copyHeadersEnabled = true)
    KafkaConnector.pollToTopic(topic, cfg, kafkaBatch((0, 0L, "a", "v0"))): Unit
    val props = topic.read()
      .select(graft.model.Envelope.Properties)
      .as[Map[String, String]].head()
    assert(props(KafkaConnector.HeaderKafkaTopic) == "clicks")
    assert(props(KafkaConnector.HeaderKafkaPartition) == "0")
    assert(props(KafkaConnector.HeaderKafkaOffset) == "0")
    assert(props("h1") == java.util.Base64.getEncoder
      .encodeToString("v1".getBytes)) // headers arrive base64, reference-style
    // a header that collides with a __kafka_* key overwrites it, exactly
    // the reference's properties.put order — and must not crash map_concat
    val collide = Seq((0, 7L, "a", "v"))
      .toDF("partition", "offset", "key", "value")
      .select(lit("clicks").as("topic"), col("partition"), col("offset"),
        col("key").cast("binary").as("key"),
        col("value").cast("binary").as("value"),
        to_timestamp(lit("2026-01-01 00:00:00")).as("timestamp"),
        array(struct(lit(KafkaConnector.HeaderKafkaOffset).as("key"),
          lit("smuggled").cast("binary").as("value"))).as("headers"))
    KafkaConnector.pollToTopic(topic, cfg, collide): Unit
    val p2 = topic.read()
      .filter(col(graft.model.Envelope.SequenceId) === 7L)
      .select(graft.model.Envelope.Properties)
      .as[Map[String, String]].head()
    assert(p2(KafkaConnector.HeaderKafkaOffset) == java.util.Base64.getEncoder
      .encodeToString("smuggled".getBytes))
    // Kafka headers legally REPEAT keys (they're a list): last write wins,
    // mirroring the reference's properties.put fold — must not crash
    val dup = Seq((0, 8L, "a", "v"))
      .toDF("partition", "offset", "key", "value")
      .select(lit("clicks").as("topic"), col("partition"), col("offset"),
        col("key").cast("binary").as("key"),
        col("value").cast("binary").as("value"),
        to_timestamp(lit("2026-01-01 00:00:00")).as("timestamp"),
        array(
          struct(lit("trace").as("key"), lit("first").cast("binary").as("value")),
          struct(lit("trace").as("key"), lit("last").cast("binary").as("value")))
          .as("headers"))
    KafkaConnector.pollToTopic(topic, cfg, dup): Unit
    val p3 = topic.read()
      .filter(col(graft.model.Envelope.SequenceId) === 8L)
      .select(graft.model.Envelope.Properties)
      .as[Map[String, String]].head()
    assert(p3("trace") == java.util.Base64.getEncoder
      .encodeToString("last".getBytes))
    // untyped load: typed keys coerce, unknown keys pass through to the
    // consumer config, spark options assemble with the kafka. prefix
    val loaded = KafkaSourceConfig.load(Map(
      "topic" -> "t", "bootstrapServers" -> "b:9092", "groupId" -> "g",
      "fetchMinBytes" -> "64", "autoOffsetReset" -> "latest",
      "security.protocol" -> "SASL_SSL"))
    assert(loaded.fetchMinBytes == 64L)
    val opts = loaded.sparkReadOptions
    assert(opts("subscribe") == "t")
    assert(opts("kafka.bootstrap.servers") == "b:9092")
    assert(opts("startingOffsets") == "latest")
    assert(opts("kafka.security.protocol") == "SASL_SSL")
    assert(opts("kafka.fetch.min.bytes") == "64")
    // validation: the reference's open()-time checks, same trigger values
    intercept[IllegalArgumentException] {
      KafkaSourceConfig("", "b:9092", "g")
    }
    intercept[IllegalArgumentException] {
      KafkaSourceConfig("t", "b:9092", "g", fetchMinBytes = 0)
    }
    intercept[IllegalArgumentException] {
      KafkaSourceConfig("t", "b:9092", "g", autoCommitIntervalMs = -1)
    }
    intercept[IllegalArgumentException] {
      KafkaSourceConfig("t", "b:9092", "g", heartbeatIntervalMs = 0)
    }
    intercept[IllegalArgumentException] {
      KafkaSourceConfig("t", "b:9092", "g", autoOffsetReset = "none")
    }: Unit
  }
}
