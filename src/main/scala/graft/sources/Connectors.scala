package graft.sources

import graft.log.TopicLog
import graft.model.Envelope
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/**
 * Pulsar IO connector framework mapped Spark-first (reference
 * pulsar-io/core: Source.java:28 `Record<T> read()`, Sink.java:31
 * `write(Record)`, BatchSource.java:53-85 discover/prepare/readNext).
 *
 * A connector here is just a Spark source/sink bound to the topic-log
 * appender — the framework's value (schema, batching, checkpointing,
 * parallel ingest) is what Spark already provides:
 *
 * | Reference connector (pulsar-io/) | Spark equivalent |
 * |---|---|
 * | file                       | `FileSource` below (readStream text/json/csv) |
 * | kafka / kafka-connect      | [[KafkaConnector]] (config/offset/header plumbing; network = `spark.readStream.format("kafka")`) |
 * | jdbc (insert/upsert/delete)| `topicToJdbcSink` below (batched upsert/delete in foreachBatch); `jdbcSourceToTopic` below (incremental poll source) |
 * | elastic-search             | [[ElasticSink]] (bulk/action/id plumbing; HTTP = pluggable transport) |
 * | solr                       | [[SolrSink]] (repeated-key JSON update stream, commitWithin, status retry) |
 * | redis                      | [[RedisSink]] (RESP2 pipeline framing, SET/DEL/EX) |
 * | influxdb                   | [[InfluxSink]] (line protocol built as one codegen'd expression) |
 * | mongo                      | [[MongoSink]] (bulk insert/delete command documents, _id from key) |
 * | cassandra                  | [[CassandraSink]] (bound-marker CQL, single-partition atomic batches) |
 * | kinesis                    | [[KinesisSink]] (PutRecords limits + partial-failure subset retry) |
 * | dynamodb                   | [[DynamoSink]] (BatchWriteItem limits, unique-key batches, unprocessed-subset retry) |
 * | rabbitmq                   | [[RabbitSink]] (AMQP 0-9-1 frame encoding, frame-max body split, publisher confirms) |
 * | aws-s3 / hdfs3 / alluxio   | any hadoop-fs path (file formats built in) |
 * | debezium/canal CDC         | `cdcApply` below (Debezium op/after envelope → materialized table state) |
 * | data-generator             | `spark.range` + expression columns |
 * | http / netty / flume       | [[HttpSink]] (NDJSON webhook batches, status classes, Retry-After backoff, idempotency keys); source side = socket source |
 *
 * `file`, `jdbc` (source + sink), the kafka option/offset plumbing, and
 * the elasticsearch / redis / influxdb / mongo / cassandra / kinesis /
 * dynamodb / rabbitmq / http / solr sink plumbing are implemented
 * concretely (no external daemons in this
 * environment — each network layer is a pluggable transport the specs
 * drive with protocol-faithful fakes); the source→appender and
 * topic→sink plumbing below is connector-agnostic.
 */
object Connectors {

  /** Identifier allowlist for SQL interpolated into JDBC statements
    * (table names, column names). Config-sourced names are an injection
    * surface — the reference guards the same spot with
    * `JdbcUtils.quoteIdentifier` (pulsar-io/jdbc). Quoting would make
    * identifiers case-sensitive on targets like Derby that upper-case
    * unquoted DDL, so the portable guard here is a strict allowlist:
    * dot-separated parts of `[A-Za-z_][A-Za-z0-9_]*`. Identifiers that
    * genuinely need quoting (spaces, reserved words as-is, mixed case on
    * a case-sensitive target) are rejected loudly rather than broken
    * silently. */
  private[graft] def checkIdentifier(id: String): String = {
    val part = "[A-Za-z_][A-Za-z0-9_]*"
    require(id != null && id.matches(s"$part(\\.$part)*"),
      s"illegal SQL identifier '$id' (allowed: dot-separated $part)")
    id
  }

  /**
   * File source (reference pulsar-io/file): tail a directory as a stream
   * and produce every record into `topic`. `discover/prepare/readNext`
   * become Spark's file-source listing + microbatch planning.
   *
   * Effectively-once: foreachBatch is at-least-once (a crash between
   * append and checkpoint commit replays the batch), so sequence ids are
   * CONTENT-DERIVED (stable across replays) and the append anti-joins
   * against (producer, sequence) pairs already in the log — a replayed
   * batch appends zero rows. This is the engine's own §2.8 dedup applied
   * at the connector boundary.
   */
  def fileSourceToTopic(spark: SparkSession, inputDir: String, schema: StructType,
                        format: String, topic: TopicLog, keyCol: String,
                        checkpoint: String): StreamingQuery =
    spark.readStream
      .schema(schema)
      .format(format)
      .load(inputDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val envelope = batch.select(
            col(keyCol).cast("string").as(Envelope.Key),
            to_json(struct(batch.columns.map(col): _*)).as(Envelope.Value),
            lit("io-file-source").as(Envelope.ProducerName),
            // salt with the source file so identical records in DIFFERENT
            // files keep distinct sequence ids; identical records within
            // one file still conflate (documented connector limitation)
            xxhash64(input_file_name(),
              to_json(struct(batch.columns.map(col): _*)))
              .as(Envelope.SequenceId),
            current_timestamp().as(Envelope.PublishTime),
            current_timestamp().as(Envelope.EventTime))
          val existing = topic.read()
          val fresh =
            if (existing.isEmpty) envelope
            else envelope.join(
              existing.select(Envelope.ProducerName, Envelope.SequenceId).distinct(),
              Seq(Envelope.ProducerName, Envelope.SequenceId), "left_anti")
          if (!fresh.isEmpty) topic.append(fresh): Unit
        }
      }
      .start()

  /**
   * Topic → sink (reference Sink.write(Record)): stream the topic into
   * any Spark-writable target; here a parquet/json/csv directory (the
   * `file`/`hdfs3` sink), with per-record ack = checkpoint commit.
   * Uncommitted data never reaches the sink: appends stage under
   * `_staging/` (invisible to file listing) and only move into the
   * readable dirs at manifest publish.
   */
  def topicToFileSink(topic: TopicLog, outDir: String, format: String,
                      checkpoint: String): StreamingQuery = {
    val spark = topic.spark
    spark.readStream
      .schema(spark.read.parquet(topic.name.path(topic.root)).schema)
      .parquet(topic.name.path(topic.root))
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .format(format)
      .option("path", outDir)
      .start()
  }

  /**
   * Batch source (BatchSource.java discover→prepare→readNext): driver
   * lists splits (discover), partitions them (prepare), executors read
   * them in parallel (readNext) — which is literally `spark.read` over a
   * list of paths; provided for API parity.
   */
  def batchSource(spark: SparkSession, paths: Seq[String], schema: StructType,
                  format: String): DataFrame =
    spark.read.schema(schema).format(format).load(paths: _*)

  /**
   * Push source (reference pulsar-io/core PushSource.java:36 `consume` /
   * BatchPushSource.java): the connector CALLS `push(record)` instead of
   * being polled. Spark-first shape: records buffer into a MemoryStream
   * (the callback's thread-safe queue) and a streaming query drains each
   * microbatch into the topic appender — `consume()` → `push()`,
   * poll-loop → microbatch trigger. BatchPush is the same object fed
   * from a discover/prepare loop (push a whole split per call).
   *
   * `toEnvelope` maps the pushed records to envelope columns (key,
   * value, producer_name, sequence_id, publish_time...); stable
   * content-derived sequence ids give the §2.8 dedup path replay
   * protection exactly as in [[fileSourceToTopic]].
   */
  final class PushSource[T](spark: SparkSession, topic: TopicLog,
                            toEnvelope: Dataset[T] => DataFrame,
                            checkpoint: String)(
                            implicit enc: org.apache.spark.sql.Encoder[T]) {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    private implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    private val buffer = MemoryStream[T]

    /** The connector callback: thread-safe, non-blocking enqueue. */
    def push(records: T*): Unit = { buffer.addData(records): Unit }

    /** Start draining pushed records into the topic. */
    def start(): StreamingQuery =
      toEnvelope(buffer.toDS()).writeStream
        .option("checkpointLocation", checkpoint)
        .foreachBatch { (batch: DataFrame, _: Long) =>
          if (!batch.isEmpty) topic.append(batch): Unit
        }
        .start()
  }

  /**
   * JDBC → topic source: incremental poll of a relational table in
   * incrementing-column mode (the polling-source pattern of the IO
   * framework — reference pulsar-io/core Source.java:28 `read()`; the
   * reference ships its relational *sources* as Debezium CDC, this is
   * the simpler poll-based counterpart of [[topicToJdbcSink]]).
   *
   * One call = one poll: rows with `incrementingCol` strictly above the
   * topic's resume point are read and appended. The resume point is the
   * log itself (max sequence id this producer has appended — the
   * incrementing value IS the sequence id), so polls are replay-safe by
   * construction: a crashed poll re-reads the same slice and the §2.8
   * dedup boundary appends nothing twice, and no side-channel offset
   * store can drift from the log.
   *
   * Scale shape: the bounds probe is one tiny driver-side query; the
   * slice itself is a partitioned `spark.read.jdbc` (stride on the
   * incrementing column, `numPartitions` parallel executor connections)
   * — never one connection funneling the table.
   *
   * Caveat (same as any incrementing-mode poller): rows must commit to
   * the source table in increasing `incrementingCol` order; a
   * lower-valued row committed after a poll has passed it is missed.
   * Rows committed above the probed MAX during the poll wait for the
   * next poll (the slice is capped both sides). Returns the number of
   * rows actually appended to the topic.
   */
  def jdbcSourceToTopic(topic: TopicLog, url: String, table: String,
                        incrementingCol: String, keyCol: String,
                        numPartitions: Int = 4): Long = {
    checkIdentifier(table); checkIdentifier(incrementingCol): Unit
    val spark = topic.spark
    val producer = s"io-jdbc-source-$table"
    val existing = topic.read()
    val since: Long =
      if (existing.isEmpty) Long.MinValue
      else {
        val r = existing.filter(col(Envelope.ProducerName) === producer)
          .agg(max(Envelope.SequenceId)).head()
        if (r.isNullAt(0)) Long.MinValue else r.getLong(0)
      }
    // bounds probe: tiny, one round trip
    val (lo, hi, n) = {
      val c = java.sql.DriverManager.getConnection(url)
      try {
        val rs = c.createStatement().executeQuery(
          s"SELECT MIN($incrementingCol), MAX($incrementingCol), COUNT(*) " +
            s"FROM $table WHERE $incrementingCol > $since")
        rs.next()
        (rs.getLong(1), rs.getLong(2), rs.getLong(3))
      } finally c.close()
    }
    if (n == 0) return 0L
    // upper cap at the probed hi: rows committed AFTER the probe belong
    // to the next poll — without it the appended set and the returned
    // count could drift under sustained concurrent inserts
    val slice = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", incrementingCol)
      .option("lowerBound", lo)
      .option("upperBound", hi + 1)
      .option("numPartitions", math.min(numPartitions.toLong, n).toInt)
      .load()
      .filter(col(incrementingCol) > since && col(incrementingCol) <= hi)
    val envelope = slice.select(
      col(keyCol).cast("string").as(Envelope.Key),
      to_json(struct(slice.columns.map(col): _*)).as(Envelope.Value),
      lit(producer).as(Envelope.ProducerName),
      col(incrementingCol).cast("long").as(Envelope.SequenceId),
      current_timestamp().as(Envelope.PublishTime),
      current_timestamp().as(Envelope.EventTime))
    topic.append(envelope) // rows actually staged+committed, not the probe count
  }

  /**
   * Debezium CDC apply (reference pulsar-io/debezium: the relational
   * sources ship as Debezium connectors whose records carry a change
   * envelope `{op: c|r|u|d, before, after, source…}`): materialize the
   * CDC topic into current table state. For every key the event with
   * the highest offset wins (the topic is per-key FIFO, so the offset
   * order IS the commit order); a final `op = d` removes the key, any
   * other op surfaces the `after` image. `before` and `source` metadata
   * are CDC bookkeeping — not part of the state.
   *
   * This is the batch/foreachBatch form; the streaming form is the same
   * expression under [[graft.streaming.StreamOps.tableView]]'s update
   * semantics. Scale shape: one hash aggregation keyed on the row key
   * (max_by), no window sort, no driver loops.
   */
  def cdcApply(log: DataFrame, keyCol: String = Envelope.Key): DataFrame =
    log.groupBy(col(keyCol))
      .agg(max_by(col(Envelope.Value), col(Envelope.Offset)).as("_cdc"),
        max(Envelope.Offset).as("as_of_offset"))
      .withColumn("op", get_json_object(col("_cdc"), "$.op"))
      .filter(col("op").isNotNull && col("op") =!= "d")
      .withColumn("after", get_json_object(col("_cdc"), "$.after"))
      .drop("_cdc")

  /**
   * Canal binlog CDC apply with POSITION-WATERMARK RESUME — the one
   * connector semantic distinct from the Debezium envelope (reference
   * pulsar-io/canal/.../CanalAbstractSource.java:113-131: getWithoutAck
   * batches carry a monotonic id surfaced as CanalRecord.getRecordSequence;
   * ack moves the stored binlog position, so a restarted source resumes
   * strictly AFTER the last acked position — never re-applying, never
   * skipping). Change rows carry the public canal FlatMessage fields
   * (MessageUtils.java:100-160): binlog file + position, change type
   * INSERT/UPDATE/DELETE, pk, row data.
   *
   * This operator applies exactly the rows whose (binlog_file,
   * binlog_pos) exceed the resume watermark — lexicographic file order
   * then numeric position, MySQL's own binlog ordering — last-writer-
   * wins per pk in binlog order; a final DELETE removes the key. The
   * output carries each surviving key's applied (file, pos); the next
   * ACK watermark must come from [[canalAckWatermark]] over the SAME
   * change stream — max over this operator's output is stale whenever
   * the newest applied change is a DELETE (its row is dropped here),
   * and acking a stale position re-delivers an already-applied suffix.
   *
   * Scale shape: the watermark is a pushed-down filter (binlog file is
   * a natural partition column for an archived change log — the filter
   * prunes whole files); then ONE hash aggregation keyed on pk, no
   * window sort, no driver loops — same shape as [[cdcApply]].
   */
  def canalApply(changes: DataFrame,
                 resumeFile: String = "", resumePos: Long = -1L,
                 fileCol: String = "binlog_file", posCol: String = "binlog_pos",
                 pkCol: String = "pk", typeCol: String = "change_type",
                 dataCol: String = "data"): DataFrame =
    changes.filter(
        (col(fileCol) > resumeFile) ||
        (col(fileCol) === resumeFile && col(posCol) > resumePos))
      .groupBy(col(pkCol))
      .agg(max_by(
        struct(col(typeCol).as("t"), col(dataCol).as("d"),
          col(fileCol).as("f"), col(posCol).as("p")),
        struct(col(fileCol), col(posCol))).as("_last"))
      .filter(col("_last.t") =!= "DELETE")
      .select(col(pkCol), col("_last.t").as(typeCol), col("_last.d").as(dataCol),
        col("_last.f").as(fileCol), col("_last.p").as(posCol))

  /** The position to ACK after applying `changes` past the current
    * watermark: the max (file, pos) over the APPLIED rows — including
    * DELETEs, which [[canalApply]]'s materialized output drops. Returns
    * None when nothing was applied (ack nothing; keep the old
    * watermark). One bounded 2-column aggregate. */
  def canalAckWatermark(changes: DataFrame,
                        resumeFile: String = "", resumePos: Long = -1L,
                        fileCol: String = "binlog_file",
                        posCol: String = "binlog_pos"): Option[(String, Long)] =
    changes.filter(
        (col(fileCol) > resumeFile) ||
        (col(fileCol) === resumeFile && col(posCol) > resumePos))
      .agg(max(struct(col(fileCol), col(posCol))).as("w"))
      .select(s"w.$fileCol", s"w.$posCol")
      .collect().headOption
      .flatMap(r => if (r.isNullAt(0)) None else Some((r.getString(0), r.getLong(1))))

  /** Write modes of the JDBC sink (reference
    * pulsar-io/jdbc/core/.../JdbcAbstractSink.java:52 INSERT/UPSERT/DELETE
    * mutation routing). */
  sealed trait JdbcMode
  object JdbcMode {
    case object Insert extends JdbcMode
    case object Upsert extends JdbcMode
    case object Delete extends JdbcMode
  }

  /**
   * Topic → JDBC sink (reference pulsar-io/jdbc): stream the topic into a
   * relational table with INSERT / UPSERT / DELETE semantics.
   *
   * Shape: foreachBatch → foreachPartition → one connection and batched
   * PreparedStatements per partition (`batchSize` rows per round trip) —
   * executors write in parallel, nothing funnels through the driver.
   * Upsert is the dialect-portable two-step (batched UPDATE, then INSERT
   * for the keys that updated zero rows) rather than vendor MERGE, so it
   * runs on any JDBC target. Microbatches are HW-filtered: uncommitted
   * rows never reach the sink (same read-committed gate as
   * Subscription.consume).
   *
   * Delivery: at-least-once per foreachBatch; UPSERT and DELETE are
   * idempotent so replays converge, INSERT mode can duplicate on replay
   * (the reference sink carries the same caveat).
   */
  def topicToJdbcSink(topic: TopicLog, url: String, table: String,
                      keyCols: Seq[(String, String)],
                      valueCols: Seq[(String, String)],
                      mode: JdbcMode, checkpoint: String,
                      batchSize: Int = 500): StreamingQuery = {
    // validate eagerly at wiring time — not first microbatch
    checkIdentifier(table): Unit
    (keyCols ++ valueCols).foreach(c => checkIdentifier(c._2))
    val spark = topic.spark
    // (topicColumn -> tableColumn) mapping: envelope names like key/value
    // are reserved words in most SQL dialects
    val projection = (keyCols ++ valueCols).map { case (tc, dbc) => col(tc).as(dbc) }
    val dbKeys = keyCols.map(_._2)
    val dbVals = valueCols.map(_._2)
    spark.readStream
      .schema(spark.read.parquet(topic.name.path(topic.root)).schema)
      .parquet(topic.name.path(topic.root))
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val hw = topic.highWater()
        val committed =
          if (hw.isEmpty) batch.limit(0)
          else batch.filter(hw.map { case (p, o) =>
            (col(Envelope.Partition) === p) && (col(Envelope.Offset) <= o)
          }.reduce(_ || _))
        // per-key apply order: a key routes to exactly one topic
        // partition, so its offsets are a total order — repartition by
        // key and sort within partitions so replays and multi-file
        // batches converge to last-write-wins, never arrival order
        committed
          .select(projection :+ col(Envelope.Offset).as("_apply_order"): _*)
          .repartition(dbKeys.map(col): _*)
          .sortWithinPartitions(col("_apply_order"))
          .select((dbKeys ++ dbVals).map(col): _*)
          .rdd.foreachPartition { rows =>
            if (rows.hasNext) writeJdbcPartition(
              rows, url, table, dbKeys, dbVals, mode, batchSize)
          }
      }
      .start()
  }

  /** Executor-side partition writer: one connection, batched statements. */
  private def writeJdbcPartition(rows: Iterator[org.apache.spark.sql.Row],
                                 url: String, table: String,
                                 keyCols: Seq[String], valueCols: Seq[String],
                                 mode: JdbcMode, batchSize: Int): Unit = {
    checkIdentifier(table): Unit
    val cols = (keyCols ++ valueCols).map(checkIdentifier)
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      conn.setAutoCommit(false)
      val insertSql = s"INSERT INTO $table (${cols.mkString(", ")}) VALUES " +
        s"(${cols.map(_ => "?").mkString(", ")})"
      val updateSql = s"UPDATE $table SET " +
        valueCols.map(c => s"$c = ?").mkString(", ") +
        " WHERE " + keyCols.map(c => s"$c = ?").mkString(" AND ")
      val deleteSql = s"DELETE FROM $table WHERE " +
        keyCols.map(c => s"$c = ?").mkString(" AND ")

      def bind(ps: java.sql.PreparedStatement, row: org.apache.spark.sql.Row,
               order: Seq[String]): Unit =
        order.zipWithIndex.foreach { case (c, i) =>
          ps.setObject(i + 1, row.getAs[Any](c)) }

      mode match {
        case JdbcMode.Insert =>
          val ps = conn.prepareStatement(insertSql)
          var n = 0
          rows.foreach { r =>
            bind(ps, r, cols); ps.addBatch(); n += 1
            if (n % batchSize == 0) ps.executeBatch(): Unit
          }
          ps.executeBatch(); ps.close()
        case JdbcMode.Delete =>
          val ps = conn.prepareStatement(deleteSql)
          var n = 0
          rows.foreach { r =>
            bind(ps, r, keyCols); ps.addBatch(); n += 1
            if (n % batchSize == 0) ps.executeBatch(): Unit
          }
          ps.executeBatch(); ps.close()
        case JdbcMode.Upsert =>
          val up = conn.prepareStatement(updateSql)
          val ins = conn.prepareStatement(insertSql)
          // keys INSERTed by this partition: a later duplicate of such a
          // key also reports update-count 0 from the same batch (the
          // batch ran before the insert), and must UPDATE, not INSERT
          // again — otherwise a repeated key in one microbatch dies on
          // the primary-key constraint
          val inserted = scala.collection.mutable.HashSet[Seq[Any]]()
          rows.grouped(batchSize).foreach { group =>
            group.foreach { r => bind(up, r, valueCols ++ keyCols); up.addBatch() }
            val counts = up.executeBatch()
            group.iterator.zip(counts.iterator).foreach { case (r, c) =>
              val key = keyCols.map(r.getAs[Any])
              // SUCCESS_NO_INFO drivers don't report counts — probe with
              // a single UPDATE so "0 rows" is never guessed
              val updatedRows =
                if (c == java.sql.Statement.SUCCESS_NO_INFO) {
                  bind(up, r, valueCols ++ keyCols); up.executeUpdate()
                } else c
              if (updatedRows == 0) {
                if (inserted.contains(key)) {
                  bind(up, r, valueCols ++ keyCols); up.executeUpdate(): Unit
                } else {
                  bind(ins, r, cols); ins.executeUpdate()
                  inserted += key
                }
              }
            }
          }
          up.close(); ins.close()
      }
      conn.commit()
    } finally conn.close()
  }
}
