package graft.sources

import graft.log.TopicLog
import graft.model.Envelope
import org.apache.spark.sql.{DataFrame, SparkSession}
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
 * | kafka / kafka-connect      | `spark.readStream.format("kafka")` |
 * | jdbc (insert/upsert/delete)| `spark.read/write.format("jdbc")` + MERGE in foreachBatch |
 * | elastic-search, solr       | es-hadoop / solr-spark sinks in foreachBatch |
 * | aws-s3 / hdfs3 / alluxio   | any hadoop-fs path (file formats built in) |
 * | debezium/canal CDC         | CDC topic as a schema'd stream; apply with last-write-wins compaction |
 * | data-generator             | `spark.range` + expression columns |
 * | http / netty / flume       | socket source / custom v2 source |
 *
 * Only `file` is implemented concretely (no external daemons in this
 * environment); the source→appender and topic→sink plumbing below is
 * connector-agnostic.
 */
object Connectors {

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
}
