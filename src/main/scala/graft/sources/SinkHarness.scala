package graft.sources

import graft.log.TopicLog
import graft.model.Envelope
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/**
 * The micro-batch shell every topic→external sink shares (factored out
 * of the ten concrete sinks; payload encoders stay per-sink):
 *
 *  1. stream the topic log (schema pinned from a batch peek),
 *     AvailableNow trigger, checkpointed;
 *  2. HW-filter each micro-batch to the committed prefix
 *     (read-committed — uncommitted rows never reach an external
 *     system; the same gate as Subscription.consume);
 *  3. optionally lay rows out for keyed apply: repartition by key with
 *     offset order within partitions — the per-key envelope order every
 *     per-sink writer relies on — and hand each partition's iterator of
 *     (key, value) rows to the sink's writer on the executors.
 *
 * Delivery is at-least-once per micro-batch (the streaming engine
 * replays a failed batch); each sink documents how its writer converges
 * under replay (idempotent ids, dup-key tolerance, …).
 */
private[sources] object SinkHarness {

  /** Steps 1–2; `process` receives one micro-batch's committed rows. */
  def start(topic: TopicLog, checkpoint: String)
           (process: DataFrame => Unit): StreamingQuery = {
    val spark = topic.spark
    // empty/truncated topic: schema falls back to the envelope (same
    // rule as Subscription.stream) — a raw parquet peek would throw
    // UNABLE_TO_INFER_SCHEMA when a sink is wired before the first
    // append or after a full retention pass
    val schema =
      try spark.read.parquet(topic.name.path(topic.root)).schema
      catch {
        case _: org.apache.spark.sql.AnalysisException => Envelope.schema
      }
    spark.readStream
      .schema(schema)
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
        process(committed)
      }
      .start()
  }

  /** Step 3. `groupKeyRuns` additionally sorts by (key, offset) so one
    * key's rows are CONSECUTIVE in the iterator (Cassandra's atomic
    * key-run batches); plain offset order otherwise. */
  def keyedPartitions(committed: DataFrame, groupKeyRuns: Boolean = false)
                     (writePartition: Iterator[Row] => Unit): Unit = {
    val ordered = committed
      .select(col(Envelope.Key), col(Envelope.Value),
        col(Envelope.Offset).as("_apply_order"))
      .repartition(col(Envelope.Key))
    val sorted =
      if (groupKeyRuns)
        ordered.sortWithinPartitions(col(Envelope.Key), col("_apply_order"))
      else ordered.sortWithinPartitions(col("_apply_order"))
    // the offset rides along as column 2: writers that need an explicit
    // per-mutation ordering token (Cassandra's USING TIMESTAMP) read it;
    // index-0/1 consumers are unaffected
    sorted.select(col(Envelope.Key), col(Envelope.Value),
        col("_apply_order"))
      .rdd.foreachPartition(writePartition)
  }

  /** Steps 1–3 fused — the standard shape of eight of the ten sinks. */
  def startKeyed(topic: TopicLog, checkpoint: String,
                 groupKeyRuns: Boolean = false)
                (writePartition: Iterator[Row] => Unit): StreamingQuery =
    start(topic, checkpoint)(keyedPartitions(_, groupKeyRuns)(writePartition))
}
