package graft.operators

import graft.model.Envelope
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Producer-sequence deduplication — the reference's "effectively-once"
 * produce path.
 *
 * Behavioral spec: the broker tracks the highest sequence id pushed per
 * producer name and drops any send with `sequenceId <=
 * highestSequencedPushed[producer]` (reference
 * pulsar-broker/.../persistent/MessageDeduplication.java:107-112,330-358).
 *
 * Two Spark paths:
 *  - batch append: anti-join the incoming batch against the per-producer
 *    max-sequence state table (tiny — one row per producer — so it
 *    broadcasts; the log itself is never rescanned);
 *  - within-batch: keep the first occurrence per (producer, sequence) in
 *    publish order, then drop non-increasing sequences, mirroring the
 *    broker's serialized per-partition check.
 */
object Dedup {

  /** Per-producer max-sequence state (MessageDeduplication snapshot). */
  def sequenceState(log: DataFrame): DataFrame =
    log.groupBy(col(Envelope.ProducerName))
      .agg(max(Envelope.SequenceId).as("highest_sequence_pushed"))

  /**
   * Within-batch dedup: in offset order per producer, a row survives only
   * if its sequence id is strictly greater than every earlier sequence
   * from the same producer (exactly the broker's isDuplicate rule applied
   * serially). Uses a running max window, not a self-join.
   */
  def dedupBatch(batch: DataFrame): DataFrame = {
    val w = Window.partitionBy(Envelope.ProducerName)
      .orderBy(Envelope.Offset)
      .rowsBetween(Window.unboundedPreceding, -1)
    batch
      .withColumn("_prev_max", max(Envelope.SequenceId).over(w))
      .filter(col("_prev_max").isNull ||
        col(Envelope.SequenceId) > col("_prev_max"))
      .drop("_prev_max")
  }

  /**
   * Cross-batch dedup for append: drop rows whose sequence is not above
   * the committed high-water state, then within-batch dedup. `state` is
   * the output of [[sequenceState]] over the existing log (or a maintained
   * incremental table).
   */
  def dedupAppend(batch: DataFrame, state: DataFrame): DataFrame = {
    val joined = batch.join(
      broadcast(state), Seq(Envelope.ProducerName), "left")
      .filter(col("highest_sequence_pushed").isNull ||
        col(Envelope.SequenceId) > col("highest_sequence_pushed"))
      .drop("highest_sequence_pushed")
    dedupBatch(joined)
  }

  /**
   * Chunk-aware dedup — the composition rule for chunking × dedup
   * (reference MessageDeduplication.isDuplicate:330-358 chunk branch,
   * exercised by MessageChunkingDeduplicationTest): every chunk of one
   * logical message carries the SAME sequence id, so plain
   * [[dedupBatch]] (strictly-increasing sequence) would drop every
   * chunk after the first. The broker instead tracks a running
   * (sequenceId, chunkId) high-water per producer: a chunk survives iff
   * its pair is lexicographically ABOVE the high-water. That drops a
   * retransmitted chunk (same seq, same chunk_id — arrives mid-stream
   * or later), drops a whole resent logical message (same seq, chunk
   * ids all ≤ the recorded max), and passes the next message (higher
   * seq) — so reassembly downstream sees each chunk exactly once and
   * never double-counts. Struct comparison is Spark's lexicographic
   * field order, the same pair order the broker checks.
   */
  def dedupChunked(batch: DataFrame): DataFrame = {
    val w = Window.partitionBy(Envelope.ProducerName)
      .orderBy(Envelope.Offset)
      .rowsBetween(Window.unboundedPreceding, -1)
    val pair = struct(col(Envelope.SequenceId), col("chunk_id"))
    batch
      .withColumn("_prev_max", max(pair).over(w))
      .filter(col("_prev_max").isNull || pair > col("_prev_max"))
      .drop("_prev_max")
  }

  /**
   * Replicated-message dedup (MessageDeduplication.isDuplicateReplV2:345):
   * same rule keyed by (replicated_from, producer_name).
   */
  def dedupReplicated(batch: DataFrame): DataFrame = {
    val w = Window
      .partitionBy(Envelope.ReplicatedFrom, Envelope.ProducerName)
      .orderBy(Envelope.Offset)
      .rowsBetween(Window.unboundedPreceding, -1)
    batch
      .withColumn("_prev_max", max(Envelope.SequenceId).over(w))
      .filter(col("_prev_max").isNull ||
        col(Envelope.SequenceId) > col("_prev_max"))
      .drop("_prev_max")
  }
}
