package graft.operators

import graft.model.Envelope
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Large-payload chunking: producers split payloads over the max message
 * size into ordered chunks sharing a uuid; consumers buffer and
 * reassemble.
 *
 * Behavioral spec: producer split (reference ProducerBuilder.java:337-360
 * enableChunking / chunkMaxMessageSize), consumer reassembly keyed by
 * chunk uuid with chunk_id ordering (reference ConsumerImpl.java:1563
 * processMessageChunk; metadata uuid/chunk_id/num_chunks_from_msg in
 * SingleMessageMetadata, PulsarApi.proto:168).
 *
 * Spark mapping: chunk = row; reassembly is a grouped sort-collect —
 * one shuffle keyed by the 16-byte uuid, payload bytes concatenated in
 * chunk order. At 100 TB the shuffle moves each payload exactly once.
 */
object Chunking {

  /** Sentinel chunk-id marking a [[reassembleStream]] group that already
    * emitted (chunk ids are always ≥ 0, so this can never collide). */
  private val EmittedTombstone = -1

  /**
   * Split rows whose `payload` exceeds `chunkSize` bytes into chunk rows
   * (chunk_uuid, chunk_id, num_chunks, chunk_bytes). Small payloads pass
   * through as single chunks.
   */
  def split(df: DataFrame, payloadCol: String, chunkSize: Int,
            uuidCols: Seq[String]): DataFrame = {
    val nChunks = ceil(length(col(payloadCol)).cast("double") / chunkSize)
      .cast("int")
    df
      .withColumn("chunk_uuid", concat_ws("-", uuidCols.map(col): _*))
      .withColumn("num_chunks", greatest(nChunks, lit(1)))
      .withColumn("chunk_id", explode(sequence(lit(0), col("num_chunks") - 1)))
      .withColumn("chunk_bytes",
        substring(col(payloadCol), col("chunk_id") * chunkSize + 1, lit(chunkSize)))
      .drop(payloadCol)
  }

  /**
   * Reassemble chunk rows into full payloads: group by uuid, order chunks
   * by chunk_id, concatenate. Incomplete groups (missing chunks) are
   * dropped, mirroring the consumer discarding expired partial chunks
   * (ConsumerImpl chunk timeout).
   */
  def reassemble(chunks: DataFrame, outCol: String = "payload"): DataFrame =
    chunks
      .groupBy("chunk_uuid")
      .agg(
        max("num_chunks").as("expected"),
        count(lit(1)).as("got"),
        concat_ws("",
          transform(
            array_sort(collect_list(struct(col("chunk_id"), col("chunk_bytes")))),
            c => c.getField("chunk_bytes"))).as(outCol))
      .filter(col("got") === col("expected"))
      .drop("expected", "got")

  /**
   * [[reassemble]] on the CONSUME path of a stream — the reference
   * reassembles at the consumer, buffering partial chunk groups across
   * deliveries (ConsumerImpl.java:1563 processMessageChunk,
   * chunkedMessagesMap keyed by uuid; MessageChunkingTest): chunks of
   * one uuid may arrive in DIFFERENT microbatches, so a per-batch
   * groupBy cannot see the whole group. `flatMapGroupsWithState` keyed
   * by chunk_uuid holds the received (chunk_id → bytes) map until the
   * group completes, emits the payload EXACTLY ONCE, and drops the
   * state — state size is bounded by in-flight INCOMPLETE groups (×
   * chunk payload), never by stream length, the same bound the
   * reference enforces with maxPendingChunkedMessage.
   *
   * `incompleteTimeout`: evict a group that stays incomplete past this
   * processing-time duration (the reference's
   * expireTimeOfIncompleteChunkedMessage — a producer that died
   * mid-payload must not pin consumer memory forever). None = keep
   * until completion (bounded fixtures / tests).
   *
   * Duplicate chunks (redeliveries) overwrite idempotently before
   * completion. AFTER completion: with a timeout configured, an
   * "emitted" tombstone survives for one timeout window and absorbs
   * late duplicates — even a full redelivery of the whole group inside
   * the window emits nothing twice — then evicts, so tombstone state
   * is bounded by completions-per-window, not stream length. Without a
   * timeout the state drops at emission, so a FULL redelivery of a
   * completed group after that point re-emits; the at-least-once
   * envelope's (producer, sequence) dedup upstream is the guard there,
   * exactly as in the reference consumer.
   */
  def reassembleStream(chunks: DataFrame, outCol: String = "payload",
                       incompleteTimeout: Option[String] = None): DataFrame = {
    val spark = chunks.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val timeoutConf = incompleteTimeout.fold(GroupStateTimeout.NoTimeout)(_ =>
      GroupStateTimeout.ProcessingTimeTimeout)
    chunks.select(col("chunk_uuid"), col("chunk_id"), col("num_chunks"),
        col("chunk_bytes"))
      .as[(String, Int, Int, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Map[Int, String], (String, String)](
        OutputMode.Append, timeoutConf) {
        (uuid: String, rows: Iterator[(String, Int, Int, String)],
         state: GroupState[Map[Int, String]]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val prior = state.getOption.getOrElse(Map.empty)
            if (prior.contains(EmittedTombstone)) {
              // group already emitted — absorb late duplicates for the
              // rest of the tombstone window, emit nothing twice.
              // GroupState clears any stored timeout on EVERY function
              // invocation, so the absorb must RE-ARM it — otherwise one
              // late duplicate would make its tombstone immortal and
              // state would grow with all-time completions
              rows.foreach(_ => ())
              incompleteTimeout.foreach(state.setTimeoutDuration)
              Iterator.empty
            } else {
              var buf = prior
              var expected = -1
              rows.foreach { r => buf += r._2 -> r._4; expected = r._3 }
              if (expected > 0 && buf.size >= expected) {
                incompleteTimeout match {
                  case Some(t) =>
                    state.update(Map(EmittedTombstone -> ""))
                    state.setTimeoutDuration(t)
                  case None => state.remove()
                }
                Iterator((uuid, (0 until expected).map(buf.getOrElse(_, "")).mkString))
              } else {
                state.update(buf)
                incompleteTimeout.foreach(state.setTimeoutDuration)
                Iterator.empty
              }
            }
          }
      }
      .toDF("chunk_uuid", outCol)
  }
}
