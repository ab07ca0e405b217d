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
}
