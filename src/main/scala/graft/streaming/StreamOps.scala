package graft.streaming

import graft.model.Envelope
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Streaming forms of the view/dedup/window operators: TableView as a
 * continuously-updated last-by-key aggregate, streaming produce-dedup,
 * late-data side output.
 */
object StreamOps {

  /**
   * Streaming TableView (reference TableViewImpl.java:50,206): last value
   * per key, updated continuously. `max_by(struct(offset, value), offset)`;
   * `refresh()` (TableView.refreshAsync:138) = `processAllAvailable()` on
   * the returned query. Same key/tombstone rules as the batch twin
   * ([[graft.operators.Compaction.compact]]): null-key rows are not
   * viewable (TableViewImpl keys its map on the message key) and a key
   * whose LATEST message is a tombstone (null value) is REMOVED from the
   * view (handleMessage does data.remove on null payload) — without the
   * post-aggregate filter a consumer would see a phantom (key, null) row.
   * The removal is exact in complete output mode ([[tableViewQuery]]);
   * an update-mode sink sees no retraction row for a removed key — the
   * same delete-propagation caveat any update-mode consumer has.
   */
  def tableView(stream: DataFrame, keyCol: String = Envelope.Key,
                valueCol: String = Envelope.Value): DataFrame =
    stream.filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(max_by(col(valueCol), col(Envelope.Offset)).as(valueCol),
        max(Envelope.Offset).as("as_of_offset"))
      .filter(col(valueCol).isNotNull)

  /** Materialize a streaming TableView into an in-memory table readable
    * as `spark.table(viewName)`; returns the query (stop() to drop). */
  def tableViewQuery(stream: DataFrame, viewName: String, checkpoint: String,
                     keyCol: String = Envelope.Key,
                     valueCol: String = Envelope.Value): StreamingQuery =
    tableView(stream, keyCol, valueCol).writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(viewName)
      .option("checkpointLocation", checkpoint)
      .start()

  /**
   * Streaming effectively-once produce dedup (reference
   * MessageDeduplication §2.8): drop (producer_name, sequence_id)
   * duplicates arriving within the watermark horizon. The watermark bound
   * mirrors the broker's dedup snapshot horizon — state is pruned the
   * same way MessageDeduplication.takeSnapshot bounds replay.
   *
   * Caveat: rows with event times at/near the 1970 epoch sit at Spark's
   * initial watermark and can be treated as expired — real publish times
   * are always safe; synthetic epoch-zero fixtures are not.
   */
  def dedupWithinWatermark(stream: DataFrame, lag: String = "10 minutes"): DataFrame =
    stream
      .withWatermark(Envelope.PublishTime, lag)
      .dropDuplicatesWithinWatermark(Envelope.ProducerName, Envelope.SequenceId)

  /**
   * Late-data side output (reference WindowConfig.lateDataTopic §2.5):
   * Spark silently drops rows behind the watermark, so the fork happens
   * in foreachBatch against an explicitly-maintained watermark =
   * max(event_time seen in prior batches) − maxLag — exactly the
   * reference's WaterMarkEventGenerator.java:43 rule (max-minus-lag,
   * advanced between triggers, never within one). Rows behind it route
   * to `lateSink`; the rest to `mainProcess`.
   */
  def withLateDataSplit(stream: DataFrame, eventTimeCol: String, maxLagMs: Long,
                        checkpoint: String,
                        mainProcess: DataFrame => Unit,
                        lateSink: DataFrame => Unit): StreamingQuery = {
    // the watermark must survive restarts with the checkpoint, or a
    // resumed query would misroute arbitrarily late rows to mainProcess.
    // The file records (batchId, wmBeforeBatch, maxSeenAfter): a REPLAYED
    // batch (crash after the file write but before the checkpoint commit)
    // re-reads its own wmBefore, so routing is identical on replay.
    // The watermark file rides graft.log.PathIO (Hadoop FileSystem), so
    // a remote checkpoint (hdfs://) carries it across a driver move —
    // the pre-seam code was local-only and fail-louded on '://'.
    import graft.log.PathIO
    val wmFile = PathIO.path(checkpoint, "graft-watermark")
    def readWmFile(): Option[(Long, Long, Long)] =
      if (!PathIO.exists(wmFile)) None
      else PathIO.readString(wmFile).trim.split(",") match {
        case Array(b, w, m) => Some((b.toLong, w.toLong, m.toLong))
        case _ => None
      }
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.ext.BatchTune.adapt(batch)
        val b = batch.persist()
        try {
          val wmBefore = readWmFile() match {
            case Some((recordedId, wb, _)) if recordedId == batchId => wb // replay
            case Some((_, _, maxAfter)) => maxAfter
            case None => Long.MinValue
          }
          if (wmBefore == Long.MinValue) mainProcess(b)
          else {
            val wm = new java.sql.Timestamp(wmBefore - maxLagMs)
            // a NULL event time cannot be late — it routes to the main
            // path explicitly. Both comparison filters evaluate NULL to
            // false, so without the isNull arm such a row would match
            // NEITHER side and silently vanish — in the one operator
            // whose contract is that nothing is ever silently dropped.
            lateSink(b.filter(col(eventTimeCol).isNotNull &&
              col(eventTimeCol) < lit(wm)))
            mainProcess(b.filter(col(eventTimeCol).isNull ||
              col(eventTimeCol) >= lit(wm)))
          }
          val mx = b.agg(max(eventTimeCol)).head()
          val newMax = if (mx.isNullAt(0)) wmBefore
            else math.max(wmBefore, mx.getTimestamp(0).getTime)
          PathIO.mkdirs(wmFile.getParent)
          val tmp = PathIO.child(wmFile.getParent, "graft-watermark.tmp")
          PathIO.writeString(tmp, s"$batchId,$wmBefore,$newMax")
          PathIO.moveReplace(tmp, wmFile)
        } finally { b.unpersist(); () }
      }
      .start()
  }

  /**
   * Geo-replication copy job (reference PersistentReplicator §2.13): a
   * streaming query that re-publishes into the remote cluster's topic
   * path, stamping replicated_from. Loop rule (MessageDeduplication
   * .isDuplicateReplV1:345): skip rows that ORIGINATED AT THE TARGET —
   * in a bi-directional A↔B setup a row B sent to A must never be echoed
   * back to B.
   */
  def replicator(stream: DataFrame, selfCluster: String, targetCluster: String,
                 targetPath: String, checkpoint: String): StreamingQuery =
    stream
      .filter(col(Envelope.ReplicatedFrom).isNull ||
        (col(Envelope.ReplicatedFrom) =!= targetCluster &&
          col(Envelope.ReplicatedFrom) =!= selfCluster))
      .withColumn(Envelope.ReplicatedFrom, lit(selfCluster))
      .writeStream
      .option("checkpointLocation", checkpoint)
      .format("parquet")
      .option("path", targetPath)
      .start()
}
