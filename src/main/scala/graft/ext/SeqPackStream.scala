package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Streaming GPT-style sequence packing — the continuous form of
 * [[Sampling.packSequences]]: each microbatch's documents continue the
 * concatenated token stream exactly where the previous batch ended, so
 * the span map emitted over the whole stream EQUALS the batch operator
 * run once over the concatenated corpus (on id-ordered arrival, the
 * contract every `*_stream` oracle row states). This is the shape a
 * continuous ingest pipeline needs: documents keep arriving, training
 * sequences keep extending, and a training loader can consume epoch
 * dirs as they commit — no terminal "re-pack the corpus" pass.
 *
 * Cross-batch state is ONE number — the running token total — persisted
 * as `_offset-<epoch>` files beside the epoch output dirs (underscore:
 * invisible to parquet readers) under the [[EpochState]] commit
 * protocol: atomicCreate'd, replay reads the strictly-prior entry and
 * recomputes identically, a stale commit is tolerated only on
 * identical content, and the chain prunes to two tiny files for the
 * stream's lifetime.
 *
 * 100 TB posture: per-batch work is the batch operator's distributed
 * prefix sum over THE BATCH alone (id-range buckets, broadcast
 * offsets); nothing scales with corpus lifetime — no index, no
 * growing join side, 8 bytes of state.
 */
object SeqPackStream {
  private val state = new EpochState[Long]("_offset-",
    l => l.toString.getBytes("UTF-8"), _.trim.toLong, 0L)

  private[graft] def priorOffset(outDir: String, epoch: Long): Long =
    state.prior(outDir, epoch)

  private[graft] def commitOffset(outDir: String, epoch: Long,
                                  total: Long): Unit =
    state.commit(outDir, epoch, total)

  /**
   * Run the packer over a document stream carrying `tokensCol` (long
   * token counts; compute it upstream with e.g.
   * `size(TextOps.tokens(col("text")))`). Span rows land under
   * `outDir/epoch=<id>` (plain overwrite — epoch is constant per
   * batch, so replay rewrites exactly its own dir). Returns the
   * running query.
   */
  def run(docs: DataFrame, outDir: String, checkpointDir: String,
          seqLen: Long, tokensCol: String, idCol: String = "doc_id",
          bucketWidth: Long = 1000000L): StreamingQuery = {
    require(seqLen > 0, s"seqLen $seqLen must be positive")
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        BatchTune.adapt(batch)
        val prior = priorOffset(outDir, epochId)
        val cached = batch.persist()
        try {
          Sampling.packSequencesFrom(cached, seqLen, tokensCol, idCol,
              bucketWidth, startOffset = prior)
            .write.mode("overwrite").parquet(s"$outDir/epoch=$epochId")
          val batchTokens = cached
            .agg(coalesce(sum(col(tokensCol)), lit(0L))).head().getLong(0)
          commitOffset(outDir, epochId, prior + batchTokens)
        } finally { cached.unpersist(); () }
      }
      .start()
  }
}
