package graft.ext

import graft.log.PathIO
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
 * invisible to parquet readers) and committed with
 * [[PathIO.atomicCreate]], complete-or-absent on every scheme. The
 * exactly-once analysis is the replay argument the index streams use:
 *  - a replayed batch reads the PRE-batch offset (highest `_offset-<e>`
 *    with `e <` its epoch — its own possibly-committed offset is
 *    filtered out), recomputes the identical spans, and overwrites
 *    exactly its own `epoch=<id>` output dir;
 *  - its own offset commit then hits the already-present file: same
 *    deterministic content → tolerated; a content MISMATCH means a
 *    second writer or nondeterministic input and fails loudly (the
 *    single-writer posture of every stream here);
 *  - offsets older than `epoch - 1` are pruned after commit — replay
 *    only ever needs the immediately-prior entry, so the state chain
 *    holds at two tiny files regardless of stream lifetime.
 *
 * 100 TB posture: per-batch work is the batch operator's distributed
 * prefix sum over THE BATCH alone (id-range buckets, broadcast
 * offsets); nothing scales with corpus lifetime — no index, no
 * growing join side, 8 bytes of state.
 */
object SeqPackStream {
  private val OffsetPrefix = "_offset-"

  /** Highest committed offset below `epoch` (the pre-batch stream
    * position); 0 before the first batch. Parses loudly — an
    * unrecognized `_offset-*` name is corruption, not a skip. */
  private[graft] def priorOffset(outDir: String, epoch: Long): Long = {
    val root = PathIO.path(outDir)
    if (!PathIO.exists(root)) return 0L
    val entries = PathIO.listDir(root).map(_.getName)
      .filter(_.startsWith(OffsetPrefix))
      .map { n =>
        val e = n.stripPrefix(OffsetPrefix)
        require(e.nonEmpty && e.forall(_.isDigit),
          s"unrecognized seq-pack offset name: $n")
        e.toLong
      }
      .filter(_ < epoch)
    if (entries.isEmpty) 0L
    else PathIO.readString(
      PathIO.path(outDir, s"$OffsetPrefix${entries.max}")).trim.toLong
  }

  /** Commit this epoch's post-batch stream position; tolerate an
    * identical replay-stale entry, refuse a diverging one; prune
    * entries the replay window can never read again. */
  private[graft] def commitOffset(outDir: String, epoch: Long,
                                  total: Long): Unit = {
    val target = PathIO.path(outDir, s"$OffsetPrefix$epoch")
    if (!PathIO.atomicCreate(target, total.toString.getBytes("UTF-8"))) {
      val existing = PathIO.readString(target).trim.toLong
      if (existing != total)
        sys.error(s"seq-pack offset $target holds $existing but this " +
          s"batch computed $total — second writer or nondeterministic input")
    }
    PathIO.listDir(PathIO.path(outDir)).map(_.getName)
      .filter(_.startsWith(OffsetPrefix))
      .filter(_.stripPrefix(OffsetPrefix).toLong < epoch - 1)
      .foreach(n => PathIO.deleteIfExists(PathIO.path(outDir, n)): Unit)
  }

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
