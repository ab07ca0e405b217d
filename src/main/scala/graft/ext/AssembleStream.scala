package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Composed corpus assembly — token-budget mixture admission feeding
 * GPT-style sequence packing as ONE stream: each microbatch admits
 * arriving documents while their stratum's budget is open
 * ([[MixtureStream]]'s boundary rule), and the ADMITTED documents
 * immediately continue the concatenated training-token stream exactly
 * where the previous batch's admissions ended ([[SeqPackStream]]'s
 * continuation rule). Epoch dirs hold the loader-facing span map of
 * the composed corpus — the last leg of the ingest path: cleaned
 * documents in, fixed-length training sequences out, with no terminal
 * re-pack pass and no intermediate admitted-corpus copy on disk.
 *
 * Cross-batch state is the mixture totals AND the pack offset — two
 * independent [[EpochState]] chains (`_mixstate-`, `_offset-`) in one
 * output dir, sharing one replay argument: each chain reads its
 * STRICTLY-prior entry, so whatever step a crash interrupts (spans
 * written, totals committed, offset committed — in that order), the
 * replayed batch recomputes both values identically, overwrites its
 * own epoch dir, and each commit tolerates its own stale entry only
 * on identical content. The offset chain here advances by ADMITTED
 * tokens (the packed stream is the admitted corpus), unlike the
 * standalone packer's all-seen total — the composition point.
 *
 * Once every budget closes, batches skip all Spark jobs and writes
 * (decidable from prior totals alone), exactly as in
 * [[MixtureStream]].
 *
 * 100 TB posture: both stages are batch-local distributed prefix sums
 * (id-range buckets, broadcast offsets) plus O(|weights|) driver
 * state; nothing scales with corpus lifetime.
 */
object AssembleStream {
  def run(docs: DataFrame, outDir: String, checkpointDir: String,
          weights: Map[String, Double], budgetTokens: Long, seqLen: Long,
          tokensCol: String, strataCol: String = "lang",
          idCol: String = "doc_id",
          bucketWidth: Long = 1000000L): StreamingQuery = {
    require(budgetTokens >= 0, s"budgetTokens $budgetTokens must be >= 0")
    require(seqLen > 0, s"seqLen $seqLen must be positive")
    require(bucketWidth > 0, s"bucketWidth $bucketWidth must be positive")
    require(weights.nonEmpty && weights.values.forall(_ >= 0),
      "weights must be non-empty and non-negative")
    val needs = MixtureStream.needsFor(weights, budgetTokens)
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        BatchTune.adapt(batch)
        val priorTotals = MixtureStream.priorTotals(outDir, epochId)
        val priorOffset = SeqPackStream.priorOffset(outDir, epochId)
        val cached = batch.persist()
        try {
          val allClosed = needs.forall { case (s, n) =>
            priorTotals.getOrElse(s, 0L) >= n }
          val weighted = cached
            .filter(col(strataCol).isin(weights.keys.toSeq: _*))
          val sums =
            if (allClosed) Map.empty[String, Long]
            else MixtureStream.seenSums(weighted, tokensCol, strataCol)
          var admittedTokens = 0L
          if (sums.nonEmpty) {
            val adm = MixtureStream.admitted(weighted, needs, priorTotals,
              tokensCol, strataCol, idCol, bucketWidth).persist()
            try {
              admittedTokens = adm
                .agg(coalesce(sum(col(tokensCol)), lit(0L)).cast("long"))
                .head().getLong(0)
              // zero admitted tokens -> zero spans: skip the write (the
              // same no-empty-dirs rule as the mixture; replay
              // re-derives the same skip)
              if (admittedTokens > 0L)
                Sampling.packSequencesFrom(adm, seqLen, tokensCol, idCol,
                    bucketWidth, startOffset = priorOffset)
                  .write.mode("overwrite").parquet(s"$outDir/epoch=$epochId")
            } finally { adm.unpersist(); () }
          }
          val merged = needs.keys.map { s =>
            s -> (priorTotals.getOrElse(s, 0L) + sums.getOrElse(s, 0L))
          }.toMap
          MixtureStream.commitTotals(outDir, epochId, merged)
          SeqPackStream.commitOffset(outDir, epochId,
            priorOffset + admittedTokens)
        } finally { cached.unpersist(); () }
      }
      .start()
  }
}
