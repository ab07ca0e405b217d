package graft.ext

import graft.log.PathIO
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Streaming eval-set decontamination against a GROWING eval index —
 * the continuous form of [[TextOps.decontaminate]]. The batch operator
 * assumes a fixed eval set; in production both sides move: benchmark
 * suites gain test sets over time, and every corpus batch must be
 * screened against every eval document RECEIVED SO FAR. One mixed
 * stream carries both kinds (rows flagged by `evalFlagCol` — eval-set
 * updates ride the same ingest as data, so their relative order is
 * well-defined), and the eval n-gram postings persist in an
 * epoch-partitioned index like the other streaming-dedup levels.
 *
 * Semantics (arrival-ordered, SQL-expressible): a corpus document is
 * dropped iff it shares ≥ `minShared` distinct n-gram shingles with
 * the union of eval documents of its OWN batch or any earlier batch
 * (eval-first within a batch: an eval doc and a corpus doc arriving
 * together DO contaminate — the conservative reading). Later eval
 * arrivals do NOT retroactively drop already-kept output — retroactive
 * screening is a batch re-run of [[TextOps.decontaminate]] over the
 * kept output, by design (an exactly-once sink cannot unwrite).
 *
 * Scale design — deliberately DIFFERENT from the other streaming
 * indexes: eval sets are KBs-to-MBs against a TB corpus, so the whole
 * `epoch < current` index slice is read and BROADCAST (the batch
 * operator's posture: the corpus is never shuffled; the contamination
 * join is map-side, and only hits reach the per-doc aggregation). The
 * (epoch, eb) partitioning exists to bound per-epoch file counts and
 * to reuse [[NearDupStream.compactIndex]]/[[NearDupStream.rebucket]]
 * verbatim — not for read pruning, which a broadcast-small side does
 * not need. The index stores DISTINCT shingle hashes only (8 bytes
 * each, no eval ids): existence is what contamination needs, and
 * cross-epoch duplicates collapse in the per-batch distinct.
 *
 * Exactly-once: kept output and index writes target explicit
 * `epoch=<id>` dirs with plain overwrite; reads filter
 * `epoch < current` (a replayed batch re-derives its own eval
 * postings from the batch itself) — the [[NearDupStream]] protocol.
 */
object DecontamStream {

  /** Eval-postings partition fanout — bounds per-epoch file count
    * (eval batches are small; 16 × ~15 ms/file per epoch). */
  val EvalBuckets = 16

  /** Distinct (shingle_h, eb) postings of an eval slice. */
  private[graft] def evalPostings(evals: DataFrame, textCol: String,
                                  n: Int, evalBuckets: Int): DataFrame =
    evals.select(explode(graft.functions.Sketch.shingle_hashes(
        col(textCol), n, distinct = true)).as("shingle_h"))
      .distinct()
      .withColumn("eb", pmod(col("shingle_h"), lit(evalBuckets.toLong)))

  private def readIndexOrEmpty(spark: SparkSession, path: String,
                               like: DataFrame): DataFrame =
    if (PathIO.exists(PathIO.path(path)))
      spark.read.parquet(path)
    else like.withColumn("epoch", lit(0L)).limit(0)

  /** Contaminated corpus ids for one batch: corpus postings map-side
    * joined against the BROADCAST union of the persisted eval index
    * (`epoch < epoch`) and the batch's own eval postings. Exposed for
    * the plan gate (broadcast + epoch prune). */
  private[graft] def contaminatedIds(spark: SparkSession, ngramsDir: String,
                                     corpus: DataFrame, newEval: DataFrame,
                                     epoch: Long, n: Int, minShared: Long,
                                     idCol: String, textCol: String): DataFrame = {
    val idx = readIndexOrEmpty(spark, ngramsDir, newEval)
      .filter(col("epoch") < epoch).select("shingle_h")
    val evalAll = idx.unionByName(newEval.select("shingle_h")).distinct()
    corpus.select(col(idCol).as("doc_id"),
        explode(graft.functions.Sketch.shingle_hashes(col(textCol), n,
          distinct = true)).as("shingle_h"))
      .join(broadcast(evalAll), Seq("shingle_h"))
      .groupBy("doc_id")
      .agg(countDistinct("shingle_h").as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .select(col("doc_id").as("dropped_id"))
  }

  /**
   * Run the filter over a mixed stream (`evalFlagCol` boolean column
   * separates eval-set updates from corpus rows; everything else
   * passes through on kept corpus rows). Clean corpus rows land under
   * `outDir` (parquet, epoch-partitioned); the eval n-gram index
   * persists under `indexDir/ngrams`. Returns the running query.
   */
  def run(mixed: DataFrame, indexDir: String, outDir: String,
          checkpointDir: String, n: Int = 5, minShared: Long = 1L,
          idCol: String = "doc_id", textCol: String = "text",
          evalFlagCol: String = "is_eval",
          evalBuckets: Int = EvalBuckets,
          compactEvery: Option[Int] = None): StreamingQuery = {
    require(compactEvery.forall(_ >= 2), "compactEvery must be >= 2")
    val ngramsDir = s"$indexDir/ngrams"
    mixed.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val spark = batch.sparkSession
        NearDupStream.resumeCompaction(ngramsDir)
        compactEvery.foreach { cn =>
          if (epochId > 0 && epochId % cn == 0)
            NearDupStream.compactIndex(spark, ngramsDir, "eb", epochId - 1)
        }
        val cached = batch.persist()
        try {
          val corpusB = cached.filter(!col(evalFlagCol))
            .drop(evalFlagCol)
          val newEval = evalPostings(cached.filter(col(evalFlagCol)),
            textCol, n, evalBuckets).persist()
          try {
            val dropped = contaminatedIds(spark, ngramsDir, corpusB,
              newEval, epochId, n, minShared, idCol, textCol)
            def epochWrite(df: DataFrame, bucket: Option[String],
                           path: String): Unit = {
              val w = df.write.mode("overwrite")
              bucket.fold(w)(bk => w.partitionBy(bk))
                .parquet(s"$path/epoch=$epochId")
            }
            // eval-less batches (the common case — eval updates are
            // rare) skip the index write entirely: an epoch dir holding
            // only _SUCCESS would poison the index read's schema
            // inference once every dir is empty, and writing nothing is
            // replay-identical (the replayed batch re-derives the same
            // empty posting set)
            val hasEval = newEval.limit(1).count() > 0
            NearDupStream.parallelWrites(
              (Seq(() => epochWrite(corpusB
                .join(dropped, col(idCol) === col("dropped_id"), "left_anti"),
                None, outDir)) ++
                (if (hasEval)
                  Seq(() => epochWrite(newEval.repartition(col("eb")),
                    Some("eb"), ngramsDir))
                else Seq.empty)): _*)
          } finally { newEval.unpersist(); () }
        } finally { cached.unpersist(); () }
      }
      .start()
  }
}
