package graft.ext

import graft.log.PathIO
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Streaming SEMANTIC (embedding-cosine) near-duplicate filter against a
 * persisted, cluster-pruned vector index — the continuous-ingestion
 * form of [[VectorOps.semanticDedup]] (SemDeDup, Abbas et al. 2023,
 * arXiv:2303.09540), exactly as [[NearDupStream]] is the streaming form
 * of the lexical MinHash tier. A production embedding pipeline ingests
 * forever; each new slice must be deduplicated against every vector
 * seen before without rescanning the corpus.
 *
 * Index: `<indexDir>/vecs` — rows (vec_id, cluster, v), partitioned by
 * (epoch, cb = cluster mod clusterBuckets). SemDeDup's approximation is
 * the candidate rule: only SAME-CLUSTER vectors are compared (cluster =
 * low `clusterBits` bits of the 32-bit sign-LSH signature — the
 * deterministic quantizer shared with [[VectorOps.clusterScored]], no
 * stored model, replayable in the DuckDB oracle). A batch therefore
 * reads ONLY the cb partitions its own clusters fall in: candidate
 * lookup cost tracks the BATCH, never the corpus.
 *
 * Semantics ("all-seen", arrival-ordered — the same SQL-expressible
 * rule as [[NearDupStream]]): a vector is dropped iff some vector with
 * EARLIER ARRIVAL (an earlier epoch, or a smaller id within the same
 * batch) shares its cluster and has round(cosine, 6) ≥ `threshold` —
 * whether or not that earlier vector was itself dropped. Kept set is
 * order-determined, not chain-recursive, so DuckDB brute-forces it
 * (`stream_semantic_dedup`). Rounding to 6 decimals BEFORE the
 * threshold comparison keeps a last-ulp cross-engine difference from
 * flipping a verdict (the [[VectorOps.semanticDedup]] rule).
 *
 * `clusterBits` and `clusterBuckets` are INDEX-LIFETIME constants
 * (like [[NearDupStream.BandBuckets]]): the cluster definition decides
 * which historical vectors a new one is compared against, so changing
 * it mid-index would silently shrink the comparison set. Size bits ≈
 * log2(total-corpus / 64) for ~64-vector clusters (the
 * [[VectorOps.autoClusterBits]] rule, applied to the EXPECTED corpus,
 * not the first batch).
 *
 * Exactly-once: every write — kept output and index — targets an
 * explicit `epoch=<id>` subdirectory with a plain overwrite; candidate
 * reads filter `epoch < current`, so a replayed batch rewrites its own
 * epoch and never sees its own half-written entries (the
 * [[NearDupStream]] protocol, same crash analysis). Scheduled index
 * compaction reuses [[NearDupStream.compactIndex]] verbatim — one
 * level, bucket column `cb`.
 *
 * Scale, per batch: one quantize pass over the batch; a SHUFFLE_HASH
 * join against the (epoch, cb)-pruned index slice keyed on `cluster`
 * (per-cluster pair work is quadratic — never broadcast the clustered
 * side); one self-join within the batch; two epoch-dir writes. The one
 * `collect()` is the distinct cb list — bounded by `clusterBuckets`.
 * All index bookkeeping rides [[graft.log.PathIO]], so the index may
 * live on `hdfs://` like the rest of the control plane.
 */
object SemanticDedupStream {

  /** Default cluster-bucket partition fanout of the vector index (same
    * file-per-bucket write/prune trade as [[NearDupStream.BandBuckets]]:
    * per-epoch write cost ~one parquet file per touched bucket; read
    * pruning bites when a batch's clusters hit a fraction of the
    * buckets). */
  val ClusterBuckets = 64

  /** (vec_id, cluster, v, cb) for a batch — the quantizer stage.
    * Cluster = low `clusterBits` bits of the 32-bit sign-LSH signature
    * ([[VectorOps.clusterScored]]'s rule, minus the centroid scoring —
    * the arrival-ordered keep rule needs no centroid). */
  private[graft] def quantized(vecs: DataFrame, idCol: String, vecCol: String,
                               clusterBits: Int, clusterBuckets: Int): DataFrame =
    vecs.select(col(idCol).as("vec_id"),
        graft.functions.Sketch.sign_lsh(col(vecCol), 32)
          .bitwiseAND((1L << clusterBits) - 1).as("cluster"),
        col(vecCol).as("v"))
      .withColumn("cb", pmod(col("cluster"), lit(clusterBuckets.toLong)))

  private def readIndexOrEmpty(spark: SparkSession, path: String,
                               like: DataFrame): DataFrame =
    IndexIO.read(spark, path, like)

  /** Earlier-arrival (id_a = indexed vec, id_b = batch vec) DROP
    * verdicts for one batch against the persisted index: the read is
    * pruned to `epoch < epoch` AND the batch's own cb buckets (both
    * partition columns — exposed so the spec can gate the
    * PartitionFilters), then same-cluster exact cosine ≥ threshold. */
  private[graft] def indexDropped(spark: SparkSession, vecsDir: String,
                                  batchQ: DataFrame, epoch: Long,
                                  threshold: Double): DataFrame = {
    // bounded collect: ≤ ClusterBuckets values by construction
    val cbs = batchQ.select("cb").distinct()
      .collect().map(_.getLong(0)).toSeq
    val idx = readIndexOrEmpty(spark, vecsDir, batchQ)
      .filter(col("epoch") < epoch &&
        (if (cbs.isEmpty) lit(false) else col("cb").isin(cbs: _*)))
    // SHUFFLE_HASH keyed on cluster: per-cluster pair work is quadratic
    // in members — invisible to byte-based planning (semanticDedup
    // rationale); never broadcast the clustered side
    idx.select(col("cluster"), col("v").as("va"))
      .join(batchQ.select(col("vec_id").as("id_b"), col("cluster"),
          col("v").as("vb"))
        .hint("shuffle_hash"), Seq("cluster"))
      .filter(round(VectorOps.cosine(col("va"), col("vb")), 6) >= threshold)
      .select(col("id_b").as("dropped_id")).distinct()
  }

  /**
   * Run the filter over a streaming `vecs` source (columns `idCol`,
   * `vecCol`). Kept vectors land under `outDir` (parquet,
   * epoch-partitioned); the index persists under `indexDir/vecs`
   * across batches and restarts; `checkpointDir` is the Structured
   * Streaming checkpoint. `compactEvery = Some(n)` folds all index
   * epochs below the current batch into one directory every n batches
   * (crash-safe [[NearDupStream.compactIndex]] swap — bounds index
   * metadata for long-running streams). Returns the running query —
   * callers drain with `processAllAvailable`.
   */
  def run(vecs: DataFrame, indexDir: String, outDir: String,
          checkpointDir: String, threshold: Double,
          clusterBits: Int = 12,
          clusterBuckets: Int = ClusterBuckets,
          idCol: String = "vec_id", vecCol: String = "embedding",
          compactEvery: Option[Int] = None): StreamingQuery = {
    require(clusterBits >= 1 && clusterBits <= 32,
      s"clusterBits $clusterBits not in [1,32]")
    require(compactEvery.forall(_ >= 2), "compactEvery must be >= 2")
    val vecsDir = s"$indexDir/vecs"
    vecs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val spark = batch.sparkSession
        BatchTune.adapt(batch, indexBytes = IndexIO.committedBytes(vecsDir))
        val dbg = sys.env.contains("SPARK_GRAFT_ND_DEBUG")
        var tPrev = System.nanoTime()
        def mark(st: String): Unit = if (dbg) {
          val t = System.nanoTime()
          println(f"[sd-debug] epoch=$epochId $st%-14s ${(t - tPrev) / 1e9}%6.2fs")
          tPrev = t
        }
        // finish (or discard) any crash-interrupted compaction BEFORE
        // reading the index; then fold on schedule — every folded epoch
        // is committed (this batch is the only possibly-uncommitted one).
        // The fold runs CONCURRENTLY with the batch body (guide §2.6;
        // gcNow=false defers subsumed-dir deletes to the next batch's
        // resume — the NearDupStream overlap rationale), awaited in the
        // batch's finally.
        NearDupStream.resumeCompaction(vecsDir)
        val pendingFold = compactEvery.collect {
          case n if epochId > 0 && epochId % n == 0 =>
            NearDupStream.startJobs(spark,
              () => NearDupStream.compactIndex(spark, vecsDir, "cb",
                epochId - 1, gcNow = false))
        }
        mark("compaction")
        val cached = batch.persist()
        try {
          val q = quantized(cached, idCol, vecCol, clusterBits,
            clusterBuckets).persist()
          try {
            // 1. drops vs the persisted index ((epoch, cb)-pruned)
            val idxDropped = indexDropped(spark, vecsDir, q, epochId, threshold)
            mark("quantize+idx")
            // 2. drops within the batch (arrival tie-break: id order)
            val a = q.select(col("vec_id").as("id_a"), col("cluster"),
              col("v").as("va"))
            val b = q.select(col("vec_id").as("id_b"), col("cluster"),
              col("v").as("vb"))
            val selfDropped = a.join(b.hint("shuffle_hash"), Seq("cluster"))
              .filter(col("id_a") < col("id_b"))
              .filter(round(VectorOps.cosine(col("va"), col("vb")), 6) >= threshold)
              .select(col("id_b").as("dropped_id")).distinct()
            val dropped = idxDropped.unionByName(selfDropped).distinct()

            // epoch-constant writes: explicit epoch=<id> dir + plain
            // overwrite = replay-idempotent (NearDupStream protocol).
            // The two writes are independent (distinct dirs, persisted
            // inputs) and run as concurrent Spark jobs — per-file fixed
            // costs dominate both, so sequential writes stack floors.
            def epochWrite(df: DataFrame, bucket: Option[String],
                           path: String): Unit = {
              val w = df.write.mode("overwrite")
              bucket.fold(w)(bk => w.partitionBy(bk))
                .parquet(s"$path/epoch=$epochId")
            }
            // index append: ALL batch vecs, kept or dropped (all-seen);
            // repartition on cb BEFORE partitionBy: ≤ one file per
            // bucket per epoch (the NearDupStream write idiom)
            def timed(label: String)(w: => Unit): () => Unit = () => {
              val t0 = System.nanoTime()
              w
              if (dbg) println(f"[sd-debug] epoch=$epochId   w:$label%-10s " +
                f"${(System.nanoTime() - t0) / 1e9}%6.2fs")
            }
            NearDupStream.parallelWrites(spark,
              timed("kept") { epochWrite(cached
                .join(dropped, col(idCol) === col("dropped_id"), "left_anti"),
                None, outDir) },
              timed("index") { epochWrite(q.repartition(col("cb")),
                Some("cb"), vecsDir) })
            mark("writes(par)")
          } finally { q.unpersist(); () }
        } finally {
          cached.unpersist()
          pendingFold.foreach(_.await())
          mark("fold-await")
        }
      }
      .start()
  }
}
