package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Embedding-cluster corpus curation: difficulty-based pruning and
 * cluster-balanced subsampling over the same deterministic quantizer as
 * [[VectorOps.semanticDedup]] (SemDeDup's clustering stage reused as a
 * curation substrate).
 *
 * Reference scope: the reference engine ships no embedding analytics —
 * these are extension operators for the training-data-pipeline tier
 * (BASELINE.json north_star), implementing the two standard
 * cluster-level curation moves that SemDeDup does NOT cover:
 *
 *  - '''prototypePrune''' — Sorscher et al. 2022 (arXiv:2206.14486,
 *    "Beyond neural scaling laws: beating power-law scaling via data
 *    pruning"): score every example by its cosine similarity to its
 *    cluster centroid ("prototypicality") and keep only the HARDEST
 *    `keepFrac` of each cluster — lowest cosine = farthest from the
 *    prototype — the paper's winning self-supervised pruning metric on
 *    large corpora (easy/prototypical examples are the ones a big model
 *    learns anyway; §3.3 of the paper). Per-cluster (not global)
 *    quantiles are what make the rule distribution-preserving: no
 *    cluster is emptied by a globally easy region.
 *
 *  - '''clusterCapSample''' — diversity-preserving subsample: an
 *    md5-deterministic per-cluster cap of `maxPerCluster` rows, so no
 *    dense cluster (boilerplate, near-dup template families) can
 *    dominate the sample — the cluster-balanced draw used to build
 *    eval/seed sets from skewed corpora. The draw is the same
 *    `md5(salt|id)` order as [[Sampling]] (reproducible cross-engine,
 *    no seeded RNG), ranked WITHIN cluster.
 *
 * Both reuse [[VectorOps.clusterScored]]'s quantizer: cluster = low
 * `bits` bits of the 32-bit sign-LSH signature (auto-sized by
 * [[VectorOps.autoClusterBits]] to ~64-row clusters), centroids as
 * exact decimal sums — the whole pipeline replays in the DuckDB oracle
 * with zero stored model.
 *
 * Scale (100 TB): prototypePrune adds exactly ONE exchange beyond the
 * scoring stage — `cluster` partitions both window functions (rank and
 * size share the partitioning, Spark plans one shuffle), and
 * auto-sized clusters are ~64 rows so partitions balance regardless of
 * corpus skew; nothing is quadratic and no vector leaves its executor
 * after scoring. clusterCapSample's `row_number ≤ k` filter against a
 * LITERAL cap is rank-pruned map-side by Spark's WindowGroupLimit
 * (plan-gated), so a 10⁹-row cluster ships at most k·partitions rows
 * into the final window sort.
 */
object Clustering {

  /**
   * Sorscher-style prototypicality pruning: keep the hardest
   * `keepFrac` of every cluster, hardness = low cosine to the exact
   * cluster-centroid direction.
   *
   * Keep rule: rank members by (simc_r asc, id asc); kept iff
   * rank ≤ ceil(keepFrac · |cluster|). `keepFrac = 1` keeps everything
   * (rank ≤ |cluster| always holds), so the operator degrades to a
   * pure scoring pass.
   *
   * Returns (idCol, cluster, simc_r, keep_rank, kept) — one row per
   * input row, so downstream can either filter `kept` or consume the
   * score directly.
   */
  def prototypePrune(vecs: DataFrame, keepFrac: Double,
                     clusterBits: Option[Int] = None,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    require(keepFrac > 0 && keepFrac <= 1, s"keepFrac $keepFrac not in (0,1]")
    val bits = clusterBits.getOrElse(VectorOps.autoClusterBits(vecs.count()))
    val scored = VectorOps.clusterScored(vecs, bits, idCol, vecCol)
    val byHardness = Window.partitionBy("cluster")
      .orderBy(col("simc_r").asc, col("id").asc)
    val clusterAll = Window.partitionBy("cluster")
    scored
      .withColumn("keep_rank", row_number().over(byHardness).cast("bigint"))
      .withColumn("n_c", count(lit(1)).over(clusterAll))
      // 0.5·n etc. is exact double arithmetic on an integer count — the
      // DuckDB oracle computes the identical ceil
      .withColumn("kept", col("keep_rank") <= ceil(lit(keepFrac) * col("n_c")))
      .select(col("id").as(idCol), col("cluster"), col("simc_r"),
        col("keep_rank"), col("kept"))
  }

  /**
   * Cluster-balanced subsample: at most `maxPerCluster` rows per
   * sign-LSH cluster, drawn by the reproducible `md5(salt|id)` order
   * (ties — impossible for distinct ids — would break by id). Returns
   * ONLY the sampled rows: (idCol, cluster, pick_rank).
   *
   * No centroid is needed for the draw, so this skips the scoring agg
   * entirely: one narrow quantize pass, then the rank window whose
   * literal cap is WindowGroupLimit-pruned map-side before the
   * exchange.
   */
  def clusterCapSample(vecs: DataFrame, maxPerCluster: Int,
                       salt: String = "cb",
                       clusterBits: Option[Int] = None,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding"): DataFrame = {
    require(maxPerCluster >= 1, s"maxPerCluster $maxPerCluster must be >= 1")
    val bits = clusterBits.getOrElse(VectorOps.autoClusterBits(vecs.count()))
    require(bits >= 1 && bits <= 32, s"clusterBits $bits not in [1,32]")
    val base = vecs.select(col(idCol).as("id"),
      graft.functions.Sketch.sign_lsh(col(vecCol), 32)
        .bitwiseAND((1L << bits) - 1).as("cluster"))
    // Same draw shape as Sampling: lowercase-hex md5 over the UTF-8
    // bytes of "salt|id" — any SQL engine with md5 replays it.
    val draw = graft.functions.Md5Fast.md5_fast(
      concat(lit(salt + "|"), col("id").cast("string")))
    val byDraw = Window.partitionBy("cluster").orderBy(col("draw"), col("id"))
    base.withColumn("draw", draw)
      .withColumn("pick_rank", row_number().over(byDraw))
      .filter(col("pick_rank") <= maxPerCluster)
      .select(col("id").as(idCol), col("cluster"),
        col("pick_rank").cast("bigint").as("pick_rank"))
  }
}
