package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling, corpus-mixing, and shard-packing operators for
 * large-scale training-data pipelines (the BASELINE.json extension tier
 * beside [[TextOps]] / [[MinHash]] / [[VectorOps]]).
 *
 * Everything here is reproducible run-to-run and engine-to-engine: the
 * per-row "random" draw is `md5(salt || id)` — not a seeded RNG (whose
 * stream depends on partitioning) and not xxhash64 (whose value another
 * engine can't recompute) — so a sample taken by this engine can be
 * re-derived, audited, or extended by any SQL system with an md5
 * function. Three operator families:
 *
 *  - '''hash-fraction sample''' — keep rows whose draw falls below a
 *    threshold. Pure per-row filter: no shuffle, no window, pushes down
 *    to the scan; the 100 TB path. Rate is approximate (binomial around
 *    the fraction).
 *  - '''stratified rank sample / quota sample''' — exact per-stratum
 *    counts (`ceil(frac · n)` or a fixed quota k) via an md5 rank window
 *    within each stratum. One shuffle keyed on the stratum; strata
 *    parallelize, a single giant stratum serializes into one sort — use
 *    the hash-fraction form at that scale when exactness isn't needed.
 *    A fractions map per stratum is corpus mixing: weighting sources /
 *    languages into a training blend.
 *  - '''token-budget shard packing''' — assign documents, in a
 *    deterministic order, to consecutive shards of ≈ `budget` tokens
 *    (shard boundaries cut the cumulative token stream at budget
 *    multiples). Implemented as a distributed prefix sum over id-range
 *    buckets: local cumsum per (stratum, bucket), tiny per-bucket totals
 *    rolled into running offsets, broadcast back — no single-reducer
 *    global sort at any stratum size.
 */
object Sampling {

  /** The reproducible uniform draw: lowercase-hex md5 of salt||id —
    * any engine computes the identical 32-char string. */
  private def draw(idCol: String, salt: String) =
    graft.functions.Md5Fast.md5_fast(
      concat(lit(salt), col(idCol).cast("string")))

  /** Deterministic hash-fraction sample: keeps rows where the first 8 hex
    * chars of the draw sort below `fraction` of the 32-bit space. A plain
    * codegen'd filter — the form that survives 100 TB (no shuffle; prunes
    * at the scan when the id is a partition/stats column). */
  def hashFractionSample(df: DataFrame, fraction: Double,
                         idCol: String = "doc_id",
                         salt: String = ""): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction $fraction not in [0,1]")
    // fraction 1.0 must be the identity — a clamped threshold of
    // "ffffffff" with a strict < would drop the ~2^-32 of rows whose
    // draw starts with ffffffff (real rows at corpus scale)
    if (fraction >= 1.0) df
    else {
      // clamp: for fraction just below 1.0 (e.g. nextDown(1.0)) the double
      // product rounds UP to 2^32 and %08x would emit the 9-char
      // "100000000", which sorts lexicographically below "2..." — keeping
      // ~6% of rows instead of ~100%. Clamped, the worst case drops only
      // the ~2^-32 of draws starting "ffffffff".
      val t = math.min((fraction * (1L << 32)).toLong, 0xffffffffL)
      val threshold = f"$t%08x"
      df.filter(substring(draw(idCol, salt), 1, 8) < lit(threshold))
    }
  }

  /** md5 rank (1-based) and stratum size within each stratum — the shared
    * machinery of the exact samplers. Adds `rk` and `n_stratum`. */
  def withHashRank(df: DataFrame, strataCol: String,
                   idCol: String = "doc_id", salt: String = ""): DataFrame = {
    val byDraw = Window.partitionBy(strataCol)
      .orderBy(draw(idCol, salt), col(idCol))
    val whole = Window.partitionBy(strataCol)
    df.withColumn("rk", row_number().over(byDraw))
      .withColumn("n_stratum", count(lit(1)).over(whole))
  }

  /** Exact stratified sample / corpus mixer: per-stratum fraction map
    * (missing strata fall back to `defaultFraction`), keeping exactly
    * `ceil(frac · n)` rows per stratum. Fractions should be binary-exact
    * (k/2^m) when cross-engine bit-parity of the ceil boundary matters. */
  def stratifiedSample(df: DataFrame, strataCol: String,
                       fractions: Map[String, Double],
                       defaultFraction: Double = 0.0,
                       idCol: String = "doc_id",
                       salt: String = ""): DataFrame = {
    val frac = coalesce(
      element_at(typedLit(fractions), col(strataCol)), lit(defaultFraction))
    withHashRank(df, strataCol, idCol, salt)
      .filter(col("rk") <= ceil(col("n_stratum") * frac))
      .drop("n_stratum")
  }

  /** Quota sample: exactly min(k, n) rows per stratum — fixed-size
    * per-source caps (dedup-style budget enforcement). */
  def quotaSample(df: DataFrame, strataCol: String, k: Int,
                  idCol: String = "doc_id", salt: String = ""): DataFrame =
    withHashRank(df, strataCol, idCol, salt)
      .filter(col("rk") <= k).drop("n_stratum")

  /**
   * Temperature-weighted corpus mixing (the mT5/multilingual α-sampling
   * rule): stratum `s` receives `floor(targetRows · n_s^α / Σ_k n_k^α)`
   * rows (capped at `n_s`), drawn deterministically by md5 rank — α < 1
   * up-weights low-resource strata relative to proportional sampling.
   *
   * Cross-engine determinism: with the default `alpha = 0.5` the weight
   * is `sqrt(n)` — IEEE-754 requires sqrt (unlike pow) to be correctly
   * rounded, so any engine computes the identical double. The weight
   * total is a window sum over strata in STRATUM ORDER (one tiny row per
   * stratum), never a reduction in shuffle order, so the FP accumulation
   * order — and therefore the floor() boundary — is reproducible
   * run-to-run and engine-to-engine. Non-0.5 alphas use pow(), which is
   * not correctly rounded; quotas may differ by ±1 at exact boundaries
   * across engines (documented, not oracle-gated).
   *
   * Scale shape: the per-stratum count/weight/quota table is tiny and
   * broadcasts back; the rank is the same one window per stratum as
   * [[stratifiedSample]].
   */
  def temperatureMix(df: DataFrame, strataCol: String, targetRows: Long,
                     alpha: Double = 0.5, idCol: String = "doc_id",
                     salt: String = ""): DataFrame = {
    require(targetRows >= 0 && alpha > 0)
    val weight =
      if (alpha == 0.5) sqrt(col("_n_s").cast("double"))
      else pow(col("_n_s").cast("double"), alpha)
    // single-partition window: one row per stratum, deterministic order
    val wTot = Window.orderBy(strataCol)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val quota = df.groupBy(strataCol).agg(count(lit(1)).as("_n_s"))
      .withColumn("_w", weight)
      .withColumn("_tw", sum("_w").over(wTot))
      .withColumn("_quota", least(col("_n_s"),
        floor(lit(targetRows.toDouble) * col("_w") / col("_tw")).cast("long")))
      .select(col(strataCol).as("_q_stratum"), col("_quota"))
    withHashRank(df, strataCol, idCol, salt)
      .join(broadcast(quota), col(strataCol) <=> col("_q_stratum"))
      .filter(col("rk") <= col("_quota"))
      .drop("_q_stratum", "_quota", "n_stratum")
  }

  /**
   * Token-budget shard packing: within each stratum, documents ordered by
   * `idCol` are assigned `shard_id = floor(exclusive-cumsum(tokens) /
   * budget)` — shard boundaries cut the cumulative token stream at budget
   * multiples, so every shard except a stratum's last carries ≥ budget −
   * max(tokens) and < budget + max(tokens) tokens, deterministically.
   *
   * `idCol` must be unique within each stratum: it is the total order
   * the cumulative token stream is defined over, and duplicate ordering
   * keys make shard assignment of the duplicates unspecified in any
   * engine (window tie order).
   *
   * Scale shape: the naive formulation is one window sort per stratum —
   * a single reducer per language at 100 TB. This implementation is the
   * classic distributed prefix sum instead: ids are range-bucketed
   * (`bucketWidth` ids per bucket, order-preserving), cumsum runs locally
   * per (stratum, bucket), per-bucket totals (strata × buckets rows —
   * tiny) get running offsets in a second window over buckets only, and
   * a broadcast join adds the offsets back. No stage sorts more than one
   * bucket's rows.
   */
  def packShards(df: DataFrame, strataCol: String, tokensCol: String,
                 budget: Long, idCol: String = "doc_id",
                 bucketWidth: Long = 1000000L): DataFrame = {
    require(budget > 0 && bucketWidth > 0)
    exclusivePrior(df, strataCol, tokensCol,
        bucket = idBucket(idCol, bucketWidth), order = Seq(col(idCol)))
      .withColumn("shard_id", expr(s"_prior div $budget"))
      .drop("_prior")
  }

  /** The id-range bucket key of the prefix-sum family: exact integer
    * FLOOR division of the id by the bucket width — `(id − pmod(id,
    * width)) div width`, which subtracts the non-negative remainder
    * first so the integral `div` (truncate-toward-zero) coincides with
    * floor at EVERY id sign and magnitude. Plain `id div width` would
    * round negative ids toward zero (bucket −0.5 → 0, merging it with
    * the positive range and breaking the order-preserving-coarsening
    * contract [[exclusivePrior]] requires), and `floor(id / width)` in
    * double arithmetic loses integer resolution past 2^53 (ADVICE r15
    * flagged the former; r14 measured the latter). */
  private[ext] def idBucket(idCol: String, bucketWidth: Long): Column =
    expr(s"(`$idCol` - pmod(`$idCol`, $bucketWidth)) div $bucketWidth")

  /** Shared machinery of [[packShards]], [[tokenMixture]] and
    * [[MixtureStream]]: the exclusive cumulative sum of `tokensCol`
    * within each stratum, over the total order `order`, as a `_prior`
    * column — computed as a distributed prefix sum. `bucket` must be an
    * order-preserving coarsening of `order` (id ranges, hash-hex
    * prefixes): local cumsum per (stratum, bucket), per-bucket totals
    * (a tiny table) rolled into running offsets in a window over
    * buckets only, broadcast back. No stage sorts more than one
    * bucket's rows — the same shape at any stratum size. */
  private[ext] def exclusivePrior(df: DataFrame, strataCol: String,
                                  tokensCol: String, bucket: Column,
                                  order: Seq[Column]): DataFrame = {
    val withBk = df.withColumn("_bk", bucket)
    val wLocal = Window.partitionBy(col(strataCol), col("_bk"))
      .orderBy(order: _*)
    val local = withBk.withColumn("_local_cum",
      sum(col(tokensCol)).over(wLocal))
    val wOff = Window.partitionBy(strataCol).orderBy("_bk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withBk.groupBy(col(strataCol), col("_bk"))
      .agg(sum(col(tokensCol)).as("_bk_sum"))
      .withColumn("_offset", coalesce(sum("_bk_sum").over(wOff), lit(0L)))
      .drop("_bk_sum")
      .withColumnRenamed(strataCol, "_off_stratum")
      .withColumnRenamed("_bk", "_off_bk")
    // null-safe (<=>) join keys: a NULL stratum is one group to the
    // window/groupBy sides, and must stay one group here too — a plain
    // equi-join would silently drop every NULL-stratum row
    local.join(broadcast(offsets),
        col(strataCol) <=> col("_off_stratum") && col("_bk") <=> col("_off_bk"))
      .withColumn("_prior",
        col("_local_cum") + col("_offset") - col(tokensCol))
      .drop("_bk", "_off_stratum", "_off_bk", "_local_cum", "_offset")
  }

  /**
   * Epoch-weighted token-budget corpus mixture — the composition step
   * that turns cleaned sources into a training corpus (GPT-3, Brown et
   * al. 2020 Table 2.2: per-dataset weights with high-quality sets
   * "seen up to 3.4 epochs"; LLaMA, Touvron et al. 2023 Table 1's
   * epochs column). Stratum `s` must contribute
   * `need_s = floor(w_s · budgetTokens)` tokens; holding `avail_s`
   * tokens it is sampled at `need_s / avail_s` EPOCHS:
   *
   *  - every document gets `need_s div avail_s` whole copies
   *    (upsampling when the weight demands more tokens than exist);
   *  - the fractional remainder is filled by a deterministic md5-rank
   *    prefix — documents in draw order whose EXCLUSIVE cumulative
   *    token sum is still below the remainder get one more copy
   *    ([[packShards]]'s boundary rule), so the filled tokens land
   *    within one document of the remainder.
   *
   * Output is the input plus `n_copies ≥ 1` — the loader-facing repeat
   * count; per-stratum emitted tokens miss `need_s` by less than the
   * stratum's largest document. Strata absent from `weights` (and NULL
   * strata) weigh zero and drop. `need_s` is `floor` of one IEEE double
   * product, identical in any engine; binary-exact weights (k/2^m)
   * make the boundary bit-reproducible exactly as in
   * [[stratifiedSample]]. All arithmetic past that product is integral
   * (`div`), exact at any corpus size.
   *
   * Scale shape: per-stratum stats are one tiny aggregate (broadcast
   * back); the remainder prefix is [[exclusivePrior]] over hash-hex
   * buckets — first two draw chars, an order-preserving 256-way split
   * of each stratum's md5 order (equal-length lowercase-hex strings
   * sort bucket-major) — so no single-reducer sort at any stratum
   * size. Upsampling emits a COLUMN, not exploded rows: 3.4 epochs of
   * a 100 TB stratum is still one row per document.
   */
  def tokenMixture(df: DataFrame, strataCol: String,
                   weights: Map[String, Double], budgetTokens: Long,
                   tokensCol: String, idCol: String = "doc_id",
                   salt: String = ""): DataFrame = {
    val d = draw(idCol, salt)
    val pri = exclusivePrior(df, strataCol, tokensCol,
      bucket = conv(substring(d, 1, 2), 16, 10).cast("long"),
      order = Seq(d, col(idCol)))
    applyMixture(pri, mixtureStats(df, strataCol, weights, budgetTokens,
      tokensCol), strataCol)
  }

  /** Per-stratum copy counts of [[tokenMixture]]: whole passes `_full`
    * and remainder tokens `_rem` for each WEIGHTED stratum (inner join
    * — unweighted and NULL strata drop). `need` is computed driver-side
    * as `floor(w · budget)` — the identical IEEE product an oracle's
    * `FLOOR(w * budget)` evaluates. */
  private def mixtureStats(df: DataFrame, strataCol: String,
                           weights: Map[String, Double], budgetTokens: Long,
                           tokensCol: String): DataFrame = {
    require(budgetTokens >= 0, s"budgetTokens $budgetTokens must be >= 0")
    require(weights.nonEmpty && weights.values.forall(_ >= 0),
      "weights must be non-empty and non-negative")
    val spark = df.sparkSession
    import spark.implicits._
    val needs = weights.toSeq.sortBy(_._1)
      .map { case (s, w) => (s, math.floor(w * budgetTokens).toLong) }
      .toDF("_m_stratum", "_need")
    df.groupBy(col(strataCol).as("_m_stratum"))
      .agg(sum(col(tokensCol)).as("_avail"))
      .join(needs, Seq("_m_stratum"))
      .withColumn("_full", when(col("_avail") > 0,
        expr("_need div _avail")).otherwise(lit(0L)))
      .withColumn("_rem", when(col("_avail") > 0,
        col("_need") - col("_full") * col("_avail")).otherwise(lit(0L)))
      .select("_m_stratum", "_full", "_rem")
  }

  /** The copy-count rule shared by [[tokenMixture]] and its naive
    * reference: whole passes plus one for the remainder prefix. */
  private def applyMixture(pri: DataFrame, stats: DataFrame,
                           strataCol: String): DataFrame =
    pri.join(broadcast(stats), col(strataCol) === col("_m_stratum"))
      .withColumn("n_copies", col("_full") +
        when(col("_prior") < col("_rem"), lit(1L)).otherwise(lit(0L)))
      .filter(col("n_copies") >= 1)
      .drop("_m_stratum", "_full", "_rem", "_prior")

  /**
   * Materialize a [[tokenMixture]] result into the packed training
   * stream: every (document, copy) pair takes a deterministic position
   * in ONE GLOBAL md5 order — epochs and strata interleave instead of
   * a document's copies repeating back-to-back (the shuffled weighted
   * mix a training run actually consumes; GPT-3, Brown et al. 2020
   * §2.2 sample mixture components per batch, not per corpus pass) —
   * and the concatenated token stream is cut at `seqLen` boundaries
   * with the same split-span map as [[packSequences]]. Output: the
   * span columns plus `copy`, the 1-based epoch index of the
   * duplicate.
   *
   * The position draw is `md5(salt || id || '#' || copy)` —
   * reproducible by any engine, and copies of one document land at
   * unrelated positions.
   *
   * Scale shape: the same distributed prefix sum as [[packSequences]],
   * bucketed by the draw's first two hex chars (a global 256-way
   * order-preserving split, as in [[tokenMixture]]); only the tiny
   * bucket-totals table crosses a single partition. The explode
   * multiplies rows by `n_copies` — that is the intended output size
   * (the span map IS the epoch-weighted training corpus).
   */
  def packMixture(mixed: DataFrame, seqLen: Long, tokensCol: String,
                  idCol: String = "doc_id", copiesCol: String = "n_copies",
                  salt: String = ""): DataFrame = {
    require(seqLen > 0, s"seqLen $seqLen must be positive")
    val placed = packMixturePlaced(mixed, tokensCol, idCol, copiesCol, salt)
    spanExplode(placed, seqLen, tokensCol)
      .drop("_bk", "_off_bk", "_local_cum", "_offset", "_d")
  }

  /** The global draw-order placement of [[packMixture]]: explode the
    * copies, bucket by draw prefix, distributed exclusive cumsum. */
  private def packMixturePlaced(mixed: DataFrame, tokensCol: String,
                                idCol: String, copiesCol: String,
                                salt: String): DataFrame = {
    // filter BEFORE sequence(): sequence(1, 0) would step DOWNWARD
    val copies = mixed.filter(col(copiesCol) >= 1)
      .withColumn("copy", explode(sequence(lit(1L),
        col(copiesCol).cast("long"))))
    val withBk = copies
      .withColumn("_d", graft.functions.Md5Fast.md5_fast(concat(lit(salt), col(idCol).cast("string"),
        lit("#"), col("copy").cast("string"))))
      .withColumn("_bk", conv(substring(col("_d"), 1, 2), 16, 10)
        .cast("long"))
    val wLocal = Window.partitionBy(col("_bk"))
      .orderBy(col("_d"), col(idCol), col("copy"))
    val local = withBk.withColumn("_local_cum",
      sum(col(tokensCol)).over(wLocal))
    val wOff = Window.orderBy("_bk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withBk.groupBy(col("_bk"))
      .agg(sum(col(tokensCol)).as("_bk_sum"))
      .withColumn("_offset", coalesce(sum("_bk_sum").over(wOff), lit(0L)))
      .drop("_bk_sum")
      .withColumnRenamed("_bk", "_off_bk")
    local.join(broadcast(offsets), col("_bk") <=> col("_off_bk"))
      .withColumn("_start",
        col("_local_cum") + col("_offset") - col(tokensCol))
  }

  /** Reference implementation of [[packMixture]] as one global window
    * — the spec asserts the distributed form equals it. */
  private[graft] def packMixtureNaive(mixed: DataFrame, seqLen: Long,
                                      tokensCol: String,
                                      idCol: String = "doc_id",
                                      copiesCol: String = "n_copies",
                                      salt: String = ""): DataFrame = {
    val copies = mixed.filter(col(copiesCol) >= 1)
      .withColumn("copy", explode(sequence(lit(1L),
        col(copiesCol).cast("long"))))
      .withColumn("_d", graft.functions.Md5Fast.md5_fast(concat(lit(salt), col(idCol).cast("string"),
        lit("#"), col("copy").cast("string"))))
    val w = Window.orderBy(col("_d"), col(idCol), col("copy"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val placed = copies.withColumn("_start",
      coalesce(sum(col(tokensCol)).over(w), lit(0L)))
    spanExplode(placed, seqLen, tokensCol).drop("_d")
  }

  /** Reference implementation of [[tokenMixture]] as one window per
    * stratum — the spec asserts the distributed form equals it. */
  private[graft] def tokenMixtureNaive(df: DataFrame, strataCol: String,
                                       weights: Map[String, Double],
                                       budgetTokens: Long, tokensCol: String,
                                       idCol: String = "doc_id",
                                       salt: String = ""): DataFrame = {
    val w = Window.partitionBy(strataCol)
      .orderBy(draw(idCol, salt), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val pri = df.withColumn("_prior",
      coalesce(sum(col(tokensCol)).over(w), lit(0L)))
    applyMixture(pri, mixtureStats(df, strataCol, weights, budgetTokens,
      tokensCol), strataCol)
  }

  /**
   * Leakage-safe train/val/test split: the draw is one md5 per NEAR-DUP
   * GROUP (the [[Graph.dupGroups]] transitive closure of verified
   * pairs; docs with no pair are their own group), so every member of a
   * duplicate cluster lands in the SAME split — near-duplicates can
   * never straddle train/test and leak evaluation data (the failure
   * mode Lee et al. 2021 measure). Weights must sum to 1; boundaries
   * are the [[hashFractionSample]] thresholds (first 8 hex chars of the
   * draw vs `floor(cum · 2³²)` clamped), so the split is deterministic,
   * bit-reproducible cross-engine, and re-running with more data keeps
   * existing groups in their splits.
   *
   * Scale: one CC pass over the pair graph (O(log²) rounds) + one
   * equi-join of docs to group ids + a per-row codegen'd when-chain.
   */
  def leakageSafeSplit(docs: DataFrame, pairs: DataFrame,
                       weights: Seq[(String, Double)],
                       salt: String = "", idCol: String = "doc_id"): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 >= 0),
      "weights must be non-negative")
    val total = weights.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9, s"weights must sum to 1, got $total")
    val groups = Graph.dupGroups(pairs)
      .select(col("doc_id").as(idCol), col("group_id"))
    val withGroup = docs.join(groups, Seq(idCol), "left")
      .withColumn("group_id", coalesce(col("group_id"), col(idCol)))
    val groupDraw = substring(
      graft.functions.Md5Fast.md5_fast(concat(lit(salt), col("group_id").cast("string"))), 1, 8)
    val cums = weights.init.scanLeft(0.0)(_ + _._2).tail
    val thresholds = cums.map(c =>
      f"${math.min((c * (1L << 32)).toLong, 0xffffffffL)}%08x")
    val splitCol = weights.init.zip(thresholds) match {
      case Seq() => lit(weights.head._1)
      case (n0, t0) +: rest =>
        rest.foldLeft(when(groupDraw < lit(t0), n0._1)) {
          case (acc, (n, t)) => acc.when(groupDraw < lit(t), n._1)
        }.otherwise(weights.last._1)
    }
    withGroup.withColumn("split", splitCol)
  }

  /** Reference implementation of [[packShards]] as one window per stratum
    * — the spec asserts the distributed form equals it exactly. */
  private[graft] def packShardsNaive(df: DataFrame, strataCol: String,
                                     tokensCol: String, budget: Long,
                                     idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(strataCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("shard_id",
      (coalesce(sum(col(tokensCol)).over(w), lit(0L)) / lit(budget))
        .cast("long"))
  }

  /**
   * GPT-style sequence packing (concat-and-chunk): documents in `idCol`
   * order form one concatenated token stream, cut at `seqLen` boundaries
   * into fixed-length training sequences; a document whose span crosses
   * a boundary is SPLIT across the adjacent sequences. Output is the
   * span map a training loader consumes — one row per (document,
   * sequence) overlap, the input columns plus:
   *  - `seq_id` — index of the fixed-length sequence;
   *  - `tok_start`/`tok_end` — the document's token sub-range
   *    `[tok_start, tok_end)` placed in that sequence;
   *  - `seq_off` — the offset inside the sequence where that sub-range
   *    lands.
   * Every sequence except the global last carries exactly `seqLen`
   * tokens — zero padding waste, which is why pretraining corpora pack
   * this way (GPT-3, Brown et al. 2020 §2.1 — documents are
   * concatenated and split into fixed-context chunks). Zero-token
   * documents emit no rows; `idCol` must be unique (it defines the
   * concatenation order, exactly as in [[packShards]]).
   *
   * Differs from [[packShards]] on both sides of the boundary:
   * packShards assigns each document WHOLLY to the shard where its
   * first token falls (shards are ≈budget, output is one row per doc);
   * packSequences cuts exactly at `seqLen` and emits the split map.
   *
   * Scale shape: the global exclusive cumsum is the same distributed
   * prefix sum as [[packShards]] (id-range buckets, one local window
   * per bucket, per-bucket totals — a tiny table — rolled into running
   * offsets and broadcast back; no single-reducer sort over the
   * corpus). The boundary explode emits at most `tokens/seqLen + 1`
   * rows per document. Sequence arithmetic is integral `div`, exact at
   * any corpus size (no double rounding at 2^53 tokens).
   */
  def packSequences(df: DataFrame, seqLen: Long, tokensCol: String,
                    idCol: String = "doc_id",
                    bucketWidth: Long = 1000000L): DataFrame =
    packSequencesFrom(df, seqLen, tokensCol, idCol, bucketWidth,
      startOffset = 0L)

  /** [[packSequences]] with the concatenated stream starting at token
    * `startOffset` instead of 0 — the continuation hook
    * [[SeqPackStream]] uses to pack each microbatch exactly where the
    * previous batch's stream ended. */
  private[graft] def packSequencesFrom(df: DataFrame, seqLen: Long,
                                       tokensCol: String, idCol: String,
                                       bucketWidth: Long,
                                       startOffset: Long): DataFrame = {
    require(seqLen > 0, s"seqLen $seqLen must be positive")
    require(bucketWidth > 0, s"bucketWidth $bucketWidth must be positive")
    require(startOffset >= 0, s"startOffset $startOffset must be >= 0")
    val withBk = df.withColumn("_bk", idBucket(idCol, bucketWidth))
    val wLocal = Window.partitionBy(col("_bk")).orderBy(idCol)
    val local = withBk.withColumn("_local_cum",
      sum(col(tokensCol)).over(wLocal))
    // per-bucket totals: one row per id-range bucket — the single-
    // partition window below runs over that tiny table, never the corpus
    val wOff = Window.orderBy("_bk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withBk.groupBy(col("_bk"))
      .agg(sum(col(tokensCol)).as("_bk_sum"))
      .withColumn("_offset", coalesce(sum("_bk_sum").over(wOff), lit(0L)))
      .drop("_bk_sum")
      .withColumnRenamed("_bk", "_off_bk")
    val placed = local.join(broadcast(offsets), col("_bk") <=> col("_off_bk"))
      .withColumn("_start",
        col("_local_cum") + col("_offset") - col(tokensCol) + lit(startOffset))
    spanExplode(placed, seqLen, tokensCol)
      .drop("_bk", "_off_bk", "_local_cum", "_offset")
  }

  /** Shared boundary arithmetic of [[packSequences]] and its naive
    * reference: explode a doc at `_start` spanning `tokensCol` tokens
    * into its (seq_id, tok_start, tok_end, seq_off) overlaps. */
  private def spanExplode(placed: DataFrame, seqLen: Long,
                          tokensCol: String): DataFrame =
    placed.filter(col(tokensCol) > 0)
      .withColumn("seq_id", explode(sequence(
        expr(s"_start div $seqLen"),
        expr(s"(_start + `$tokensCol` - 1) div $seqLen"))))
      .withColumn("tok_start",
        greatest(lit(0L), col("seq_id") * lit(seqLen) - col("_start")))
      .withColumn("tok_end", least(col(tokensCol).cast("long"),
        (col("seq_id") + lit(1L)) * lit(seqLen) - col("_start")))
      .withColumn("seq_off",
        greatest(lit(0L), col("_start") - col("seq_id") * lit(seqLen)))
      .drop("_start")

  /** Reference implementation of [[packSequences]] as ONE global window
    * — the spec asserts the distributed form equals it exactly. */
  private[graft] def packSequencesNaive(df: DataFrame, seqLen: Long,
                                        tokensCol: String,
                                        idCol: String = "doc_id"): DataFrame = {
    val w = Window.orderBy(idCol).rowsBetween(Window.unboundedPreceding, -1)
    val placed = df.withColumn("_start",
      coalesce(sum(col(tokensCol)).over(w), lit(0L)))
    spanExplode(placed, seqLen, tokensCol)
  }

  /**
   * DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
   * arXiv:2302.03169): select raw documents that look like a target
   * distribution by importance weighting in a hashed n-gram feature
   * space, then sampling without replacement via the Gumbel top-k trick.
   *
   * Features are word unigrams + bigrams with multiplicity, hashed to
   * `buckets` cells by the first 3 hex chars of md5 (a string key, so no
   * engine-specific integer hashing anywhere). Bucket unigram models
   * with +1 (Laplace) smoothing: p = target cells, q = the full raw
   * corpus; a document's log-importance weight is Σ_cells
   * count · (ln p − ln q), each cell weight rounded to 9 decimals and
   * the per-document sum taken in exact decimals so the result is
   * independent of partitioning AND of engine (the oracle replays it in
   * SQL). The selection key adds per-document Gumbel noise
   * g = −ln(−ln(u)) with u from the md5 draw — i.i.d. uniform, so
   * top-k(lw + g) IS a weighted sample without replacement from the
   * softmax of the weights (Gumbel-max), the paper's resampling step.
   *
   * Scale: the exploded n-gram stream partially aggregates to
   * (doc, cell) counts (map-side combine on a bounded key space), the
   * cell-weight table is ≤ `buckets` rows (broadcast), and the only
   * per-document state is one decimal sum. Top-k is TakeOrdered — no
   * global single-partition window; the rank is assigned over the k
   * selected rows only.
   *
   * EAGER SIDE EFFECT: constructing the result runs a Spark job — the
   * (doc, cell) feature table is localCheckpoint-materialized during
   * DataFrame construction (it feeds both the cell models and the
   * per-doc weight sums; recomputing the n-gram explode per consumer
   * costs more than the narrow materialization, measured). Plan-only
   * consumers (explain, dry planning) therefore pay the feature-build
   * job, and the result is tied to executor liveness like any
   * localCheckpoint.
   *
   * Returns (rank, doc_id, lw_r, key_r) for the k selected documents.
   */
  def dsirResample(docs: DataFrame, isTarget: Column, k: Int,
                   buckets: Int = 4096, textCol: String = "text",
                   idCol: String = "doc_id", salt: String = "dsir|"): DataFrame = {
    require(k > 0)
    // the cell id is an md5 hex prefix, so the cell count must be a
    // power of 16 (one cell per prefix value) — and it sizes BOTH the
    // hash and the +buckets smoothing denominator
    // 16^7 is the largest power of 16 an Int holds (16^8 > Int.MaxValue)
    val hexDigits = (math.log(buckets.toDouble) / math.log(16.0)).round.toInt
    require(hexDigits >= 1 && hexDigits <= 7 && math.pow(16.0, hexDigits).toLong == buckets,
      s"buckets must be a power of 16 in [16, 16^7], got $buckets")
    val feats = TextOps.ensureParallelism(docs)
      .select(col(idCol).as("id"), isTarget.as("tgt"),
        explode(concat(TextOps.shinglesAll(col(textCol), 1),
          TextOps.shinglesAll(col(textCol), 2))).as("ngram"))
      .select(col("id"), col("tgt"),
        // per-NGRAM hash: the builtin md5's per-row
        // MessageDigest.getInstance convoys at high thread counts
        // (bimodal 15 s / 100 s task time at 32 threads — see Md5Fast)
        substring(graft.functions.Md5Fast.md5_fast(col("ngram")), 1,
          hexDigits).as("b"))
    // (doc, cell) counts feed BOTH the cell models and the per-doc
    // weight sums; truncate the lineage so the n-gram explode + md5 +
    // count runs once, not once per consumer (at 100 TB this
    // intermediate is the thing you'd materialize — it's the paper's
    // precomputed hashed-feature table)
    val perDoc = feats.groupBy("id", "tgt", "b")
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val cells = perDoc.groupBy("b")
      .agg(sum(when(col("tgt"), col("c")).otherwise(0L)).as("tgt_b"),
        sum(col("c")).as("all_b"))
    val totals = cells.agg(sum("tgt_b").as("tgt_tot"), sum("all_b").as("all_tot"))
    val weights = cells.crossJoin(broadcast(totals))
      .withColumn("lnw", round(
        log((col("tgt_b") + 1).cast("double") / (col("tgt_tot") + buckets).cast("double")) -
        log((col("all_b") + 1).cast("double") / (col("all_tot") + buckets).cast("double")), 9))
      .select("b", "lnw")
    val lw = perDoc.join(broadcast(weights), Seq("b"))
      .groupBy("id")
      .agg(sum(col("c").cast("decimal(10,0)") * col("lnw").cast("decimal(12,9)"))
        .cast("double").as("lw"))
    val keyed = lw
      .withColumn("gum", round(-log(-log(
        (conv(substring(draw("id", salt), 1, 8), 16, 10).cast("double") + 0.5) /
          lit(4294967296.0))), 9))
      .withColumn("lw_r", round(col("lw"), 6))
      .withColumn("key_r", round(col("lw") + col("gum"), 6))
    val top = keyed.orderBy(col("key_r").desc, col("id")).limit(k)
    // rank window runs over the k selected rows only
    val w = Window.orderBy(col("key_r").desc, col("id"))
    top.withColumn("rank", row_number().over(w).cast("bigint"))
      .select(col("rank"), col("id").as(idCol), col("lw_r"), col("key_r"))
  }
}
