package graft.ext

import graft.log.PathIO
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Streaming token-budget mixture admission — the continuous form of
 * [[Sampling.tokenMixture]]'s fractional pass: documents arriving on a
 * stream are admitted while their stratum's token budget
 * (`floor(w_s · budgetTokens)`) is unexhausted, and refused forever
 * after. This is the ingest-side shape of corpus composition: a fixed
 * token recipe fills as sources arrive, domain by domain, and the
 * stream can keep running after every budget closes (late strata
 * admit nothing). The admission boundary is the batch operator's
 * remainder rule with ARRIVAL order in place of md5 order: a document
 * is admitted iff the exclusive cumulative token sum of all EARLIER
 * arrivals in its stratum is still below `need_s` — so the admitted
 * tokens land within one document of the budget, and on id-ordered
 * arrival the kept set is a plain SQL window rule the oracle replays.
 * Upsampling (whole epochs) is deliberately absent here: a stream
 * cannot replay documents it already passed; re-reading kept output is
 * the batch verb [[Sampling.tokenMixture]].
 *
 * Cross-batch state is one token total per WEIGHTED stratum —
 * unweighted strata are refused unconditionally and never tracked, so
 * state is bounded by the mixture recipe (tens of rows), not the
 * corpus. It persists as `_mixstate-<epoch>` files beside the epoch
 * output dirs under the [[EpochState]] commit protocol (atomicCreate,
 * strictly-prior replay read, identical-content tolerance, prune to
 * two entries). Once every budget has closed — readable from the
 * prior totals alone — a batch skips the prefix sum AND the epoch-dir
 * write entirely, so a stream left running after composition
 * completes accumulates no empty output dirs (and a batch carrying no
 * weighted rows likewise writes nothing; both skips re-derive
 * identically on replay).
 *
 * 100 TB posture: per-batch work is [[Sampling.exclusivePrior]] over
 * THE BATCH alone (id-range buckets, broadcast offsets) plus one
 * |weights|-row aggregate; nothing scales with corpus lifetime — no
 * index, no growing join side.
 */
object MixtureStream {
  /** State file content: sorted `<url-encoded stratum>\t<seen total>`
    * lines — canonical, so a replayed batch's recomputation is
    * byte-comparable against a stale commit. */
  private def render(totals: Map[String, Long]): Array[Byte] =
    totals.toSeq.sortBy(_._1).map { case (s, t) =>
      java.net.URLEncoder.encode(s, "UTF-8") + "\t" + t
    }.mkString("\n").getBytes("UTF-8")

  private def parse(content: String): Map[String, Long] =
    content.split('\n').iterator.filter(_.nonEmpty).map { line =>
      line.split('\t') match {
        case Array(s, t) if t.nonEmpty && t.forall(_.isDigit) =>
          java.net.URLDecoder.decode(s, "UTF-8") -> t.toLong
        case _ => sys.error(s"unrecognized mixture state line: $line")
      }
    }.toMap

  private val state = new EpochState[Map[String, Long]]("_mixstate-",
    render, parse, Map.empty)

  /** Per-stratum token targets — `floor` of one IEEE double product,
    * the identical value an oracle's `FLOOR(w * budget)` computes. */
  private[graft] def needsFor(weights: Map[String, Double],
                              budgetTokens: Long): Map[String, Long] =
    weights.map { case (s, w) => s -> math.floor(w * budgetTokens).toLong }

  private[graft] def priorTotals(outDir: String,
                                 epoch: Long): Map[String, Long] =
    state.prior(outDir, epoch)

  private[graft] def commitTotals(outDir: String, epoch: Long,
                                  totals: Map[String, Long]): Unit =
    state.commit(outDir, epoch, totals)

  /** Per-stratum token sums of one batch's weighted rows, collected to
    * the driver — bounded by |weights|, never the corpus. */
  private[ext] def seenSums(weighted: DataFrame, tokensCol: String,
                            strataCol: String): Map[String, Long] =
    weighted.groupBy(strataCol)
      .agg(sum(col(tokensCol)).cast("long").as("_t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  /** One batch's admissions: weighted rows whose stratum budget (given
    * the carried-in `prior` totals) is still open at their exclusive
    * within-batch arrival prior — the boundary rule of the class doc,
    * shared with [[AssembleStream]]'s composed form. */
  private[ext] def admitted(weighted: DataFrame, needs: Map[String, Long],
                            prior: Map[String, Long], tokensCol: String,
                            strataCol: String, idCol: String,
                            bucketWidth: Long): DataFrame = {
    val spark = weighted.sparkSession
    import spark.implicits._
    val bounds = needs.toSeq.sortBy(_._1)
      .map { case (s, n) => (s, n, prior.getOrElse(s, 0L)) }
      .toDF("_m_stratum", "_need", "_base")
    Sampling.exclusivePrior(weighted, strataCol, tokensCol,
        bucket = Sampling.idBucket(idCol, bucketWidth),
        order = Seq(col(idCol)))
      .join(broadcast(bounds), col(strataCol) === col("_m_stratum"))
      .filter(col("_base") + col("_prior") < col("_need"))
      .drop("_m_stratum", "_need", "_base", "_prior")
  }

  /**
   * Run budget-gated admission over a document stream carrying
   * `tokensCol` (long token counts) and a string `strataCol`. Admitted
   * rows land under `outDir/epoch=<id>` (plain overwrite — epoch is
   * constant per batch, so replay rewrites exactly its own dir).
   * Returns the running query.
   */
  def run(docs: DataFrame, outDir: String, checkpointDir: String,
          weights: Map[String, Double], budgetTokens: Long,
          tokensCol: String, strataCol: String = "lang",
          idCol: String = "doc_id",
          bucketWidth: Long = 1000000L): StreamingQuery = {
    require(budgetTokens >= 0, s"budgetTokens $budgetTokens must be >= 0")
    require(bucketWidth > 0, s"bucketWidth $bucketWidth must be positive")
    require(weights.nonEmpty && weights.values.forall(_ >= 0),
      "weights must be non-empty and non-negative")
    val needs = needsFor(weights, budgetTokens)
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        BatchTune.adapt(batch)
        val prior = priorTotals(outDir, epochId)
        val cached = batch.persist()
        try {
          // every budget closed (decidable from prior state alone):
          // nothing can admit and totals need not advance — no Spark
          // job, no empty epoch dir, identical decision on replay
          val allClosed = needs.forall { case (s, n) =>
            prior.getOrElse(s, 0L) >= n }
          // unweighted strata: refused without entering the prefix sum
          val weighted = cached
            .filter(col(strataCol).isin(weights.keys.toSeq: _*))
          // totals advance by every SEEN weighted token until closure
          // (admitted or not — the boundary rule needs the full
          // arrival cumsum)
          val sums =
            if (allClosed) Map.empty[String, Long]
            else seenSums(weighted, tokensCol, strataCol)
          if (sums.nonEmpty) {
            val adm = admitted(weighted, needs, prior, tokensCol,
              strataCol, idCol, bucketWidth).persist()
            try {
              // a batch can carry weighted rows whose strata are all
              // already closed (another stratum keeps `allClosed`
              // false): nothing admits, so skip the write — the same
              // no-empty-dirs rule as AssembleStream; replay re-derives
              // the identical skip from the same prior totals
              if (!adm.isEmpty)
                adm.write.mode("overwrite")
                  .parquet(s"$outDir/epoch=$epochId")
            } finally { adm.unpersist(); () }
          }
          val merged = needs.keys.map { s =>
            s -> (prior.getOrElse(s, 0L) + sums.getOrElse(s, 0L))
          }.toMap
          commitTotals(outDir, epochId, merged)
        } finally { cached.unpersist(); () }
      }
      .start()
  }
}
