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
 * output dirs, committed with [[PathIO.atomicCreate]]
 * (complete-or-absent on every scheme), under the exactly-once replay
 * argument [[SeqPackStream]] introduced: a replayed batch reads the
 * strictly-prior entry, recomputes identically, overwrites exactly its
 * own `epoch=<id>` dir, and tolerates its own stale commit only on
 * byte-identical content (a mismatch means a second writer and fails
 * loudly); entries older than `epoch - 1` prune, so the state chain
 * holds at two tiny files for the stream's lifetime.
 *
 * 100 TB posture: per-batch work is [[Sampling.exclusivePrior]] over
 * THE BATCH alone (id-range buckets, broadcast offsets) plus one
 * |weights|-row aggregate; nothing scales with corpus lifetime — no
 * index, no growing join side.
 */
object MixtureStream {
  private val StatePrefix = "_mixstate-"

  /** Per-stratum token targets — `floor` of one IEEE double product,
    * the identical value an oracle's `FLOOR(w * budget)` computes. */
  private[graft] def needsFor(weights: Map[String, Double],
                              budgetTokens: Long): Map[String, Long] =
    weights.map { case (s, w) => s -> math.floor(w * budgetTokens).toLong }

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

  /** Highest committed per-stratum totals below `epoch` (the pre-batch
    * stream position); empty before the first batch. Parses loudly —
    * an unrecognized `_mixstate-*` name is corruption, not a skip. */
  private[graft] def priorTotals(outDir: String,
                                 epoch: Long): Map[String, Long] = {
    val root = PathIO.path(outDir)
    if (!PathIO.exists(root)) return Map.empty
    val entries = PathIO.listDir(root).map(_.getName)
      .filter(_.startsWith(StatePrefix))
      .map { n =>
        val e = n.stripPrefix(StatePrefix)
        require(e.nonEmpty && e.forall(_.isDigit),
          s"unrecognized mixture state name: $n")
        e.toLong
      }
      .filter(_ < epoch)
    if (entries.isEmpty) Map.empty
    else parse(PathIO.readString(
      PathIO.path(outDir, s"$StatePrefix${entries.max}")))
  }

  /** Commit this epoch's post-batch totals; tolerate a byte-identical
    * replay-stale entry, refuse a diverging one; prune entries the
    * replay window can never read again. */
  private[graft] def commitTotals(outDir: String, epoch: Long,
                                  totals: Map[String, Long]): Unit = {
    val content = render(totals)
    val target = PathIO.path(outDir, s"$StatePrefix$epoch")
    if (!PathIO.atomicCreate(target, content)) {
      val existing = PathIO.readString(target)
      if (existing != new String(content, "UTF-8"))
        sys.error(s"mixture state $target diverges from this batch's " +
          "recomputation — second writer or nondeterministic input")
    }
    PathIO.listDir(PathIO.path(outDir)).map(_.getName)
      .filter(_.startsWith(StatePrefix))
      .filter(_.stripPrefix(StatePrefix).toLong < epoch - 1)
      .foreach(n => PathIO.deleteIfExists(PathIO.path(outDir, n)): Unit)
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
    require(weights.nonEmpty && weights.values.forall(_ >= 0),
      "weights must be non-empty and non-negative")
    val needs = needsFor(weights, budgetTokens)
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        val prior = priorTotals(outDir, epochId)
        val cached = batch.persist()
        try {
          // unweighted strata: refused without entering the prefix sum
          val weighted = cached
            .filter(col(strataCol).isin(weights.keys.toSeq: _*))
          val bounds = needs.toSeq.sortBy(_._1)
            .map { case (s, n) => (s, n, prior.getOrElse(s, 0L)) }
            .toDF("_m_stratum", "_need", "_base")
          Sampling.exclusivePrior(weighted, strataCol, tokensCol,
              bucket = floor(col(idCol) / lit(bucketWidth)),
              order = Seq(col(idCol)))
            .join(broadcast(bounds), col(strataCol) === col("_m_stratum"))
            .filter(col("_base") + col("_prior") < col("_need"))
            .drop("_m_stratum", "_need", "_base", "_prior")
            .write.mode("overwrite").parquet(s"$outDir/epoch=$epochId")
          // totals advance by every SEEN weighted token (admitted or
          // not — the boundary rule needs the full arrival cumsum)
          val sums = weighted.groupBy(strataCol)
            .agg(sum(col(tokensCol)).cast("long").as("_t"))
            .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
          val merged = needs.keys.map { s =>
            s -> (prior.getOrElse(s, 0L) + sums.getOrElse(s, 0L))
          }.toMap
          commitTotals(outDir, epochId, merged)
        } finally { cached.unpersist(); () }
      }
      .start()
  }
}
