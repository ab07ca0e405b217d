package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Hybrid lexical + vector retrieval with reciprocal-rank fusion
 * (Cormack/Clarke/Buettcher, SIGIR'09) — the production retrieval shape
 * for a training-data / RAG pipeline: a sparse BM25 leg and a dense
 * cosine leg, each producing a bounded top-k ranking, fused by
 * RRF(d) = Σ_legs 1/(rrfK + rank_leg(d)) with a document missing from a
 * leg contributing 0 from that leg.
 *
 * Scale design (100 TB): each leg is already a bounded top-k operator —
 * BM25 broadcasts the per-term document frequencies and corpus stats
 * ([[TextOps.bm25TopK]]), the vector leg broadcasts the query vector
 * ([[VectorOps.annBruteForce]] here; swap in [[VectorOps.annIvf]] for
 * the partition-pruned index path at corpus scale, the fusion is
 * rank-only and never sees the vectors). The fusion input is therefore
 * ≤ kLex + kVec rows regardless of corpus size; the rank windows and
 * the full-outer join run on that bounded set, so the fusion stage
 * itself is O(k) — no shuffle of corpus-sized data ever happens after
 * the legs' own top-k reductions.
 */
object Hybrid {

  /**
   * Fuse a BM25 top-`kLex` ranking for `queryText` with an exact-cosine
   * top-`kVec` ranking for the embedding of `queryVecId`, returning the
   * top `kOut` documents by RRF score.
   *
   * Determinism: the lexical leg ranks by (score rounded to 6 dp DESC,
   * doc_id), the vector leg by (sim DESC, corpus_id) — both totally
   * ordered, so ranks (and therefore RRF scores) are engine-order
   * independent and a DuckDB oracle reproduces them exactly.
   */
  def rrf(docs: DataFrame, vecs: DataFrame, queryText: String,
          queryVecId: Long, kLex: Int = 50, kVec: Int = 50, kOut: Int = 10,
          rrfK: Int = 60, idCol: String = "doc_id",
          textCol: String = "text"): DataFrame = {
    // single-partition window is safe here: it runs over the ALREADY
    // top-k-limited lexical leg (≤ kLex rows), not the corpus
    val lex = TextOps.bm25TopK(docs, queryText, kLex,
        idCol = idCol, textCol = textCol)
      .withColumn("lex_rank", row_number()
        .over(Window.orderBy(col("score_r").desc, col(idCol)))
        .cast("long"))
      .select(col(idCol).as("doc_id"), col("lex_rank"))
    val vec = VectorOps.annBruteForce(
        vecs, vecs.filter(col("vec_id") === queryVecId), kVec)
      .select(col("corpus_id").as("doc_id"),
        col("rank").cast("long").as("vec_rank"))
    lex.join(vec, Seq("doc_id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(rrfK) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("vec_rank")), lit(0.0)), 9))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(kOut)
      .select(col("doc_id"), col("lex_rank"), col("vec_rank"), col("rrf"))
  }

  /**
   * BATCH hybrid retrieval: N queries fused against the corpus in ONE
   * pass — the production shape (a query workload runs as a table, not
   * a loop of single-query jobs that would each rescan the corpus).
   * `queries` maps query_id → query text; the vector leg uses the
   * embedding whose `vec_id` equals the query_id.
   *
   * One-pass design: the corpus is tokenized ONCE; per-(doc, term)
   * frequencies are computed once for the UNION of all queries' terms
   * and only then joined to the broadcast (query, term) table — so
   * lexical cost is O(corpus + matches), independent of how many
   * queries share vocabulary. Document frequencies are per TERM
   * (query-independent), identical to what each single-query run would
   * compute. Rankings are per-query windows over the bounded match
   * sets; the fusion join is on (query_id, doc_id) over ≤ N·k rows.
   */
  def rrfBatch(docs: DataFrame, vecs: DataFrame, queries: Seq[(Long, String)],
               kLex: Int = 50, kVec: Int = 50, kOut: Int = 10, rrfK: Int = 60,
               k1: Double = 1.2, b: Double = 0.75, idCol: String = "doc_id",
               textCol: String = "text",
               // pluggable dense leg (corpus, queries, k) → (query_id,
               // corpus_id, rank, …): brute-force cosine by default; pass
               // VectorOps.annIvf for the partition-pruned index path at
               // corpus scale — in exact mode (nprobe = nlist) the fused
               // output is provably identical to the brute-force leg's
               vectorLeg: (DataFrame, DataFrame, Int) => DataFrame =
                 VectorOps.annBruteForce(_, _, _)): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(queries.map(_._1).distinct.size == queries.size,
      "duplicate query ids would double-count their terms' contributions")
    val qTermPairs = queries.flatMap { case (qid, text) =>
      text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).distinct
        .map(t => (qid, t))
    }
    require(qTermPairs.nonEmpty, "queries have no indexable terms")
    val qTerms = qTermPairs.toDF("query_id", "tok")
    val (dl0, tf0) = TextOps.bm25DocStats(docs,
      qTermPairs.map(_._2).distinct, idCol, textCol)
    val dl = dl0.withColumnRenamed(idCol, "doc_id")
    val tf = tf0.withColumnRenamed(idCol, "doc_id")
    val stats = dl.agg(count(lit(1)).cast("double").as("n_docs"),
      avg("dl").as("avgdl"))
    val dft = tf.groupBy("tok")
      .agg(countDistinct("doc_id").cast("double").as("df"))
    val scored = tf.join(broadcast(qTerms), "tok")
      .join(broadcast(dft), "tok")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("contrib",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
          col("tf") * lit(k1 + 1) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("query_id", "doc_id")
      .agg(round(sum("contrib"), 6).as("score_r"))
    val wl = Window.partitionBy("query_id")
      .orderBy(col("score_r").desc, col("doc_id"))
    val lex = scored.withColumn("lex_rank", row_number().over(wl).cast("long"))
      .filter(col("lex_rank") <= kLex)
      .select("query_id", "doc_id", "lex_rank")
    val vec = vectorLeg(
        vecs, vecs.filter(col("vec_id").isin(queries.map(_._1): _*)), kVec)
      .select(col("query_id"), col("corpus_id").as("doc_id"),
        col("rank").cast("long").as("vec_rank"))
    val wf = Window.partitionBy("query_id").orderBy(col("rrf").desc, col("doc_id"))
    lex.join(vec, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(rrfK) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("vec_rank")), lit(0.0)), 9))
      .withColumn("fused_rank", row_number().over(wf).cast("long"))
      .filter(col("fused_rank") <= kOut)
      .select(col("query_id"), col("fused_rank"), col("doc_id"),
        col("lex_rank"), col("vec_rank"), col("rrf"))
      .orderBy("query_id", "fused_rank")
  }
}
