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
}
