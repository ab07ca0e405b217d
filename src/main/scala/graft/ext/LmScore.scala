package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * CCNet-style language-model quality bucketing (Wenzek et al. 2020,
 * arXiv:1911.00359): score every document by the perplexity of a small
 * language model trained on a high-quality reference slice, then split
 * each language into head / middle / tail perplexity terciles — the
 * standard pre-training corpus triage (CCNet trains per-language KenLM
 * models on Wikipedia; the head tercile is what most LLM pipelines keep).
 *
 * The model here is a per-language character-trigram LM with +1
 * (Laplace) smoothing — no external model artifact, so training,
 * scoring and bucketing are all replayable in the DuckDB oracle:
 *
 *   P(c₃ | c₁c₂) = (count₃(c₁c₂c₃) + 1) / (count₂(c₁c₂) + V)
 *
 * with counts from the reference slice and V = |distinct chars| of the
 * reference slice per language. A document's score is the mean log10
 * trigram probability over its `length-2` positions (its negated value
 * is log10-perplexity, so ORDER BY score DESC ≡ perplexity ascending).
 * Each position's log10 is rounded to 9 decimals and the per-document
 * sum runs in exact decimals — partitioning- and engine-independent.
 *
 * Scale: the trigram/bigram/vocab model tables are bounded by
 * charset³ per language (broadcast); per-document state is one decimal
 * sum keyed on doc_id. Tercile assignment replays NTILE(3) EXACTLY but
 * without ever sorting a whole language on one reducer (at 100 TB one
 * language is ~half the corpus): (1) aggregate per-(lang, score)
 * counts — bounded by the rounded-to-6 score space, NOT by row count;
 * (2) a window over that small distinct-score table yields cumulative
 * ranks, from which the two boundary cutoffs per language (score value
 * + how many of its id-ordered ties fall in the upper bucket) are
 * derived and BROADCAST; (3) each row gets its bucket from a per-row
 * comparison plus a tie-rank window keyed on (lang, score) — the
 * largest single task is the largest tie class, not the largest
 * language. Result is bit-identical to NTILE(3) OVER (PARTITION BY
 * lang ORDER BY score DESC, id) — the DuckDB oracle keeps the literal
 * NTILE form as the twin. Documents shorter than 3 chars have no
 * trigram positions and are dropped (nothing to score).
 *
 * Returns (doc_id, lang, n_tri, lp_mean_r, bucket) with bucket ∈
 * head | middle | tail per language.
 */
object LmScore {

  /** All overlapping char trigrams of `text` (empty below 3 chars) —
    * the linear-pass native kernel; the declarative transform+substr
    * form it equals is O(len²) per row (see CharNgramsExpr). */
  private def charTrigrams(text: Column): Column =
    graft.functions.Sketch.char_ngrams(text, 3)

  private def chars(text: Column): Column =
    graft.functions.Sketch.char_ngrams(text, 1)

  def ccnetBuckets(docs: DataFrame, isRef: Column,
                   textCol: String = "text", idCol: String = "doc_id",
                   langCol: String = "lang"): DataFrame =
    assignTerciles(score(docs, isRef, textCol, idCol, langCol))
      .select(col("id").as(idCol), col("lang"), col("n_tri"),
        col("lp_mean_r"), col("bucket"))

  /** Model build + per-document scoring (everything before tercile
    * assignment): returns (id, lang, n_tri, lp_mean_r). Split out so
    * the plan-shape gates can assert the broadcast/partial-agg
    * properties of this stage independently of the materialization
    * boundary in [[assignTerciles]]. */
  private[graft] def score(docs: DataFrame, isRef: Column,
                           textCol: String = "text", idCol: String = "doc_id",
                           langCol: String = "lang"): DataFrame = {
    val d = TextOps.ensureParallelism(docs)
    val refDocs = d.filter(isRef)

    // The model build re-explodes the reference slice rather than
    // sharing one checkpointed (doc, trigram) table with the scoring
    // stream: sharing was measured and REJECTED — materializing the
    // per-doc trigram counts (≈ chars-per-doc rows) costs more than the
    // linear-kernel explode it saves (4.3 s vs 2.4 s warm at sf0.1).
    // Both passes are stateless scans, the shape that holds at 100 TB.
    val refTris = refDocs.select(col(langCol).as("lang"),
      explode(charTrigrams(col(textCol))).as("tri"))
    val m3 = refTris.groupBy("lang", "tri").agg(count(lit(1)).as("c3"))
    val m2 = m3.groupBy(col("lang"), substring(col("tri"), 1, 2).as("bi"))
      .agg(sum("c3").as("c2"))
    // V counts chars of ALL reference docs, including the sub-3-char
    // ones the trigram stream excludes
    val vt = refDocs.select(col(langCol).as("lang"),
        explode(chars(col(textCol))).as("ch"))
      .groupBy("lang").agg(countDistinct("ch").as("v"))

    val perDoc = d.select(col(idCol).as("id"), col(langCol).as("lang"),
        explode(charTrigrams(col(textCol))).as("tri"))
      .groupBy("id", "lang", "tri").agg(count(lit(1)).as("c"))

    // a language absent from the reference slice degrades to the
    // uniform Laplace floor (c3=c2=0, V=1): every position scores 0
    val lp = round(log10(
      (coalesce(col("c3"), lit(0L)) + 1).cast("double") /
        (coalesce(col("c2"), lit(0L)) + coalesce(col("v"), lit(1L))).cast("double")), 9)
    perDoc
      .join(broadcast(m3), Seq("lang", "tri"), "left_outer")
      .withColumn("bi", substring(col("tri"), 1, 2))
      .join(broadcast(m2), Seq("lang", "bi"), "left_outer")
      .join(broadcast(vt), Seq("lang"), "left_outer")
      .groupBy("id", "lang")
      .agg(sum(col("c").cast("decimal(10,0)") * lp.cast("decimal(12,9)")).as("lp_sum"),
        sum("c").cast("bigint").as("n_tri"))
      .withColumn("lp_mean_r", round(col("lp_sum").cast("double") / col("n_tri"), 6))
      .select("id", "lang", "n_tri", "lp_mean_r")
  }

  /**
   * Exact NTILE(3) OVER (PARTITION BY lang ORDER BY lp_mean_r DESC, id)
   * without a per-language global sort. A row's rank is
   * `rows-strictly-above-its-score + its-id-rank-within-its-score-class`;
   * the first term comes from a cumulative window over the per-(lang,
   * score) histogram (bounded by the rounded score space), the second
   * from a row_number keyed on (lang, score). NTILE boundaries k1/k2
   * (first ⌈n/3⌉-ish tiles get the remainder, per the SQL spec) are
   * located on the histogram and shipped as a one-row-per-language
   * broadcast: (boundary score, ties of it kept below the boundary).
   *
   * EAGER SIDE EFFECT: the narrow scored table (4 scalar columns/doc) is
   * localCheckpoint-materialized here, because the histogram chain and
   * the tie-rank join would otherwise each recompute the full
   * trigram-scoring lineage (measured 70 s vs 4 s at sf0.1 with the
   * pre-merge five-consumer shape). The same trade as dsirResample:
   * recomputing is expensive, the table is small. Measured cost of skew
   * safety at sf0.1: score-only 2.0 s warm; +1.0 s materialization,
   * +1.1 s assignment (fixed small-job overhead that amortizes away at
   * scale, where the replaced per-language sort instead serializes the
   * dominant language on one reducer).
   */
  private[graft] def assignTerciles(scoredIn: DataFrame): DataFrame = {
    val scored = scoredIn.localCheckpoint()
    val hist = scored.groupBy("lang", "lp_mean_r").agg(count(lit(1)).as("cnt"))
    // cumulative over DISTINCT scores per language — the only lang-keyed
    // sort left, and it runs on the bounded histogram, never on rows
    val wHist = Window.partitionBy("lang").orderBy(col("lp_mean_r").desc)
    // one pass over the histogram: cumulative rank, per-language total
    // (max cumulative), NTILE boundaries, and both cutoffs as
    // conditional aggregates — exactly one histogram row matches each
    // boundary condition per language, so max picks it
    val wLang = Window.partitionBy("lang")
    val j = hist
      .withColumn("upto", sum("cnt").over(wHist))
      .withColumn("above", col("upto") - col("cnt"))
      .withColumn("n", max("upto").over(wLang))
      // NTILE(3) tile sizes: base = n/3, first (n mod 3) tiles get +1
      .withColumn("k1", floor(col("n") / 3) +
        when(col("n") % 3 >= 1, 1).otherwise(0))
      .withColumn("k2", floor(col("n") / 3) * 2 +
        when(col("n") % 3 >= 1, 1).otherwise(0) +
        when(col("n") % 3 >= 2, 1).otherwise(0))
    val cuts = j.groupBy("lang").agg(
        max(when(col("above") < col("k1") && col("k1") <= col("upto"),
          struct(col("lp_mean_r").as("s"),
            (col("k1") - col("above")).as("t")))).as("b1"),
        max(when(col("above") < col("k2") && col("k2") <= col("upto"),
          struct(col("lp_mean_r").as("s"),
            (col("k2") - col("above")).as("t")))).as("b2"))
      .select(col("lang"), col("b1.s").as("s1"), col("b1.t").as("t1"),
        col("b2.s").as("s2"), col("b2.t").as("t2")) // one row per language

    // tie-rank within one (lang, score) class — finer-keyed than lang,
    // so a skewed language still spreads across reducers
    val wTie = Window.partitionBy("lang", "lp_mean_r").orderBy("id")
    // null-safe join: a NULL lang (upstream language-ID misses) forms
    // its own group in the histogram and in SQL's PARTITION BY — an
    // equi-join would silently DROP every null-lang document here
    // (Sampling.packShards uses <=> for exactly this hazard)
    val cutsR = cuts.withColumnRenamed("lang", "lang_c")
    scored.withColumn("tie", row_number().over(wTie))
      .join(broadcast(cutsR), col("lang") <=> col("lang_c"))
      .drop("lang_c")
      .withColumn("bucket",
        when(col("lp_mean_r") > col("s1") ||
          (col("lp_mean_r") === col("s1") && col("tie") <= col("t1")), "head")
          .when(col("lp_mean_r") > col("s2") ||
            (col("lp_mean_r") === col("s2") && col("tie") <= col("t2")), "middle")
          .otherwise("tail"))
  }
}
