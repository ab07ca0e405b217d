package graft

import graft.ext.TextOps
import org.apache.spark.sql.functions._

/** Gopher A1.1 quality signals: hand-computed fixtures for every rule,
  * including the line-based signals (bullets, ellipses, duplicate lines)
  * the synthetic corpus cannot exercise. NB tokens() splits on single
  * spaces only, so words adjacent to a newline fuse into one token —
  * fixtures account for that. */
class GopherQualitySpec extends SparkSpec {
  import spark.implicits._

  private def signals(text: String): Map[String, Any] = {
    val row = TextOps.withGopherSignals(Seq((0L, text)).toDF("doc_id", "text"))
      .drop("doc_id", "text").collect().head
    row.schema.fieldNames.zip(row.toSeq).toMap
  }

  test("duplicate-line signals count repeats by line and by chars") {
    // lines: "ab cd e" x2 (7 chars each) + "x y z" (5 chars)
    val s = signals("ab cd e\nab cd e\nx y z")
    assert(s("n_lines") === 3L)
    assert(s("dup_line_frac") === 1.0 / 3)
    assert(s("dup_line_char_frac") === 7.0 / 19)
  }

  test("top n-gram char coverage: count x length over doc chars") {
    // tokens [ab,cd,ab,cd,x]; 13 chars. "ab cd" (5 chars) occurs twice ->
    // 10/13; all trigrams distinct, longest is 8 chars -> 8/13
    val s = signals("ab cd ab cd x")
    assert(s("top2gram_char_frac") === 10.0 / 13)
    assert(s("top3gram_char_frac") === 8.0 / 13)
  }

  test("format signals: bullets, ellipses, symbols, alpha words, stops") {
    val s = signals("- item one...\n- item two\nthe total of 42 is ok...")
    assert(s("bullet_line_frac") === 2.0 / 3)
    assert(s("ellipsis_line_frac") === 2.0 / 3)
    // space-split tokens: ["-","item","one...\n-","item","two\nthe",
    // "total","of","42","is","ok..."]
    assert(s("n_tokens") === 10L)
    assert(s("symbol_ratio") === 2.0 / 10) // two '...' occurrences, no '#'
    assert(s("alpha_word_frac") === 8.0 / 10) // "-" and "42" lack alpha
    assert(s("stop_hits") === 1L) // only "of" survives as its own token
  }

  test("gopher_ok: a clean 60-word doc passes; a degenerate one fails") {
    val clean = (1 to 50).map(i => s"word$i").mkString(" ") +
      " the be to of and that have with is ok"
    val sc = signals(clean)
    assert(sc("n_tokens") === 60L)
    assert(sc("stop_hits") === 8L)
    assert(sc("gopher_ok") === true)
    // same token count but one bigram dominates -> repetition rules trip
    val degenerate = ("spam ham " * 30).trim
    val sd = signals(degenerate)
    assert(sd("gopher_ok") === false)
    assert(sd("top2gram_char_frac").asInstanceOf[Double] > 0.2)
  }

  test("edge: single token, no n-grams, single line") {
    val s = signals("hello")
    assert(s("n_tokens") === 1L)
    assert(s("mean_word_len") === 5.0)
    assert(s("top2gram_char_frac") === 0.0)
    assert(s("top4gram_char_frac") === 0.0)
    assert(s("dup_line_frac") === 0.0)
    assert(s("gopher_ok") === false) // < 50 words
  }

  test("ngram_coverage reachable from SQL and equals the column API") {
    graft.functions.Registry.registerAll(spark)
    val viaSql = spark.sql(
      "SELECT ngram_coverage('ab cd ab cd x', 2) AS c").as[Long].head()
    assert(viaSql === 10L) // "ab cd" twice x 5 chars
    val viaCol = Seq("ab cd ab cd x").toDF("t")
      .select(graft.functions.Sketch.ngram_coverage(col("t"), 2)).as[Long].head()
    assert(viaCol === viaSql)
  }

  test("registered gopher_quality query is plannable and full-coverage") {
    val out = SparkEntry.queries("gopher_quality")(spark, "/root/testdata/sf0.001")
    assert(out.count() === 500L)
    assert(out.columns.contains("gopher_ok"))
  }
}
