package graft

import graft.ext.LmScore
import org.apache.spark.sql.functions._

class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf001/documents.parquet")

  test("ccnetBuckets: in-model text outscores junk; reference text scores best") {
    // one-language corpus: the model trains on repetitive reference text,
    // so a document drawn from the same distribution must beat one made
    // of trigrams the model never saw
    val d = Seq(
      (1L, "the cat sat on the mat the cat sat on the mat", "en", "ref"),
      (2L, "the rat sat on the cat and the mat", "en", "raw"),
      (3L, "zqxj vwpk qzzt xxjv wqpz", "en", "raw")
    ).toDF("doc_id", "text", "lang", "source")
    val out = LmScore.ccnetBuckets(d, col("source") === "ref")
      .select("doc_id", "lp_mean_r").as[(Long, Double)].collect().toMap
    assert(out.size == 3)
    assert(out(1L) > out(2L), "reference text must score highest")
    assert(out(2L) > out(3L), "in-distribution text must beat unseen trigrams")
  }

  test("ccnetBuckets: per-language terciles are balanced and order-consistent") {
    val out = LmScore.ccnetBuckets(docs,
        col("source").isin("src0", "src1", "src2", "src3"))
      .select("doc_id", "lang", "lp_mean_r", "bucket")
      .as[(Long, String, Double, String)].collect()
    assert(out.nonEmpty)
    assert(out.forall(r => Set("head", "middle", "tail")(r._4)))
    for ((_, rows) <- out.groupBy(_._2)) {
      val counts = rows.groupBy(_._4).view.mapValues(_.length).toMap
      val sizes = Seq("head", "middle", "tail").map(counts.getOrElse(_, 0))
      assert(sizes.max - sizes.min <= 1,
        s"terciles must differ by at most 1: $counts")
      // every head score >= every tail score within the language
      val headMin = rows.filter(_._4 == "head").map(_._3).min
      val tailMax = rows.filter(_._4 == "tail").map(_._3).max
      assert(headMin >= tailMax, s"head $headMin below tail $tailMax")
    }
  }

  test("ccnetBuckets: scores and buckets are partitioning-invariant") {
    val ref = col("source").isin("src0", "src1", "src2", "src3")
    val a = LmScore.ccnetBuckets(docs, ref)
    val b = LmScore.ccnetBuckets(docs.repartition(7), ref)
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("assignTerciles ≡ literal NTILE(3), including boundary-splitting ties and tiny languages") {
    import org.apache.spark.sql.expressions.Window
    // ties deliberately straddle tercile boundaries; langs of size
    // 1, 2, 4 exercise the remainder-distribution rule
    val rows = Seq(
      // lang "a": 10 rows, scores with a 4-way tie at the k1 boundary
      (1L, "a", -1.0), (2L, "a", -1.5), (3L, "a", -1.5), (4L, "a", -1.5),
      (5L, "a", -1.5), (6L, "a", -2.0), (7L, "a", -2.0), (8L, "a", -3.0),
      (9L, "a", -3.5), (10L, "a", -4.0),
      // lang "b": all rows one tie class (degenerate)
      (11L, "b", -2.0), (12L, "b", -2.0), (13L, "b", -2.0), (14L, "b", -2.0),
      // tiny languages
      (15L, "c", -1.0),
      (16L, "d", -1.0), (17L, "d", -2.0)
    )
    val scored = rows.toDF("id", "lang", "lp_mean_r")
      .withColumn("n_tri", lit(5L))
    val w = Window.partitionBy("lang").orderBy(col("lp_mean_r").desc, col("id"))
    val expected = scored.withColumn("bucket",
        when(ntile(3).over(w) === 1, "head")
          .when(ntile(3).over(w) === 2, "middle").otherwise("tail"))
      .select("id", "lang", "lp_mean_r", "bucket")
    val actual = LmScore.assignTerciles(scored)
      .select("id", "lang", "lp_mean_r", "bucket")
    assert(actual.except(expected).isEmpty && expected.except(actual).isEmpty,
      s"mismatch:\nactual=${actual.orderBy("id").collect().mkString("\n")}\n" +
        s"expected=${expected.orderBy("id").collect().mkString("\n")}")
  }

  test("ccnetBuckets: a language missing from the reference degrades to the Laplace floor") {
    val d = Seq(
      (1L, "aaa bbb ccc", "en", "ref"),
      (2L, "some unmodeled language text", "xx", "raw"),
      (3L, "other unmodeled words here", "xx", "raw")
    ).toDF("doc_id", "text", "lang", "source")
    val out = LmScore.ccnetBuckets(d, col("source") === "ref")
      .filter(col("lang") === "xx")
      .select("doc_id", "lp_mean_r").as[(Long, Double)].collect().toMap
    // c3=c2=0, V=1 → every position is log10(1/1) = 0
    assert(out.values.forall(_ == 0.0), s"expected zero scores, got $out")
  }
}
