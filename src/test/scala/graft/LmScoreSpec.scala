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
