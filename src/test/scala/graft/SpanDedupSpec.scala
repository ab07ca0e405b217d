package graft

import graft.ext.TextOps
import org.apache.spark.sql.functions._
import scala.util.Random

/** C4-style global span dedup: first-occurrence survival, reassembly,
  * and equivalence with a naive in-memory implementation. */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  test("first corpus occurrence survives; docs reassemble in span order") {
    val docs = Seq(
      (0L, "a b c d e f g h i j"),        // spans: [a..e], [f..j]
      (1L, "a b c d e x y z w v"),        // first span duplicates doc0's
      (2L, "f g h i j")                   // whole doc duplicates doc0's 2nd span
    ).toDF("doc_id", "text")
    val out = TextOps.dedupSpans(docs, spanWords = 5)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect()
    assert(out.toSeq === Seq(
      (0L, 2L, 0L, "a b c d e f g h i j"),
      (1L, 1L, 1L, "x y z w v")))         // doc2 lost everything -> absent
  }

  test("short tail span dedups as its own unit") {
    val docs = Seq(
      (0L, "p q r s t u v"),              // spans: [p..t], [u v]
      (1L, "u v")                         // equals doc0's tail span
    ).toDF("doc_id", "text")
    val out = TextOps.dedupSpans(docs, spanWords = 5)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect()
    assert(out.toSeq === Seq((0L, 2L, 0L, "p q r s t u v")))
  }

  private def naive(docs: Seq[(Long, String)], k: Int): Map[Long, (Long, Long, String)] = {
    val seen = scala.collection.mutable.HashSet[String]()
    val out = scala.collection.mutable.Map[Long, (Long, Long, String)]()
    docs.sortBy(_._1).foreach { case (id, text) =>
      val spans = text.split(" ").grouped(k).map(_.mkString(" ")).toSeq
      val kept = spans.filter(s => seen.add(s))
      if (kept.nonEmpty)
        out(id) = (kept.size.toLong, (spans.size - kept.size).toLong, kept.mkString(" "))
    }
    out.toMap
  }

  test("matches the naive scan on a random corpus with planted dupes") {
    val rnd = new Random(5)
    val vocab = Array("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val base = Seq.tabulate(40)(i =>
      (i.toLong, Seq.fill(10 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.length))).mkString(" ")))
    val got = TextOps.dedupSpans(base.toDF("doc_id", "text"), spanWords = 3)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val want = naive(base, 3)
    assert(got === want)
  }
}
