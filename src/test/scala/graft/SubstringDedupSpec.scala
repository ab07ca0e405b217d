package graft

import graft.ext.TextOps
import org.apache.spark.sql.functions._
import scala.util.Random

/** Lee-style overlapping-window exact-substring dedup: coverage at any
  * alignment, first-occurrence survival, and equivalence with a naive
  * in-memory implementation. */
class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], k: Int): Map[Long, (Long, Long, String)] =
    TextOps.dedupSubstrings(docs.toDF("doc_id", "text"), k)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("a duplicated passage is removed at any alignment; edges survive") {
    // doc1 repeats doc0's "a b c d" passage shifted by one token:
    // dup windows "a b c"@1 and "b c d"@2 cover positions 1..4
    val out = run(Seq((0L, "a b c d e f"), (1L, "x a b c d y")), k = 3)
    assert(out(0L) === ((6L, 0L, "a b c d e f")))
    assert(out(1L) === ((2L, 4L, "x y")))
  }

  test("documents shorter than k pass through whole") {
    val out = run(Seq((0L, "a b c d e"), (1L, "a b")), k = 3)
    assert(out(1L) === ((2L, 0L, "a b")))
  }

  test("intra-document repetition collapses to the first period") {
    // windows: pq@0, qp@1 first; every later window is a dup covering
    // positions 2..7 -> only "p q" survives
    val out = run(Seq((0L, "p q p q p q p q")), k = 2)
    assert(out(0L) === ((2L, 6L, "p q")))
  }

  private def naive(docs: Seq[(Long, String)], k: Int): Map[Long, (Long, Long, String)] = {
    val seen = scala.collection.mutable.HashSet[String]()
    val out = scala.collection.mutable.Map[Long, (Long, Long, String)]()
    docs.sortBy(_._1).foreach { case (id, text) =>
      val toks = text.split(" ")
      val covered = new Array[Boolean](toks.length)
      toks.indices.dropRight(k - 1).foreach { i =>
        val win = toks.slice(i, i + k).mkString(" ")
        if (!seen.add(win)) (i until i + k).foreach(covered(_) = true)
      }
      val kept = toks.indices.filterNot(covered).map(toks)
      if (kept.nonEmpty)
        out(id) = (kept.size.toLong, (toks.length - kept.size).toLong, kept.mkString(" "))
    }
    out.toMap
  }

  test("matches the naive scan on a random corpus with planted passages") {
    val rnd = new Random(17)
    val vocab = Array("aa", "bb", "cc", "dd", "ee", "ff")
    def fresh(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(vocab.length)))
    // plant a shared passage into a third of the docs at random offsets
    val passage = Seq("p1", "p2", "p3", "p4", "p5", "p6")
    val docs = Seq.tabulate(30) { i =>
      val body =
        if (i % 3 == 0) fresh(rnd.nextInt(6) + 3) ++ passage ++ fresh(rnd.nextInt(6) + 3)
        else fresh(12 + rnd.nextInt(8))
      (i.toLong, body.mkString(" "))
    }
    assert(run(docs, 4) === naive(docs, 4))
  }

  test("registered substring_dedup query is plannable at sf0.001") {
    val out = SparkEntry.queries("substring_dedup")(spark, "/root/testdata/sf0.001")
    assert(out.count() > 400)
  }
}
