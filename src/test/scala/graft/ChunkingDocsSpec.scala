package graft

import graft.ext.TextOps
import org.apache.spark.sql.functions._

/** Fixed-size token chunking with overlap: stride coverage, remainder
  * handling, short-doc identity, and naive equivalence. */
class ChunkingDocsSpec extends SparkSpec {
  import spark.implicits._

  private def run(text: String, chunk: Int, overlap: Int): Seq[(Int, Long, String)] =
    TextOps.chunkDocuments(Seq((0L, text)).toDF("doc_id", "text"), chunk, overlap)
      .orderBy("chunk_idx")
      .select(col("chunk_idx"), col("n_chunk_tokens"), col("chunk_text"))
      .as[(Int, Long, String)].collect().toSeq

  test("stride windows with overlap; last chunk is the remainder") {
    // 7 tokens, chunk 4, overlap 2 -> stride 2 -> starts 0,2,4: the
    // last window [4,8) clamps to the remainder
    assert(run("a b c d e f g", 4, 2) === Seq(
      (0, 4L, "a b c d"), (1, 4L, "c d e f"), (2, 3L, "e f g")))
  }

  test("no overlap partitions the doc exactly") {
    assert(run("a b c d e", 2, 0) === Seq(
      (0, 2L, "a b"), (1, 2L, "c d"), (2, 1L, "e")))
  }

  test("doc shorter than one chunk yields itself exactly once") {
    assert(run("a b", 32, 8) === Seq((0, 2L, "a b")))
    // exact-fit doc: one chunk, no phantom second window
    assert(run("a b c", 3, 1) === Seq((0, 3L, "a b c")))
  }

  test("every token covered; consecutive chunks overlap by exactly `overlap`") {
    val rnd = new scala.util.Random(3)
    val toks = Seq.tabulate(50 + rnd.nextInt(50))(i => s"t$i")
    val chunks = run(toks.mkString(" "), 16, 4)
    val stride = 12
    chunks.dropRight(1).zipWithIndex.foreach { case ((idx, n, _), i) =>
      assert(idx === i && n === 16L)
    }
    // reassembling first `stride` tokens of each chunk + the last chunk
    // recovers the document exactly
    val rebuilt = chunks.dropRight(1).map(_._3.split(" ").take(stride)).flatten ++
      chunks.last._3.split(" ")
    assert(rebuilt === toks)
    intercept[IllegalArgumentException] {
      TextOps.chunkDocuments(Seq((0L, "x")).toDF("doc_id", "text"), 4, 4)
    }
  }

  test("registered doc_chunks query is plannable with no shuffle before sort") {
    val q = SparkEntry.queries("doc_chunks")(spark, "/root/testdata/sf0.001")
    assert(q.count() > 500) // multi-chunk docs expand the corpus
    val p = q.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange hashpartitioning"), p.take(500))
  }
}
