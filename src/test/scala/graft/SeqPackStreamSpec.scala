package graft

import graft.ext.{Sampling, SeqPackStream}
import graft.log.PathIO
import org.apache.spark.sql.functions._

/** Streaming sequence packing: stream == batch on id-ordered arrival,
  * cross-run continuation through the persisted `_offset` state, and
  * the offset commit's replay/mismatch semantics. */
class SeqPackStreamSpec extends SparkSpec {
  import spark.implicits._

  // token counts chosen to cross seqLen=16 boundaries within AND
  // between slices (12+9 spans seqs 0-1; zero-token doc 4 is silent)
  private val corpus = Seq(
    (0L, 12L), (1L, 9L), (2L, 20L), (3L, 5L), (4L, 0L),
    (5L, 16L), (6L, 3L), (7L, 31L), (8L, 7L))

  private def writeSlice(root: java.nio.file.Path, name: String,
                         rows: Seq[(Long, Long)], mtime: Long): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("sp-slice")
    rows.toDF("doc_id", "n_tokens").coalesce(1)
      .write.mode("overwrite").parquet(tmp.toString)
    import scala.jdk.CollectionConverters._
    val part = {
      val l = java.nio.file.Files.list(tmp)
      try l.iterator().asScala.find(_.toString.endsWith(".parquet")).get
      finally l.close()
    }
    val dst = root.resolve(name)
    java.nio.file.Files.move(part, dst)
    java.nio.file.Files.setLastModifiedTime(dst,
      java.nio.file.attribute.FileTime.fromMillis(mtime)): Unit
  }

  private val schema = corpus.toDF("doc_id", "n_tokens").schema

  private def drain(root: java.nio.file.Path, out: java.nio.file.Path,
                    ckpt: java.nio.file.Path): Unit = {
    val q = SeqPackStream.run(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "*.parquet").parquet(root.toString),
      out.toString, ckpt.toString, seqLen = 16L, tokensCol = "n_tokens",
      bucketWidth = 2L)
    try q.processAllAvailable() finally q.stop()
  }

  private def spans(path: String): Set[(Long, Long, Long, Long, Long)] =
    spark.read.parquet(path)
      .select("doc_id", "seq_id", "tok_start", "tok_end", "seq_off")
      .as[(Long, Long, Long, Long, Long)].collect().toSet

  private def batchSpans: Set[(Long, Long, Long, Long, Long)] =
    Sampling.packSequences(corpus.toDF("doc_id", "n_tokens"), 16L,
        "n_tokens", bucketWidth = 2L)
      .select("doc_id", "seq_id", "tok_start", "tok_end", "seq_off")
      .as[(Long, Long, Long, Long, Long)].collect().toSet

  test("stream over id-range slices == batch packSequences; offset state prunes to 2") {
    val root = java.nio.file.Files.createTempDirectory("sp-root")
    val out = java.nio.file.Files.createTempDirectory("sp-out")
    val ckpt = java.nio.file.Files.createTempDirectory("sp-ckpt")
    val base = System.currentTimeMillis() - 10000L
    writeSlice(root, "slice_00.parquet", corpus.filter(_._1 <= 2L), base)
    writeSlice(root, "slice_01.parquet",
      corpus.filter(r => r._1 > 2L && r._1 <= 5L), base + 2000L)
    writeSlice(root, "slice_02.parquet", corpus.filter(_._1 > 5L), base + 4000L)
    drain(root, out, ckpt)
    assert(spans(out.toString) == batchSpans,
      "streamed span map diverges from the batch operator")
    // state chain bounded: at most the last two offsets survive
    val offsets = PathIO.listDir(PathIO.path(out.toString)).map(_.getName)
      .filter(_.startsWith("_offset-"))
    assert(offsets.toSet == Set("_offset-1", "_offset-2"), offsets.toString)
    // the final offset is the corpus token total
    assert(PathIO.readString(
      PathIO.path(out.toString, "_offset-2")).trim.toLong ==
      corpus.map(_._2).sum)
  }

  test("cross-RUN continuation: a second query on the same checkpoint packs where the first ended") {
    val root = java.nio.file.Files.createTempDirectory("sp2-root")
    val out = java.nio.file.Files.createTempDirectory("sp2-out")
    val ckpt = java.nio.file.Files.createTempDirectory("sp2-ckpt")
    val base = System.currentTimeMillis() - 10000L
    writeSlice(root, "slice_00.parquet", corpus.filter(_._1 <= 4L), base)
    drain(root, out, ckpt) // run 1: first slice only, then the query stops
    writeSlice(root, "slice_01.parquet", corpus.filter(_._1 > 4L), base + 2000L)
    drain(root, out, ckpt) // run 2: same checkpoint + output
    assert(spans(out.toString) == batchSpans,
      "continuation across query restarts diverges from the batch operator")
  }

  test("offset commit: identical replay tolerated, divergent content fails loudly") {
    val out = java.nio.file.Files.createTempDirectory("sp3-out").toString
    SeqPackStream.commitOffset(out, 0L, 41L)
    SeqPackStream.commitOffset(out, 0L, 41L) // replay: same content, fine
    val e = intercept[RuntimeException] {
      SeqPackStream.commitOffset(out, 0L, 42L)
    }
    assert(e.getMessage.contains("second writer"), e.getMessage)
    // prior reads strictly below the epoch: a replayed batch never
    // sees its own stale commit
    assert(SeqPackStream.priorOffset(out, 0L) == 0L)
    assert(SeqPackStream.priorOffset(out, 1L) == 41L)
    // unrecognized state names are corruption, not something to skip
    PathIO.atomicCreate(PathIO.path(out, "_offset-x7"), "9".getBytes("UTF-8"))
    intercept[IllegalArgumentException] {
      SeqPackStream.priorOffset(out, 1L)
    }
  }
}
