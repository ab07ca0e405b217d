package graft

import graft.ext.{AssembleStream, MixtureStream, Sampling, SeqPackStream}
import graft.log.PathIO
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Composed mixture → sequence-pack stream: the span map over the
  * stream equals budget admission followed by batch packing of the
  * admitted corpus, budgets and the pack offset both carry across
  * batches, and a crash replay (deleted stream commit) changes
  * nothing. */
class AssembleStreamSpec extends SparkSpec {
  import spark.implicits._

  // weights a=0.5 b=0.25 of budget 64 -> needs a=32, b=16; c unweighted.
  // Admitted (arrival boundary): a ids 0,2,4,6; b ids 1,3. Their
  // concatenated token stream (id order: 10,8,10,8,10,2 = 48 tokens)
  // packs into seqLen=16 sequences 0-2.
  private val corpus = Seq(
    (0L, "a", 10L), (1L, "b", 8L), (2L, "a", 10L), (3L, "b", 8L),
    (4L, "a", 10L), (5L, "b", 8L), (6L, "a", 2L), (7L, "c", 5L),
    (8L, "a", 10L))
  private val weights = Map("a" -> 0.5, "b" -> 0.25)

  private def writeSliceDf(root: java.nio.file.Path, name: String,
                           df: org.apache.spark.sql.DataFrame,
                           mtime: Long): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("asm-slice")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
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

  private def writeSlice(root: java.nio.file.Path, name: String,
                         rows: Seq[(Long, String, Long)], mtime: Long): Unit =
    writeSliceDf(root, name, rows.toDF("doc_id", "lang", "n_tokens"), mtime)

  private val schema = corpus.toDF("doc_id", "lang", "n_tokens").schema

  private def drain(root: java.nio.file.Path, out: java.nio.file.Path,
                    ckpt: java.nio.file.Path): Unit = {
    val q = AssembleStream.run(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "*.parquet").parquet(root.toString),
      out.toString, ckpt.toString, weights, budgetTokens = 64L,
      seqLen = 16L, tokensCol = "n_tokens", strataCol = "lang",
      bucketWidth = 2L)
    try q.processAllAvailable() finally q.stop()
  }

  private def spans(out: java.nio.file.Path): Set[(Long, Long, Long, Long, Long)] =
    spark.read.parquet(out.toString)
      .select("doc_id", "seq_id", "tok_start", "tok_end", "seq_off")
      .as[(Long, Long, Long, Long, Long)].collect().toSet

  /** The composition stated directly: arrival-boundary admission, then
    * the batch packer over the admitted corpus. */
  private def expected(rows: Seq[(Long, String, Long)])
      : Set[(Long, Long, Long, Long, Long)] = {
    val d = rows.toDF("doc_id", "lang", "n_tokens")
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val needCol = weights.toSeq.sortBy(_._1).foldLeft(lit(0L)) {
      case (acc, (s, wt)) => when(col("lang") === s,
        lit(math.floor(wt * 64L).toLong)).otherwise(acc)
    }
    val admitted = d
      .withColumn("prior", coalesce(sum("n_tokens").over(w), lit(0L)))
      .filter(col("prior") < needCol)
      .select("doc_id", "n_tokens")
    Sampling.packSequences(admitted, 16L, "n_tokens", bucketWidth = 2L)
      .select("doc_id", "seq_id", "tok_start", "tok_end", "seq_off")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
  }

  private def slices(root: java.nio.file.Path): Unit = {
    val base = System.currentTimeMillis() - 10000L
    writeSlice(root, "slice_00.parquet", corpus.filter(_._1 <= 3L), base)
    writeSlice(root, "slice_01.parquet",
      corpus.filter(r => r._1 > 3L && r._1 <= 6L), base + 2000L)
    writeSlice(root, "slice_02.parquet", corpus.filter(_._1 > 6L), base + 4000L)
  }

  test("stream spans == admission then batch packing; both state chains carry and prune") {
    val root = java.nio.file.Files.createTempDirectory("asm-root")
    val out = java.nio.file.Files.createTempDirectory("asm-out")
    val ckpt = java.nio.file.Files.createTempDirectory("asm-ckpt")
    slices(root)
    drain(root, out, ckpt)
    assert(spans(out) == expected(corpus), spans(out).toString)
    // offset chain advanced by ADMITTED tokens only (48, not 71 seen)
    assert(SeqPackStream.priorOffset(out.toString, 99L) == 48L)
    // totals chain froze at closure (batch 2 found both budgets shut)
    assert(MixtureStream.priorTotals(out.toString, 99L) ==
      Map("a" -> 32L, "b" -> 24L))
    // both chains prune to two entries; closed batch wrote no epoch dir
    val names = PathIO.listDir(PathIO.path(out.toString)).map(_.getName)
    assert(names.count(_.startsWith("_mixstate-")) == 2, names.toString)
    assert(names.count(_.startsWith("_offset-")) == 2, names.toString)
    assert(names.filter(_.startsWith("epoch=")).toSet ==
      Set("epoch=0", "epoch=1"), names.toString)
  }

  test("cross-RUN continuation: the second run packs where the first run's admissions ended") {
    val root = java.nio.file.Files.createTempDirectory("asm2-root")
    val out = java.nio.file.Files.createTempDirectory("asm2-out")
    val ckpt = java.nio.file.Files.createTempDirectory("asm2-ckpt")
    val base = System.currentTimeMillis() - 10000L
    writeSlice(root, "slice_00.parquet", corpus.filter(_._1 <= 3L), base)
    drain(root, out, ckpt)
    assert(spans(out) == expected(corpus.filter(_._1 <= 3L)))
    writeSlice(root, "slice_01.parquet",
      corpus.filter(r => r._1 > 3L && r._1 <= 6L), base + 2000L)
    writeSlice(root, "slice_02.parquet", corpus.filter(_._1 > 6L), base + 4000L)
    drain(root, out, ckpt)
    assert(spans(out) == expected(corpus))
  }

  test("chained production path: clean-corpus stream output feeds the assembly stream") {
    import graft.ext.CleanCorpusStream
    // dirty corpus: unique 12-token docs (kept) + an exact dup, a
    // quality casualty, and a near-dup casualty per lang block
    def doc(i: Long) = (0 until 12).map(w => s"u${i}w$w").mkString(" ")
    val dirty = Seq(
      (0L, doc(0), "en"), (1L, doc(0), "en"), // 1 exact-dup of 0
      (2L, "too short", "en"), // quality casualty
      (3L, doc(3), "en"), (4L, doc(3).replace("w11", "x11"), "en"), // 4 near-dups 3
      (5L, doc(5), "de"), (6L, doc(6), "de"), (7L, doc(7), "en"),
      (8L, doc(8), "de"), (9L, doc(9), "en"))
    val root = java.nio.file.Files.createTempDirectory("chain-root")
    val cleanIdx = java.nio.file.Files.createTempDirectory("chain-idx")
    val cleanOut = java.nio.file.Files.createTempDirectory("chain-cout")
    val cleanCkpt = java.nio.file.Files.createTempDirectory("chain-cckpt")
    val dirtyDf = dirty.toDF("doc_id", "text", "lang")
    Seq(dirty.filter(_._1 <= 4L), dirty.filter(_._1 > 4L))
      .zipWithIndex.foreach { case (rows, i) =>
        writeSliceDf(root, f"slice_$i%02d.parquet",
          rows.toDF("doc_id", "text", "lang"),
          System.currentTimeMillis() - 10000L + i * 2000L)
      }
    val q1 = CleanCorpusStream.run(
      spark.readStream.schema(dirtyDf.schema).option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "*.parquet").parquet(root.toString),
      cleanIdx.toString, cleanOut.toString, cleanCkpt.toString,
      threshold = 0.8)
    try q1.processAllAvailable() finally q1.stop()
    val cleaned = spark.read.parquet(cleanOut.toString)
    assert(cleaned.select("doc_id").as[Long].collect().toSet ==
      Set(0L, 3L, 5L, 6L, 7L, 8L, 9L), "cleaning fixture drifted")
    // chain: the assembly stream CONSUMES the cleaner's epoch dirs (one
    // availableNow batch — within-batch admission is id-ordered by
    // construction, so arrival order is the id order the oracle states)
    val out = java.nio.file.Files.createTempDirectory("chain-aout")
    val ckpt = java.nio.file.Files.createTempDirectory("chain-ackpt")
    val q2 = AssembleStream.run(
      spark.readStream.schema(dirtyDf.schema)
        .option("pathGlobFilter", "*.parquet")
        .parquet(s"$cleanOut/epoch=*")
        .withColumn("n_tokens",
          size(split(col("text"), " ")).cast("long")),
      out.toString, ckpt.toString, Map("en" -> 0.5, "de" -> 0.25),
      budgetTokens = 64L, seqLen = 16L, tokensCol = "n_tokens",
      strataCol = "lang", bucketWidth = 4L)
    try q2.processAllAvailable() finally q2.stop()
    // expected: admission boundary then batch packing over the CLEANED
    // corpus (needs: en 32, de 16; every kept doc is 12 tokens -> en
    // admits 0,3,7 at priors 0/12/24; de admits 5,6 at priors 0/12;
    // en 9 and de 8 arrive past their boundaries)
    val cleanedTok = cleaned
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val admitted = cleanedTok
      .withColumn("prior", coalesce(sum("n_tokens").over(w), lit(0L)))
      .filter(col("prior") < when(col("lang") === "en", 32L)
        .when(col("lang") === "de", 16L).otherwise(0L))
      .select("doc_id", "n_tokens")
    val expectedSpans = Sampling
      .packSequences(admitted, 16L, "n_tokens", bucketWidth = 4L)
      .select("doc_id", "seq_id", "tok_start", "tok_end", "seq_off")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(spans(out) == expectedSpans, spans(out).toString)
    // the dropped dirty docs never reached the packer
    assert(!spans(out).exists(s => Set(1L, 2L, 4L).contains(s._1)))
  }

  test("crash replay: deleting the last stream commit and restarting changes nothing") {
    val root = java.nio.file.Files.createTempDirectory("asm3-root")
    val out = java.nio.file.Files.createTempDirectory("asm3-out")
    val ckpt = java.nio.file.Files.createTempDirectory("asm3-ckpt")
    slices(root)
    drain(root, out, ckpt)
    val before = spans(out)
    java.nio.file.Files.deleteIfExists(ckpt.resolve("commits").resolve("2"))
    java.nio.file.Files.deleteIfExists(ckpt.resolve("commits").resolve(".2.crc"))
    drain(root, out, ckpt)
    assert(spans(out) == before)
    assert(SeqPackStream.priorOffset(out.toString, 99L) == 48L)
  }
}
