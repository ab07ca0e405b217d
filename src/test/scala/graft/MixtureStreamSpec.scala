package graft

import graft.ext.{MixtureStream, Sampling}
import graft.log.PathIO
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Streaming token-budget mixture admission: stream == the arrival-order
  * window rule on id-ordered arrival, budgets exhaust ACROSS batches,
  * cross-run continuation through the `_mixstate` files, and the state
  * commit's replay/mismatch semantics. */
class MixtureStreamSpec extends SparkSpec {
  import spark.implicits._

  // weights a=0.5 b=0.25 of budget 64 -> needs a=32, b=16; c unweighted.
  // a's budget closes at id 8 (exclusive prior 10+10+10+2 = 32, the
  // strict-< boundary), b's exactly at id 5 (prior 16), c never admits.
  private val corpus = Seq(
    (0L, "a", 10L), (1L, "b", 8L), (2L, "a", 10L), (3L, "b", 8L),
    (4L, "a", 10L), (5L, "b", 8L), (6L, "a", 2L), (7L, "c", 5L),
    (8L, "a", 10L))
  private val weights = Map("a" -> 0.5, "b" -> 0.25)
  private val expectedKept = Set(0L, 1L, 2L, 3L, 4L, 6L)

  private def writeSlice(root: java.nio.file.Path, name: String,
                         rows: Seq[(Long, String, Long)], mtime: Long): Unit = {
    val tmp = java.nio.file.Files.createTempDirectory("mix-slice")
    rows.toDF("doc_id", "lang", "n_tokens").coalesce(1)
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

  private val schema = corpus.toDF("doc_id", "lang", "n_tokens").schema

  private def drain(root: java.nio.file.Path, out: java.nio.file.Path,
                    ckpt: java.nio.file.Path): Unit = {
    val q = MixtureStream.run(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "*.parquet").parquet(root.toString),
      out.toString, ckpt.toString, weights, budgetTokens = 64L,
      tokensCol = "n_tokens", strataCol = "lang", bucketWidth = 2L)
    try q.processAllAvailable() finally q.stop()
  }

  private def kept(out: java.nio.file.Path): Set[Long] =
    spark.read.parquet(out.toString).select("doc_id")
      .as[Long].collect().toSet

  test("budgets exhaust across batches; unweighted stratum refused; state prunes to 2") {
    val root = java.nio.file.Files.createTempDirectory("mix-root")
    val out = java.nio.file.Files.createTempDirectory("mix-out")
    val ckpt = java.nio.file.Files.createTempDirectory("mix-ckpt")
    val base = System.currentTimeMillis() - 10000L
    writeSlice(root, "slice_00.parquet", corpus.filter(_._1 <= 3L), base)
    writeSlice(root, "slice_01.parquet",
      corpus.filter(r => r._1 > 3L && r._1 <= 6L), base + 2000L)
    writeSlice(root, "slice_02.parquet", corpus.filter(_._1 > 6L), base + 4000L)
    drain(root, out, ckpt)
    assert(kept(out) == expectedKept, kept(out).toString)
    // state chain bounded: at most the last two entries survive
    val states = PathIO.listDir(PathIO.path(out.toString)).map(_.getName)
      .filter(_.startsWith("_mixstate-"))
    assert(states.toSet == Set("_mixstate-1", "_mixstate-2"), states.toString)
    // final totals are per-stratum SEEN sums for weighted strata only,
    // FROZEN at closure: batch 2 finds both budgets closed in the prior
    // state, skips its jobs, and re-commits the prior totals
    val content = PathIO.readString(PathIO.path(out.toString, "_mixstate-2"))
    assert(content == "a\t32\nb\t24", s"'$content'")
    // ...and the closed batch writes NO empty epoch dir
    val epochDirs = PathIO.listDir(PathIO.path(out.toString)).map(_.getName)
      .filter(_.startsWith("epoch=")).toSet
    assert(epochDirs == Set("epoch=0", "epoch=1"), epochDirs.toString)
  }

  test("stream == the batch arrival-order boundary rule on a wider corpus") {
    val rng = new scala.util.Random(7)
    val wide = (0L until 200L).map(i =>
      (i, Seq("a", "b", "c")(rng.nextInt(3)), rng.nextInt(20).toLong))
    val root = java.nio.file.Files.createTempDirectory("mixw-root")
    val out = java.nio.file.Files.createTempDirectory("mixw-out")
    val ckpt = java.nio.file.Files.createTempDirectory("mixw-ckpt")
    val base = System.currentTimeMillis() - 10000L
    writeSlice(root, "slice_00.parquet", wide.filter(_._1 < 70L), base)
    writeSlice(root, "slice_01.parquet",
      wide.filter(r => r._1 >= 70L && r._1 < 140L), base + 2000L)
    writeSlice(root, "slice_02.parquet", wide.filter(_._1 >= 140L), base + 4000L)
    val q = MixtureStream.run(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "*.parquet").parquet(root.toString),
      out.toString, ckpt.toString, Map("a" -> 0.5, "b" -> 0.125),
      budgetTokens = 800L, tokensCol = "n_tokens", strataCol = "lang",
      bucketWidth = 16L)
    try q.processAllAvailable() finally q.stop()
    val w = Window.partitionBy("lang").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val expected = wide.toDF("doc_id", "lang", "n_tokens")
      .withColumn("prior", coalesce(sum("n_tokens").over(w), lit(0L)))
      .withColumn("need", when(col("lang") === "a", lit(400L))
        .when(col("lang") === "b", lit(100L)).otherwise(lit(0L)))
      .filter(col("prior") < col("need"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept(out) == expected)
    // and the stream's boundary is the batch operator's fractional rule:
    // per-stratum admitted tokens land within one doc of the need
    val admitted = spark.read.parquet(out.toString).groupBy("lang")
      .agg(sum("n_tokens")).as[(String, Long)].collect().toMap
    assert(math.abs(admitted("a") - 400L) < 20L, admitted.toString)
    assert(math.abs(admitted("b") - 100L) < 20L, admitted.toString)
  }

  test("cross-RUN continuation: a second run on the same checkpoint resumes the budgets") {
    val root = java.nio.file.Files.createTempDirectory("mixc-root")
    val out = java.nio.file.Files.createTempDirectory("mixc-out")
    val ckpt = java.nio.file.Files.createTempDirectory("mixc-ckpt")
    val base = System.currentTimeMillis() - 10000L
    writeSlice(root, "slice_00.parquet", corpus.filter(_._1 <= 3L), base)
    drain(root, out, ckpt)
    assert(kept(out) == Set(0L, 1L, 2L, 3L))
    writeSlice(root, "slice_01.parquet",
      corpus.filter(r => r._1 > 3L && r._1 <= 6L), base + 2000L)
    writeSlice(root, "slice_02.parquet", corpus.filter(_._1 > 6L), base + 4000L)
    drain(root, out, ckpt)
    assert(kept(out) == expectedKept, kept(out).toString)
  }

  test("state commit: byte-identical replay tolerated, divergence loud, names parse loud") {
    val out = java.nio.file.Files.createTempDirectory("mixs-out")
    MixtureStream.commitTotals(out.toString, 0L, Map("a" -> 10L, "b" -> 5L))
    // replay recomputes the identical totals -> tolerated
    MixtureStream.commitTotals(out.toString, 0L, Map("a" -> 10L, "b" -> 5L))
    // divergence means a second writer -> loud
    val e = intercept[RuntimeException] {
      MixtureStream.commitTotals(out.toString, 0L, Map("a" -> 11L, "b" -> 5L))
    }
    assert(e.getMessage.contains("diverges"))
    assert(MixtureStream.priorTotals(out.toString, 1L) ==
      Map("a" -> 10L, "b" -> 5L))
    assert(MixtureStream.priorTotals(out.toString, 0L) == Map.empty)
    // a stratum name surviving URL-encoding round-trips tabs/newlines
    MixtureStream.commitTotals(out.toString, 1L, Map("x y\tz" -> 3L))
    assert(MixtureStream.priorTotals(out.toString, 2L) == Map("x y\tz" -> 3L))
    // unrecognized state file name is corruption, not a skip
    PathIO.atomicCreate(PathIO.path(out.toString, "_mixstate-bogus"),
      "1".getBytes("UTF-8"))
    intercept[IllegalArgumentException] {
      MixtureStream.priorTotals(out.toString, 5L)
    }: Unit
  }

  test("crash leftovers of the state commit are skipped on read and pruned later") {
    val out = java.nio.file.Files.createTempDirectory("mixt-out")
    MixtureStream.commitTotals(out.toString, 0L, Map("a" -> 7L))
    // a driver kill between atomicCreate's tmp write and its finally-
    // delete strands a '<name>.tmp.<uuid>' sibling; a strict name
    // parser would then refuse every later batch forever
    PathIO.atomicCreate(
      PathIO.path(out.toString, "_mixstate-0.tmp.deadbeef"),
      "garbage".getBytes("UTF-8"))
    assert(MixtureStream.priorTotals(out.toString, 1L) == Map("a" -> 7L))
    MixtureStream.commitTotals(out.toString, 1L, Map("a" -> 9L))
    MixtureStream.commitTotals(out.toString, 2L, Map("a" -> 9L))
    // the epoch-0 leftover left the replay window with epoch 0 itself
    val names = PathIO.listDir(PathIO.path(out.toString)).map(_.getName)
      .filter(_.startsWith("_mixstate-")).toSet
    assert(names == Set("_mixstate-1", "_mixstate-2"), names.toString)
    // genuinely unrecognized names stay loud
    PathIO.atomicCreate(PathIO.path(out.toString, "_mixstate-3x"),
      "1".getBytes("UTF-8"))
    intercept[IllegalArgumentException] {
      MixtureStream.priorTotals(out.toString, 9L)
    }: Unit
  }

  test("a batch of only-closed-strata rows writes no empty epoch dir while another stratum stays open") {
    // needs: a=32, b=16. Slice 0 closes a exactly (16+16); slice 1
    // carries ONLY a-rows — weighted, but its stratum is closed while b
    // stays open, so nothing admits and no epoch=1 dir may appear;
    // slice 2 opens b's admissions.
    val rows = Seq(
      (0L, "a", 16L), (1L, "a", 16L), // slice 0
      (2L, "a", 10L),                 // slice 1: weighted but closed
      (3L, "b", 16L))                 // slice 2
    val root = java.nio.file.Files.createTempDirectory("mixe-root")
    val out = java.nio.file.Files.createTempDirectory("mixe-out")
    val ckpt = java.nio.file.Files.createTempDirectory("mixe-ckpt")
    val base = System.currentTimeMillis() - 10000L
    writeSlice(root, "slice_00.parquet", rows.filter(_._1 <= 1L), base)
    writeSlice(root, "slice_01.parquet", rows.filter(_._1 == 2L), base + 2000L)
    writeSlice(root, "slice_02.parquet", rows.filter(_._1 == 3L), base + 4000L)
    drain(root, out, ckpt)
    assert(kept(out) == Set(0L, 1L, 3L), kept(out).toString)
    val epochDirs = PathIO.listDir(PathIO.path(out.toString)).map(_.getName)
      .filter(_.startsWith("epoch=")).toSet
    assert(epochDirs == Set("epoch=0", "epoch=2"), epochDirs.toString)
    // totals still advanced past the skipped batch (seen, not admitted)
    assert(MixtureStream.priorTotals(out.toString, 3L) ==
      Map("a" -> 42L, "b" -> 16L))
  }

  test("tokenMixture whole-pass + remainder copy counts on a one-doc-per-stratum fixture") {
    // one doc per stratum: need/avail arithmetic is hand-checkable, and
    // the remainder prefix (prior 0 < rem) reduces to rem > 0
    val d = Seq((0L, "a", 10L), (1L, "b", 6L)).toDF("doc_id", "lang", "n_tokens")
    val batch = Sampling.tokenMixture(d, "lang", weights, 64L, "n_tokens")
      .select("doc_id").as[Long].collect().toSet
    assert(batch == Set(0L, 1L)) // need a=32>=10 full=3; need b=16 full=2
    val copies = Sampling.tokenMixture(d, "lang", weights, 64L, "n_tokens")
      .select("doc_id", "n_copies").as[(Long, Long)].collect().toMap
    assert(copies == Map(0L -> 4L, 1L -> 3L), copies.toString)
  }
}
