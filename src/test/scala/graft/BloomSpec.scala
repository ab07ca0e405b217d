package graft

import graft.functions.Bloom
import graft.ext.TextOps
import org.apache.spark.sql.functions._
import scala.util.Random

/** Bloom filter: bit math, merge algebra, the no-false-negative
  * guarantee, and the result-neutral decontamination pre-filter. */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives, ever; FP rate in the expected ballpark") {
    val bf = Bloom.empty(1 << 14, 5) // 16k bits, ~1130 items => fp ~2%
    val present = (0 until 1000).map(i => i.toLong)
    present.foreach(Bloom.add(bf, _))
    assert(present.forall(Bloom.contains(bf, _)), "false negative!")
    val absent = (100000 until 120000).map(_.toLong)
    val fp = absent.count(Bloom.contains(bf, _)).toDouble / absent.size
    // theory: (1 - e^(-5*1000/16384))^5 ~= 0.0094; allow 3x
    assert(fp <= 0.03, s"fp rate $fp")
  }

  test("containsBytes probes the serialized form identically") {
    val bf = Bloom.empty(1 << 10, 4)
    val rnd = new Random(9)
    val keys = Seq.fill(200)(rnd.nextLong())
    keys.foreach(Bloom.add(bf, _))
    val bytes = Bloom.serialize(bf)
    val probes = keys ++ Seq.fill(500)(rnd.nextLong())
    probes.foreach { k =>
      assert(Bloom.containsBytes(bytes, k) === Bloom.contains(bf, k))
    }
  }

  test("merge is bitwise union; geometry mismatch fails loudly") {
    val a = Bloom.empty(1 << 10, 4); val b = Bloom.empty(1 << 10, 4)
    val all = Bloom.empty(1 << 10, 4)
    for (i <- 0L until 300L) {
      if (i % 2 == 0) Bloom.add(a, i) else Bloom.add(b, i)
      Bloom.add(all, i)
    }
    assert(Bloom.merge(a, b).toSeq === all.toSeq)
    intercept[IllegalArgumentException] {
      Bloom.merge(a, Bloom.empty(1 << 11, 4))
    }
  }

  test("bloom_merge over zero rows yields a probe-safe empty sketch (ADVICE r5)") {
    val df = (0 until 100).map(i => (i, s"key$i")).toDF("g", "k")
    // the filter matches nothing, so bloom_merge aggregates zero rows
    val empty = df.filter(col("g") < 0)
      .agg(Bloom.bloom_merge(lit(Array.emptyByteArray)).as("m"))
      .select("m").as[Array[Byte]].head()
    assert(empty != null && empty.length === 16, "canonical k=0 header expected")
    // probing the empty sketch answers 'definitely absent', never throws
    assert(!Bloom.containsBytes(empty, "anything"))
    assert(!Bloom.containsBytes(Array.emptyByteArray, "legacy-zero-length"))
    // the empty sketch is the merge IDENTITY: a two-level rollup where
    // one group aggregated zero rows must not geometry-mismatch
    val real = Bloom.empty(1 << 10, 4)
    Bloom.add(real, "x")
    assert(Bloom.merge(Bloom.deserialize(empty), real).toSeq === real.toSeq)
    assert(Bloom.merge(real, Bloom.deserialize(empty)).toSeq === real.toSeq)
    val twoLevel = df.groupBy((col("g") % 2 === 0).as("even"))
      .agg(Bloom.bloom_merge(
        when(col("g") < 0, lit(Array.emptyByteArray))).as("bf"))
      .agg(Bloom.bloom_merge(col("bf")).as("m"))
      .select("m").as[Array[Byte]].head()
    assert(twoLevel.length === 16) // all-empty rollup stays canonical-empty
  }

  test("aggregate + merge paths through Catalyst; SQL-reachable") {
    val df = (0 until 2000).map(i => (i % 4, s"key$i")).toDF("g", "k")
    val global = df.agg(Bloom.bloom_sketch(col("k")).as("bf"))
      .select("bf").as[Array[Byte]].head()
    val merged = df.groupBy("g").agg(Bloom.bloom_sketch(col("k")).as("bf"))
      .agg(Bloom.bloom_merge(col("bf")).as("m"))
      .select("m").as[Array[Byte]].head()
    assert(merged.toSeq === global.toSeq)
    graft.functions.Registry.registerAll(spark)
    df.createOrReplaceTempView("bloom_in")
    val hits = spark.sql(
      """SELECT SUM(CAST(bloom_contains(bf, k) AS INT)) AS n
        |FROM bloom_in CROSS JOIN (SELECT bloom_sketch(k) AS bf FROM bloom_in)""".stripMargin)
      .as[Long].head()
    assert(hits === 2000L) // every inserted key must probe true
  }

  test("bloom pre-filtered decontamination equals the exact report") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val evals = docs.filter(col("doc_id") % 50 === 0)
    val corpus = docs.filter(col("doc_id") % 50 =!= 0)
    val exact = TextOps.contaminationReport(corpus, evals, n = 5)
      .orderBy("doc_id").collect().toSeq
    val bloomed = TextOps.contaminationReportBloom(corpus, evals, n = 5)
      .orderBy("doc_id").collect().toSeq
    assert(bloomed === exact)
    // and with a deliberately tiny bloom (high FP rate) — still equal,
    // the exact join absorbs every false positive
    val tiny = TextOps.contaminationReportBloom(corpus, evals, n = 5,
      bloomBits = 256).orderBy("doc_id").collect().toSeq
    assert(tiny === exact)
  }
}
