package graft

import graft.ext.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"$sf001/documents.parquet")

  test("leakageSafeSplit: dup-group members share one split; singletons split solo") {
    import spark.implicits._
    // groups: {1,2,3} (chain), {10,11}; singletons 20, 21, 22
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val d = Seq(1L, 2L, 3L, 10L, 11L, 20L, 21L, 22L).toDF("doc_id")
    val out = Sampling.leakageSafeSplit(d, pairs,
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "s|")
      .as[(Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.size === 8)
    assert(out(1L)._1 === 1L && out(2L)._1 === 1L && out(3L)._1 === 1L)
    assert(Set(out(1L)._2, out(2L)._2, out(3L)._2).size === 1, "group split apart")
    assert(out(10L)._2 === out(11L)._2)
    assert(out(20L)._1 === 20L) // singleton is its own group
    // weights gate: must sum to 1
    intercept[IllegalArgumentException] {
      Sampling.leakageSafeSplit(d, pairs, Seq("a" -> 0.5, "b" -> 0.2))
    }
  }

  test("leakageSafeSplit: proportions track weights on many singleton groups") {
    import spark.implicits._
    val d = spark.range(0, 5000).toDF("doc_id")
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val counts = Sampling.leakageSafeSplit(d, empty,
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "p|")
      .groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(math.abs(counts("train") - 4000L) < 200, counts.toString)
    assert(math.abs(counts("val") - 500L) < 100, counts.toString)
    assert(math.abs(counts("test") - 500L) < 100, counts.toString)
    // determinism: identical salt -> identical assignment
    val again = Sampling.leakageSafeSplit(d, empty,
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1), salt = "p|")
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(again === counts)
  }

  test("packShards distributed prefix sum == naive single-window, across bucket widths") {
    val d = docs.select(col("doc_id"), col("lang"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val naive = Sampling.packShardsNaive(d, "lang", "n_tokens", 1000L)
      .select("doc_id", "shard_id")
    for (width <- Seq(1L, 7L, 64L, 1000000L)) {
      val dist = Sampling.packShards(d, "lang", "n_tokens", 1000L,
        bucketWidth = width).select("doc_id", "shard_id")
      assert(dist.except(naive).isEmpty && naive.except(dist).isEmpty,
        s"bucketWidth=$width diverges from the naive cumsum")
    }
  }

  test("packShards keeps NULL-stratum rows (null-safe offsets join) and matches naive") {
    val d = docs.select(col("doc_id"),
      when(col("doc_id") % 7 === 0, lit(null: String))
        .otherwise(col("lang")).as("lang"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val dist = Sampling.packShards(d, "lang", "n_tokens", 1000L,
      bucketWidth = 64L).select("doc_id", "shard_id")
    val naive = Sampling.packShardsNaive(d, "lang", "n_tokens", 1000L)
      .select("doc_id", "shard_id")
    assert(dist.count() == d.count(), "NULL-stratum rows were dropped")
    assert(dist.except(naive).isEmpty && naive.except(dist).isEmpty)
  }

  test("packShards: every non-final shard lands within max(tokens) of the budget") {
    val d = docs.select(col("doc_id"), col("lang"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val maxTok = d.agg(max("n_tokens")).head().getLong(0)
    val shards = Sampling.packShards(d, "lang", "n_tokens", 1000L,
        bucketWidth = 64L)
      .groupBy("lang", "shard_id").agg(sum("n_tokens").as("t"))
    val lastShard = shards.groupBy("lang").agg(max("shard_id").as("last"))
    val nonFinal = shards.join(lastShard, Seq("lang"))
      .filter(col("shard_id") < col("last"))
    assert(nonFinal.filter(col("t") < 1000L - maxTok || col("t") >= 1000L + maxTok)
      .count() == 0)
  }

  test("packSequences distributed prefix sum == naive single-window, across bucket widths") {
    val d = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val cols = Seq("doc_id", "seq_id", "tok_start", "tok_end", "seq_off")
    val naive = Sampling.packSequencesNaive(d, 64L, "n_tokens")
      .select(cols.map(col): _*)
    for (width <- Seq(1L, 7L, 64L, 1000000L)) {
      val dist = Sampling.packSequences(d, 64L, "n_tokens",
        bucketWidth = width).select(cols.map(col): _*)
      assert(dist.except(naive).isEmpty && naive.except(dist).isEmpty,
        s"bucketWidth=$width diverges from the naive cumsum")
    }
  }

  test("packSequences: every sequence except the last carries exactly seqLen tokens") {
    val d = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val spans = Sampling.packSequences(d, 64L, "n_tokens", bucketWidth = 64L)
    val perSeq = spans.groupBy("seq_id")
      .agg(sum(col("tok_end") - col("tok_start")).as("t"))
    val lastSeq = perSeq.agg(max("seq_id")).head().getLong(0)
    assert(perSeq.filter(col("seq_id") < lastSeq && col("t") =!= 64L)
      .count() == 0, "a non-final sequence is not exactly seqLen")
    val total = d.agg(sum("n_tokens")).head().getLong(0)
    assert(perSeq.agg(sum("t")).head().getLong(0) == total,
      "packed token mass != corpus token mass")
    // the span map is loader-consistent: contiguous coverage of each doc
    val perDoc = spans.groupBy("doc_id")
      .agg(sum(col("tok_end") - col("tok_start")).as("covered"),
        min("tok_start").as("lo"), max("tok_end").as("hi"))
      .join(d, Seq("doc_id"))
    assert(perDoc.filter(col("covered") =!= col("n_tokens") ||
      col("lo") =!= 0L || col("hi") =!= col("n_tokens")).count() == 0,
      "doc token ranges are not a contiguous partition of the doc")
  }

  test("packSequences: zero-token docs emit no rows; boundary doc splits with correct offsets") {
    import spark.implicits._
    // ids 0..3 with 32, 64, 0, 40 tokens and seqLen 48:
    //   doc 0 -> seq 0 [0,32) at off 0
    //   doc 1 -> seq 0 [0,16) at off 32; seq 1 [16,64) at off 0
    //   doc 2 -> nothing (zero tokens)
    //   doc 3 -> seq 2 [0,40) at off 0
    val d = Seq((0L, 32L), (1L, 64L), (2L, 0L), (3L, 40L))
      .toDF("doc_id", "n_tokens")
    val got = Sampling.packSequences(d, 48L, "n_tokens", bucketWidth = 2L)
      .select("doc_id", "seq_id", "tok_start", "tok_end", "seq_off")
      .as[(Long, Long, Long, Long, Long)].collect().sorted
    assert(got.toSeq === Seq(
      (0L, 0L, 0L, 32L, 0L),
      (1L, 0L, 0L, 16L, 32L),
      (1L, 1L, 16L, 64L, 0L),
      (3L, 2L, 0L, 40L, 0L)))
  }

  test("stratifiedSample keeps exactly ceil(frac * n) rows per stratum, deterministically") {
    val d = docs.select("doc_id", "lang")
    val fr = Map("en" -> 0.5, "de" -> 0.25, "es" -> 0.25, "fr" -> 0.125,
      "zh" -> 0.375)
    val expected = d.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> math.ceil(r.getLong(1) * fr(r.getString(0))).toLong)
      .toMap
    val got = Sampling.stratifiedSample(d, "lang", fr, salt = "mix1|")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
    // run-to-run determinism: identical membership, not just counts
    val a = Sampling.stratifiedSample(d, "lang", fr, salt = "mix1|")
      .select("doc_id")
    val b = Sampling.stratifiedSample(d, "lang", fr, salt = "mix1|")
      .select("doc_id")
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
    // a different salt draws a genuinely different sample
    val c = Sampling.stratifiedSample(d, "lang", fr, salt = "other|")
      .select("doc_id")
    assert(c.except(a).count() > 0)
  }

  test("quotaSample caps every stratum at min(k, n)") {
    val d = docs.select("doc_id", "lang")
    val counts = Sampling.quotaSample(d, "lang", 50)
      .groupBy("lang").count().collect()
    val full = d.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    counts.foreach { r =>
      assert(r.getLong(1) == math.min(50L, full(r.getString(0))))
    }
  }

  test("hashFractionSample: nested thresholds give nested samples; no shuffle in the plan") {
    val d = docs.select("doc_id", "lang")
    val small = Sampling.hashFractionSample(d, 0.1, salt = "s|")
    val big = Sampling.hashFractionSample(d, 0.25, salt = "s|")
    assert(small.except(big).isEmpty, "sample(0.1) must be a subset of sample(0.25)")
    val n = big.count().toDouble / d.count()
    assert(n > 0.1 && n < 0.45, s"rate $n wildly off 0.25")
    // fraction 1.0 is the identity, not a 1-2^-32 filter
    assert(Sampling.hashFractionSample(d, 1.0, salt = "s|").count() == d.count())
    // the 100 TB property: a pure filter — no exchange anywhere
    val plan = big.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(400))
  }

  test("temperatureMix: exact sqrt-weighted quotas, low-resource strata up-weighted") {
    val d = docs.select("doc_id", "lang")
    val counts = d.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val target = 200L // well under the sf0.001 doc count so no stratum caps
    // expected quotas from the documented recipe, total in lang order
    val weights = counts.toSeq.sortBy(_._1).map { case (l, n) => l -> math.sqrt(n.toDouble) }
    val tw = weights.map(_._2).sum
    val expected = weights.map { case (l, w) =>
      l -> math.min(counts(l), math.floor(target.toDouble * w / tw).toLong) }.toMap
    val got = Sampling.temperatureMix(d, "lang", target, salt = "temp|")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
    assert(got.values.sum <= target)
    // α=0.5 up-weights the smallest stratum vs proportional sampling
    val (minLang, minN) = counts.minBy(_._2)
    val (maxLang, maxN) = counts.maxBy(_._2)
    if (minN < maxN) {
      val keptMin = got(minLang).toDouble / minN
      val keptMax = got(maxLang).toDouble / maxN
      assert(keptMin > keptMax,
        s"temperature must favor low-resource strata: $keptMin !> $keptMax")
    }
    // deterministic membership run-to-run
    val a = Sampling.temperatureMix(d, "lang", target, salt = "temp|").select("doc_id")
    val b = Sampling.temperatureMix(d, "lang", target, salt = "temp|").select("doc_id")
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("hashFractionSample: fractions at and just below 1.0 keep ~all rows (threshold clamp)") {
    val d = docs.select("doc_id", "lang")
    val total = d.count()
    // unclamped, nextDown(1.0) formats a 9-char "100000000" threshold that
    // sorts below "2..." and keeps ~6% of rows — the clamp must keep ~100%
    for (f <- Seq(Math.nextDown(1.0), 0.9999999999, 1.0 - math.pow(2, -32))) {
      val kept = Sampling.hashFractionSample(d, f, salt = "clamp|").count()
      assert(kept >= total - 1 && kept <= total,
        s"fraction=$f kept $kept of $total rows")
    }
    // monotonicity survives the clamp: every fraction's sample nests in 1.0's
    val sub = Sampling.hashFractionSample(d, Math.nextDown(1.0), salt = "clamp|")
    assert(sub.except(d).isEmpty)
  }

  test("dsirResample: enriches the target slice, exact-k, deterministic, ranks contiguous") {
    import spark.implicits._
    val d = docs
    val k = 50
    val out = Sampling.dsirResample(d, col("lang") === "en", k).cache()
    try {
      val rows = out.select("rank", "doc_id").as[(Long, Long)].collect().sortBy(_._1)
      assert(rows.length == k)
      assert(rows.map(_._1).toSeq == (1L to k.toLong), "ranks must be 1..k")
      assert(rows.map(_._2).distinct.length == k, "sampling is without replacement")

      // the point of DSIR: the selected set should look like the target
      // distribution — its en-fraction must beat the corpus base rate
      val baseEn = d.filter(col("lang") === "en").count().toDouble / d.count()
      val selEn = d.join(out, "doc_id").filter(col("lang") === "en").count().toDouble / k
      assert(selEn > baseEn,
        s"selected en-fraction $selEn must exceed base rate $baseEn")

      // bit-deterministic run-to-run (no RNG anywhere)
      val again = Sampling.dsirResample(d, col("lang") === "en", k)
      assert(out.except(again).isEmpty && again.except(out).isEmpty)

      // partitioning-invariant: the decimal weight sums and the Gumbel
      // keys cannot depend on how the input was split
      val reparted = Sampling.dsirResample(d.repartition(7), col("lang") === "en", k)
      assert(out.except(reparted).isEmpty && reparted.except(out).isEmpty)
    } finally out.unpersist()
  }

  // en/de demand whole-epoch upsampling at sf0.001 token counts
  // (need 28672/16384 vs ~10k/~4k available); zh's 0.03125 weight needs
  // 2048 of ~4k — fractional fill. Both regimes in one call.
  private val mixWeights = Map("en" -> 0.4375, "de" -> 0.25,
    "es" -> 0.125, "fr" -> 0.125, "zh" -> 0.03125)

  private def mixDocs = docs.select(col("doc_id"), col("lang"),
    size(split(col("text"), " ")).cast("long").as("n_tokens"))

  test("tokenMixture distributed hash-prefix prefix sum == naive single-window") {
    val d = mixDocs
    val naive = Sampling.tokenMixtureNaive(d, "lang", mixWeights, 65536L,
      "n_tokens", salt = "tm|").select("doc_id", "n_copies")
    val dist = Sampling.tokenMixture(d, "lang", mixWeights, 65536L,
      "n_tokens", salt = "tm|").select("doc_id", "n_copies")
    assert(dist.except(naive).isEmpty && naive.except(dist).isEmpty,
      "hash-bucketed prefix sum diverges from the naive cumsum")
  }

  test("tokenMixture: emitted tokens land within one document of every stratum's need") {
    import spark.implicits._
    val d = mixDocs
    val out = Sampling.tokenMixture(d, "lang", mixWeights, 65536L,
      "n_tokens", salt = "tm|")
    val emitted = out.groupBy("lang")
      .agg(sum(col("n_tokens") * col("n_copies")).as("toks"),
        max("n_copies").as("max_copies"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val maxTok = d.groupBy("lang").agg(max("n_tokens"))
      .as[(String, Long)].collect().toMap
    val avail = d.groupBy("lang").agg(sum("n_tokens"))
      .as[(String, Long)].collect().toMap
    mixWeights.foreach { case (lang, w) =>
      val need = math.floor(w * 65536L).toLong
      val got = emitted.get(lang).map(_._1).getOrElse(0L)
      assert(math.abs(got - need) < maxTok(lang),
        s"$lang emitted $got vs need $need (max doc ${maxTok(lang)})")
      // epochs: copy counts must actually reflect need/avail
      val fullPasses = need / avail(lang)
      assert(emitted(lang)._2 == fullPasses ||
        emitted(lang)._2 == fullPasses + 1,
        s"$lang max n_copies ${emitted(lang)._2} vs $fullPasses whole passes")
    }
    // the sf fixture must exercise BOTH regimes or the test is vacuous
    assert(emitted("en")._2 >= 2, "en should be upsampled (whole epochs)")
    assert(emitted("zh")._2 == 1, "zh should be a fractional-only fill")
  }

  test("packMixture distributed hash-prefix prefix sum == naive global window") {
    val mixed = Sampling.tokenMixture(mixDocs, "lang", mixWeights, 65536L,
      "n_tokens", salt = "tm|")
    val cols = Seq("doc_id", "copy", "seq_id", "tok_start", "tok_end", "seq_off")
    val naive = Sampling.packMixtureNaive(mixed, 64L, "n_tokens",
      salt = "mp|").selectExpr(cols: _*)
    val dist = Sampling.packMixture(mixed, 64L, "n_tokens", salt = "mp|")
      .selectExpr(cols: _*)
    assert(dist.except(naive).isEmpty && naive.except(dist).isEmpty,
      "draw-bucketed prefix sum diverges from the naive global window")
  }

  test("packMixture: every copy fully placed; sequences exactly seqLen except the last") {
    import spark.implicits._
    val mixed = Sampling.tokenMixture(mixDocs, "lang", mixWeights, 65536L,
      "n_tokens", salt = "tm|").cache()
    try {
      val out = Sampling.packMixture(mixed, 64L, "n_tokens", salt = "mp|")
        .cache()
      try {
        // each (doc, copy) contributes exactly its token count, and the
        // copy indexes are exactly 1..n_copies
        val perCopy = out.groupBy("doc_id", "copy")
          .agg(sum(col("tok_end") - col("tok_start")).as("toks"))
        val bad = perCopy.join(mixed, "doc_id")
          .filter(col("toks") =!= col("n_tokens") ||
            col("copy") < 1 || col("copy") > col("n_copies"))
        assert(bad.isEmpty, bad.collect().mkString(","))
        val nCopies = out.select("doc_id", "copy").distinct().count()
        assert(nCopies == mixed.agg(sum("n_copies")).head().getLong(0))
        // the packed stream: every sequence except the global last
        // carries exactly 64 tokens
        val seqTotals = out.groupBy("seq_id")
          .agg(sum(col("tok_end") - col("tok_start")).as("t"))
        val maxSeq = seqTotals.agg(max("seq_id")).head().getLong(0)
        val short = seqTotals
          .filter(col("seq_id") < maxSeq && col("t") =!= 64L).count()
        assert(short == 0L, "a non-final sequence is not exactly seqLen")
        // interleaving: an upsampled doc's copies do NOT pack into the
        // same sequence run (distinct draws scatter them)
        val sameSeq = out.groupBy("doc_id", "seq_id")
          .agg(countDistinct("copy").as("c")).filter(col("c") > 1).count()
        val totalSpans = out.count()
        assert(sameSeq < totalSpans / 10,
          s"copies cluster: $sameSeq/$totalSpans spans share (doc, seq)")
      } finally out.unpersist()
    } finally mixed.unpersist()
  }

  test("tokenMixture: unweighted, NULL, and zero-avail strata drop; no rows repeat") {
    import spark.implicits._
    val d = Seq(
      (0L, "a", 10L), (1L, "a", 10L), (2L, "b", 10L),
      (3L, null.asInstanceOf[String], 10L), (4L, "z", 0L), (5L, "z", 0L)
    ).toDF("doc_id", "lang", "n_tokens")
    // b unweighted; z weighted but zero tokens available (div guard)
    val out = Sampling.tokenMixture(d, "lang",
        Map("a" -> 0.5, "z" -> 0.5), 30L, "n_tokens", salt = "nz|")
      .select("doc_id", "lang", "n_copies")
      .as[(Long, String, Long)].collect()
    assert(out.forall(_._2 == "a"), out.mkString(","))
    assert(out.map(_._1).distinct.length == out.length,
      "upsampling must be a column, never duplicated rows")
    // need(a) = 15, avail = 20: one fractional prefix, no whole pass
    assert(out.map(r => r._3 * 10L).sum >= 15L - 10L &&
      out.map(r => r._3 * 10L).sum < 25L)
  }
}
