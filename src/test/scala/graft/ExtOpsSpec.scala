package graft

import graft.ext.{MinHash, TextOps, VectorOps}
import org.apache.spark.sql.functions._

/** Invariant specs for the hash-based extension operators (the ones the
  * DuckDB oracle can't express — this is their correctness gate). */
class ExtOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf001/documents.parquet")
  private lazy val vecs = spark.read.parquet(s"$sf001/embeddings.parquet")

  test("BPE pre-tokenizer count: contractions, digit runs, punct runs") {
    import graft.ext.TextOps
    // "I" "'ll" " pay" " 20" " dollars" "!!" " can" "'t" " x" "9" "y" = 11
    val n = TextOps.withBpeTokenCount(
        Seq((0L, "I'll pay 20 dollars!! can't x9y")).toDF("doc_id", "text"))
      .select("n_bpe_tokens").as[Long].head()
    assert(n === 11L)
    // a double space can't join the following letter run (only ONE
    // optional leading space), so it tokenizes as its own \s+ run:
    // "a", "  ", "b"
    val m = TextOps.withBpeTokenCount(Seq((0L, "a  b")).toDF("doc_id", "text"))
      .select("n_bpe_tokens").as[Long].head()
    assert(m === 3L)
  }

  test("shingles: n-grams count = tokens - n + 1 (distinct-capped)") {
    val row = Seq(("a b c d e f")).toDF("text")
      .select(TextOps.shingles(col("text"), 3).as("sh"))
      .select(size(col("sh"))).as[Int].head()
    assert(row == 4)
  }

  test("minhash-LSH candidates cover all true high-jaccard pairs (recall=1 on planted dups)") {
    val truth = TextOps.jaccardPairs(docs, n = 3, threshold = 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val cands = MinHash.lshCandidates(docs)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty, "test data should contain planted near-dups")
    val missed = truth -- cands
    assert(missed.isEmpty, s"LSH missed true pairs: $missed")
  }

  test("minhash est_jaccard approximates true jaccard within 0.25") {
    val truth = TextOps.jaccardPairs(docs, n = 3, threshold = 0.5)
      .select(col("id_a"), col("id_b"), col("jaccard"))
    val est = MinHash.lshCandidates(docs)
    val joined = truth.join(est, Seq("id_a", "id_b"))
      .select(abs(col("jaccard") - col("est_jaccard")).as("err"))
      .agg(max("err")).as[Double].head()
    assert(joined < 0.25, s"max |true - est| = $joined")
  }

  test("simhashAgg equals the expression-based simhash") {
    val sample = docs.limit(50)
    val viaExpr = MinHash.withSimhash(sample)
      .select("doc_id", "simhash").as[(Long, Long)].collect().toMap
    val viaAgg = MinHash.simhashAgg(sample)
      .select("doc_id", "simhash").as[(Long, Long)].collect().toMap
    assert(viaAgg == viaExpr)
  }

  test("simhash pairs are near-dups: block-index finds all pairs within hamming<=3") {
    // brute-force truth over the 500-doc corpus
    val sig = MinHash.simhashAgg(docs).select(col("doc_id").as("id"), col("simhash"))
    val a = sig.toDF("id_a", "sh_a")
    val b = sig.toDF("id_b", "sh_b")
    val truth = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("h", MinHash.hamming(col("sh_a"), col("sh_b")))
      .filter(col("h") <= 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val got = MinHash.simhashPairs(docs, maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == truth)
  }

  test("exactDedup keeps one row per distinct text") {
    val withDups = docs.unionByName(docs.limit(10)) // inject 10 exact dups
    val deduped = TextOps.exactDedup(withDups)
    assert(deduped.count() == docs.count())
    val groups = TextOps.exactDupGroups(withDups)
    assert(groups.count() == 10)
    assert(groups.filter(col("dup_count") =!= 2).count() == 0)
  }

  test("cosine: known vectors") {
    val df = Seq((Array(1f, 0f, 0f), Array(0f, 1f, 0f)),
                 (Array(1f, 2f, 3f), Array(1f, 2f, 3f)),
                 (Array(1f, 0f, 0f), Array(-1f, 0f, 0f)))
      .toDF("a", "b")
      .select(VectorOps.cosine(col("a"), col("b")).as("c")).as[Double].collect()
    assert(math.abs(df(0) - 0.0) < 1e-12)
    assert(math.abs(df(1) - 1.0) < 1e-12)
    assert(math.abs(df(2) + 1.0) < 1e-12)
  }

  test("annBruteForce: k results per query, descending sim, no self-match") {
    val queries = vecs.filter(col("vec_id") < 5)
    val res = VectorOps.annBruteForce(vecs, queries, 5).cache()
    val perQuery = res.groupBy("query_id").count().select("count").as[Long].collect()
    assert(perQuery.forall(_ == 5))
    assert(res.filter(col("query_id") === col("corpus_id")).count() == 0)
    val monotone = res.withColumn("prev",
        lag("sim", 1).over(org.apache.spark.sql.expressions.Window
          .partitionBy("query_id").orderBy("rank")))
      .filter(col("prev").isNotNull && col("prev") < col("sim"))
    assert(monotone.count() == 0)
  }

  test("annLsh results are a subset of correct similarities (verified exactly)") {
    val queries = vecs.filter(col("vec_id") < 5)
    val approx = VectorOps.annLsh(vecs, queries, 5, dim = 64)
    // every returned sim must equal the exact cosine of that pair
    val joined = approx.join(
        vecs.select(col("vec_id").as("query_id"), col("embedding").as("qv")), "query_id")
      .join(vecs.select(col("vec_id").as("corpus_id"), col("embedding").as("cv")), "corpus_id")
      .withColumn("true_sim", VectorOps.cosine(col("cv"), col("qv")))
      .filter(abs(col("sim") - col("true_sim")) > 1e-9)
    assert(joined.count() == 0)
  }

  test("annIvf: full probe equals brute force; partial probe is a sound subset") {
    val queries = vecs.filter(col("vec_id") < 5)
    // probing every cell must reproduce exact brute-force top-k
    val full = VectorOps.annIvf(vecs, queries, 5, nlist = 8, nprobe = 8)
      .select("query_id", "rank", "corpus_id")
      .as[(Long, Int, Long)].collect().toSet
    val brute = VectorOps.annBruteForce(vecs, queries, 5)
      .select("query_id", "rank", "corpus_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(full == brute, "nprobe = nlist must equal brute force")
    // partial probe: at most k per query, sims exact, ranks descending
    val part = VectorOps.annIvf(vecs, queries, 5, nlist = 8, nprobe = 2).cache()
    assert(part.groupBy("query_id").count().filter(col("count") > 5).count() == 0)
    val verified = part.join(
        vecs.select(col("vec_id").as("query_id"), col("embedding").as("qv")), "query_id")
      .join(vecs.select(col("vec_id").as("corpus_id"), col("embedding").as("cv")), "corpus_id")
      .withColumn("true_sim", VectorOps.cosine(col("cv"), col("qv")))
      .filter(abs(col("sim") - col("true_sim")) > 1e-9)
    assert(verified.count() == 0, "every emitted sim is the exact cosine")
    part.unpersist()
  }

  test("annIvfIndexed: disk index probe is bit-equal to inline annIvf (full and partial)") {
    val queries = vecs.filter(col("vec_id") < 5)
    val idx = java.nio.file.Files.createTempDirectory("ivf-idx").toString
    VectorOps.buildIvfIndex(vecs, idx, nlist = 8, iters = 1, initMode = "random")
    // full probe (exact mode) ≡ brute force through the on-disk layout
    val fullIdx = VectorOps.annIvfIndexed(queries, idx, 5, nprobe = 8)
      .select("query_id", "rank", "corpus_id")
      .as[(Long, Int, Long)].collect().toSet
    val brute = VectorOps.annBruteForce(vecs, queries, 5)
      .select("query_id", "rank", "corpus_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(fullIdx == brute, "indexed full probe must equal brute force")
    // partial probe: shared fitIvf + fixed seed ⇒ same centroids, so the
    // indexed path reproduces the inline operator's approximate answer
    // EXACTLY (sims included)
    val partIdx = VectorOps.annIvfIndexed(queries, idx, 5, nprobe = 2)
      .select("query_id", "rank", "corpus_id", "sim")
      .as[(Long, Int, Long, Double)].collect().toSet
    val partInline = VectorOps.annIvf(vecs, queries, 5, nlist = 8, nprobe = 2,
        iters = 1, initMode = "random")
      .select("query_id", "rank", "corpus_id", "sim")
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(partIdx == partInline, "indexed partial probe must equal inline annIvf")
  }

  test("annIvf quantizer fits on a bounded sample without changing full-probe results") {
    val queries = vecs.filter(col("vec_id") < 5)
    // force the sampled-fit path (corpus >> cap): at nprobe = nlist the
    // centroid placement cannot change results, so the sampled fit must be
    // bit-equal to brute force — the 100 TB contract (never `iters` full
    // corpus passes to place nlist centroids)
    assert(vecs.count() > 40, "fixture too small to exercise the sampled fit")
    val sampled = VectorOps.annIvf(vecs, queries, 5, nlist = 8, nprobe = 8,
        fitSampleCap = 40L)
      .select("query_id", "rank", "corpus_id")
      .as[(Long, Int, Long)].collect().toSet
    val brute = VectorOps.annBruteForce(vecs, queries, 5)
      .select("query_id", "rank", "corpus_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(sampled == brute, "sampled-quantizer full probe must equal brute force")
  }

  test("PQ: lossless when codebooks hold every distinct subvector; encode/decode consistent") {
    // 8-dim vectors, m=4 subspaces of 2 dims, each subvector drawn from
    // exactly 3 distinct values -> ksub=3 codebooks can be EXACT, making
    // ADC provably equal to the true dot product (machinery check)
    val subvals = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(0.5, 0.5))
    val rnd = new scala.util.Random(4)
    val rows = (0L until 60L).map { i =>
      (i, (0 until 4).flatMap(_ => subvals(rnd.nextInt(3))).map(_.toFloat).toArray)
    }
    val vecs = rows.toDF("vec_id", "embedding")
    val cb = graft.ext.VectorOps.pqTrain(vecs, dim = 8, m = 4, ksub = 3,
      iters = 10, fitSampleCap = 1000L)
    val coded = graft.ext.VectorOps.withPqCodes(vecs, cb)
    // decode must reproduce the original vector exactly (codebooks are
    // exact: k-means with k = #distinct points converges onto them)
    val maxErr = coded.select(max(abs(
        element_at(graft.ext.VectorOps.pqDecode(col("pq_codes"), cb), 1) -
          element_at(col("embedding").cast("array<double>"), 1))))
      .as[Double].head()
    assert(maxErr < 1e-9, s"exact codebooks must reconstruct exactly, err=$maxErr")
    // ADC top-k == exact-dot top-k
    val queries = vecs.filter(col("vec_id") < 5)
    val adc = graft.ext.VectorOps.annPq(coded, queries, 5, cb)
      .select("query_id", "rank", "corpus_id").as[(Long, Int, Long)].collect().toSet
    val exact = {
      val c = vecs.select(col("vec_id").as("corpus_id"),
        col("embedding").cast("array<double>").as("cv"))
      val q = queries.select(col("vec_id").as("query_id"),
        col("embedding").cast("array<double>").as("qv"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy("query_id")
        .orderBy(col("d").desc, col("corpus_id"))
      c.crossJoin(broadcast(q)).filter(col("corpus_id") =!= col("query_id"))
        .withColumn("d", graft.ext.VectorOps.dot(col("cv"), col("qv")))
        .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
        .select("query_id", "rank", "corpus_id").as[(Long, Int, Long)].collect().toSet
    }
    assert(adc == exact, "exact codebooks => ADC ranking equals true-dot ranking")
  }

  test("PQ on the embeddings fixture: codes in range, recall@10 well above chance") {
    val queries = vecs.filter(col("vec_id") < 10)
    val cb = graft.ext.VectorOps.pqTrain(vecs, dim = 64, m = 8, ksub = 16, iters = 5)
    val coded = graft.ext.VectorOps.withPqCodes(vecs, cb)
    val inRange = coded.select(forall(col("pq_codes"),
      c => c >= 0 && c < 16)).as[Boolean].collect()
    assert(inRange.forall(identity), "every code within [0, ksub)")
    val adc = graft.ext.VectorOps.annPq(coded, queries, 10, cb)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val exact = graft.ext.VectorOps.annBruteForce(vecs, queries, 10)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val recall = (adc intersect exact).size.toDouble / exact.size
    // chance recall at corpus ~200 is 10/200 = 5%; PQ with 8x16 codebooks
    // lands far above it — the threshold leaves wide margin but proves
    // the quantizer carries real signal
    assert(recall >= 0.3, s"PQ recall@10 = $recall")
  }

  test("normalizeText: NFC composition + control-strip; idempotent; SQL-reachable") {
    // decomposed cafe+COMBINING ACUTE, precomposed \u00e9, BEL + DEL to strip
    val dirty = "cafe\u0301 \u00e9\u0007bad ok\ttab\nline\u007f"
    val out = Seq(Tuple1(dirty)).toDF("t")
      .select(graft.ext.TextOps.normalizeText(col("t")).as("c"))
      .as[String].head()
    assert(out === "caf\u00e9 \u00e9bad ok\ttab\nline", s"got ${out.toSeq}")
    // idempotent: cleaning clean text is identity
    val again = Seq(Tuple1(out)).toDF("t")
      .select(graft.ext.TextOps.normalizeText(col("t")).as("c")).as[String].head()
    assert(again === out)
    // both spellings of \u00e9 hash identically after cleaning
    val pair = Seq(("e\u0301clair", "\u00e9clair")).toDF("a", "b")
      .select((md5(graft.ext.TextOps.normalizeText(col("a"))) ===
        md5(graft.ext.TextOps.normalizeText(col("b")))).as("eq"))
      .as[Boolean].head()
    assert(pair, "decomposed and precomposed must normalize to equal bytes")
    graft.functions.Registry.registerAll(spark)
    assert(spark.sql("SELECT nfc_normalize('e\\u0301')").as[String].head()
      === "\u00e9")
  }

  test("bm25TopK: rarer terms weigh more; scores rank correctly; k bounds output") {
    val docs = Seq(
      (1L, "alpha beta beta beta common common"),
      (2L, "alpha common common common common common"),
      (3L, "rare common common common common common"),
      (4L, "common common common common common common")).toDF("doc_id", "text")
    // 'rare' appears in 1 doc, 'alpha' in 2: doc 3 must outrank the
    // alpha docs for the query containing both
    val r = graft.ext.TextOps.bm25TopK(docs, "rare alpha", 3)
      .as[(Long, Double)].collect()
    assert(r.length === 3)
    assert(r.head._1 === 3L, s"rare-term doc must rank first: ${r.toSeq}")
    assert(r.map(_._2).sliding(2).forall(p => p.head >= p.last), "scores descend")
    assert(!r.map(_._1).contains(4L), "doc with no query terms never scores")
    // tf saturation: doc 1 repeats beta 3x but beta isn't in the query;
    // alpha tf=1 in both docs 1 and 2 — shorter doc... both length 6,
    // so their alpha contributions tie and doc_id breaks the tie
    val q2 = graft.ext.TextOps.bm25TopK(docs, "alpha", 2)
      .as[(Long, Double)].collect()
    assert(q2.map(_._1).toSeq === Seq(1L, 2L))
    assert(q2(0)._2 === q2(1)._2, "equal tf and dl => equal score")
  }

  test("redactPii: emails, IPs, phones become typed tokens; clean text unchanged") {
    val rows = Seq(
      "mail me at jo.doe+x@sub.example.org today",
      "server 192.168.1.254 then 10.0.0.1 twice",
      "call +44 555-1234 or +1 555 0000",
      "nothing sensitive here 1.2 3.4").toDF("text")
    val out = TextOps.withPiiRedacted(rows).select("text_redacted")
      .as[String].collect()
    assert(out(0) == "mail me at <EMAIL> today")
    assert(out(1) == "server <IP> then <IP> twice")
    assert(out(2) == "call <PHONE> or <PHONE>")
    assert(out(3) == "nothing sensitive here 1.2 3.4")
  }

  test("decontaminate drops exactly the reported docs; eval side joins broadcast") {
    val evals = docs.filter(col("doc_id") % 50 === 0)
    val corpus = docs.filter(col("doc_id") % 50 =!= 0)
    val report = TextOps.contaminationReport(corpus, evals, n = 5)
    val flagged = report.select("doc_id").as[Long].collect().toSet
    assert(flagged.nonEmpty, "fixture should plant at least one overlap")
    val kept = TextOps.decontaminate(corpus, evals, n = 5)
      .select("doc_id").as[Long].collect().toSet
    val all = corpus.select("doc_id").as[Long].collect().toSet
    assert(kept == all -- flagged)
    // the corpus must not shuffle: eval postings broadcast into the join
    val plan = report.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(500))
  }

  test("lang-id + quality columns are well-formed") {
    val lid = TextOps.withLangId(docs)
    assert(lid.filter(col("fnword_ratio") < 0 || col("fnword_ratio") > 1).count() == 0)
    val q = TextOps.withQualityScore(docs)
    assert(q.filter(col("stopword_ratio") < 0 || col("punct_ratio") < 0).count() == 0)
    assert(q.filter(col("n_tokens") <= 0).count() == 0)
  }

  test("ensureParallelism widens a small JOINED input (leaf stats, not inflated plan stats)") {
    // a join's top-level sizeInBytes multiplies child estimates; the
    // helper must still see the small LEAF sizes and widen the scan
    val joined = docs.join(docs.select(col("doc_id"), col("n_chars").as("nc")), "doc_id")
    val widened = TextOps.ensureParallelism(joined)
    val plan = widened.queryExecution.executedPlan.toString
    assert(plan.contains("RoundRobinPartitioning"),
      "small joined input must be repartitioned:\n" + plan.take(600))
    assert(widened.count() == docs.count())
  }

  test("semanticDedup: keep rule replayed row-for-row; min-centroid-sim member always kept") {
    val tau = 0.3
    val out = VectorOps.semanticDedup(vecs, tau)
      .select(col("vec_id"), col("cluster"), col("simc_r"), col("kept"))
      .as[(Long, Long, Double, Boolean)].collect()
    assert(out.length == vecs.count())
    val removedN = out.count(!_._4)
    assert(removedN > 0, "fixture should contain within-cluster near-dups")

    // independent recompute of the rule from raw vectors + the operator's
    // own cluster/simc outputs: removed ⇔ a same-cluster partner within
    // tau outranks it under (simc_r asc, id asc)
    val raw = vecs.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      d / math.sqrt(na * nb)
    }
    val byCluster = out.groupBy(_._2)
    for ((_, members) <- byCluster; m <- members) {
      val dominated = members.exists { o =>
        // round to 6 HALF_UP like Spark's round() (and the oracle) so
        // the naive replay agrees bit-for-bit at the threshold boundary
        o._1 != m._1 &&
          BigDecimal(cos(raw(m._1), raw(o._1)))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble >= tau &&
          (o._3 < m._3 || (o._3 == m._3 && o._1 < m._1))
      }
      assert(!m._4 == dominated,
        s"vec ${m._1}: kept=${m._4} but dominated=$dominated")
      // the cluster's minimum under (simc, id) can never be dominated
    }
    for ((_, members) <- byCluster) {
      val top = members.minBy(m => (m._3, m._1))
      assert(top._4, s"cluster min ${top._1} must be kept")
    }

    // a threshold above the max pairwise sim removes nothing
    val none = VectorOps.semanticDedup(vecs, 0.99)
      .filter(!col("kept")).count()
    assert(none == 0L)

    // partitioning-invariant: decimal centroid sums make the keep set
    // independent of how the input was split
    val a = VectorOps.semanticDedup(vecs, tau)
    val b = VectorOps.semanticDedup(vecs.repartition(7), tau)
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
  }

  test("semanticDedup clusterBits is the paper's k knob: refinement, pair-bound shrink, dup removal at any setting") {
    val tau = 0.3
    // clone 10 vectors under fresh ids: exact duplicates share the full
    // 32-bit sign-LSH signature, so each (orig, clone) pair co-clusters
    // at EVERY clusterBits setting and can never both survive
    val clones = vecs.filter(col("vec_id") < 10)
      .withColumn("vec_id", col("vec_id") + 100000L)
    val in = vecs.unionByName(clones)
    val out6 = VectorOps.semanticDedup(in, tau, clusterBits = Some(6))
      .select(col("vec_id"), col("cluster"), col("kept"))
      .as[(Long, Long, Boolean)].collect()
    val out12 = VectorOps.semanticDedup(in, tau, clusterBits = Some(12))
      .select(col("vec_id"), col("cluster"), col("kept"))
      .as[(Long, Long, Boolean)].collect()

    // 1. mask nesting: bits-12 clusters REFINE bits-6 clusters, so
    //    raising the knob only ever splits clusters (the paper's k↑)
    val c6 = out6.map(r => r._1 -> r._2).toMap
    out12.foreach { case (id, c12, _) =>
      assert((c12 & 63L) == c6(id), s"vec $id: cluster $c12 not nested in ${c6(id)}")
    }
    // 2. the Σ|cluster|² candidate-pair bound shrinks monotonically
    def pairBound(rows: Array[(Long, Long, Boolean)]): Long =
      rows.groupBy(_._2).values.map(g => g.size.toLong * g.size).sum
    assert(pairBound(out12) < pairBound(out6),
      s"finer clustering must shrink the pair space: ${pairBound(out12)} vs ${pairBound(out6)}")
    // 3. exact duplicates are removed at BOTH settings (cosine 1 >= tau,
    //    same cluster, tie broken by id)
    for (out <- Seq(out6, out12); base <- 0L until 10L) {
      val pairKept = out.filter(r => r._1 == base || r._1 == base + 100000L)
        .count(_._3)
      assert(pairKept <= 1, s"dup pair of vec $base must not both survive")
    }
    // 4. kept sets LEGITIMATELY diverge across bits settings (the
    //    expected difference, not a defect): the keep rule is
    //    per-cluster and the ranking is centroid-relative, so splitting
    //    a cluster both removes cross-sibling dominators and re-ranks
    //    members against new centroids. The invariant that does hold:
    //    every cluster keeps at least its (simc, id)-minimum member
    for ((_, members) <- out12.groupBy(_._2))
      assert(members.exists(_._3), "every bits-12 cluster must keep a member")
    for ((_, members) <- out6.groupBy(_._2))
      assert(members.exists(_._3), "every bits-6 cluster must keep a member")
    // 5. partition invariance holds at the high setting too
    val hi = VectorOps.semanticDedup(in, tau, clusterBits = Some(12))
    val hi2 = VectorOps.semanticDedup(in.repartition(5), tau, clusterBits = Some(12))
    assert(hi.except(hi2).isEmpty && hi2.except(hi).isEmpty)
  }

  test("semanticDedup auto-sizes clusterBits ≈ log2(n/64) when unset") {
    // the rule itself, pinned at the measured tiers: sf0.01's 2.5k
    // vectors → 6 (the oracle fixture's setting falls out of the rule,
    // not a hand pick), the r7 Stress tier's 200k → 12 (the measured
    // 20.4× pair-bound sweet spot), web scale hits the 1M-cluster cap
    assert(VectorOps.autoClusterBits(2500) == 6)
    assert(VectorOps.autoClusterBits(25000) == 9)
    assert(VectorOps.autoClusterBits(200000) == 12)
    assert(VectorOps.autoClusterBits(5000000000L) == 20, "paper-scale cap")
    assert(VectorOps.autoClusterBits(0) == 1 && VectorOps.autoClusterBits(50) == 1,
      "degenerate inputs stay at one comparison tier")
    // default = None = the rule: identical output to pinning the rule's
    // own value for this input size
    val n = vecs.count()
    val auto = VectorOps.semanticDedup(vecs, 0.3)
    val pinned = VectorOps.semanticDedup(vecs, 0.3,
      clusterBits = Some(VectorOps.autoClusterBits(n)))
    assert(auto.except(pinned).isEmpty && pinned.except(auto).isEmpty)
  }
}
