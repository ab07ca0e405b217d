package graft

/**
 * Plan-shape regression gates: the properties that make these operators
 * scale (pushdown, broadcast, partial aggregation, shuffle counts) are
 * asserted on the optimized physical plans so a refactor can't silently
 * regress them into full-scan / shuffle-everything plans.
 */
class PlanQualitySpec extends SparkSpec {

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf001).queryExecution.executedPlan.toString

  private def countOccurrences(s: String, sub: String): Int =
    s.sliding(sub.length).count(_ == sub)

  test("q3: dimension joins broadcast; filters reach the parquet scan") {
    val p = plan("q3_top_orders")
    assert(countOccurrences(p, "BroadcastHashJoin") == 2, p.take(500))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), GreaterThan(l_shipdate"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q5: six-way join stays broadcast at dim sizes; no cartesian") {
    val p = plan("q5_region_revenue")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("seq_pack: corpus cumsum windows per id-bucket; only the tiny bucket-totals table hits one partition") {
    val p = plan("seq_pack")
    // the corpus-wide window must be PARTITIONED on _bk (local per-bucket
    // sort), never a global orderBy over corpus rows
    assert(p.linesIterator.exists(l => l.contains("Window [sum(") &&
      l.contains("], [_bk#") && l.contains("doc_id#")), p.take(1200))
    // exactly one SinglePartition exchange: the per-bucket totals
    // (#buckets rows), whose running offsets then BROADCAST back
    assert(countOccurrences(p, "Exchange SinglePartition") == 1, p.take(1200))
    assert(p.contains("BroadcastExchange"), "bucket offsets must broadcast")
    assert(p.contains("partial_sum"), "bucket totals must combine map-side")
  }

  test("token_mixture: stratified cumsum per hash-bucket, both small sides broadcast, zero single-partition stages") {
    val p = plan("token_mixture")
    // the corpus window must be PARTITIONED on (stratum, _bk) — the
    // md5-order cumsum never globally sorts a stratum
    assert(p.linesIterator.exists(l => l.contains("Window [sum(") &&
      l.contains("], [lang#") && l.contains("_bk#")), p.take(1200))
    // unlike seq_pack's global stream, the bucket-totals window
    // partitions by stratum — NOTHING in this plan hits one partition
    assert(countOccurrences(p, "Exchange SinglePartition") == 0, p.take(1200))
    // bucket offsets, the per-stratum copy-count stats, and the
    // needs-literal join inside the stats build all broadcast
    assert(countOccurrences(p, "BroadcastHashJoin") == 3, p.take(1200))
    assert(p.contains("partial_sum"), "bucket totals must combine map-side")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("mixture_pack: copy explode feeds a draw-bucketed window; one tiny single-partition stage") {
    val p = plan("mixture_pack")
    // the (doc, copy) placement window partitions on the draw bucket —
    // the global md5 order never sorts the exploded corpus whole
    assert(p.linesIterator.exists(l => l.contains("Window [sum(") &&
      l.contains("], [_bk#") && l.contains("copy#")), p.take(1500))
    // exactly one SinglePartition exchange: packMixture's 256-row
    // bucket-totals table (the mixture stage underneath has none)
    assert(countOccurrences(p, "Exchange SinglePartition") == 1, p.take(1500))
    // copies materialize as Generate explode, never a join against a
    // numbers table
    assert(p.contains("Generate explode(sequence(1, n_copies"), p.take(1500))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("q1: aggregation is partial (map-side) before the exchange") {
    val p = plan("q1_pricing")
    assert(p.contains("partial_sum"))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"))
  }

  test("compaction: one hash shuffle of partial max_by, not a global sort of the log") {
    val p = plan("compaction_publish")
    assert(p.contains("partial_max_by"), "map-side combine missing")
    // exactly one hash exchange (the final orderBy adds a range exchange)
    assert(countOccurrences(p, "Exchange hashpartitioning") == 1, p.take(800))
  }

  test("scan pruning: text_tokens reads only the needed columns") {
    val p = plan("text_tokens")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p.take(800))
  }

  test("ann brute force broadcasts the query side, not the corpus") {
    val p = plan("ann_bruteforce")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"))
  }

  test("dedup_seq: running-max window is a single exchange on producer_name") {
    val p = plan("dedup_seq")
    assert(countOccurrences(p, "Exchange hashpartitioning") == 1, p.take(800))
    assert(p.contains("RunningWindowFunction") || p.contains("Window"))
  }

  test("peek: per-partition rank does not globally sort the log") {
    val p = plan("peek_messages")
    // window partitioned by `partition` -> hash exchange + local sort only
    assert(countOccurrences(p, "Exchange rangepartitioning") <= 1) // only final ORDER BY
  }

  test("peek/examine rank map-side: WindowGroupLimit bounds rows before the exchange") {
    for (q <- Seq("peek_messages", "examine_message")) {
      val p = plan(q)
      assert(p.contains("WindowGroupLimit"), s"$q: ${p.take(400)}")
    }
  }

  test("delayed_due reads the bucketed index with partition pruning") {
    val p = plan("delayed_due")
    assert(p.contains("PartitionFilters: [isnotnull(due_bucket"), p.take(1200))
    assert(p.contains("due_bucket#") && p.contains("<= 20240115"),
      "horizon predicate must prune due buckets at planning time")
  }

  test("annIvfIndexed probe prunes unprobed cells at file-listing time") {
    import org.apache.spark.sql.functions.col
    val vecs = spark.read.parquet(s"$sf001/embeddings.parquet")
    val queries = vecs.filter(col("vec_id") < 5)
    val idx = java.nio.file.Files.createTempDirectory("ivf-gate").toString
    graft.ext.VectorOps.buildIvfIndex(vecs, idx, nlist = 8, iters = 1,
      initMode = "random")
    val probe = graft.ext.VectorOps.annIvfIndexed(queries, idx, 5, nprobe = 2)
    val p = probe.queryExecution.executedPlan.toString
    // the probed cell set must reach the scan as a static PartitionFilter
    // (NOT a post-scan Filter): this is what makes a probe touch only its
    // cells' files at 100 TB
    val pf = p.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("ivf-gate"))
      .find(_.contains("PartitionFilters:"))
      .getOrElse(fail(s"no index scan with PartitionFilters in plan: ${p.take(1500)}"))
    assert(pf.contains("cell#") && pf.contains(" IN "), pf)
    // and the pruning is real: with 5 queries × nprobe=2 over nlist=8,
    // the scan must read fewer than all 8 cell directories
    val probedCells = "IN \\(([^)]*)\\)".r.findFirstMatchIn(pf)
      .map(_.group(1).split(",").length).getOrElse(8)
    assert(probedCells < 8, s"expected a proper subset of cells, got $pf")
  }

  test("hybrid_rrf_pruned: the IVF cell prune survives INSIDE the fused plan") {
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val vecs = spark.read.parquet(s"$sf001/embeddings.parquet")
    val idx = java.nio.file.Files.createTempDirectory("hyb-gate").toString
    graft.ext.VectorOps.buildIvfIndex(vecs, idx, nlist = 8, iters = 1,
      initMode = "random")
    val fused = graft.ext.Hybrid.rrfBatch(docs, vecs,
      Seq((0L, "fast hash join order"), (1L, "stream window agg batch"),
        (2L, "vector scan filter merge")),
      vectorLeg = (_, q, k) => graft.ext.VectorOps.annIvfIndexed(
        q, idx, k, nprobe = 2))
    val p = fused.queryExecution.executedPlan.toString
    // composing the pruned leg into the fusion must not lose the static
    // cell PartitionFilter — at 100 TB this is the difference between a
    // probe-sized and a corpus-sized dense leg
    val pf = p.linesIterator
      .filter(l => l.contains("FileScan") && l.contains("hyb-gate"))
      .find(_.contains("PartitionFilters:"))
      .getOrElse(fail(s"no pruned index scan inside fusion: ${p.take(1500)}"))
    assert(pf.contains("cell#") && pf.contains(" IN "), pf)
    assert(!p.contains("CartesianProduct"))
  }

  test("cdc_apply: one partial max_by aggregation, no window sort, no join") {
    val p = plan("cdc_apply")
    assert(p.contains("partial_max_by"), "map-side combine missing")
    assert(countOccurrences(p, "Exchange hashpartitioning") == 1, p.take(800))
    assert(!p.contains("Window") && !p.contains("Join"),
      "CDC apply must stay a single hash aggregation")
  }

  test("bm25_topk: stats/df sides broadcast, partial aggregation, no cartesian") {
    val p = plan("bm25_topk")
    assert(p.contains("partial_count"), "map-side combine missing on tf/dl aggs")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      "df/stats sides must broadcast")
    assert(!p.contains("CartesianProduct"),
      "the only product is the broadcast scalar stats join")
    assert(!p.contains("SortMergeJoin"), p.take(800))
  }

  test("canal_apply: watermark filter below one partial max_by aggregation, no window, no join") {
    val p = plan("canal_apply")
    assert(p.contains("partial_max_by"), "map-side combine missing")
    assert(countOccurrences(p, "Exchange hashpartitioning") == 1, p.take(800))
    assert(!p.contains("Window") && !p.contains("Join"),
      "canal apply must stay a single hash aggregation")
    // the resume watermark must be applied BEFORE the exchange (it is a
    // row filter on the scan side, not a post-aggregation filter)
    val exchangeIdx = p.indexOf("Exchange hashpartitioning")
    val filterIdx = p.indexOf("mysql-bin.000001")
    assert(filterIdx > exchangeIdx && exchangeIdx >= 0,
      "watermark filter must sit under the exchange (plan prints top-down)")
  }

  test("hash-fraction sampling stays a pure pushed filter (no exchange)") {
    val p = plan("sample_hash")
    // the sample itself adds no shuffle; the query's own aggregate may —
    // so assert the filter sits UNDER the first exchange: scan node
    // carries the md5-substring filter
    val scanSide = p.substring(p.lastIndexOf("Scan parquet"))
    assert(!scanSide.contains("Exchange"), p.take(800))
  }

  test("asof_join: union + one window pass, no join operator at all") {
    val p = plan("asof_join")
    assert(!p.contains("Join"), "as-of must not plan a join:\n" + p.take(800))
    assert(p.contains("Window"), "as-of carries matches with a window function")
    // one hash exchange for the window key; the final ORDER BY adds a
    // range exchange — nothing else
    assert(countOccurrences(p, "Exchange hashpartitioning") == 1, p.take(800))
  }

  test("gopher_quality: zero shuffles — every signal is a per-row expression") {
    val p = plan("gopher_quality")
    assert(countOccurrences(p, "Exchange hashpartitioning") == 0,
      "gopher signals must not shuffle:\n" + p.take(800))
    assert(!p.contains("Generate"), "gopher signals must not explode rows")
    assert(!p.contains("Join"))
  }

  test("line_dedup: exactly the two semantic shuffles (span rank, doc reassembly)") {
    val p = plan("line_dedup")
    assert(countOccurrences(p, "Exchange hashpartitioning") == 2, p.take(800))
    assert(!p.contains("Join"), "span dedup is windows + aggregation, not a join")
    assert(p.contains("partial_count"), "doc reassembly lost map-side combine")
  }

  test("substring_dedup: two semantic shuffles, coverage via window not range join") {
    val p = plan("substring_dedup")
    // window-hash rank + doc_id (reused by both window passes AND the
    // reassembly aggregation) — a range-join formulation would add a
    // third exchange and a Join node
    assert(countOccurrences(p, "Exchange hashpartitioning") == 2, p.take(800))
    assert(!p.contains("Join"), "covered-token test must be a window pass, not a join")
    assert(p.contains("partial_count"), "reassembly lost map-side combine")
  }

  test("sketch tier: partial (map-side) sketch aggregation, sketch side broadcast") {
    for (q <- Seq("heavy_hitters", "quantile_sketch", "spacesaving_topk")) {
      val p = plan(q)
      // TypedImperativeAggregates must run partial+final (the 100 TB
      // contract: executors fold locally, only sketch bytes shuffle)
      assert(p.contains("ObjectHashAggregate"), s"$q: ${p.take(400)}")
      assert(p.contains("partial_"), s"$q: sketch aggregation lost its partial phase")
      // the one-row sketch/estimate side broadcasts, never shuffles the log side twice
      assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"),
        s"$q: sketch side must broadcast")
    }
  }

  test("decontam_bloom: bloom broadcast to the corpus map-side, probe under the first exchange") {
    val p = plan("decontam_bloom")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"),
      "bloom must broadcast:\n" + p.take(600))
    // the bloom_contains probe must run BEFORE any corpus shuffle: the
    // plan below the first hash exchange (bottom-up) carries the filter
    val probeIdx = p.indexOf("bloom_contains")
    assert(probeIdx >= 0, "bloom_contains missing from the plan")
    val lastExchange = p.lastIndexOf("Exchange hashpartitioning")
    assert(lastExchange < probeIdx,
      "bloom probe sits above a corpus shuffle — pre-filter lost its point")
  }

  /**
   * No shuffle in the similarity tier may be keyed on an array column:
   * candidate dedup must distinct on (ids, precomputed scalar sim), never
   * on the minhash signature / embedding arrays themselves. Checked on
   * the optimized logical plan (Aggregate grouping keys and Join keys),
   * which is where a distinct-over-arrays would surface.
   */
  test("simhash pair join partitions by bucket key (shuffle-hash), never broadcast") {
    // the pair join's cost is quadratic in per-key matches — invisible
    // to byte-based planning. A broadcast join here runs the whole
    // O(Σ|bucket|²) generation at input-partition parallelism (r9
    // probe: 10 tasks × ~23 s each at 10×); the gate pins the
    // hash-partitioned form that the bucket-shard split feeds.
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec}
    val qe = SparkEntry.queries("simhash_pairs")(spark, sf001).queryExecution
    // the PAIR join carries the shard columns (_i, _j); the bucket-SIZE
    // join (2 keys, one row per bucket) is legitimately broadcast
    val bhjOnShard = qe.sparkPlan.collect {
      case j: BroadcastHashJoinExec
        if j.leftKeys.exists(_.toString.contains("_i")) => j
    }
    assert(bhjOnShard.isEmpty,
      s"pair join must not broadcast:\n${bhjOnShard.mkString("\n")}")
    val shjOnShard = qe.sparkPlan.collect {
      case j: ShuffledHashJoinExec
        if j.leftKeys.exists(_.toString.contains("_i")) => j
    }
    assert(shjOnShard.nonEmpty, "shard-keyed shuffle-hash join missing:\n" +
      qe.sparkPlan.toString.take(1200))
  }

  test("similarity ops: no shuffle or aggregation keyed on an array column") {
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.types.ArrayType
    for (q <- Seq("minhash_lsh", "simhash_pairs", "ann_lsh", "cosine_near_dup",
                  "semantic_dedup")) {
      val qe = SparkEntry.queries(q)(spark, sf001).queryExecution
      val badAgg = qe.optimizedPlan.collect {
        case a: Aggregate if a.groupingExpressions.exists(_.dataType.isInstanceOf[ArrayType]) => a
      }
      assert(badAgg.isEmpty, s"$q: aggregation keyed on array column:\n${badAgg.mkString("\n")}")
      val badExchange = qe.sparkPlan.collect {
        case e: ShuffleExchangeExec if (e.outputPartitioning match {
          case hp: HashPartitioning => hp.expressions.exists(_.dataType.isInstanceOf[ArrayType])
          case _ => false
        }) => e
      }
      assert(badExchange.isEmpty, s"$q: shuffle hash-keyed on array column:\n${badExchange.mkString("\n")}")
    }
  }

  test("datagen_persons: pure derivation — no exchange except the output sort") {
    val p = plan("datagen_persons")
    assert(countOccurrences(p, "Exchange hashpartitioning") == 0, p.take(800))
    // every field is a codegen'd expression over range(n)
    assert(p.contains("Range (0"), p.take(300))
  }

  test("url_dedup: kernel is per-row; only the group-count window shuffles") {
    val p = plan("url_dedup")
    assert(countOccurrences(p, "Exchange hashpartitioning") == 1, p.take(800))
    assert(!p.contains("Join"), "url dedup must not join")
    // only the two needed columns leave the scan
    assert(p.contains("ReadSchema: struct<doc_id:bigint>"), p.take(800))
  }

  test("multimodal_pipeline: decode is a scalar expression, no RDD scan barrier") {
    val p = plan("multimodal_pipeline")
    assert(!p.contains("ExistingRDD"),
      "media decode must stay a Catalyst expression, not an RDD round trip")
    assert(p.contains("media_meta"), p.take(400))
  }

  test("file_sink_roundtrip: read-back explodes per file, one count aggregation") {
    val p = plan("file_sink_roundtrip")
    assert(p.contains("partial_count") || p.contains("partial_"),
      "count must combine map-side")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"), p.take(500))
  }

  test("char_entropy: zero shuffles — the signal is a per-row kernel") {
    val p = plan("char_entropy")
    assert(countOccurrences(p, "Exchange hashpartitioning") == 0, p.take(800))
    assert(!p.contains("Join"), "entropy must not join")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"), p.take(800))
  }

  test("topic_stats: partial storage aggs, broadcast cursor sides, hashed anti-join, no row sort") {
    val p = plan("topic_stats")
    // storage counters combine map-side before the partition exchange
    assert(p.contains("partial_count") && p.contains("partial_sum"), p.take(800))
    // backlog/mark-delete sides are (sub × partition)-sized → broadcast
    assert(countOccurrences(p, "BroadcastHashJoin") >= 2, p.take(1200))
    // the data-scale backlog anti-join HASHES on the shuffled ack side:
    // never broadcast (the ack side grows with the log) and never
    // sort-merged (three narrow numeric columns compress so well that
    // AQE coalescing hands SMJ multi-million-row sort tasks — measured
    // in the 100× stats probe, SNAPSHOTS.md r8)
    assert(p.contains("ShuffledHashJoin") && p.contains("LeftAnti"), p.take(1200))
    assert(!p.matches("(?s).*BroadcastHashJoin[^\\n]*LeftAnti.*"),
      "ack side must shuffle, not broadcast:\n" + p.take(1200))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p.take(800))
    // mark-delete is derived sort-free: the only Sort is the output orderBy
    assert(countOccurrences(p, "Sort ") <= 1,
      "mark-delete must not introduce row sorts:\n" + p.take(1200))
  }

  test("ccnet_buckets scoring stage: model tables broadcast, partial decimal sums") {
    // the scoring stage is materialized behind a checkpoint in the full
    // query (five consumers would recompute it otherwise), so its plan
    // shape is gated here directly
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val p = graft.ext.LmScore.score(docs,
        org.apache.spark.sql.functions.col("source")
          .isin("src0", "src1", "src2", "src3"))
      .queryExecution.executedPlan.toString
    // trigram/bigram/vocab model sides are bounded (charset^3 per
    // language) and must broadcast to the per-doc scoring stream
    assert(countOccurrences(p, "BroadcastHashJoin") >= 3, p.take(1200))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p.take(800))
    // decimal score sum combines map-side
    assert(p.contains("partial_sum"), p.take(800))
  }

  test("ccnet_buckets assignment: broadcast cutoffs, no per-language row sort") {
    val p = plan("ccnet_buckets")
    // NTILE is replayed via broadcast cutoffs — the literal ntile (one
    // reducer sorts a whole language) must never reappear
    assert(!p.contains("ntile("), "literal ntile must not be in the plan:\n" + p.take(1200))
    // the one-row-per-language cutoff table broadcasts to the rows
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
    // both the histogram path and the tie-rank path must read the one
    // materialized scored table, not recompute the scoring lineage
    assert(countOccurrences(p, "Scan ExistingRDD") >= 2, p.take(1200))
    // every row-level window must be keyed finer than lang alone; the
    // only lang-keyed window runs over the aggregated score histogram
    // (sparkPlan, not executedPlan: AQE hides the tree behind
    // AdaptiveSparkPlanExec until execution)
    val exec = SparkEntry.queries("ccnet_buckets")(spark, sf001)
      .queryExecution.sparkPlan
    val wins = exec.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(wins.nonEmpty, "expected tie-rank + histogram windows")
    wins.foreach { w =>
      if (w.partitionSpec.length < 2) {
        val childAggs = w.child.collect {
          case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
        }
        assert(childAggs.nonEmpty,
          s"lang-only window must run over the aggregated histogram, not rows:\n$w")
      }
    }
  }

  test("dsir_sample: top-k is TakeOrdered, weights broadcast, one materialized feature table") {
    val p = plan("dsir_sample")
    // selection must be a distributed top-k, never a single-partition
    // window over the whole corpus (the rank window runs post-limit on
    // k rows only)
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
    // the <=4096-row cell-weight table broadcasts to the per-doc side
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    // the decimal weight sum combines map-side; the (doc, cell) count
    // table itself is checkpointed (computed once for both consumers),
    // so it surfaces as a materialized scan, not a repeated explode
    assert(p.contains("partial_sum"), p.take(800))
    assert(countOccurrences(p, "Scan ExistingRDD") >= 2,
      "both consumers must read the one materialized feature table:\n" + p.take(800))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p.take(800))
  }

  test("semantic_dedup: centroids broadcast, pair stage joins on cluster, no cartesian") {
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    import org.apache.spark.sql.types.LongType
    val qe = SparkEntry.queries("semantic_dedup")(spark, sf001).queryExecution
    val p = qe.executedPlan.toString
    assert(!p.contains("CartesianProduct"), "pair stage must key on cluster")
    // tiny 2^clusterBits x dim centroid table broadcast to the corpus side
    assert(p.contains("BroadcastHashJoin"), p.take(800))
    // the removal set distincts on the id ALONE — the dedup exchange
    // carries 8-byte keys, never vectors (array keys are also banned by
    // the similarity-tier gate above)
    val idOnlyDistinct = qe.optimizedPlan.collect {
      case a: Aggregate if a.aggregateExpressions.length == 1 &&
        a.groupingExpressions.length == 1 &&
        a.groupingExpressions.head.dataType == LongType => a
    }
    assert(idOnlyDistinct.nonEmpty,
      "removal set must be a distinct over the single id column:\n" +
        qe.optimizedPlan.toString.take(1200))
  }

  test("pq_recall: ADC pair stage is native kernels, not interpreted HOFs") {
    val p = plan("pq_recall")
    // encode + LUT + gather-score kernels present (all real codegen)...
    assert(p.contains("pq_encode"), p.take(800))
    assert(p.contains("pq_adc_lut"), p.take(800))
    assert(p.contains("pq_adc_score"), p.take(800))
    // ...and no higher-order-function fallback anywhere in the hot path
    // (the pre-kernel formulation: 128 nested interpreted aggregates per
    // row over a ~1k-literal codebook tree, 2.5-52 s/run at sf0.1)
    assert(!p.contains("zip_with") && !p.contains("aggregate(lambda"),
      "interpreted HOF leaked back into the ADC path:\n" + p.take(1200))
    // query side (LUT) broadcasts; the corpus side never shuffles vectors
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      p.take(800))
  }

  test("pattern_subscribe polls prune partitions, push offset bounds, and never scan non-matching topics") {
    val p = plan("pattern_subscribe")
    // cursor→high-water range reaches the parquet footer stats
    assert(p.contains("PushedFilters: [IsNotNull(offset), Or("), p.take(1200))
    // the per-partition arm of the range prunes hive partitions
    assert(p.contains("PartitionFilters: [((((partition"), p.take(1200))
    // column pruning: the aggregate needs only offset/event_type (+ the
    // partition dir column) — a full-envelope read would be wrong
    assert(p.contains("ReadSchema: struct<offset:bigint,event_type:string>"),
      p.take(1200))
    // the non-matching topic is filtered at DISCOVERY (driver metadata),
    // so no plan branch ever lists its files
    assert(!p.contains("other-view"), "non-matching topic reached the plan")
  }

  test("hybrid_rrf: legs top-k-bounded before fusion; bm25 dims broadcast; no cartesian") {
    val p = plan("hybrid_rrf")
    assert(!p.contains("CartesianProduct"))
    // the lexical leg's TakeOrdered(50) and the final fused TakeOrdered(10)
    // must both exist — without them the fusion join would see
    // corpus-sized inputs instead of O(k) rows
    assert(p.contains("TakeOrderedAndProject(limit=50"), p.take(1200))
    assert(p.contains("TakeOrderedAndProject(limit=10"), p.take(1200))
    // df/dl joins inside bm25 broadcast their small sides
    assert(p.contains("BroadcastHashJoin"), p.take(1200))
  }

  test("hybrid_rrf_batch: per-query rank windows are WindowGroupLimit-pruned map-side") {
    val p = plan("hybrid_rrf_batch")
    // the lexical top-50, the dense leg's top-50, and the fused top-10
    // per-query windows must all carry Partial+Final WindowGroupLimit —
    // without map-side rank pruning, a stopword-heavy query's match set
    // (potentially the whole corpus) would be fully sorted inside one
    // query_id partition
    assert(countOccurrences(p, "row_number(), 50, Partial") == 2, p.take(1600))
    assert(countOccurrences(p, "row_number(), 50, Final") == 2, p.take(1600))
    assert(countOccurrences(p, "row_number(), 10, Partial") == 1, p.take(1600))
    assert(!p.contains("CartesianProduct"))
  }

  test("reader_scan: every partition branch prunes its hive partition and pushes offset bounds") {
    val p = plan("reader_scan")
    // four positioned branches, each pruned to ONE partition directory
    // with the [from, high-water] offset range in PushedFilters — the
    // reference Reader's ledger-range scan, here as footer-stats skips
    assert(countOccurrences(p, "GreaterThanOrEqual(offset,100)") == 4, p.take(1600))
    assert(countOccurrences(p, "PartitionFilters: [isnotnull(partition") == 4,
      p.take(1600))
    assert(p.contains("ReadSchema: struct<offset:bigint>"),
      "reader aggregate must prune to the offset column")
  }

  test("session watermark config: event-time watermark + session merge nodes in the stream plan") {
    val stream = graft.model.Envelope.fromEventsStream(spark, sf001)
    val agg = graft.operators.Windows.session(stream,
      graft.model.Envelope.EventTime, "30 minutes",
      keys = Seq(org.apache.spark.sql.functions.col(graft.model.Envelope.Key)),
      aggs = Seq(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n")),
      maxLag = Some("1 second"))
    assert(agg.isStreaming)
    val analyzed = agg.queryExecution.analyzed.toString
    assert(analyzed.contains("EventTimeWatermark"), analyzed.take(800))
    assert(analyzed.contains("session_window"), analyzed.take(800))
  }
}
