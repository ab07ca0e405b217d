package graft

import graft.model.Envelope
import graft.operators.{AsOfJoin, Compaction, Dedup, Dispatch, Produce, Windows}
import graft.ext.{Graph, MinHash, TextOps, VectorOps}
import graft.functions.Murmur3Pulsar

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LLM-pipeline text/vector tier: tokenize/normalize/quality, exact and near dedup, ANN family, streaming dedup/decontamination and the composed clean-corpus stream.
  *
  * One domain slice of the driver-contract registry: `queries` holds
  * this domain's `SparkEntry.queries` entries, `oracleSql` the
  * matching DuckDB oracles; [[SparkEntry]] concatenates the slices.
  * Split from the former single-file registry for hygiene — no
  * behavior change, same 161 keys. Shared helpers and oracle CTE
  * fragments live in [[EntryShared]]. */
private[graft] object EntryText {
  import EntryShared._

  /** Token stats per document. */
  private def qTextTokens(s: SparkSession, dir: String): DataFrame =
    TextOps.withTokenStats(tbl(s, dir, "documents"))
      .select(col("doc_id"), col("n_tokens").cast("bigint").as("n_tokens"),
        col("avg_token_len"))
      .orderBy("doc_id")

  /** BPE-style pre-tokenizer counts beside whitespace counts — the
    * token-budget signal; DuckDB replays the identical RE2-safe pattern
    * so counts match exactly. */
  /** Unicode cleaning: every document gets a deterministic dirty suffix
    * (decomposed e+COMBINING ACUTE, a precomposed é, a BEL control) and
    * runs through NFC + control-strip; the md5 of each cleaned document
    * must match DuckDB's nfc_normalize + regexp_replace byte-for-byte —
    * any divergence in composition or the strip class breaks the hash. */
  private def qTextNormalize(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents")
      .select(col("doc_id"),
        md5(TextOps.normalizeText(concat(col("text"),
          lit(" cafe\u0301 \u00e9\u0007tail")))).as("norm_md5"))
      .orderBy("doc_id")

  /** URL-level dedup (the CCNet/C4 key): every document gets a noisy
    * fixture URL from one of four templates — mixed case + default port
    * + dot-segments + tracking params + fragment vs. already-clean, and
    * an escaped-~ pair differing only in hex case vs. fragment — and
    * runs through the RFC 3986 canonicalizer kernel. Templates 0/1 and
    * 2/3 canonicalize to the SAME url per id group, so the group sizes
    * prove dedup; the oracle states each template's canonical closed
    * form directly, so a hash match proves the kernel recovers it on
    * every noise class. */
  private def qUrlDedup(s: SparkSession, dir: String): DataFrame = {
    val g = expr("doc_id div 4").cast("string")
    val t = col("doc_id") % 4
    val noisy = when(t === 0, concat(lit("HTTP://Example.COM:80/a/./x/../p"), g,
        lit("/?utm_source=x&b=2&a=1#frag")))
      .when(t === 1, concat(lit("http://example.com/a/p"), g, lit("/?b=2&a=1")))
      .when(t === 2, concat(lit("HTTPS://example.com:443/%7eq/p"), g))
      .otherwise(concat(lit("https://example.com/%7Eq/p"), g, lit("#sec")))
    tbl(s, dir, "documents")
      .select(col("doc_id"), graft.functions.Sketch.url_canonicalize(noisy).as("url_canon"))
      .withColumn("group_n",
        count(lit(1)).over(Window.partitionBy("url_canon")).cast("bigint"))
      .orderBy("doc_id")
  }

  /** BM25 top-10 lexical retrieval over the documents table; the oracle
    * replays the identical tokenization and Okapi formula in SQL and
    * ranks by the same rounded score. */
  private def qBm25(s: SparkSession, dir: String): DataFrame =
    TextOps.bm25TopK(tbl(s, dir, "documents"), "fast hash join order", 10)

  private def qBpeTokens(s: SparkSession, dir: String): DataFrame =
    TextOps.withBpeTokenCount(TextOps.withTokenStats(tbl(s, dir, "documents")))
      .select(col("doc_id"), col("n_bpe_tokens"),
        col("n_tokens").cast("bigint").as("n_ws_tokens"),
        (col("n_bpe_tokens").cast("double") / col("n_tokens")).as("bpe_per_word"))
      .orderBy("doc_id")

  /** Language-ID heuristic distribution. */
  private def qLangId(s: SparkSession, dir: String): DataFrame =
    TextOps.withLangId(tbl(s, dir, "documents"))
      .groupBy("lang_pred").agg(count(lit(1)).cast("bigint").as("n"))
      .orderBy("lang_pred")

  /** Quality scores aggregated per source (decimal-exact averages). */
  private def qQuality(s: SparkSession, dir: String): DataFrame =
    TextOps.withQualityScore(tbl(s, dir, "documents"))
      .groupBy("source")
      .agg(count(lit(1)).cast("bigint").as("n"),
        sum(col("stopword_ratio").cast("decimal(18,9)")).cast("double").as("sum_stopword_ratio"),
        sum(col("punct_ratio").cast("decimal(18,9)")).cast("double").as("sum_punct_ratio"),
        sum(col("mean_word_len").cast("decimal(18,9)")).cast("double").as("sum_mean_word_len"))
      .orderBy("source")

  /** Exact-duplicate groups by content hash (md5). */
  private def qDedupExact(s: SparkSession, dir: String): DataFrame =
    TextOps.exactDupGroups(tbl(s, dir, "documents"))
      .select(col("content_hash"), col("dup_count").cast("bigint").as("dup_count"),
        col("keep_id"))
      .orderBy("content_hash")

  /** N-gram (5-gram) Jaccard near-duplicate pairs. maxDf caps hot-shingle
    * posting lists (the skew bound); near-dup clusters are a handful of
    * docs, so 250 loses nothing while bounding the worst list at 250². */
  private def qJaccardPairs(s: SparkSession, dir: String): DataFrame =
    TextOps.jaccardPairs(tbl(s, dir, "documents"), n = 5, threshold = 0.5,
        maxDf = 250)
      .orderBy("id_a", "id_b")

  /** Normalized-fingerprint duplicate groups (md5 form so the oracle can
    * replicate; production path keys on the 8-byte xxhash64 twin). */
  private def qFingerprint(s: SparkSession, dir: String): DataFrame =
    TextOps.withFingerprint(tbl(s, dir, "documents"))
      .groupBy("fp_norm_md5").agg(count(lit(1)).cast("bigint").as("n"),
        min("doc_id").as("keep_id"))
      .orderBy("fp_norm_md5")

  /** MinHash-LSH near-dup pairs, exact-verified: banded candidates, then
    * exact Jaccard ≥ 0.8 on the shingle sets. Oracle = DuckDB brute-force
    * 3-gram Jaccard — candidate recall at 0.8 with 16 bands is 1-8e-8,
    * so the emitted set equals the true set and hash-matches. */
  private def qMinHashLsh(s: SparkSession, dir: String): DataFrame =
    MinHash.lshVerifiedPairs(tbl(s, dir, "documents"), threshold = 0.8)
      .orderBy("id_a", "id_b")

  /** SimHash near-dup pairs (Hamming ≤ 7 block-permuted candidates,
    * 8 blocks × 8 bits), exact-verified at Jaccard ≥ 0.9 against the
    * brute-force oracle — the near-identical tier where the Hamming
    * bound gives full recall (a 0.89-Jaccard pair can flip 8+ bits).
    * The 0.8 tier is minhash_lsh's claim; together the two paths bracket
    * the dedup spectrum. */
  private def qSimHash(s: SparkSession, dir: String): DataFrame =
    MinHash.simhashVerifiedPairs(tbl(s, dir, "documents"), maxHamming = 7,
        threshold = 0.9)
      .orderBy("id_a", "id_b")

  /** Transitive near-dup groups: MinHash-LSH verified pairs (≥ 0.8, the
    * minhash_lsh truth set) fed through large-star/small-star connected
    * components — doc A~B, B~C collapse into one group even when A~C was
    * never an LSH candidate. Oracle walks the same pair graph with a
    * recursive CTE. */
  private def qDupGroups(s: SparkSession, dir: String): DataFrame =
    Graph.dupGroups(
        MinHash.lshVerifiedPairs(tbl(s, dir, "documents"), threshold = 0.8))
      .orderBy("doc_id")

  /** Leakage-safe 80/10/10 split: one draw per near-dup GROUP, so no
    * duplicate cluster straddles train/test. The oracle recomputes the
    * groups with the dup_groups recursive CTE and replays the md5
    * threshold arithmetic. */
  private def qLeakageSplit(s: SparkSession, dir: String): DataFrame =
    ext.Sampling.leakageSafeSplit(
        tbl(s, dir, "documents").select("doc_id"),
        MinHash.lshVerifiedPairs(tbl(s, dir, "documents"), threshold = 0.8),
        weights = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
        salt = "split|")
      .select(col("doc_id"), col("group_id"), col("split"))
      .orderBy("doc_id")

  /** As-of join: each error event picks the latest click at-or-before it
    * by the same user (ties: larger event_id). Union + one window pass —
    * no join explosion; oracle is a DuckDB lateral top-1 probe. */
  private def qAsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = model.Envelope.normalizeTs(tbl(s, dir, "events"))
    val errors = ev.filter(col("event_type") === "error")
      .select("event_id", "user_id", "ts")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    AsOfJoin.asof(errors, clicks, Seq("user_id"), "ts", "ts", "event_id", Seq("value"))
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("matched.event_id").as("click_event"),
        unix_micros(col("matched.ts")).as("click_ts_us"),
        col("matched.value").as("click_value"))
      .orderBy("event_id")
  }

  /** Forward as-of (earliest click at-or-after each error; smaller
    * event_id tie-break) — the same single-window-pass operator in the
    * opposite scan direction, against a mirrored lateral-probe oracle. */
  private def qAsofForward(s: SparkSession, dir: String): DataFrame = {
    val ev = model.Envelope.normalizeTs(tbl(s, dir, "events"))
    val errors = ev.filter(col("event_type") === "error")
      .select("event_id", "user_id", "ts")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    AsOfJoin.asof(errors, clicks, Seq("user_id"), "ts", "ts", "event_id",
        Seq("value"), direction = AsOfJoin.Direction.Forward)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("matched.event_id").as("click_event"),
        unix_micros(col("matched.ts")).as("click_ts_us"),
        col("matched.value").as("click_value"))
      .orderBy("event_id")
  }

  /** Brute-force exact top-5 cosine neighbors for 20 query vectors. */
  private def qAnnBrute(s: SparkSession, dir: String): DataFrame = {
    val vecs = tbl(s, dir, "embeddings")
    val queries = vecs.filter(col("vec_id") < 20)
    VectorOps.annBruteForce(vecs, queries, 5)
      .select(col("query_id"), col("rank").cast("bigint").as("rank"),
        col("corpus_id"), round(col("sim"), 6).as("sim_r"))
      .orderBy("query_id", "rank")
  }

  /** LSH-bucketed approximate ANN. The murmur3-derived hyperplanes are
    * reproducible in pure SQL, so the oracle recomputes the SAME buckets,
    * candidates and ranks in DuckDB — an exact hash-match on an
    * approximate operator. */
  private def qAnnLsh(s: SparkSession, dir: String): DataFrame = {
    val vecs = tbl(s, dir, "embeddings")
    val queries = vecs.filter(col("vec_id") < 20)
    VectorOps.annLsh(vecs, queries, 5, dim = 64)
      .select(col("query_id"), col("rank").cast("bigint").as("rank"),
        col("corpus_id"), round(col("sim"), 6).as("sim_r"))
      .orderBy("query_id", "rank")
  }

  /** IVF ANN in exact mode (nprobe = nlist): every cell is probed, so
    * the result provably equals brute-force top-k regardless of where
    * k-means placed the centroids — the whole quantize→probe→verify
    * machinery runs end-to-end against the brute-force oracle. Partial
    * probes (the recall trade) are covered by ExtOpsSpec. */
  private def qAnnIvf(s: SparkSession, dir: String): DataFrame = {
    val vecs = tbl(s, dir, "embeddings")
    val queries = vecs.filter(col("vec_id") < 20)
    // iters=1 + random init: with every cell probed, centroid quality
    // cannot affect the result — don't pay for Lloyd refinement or the
    // multi-job k-means|| seeding the query can't see
    VectorOps.annIvf(vecs, queries, 5, nlist = 8, nprobe = 8, iters = 1,
      initMode = "random")
      .select(col("query_id"), col("rank").cast("bigint").as("rank"),
        col("corpus_id"), round(col("sim"), 6).as("sim_r"))
      .orderBy("query_id", "rank")
  }

  /** IVF ANN probing a DISK-MATERIALIZED index: buildIvfIndex lays the
    * corpus out hive-partitioned by cell + centroid sidecar, and the
    * probe pushes its cell set as a static PartitionFilter (gated in
    * PlanQualitySpec). Exact mode (nprobe = nlist) ≡ brute force, so the
    * same oracle as ann_ivf proves the whole write→prune→probe path. */
  private def qAnnIvfIndexed(s: SparkSession, dir: String): DataFrame = {
    val vecs = tbl(s, dir, "embeddings")
    val queries = vecs.filter(col("vec_id") < 20)
    val idx = java.nio.file.Files.createTempDirectory("ivf-index").toString
    VectorOps.buildIvfIndex(vecs, idx, nlist = 8, iters = 1, initMode = "random")
    VectorOps.annIvfIndexed(queries, idx, 5, nprobe = 8)
      .select(col("query_id"), col("rank").cast("bigint").as("rank"),
        col("corpus_id"), round(col("sim"), 6).as("sim_r"))
      .orderBy("query_id", "rank")
  }

  /** Product-quantization recall certificate: PQ codebooks fit on the
    * corpus (seeded, capped sample), every vector encoded to m=8 codes,
    * ADC top-10 for 20 queries compared against exact brute force IN
    * the query. The fixture embeddings are uniform-random — the hostile
    * case for PQ, with no cluster structure to exploit — so absolute
    * recall is modest (measured 0.18–0.33 across sf0.001–0.1) while
    * CHANCE recall is 10/N (0.5% at sf0.01): the certificate asserts
    * recall ≥ 0.1, a 3× margin below measurements and ≥20× above
    * chance, plus the exact expected candidate count. */
  private def qPqRecall(s: SparkSession, dir: String): DataFrame = {
    val vecs = tbl(s, dir, "embeddings")
    val queries = vecs.filter(col("vec_id") < 20)
    val cb = VectorOps.pqTrain(vecs, dim = 64, m = 8, ksub = 16, iters = 5)
    val coded = VectorOps.withPqCodes(vecs, cb)
    val adc = VectorOps.annPq(coded, queries, 10, cb)
      .select(col("query_id"), col("corpus_id"), lit(1).as("hit"))
    VectorOps.annBruteForce(vecs, queries, 10)
      .join(adc, Seq("query_id", "corpus_id"), "left")
      .agg(count(lit(1)).cast("bigint").as("n_exact"),
        sum(coalesce(col("hit"), lit(0))).as("n_hit"))
      .select(col("n_exact"),
        (col("n_hit").cast("double") / col("n_exact") >= 0.1).as("recall_ok"))
  }

  /** Embedding-cosine near-duplicate pairs (rows-only oracle).
    * Threshold 0.4: the synthetic embeddings top out at cosine ≈ 0.49, so
    * 0.4 exercises candidate-generation + verify with non-empty output. */
  private def qCosineNearDup(s: SparkSession, dir: String): DataFrame =
    VectorOps.cosineNearDupPairs(tbl(s, dir, "embeddings"), 0.4, dim = 64)
      .select(col("id_a"), col("id_b"), round(col("sim"), 6).as("sim_r"))
      .orderBy("id_a", "id_b")

  /** SemDeDup cluster-then-prune semantic dedup; the oracle replays the
    * sign-LSH quantizer, the decimal-exact centroids and the
    * farthest-from-centroid keep rule in pure SQL. */
  private def qSemanticDedup(s: SparkSession, dir: String): DataFrame =
    VectorOps.semanticDedup(tbl(s, dir, "embeddings"), 0.3)
      .orderBy("vec_id")

  /** Streaming near-dup filter against the persisted two-level LSH
    * index (ext.NearDupStream): the documents table arrives as three
    * mtime-ordered slices (doc_id % 3), one per microbatch; each batch
    * is exact-verify deduplicated against everything previously INDEXED
    * plus its own earlier (smaller-id) rows, then appended to the
    * index. Dropped iff an earlier-ARRIVING doc has shingle-set
    * Jaccard >= 0.8 — the oracle brute-forces the identical
    * arrival-ordered rule ((a%3, a) <lex (b%3, b)) in SQL. */
  private def qStreamNearDup(s: SparkSession, dir: String): DataFrame = {
    val docs = tbl(s, dir, "documents").select("doc_id", "text")
    val root = Fixtures.dir(s, dir, "q-ndstream") { r =>
      val base = System.currentTimeMillis() - 10000L
      (0 until 3).foreach { i =>
        writeStreamSlice(docs.filter(col("doc_id") % 3 === i), r,
          f"slice_$i%02d.parquet", base + i * 2000L)
      }
    }
    val out = java.nio.file.Files.createTempDirectory("graft-nd-out")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-nd-ckpt")
    val idx = java.nio.file.Files.createTempDirectory("graft-nd-idx")
    streamOutRoots.add(out); streamOutRoots.add(ckpt); streamOutRoots.add(idx)
    // compactEvery=2: batch 2 folds index epochs 0-1 mid-run, so this
    // oracle row ALSO proves compaction is content-preserving — the
    // last batch's verdicts come entirely off the folded layout
    drainGuarded(s, ext.NearDupStream.run(
      s.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "*.parquet").parquet(root),
      idx.toString, out.toString, ckpt.toString, threshold = 0.8,
      compactEvery = Some(2)))
    val kept = s.read.parquet(out.toString)
      .select(col("doc_id"), lit(true).as("k"))
    docs.select("doc_id").join(kept, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), coalesce(col("k"), lit(false)).as("kept"))
      .orderBy("doc_id")
  }

  /** Streaming SEMANTIC dedup against the persisted cluster-pruned
    * vector index (ext.SemanticDedupStream): the embeddings table
    * arrives as three mtime-ordered slices (vec_id % 3), one per
    * microbatch; each batch drops vectors whose sign-LSH cluster holds
    * an earlier-ARRIVING vector with round(cosine, 6) >= 0.3 (all-seen:
    * dropped earlier vectors still count), then appends ALL its vectors
    * to the index. clusterBits pinned to 6 — the corpus-scale value the
    * batch semantic_dedup auto-sizes to at sf0.01 — because the index's
    * cluster definition is a lifetime constant, not per-batch. The
    * oracle brute-forces the identical arrival-ordered rule. */
  private def qStreamSemanticDedup(s: SparkSession, dir: String): DataFrame = {
    val vecs = tbl(s, dir, "embeddings").select("vec_id", "embedding")
    val root = Fixtures.dir(s, dir, "q-sdstream") { r =>
      val base = System.currentTimeMillis() - 10000L
      (0 until 3).foreach { i =>
        writeStreamSlice(vecs.filter(col("vec_id") % 3 === i), r,
          f"slice_$i%02d.parquet", base + i * 2000L)
      }
    }
    val out = java.nio.file.Files.createTempDirectory("graft-sd-out")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sd-ckpt")
    val idx = java.nio.file.Files.createTempDirectory("graft-sd-idx")
    streamOutRoots.add(out); streamOutRoots.add(ckpt); streamOutRoots.add(idx)
    // compactEvery=2: batch 2 folds index epochs 0-1 mid-run, so this
    // row ALSO proves the vector-index fold is content-preserving
    drainGuarded(s, ext.SemanticDedupStream.run(
      s.readStream.schema(vecs.schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "*.parquet").parquet(root),
      idx.toString, out.toString, ckpt.toString, threshold = 0.3,
      clusterBits = 6, compactEvery = Some(2)))
    val kept = s.read.parquet(out.toString)
      .select(col("vec_id"), lit(true).as("k"))
    vecs.select("vec_id").join(kept, Seq("vec_id"), "left_outer")
      .select(col("vec_id"), coalesce(col("k"), lit(false)).as("kept"))
      .orderBy("vec_id")
  }

  /** The end-to-end clean-corpus pipeline as ONE stream
    * (ext.CleanCorpusStream): quality filter → exact dedup → near-dup
    * filter, each stage checked against persisted indexes of
    * everything seen before. The documents table arrives as three
    * RANGE slices (id-ordered arrival), so every stage's
    * arrival-ordered rule coincides with the batch operators'
    * id-ordered rule and the oracle can state the batch composition
    * directly: quality → min-id-per-md5 exact dedup → all-seen
    * 3-shingle Jaccard ≥ 0.8, aggregated per language like the batch
    * capstone. compactEvery=2 folds all three index levels mid-run. */
  private def qPipelineCleanStream(s: SparkSession, dir: String): DataFrame = {
    val docs = tbl(s, dir, "documents").select("doc_id", "text", "lang")
    val root = Fixtures.dir(s, dir, "q-ccstream") { r =>
      // maxId only shapes the slice boundaries — computed inside the
      // cached fixture build so re-invocations pay no aggregate job
      val maxId = docs.agg(max("doc_id")).head().getLong(0)
      val (b1, b2) = (maxId / 3, 2 * maxId / 3)
      val base = System.currentTimeMillis() - 10000L
      val slices = Seq(col("doc_id") <= b1,
        col("doc_id") > b1 && col("doc_id") <= b2, col("doc_id") > b2)
      slices.zipWithIndex.foreach { case (cond, i) =>
        writeStreamSlice(docs.filter(cond), r,
          f"slice_$i%02d.parquet", base + i * 2000L)
      }
    }
    val out = java.nio.file.Files.createTempDirectory("graft-cc-out")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-cc-ckpt")
    val idx = java.nio.file.Files.createTempDirectory("graft-cc-idx")
    streamOutRoots.add(out); streamOutRoots.add(ckpt); streamOutRoots.add(idx)
    drainGuarded(s, ext.CleanCorpusStream.run(
      s.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "*.parquet").parquet(root),
      idx.toString, out.toString, ckpt.toString, threshold = 0.8,
      compactEvery = Some(2)))
    s.read.parquet(out.toString)
      .groupBy("lang")
      .agg(count(lit(1)).cast("bigint").as("n_docs"),
        sum(size(ext.TextOps.tokens(col("text"))).cast("bigint")).cast("bigint")
          .as("total_tokens"))
      .orderBy("lang")
  }

  /** Streaming GPT-style sequence packing (ext.SeqPackStream): the
    * documents table arrives as three RANGE slices (id-ordered
    * arrival), each batch continuing the concatenated token stream
    * from the persisted `_offset` state — so the union of the epoch
    * outputs equals batch packSequences over the whole corpus and the
    * oracle is the identical SQL as `seq_pack`. */
  private def qSeqPackStream(s: SparkSession, dir: String): DataFrame = {
    val docs = tbl(s, dir, "documents")
      .select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
    val root = Fixtures.dir(s, dir, "q-spstream") { r =>
      // maxId only shapes the slice boundaries — computed inside the
      // cached fixture build so re-invocations pay no aggregate job
      val maxId = docs.agg(max("doc_id")).head().getLong(0)
      val (b1, b2) = (maxId / 3, 2 * maxId / 3)
      val base = System.currentTimeMillis() - 10000L
      val slices = Seq(col("doc_id") <= b1,
        col("doc_id") > b1 && col("doc_id") <= b2, col("doc_id") > b2)
      slices.zipWithIndex.foreach { case (cond, i) =>
        writeStreamSlice(docs.filter(cond), r,
          f"slice_$i%02d.parquet", base + i * 2000L)
      }
    }
    val out = java.nio.file.Files.createTempDirectory("graft-sp-out")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-sp-ckpt")
    streamOutRoots.add(out); streamOutRoots.add(ckpt)
    drainGuarded(s, ext.SeqPackStream.run(
      s.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "*.parquet").parquet(root),
      out.toString, ckpt.toString, seqLen = 64L, tokensCol = "n_tokens",
      bucketWidth = 64L))
    s.read.parquet(out.toString)
      .select(col("doc_id"), col("seq_id"), col("tok_start"),
        col("tok_end"), col("seq_off"))
      .orderBy("doc_id", "seq_id")
  }

  /** Epoch-weighted token-budget mixture (ext.Sampling.tokenMixture —
    * GPT-3 Table 2.2's composition rule): binary-exact per-language
    * weights against a fixed 65536-token budget. At sf0.01 the en/de
    * weights demand more tokens than exist (whole-epoch upsampling,
    * n_copies ≥ 2) while zh fills fractionally via the md5-rank
    * remainder prefix (hash-prefix distributed prefix sum). Output:
    * the per-doc loader repeat counts. */
  private def qTokenMixture(s: SparkSession, dir: String): DataFrame = {
    val d = tbl(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
    ext.Sampling.tokenMixture(d, "lang",
        weights = Map("en" -> 0.4375, "de" -> 0.25, "es" -> 0.125,
          "fr" -> 0.125, "zh" -> 0.0625),
        budgetTokens = 65536L, tokensCol = "n_tokens", salt = "mixt|")
      .select(col("doc_id"), col("lang"),
        col("n_copies").cast("bigint").as("n_copies"))
      .orderBy("doc_id")
  }

  /** Mixture materialization (ext.Sampling.packMixture): the
    * token_mixture recipe's (doc, copy) pairs placed in one GLOBAL
    * md5 order — whole-epoch copies interleave across strata — and
    * cut into 64-token training sequences. The loader-facing end of
    * corpus composition; the oracle replays the copy explode, the
    * draw order, and the span arithmetic verbatim. */
  private def qMixturePack(s: SparkSession, dir: String): DataFrame = {
    val d = tbl(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
    val mixed = ext.Sampling.tokenMixture(d, "lang",
      weights = Map("en" -> 0.4375, "de" -> 0.25, "es" -> 0.125,
        "fr" -> 0.125, "zh" -> 0.0625),
      budgetTokens = 65536L, tokensCol = "n_tokens", salt = "mixt|")
    ext.Sampling.packMixture(mixed, seqLen = 64L, "n_tokens", salt = "mp|")
      .select(col("doc_id"), col("copy").cast("bigint").as("copy"),
        col("seq_id"), col("tok_start"), col("tok_end"), col("seq_off"))
      .orderBy("doc_id", "copy", "seq_id")
  }

  /** Streaming token-budget mixture admission (ext.MixtureStream): the
    * documents table arrives as three RANGE slices (id-ordered
    * arrival); each batch admits docs while their language's token
    * budget (floor(w · 8192)) is unexhausted, carrying per-language
    * totals across batches in the `_mixstate` files. On id-ordered
    * arrival the admission rule is a plain SQL window boundary the
    * oracle replays; es/fr are unweighted — refused without state. */
  private def qTokenMixtureStream(s: SparkSession, dir: String): DataFrame = {
    val docs = tbl(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
    val root = Fixtures.dir(s, dir, "q-mixstream") { r =>
      // maxId only shapes the slice boundaries — computed inside the
      // cached fixture build so re-invocations pay no aggregate job
      val maxId = docs.agg(max("doc_id")).head().getLong(0)
      val (b1, b2) = (maxId / 3, 2 * maxId / 3)
      val base = System.currentTimeMillis() - 10000L
      val slices = Seq(col("doc_id") <= b1,
        col("doc_id") > b1 && col("doc_id") <= b2, col("doc_id") > b2)
      slices.zipWithIndex.foreach { case (cond, i) =>
        writeStreamSlice(docs.filter(cond), r,
          f"slice_$i%02d.parquet", base + i * 2000L)
      }
    }
    val out = java.nio.file.Files.createTempDirectory("graft-mix-out")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-mix-ckpt")
    streamOutRoots.add(out); streamOutRoots.add(ckpt)
    drainGuarded(s, ext.MixtureStream.run(
      s.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "*.parquet").parquet(root),
      out.toString, ckpt.toString,
      weights = Map("en" -> 0.5, "de" -> 0.25, "zh" -> 0.25),
      budgetTokens = 8192L, tokensCol = "n_tokens", strataCol = "lang",
      bucketWidth = 64L))
    val kept = s.read.parquet(out.toString)
      .select(col("doc_id"), lit(true).as("k"))
    docs.select("doc_id", "lang").join(kept, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("lang"),
        coalesce(col("k"), lit(false)).as("kept"))
      .orderBy("doc_id")
  }

  /** Composed corpus assembly (ext.AssembleStream): token-budget
    * mixture admission feeding GPT-style sequence packing as ONE
    * stream over three id-range slices — admitted docs continue the
    * packed token stream where the previous batch's admissions ended
    * (offset chain advances by ADMITTED tokens, the composition
    * point). On id-ordered arrival the result is the batch rule the
    * oracle states: the admission window boundary, then the
    * concat-and-chunk span map over the admitted corpus. */
  private def qAssembleStream(s: SparkSession, dir: String): DataFrame = {
    val docs = tbl(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
    val root = Fixtures.dir(s, dir, "q-asmstream") { r =>
      // maxId only shapes the slice boundaries — computed inside the
      // cached fixture build so re-invocations pay no aggregate job
      val maxId = docs.agg(max("doc_id")).head().getLong(0)
      val (b1, b2) = (maxId / 3, 2 * maxId / 3)
      val base = System.currentTimeMillis() - 10000L
      val slices = Seq(col("doc_id") <= b1,
        col("doc_id") > b1 && col("doc_id") <= b2, col("doc_id") > b2)
      slices.zipWithIndex.foreach { case (cond, i) =>
        writeStreamSlice(docs.filter(cond), r,
          f"slice_$i%02d.parquet", base + i * 2000L)
      }
    }
    val out = java.nio.file.Files.createTempDirectory("graft-asm-out")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-asm-ckpt")
    streamOutRoots.add(out); streamOutRoots.add(ckpt)
    drainGuarded(s, ext.AssembleStream.run(
      s.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "*.parquet").parquet(root),
      out.toString, ckpt.toString,
      weights = Map("en" -> 0.5, "de" -> 0.25, "zh" -> 0.25),
      budgetTokens = 8192L, seqLen = 64L, tokensCol = "n_tokens",
      strataCol = "lang", bucketWidth = 64L))
    s.read.parquet(out.toString)
      .select(col("doc_id"), col("seq_id"), col("tok_start"),
        col("tok_end"), col("seq_off"))
      .orderBy("doc_id", "seq_id")
  }

  /** Streaming decontamination against a GROWING eval set
    * (ext.DecontamStream): one mixed stream (is_eval = doc_id % 50 == 0,
    * the batch decontam fixture rule) in three mtime-ordered slices
    * (doc_id % 3). A corpus doc is dropped iff it shares a 5-gram with
    * an eval doc of its own OR an earlier slice — later eval arrivals
    * never retroactively unkeep output. The oracle brute-forces the
    * identical slice-ordered rule on shingle STRINGS (the operator
    * joins on xxhash64 — the decontam-row precedent). */
  private def qStreamDecontam(s: SparkSession, dir: String): DataFrame = {
    val docs = tbl(s, dir, "documents").select(col("doc_id"), col("text"),
      (col("doc_id") % 50 === 0).as("is_eval"))
    val root = Fixtures.dir(s, dir, "q-dcstream") { r =>
      val base = System.currentTimeMillis() - 10000L
      (0 until 3).foreach { i =>
        writeStreamSlice(docs.filter(col("doc_id") % 3 === i), r,
          f"slice_$i%02d.parquet", base + i * 2000L)
      }
    }
    val out = java.nio.file.Files.createTempDirectory("graft-dc-out")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-dc-ckpt")
    val idx = java.nio.file.Files.createTempDirectory("graft-dc-idx")
    streamOutRoots.add(out); streamOutRoots.add(ckpt); streamOutRoots.add(idx)
    drainGuarded(s, ext.DecontamStream.run(
      s.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "*.parquet").parquet(root),
      idx.toString, out.toString, ckpt.toString, n = 5,
      compactEvery = Some(2)))
    val kept = s.read.parquet(out.toString)
      .select(col("doc_id"), lit(true).as("k"))
    docs.filter(!col("is_eval")).select("doc_id")
      .join(kept, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), coalesce(col("k"), lit(false)).as("kept"))
      .orderBy("doc_id")
  }

  /** Retroactive decontamination (ext.DecontamStream.retroScreen): the
    * same growing-eval stream as stream_decontam, then the offline
    * re-screen of the kept output against the FULL eval index —
    * contaminated epoch dirs are rewritten in place (tombstone +
    * epoch-overwrite). The oracle is the ORDER-FREE batch rule: a
    * corpus doc is dropped iff it shares a 5-gram with ANY eval doc,
    * whatever the arrival order — retro screening erases the stream's
    * no-retroaction asymmetry by construction. */
  private def qDecontamRetro(s: SparkSession, dir: String): DataFrame = {
    val docs = tbl(s, dir, "documents").select(col("doc_id"), col("text"),
      (col("doc_id") % 50 === 0).as("is_eval"))
    val root = Fixtures.dir(s, dir, "q-dcstream") { r =>
      val base = System.currentTimeMillis() - 10000L
      (0 until 3).foreach { i =>
        writeStreamSlice(docs.filter(col("doc_id") % 3 === i), r,
          f"slice_$i%02d.parquet", base + i * 2000L)
      }
    }
    val out = java.nio.file.Files.createTempDirectory("graft-dcr-out")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-dcr-ckpt")
    val idx = java.nio.file.Files.createTempDirectory("graft-dcr-idx")
    streamOutRoots.add(out); streamOutRoots.add(ckpt); streamOutRoots.add(idx)
    drainGuarded(s, ext.DecontamStream.run(
      s.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "*.parquet").parquet(root),
      idx.toString, out.toString, ckpt.toString, n = 5,
      compactEvery = Some(2)))
    ext.DecontamStream.retroScreen(s, out.toString, idx.toString, n = 5): Unit
    val kept = s.read.parquet(out.toString)
      .select(col("doc_id"), lit(true).as("k"))
    docs.filter(!col("is_eval")).select("doc_id")
      .join(kept, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), coalesce(col("k"), lit(false)).as("kept"))
      .orderBy("doc_id")
  }

  /** Sorscher-style prototypicality pruning (arXiv:2206.14486): keep
    * the hardest half of every sign-LSH cluster, hardness = low cosine
    * to the exact decimal-sum centroid. The oracle replays the
    * quantizer, centroids, per-cluster hardness rank and the
    * ceil(frac·n) keep rule in pure SQL. */
  private def qPrototypePrune(s: SparkSession, dir: String): DataFrame =
    ext.Clustering.prototypePrune(tbl(s, dir, "embeddings"), 0.5)
      .orderBy("vec_id")

  /** Cluster-balanced subsample: ≤ 8 rows per sign-LSH cluster by the
    * reproducible md5(cb|id) draw — the diversity-preserving seed-set
    * draw over a skewed corpus. Literal cap ⇒ WindowGroupLimit prunes
    * map-side (plan-gated). */
  private def qClusterBalanced(s: SparkSession, dir: String): DataFrame =
    ext.Clustering.clusterCapSample(tbl(s, dir, "embeddings"), 8)
      .orderBy("vec_id")

  /** Character-unigram entropy quality signal (RedPajama-V2
    * `rps_doc_unigram_entropy`): a zero-shuffle native kernel per row;
    * the oracle recomputes it the distributed-normal way (explode →
    * histogram → decimal aggregate) and must agree bit-for-bit. */
  private def qCharEntropy(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "documents")
      .select(col("doc_id"),
        graft.functions.Sketch.char_entropy(col("text")).as("entropy_r"))
      .orderBy("doc_id")

  /** CCNet-style perplexity triage: per-language char-trigram LMs
    * trained on the src0-src3 reference slice; every document scored by
    * mean log10 trigram probability and bucketed into head/middle/tail
    * terciles within its language. The oracle retrains and rescores the
    * identical model in SQL. */
  private def qCcnetBuckets(s: SparkSession, dir: String): DataFrame =
    ext.LmScore.ccnetBuckets(tbl(s, dir, "documents"),
        col("source").isin("src0", "src1", "src2", "src3"))
      .orderBy("doc_id")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_tokens" -> (qTextTokens _),
    "bpe_tokens" -> (qBpeTokens _),
    "bm25_topk" -> (qBm25 _),
    "text_normalize" -> (qTextNormalize _),
    "url_dedup" -> (qUrlDedup _),
    "lang_id" -> (qLangId _),
    "quality_score" -> (qQuality _),
    "dedup_exact" -> (qDedupExact _),
    "jaccard_pairs" -> (qJaccardPairs _),
    "fingerprint_dups" -> (qFingerprint _),
    "minhash_lsh" -> (qMinHashLsh _),
    "simhash_pairs" -> (qSimHash _),
    "dup_groups" -> (qDupGroups _),
    "leakage_split" -> (qLeakageSplit _),
    "asof_join" -> (qAsofJoin _),
    "asof_forward" -> (qAsofForward _),
    "ann_bruteforce" -> (qAnnBrute _),
    "ann_lsh" -> (qAnnLsh _),
    "ann_ivf" -> (qAnnIvf _),
    "ann_ivf_indexed" -> (qAnnIvfIndexed _),
    "pq_recall" -> (qPqRecall _),
    "cosine_near_dup" -> (qCosineNearDup _),
    "semantic_dedup" -> (qSemanticDedup _),
    "prototype_prune" -> (qPrototypePrune _),
    "cluster_balanced" -> (qClusterBalanced _),
    "stream_near_dup" -> (qStreamNearDup _),
    "stream_semantic_dedup" -> (qStreamSemanticDedup _),
    "pipeline_clean_corpus_stream" -> (qPipelineCleanStream _),
    "stream_decontam" -> (qStreamDecontam _),
    "decontam_retro" -> (qDecontamRetro _),
    "ccnet_buckets" -> (qCcnetBuckets _),
    "char_entropy" -> (qCharEntropy _),
    "seq_pack_stream" -> (qSeqPackStream _),
    "token_mixture" -> (qTokenMixture _),
    "mixture_pack" -> (qMixturePack _),
    "token_mixture_stream" -> (qTokenMixtureStream _),
    "assemble_stream" -> (qAssembleStream _)
  )

  def oracleSql: Map[String, String] = Map(
    "text_tokens" ->
      """SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
        |    / len(string_split(text, ' ')) AS avg_token_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    // NFC + control-strip replayed byte-for-byte (chr(769) = combining
    // acute, chr(233) = precomposed é, chr(7) = BEL to strip),
    "bpe_tokens" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '''(?:s|t|re|ve|m|ll|d)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+|\s+')) AS BIGINT) AS n_bpe_tokens,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
        |  CAST(len(regexp_extract_all(text, '''(?:s|t|re|ve|m|ll|d)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+|\s+')) AS DOUBLE)
        |    / len(string_split(text, ' ')) AS bpe_per_word
        |FROM documents ORDER BY doc_id""".stripMargin,
    "bm25_topk" ->
      """WITH toks AS (
        |  SELECT doc_id, t AS tok FROM (
        |    SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS t
        |    FROM documents) x WHERE t <> ''),
        |dl AS (SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl FROM toks GROUP BY doc_id),
        |stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM dl),
        |q(term) AS (VALUES ('fast'), ('hash'), ('join'), ('order')),
        |tf AS (
        |  SELECT doc_id, tok, CAST(COUNT(*) AS DOUBLE) AS tf
        |  FROM toks JOIN q ON tok = q.term GROUP BY 1, 2),
        |dft AS (SELECT tok, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
        |  FROM tf GROUP BY tok),
        |scored AS (
        |  SELECT tf.doc_id,
        |    SUM(ln(1 + (stats.n_docs - dft.df + 0.5) / (dft.df + 0.5)) *
        |        tf.tf * (1.2 + 1) /
        |        (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))) AS score
        |  FROM tf
        |  JOIN dft USING (tok) JOIN dl USING (doc_id) CROSS JOIN stats
        |  GROUP BY 1)
        |SELECT doc_id, round(score, 6) AS score_r FROM scored
        |ORDER BY score_r DESC, doc_id LIMIT 10""".stripMargin,
    // hybrid retrieval: both legs' full rankings rebuilt in SQL (BM25 on
    // 6-dp-rounded scores, cosine on the raw similarity — the same total
    // orders the engine ranks by), fused with the identical
    // 1/(60 + rank) arithmetic; rank ties, leg membership, and the fused
    // ordering must all match for the hash to hold,
    "text_normalize" ->
      """SELECT doc_id, md5(regexp_replace(
        |  nfc_normalize(text || ' cafe' || chr(769) || ' ' || chr(233) || chr(7) || 'tail'),
        |  '[\x00-\x08\x0b-\x1f\x7f]', '', 'g')) AS norm_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    // each noise template's canonical form stated as a closed form —
    // the kernel must recover it exactly on every row,
    "url_dedup" ->
      """WITH d AS (SELECT doc_id, CAST(doc_id // 4 AS VARCHAR) AS g,
        |  doc_id % 4 AS t FROM documents),
        |c AS (SELECT doc_id, CASE WHEN t IN (0, 1)
        |    THEN 'http://example.com/a/p' || g || '/?a=1&b=2'
        |    ELSE 'https://example.com/~q/p' || g END AS url_canon FROM d)
        |SELECT doc_id, url_canon,
        |  CAST(COUNT(*) OVER (PARTITION BY url_canon) AS BIGINT) AS group_n
        |FROM c ORDER BY doc_id""".stripMargin,
    // the Okapi BM25 formula replayed term-for-term: same tokenizer,
    // same idf/tf saturation, ranked by the same rounded score,
    "lang_id" ->
      """SELECT lang_pred, CAST(COUNT(*) AS BIGINT) AS n FROM (
        |  SELECT CASE WHEN CAST(len(list_filter(string_split(text, ' '),
        |      t -> list_contains(['the','a','of','and','to','in','is','that','it','for'], t))) AS DOUBLE)
        |      / len(string_split(text, ' ')) >= 0.05
        |    THEN 'en' ELSE 'other' END AS lang_pred
        |  FROM documents) t GROUP BY lang_pred ORDER BY lang_pred""".stripMargin,
    "quality_score" ->
      """SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(CAST(len(list_filter(string_split(text, ' '),
        |    t -> list_contains(['the','a','of','and','to','in','is','that','it','for'], t))) AS DOUBLE)
        |    / len(string_split(text, ' ')) AS DECIMAL(18,9))) AS DOUBLE) AS sum_stopword_ratio,
        |  CAST(SUM(CAST(CAST(length(text) - length(regexp_replace(text, '[\.,;:!\?]', '', 'g')) AS DOUBLE)
        |    / length(text) AS DECIMAL(18,9))) AS DOUBLE) AS sum_punct_ratio,
        |  CAST(SUM(CAST(CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
        |    / len(string_split(text, ' ')) AS DECIMAL(18,9))) AS DOUBLE) AS sum_mean_word_len
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    "dedup_exact" ->
      """SELECT md5(text) AS content_hash, CAST(COUNT(*) AS BIGINT) AS dup_count,
        |  MIN(doc_id) AS keep_id
        |FROM documents GROUP BY md5(text) HAVING COUNT(*) > 1
        |ORDER BY content_hash""".stripMargin,
    "jaccard_pairs" ->
      """WITH sh AS (
        |  SELECT DISTINCT doc_id, shingle FROM (
        |    SELECT doc_id,
        |      unnest(list_transform(range(1, len(string_split(text, ' ')) - 3),
        |        i -> array_to_string(string_split(text, ' ')[i:i+4], ' '))) AS shingle
        |    FROM documents) t),
        |cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id)
        |SELECT id_a, id_b,
        |  CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter) AS jaccard
        |FROM pairs JOIN cnt ca ON ca.doc_id = id_a JOIN cnt cb ON cb.doc_id = id_b
        |WHERE CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter) >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,
    "fingerprint_dups" ->
      """SELECT md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp_norm_md5,
        |  CAST(COUNT(*) AS BIGINT) AS n, MIN(doc_id) AS keep_id
        |FROM documents GROUP BY 1 ORDER BY fp_norm_md5""".stripMargin,
    "minhash_lsh" -> jaccardBruteSql("0.8"),
    "simhash_pairs" -> jaccardBruteSql("0.9"),
    // Same ≥0.8 exact-Jaccard pair graph as minhash_lsh, closed
    // transitively with a recursive CTE — the truth set for the
    // large-star/small-star connected-components path.,
    "dup_groups" ->
      """WITH RECURSIVE docs AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(string_split(text, ' ')) - 1),
        |    i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] || ' ' || string_split(text, ' ')[i+2])) AS sh
        |  FROM documents),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM docs a JOIN docs b ON a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        |    len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
        |          UNION ALL SELECT id_b, id_a FROM pairs),
        |nodes AS (SELECT DISTINCT src AS id FROM edges),
        |walk(node, comp) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT e.dst, w.comp FROM walk w JOIN edges e ON e.src = w.node),
        |comps AS (SELECT node, MIN(comp) AS group_id FROM walk GROUP BY node)
        |SELECT node AS doc_id, group_id,
        |  CAST(COUNT(*) OVER (PARTITION BY group_id) AS BIGINT) AS group_size
        |FROM comps ORDER BY doc_id""".stripMargin,
    // leakage-safe split: the same recursive-CTE components as
    // dup_groups, singletons their own group, then the md5 interval
    // thresholds floor(0.8·2^32)=cccccccc / floor(0.9·2^32)=e6666666,
    "leakage_split" ->
      """WITH RECURSIVE docs AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(string_split(text, ' ')) - 1),
        |    i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] || ' ' || string_split(text, ' ')[i+2])) AS sh
        |  FROM documents),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM docs a JOIN docs b ON a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        |    len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8),
        |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
        |          UNION ALL SELECT id_b, id_a FROM pairs),
        |nodes AS (SELECT DISTINCT src AS id FROM edges),
        |walk(node, comp) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT e.dst, w.comp FROM walk w JOIN edges e ON e.src = w.node),
        |comps AS (SELECT node, MIN(comp) AS group_id FROM walk GROUP BY node),
        |grp AS (
        |  SELECT d.doc_id, COALESCE(c.group_id, d.doc_id) AS group_id
        |  FROM documents d LEFT JOIN comps c ON c.node = d.doc_id)
        |SELECT doc_id, group_id,
        |  CASE WHEN substr(md5('split|' || CAST(group_id AS VARCHAR)), 1, 8) < 'cccccccc' THEN 'train'
        |       WHEN substr(md5('split|' || CAST(group_id AS VARCHAR)), 1, 8) < 'e6666666' THEN 'val'
        |       ELSE 'test' END AS split
        |FROM grp ORDER BY doc_id""".stripMargin,
    // Lateral top-1 probe — the declarative spec the union+window
    // implementation must reproduce, including the equal-ts inclusive
    // match and the larger-event_id tie-break.,
    "asof_join" ->
      """WITH ev AS (
        |  SELECT * REPLACE (make_timestamp(epoch_ns(ts) // 1000) AS ts) FROM events),
        |errors AS (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'error'),
        |clicks AS (SELECT event_id, user_id, ts, value FROM ev WHERE event_type = 'click')
        |SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
        |  c.event_id AS click_event, epoch_us(c.ts) AS click_ts_us,
        |  c.value AS click_value
        |FROM errors e LEFT JOIN LATERAL (
        |  SELECT event_id, ts, value FROM clicks c
        |  WHERE c.user_id = e.user_id AND c.ts <= e.ts
        |  ORDER BY c.ts DESC, c.event_id DESC LIMIT 1
        |) c ON true
        |ORDER BY e.event_id""".stripMargin,
    // mirrored probe: earliest at-or-after, SMALLER event_id tie-break,
    "asof_forward" ->
      """WITH ev AS (
        |  SELECT * REPLACE (make_timestamp(epoch_ns(ts) // 1000) AS ts) FROM events),
        |errors AS (SELECT event_id, user_id, ts FROM ev WHERE event_type = 'error'),
        |clicks AS (SELECT event_id, user_id, ts, value FROM ev WHERE event_type = 'click')
        |SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
        |  c.event_id AS click_event, epoch_us(c.ts) AS click_ts_us,
        |  c.value AS click_value
        |FROM errors e LEFT JOIN LATERAL (
        |  SELECT event_id, ts, value FROM clicks c
        |  WHERE c.user_id = e.user_id AND c.ts >= e.ts
        |  ORDER BY c.ts ASC, c.event_id ASC LIMIT 1
        |) c ON true
        |ORDER BY e.event_id""".stripMargin,
    "ann_bruteforce" -> annBruteSql,
    // IVF in exact mode (nprobe = nlist) provably equals brute force —
    // same oracle; the machinery difference is all on the Spark side.,
    "ann_lsh" -> (mm3Macros +
      s"""WITH $signLshCte,
        |cands AS (
        |  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS corpus_id
        |  FROM buckets q JOIN buckets c ON q.tbl = c.tbl AND q.bucket = c.bucket
        |  WHERE q.vec_id < 20 AND c.vec_id <> q.vec_id),
        |scored AS (
        |  SELECT query_id, corpus_id,
        |    list_cosine_similarity(CAST(ce.embedding AS DOUBLE[]), CAST(qe.embedding AS DOUBLE[])) AS sim
        |  FROM cands JOIN embeddings qe ON qe.vec_id = cands.query_id
        |             JOIN embeddings ce ON ce.vec_id = cands.corpus_id),
        |ranked AS (SELECT query_id, corpus_id, sim,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, corpus_id) AS BIGINT) AS rank
        |  FROM scored)
        |SELECT query_id, rank, corpus_id, round(sim, 6) AS sim_r FROM ranked
        |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin),
    "ann_ivf" -> annBruteSql,
    "ann_ivf_indexed" -> annBruteSql,
    // PQ certificate: candidate count is exact (20 queries × top-10) and
    // the recall bound is always-true for a working quantizer (3× margin
    // below measurement, ≥20× above chance on the uniform fixture),
    "pq_recall" ->
      "SELECT CAST(200 AS BIGINT) AS n_exact, TRUE AS recall_ok",
    // pruned-IVF hybrid certificate: candidate count is exact (3 queries
    // × fused top-10) and the recall bound holds with a wide margin
    // (measured 0.63–0.70 vs the 0.4 floor on the uniform fixture),
    "cosine_near_dup" -> (mm3Macros +
      s"""WITH $signLshCte,
        |pairs AS (
        |  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
        |  FROM buckets a JOIN buckets b ON a.tbl = b.tbl AND a.bucket = b.bucket
        |  WHERE a.vec_id < b.vec_id),
        |scored AS (
        |  SELECT id_a, id_b,
        |    list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]), CAST(eb.embedding AS DOUBLE[])) AS sim
        |  FROM pairs JOIN embeddings ea ON ea.vec_id = pairs.id_a
        |             JOIN embeddings eb ON eb.vec_id = pairs.id_b)
        |SELECT id_a, id_b, round(sim, 6) AS sim_r FROM scored
        |WHERE sim >= 0.4 ORDER BY id_a, id_b""".stripMargin),
    // SemDeDup: same hyperplane derivation as ann_lsh/cosine_near_dup;
    // cluster = the signature's low AUTO-SIZED bits — the identical
    // integer rule as VectorOps.autoClusterBits (clusters = ceil(n/64),
    // bits = bit-length of clusters-1 clamped to [1,20]; length(bin(x))
    // IS the bit length, no float log2 that could ceil differently
    // across engines). Centroid components are decimal-exact sums
    // (cosine is scale-invariant so the mean's division is skipped);
    // keep rule = lowest round(cos-to-centroid, 6), id ties.,
    "semantic_dedup" -> (mm3Macros +
      s"""WITH $signLshCte,
        |mask AS (
        |  SELECT (CAST(1 AS BIGINT) << LEAST(20, GREATEST(1,
        |    length(bin(GREATEST(CAST(2 AS BIGINT),
        |      CAST(ceil(COUNT(*) / 64.0) AS BIGINT)) - 1))))) - 1 AS m
        |  FROM embeddings),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cl AS (
        |  SELECT s.vec_id, CAST(sig & (SELECT m FROM mask) AS BIGINT) AS cluster, v
        |  FROM sigs s JOIN e ON e.vec_id = s.vec_id),
        |ex AS (
        |  SELECT vec_id, cluster, i AS pos, v[i + 1] AS x
        |  FROM cl CROSS JOIN range(0, 64) t(i)),
        |cent AS (
        |  SELECT cluster, pos, CAST(SUM(CAST(x AS DECIMAL(28,9))) AS DOUBLE) AS c
        |  FROM ex GROUP BY cluster, pos),
        |carr AS (SELECT cluster, list(c ORDER BY pos) AS cv FROM cent GROUP BY cluster),
        |scored AS (
        |  SELECT vec_id, cl.cluster, v,
        |    round(list_cosine_similarity(v, cv), 6) AS simc_r
        |  FROM cl JOIN carr ON carr.cluster = cl.cluster),
        |removed AS (
        |  SELECT DISTINCT a.vec_id FROM scored a JOIN scored b
        |    ON a.cluster = b.cluster AND a.vec_id <> b.vec_id
        |   AND round(list_cosine_similarity(a.v, b.v), 6) >= 0.3
        |   AND (b.simc_r < a.simc_r OR (b.simc_r = a.simc_r AND b.vec_id < a.vec_id)))
        |SELECT s.vec_id, s.cluster, s.simc_r, (r.vec_id IS NULL) AS kept
        |FROM scored s LEFT JOIN removed r ON r.vec_id = s.vec_id
        |ORDER BY s.vec_id""".stripMargin),
    // NearDupStream: arrival order is (slice = doc_id % 3, doc_id) —
    // slice i is microbatch i (mtime-ordered, maxFilesPerTrigger=1);
    // dropped iff ANY earlier-arriving doc (dropped or kept: all-seen
    // contract) has exact shingle-set Jaccard >= 0.8. Sub-shingle-width
    // docs have empty/under-full shingle lists -> never reach 0.8 ->
    // kept, mirroring the operator's eligibility bypass.,
    "prototype_prune" -> (mm3Macros +
      s"""WITH $signLshCte,
        |mask AS (
        |  SELECT (CAST(1 AS BIGINT) << LEAST(20, GREATEST(1,
        |    length(bin(GREATEST(CAST(2 AS BIGINT),
        |      CAST(ceil(COUNT(*) / 64.0) AS BIGINT)) - 1))))) - 1 AS m
        |  FROM embeddings),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cl AS (
        |  SELECT s.vec_id, CAST(sig & (SELECT m FROM mask) AS BIGINT) AS cluster, v
        |  FROM sigs s JOIN e ON e.vec_id = s.vec_id),
        |ex AS (
        |  SELECT vec_id, cluster, i AS pos, v[i + 1] AS x
        |  FROM cl CROSS JOIN range(0, 64) t(i)),
        |cent AS (
        |  SELECT cluster, pos, CAST(SUM(CAST(x AS DECIMAL(28,9))) AS DOUBLE) AS c
        |  FROM ex GROUP BY cluster, pos),
        |carr AS (SELECT cluster, list(c ORDER BY pos) AS cv FROM cent GROUP BY cluster),
        |scored AS (
        |  SELECT vec_id, cl.cluster, v,
        |    round(list_cosine_similarity(v, cv), 6) AS simc_r
        |  FROM cl JOIN carr ON carr.cluster = cl.cluster),
        |ranked AS (
        |  SELECT vec_id, cluster, simc_r,
        |    CAST(row_number() OVER (PARTITION BY cluster
        |      ORDER BY simc_r, vec_id) AS BIGINT) AS keep_rank,
        |    COUNT(*) OVER (PARTITION BY cluster) AS n_c
        |  FROM scored)
        |SELECT vec_id, cluster, simc_r, keep_rank,
        |  keep_rank <= ceil(0.5 * n_c) AS kept
        |FROM ranked ORDER BY vec_id""".stripMargin),
    // Clustering.clusterCapSample: quantize only (no centroid), then the
    // md5(cb|id) per-cluster rank capped at 8.,
    "cluster_balanced" -> (mm3Macros +
      s"""WITH $signLshCte,
        |mask AS (
        |  SELECT (CAST(1 AS BIGINT) << LEAST(20, GREATEST(1,
        |    length(bin(GREATEST(CAST(2 AS BIGINT),
        |      CAST(ceil(COUNT(*) / 64.0) AS BIGINT)) - 1))))) - 1 AS m
        |  FROM embeddings),
        |cl AS (
        |  SELECT vec_id, CAST(sig & (SELECT m FROM mask) AS BIGINT) AS cluster
        |  FROM sigs),
        |ranked AS (
        |  SELECT vec_id, cluster,
        |    CAST(row_number() OVER (PARTITION BY cluster
        |      ORDER BY md5('cb|' || CAST(vec_id AS VARCHAR)), vec_id)
        |    AS BIGINT) AS pick_rank
        |  FROM cl)
        |SELECT vec_id, cluster, pick_rank
        |FROM ranked WHERE pick_rank <= 8 ORDER BY vec_id""".stripMargin),
    // Mirrors Multimodal.MediaGen.forId exactly: a hash match proves the
    // header parsers recover the true dims/channels/duration from the
    // synthesized spec-valid PNG/JPEG/GIF/WAV bytes on every row.,
    "stream_near_dup" ->
      """WITH docs AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(string_split(text, ' ')) - 1),
        |    i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] || ' ' || string_split(text, ' ')[i+2])) AS sh
        |  FROM documents),
        |dropped AS (
        |  SELECT DISTINCT b.doc_id FROM docs a JOIN docs b
        |    ON ((a.doc_id % 3 < b.doc_id % 3) OR
        |        (a.doc_id % 3 = b.doc_id % 3 AND a.doc_id < b.doc_id))
        |  WHERE len(a.sh) > 0 AND len(b.sh) > 0
        |    AND CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
        |        len(list_distinct(list_concat(a.sh, b.sh))) >= 0.8)
        |SELECT d.doc_id, (dr.doc_id IS NULL) AS kept
        |FROM documents d LEFT JOIN dropped dr ON dr.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    // SemanticDedupStream: same hyperplane derivation as semantic_dedup;
    // cluster = sig & 63 (clusterBits pinned 6 — an index-lifetime
    // constant, see the query scaladoc). Arrival order is
    // (slice = vec_id % 3, vec_id); dropped iff ANY earlier-arriving
    // same-cluster vector (dropped or kept: all-seen) has
    // round(cosine, 6) >= 0.3.,
    "stream_semantic_dedup" -> (mm3Macros +
      s"""WITH $signLshCte,
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |cl AS (
        |  SELECT s.vec_id, CAST(sig & 63 AS BIGINT) AS cluster, v
        |  FROM sigs s JOIN e ON e.vec_id = s.vec_id),
        |dropped AS (
        |  SELECT DISTINCT b.vec_id FROM cl a JOIN cl b
        |    ON a.cluster = b.cluster
        |   AND ((a.vec_id % 3 < b.vec_id % 3) OR
        |        (a.vec_id % 3 = b.vec_id % 3 AND a.vec_id < b.vec_id))
        |  WHERE round(list_cosine_similarity(a.v, b.v), 6) >= 0.3)
        |SELECT e.vec_id, (d.vec_id IS NULL) AS kept
        |FROM e LEFT JOIN dropped d ON d.vec_id = e.vec_id
        |ORDER BY e.vec_id""".stripMargin),
    // CleanCorpusStream: id-ordered (range-sliced) arrival makes the
    // streaming pipeline equal the batch composition — quality filter,
    // min-id-per-md5 exact dedup, then all-seen 3-shingle exact Jaccard
    // (the stream_near_dup rule with id order = arrival order) over the
    // exact survivors; aggregated per language like the batch capstone.,
    "pipeline_clean_corpus_stream" ->
      """WITH quality AS (
        |  SELECT doc_id, text, lang FROM documents
        |  WHERE len(string_split(text, ' ')) >= 10
        |    AND CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
        |      / len(string_split(text, ' ')) BETWEEN 2.0 AND 12.0),
        |exact_kept AS (
        |  SELECT doc_id, text, lang FROM (
        |    SELECT doc_id, text, lang,
        |      ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |    FROM quality) t WHERE rn = 1),
        |sh AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(string_split(text, ' ')) - 1),
        |    i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] || ' ' || string_split(text, ' ')[i+2])) AS shl
        |  FROM exact_kept),
        |near_dropped AS (
        |  SELECT DISTINCT b.doc_id FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE len(a.shl) > 0 AND len(b.shl) > 0
        |    AND CAST(len(list_intersect(a.shl, b.shl)) AS DOUBLE) /
        |        len(list_distinct(list_concat(a.shl, b.shl))) >= 0.8),
        |clean AS (
        |  SELECT * FROM exact_kept
        |  WHERE doc_id NOT IN (SELECT doc_id FROM near_dropped))
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
        |FROM clean GROUP BY lang ORDER BY lang""".stripMargin,
    // DecontamStream: slice-ordered growing-eval rule — corpus doc
    // (slice = doc_id % 3) dropped iff it shares a 5-gram with an eval
    // doc (doc_id % 50 = 0) of its own or an earlier slice. Same
    // shingle construction as the batch decontam row.,
    "stream_decontam" ->
      """WITH sh AS (
        |  SELECT DISTINCT doc_id, shingle FROM (
        |    SELECT doc_id,
        |      unnest(list_transform(range(1, len(string_split(text, ' ')) - 3),
        |        i -> array_to_string(string_split(text, ' ')[i:i+4], ' '))) AS shingle
        |    FROM documents) t),
        |ev AS (SELECT * FROM sh WHERE doc_id % 50 = 0),
        |co AS (SELECT * FROM sh WHERE doc_id % 50 != 0),
        |dropped AS (
        |  SELECT DISTINCT co.doc_id FROM co JOIN ev
        |    ON co.shingle = ev.shingle AND (ev.doc_id % 3) <= (co.doc_id % 3))
        |SELECT d.doc_id, (dr.doc_id IS NULL) AS kept
        |FROM documents d LEFT JOIN dropped dr ON dr.doc_id = d.doc_id
        |WHERE d.doc_id % 50 != 0
        |ORDER BY d.doc_id""".stripMargin,
    // DecontamStream.retroScreen: after the offline re-screen the kept
    // set obeys the ORDER-FREE rule — dropped iff sharing a 5-gram with
    // ANY eval doc, arrival order erased.,
    "decontam_retro" ->
      """WITH sh AS (
        |  SELECT DISTINCT doc_id, shingle FROM (
        |    SELECT doc_id,
        |      unnest(list_transform(range(1, len(string_split(text, ' ')) - 3),
        |        i -> array_to_string(string_split(text, ' ')[i:i+4], ' '))) AS shingle
        |    FROM documents) t),
        |ev AS (SELECT * FROM sh WHERE doc_id % 50 = 0),
        |co AS (SELECT * FROM sh WHERE doc_id % 50 != 0),
        |dropped AS (
        |  SELECT DISTINCT co.doc_id FROM co JOIN ev ON co.shingle = ev.shingle)
        |SELECT d.doc_id, (dr.doc_id IS NULL) AS kept
        |FROM documents d LEFT JOIN dropped dr ON dr.doc_id = d.doc_id
        |WHERE d.doc_id % 50 != 0
        |ORDER BY d.doc_id""".stripMargin,
    // Clustering.prototypePrune: same quantizer + exact-centroid scoring
    // as semantic_dedup, then the Sorscher keep rule — hardness rank
    // (simc asc, id asc) within cluster, kept iff rank <= ceil(0.5 * n).,
    "ccnet_buckets" ->
      """WITH tris AS (
        |  SELECT doc_id, lang, source,
        |    unnest(list_transform(range(1, length(text) - 1), i -> substr(text, i, 3))) AS tri
        |  FROM documents WHERE length(text) >= 3),
        |m3 AS (
        |  SELECT lang, tri, COUNT(*) AS c3 FROM tris
        |  WHERE source IN ('src0','src1','src2','src3') GROUP BY lang, tri),
        |m2 AS (SELECT lang, substr(tri, 1, 2) AS bi, SUM(c3) AS c2 FROM m3 GROUP BY lang, bi),
        |vt AS (
        |  SELECT lang, COUNT(DISTINCT ch) AS v FROM (
        |    SELECT lang, unnest(list_transform(range(1, length(text) + 1), i -> substr(text, i, 1))) AS ch
        |    FROM documents WHERE source IN ('src0','src1','src2','src3')) t
        |  GROUP BY lang),
        |pd AS (SELECT doc_id, lang, tri, COUNT(*) AS c FROM tris GROUP BY doc_id, lang, tri),
        |sc AS (
        |  SELECT pd.doc_id, pd.lang,
        |    CAST(SUM(CAST(c AS DECIMAL(10,0)) *
        |      CAST(round(log10(CAST(COALESCE(c3, 0) + 1 AS DOUBLE) /
        |        CAST(COALESCE(c2, 0) + COALESCE(v, 1) AS DOUBLE)), 9) AS DECIMAL(12,9))) AS DOUBLE) AS lp_sum,
        |    CAST(SUM(c) AS BIGINT) AS n_tri
        |  FROM pd
        |  LEFT JOIN m3 ON m3.lang = pd.lang AND m3.tri = pd.tri
        |  LEFT JOIN m2 ON m2.lang = pd.lang AND m2.bi = substr(pd.tri, 1, 2)
        |  LEFT JOIN vt ON vt.lang = pd.lang
        |  GROUP BY pd.doc_id, pd.lang),
        |b AS (SELECT doc_id, lang, n_tri, round(lp_sum / n_tri, 6) AS lp_mean_r FROM sc)
        |SELECT doc_id, lang, n_tri, lp_mean_r,
        |  CASE NTILE(3) OVER (PARTITION BY lang ORDER BY lp_mean_r DESC, doc_id)
        |    WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
        |FROM b ORDER BY doc_id""".stripMargin,
    // DSIR: hashed-ngram (uni+bigram, multiplicity) bucket models with
    // +1 smoothing, per-doc decimal weight sums, md5-derived Gumbel
    // noise, top-100 by the noised key — replayed term-for-term.,
    "char_entropy" ->
      """WITH ch AS (
        |  SELECT doc_id,
        |    unnest(list_transform(range(1, length(text) + 1), i -> substr(text, i, 1))) AS ch
        |  FROM documents),
        |hc AS (SELECT doc_id, ch, COUNT(*) AS c FROM ch GROUP BY doc_id, ch),
        |e AS (
        |  SELECT doc_id, SUM(c) AS n,
        |    CAST(SUM(CAST(c AS DECIMAL(10,0)) *
        |      CAST(round(ln(CAST(c AS DOUBLE)), 9) AS DECIMAL(12,9))) AS DOUBLE) AS s
        |  FROM hc GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CASE WHEN d.text IS NULL THEN NULL
        |       WHEN length(d.text) = 0 THEN 0.0
        |       ELSE round(ln(CAST(n AS DOUBLE)) - s / n, 6) + 0.0 END AS entropy_r
        |FROM documents d LEFT JOIN e ON e.doc_id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    // CCNet: per-language char-trigram Laplace LM retrained in SQL;
    // per-position log10 rounded to 9, decimal doc sums, per-language
    // NTILE terciles — identical definition in both engines,
    "seq_pack_stream" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s
        |  FROM t)
        |SELECT c.doc_id, CAST(g.seq_id AS BIGINT) AS seq_id,
        |  CAST(GREATEST(0, g.seq_id * 64 - c.s) AS BIGINT) AS tok_start,
        |  CAST(LEAST(c.n_tokens, (g.seq_id + 1) * 64 - c.s) AS BIGINT) AS tok_end,
        |  CAST(GREATEST(0, c.s - g.seq_id * 64) AS BIGINT) AS seq_off
        |FROM c CROSS JOIN LATERAL (
        |  SELECT UNNEST(generate_series(CAST(c.s // 64 AS BIGINT),
        |    CAST((c.s + c.n_tokens - 1) // 64 AS BIGINT))) AS seq_id) g
        |WHERE c.n_tokens > 0
        |ORDER BY doc_id, seq_id""".stripMargin,
    // epoch-weighted mixture: need = FLOOR(w * budget) (one IEEE double
    // product), whole passes by integer division, remainder filled by
    // the md5-order exclusive-cumsum prefix — all replayed verbatim,
    "token_mixture" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |s AS (SELECT lang, SUM(n_tokens) AS avail FROM t GROUP BY lang),
        |f AS (SELECT lang,
        |    CASE WHEN avail > 0 THEN need // avail ELSE 0 END AS n_full,
        |    CASE WHEN avail > 0 THEN need - (need // avail) * avail
        |      ELSE 0 END AS rem
        |  FROM (SELECT lang, avail,
        |    CAST(FLOOR((CASE lang WHEN 'en' THEN 0.4375 WHEN 'de' THEN 0.25
        |      WHEN 'es' THEN 0.125 WHEN 'fr' THEN 0.125 WHEN 'zh' THEN 0.0625
        |      ELSE 0.0 END) * 65536) AS BIGINT) AS need FROM s)),
        |c AS (
        |  SELECT doc_id, lang, n_tokens,
        |    COALESCE(SUM(n_tokens) OVER (PARTITION BY lang
        |      ORDER BY md5('mixt|' || CAST(doc_id AS VARCHAR)), doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
        |  FROM t)
        |SELECT c.doc_id, c.lang,
        |  CAST(f.n_full + CASE WHEN c.prior < f.rem THEN 1 ELSE 0 END
        |    AS BIGINT) AS n_copies
        |FROM c JOIN f USING (lang)
        |WHERE f.n_full + CASE WHEN c.prior < f.rem THEN 1 ELSE 0 END >= 1
        |ORDER BY doc_id""".stripMargin,
    // the mixture materialized: copies exploded, placed in one global
    // md5(salt||id||'#'||copy) order, then the seq_pack span rule,
    "mixture_pack" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |s AS (SELECT lang, SUM(n_tokens) AS avail FROM t GROUP BY lang),
        |f AS (SELECT lang,
        |    CASE WHEN avail > 0 THEN need // avail ELSE 0 END AS n_full,
        |    CASE WHEN avail > 0 THEN need - (need // avail) * avail
        |      ELSE 0 END AS rem
        |  FROM (SELECT lang, avail,
        |    CAST(FLOOR((CASE lang WHEN 'en' THEN 0.4375 WHEN 'de' THEN 0.25
        |      WHEN 'es' THEN 0.125 WHEN 'fr' THEN 0.125 WHEN 'zh' THEN 0.0625
        |      ELSE 0.0 END) * 65536) AS BIGINT) AS need FROM s)),
        |p AS (
        |  SELECT doc_id, lang, n_tokens,
        |    COALESCE(SUM(n_tokens) OVER (PARTITION BY lang
        |      ORDER BY md5('mixt|' || CAST(doc_id AS VARCHAR)), doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
        |  FROM t),
        |m AS (
        |  SELECT p.doc_id, p.n_tokens,
        |    f.n_full + CASE WHEN p.prior < f.rem THEN 1 ELSE 0 END AS n_copies
        |  FROM p JOIN f USING (lang)
        |  WHERE f.n_full + CASE WHEN p.prior < f.rem THEN 1 ELSE 0 END >= 1),
        |e AS (
        |  SELECT doc_id, n_tokens,
        |    UNNEST(generate_series(1, CAST(n_copies AS BIGINT))) AS copy
        |  FROM m),
        |d AS (
        |  SELECT doc_id, n_tokens, copy,
        |    md5('mp|' || CAST(doc_id AS VARCHAR) || '#' ||
        |      CAST(copy AS VARCHAR)) AS dr
        |  FROM e),
        |c AS (
        |  SELECT doc_id, n_tokens, copy,
        |    COALESCE(SUM(n_tokens) OVER (ORDER BY dr, doc_id, copy
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s
        |  FROM d)
        |SELECT c.doc_id, CAST(c.copy AS BIGINT) AS copy,
        |  CAST(g.seq_id AS BIGINT) AS seq_id,
        |  CAST(GREATEST(0, g.seq_id * 64 - c.s) AS BIGINT) AS tok_start,
        |  CAST(LEAST(c.n_tokens, (g.seq_id + 1) * 64 - c.s) AS BIGINT) AS tok_end,
        |  CAST(GREATEST(0, c.s - g.seq_id * 64) AS BIGINT) AS seq_off
        |FROM c CROSS JOIN LATERAL (
        |  SELECT UNNEST(generate_series(CAST(c.s // 64 AS BIGINT),
        |    CAST((c.s + c.n_tokens - 1) // 64 AS BIGINT))) AS seq_id) g
        |WHERE c.n_tokens > 0
        |ORDER BY doc_id, copy, seq_id""".stripMargin,
    // the stream admits while the language's budget is unexhausted; on
    // id-ordered arrival that is the arrival-order exclusive-cumsum
    // boundary (unweighted langs: need 0, never admitted),
    "token_mixture_stream" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |n AS (
        |  SELECT doc_id, lang,
        |    CAST(FLOOR((CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.25
        |      WHEN 'zh' THEN 0.25 ELSE 0.0 END) * 8192) AS BIGINT) AS need,
        |    COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
        |  FROM t)
        |SELECT doc_id, lang, (prior < need) AS kept
        |FROM n ORDER BY doc_id""".stripMargin,
    // the composed assembly: the admission boundary above, then the
    // seq_pack concat-and-chunk rule over the ADMITTED corpus,
    "assemble_stream" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |n AS (
        |  SELECT doc_id, lang, n_tokens,
        |    CAST(FLOOR((CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.25
        |      WHEN 'zh' THEN 0.25 ELSE 0.0 END) * 8192) AS BIGINT) AS need,
        |    COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
        |  FROM t),
        |a AS (SELECT doc_id, n_tokens FROM n WHERE prior < need),
        |c AS (
        |  SELECT doc_id, n_tokens,
        |    COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s
        |  FROM a)
        |SELECT c.doc_id, CAST(g.seq_id AS BIGINT) AS seq_id,
        |  CAST(GREATEST(0, g.seq_id * 64 - c.s) AS BIGINT) AS tok_start,
        |  CAST(LEAST(c.n_tokens, (g.seq_id + 1) * 64 - c.s) AS BIGINT) AS tok_end,
        |  CAST(GREATEST(0, c.s - g.seq_id * 64) AS BIGINT) AS seq_off
        |FROM c CROSS JOIN LATERAL (
        |  SELECT UNNEST(generate_series(CAST(c.s // 64 AS BIGINT),
        |    CAST((c.s + c.n_tokens - 1) // 64 AS BIGINT))) AS seq_id) g
        |WHERE c.n_tokens > 0
        |ORDER BY doc_id, seq_id""".stripMargin
  )
}
