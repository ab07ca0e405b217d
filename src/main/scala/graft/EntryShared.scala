package graft

import graft.model.Envelope
import graft.operators.{AsOfJoin, Compaction, Dedup, Dispatch, Produce, Windows}
import graft.ext.{Graph, MinHash, TextOps, VectorOps}
import graft.functions.Murmur3Pulsar

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Helpers shared by the Entry* domain registries ([[EntryRelational]],
  * [[EntryEnvelope]], [[EntryAdmin]], [[EntryText]],
  * [[EntryComposition]]): table readers, decimal casts, the envelope
  * reader, the streaming-to-local harness, and the oracle-SQL CTE
  * fragments multiple domains' DuckDB oracles are assembled from. */
private[graft] object EntryShared {

  private[graft] def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private[graft] def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** Shared oracle CTE block for the stats queries: envelope offsets,
    * full per-partition storage counters, the subA/subB ack fixtures
    * (the SQL twin of `statsAckSubs` — keep in sync), unacked rows,
    * per-(sub, partition) backlog, and the sort-free mark-delete.
    * DuckDB inlines CTEs lazily, so a query referencing only a subset
    * pays only for that subset. */
  private[graft] val statsOracleCte: String =
    """, offs AS (SELECT partition, "offset" FROM envelope),
      |store AS (
      |  SELECT partition, CAST(COUNT(*) AS BIGINT) AS msg_count,
      |    CAST(SUM(COALESCE(octet_length(CAST(value AS BLOB)), 0) +
      |      COALESCE(octet_length(CAST(key AS BLOB)), 0)) AS BIGINT) AS storage_bytes,
      |    MAX("offset") AS head_offset,
      |    CAST(COUNT(DISTINCT producer_name) AS BIGINT) AS producers
      |  FROM envelope GROUP BY partition),
      |subs AS (SELECT unnest(['subA', 'subB']) AS subscription),
      |acks AS (
      |  SELECT 'subA' AS subscription, partition, "offset" FROM envelope WHERE "offset" % 3 <> 0
      |  UNION ALL
      |  SELECT 'subB' AS subscription, partition, "offset" FROM envelope WHERE "offset" % 2 = 0),
      |un AS (
      |  SELECT p.subscription, p.partition, p."offset"
      |  FROM (SELECT s.subscription, o.partition, o."offset"
      |        FROM offs o CROSS JOIN subs s) p
      |  LEFT JOIN acks a ON a.subscription = p.subscription
      |    AND a.partition = p.partition AND a."offset" = p."offset"
      |  WHERE a."offset" IS NULL),
      |bl AS (
      |  SELECT subscription, partition, CAST(COUNT(*) AS BIGINT) AS backlog,
      |    MIN("offset") AS min_unacked
      |  FROM un GROUP BY 1, 2),
      |md AS (
      |  SELECT a.subscription, a.partition, MAX(a."offset") AS mark_delete
      |  FROM acks a LEFT JOIN bl ON bl.subscription = a.subscription
      |    AND bl.partition = a.partition
      |  WHERE bl.min_unacked IS NULL OR a."offset" < bl.min_unacked
      |  GROUP BY 1, 2)""".stripMargin

  /** WITH prefix shared by all envelope oracles. */
  private[graft] def envSql(body: String): String =
    s"WITH ${Envelope.duckdbCte}\n$body"

  /** Pure-SQL murmur3_32 (x86, seed 0) over ≤15-byte ASCII keys, in
    * overflow-safe 32-bit arithmetic (16-bit-split multiplies): the DuckDB
    * twin of [[graft.functions.Murmur3Pulsar.pulsar_hash]]. Shared by every
    * oracle that must reproduce the engine's key routing.
    *
    * Two macro families, SAME math:
    *  - PLAIN macros (rotl32/mmix/fmixx…) expand textually, duplicating
    *    every argument — combinatorial growth, but required inside
    *    list_transform lambdas where DuckDB forbids subqueries. mm3_i4
    *    (the sign-LSH hyperplane derivation) stays on these, one body
    *    round, small tree.
    *  - STAGED macros (_s suffix) bind each intermediate ONCE via a
    *    scalar subquery alias, so expansion is linear — this is what
    *    makes body rounds 2 and 3 (8–15 byte keys) bindable at all; the
    *    plain-nested form of round 3 never finishes binding. mm3_8 runs
    *    entirely on these.
    *
    * Lengths 0–3 tail-only, 4 one round, 5–7 round+tail, 8 two rounds,
    * 9–11 two rounds+tail, 12 three rounds, 13–15 three rounds+tail;
    * ≥16 yields NULL — a mis-scoped key fails LOUDLY in the oracle
    * (hash mismatch) instead of silently diverging. The hash_wide query
    * replays widths 1–15 against the engine per round. */
  private[graft] val mm3Macros: String =
    """CREATE OR REPLACE MACRO mul32(a, bl, bh) AS (((a * bl) + (((a * bh) & 65535) << 16)) & 4294967295);
      |CREATE OR REPLACE MACRO rotl32(x, r) AS (((x << r) | (x >> (32 - r))) & 4294967295);
      |CREATE OR REPLACE MACRO mmix(k) AS (mul32(rotl32(mul32(k, 11601, 52382), 15), 13715, 7047));
      |CREATE OR REPLACE MACRO fmix1(h0) AS (mul32(xor(h0, h0 >> 16), 51819, 34283));
      |CREATE OR REPLACE MACRO fmix2(h1) AS (mul32(xor(h1, h1 >> 13), 44597, 49842));
      |CREATE OR REPLACE MACRO fmixx(h0) AS (xor(fmix2(fmix1(h0)), fmix2(fmix1(h0)) >> 16));
      |CREATE OR REPLACE MACRO rotl32_s(x, r) AS ((SELECT ((xx << r) | (xx >> (32 - r))) & 4294967295 FROM (SELECT x AS xx) t));
      |CREATE OR REPLACE MACRO mmix_s(k) AS ((SELECT mul32(rotl32_s(mul32(kk, 11601, 52382), 15), 13715, 7047) FROM (SELECT k AS kk) t));
      |CREATE OR REPLACE MACRO fmixx_s(h0) AS ((SELECT xor(f2, f2 >> 16) FROM (SELECT fmix2(fmix1(h0)) AS f2) t));
      |CREATE OR REPLACE MACRO strbytes(s, i) AS (CASE WHEN length(s) >= i THEN CAST(ord(substr(s, i, 1)) AS BIGINT) ELSE CAST(0 AS BIGINT) END);
      |CREATE OR REPLACE MACRO chunk1(s) AS (strbytes(s,1) + (strbytes(s,2) << 8) + (strbytes(s,3) << 16) + (strbytes(s,4) << 24));
      |CREATE OR REPLACE MACRO chunk2(s) AS (strbytes(s,5) + (strbytes(s,6) << 8) + (strbytes(s,7) << 16) + (strbytes(s,8) << 24));
      |CREATE OR REPLACE MACRO chunk3(s) AS (strbytes(s,9) + (strbytes(s,10) << 8) + (strbytes(s,11) << 16) + (strbytes(s,12) << 24));
      |CREATE OR REPLACE MACRO tail1(s) AS (strbytes(s,1) + (strbytes(s,2) << 8) + (strbytes(s,3) << 16));
      |CREATE OR REPLACE MACRO tail2(s) AS (strbytes(s,5) + (strbytes(s,6) << 8) + (strbytes(s,7) << 16));
      |CREATE OR REPLACE MACRO tail3(s) AS (strbytes(s,9) + (strbytes(s,10) << 8) + (strbytes(s,11) << 16));
      |CREATE OR REPLACE MACRO tail4(s) AS (strbytes(s,13) + (strbytes(s,14) << 8) + (strbytes(s,15) << 16));
      |CREATE OR REPLACE MACRO h1round_s(h, k) AS ((SELECT ((rotl32_s(xor(hh, mmix_s(k)), 13) * 5) + 3864292196) & 4294967295 FROM (SELECT h AS hh) t));
      |CREATE OR REPLACE MACRO h1body(s) AS (h1round_s(CAST(0 AS BIGINT), chunk1(s)));
      |CREATE OR REPLACE MACRO h1b2(s) AS (h1round_s(h1body(s), chunk2(s)));
      |CREATE OR REPLACE MACRO h1b3(s) AS (h1round_s(h1b2(s), chunk3(s)));
      |CREATE OR REPLACE MACRO mm3_8(s) AS ((
      |  CASE WHEN length(s) <= 3 THEN fmixx_s(xor(xor(CAST(0 AS BIGINT), mmix_s(tail1(s))), length(s)))
      |       WHEN length(s) = 4 THEN fmixx_s(xor(h1body(s), 4))
      |       WHEN length(s) <= 7 THEN fmixx_s(xor(xor(h1body(s), mmix_s(tail2(s))), length(s)))
      |       WHEN length(s) = 8 THEN fmixx_s(xor(h1b2(s), 8))
      |       WHEN length(s) <= 11 THEN fmixx_s(xor(xor(h1b2(s), mmix_s(tail3(s))), length(s)))
      |       WHEN length(s) = 12 THEN fmixx_s(xor(h1b3(s), 12))
      |       WHEN length(s) <= 15 THEN fmixx_s(xor(xor(h1b3(s), mmix_s(tail4(s))), length(s)))
      |       ELSE NULL
      |  END) & 2147483647);
      |CREATE OR REPLACE MACRO h1body_i(k) AS (((rotl32(mmix(CAST(k AS BIGINT)), 13) * 5) + 3864292196) & 4294967295);
      |CREATE OR REPLACE MACRO mm3_i4(k) AS (fmixx(xor(h1body_i(k), 4)));
      |""".stripMargin

  /** DuckDB twin of the engine's sign-LSH bucketing (VectorOps.annLsh /
    * cosineNearDupPairs, 32 bits = 4 tables × 8): hyperplane component
    * (i, j) is ±1 by the parity of murmur3_32(i·65536 + j) — the same
    * derivation as [[graft.functions.SignLshExpr]] — so signatures,
    * buckets and candidate sets match the engine exactly. */
  private[graft] val signLshCte: String =
    """planes AS (
      |  SELECT i, list_transform(range(0, 64), j ->
      |    CASE WHEN (mm3_i4(i * 65536 + j) & 1) = 1 THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END) AS h
      |  FROM range(0, 32) t(i)),
      |sigs AS (
      |  SELECT vec_id, CAST(SUM(CASE WHEN list_dot_product(CAST(embedding AS DOUBLE[]), h) > 0
      |                   THEN (CAST(1 AS BIGINT) << i) ELSE 0 END) AS BIGINT) AS sig
      |  FROM embeddings CROSS JOIN planes GROUP BY vec_id),
      |buckets AS (
      |  SELECT vec_id, t AS tbl, (sig >> (t * 8)) & 255 AS bucket
      |  FROM sigs CROSS JOIN range(0, 4) r(t))""".stripMargin

  /** Key-routed per-partition counts and dense max offsets — the oracle
    * for topic_log_roundtrip AND coalesce_roundtrip (a coalesce must be
    * content-neutral, so the same truth applies). */
  private[graft] val topicLogRoundtripSql: String = mm3Macros +
    """WITH ev AS (
      |  SELECT * REPLACE (make_timestamp(epoch_ns(ts) // 1000) AS ts) FROM events
      |), envelope AS (
      |  SELECT CAST(user_id AS VARCHAR) AS key FROM ev
      |), routed AS (
      |  SELECT CAST(mm3_8(key) % 4 AS INT) AS partition FROM envelope)
      |SELECT partition, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(COUNT(*) - 1 AS BIGINT) AS max_offset
      |FROM routed GROUP BY partition ORDER BY partition""".stripMargin

  /** Shared oracle for the txn isolation rows: the visible slice of the
    * envelope (by `pred` over the envelope sequence_id), re-routed by
    * key hash, with the dense-offset arithmetic (count − 1 = max offset)
    * that only holds when commits and staged epochs stack exactly. */
  private[graft] def txnVisSql(pred: String): String = mm3Macros +
    s"""WITH ev AS (
      |  SELECT * REPLACE (make_timestamp(epoch_ns(ts) // 1000) AS ts) FROM events
      |), env0 AS (
      |  SELECT CAST(user_id AS VARCHAR) AS key,
      |    CASE WHEN event_id % 10 = 0 THEN event_id - 1 ELSE event_id END AS sequence_id
      |  FROM ev
      |), slice AS (SELECT key FROM env0 WHERE $pred),
      |routed AS (SELECT CAST(mm3_8(key) % 4 AS INT) AS partition, key FROM slice)
      |SELECT partition, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(COUNT(*) - 1 AS BIGINT) AS max_offset,
      |  CAST(COUNT(DISTINCT key) AS BIGINT) AS n_keys
      |FROM routed GROUP BY partition ORDER BY partition""".stripMargin

  /** Both txn legs rebuilt in SQL — the oracle for txn_ack AND
    * ack_compaction (compaction must be answer-preserving): dense
    * per-partition offsets via ROW_NUMBER (ack membership depends only
    * on offset VALUES, so (publish_time, sequence_id) ties cannot
    * diverge the set), cursor = largest dense acked prefix, backlog =
    * anti-join, output = the sequence_id%5 slice re-routed by key
    * hash. */
  /** Shared by `redelivery` and `redelivery_stream` — one string, so
    * the batch and stream twins can never verify against diverged
    * backoff formulas. */
  private[graft] lazy val redeliverySql: String = envSql(
    """SELECT "offset", partition,
      |  CAST(redelivery_count + 1 AS INT) AS redelivery_count,
      |  strftime(TIMESTAMP '2024-01-15 00:00:00'
      |    + to_seconds(CAST(60 * pow(2, redelivery_count) AS BIGINT)),
      |    '%Y-%m-%d %H:%M:%S') AS redeliver_at
      |FROM envelope
      |WHERE "offset" % 2 = 0 AND "offset" % 4 <> 0
      |  AND publish_time <= TIMESTAMP '2024-01-15 00:00:00' - INTERVAL 1 HOUR
      |ORDER BY "offset"""".stripMargin)

  private[graft] lazy val txnAckSql: String = mm3Macros +
    s"WITH ${Envelope.duckdbCte},\n" +
    """routed AS (
      |  SELECT CAST(mm3_8(key) % 4 AS INT) AS partition,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY mm3_8(key) % 4
      |      ORDER BY publish_time, sequence_id) - 1 AS BIGINT) AS "offset"
      |  FROM envelope),
      |acks AS (
      |  SELECT partition, "offset" FROM routed
      |  WHERE "offset" <= 10 OR "offset" % 3 = 0),
      |md AS (
      |  SELECT partition, MAX(CASE WHEN "offset" = rn - 1 THEN "offset" END) AS mark_delete
      |  FROM (SELECT partition, "offset",
      |          ROW_NUMBER() OVER (PARTITION BY partition ORDER BY "offset") AS rn
      |        FROM acks) GROUP BY partition),
      |bl AS (
      |  SELECT r.partition, CAST(COUNT(*) AS BIGINT) AS backlog
      |  FROM routed r LEFT JOIN acks a
      |    ON r.partition = a.partition AND r."offset" = a."offset"
      |  WHERE a."offset" IS NULL GROUP BY r.partition),
      |outp AS (
      |  SELECT CAST(mm3_8(key) % 4 AS INT) AS partition,
      |    CAST(COUNT(*) AS BIGINT) AS out_n,
      |    CAST(COUNT(*) - 1 AS BIGINT) AS out_max_offset
      |  FROM envelope WHERE sequence_id % 5 = 0 GROUP BY 1)
      |SELECT md.partition, md.mark_delete, bl.backlog, o.out_n, o.out_max_offset
      |FROM md JOIN bl ON md.partition = bl.partition
      |JOIN outp o ON md.partition = o.partition
      |ORDER BY md.partition""".stripMargin

  /** Exact top-5 cosine neighbors for the 20 query vectors — the oracle
    * for ann_bruteforce and for ann_ivf's exact (all-cells-probed) mode. */
  private[graft] val annBruteSql: String =
    """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 20),
      |c AS (SELECT vec_id AS corpus_id, embedding AS cv FROM embeddings),
      |scored AS (
      |  SELECT query_id, corpus_id,
      |    list_cosine_similarity(CAST(cv AS DOUBLE[]), CAST(qv AS DOUBLE[])) AS sim
      |  FROM c CROSS JOIN q WHERE corpus_id <> query_id),
      |ranked AS (SELECT query_id, corpus_id, sim,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, corpus_id) AS BIGINT) AS rank
      |  FROM scored)
      |SELECT query_id, rank, corpus_id, round(sim, 6) AS sim_r FROM ranked
      |WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin

  /** Brute-force exact 3-gram word-shingle Jaccard pairs at ≥ threshold:
    * the truth set an LSH candidate path must reproduce after its
    * exact-verify join. minhash_lsh claims ≥ 0.8 (16-band recall
    * 1-8e-8 there); simhash_pairs claims ≥ 0.9, the near-identical tier
    * where Hamming ≤ 7 candidate recall holds (a 0.89-Jaccard pair can
    * flip 8+ simhash bits — observed at sf0.001). */
  private[graft] def jaccardBruteSql(threshold: String): String =
    s"""WITH docs AS (
      |  SELECT doc_id, list_distinct(list_transform(range(1, len(string_split(text, ' ')) - 1),
      |    i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] || ' ' || string_split(text, ' ')[i+2])) AS sh
      |  FROM documents),
      |pairs AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |    CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
      |      len(list_distinct(list_concat(a.sh, b.sh))) AS jac
      |  FROM docs a JOIN docs b ON a.doc_id < b.doc_id)
      |SELECT id_a, id_b, round(jac, 6) AS jac_r FROM pairs
      |WHERE jac >= $threshold ORDER BY id_a, id_b""".stripMargin

  private[graft] def env(s: SparkSession, dir: String): DataFrame =
    Envelope.fromEvents(s, dir)

  /** Built-fixture cache for the integration queries (topic-log
    * roundtrip, snapshot coalesce, delayed due-index): their eager
    * side-effecting builds run once per (session, sf dir) instead of on
    * every DataFrame construction — Verify, Bench, PlanDump and the plan
    * gates would otherwise each re-pay the full append/coalesce/index
    * cost and leak a fresh temp dir per invocation. A JVM shutdown hook
    * removes the temp roots. */
  private[graft] object Fixtures {
    private val cache =
      new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), String]()
    private val roots = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      roots.forEach(r => deleteRec(r))
    }))
    private def deleteRec(root: String): Unit =
      deleteTree(java.nio.file.Paths.get(root))
    def dir(s: SparkSession, sfDir: String, kind: String)(build: String => Unit): String =
      cache.computeIfAbsent((s, sfDir, kind), _ => {
        val root = java.nio.file.Files.createTempDirectory(s"graft-$kind").toString
        roots.add(root)
        build(root)
        root
      })
  }

  /** Run a streaming query to convergence (`processAllAvailable`
    * barrier), capture its result, and clean up — the memory-sink table
    * is dropped and the checkpoint dir deleted so repeated invocations
    * (the bench runs every query several times per session) don't
    * accumulate driver-memory tables and disk checkpoints.
    *
    * COMPLETE mode collects the memory sink to a local DataFrame — that
    * is the AGGREGATED result (keys × windows), bounded by construction.
    * APPEND mode (stateless twins like delayed_due_stream) emits every
    * row, so it must NEVER collect to the driver (VERDICT r7 #5: 4.6k
    * rows at sf0.01 becomes a driver-memory hazard at a 100× oracle
    * scale): append twins write through a temp PARQUET sink — the real
    * production sink shape — and the result reads back distributed. The
    * temp dirs are removed by a shutdown hook (they must outlive the
    * returned lazy DataFrame). */
  private[graft] val streamOutRoots =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.nio.file.Path]()
  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      streamOutRoots.forEach(deleteTree)))
  }

  /** Drains `q`, then FAILS LOUDLY if the whole run ingested zero input
    * rows — a stream twin that streams nothing is a harness defect (a
    * source glob that misses the fixture shape), never a valid
    * measurement; the r8 10× probe benched exactly that. Progress
    * entries are summed via a listener (not `recentProgress`, which is
    * capped at 100 entries and could rotate past the rows at
    * maxFilesPerTrigger=1 on a many-file fixture). */
  private[graft] def drainGuarded(s: SparkSession,
                           q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    val rows = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      override def onQueryStarted(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit =
        if (e.progress.id == q.id) { rows.addAndGet(e.progress.numInputRows): Unit }
      override def onQueryTerminated(
          e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    }
    s.streams.addListener(listener)
    try q.processAllAvailable() finally {
      q.stop()
      s.streams.removeListener(listener)
    }
    // The listener is async; processAllAvailable does not await delivery.
    // Fall back to recentProgress before declaring zero.
    if (rows.get() == 0L &&
        q.recentProgress.map(_.numInputRows).sum == 0L)
      throw new IllegalStateException(
        "stream twin processed ZERO input rows — the source matched no " +
        "files (fixture-shape/glob mismatch); refusing to report an " +
        "empty-stream result as a measurement")
  }

  /** Scale-adaptive shuffle/state width for a stream twin (guide §2:
    * derive partitioning from input size, never a constant). Stateful
    * streaming operators freeze their state-partition count at the
    * FIRST checkpoint from `spark.sql.shuffle.partitions`, AQE is off
    * in streaming, and every micro-batch then pays one state-store
    * commit (delta file + CRC) PER partition per stateful operator —
    * at local[32] over a kB-scale fixture that was 32 task launches +
    * 32 file commits per batch per operator for rows of data (measured:
    * session_windows_watermark task-time 55.9 s at width 32 vs 5.9 s at
    * width 4, same results — every run starts a FRESH checkpoint, so
    * the width never crosses runs). The width derives from the file
    * source's on-disk bytes — one walk of the fixture dir the source
    * lists anyway — clamped to the session value, so a cluster-scale
    * input keeps the cluster-sized width (identity at 100 TB). */
  private def adaptiveStreamWidth(s: SparkSession, agg: DataFrame): Option[Int] = {
    import org.apache.spark.sql.execution.streaming.runtime.StreamingRelation
    // ANALYZED plan, not `.logical`: Spark 4 defers source resolution, so
    // a raw `readStream...parquet(path)` frame's logical plan is a single
    // UnresolvedDataSource node — StreamingRelation (and its path option)
    // only exists after analysis. `.logical` worked for the aggregated
    // stream twins (whose construction forces analysis) but silently
    // returned None for raw-source streams (function_pipeline_replay ran
    // its dedup state 32-wide: 4 stages x 32 tasks, 10-19 s
    // executorRunTime EACH, for a kB-scale fixture).
    val paths = agg.queryExecution.analyzed.collect {
      case sr: StreamingRelation => sr.dataSource.options.get("path")
    }.flatten
    if (paths.isEmpty) None // non-file source: keep the session width
    else {
      import graft.log.PathIO
      val bytes = paths.map { p =>
        val hp = PathIO.path(p)
        if (!PathIO.exists(hp)) 0L
        else PathIO.walkStatuses(hp).filter(!_.isDirectory).map(_.getLen).sum
      }.sum
      val session = s.conf.get("spark.sql.shuffle.partitions").toInt
      Some(math.min(session,
        math.max(2, (bytes / (16L << 20)).toInt + 2)))
    }
  }

  /** Run `body` (start + drain of ONE stream over `src`) with the
    * [[adaptiveStreamWidth]] shuffle width — the r17 state-store-width
    * fix, reusable for streams that do not go through
    * [[runStreamToLocal]] (e.g. the Functions pipelines, whose
    * watermark dedup otherwise commits session-width state partitions
    * per batch). Same single-threaded-harness assumption as
    * [[runStreamToLocal]]: the session conf is mutated for the body's
    * duration, so queries planned CONCURRENTLY on this session would
    * inherit the narrow width (the entry points run one query at a
    * time; set the width on a cloned session if that ever changes). */
  private[graft] def withStreamWidth[T](s: SparkSession, src: DataFrame)
                                       (body: => T): T = {
    val width = adaptiveStreamWidth(s, src)
    if (sys.env.contains("SPARK_GRAFT_STAGE_DEBUG"))
      println(s"[width] withStreamWidth computed $width")
    val prev = width.map(_ => s.conf.get("spark.sql.shuffle.partitions"))
    width.foreach(w => s.conf.set("spark.sql.shuffle.partitions", w.toString))
    try body
    finally prev.foreach(p => s.conf.set("spark.sql.shuffle.partitions", p))
  }

  private[graft] def runStreamToLocal(s: SparkSession, agg: DataFrame,
                               mode: String = "complete"): DataFrame = {
    val width = adaptiveStreamWidth(s, agg)
    val prev = width.map(_ => s.conf.get("spark.sql.shuffle.partitions"))
    width.foreach(w => s.conf.set("spark.sql.shuffle.partitions", w.toString))
    try {
    val ckpt = java.nio.file.Files.createTempDirectory("graft-stream-ckpt")
    val out = if (mode == "append") {
      val outDir = java.nio.file.Files.createTempDirectory("graft-stream-out")
      streamOutRoots.add(outDir)
      val q = agg.writeStream.outputMode(mode).format("parquet")
        .option("path", outDir.toString)
        .option("checkpointLocation", ckpt.toString).start()
      drainGuarded(s, q)
      s.read.schema(agg.schema).parquet(outDir.toString)
    } else {
      val viewName = "graft_stream_" + java.lang.Long.toHexString(System.nanoTime())
      val q = agg.writeStream.outputMode(mode).format("memory")
        .queryName(viewName).option("checkpointLocation", ckpt.toString).start()
      drainGuarded(s, q)
      val t = s.table(viewName)
      val local = s.createDataFrame(
        java.util.Arrays.asList(t.collect(): _*), t.schema)
      s.catalog.dropTempView(viewName): Unit
      local
    }
    deleteTree(ckpt)
    out
    } finally {
      prev.foreach(p => s.conf.set("spark.sql.shuffle.partitions", p))
    }
  }

  /** Recursive delete (files then dirs, best-effort) — the ONE temp-tree
    * cleanup used by the stream-slice writer, the fixture cache, and
    * the stream-sink shutdown hook. */
  private[graft] def deleteTree(root: java.nio.file.Path): Unit = {
    if (!java.nio.file.Files.exists(root)) return
    val w = java.nio.file.Files.walk(root)
    try w.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(p => { java.nio.file.Files.deleteIfExists(p): Unit })
    finally w.close()
  }

  /** Write `df` as ONE parquet file `destDir/name` with an explicit
    * mtime — the unit of replay for file-stream fixtures whose TRIGGER
    * ORDER matters (the source lists oldest-mtime-first). */
  private[graft] def writeStreamSlice(df: DataFrame, destDir: String, name: String,
                               mtimeMs: Long): Unit = {
    import scala.jdk.CollectionConverters._
    val tmp = java.nio.file.Files.createTempDirectory("graft-slice-tmp")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val src = {
      val w = java.nio.file.Files.list(tmp)
      try w.iterator().asScala.toSeq
        .find(_.getFileName.toString.endsWith(".parquet"))
      finally w.close()
    }
    src.foreach { f =>
      val dst = java.nio.file.Paths.get(destDir, name)
      java.nio.file.Files.move(f, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(mtimeMs)): Unit
    }
    deleteTree(tmp)
  }

  /** Identity oracle for the nested roundtrips: every flattened column
    * recomputed from the envelope in pure SQL. */
  private[graft] val serdeNestedOracle: String = envSql(
    """SELECT "offset", key, value, event_type,
      |  substr(event_type, 1, 2) AS meta_lang,
      |  CAST(COALESCE(length(value), -1) AS BIGINT) AS meta_n,
      |  event_type AS prop_et, key AS prop_k,
      |  CAST("offset" AS VARCHAR) || ',' || CAST("offset" + 1 AS VARCHAR) AS ids_csv
      |FROM envelope ORDER BY "offset"""".stripMargin)

  /** Shared oracle for hybrid_rrf_batch AND hybrid_rrf_ivf (exact-mode
    * IVF provably equals the brute-force dense leg). */
  private[graft] val hybridBatchSql: String =
    """WITH toks AS (
        |  SELECT doc_id, t AS tok FROM (
        |    SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS t
        |    FROM documents) x WHERE t <> ''),
        |dl AS (SELECT doc_id, CAST(COUNT(*) AS DOUBLE) AS dl FROM toks GROUP BY doc_id),
        |stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs, AVG(dl) AS avgdl FROM dl),
        |q(query_id, term) AS (VALUES
        |  (0, 'fast'), (0, 'hash'), (0, 'join'), (0, 'order'),
        |  (1, 'stream'), (1, 'window'), (1, 'agg'), (1, 'batch'),
        |  (2, 'vector'), (2, 'scan'), (2, 'filter'), (2, 'merge')),
        |terms AS (SELECT DISTINCT term FROM q),
        |tf AS (
        |  SELECT doc_id, tok, CAST(COUNT(*) AS DOUBLE) AS tf
        |  FROM toks JOIN terms ON tok = term GROUP BY 1, 2),
        |dft AS (SELECT tok, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
        |  FROM tf GROUP BY tok),
        |scored AS (
        |  SELECT q.query_id, tf.doc_id,
        |    round(SUM(ln(1 + (stats.n_docs - dft.df + 0.5) / (dft.df + 0.5)) *
        |        tf.tf * (1.2 + 1) /
        |        (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl))), 6) AS score_r
        |  FROM tf
        |  JOIN q ON tf.tok = q.term
        |  JOIN dft ON dft.tok = tf.tok
        |  JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats
        |  GROUP BY 1, 2),
        |lexk AS (
        |  SELECT query_id, doc_id, lex_rank FROM (
        |    SELECT query_id, doc_id, CAST(ROW_NUMBER() OVER (
        |      PARTITION BY query_id ORDER BY score_r DESC, doc_id) AS BIGINT) AS lex_rank
        |    FROM scored) r WHERE lex_rank <= 50),
        |qv AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qvec
        |  FROM embeddings WHERE vec_id IN (0, 1, 2)),
        |veck AS (
        |  SELECT query_id, doc_id, vec_rank FROM (
        |    SELECT query_id, doc_id, CAST(ROW_NUMBER() OVER (
        |      PARTITION BY query_id ORDER BY sim DESC, doc_id) AS BIGINT) AS vec_rank
        |    FROM (
        |      SELECT qv.query_id, e.vec_id AS doc_id,
        |        list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), qv.qvec) AS sim
        |      FROM embeddings e CROSS JOIN qv WHERE e.vec_id <> qv.query_id) s) r
        |  WHERE vec_rank <= 50),
        |fused AS (
        |  SELECT COALESCE(l.query_id, v.query_id) AS query_id,
        |    COALESCE(l.doc_id, v.doc_id) AS doc_id, l.lex_rank, v.vec_rank,
        |    round(COALESCE(CAST(1.0 AS DOUBLE) / (60 + l.lex_rank), 0) +
        |          COALESCE(CAST(1.0 AS DOUBLE) / (60 + v.vec_rank), 0), 9) AS rrf
        |  FROM lexk l FULL OUTER JOIN veck v
        |    ON l.query_id = v.query_id AND l.doc_id = v.doc_id)
        |SELECT CAST(query_id AS BIGINT) AS query_id, fused_rank, doc_id,
        |  lex_rank, vec_rank, rrf FROM (
        |  SELECT *, CAST(ROW_NUMBER() OVER (
        |    PARTITION BY query_id ORDER BY rrf DESC, doc_id) AS BIGINT) AS fused_rank
        |  FROM fused) r
        |WHERE fused_rank <= 10 ORDER BY query_id, fused_rank""".stripMargin
}
