package graft

import graft.model.Envelope
import graft.operators.{AsOfJoin, Compaction, Dedup, Dispatch, Produce, Windows}
import graft.ext.{Graph, MinHash, TextOps, VectorOps}
import graft.functions.Murmur3Pulsar

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Driver contract: one `queries` entry per implemented operator from
 * SURVEY.md §2, each with a DuckDB oracle in `oracleSql` where the
 * semantics are ANSI-SQL-expressible (hash-based ops get rows-only checks).
 *
 * Determinism rules shared by Spark and oracle sides:
 *  - money math in DECIMAL(18,2) (exact, engine-order-independent),
 *    cast to DOUBLE only at the end;
 *  - counts cast to BIGINT on both sides;
 *  - no raw TIMESTAMP output columns (formatted strings / epoch instead);
 *  - every result ORDER BY a unique key.
 */
object SparkEntry {

  private def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** Shared oracle CTE block for the stats queries: envelope offsets,
    * full per-partition storage counters, the subA/subB ack fixtures
    * (the SQL twin of `statsAckSubs` — keep in sync), unacked rows,
    * per-(sub, partition) backlog, and the sort-free mark-delete.
    * DuckDB inlines CTEs lazily, so a query referencing only a subset
    * pays only for that subset. */
  private val statsOracleCte: String =
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
  private def envSql(body: String): String =
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
  private val mm3Macros: String =
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
  private val signLshCte: String =
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
  private val topicLogRoundtripSql: String = mm3Macros +
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
  private def txnVisSql(pred: String): String = mm3Macros +
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
  private lazy val redeliverySql: String = envSql(
    """SELECT "offset", partition,
      |  CAST(redelivery_count + 1 AS INT) AS redelivery_count,
      |  strftime(TIMESTAMP '2024-01-15 00:00:00'
      |    + to_seconds(CAST(60 * pow(2, redelivery_count) AS BIGINT)),
      |    '%Y-%m-%d %H:%M:%S') AS redeliver_at
      |FROM envelope
      |WHERE "offset" % 2 = 0 AND "offset" % 4 <> 0
      |  AND publish_time <= TIMESTAMP '2024-01-15 00:00:00' - INTERVAL 1 HOUR
      |ORDER BY "offset"""".stripMargin)

  private lazy val txnAckSql: String = mm3Macros +
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
  private val annBruteSql: String =
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
  private def jaccardBruteSql(threshold: String): String =
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

  // =====================================================================
  // Flagship (driver smoke-checks rows > 0 on sf0.001): the SURVEY §7.2
  // end-to-end slice — envelope → tumbling event-time window aggregate.
  // =====================================================================
  def entry(spark: SparkSession): DataFrame = {
    val env = Envelope.fromEvents(spark, "/root/testdata/sf0.001")
    Windows.tumbling(env, Envelope.EventTime, "1 hour",
      Seq(col("event_type")),
      Seq(count(lit(1)).as("n"), sum(dec(col("metric_value"))).as("sum_value")))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), col("sum_value").cast("double").as("sum_value"))
  }

  // =====================================================================
  // Relational surface (SURVEY §2.16 — inherited Catalyst join/agg/window)
  // =====================================================================

  /** TPC-H Q1-style pricing summary. */
  private def q1Pricing(s: SparkSession, dir: String): DataFrame = {
    val li = tbl(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-01"))
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).cast("bigint").as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** TPC-H Q3-style shipping priority (3-way join, top-k by revenue). */
  private def q3TopOrders(s: SparkSession, dir: String): DataFrame = {
    val c = tbl(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val o = tbl(s, dir, "orders").filter(col("o_orderdate") < lit("1995-03-15"))
    val l = tbl(s, dir, "lineitem").filter(col("l_shipdate") > lit("1995-03-15"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(dec(col("l_extendedprice")) *
        (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .select(col("o_orderkey"), col("revenue"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"),
        col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("o_orderkey")).limit(10)
  }

  /** TPC-H Q5-style local-supplier revenue (6-way join incl. broadcast dims). */
  private def q5Region(s: SparkSession, dir: String): DataFrame = {
    val r = tbl(s, dir, "region")
    val n = tbl(s, dir, "nation")
    val cst = tbl(s, dir, "customer")
    val o = tbl(s, dir, "orders")
    val l = tbl(s, dir, "lineitem")
    val sp = tbl(s, dir, "supplier")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(sp, l("l_suppkey") === sp("s_suppkey"))
      .join(cst, o("o_custkey") === cst("c_custkey") &&
        cst("c_nationkey") === sp("s_nationkey"))
      .join(broadcast(n), cst("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec(col("l_extendedprice")) *
        (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
        .cast("double").as("revenue"))
      .orderBy(col("n_name"))
  }

  /** TPC-H Q7-style volume shipping: revenue between two nation pairs by
    * ship year (4-way join + derived grouping column). */
  private def q7Volume(s: SparkSession, dir: String): DataFrame = {
    val n1 = tbl(s, dir, "nation").select(col("n_nationkey").as("s_nk"),
      col("n_name").as("supp_nation"))
    val n2 = tbl(s, dir, "nation").select(col("n_nationkey").as("c_nk"),
      col("n_name").as("cust_nation"))
    val sp = tbl(s, dir, "supplier")
    val c = tbl(s, dir, "customer")
    val o = tbl(s, dir, "orders")
    val l = tbl(s, dir, "lineitem")
    l.join(sp, l("l_suppkey") === sp("s_suppkey"))
      .join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n1), sp("s_nationkey") === n1("s_nk"))
      .join(broadcast(n2), c("c_nationkey") === n2("c_nk"))
      .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sum(dec(col("l_extendedprice")) *
        (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
        .cast("double").as("revenue"),
        count(lit(1)).cast("bigint").as("n"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** Semi-join (EXISTS): order priorities having returned lineitems. */
  private def qSemiJoin(s: SparkSession, dir: String): DataFrame = {
    val o = tbl(s, dir, "orders")
    val l = tbl(s, dir, "lineitem").filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"))
    o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).cast("bigint").as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** Anti-join (NOT EXISTS): customers with no orders, per segment. */
  private def qAntiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = tbl(s, dir, "customer")
    val o = tbl(s, dir, "orders").select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).cast("bigint").as("n_customers"))
      .orderBy("c_mktsegment")
  }

  /** Window rank: top-3 orders per customer by total price. */
  private def qWindowRank(s: SparkSession, dir: String): DataFrame = {
    val o = tbl(s, dir, "orders")
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    o.withColumn("rnk", row_number().over(w).cast("bigint"))
      .filter(col("rnk") <= 3)
      .select(col("o_custkey"), col("rnk"), col("o_orderkey"),
        dec(col("o_totalprice")).cast("double").as("totalprice"))
      .orderBy("o_custkey", "rnk")
  }

  /** Rollup aggregate over order status/priority. */
  private def qRollup(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "orders")
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).cast("bigint").as("n"),
        sum(dec(col("o_totalprice"))).cast("double").as("total"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  /** Distinct projection (dropDuplicates). */
  private def qDistinct(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "orders")
      .select(col("o_orderstatus"), col("o_orderpriority"))
      .dropDuplicates()
      .orderBy("o_orderstatus", "o_orderpriority")

  /** Top-10 customers by revenue (agg + join + top-k). */
  private def qTopCustomers(s: SparkSession, dir: String): DataFrame = {
    val o = tbl(s, dir, "orders")
    val c = tbl(s, dir, "customer")
    o.groupBy(col("o_custkey"))
      .agg(sum(dec(col("o_totalprice"))).cast("double").as("revenue"),
        count(lit(1)).cast("bigint").as("n_orders"))
      .join(broadcast(c), col("o_custkey") === c("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("revenue"), col("n_orders"))
      .orderBy(col("revenue").desc, col("c_custkey")).limit(10)
  }

  /** TPC-H Q6-style selective scan-aggregate (pushdown showcase). */
  private def q6Forecast(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1995-01-01") &&
        col("l_shipdate") < lit("1996-01-01") &&
        col("l_discount").between(0.02, 0.09) && col("l_quantity") < 24)
      .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
        .cast("double").as("revenue"),
        count(lit(1)).cast("bigint").as("n"))

  /** Left outer join: every customer with order stats, null-filled. */
  private def qLeftOuter(s: SparkSession, dir: String): DataFrame = {
    val c = tbl(s, dir, "customer")
    val o = tbl(s, dir, "orders")
      .groupBy("o_custkey")
      .agg(count(lit(1)).cast("bigint").as("n_orders"),
        sum(dec(col("o_totalprice"))).cast("double").as("total"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .select(col("c_custkey"), col("c_mktsegment"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        col("total"))
      .orderBy("c_custkey")
  }

  /** CUBE aggregate (grouping-sets surface). */
  private def qCube(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).cast("bigint").as("n"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  // =====================================================================
  // Pulsar-parity operators over the deterministic envelope (FIXTURES §B)
  // =====================================================================

  private def env(s: SparkSession, dir: String): DataFrame =
    Envelope.fromEvents(s, dir)

  /** Built-fixture cache for the integration queries (topic-log
    * roundtrip, snapshot coalesce, delayed due-index): their eager
    * side-effecting builds run once per (session, sf dir) instead of on
    * every DataFrame construction — Verify, Bench, PlanDump and the plan
    * gates would otherwise each re-pay the full append/coalesce/index
    * cost and leak a fresh temp dir per invocation. A JVM shutdown hook
    * removes the temp roots. */
  private object Fixtures {
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

  /** §2.9 publish-order compaction: last value per key, tombstones out. */
  private def qCompactionPublish(s: SparkSession, dir: String): DataFrame =
    Compaction.publishOrder(env(s, dir))
      .select(col(Envelope.Key), col(Envelope.Value), col(Envelope.Offset))
      .orderBy(Envelope.Key)

  /** §2.9 event-time-order compaction. */
  private def qCompactionEventTime(s: SparkSession, dir: String): DataFrame =
    Compaction.eventTimeOrder(env(s, dir))
      .select(col(Envelope.Key), col(Envelope.Value), col(Envelope.Offset))
      .orderBy(Envelope.Key)

  /** §2.1 TableView: last metric value per event_type. */
  private def qTableView(s: SparkSession, dir: String): DataFrame =
    Compaction.tableView(env(s, dir), "event_type", "metric_value")
      .orderBy("event_type")

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
  private val streamOutRoots =
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
  private def runStreamToLocal(s: SparkSession, agg: DataFrame,
                               mode: String = "complete"): DataFrame = {
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
  }

  /** §2.1 TableView on the STREAMING path: the envelope runs through
    * readStream → groupBy/max_by → complete-mode memory sink, with
    * `processAllAvailable()` as the TableView.refresh barrier
    * (TableViewImpl.refreshAsync:138); the converged table must equal
    * the batch `tableview` result row-for-row, so the whole streaming
    * machinery (source schema pin, state store, complete-mode sink)
    * sits under the same DuckDB oracle as the batch twin. */
  private def qTableViewStream(s: SparkSession, dir: String): DataFrame =
    runStreamToLocal(s, graft.streaming.StreamOps.tableView(
        Envelope.fromEventsStream(s, dir),
        keyCol = "event_type", valueCol = "metric_value"))
      .filter(col("metric_value").isNotNull)
      .select(col("event_type"), col("metric_value"))
      .orderBy("event_type")

  /** The ext cleaning tier on the STREAMING path: documents stream
    * through the stateless quality filters, exact dedup runs as keyed
    * streaming state (dropDuplicates on (lang, content hash) — winner
    * ambiguity can't leak because every field the aggregate reads is
    * identical across duplicates), and the per-language corpus stats
    * aggregate in complete mode. The converged table sits under the
    * same DuckDB oracle shape as the batch cleaning queries.
    *
    * PRODUCTION CAVEAT: dropDuplicates without a watermark keeps its
    * dedup state forever — fine for this bounded fixture harness, but
    * an unbounded deployment must add event-time + `withWatermark` and
    * use `dropDuplicatesWithinWatermark` so the state store can evict
    * (the same retention decision every streaming dedup makes). */
  private def qQualityFilterStream(s: SparkSession, dir: String): DataFrame = {
    val stream = Envelope.streamTable(s, dir, "documents")
    val filtered = TextOps.withQualityScore(stream)
      .filter(col("n_tokens") >= 10 && col("mean_word_len").between(2.0, 12.0))
      .select(col("lang"), md5(col("text")).as("content_hash"),
        size(TextOps.tokens(col("text"))).cast("bigint").as("toks"))
      .dropDuplicates("lang", "content_hash")
    val agg = filtered.groupBy("lang")
      .agg(count(lit(1)).cast("bigint").as("n_docs"),
        sum("toks").cast("bigint").as("total_tokens"))
    runStreamToLocal(s, agg).orderBy("lang")
  }

  /** §2.6/§2.11 delayed delivery on the STREAMING path: the dispatch
    * gate (deliver_at due or absent) runs as a stateless filter over
    * readStream, append-mode — the per-microbatch form of the broker's
    * DelayedDeliveryTracker check at dispatch time. Must emit exactly
    * the batch `delayed_due` dispatchable set under the same oracle.
    * (The batch twin additionally proves the BUCKETED INDEX path with
    * partition pruning; the index is a batch artifact, so the streaming
    * gate is the filter itself.) */
  private def qDelayedDueStream(s: SparkSession, dir: String): DataFrame =
    runStreamToLocal(s, Envelope.fromEventsStream(s, dir)
        .filter(col(Envelope.DeliverAt).isNull ||
          col(Envelope.DeliverAt) <=
            lit(java.sql.Timestamp.valueOf("2024-01-15 00:00:00")))
        .select(col(Envelope.Offset), col(Envelope.Partition)),
      mode = "append")
      .orderBy(Envelope.Offset)

  /** §2.10 DLQ routing on the STREAMING path: the redelivery-count
    * routing decision (DLQ at >= maxRedeliverCount, else RETRY with
    * backoff) applied per microbatch over readStream, aggregated in
    * complete mode — converges to the batch `dlq_route` counts under
    * the same oracle. */
  private def qDlqRouteStream(s: SparkSession, dir: String): DataFrame =
    runStreamToLocal(s,
      Dispatch.dlqRoute(Envelope.fromEventsStream(s, dir), "sub1", 3)
        .groupBy("route_topic").agg(count(lit(1)).cast("bigint").as("n")))
      .orderBy("route_topic")

  /** §2.10 unacked-timeout redelivery (reference UnAckedMessageTracker +
    * NegativeAcksTracker/RedeliveryBackoff): delivered-but-unacked
    * messages past the ack timeout re-enter with `redelivery_count+1`
    * and an exponential-backoff `deliver_at`. Delivery/ack state is
    * derived deterministically from the envelope (delivered = even
    * offsets at publish_time, acked = every 4th), so the oracle can
    * replay the exact backoff schedule: redeliver_at =
    * now + base·2^(old_count). */
  private def redeliveryNow = java.sql.Timestamp.valueOf("2024-01-15 00:00:00")
  private def qRedeliverySet(s: SparkSession, dir: String,
                             log: DataFrame): DataFrame = {
    val batchEnv = env(s, dir)
    val delivered = batchEnv.filter(col(Envelope.Offset) % 2 === 0)
      .select(col(Envelope.Partition).as("partition"),
        col(Envelope.Offset).as("offset"),
        col(Envelope.PublishTime).as("delivered_at"))
    val acks = batchEnv.filter(col(Envelope.Offset) % 4 === 0)
      .select(col(Envelope.Partition).as("partition"),
        col(Envelope.Offset).as("offset"))
    graft.streaming.AckState.redeliverOnTimeout(log, delivered, acks,
        redeliveryNow, ackTimeoutMs = 3600000L, backoffBaseMs = 60000L)
      .select(col(Envelope.Offset), col(Envelope.Partition),
        col(Envelope.RedeliveryCnt),
        date_format(col(Envelope.DeliverAt), "yyyy-MM-dd HH:mm:ss")
          .as("redeliver_at"))
  }

  private def qRedelivery(s: SparkSession, dir: String): DataFrame =
    qRedeliverySet(s, dir, env(s, dir)).orderBy(Envelope.Offset)

  /** [[qRedelivery]] on the STREAMING path (VERDICT r8 #4): the log side
    * is the live stream; delivered/ack state joins in stream-static
    * (inner + the anti-join folded into the static side), the
    * count-bump and backoff computation run stateless per microbatch,
    * append mode — the redelivered set and its backoff schedule must
    * hash-match the same DuckDB replay as the batch twin. */
  private def qRedeliveryStream(s: SparkSession, dir: String): DataFrame =
    runStreamToLocal(s,
      qRedeliverySet(s, dir, Envelope.fromEventsStream(s, dir)),
      mode = "append")
      .orderBy(Envelope.Offset)

  /** §1.1/§7.4 AUTO_CONSUME heterogeneous-version decode in ONE scan
    * (reference Schema.AUTO_CONSUME → GenericRecord; VERDICT r8 #5): the
    * topic carries two LIVE schema versions — v1 `{"uid": …}` and v2
    * `{"user": …, "score": …}`, assigned by offset parity — decoded by
    * [[graft.model.SchemaRegistry.decodeVersioned]] (per-row from_json
    * dispatch on schema_version, reshaped onto the widest struct), then
    * split back into per-version frames carrying only their OWN fields
    * and re-merged through [[graft.model.SchemaRegistry.unionRead]]
    * (unionByName + null-fill — the AUTO_CONSUME read path). The field
    * names deliberately DIFFER across versions, so decoding any row with
    * the wrong version's schema nulls the wrong columns and breaks the
    * hash — the oracle replays both versions' payload formulas. */
  private def qSchemaEvolution(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, StringType, StructField, StructType}
    val base = env(s, dir)
      .withColumn(Envelope.SchemaVersion,
        (col(Envelope.Offset) % 2 + 1).cast("int"))
      .withColumn("payload",
        when(col(Envelope.SchemaVersion) === 1,
          concat(lit("{\"uid\":\""), col(Envelope.Key), lit("\"}")))
          .otherwise(concat(lit("{\"user\":\""), col(Envelope.Key),
            lit("\",\"score\":"), col("metric_value").cast("string"),
            lit("}"))))
    val v1 = StructType(Seq(StructField("uid", StringType)))
    val v2 = StructType(Seq(StructField("user", StringType),
      StructField("score", DoubleType)))
    val decoded = graft.model.SchemaRegistry.decodeVersioned(
      base, "payload", Map(1 -> v1, 2 -> v2))
    val frames = Seq(
      decoded.filter(col(Envelope.SchemaVersion) === 1)
        .select(col(Envelope.Offset), col(Envelope.SchemaVersion),
          col("decoded.uid").as("uid")),
      decoded.filter(col(Envelope.SchemaVersion) === 2)
        .select(col(Envelope.Offset), col(Envelope.SchemaVersion),
          col("decoded.user").as("user_name"),
          round(col("decoded.score"), 6).as("score_r")))
    graft.model.SchemaRegistry.unionRead(frames)
      .orderBy(Envelope.Offset)
  }

  /** §2.13 replicated-subscription cursor travel (reference
    * ReplicatedSubscriptionsController.java:185-219; VERDICT r8 #6): the
    * replica carries the SAME rows under a DIFFERENT interleave (remote
    * offsets = block-reversed permutation of local order), a local
    * cursor acks ~60% of each partition, and the SubscriptionUpdate
    * translation must land on the replica's longest PREFIX-CLOSED
    * acked position — never past an unacked remote row (no loss),
    * re-delivering acked rows above the first gap (the reference's
    * at-least-once envelope). Output pins the consistent-cut snapshot
    * tops, the translated markDelete, and the resume backlog; the
    * oracle replays the identity join + running-min prefix in SQL. */
  private def qReplCursor(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val local = env(s, dir)
    val remote = local.withColumn(Envelope.Offset,
      row_number().over(Window.partitionBy(Envelope.Partition)
        .orderBy(expr(s"${Envelope.Offset} div 10"),
          (col(Envelope.Offset) % 10).desc, col(Envelope.Offset)))
        .cast("long"))
    val cursor: Map[Int, Long] = local.groupBy(Envelope.Partition)
      .agg(expr(s"max(${Envelope.Offset}) * 3 div 5").as("md"))
      .collect() // bounded: one row per partition
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val snap = graft.streaming.ReplicatedCursors.snapshot(local, remote)
      .getOrElse(sys.error("snapshot not consistent — replica diverged"))
    val md = graft.streaming.ReplicatedCursors
      .translateCursor(local, remote, cursor)
    val resume = graft.streaming.ReplicatedCursors.applyCursor(remote, md)
      .groupBy(col(Envelope.Partition).as("partition"))
      .agg(count(lit(1)).cast("bigint").as("resume_n"))
    md.toSeq.map { case (p, o) =>
        (p, snap._1(p), snap._2(p), o)
      }.toDF("partition", "snap_local", "snap_remote", "mark_delete")
      .join(resume, Seq("partition"), "left")
      .withColumn("resume_n", coalesce(col("resume_n"), lit(0L)))
      .orderBy("partition")
  }

  /** §2.8 producer-sequence dedup (effectively-once produce). */
  private def qDedupSeq(s: SparkSession, dir: String): DataFrame =
    Dedup.dedupBatch(env(s, dir))
      .select(col(Envelope.ProducerName), col(Envelope.SequenceId),
        col(Envelope.Offset))
      .orderBy(Envelope.ProducerName, Envelope.Offset)

  /** §2.8 dedup summary: kept/dropped counts per producer. */
  private def qDedupStats(s: SparkSession, dir: String): DataFrame = {
    val all = env(s, dir)
    val kept = Dedup.dedupBatch(all)
    all.groupBy(Envelope.ProducerName).agg(count(lit(1)).cast("bigint").as("received"))
      .join(kept.groupBy(Envelope.ProducerName)
        .agg(count(lit(1)).cast("bigint").as("kept")), Seq(Envelope.ProducerName))
      .withColumn("dropped", (col("received") - col("kept")).cast("bigint"))
      .orderBy(Envelope.ProducerName)
  }

  /** §2.11 delayed delivery via the bucketed due index (the at-scale
    * path): delayed rows land hive-partitioned by coarse due bucket; the
    * trigger reads only buckets ≤ bucket(T) — `PartitionFilters` prune
    * the scan to O(due data), never O(backlog) — plus the row-level
    * residual `deliver_at <= T`. Undelayed rows dispatch immediately and
    * never enter the index. Oracle unchanged: the union equals the flat
    * `deliver_at IS NULL OR deliver_at <= T` predicate. */
  private def qDelayedDue(s: SparkSession, dir: String): DataFrame = {
    val e = env(s, dir)
    val idx = Fixtures.dir(s, dir, "due-idx") { root =>
      operators.DelayedBuckets.buildIndex(e, root)
    }
    val due = operators.DelayedBuckets.dueAt(s, idx,
      java.sql.Timestamp.valueOf("2024-01-15 00:00:00"))
    e.filter(col(Envelope.DeliverAt).isNull)
      .select(col(Envelope.Offset), col(Envelope.Partition))
      .unionByName(due.select(col(Envelope.Offset), col(Envelope.Partition)))
      .orderBy(Envelope.Offset)
  }

  /** §2.3 TTL expiry: survivors per event_type with ttl = 7 days. The
    * "now" watermark (max publish time) is a 1-row aggregate broadcast
    * into the plan — one job, no driver-side `agg().head` pre-pass. */
  private def qTtl(s: SparkSession, dir: String): DataFrame = {
    val e = env(s, dir)
    val nowDf = e.agg(max(col(Envelope.PublishTime)).as("_now"))
    Dispatch.applyTtl(e.crossJoin(broadcast(nowDf)), col("_now"), 7L * 24 * 3600)
      .groupBy("event_type").agg(count(lit(1)).cast("bigint").as("n"))
      .orderBy("event_type")
  }

  /** §2.1 seek-by-timestamp: first offset per partition at/after T. */
  private def qSeekByTime(s: SparkSession, dir: String): DataFrame =
    env(s, dir).filter(col(Envelope.PublishTime) >=
        lit("2024-01-15 00:00:00").cast("timestamp"))
      .groupBy(col(Envelope.Partition))
      .agg(min(Envelope.Offset).as("seek_offset"))
      .orderBy(Envelope.Partition)

  /** §2.6 last message id per partition. */
  private def qLastIds(s: SparkSession, dir: String): DataFrame =
    Dispatch.lastMessageIds(env(s, dir)).orderBy(Envelope.Partition)

  /** §2.6 peek first 10 messages per partition. */
  private def qPeek(s: SparkSession, dir: String): DataFrame =
    Dispatch.peek(env(s, dir), 10)
      .select(col(Envelope.Partition), col(Envelope.Offset), col(Envelope.Key))
      .orderBy(Envelope.Partition, Envelope.Offset)

  /** §2.3/2.6 examine message: the 5th from earliest and 3rd from latest
    * per partition, unioned with a direction tag. Deliberately TWO
    * pruned scans, not one combined pass: each side keeps its
    * WindowGroupLimit (top-n bounded map-side, shuffle ≈ n rows per
    * partition), which a single scan with an OR over two ranks cannot —
    * Spark would shuffle the whole log. Gate-asserted in
    * PlanQualitySpec. */
  private def qExamine(s: SparkSession, dir: String): DataFrame = {
    val e = env(s, dir)
    Dispatch.examineMessage(e, "earliest", 5)
      .select(lit("earliest").as("from_pos"), col(Envelope.Partition),
        col(Envelope.Offset), col(Envelope.Key))
      .unionByName(Dispatch.examineMessage(e, "latest", 3)
        .select(lit("latest").as("from_pos"), col(Envelope.Partition),
          col(Envelope.Offset), col(Envelope.Key)))
      .orderBy("from_pos", Envelope.Partition)
  }

  /** §2.10 DLQ/retry routing after maxRedeliverCount = 3. */
  private def qDlqRoute(s: SparkSession, dir: String): DataFrame =
    Dispatch.dlqRoute(env(s, dir), "sub1", 3)
      .groupBy("route_topic").agg(count(lit(1)).cast("bigint").as("n"))
      .orderBy("route_topic")

  /** §2.13 replication copy filter (no loops). */
  private def qReplication(s: SparkSession, dir: String): DataFrame =
    Dispatch.replicateTo(env(s, dir), "cluster-0", "cluster-1")
      .groupBy(Envelope.ReplicatedFrom)
      .agg(count(lit(1)).cast("bigint").as("n"))
      .orderBy(Envelope.ReplicatedFrom)

  /** §2.13 replication on the STREAMING path — the production shape:
    * the reference's replicator IS a continuous copy job
    * (PersistentReplicator consumes the local topic and re-publishes),
    * so the loop/cycle filter must hold per microbatch. Converges to
    * the batch `replication_filter` counts under the same oracle. */
  private def qReplicationStream(s: SparkSession, dir: String): DataFrame =
    runStreamToLocal(s,
      Dispatch.replicateTo(Envelope.fromEventsStream(s, dir),
          "cluster-0", "cluster-1")
        .groupBy(Envelope.ReplicatedFrom)
        .agg(count(lit(1)).cast("bigint").as("n")))
      .orderBy(Envelope.ReplicatedFrom)

  /** §2.5 tumbling 1h event-time window per event_type. */
  private def qWindowTumbling(s: SparkSession, dir: String): DataFrame =
    Windows.tumbling(env(s, dir), Envelope.EventTime, "1 hour",
      Seq(col("event_type")),
      Seq(count(lit(1)).cast("bigint").as("n"),
        sum(dec(col("metric_value"))).cast("double").as("sum_value")))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("hour", "event_type")

  /** §2.5 tumbling windows on the STREAMING path: the same windowed
    * aggregation as [[qWindowTumbling]] run as an actual streaming
    * query (complete-mode memory sink, processAllAvailable barrier) —
    * stateful streaming window aggregation must converge to the batch
    * result row-for-row under the same oracle. */
  private def qWindowTumblingStream(s: SparkSession, dir: String): DataFrame =
    runStreamToLocal(s, Windows.tumbling(Envelope.fromEventsStream(s, dir),
        Envelope.EventTime, "1 hour",
        Seq(col("event_type")),
        Seq(count(lit(1)).cast("bigint").as("n"),
          sum(dec(col("metric_value"))).cast("double").as("sum_value"))))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("hour", "event_type")

  /** §2.5 sliding 1h/30m window per event_type. */
  private def qWindowSliding(s: SparkSession, dir: String): DataFrame =
    Windows.sliding(env(s, dir), Envelope.EventTime, "1 hour", "30 minutes",
      Seq(col("event_type")),
      Seq(count(lit(1)).cast("bigint").as("n")))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("wstart"),
        col("event_type"), col("n"))
      .orderBy("wstart", "event_type")

  /** §2.5/§7.4 count-based tumbling windows (20 events per user). */
  private def qWindowCount(s: SparkSession, dir: String): DataFrame =
    Windows.countTumblingBatch(env(s, dir), Envelope.Key, Envelope.Offset, 20,
      Seq(sum(dec(col("metric_value"))).cast("double").as("sum_value"),
        max(Envelope.Offset).as("last_offset")))
      .select(col(Envelope.Key), col("window_id"), col("sum_value"), col("last_offset"))
      .orderBy(Envelope.Key, "window_id")

  /** §2.5/§7.4 sliding count windows: every 10th event per user fires a
    * window over the last 25 events (decimal-exact sum). */
  private def qWindowCountSliding(s: SparkSession, dir: String): DataFrame =
    Windows.countSlidingBatch(
        env(s, dir).withColumn("mv", dec(col("metric_value"))),
        Envelope.Key, Envelope.Offset, length = 25, slide = 10, valueCol = "mv")
      .select(col(Envelope.Key), col("trigger_id"),
        col("w_sum").cast("double").as("w_sum"),
        col("w_max").cast("double").as("w_max"))
      .orderBy(Envelope.Key, "trigger_id")

  /** §2.5 session windows (30-minute inactivity gap) per user — Spark
    * session_window vs the oracle's gaps-and-islands reconstruction. */
  private def qSessionWindows(s: SparkSession, dir: String): DataFrame =
    Windows.session(env(s, dir), Envelope.EventTime, "30 minutes",
        keys = Seq(col(Envelope.Key)), aggs = Seq(count(lit(1)).as("n")))
      .groupBy(Envelope.Key)
      .agg(count(lit(1)).cast("bigint").as("n_sessions"),
        sum("n").cast("bigint").as("n_events"))
      .orderBy(col(Envelope.Key))

  /** §2.5 session windows on the STREAMING path: the stateful
    * session_window aggregation runs through readStream →
    * complete-mode memory sink and must converge to the same
    * per-session rows the batch islands oracle derives — gating the
    * streaming session-state machinery (merge-on-gap, state store)
    * under the DuckDB oracle. */
  private def qSessionWindowsStream(s: SparkSession, dir: String): DataFrame = {
    // 10× growth attribution (r9): 5.8× for 10× data, the one stream
    // twin above the 2-3× band. The fixture's mean per-user inter-event
    // gap (~4 h) dwarfs the 30-min session gap, so sessions ≈ singleton
    // events and complete mode re-emits ~n sessions EVERY trigger —
    // cost is (state ≈ n) × triggers by semantics, not a plan defect.
    // SPARK-36576 local pre-merge was A/B'd and does NOT help here
    // (14.8 s vs 14.4 s warm at 10×): singleton sessions give the local
    // merge nothing to collapse. A production deployment bounds this
    // with a watermark + append (sessions emit once, state evicts); the
    // oracle twin needs complete mode because the fixture's part files
    // are not time-ordered, so any watermark drops legitimate rows.
    runStreamToLocal(s,
      Windows.session(Envelope.fromEventsStream(s, dir), Envelope.EventTime,
        "30 minutes", keys = Seq(col(Envelope.Key)),
        aggs = Seq(count(lit(1)).cast("bigint").as("n"))))
      .select(col(Envelope.Key),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        col("n"))
      .orderBy(Envelope.Key, "session_start")
  }

  /** Recursive delete (files then dirs, best-effort) — the ONE temp-tree
    * cleanup used by the stream-slice writer, the fixture cache, and
    * the stream-sink shutdown hook. */
  private def deleteTree(root: java.nio.file.Path): Unit = {
    if (!java.nio.file.Files.exists(root)) return
    val w = java.nio.file.Files.walk(root)
    try w.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(p => { java.nio.file.Files.deleteIfExists(p): Unit })
    finally w.close()
  }

  /** Write `df` as ONE parquet file `destDir/name` with an explicit
    * mtime — the unit of replay for file-stream fixtures whose TRIGGER
    * ORDER matters (the source lists oldest-mtime-first). */
  private def writeStreamSlice(df: DataFrame, destDir: String, name: String,
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

  /** §2.5 session windows, BOUNDED-STATE streaming configuration —
    * watermark + APPEND mode, the production deployment shape (the
    * complete-mode twin above is the unordered-source fallback whose
    * state grows with n × triggers by semantics). The fixture is the
    * same events data written as TIME-ORDERED range-bucket files
    * (bucket i's max event_time ≤ bucket i+1's min, mtimes increasing,
    * so the file source replays them in event-time order and the
    * watermark never drops a legitimate row), plus one far-future
    * sentinel row whose final batch advances the watermark past every
    * real session's end — each session emits EXACTLY ONCE and its state
    * evicts (Spark's no-data microbatch flushes the tail). Trigger
    * count is constant in data size (fixed bucket count), so at 10×/
    * 100× the wall tracks data volume, not trigger overhead. */
  private def qSessionWindowsWatermark(s: SparkSession, dir: String): DataFrame = {
    val nb = 8
    val root = Fixtures.dir(s, dir, "q-sesswm") { r =>
      val ev = env(s, dir).select(col(Envelope.Key), col(Envelope.EventTime))
      val b = ev.agg(min(Envelope.EventTime), max(Envelope.EventTime)).head()
      val lo = b.getTimestamp(0).getTime
      val hi = b.getTimestamp(1).getTime
      val span = math.max(1L, hi - lo + 1)
      // persist: the loop below writes one slice per bucket — without
      // the cache each filter re-scans and re-buckets the WHOLE events
      // frame (nb+1 full passes; at the stress tier's 100× that is the
      // dominant fixture-build cost)
      val bucketed = ev.withColumn("_b",
        least(lit(nb - 1), floor((unix_millis(col(Envelope.EventTime)) - lo)
          * nb / span)).cast("int"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val sentinel = s.range(1).select(
        lit("__wm__").as(Envelope.Key),
        timestamp_millis(lit(hi + (150 * 60 * 1000L))).as(Envelope.EventTime),
        lit(nb).as("_b"))
      val base = System.currentTimeMillis() - (nb + 2) * 2000L
      try (0 to nb).foreach { i =>
        val part = if (i == nb) sentinel else bucketed.filter(col("_b") === i)
        // the file source replays oldest-mtime-first: the bucket order
        // IS the event-time order, pinned explicitly (a same-ms batch
        // of moves would otherwise tie)
        writeStreamSlice(part.drop("_b"), r, f"batch_$i%04d.parquet",
          base + i * 2000L)
      } finally { bucketed.unpersist(false): Unit }
    }
    // 3 range files per trigger: the watermark/state machinery still
    // cycles across multiple triggers (the semantics under test) without
    // paying 9 trigger setups — files within one trigger may interleave
    // freely because the watermark only advances BETWEEN triggers
    val schema = s.read.parquet(root).schema
    val stream = s.readStream.schema(schema).option("maxFilesPerTrigger", 3)
      .option("pathGlobFilter", "*.parquet").parquet(root)
    runStreamToLocal(s,
      Windows.session(stream, Envelope.EventTime, "30 minutes",
        keys = Seq(col(Envelope.Key)),
        aggs = Seq(count(lit(1)).cast("bigint").as("n")),
        maxLag = Some("1 second")),
      mode = "append")
      .filter(col(Envelope.Key) =!= "__wm__")
      .select(col(Envelope.Key),
        date_format(col("session_window.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        col("n"))
      .orderBy(Envelope.Key, "session_start")
  }

  /** §2.9 STRATEGIC compaction on the oracle surface (reference
    * StrategicTwoPhaseCompactor with a pluggable strategy): keep the
    * MAX-metric message per key (offset tie-break), tombstones (null
    * value) still deleting the key — the custom total-order strategy
    * the spec suite exercises, now hash-checked against a DuckDB
    * ROW_NUMBER replay. */
  private def qCompactionStrategic(s: SparkSession, dir: String): DataFrame =
    Compaction.strategic(env(s, dir),
        Seq(col("metric_value"), col(Envelope.Offset)))
      .select(col(Envelope.Key),
        round(col("metric_value"), 6).as("metric_r"), col(Envelope.Offset))
      .orderBy(Envelope.Key)

  /** §2.3 partition-count expansion (reference `pulsar-admin topics
    * update-partitions`): the 4-partition log expands to 6, then a new
    * batch key-hash routes over the NEW count — existing rows keep
    * their partition and offsets, new partitions start at offset 0,
    * and the per-partition totals are the mm3%4 originals plus the
    * mm3%6 appends, replayed exactly in the oracle. */
  private def qPartitionUpdate(s: SparkSession, dir: String): DataFrame = {
    val name = graft.model.TopicName.parse("persistent://public/default/events")
    val root = Fixtures.dir(s, dir, "q-partupd") { r =>
      val tl0 = new graft.log.TopicLog(s, r, name, 4)
      val e = env(s, dir).drop(Envelope.Topic, Envelope.Partition)
      tl0.append(e): Unit
      val tl6 = graft.log.Admin.updatePartitions(tl0, 6)
      tl6.append(e.filter(col(Envelope.SequenceId) % 5 === 0)): Unit
    }
    new graft.log.TopicLog(s, root, name, 6).read()
      .groupBy(Envelope.Partition)
      .agg(count(lit(1)).cast("bigint").as("n"),
        max(Envelope.Offset).as("max_offset"))
      .orderBy(Envelope.Partition)
  }

  /** §2.9 triggerCompaction + readCompacted on the oracle surface
    * (reference Topics.triggerCompaction:2066 → two-phase compactor →
    * CompactedTopicImpl): the first three calendar quartiles append,
    * compaction materializes the snapshot + per-partition horizon, the
    * fourth quartile appends as the uncompacted tail — a readCompacted
    * consumer sees (last non-tombstone value per key at or below the
    * horizon) ∪ (raw tail). The oracle replays the horizon cut, the
    * per-key winner (publish-order = offset order), and the tombstone
    * drop. The offset-order == (publish_time, seq)-order alignment the
    * oracle relies on holds ONLY because the dayofmonth quartile cuts
    * partition publish_time monotonically WITHIN ONE CALENDAR MONTH —
    * the fixture build asserts that precondition loudly, so a
    * multi-month fixture refresh fails here instead of silently
    * diverging the winners. */
  private def qReadCompacted(s: SparkSession, dir: String): DataFrame = {
    val name = graft.model.TopicName.parse("persistent://public/default/events")
    val root = Fixtures.dir(s, dir, "q-readcompacted") { r =>
      val tl0 = new graft.log.TopicLog(s, r, name, 4)
      val e = env(s, dir).drop(Envelope.Topic, Envelope.Partition)
      val months = e.select(countDistinct(
        date_format(col(Envelope.PublishTime), "yyyy-MM"))).head().getLong(0)
      require(months == 1L,
        s"read_compacted fixture spans $months calendar months — the " +
          "dayofmonth quartile cuts only align offset order with " +
          "(publish_time, seq) order inside one month; redesign the " +
          "cuts before trusting this oracle")
      val day = dayofmonth(col(Envelope.PublishTime))
      Seq(day <= 8, day > 8 && day <= 15, day > 15 && day <= 23)
        .foreach(p => tl0.append(e.filter(p)): Unit)
      val horizon = Compaction.triggerCompaction(tl0)
      require(horizon.nonEmpty, "compaction fixture is VACUOUS: no horizon")
      tl0.append(e.filter(day > 23)): Unit // the uncompacted tail
    }
    val tl = new graft.log.TopicLog(s, root, name, 4)
    Compaction.readCompactedTopic(tl)
      .groupBy(Envelope.Partition)
      .agg(count(lit(1)).cast("bigint").as("n_rows"),
        countDistinct(Envelope.Key).cast("bigint").as("n_keys"),
        max(Envelope.Offset).as("max_offset"))
      .orderBy(Envelope.Partition)
  }

  /** §2.4 exact percentiles (median/p25/p75) per event type. */
  private def qMedian(s: SparkSession, dir: String): DataFrame =
    env(s, dir).groupBy("event_type")
      .agg(expr("percentile(metric_value, 0.5)").as("median_value"),
        expr("percentile(metric_value, 0.25)").as("p25"),
        expr("percentile(metric_value, 0.75)").as("p75"))
      .orderBy("event_type")

  /** §2.4 mergeable HLL sketches: per-type sketch + exact distinct in one
    * aggregation. The estimate itself is not SQL-reproducible, so the
    * oracle-checked surface is the self-checking error-bound claim: the
    * query emits `within_bound` = |est − exact| / exact ≤ 5% (HLL p=12 ⇒
    * SE ≈ 1.6%, so 5% is ≥3σ) computed from the sketch IN the query, and
    * the oracle asserts the exact counts plus `TRUE` — a broken sketch or
    * estimator flips the column and breaks the hash match. Tighter bounds
    * and merge algebra are covered by HllSpec. */
  private def qHllCardinality(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Hll
    env(s, dir).groupBy("event_type")
      .agg(Hll.hll_sketch(col(Envelope.Key)).as("sk"),
        countDistinct(Envelope.Key).cast("bigint").as("exact"))
      .select(col("event_type"), col("exact"),
        (abs(Hll.hll_estimate(col("sk")).cast("double") - col("exact")) <=
          col("exact") * lit(0.05)).as("within_bound"))
      .orderBy("event_type")
  }

  /** §2.4 frequency sketch (Count-Min) heavy hitters: ONE map-side-
    * combined pass builds a mergeable d×w sketch of the whole log (no
    * per-key shuffle for the sketch — at 100 TB the sketch is the only
    * thing that crosses the wire, ~80 KB), then the true top-10 keys are
    * probed against it. Like hll_cardinality, the estimate is not
    * SQL-reproducible, so the oracle-checked surface is the CMS
    * guarantee evaluated IN the query: `lower_ok` = est ≥ exact (CMS
    * never undercounts — deterministic), `upper_ok` = est ≤ exact +
    * ceil(e/w · N) (the Cormode-Muthukrishnan ε·N bound). A broken
    * update/merge/estimate path flips a bool and breaks the hash. */
  private def qHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Cms
    val e = env(s, dir)
    val sk = e.agg(Cms.cms_sketch(col(Envelope.Key)).as("sk"),
      count(lit(1)).as("n_total"))
    val top = e.groupBy(Envelope.Key)
      .agg(count(lit(1)).cast("bigint").as("exact_n"))
      .orderBy(col("exact_n").desc, col(Envelope.Key))
      .limit(10)
    val est = Cms.cms_estimate(col("sk"), col(Envelope.Key))
    top.crossJoin(broadcast(sk))
      .select(col(Envelope.Key), col("exact_n"),
        (est >= col("exact_n")).as("lower_ok"),
        (est <= col("exact_n") +
          ceil(col("n_total") * lit(math.E / Cms.DefaultWidth)).cast("long"))
          .as("upper_ok"))
      .orderBy(col("exact_n").desc, col(Envelope.Key))
  }

  /** The NESTED envelope both SerDe roundtrips encode: scalars + a
    * nested struct + a properties map + a repeated ids list, all
    * derived deterministically from envelope columns so the identity
    * oracle can recompute every flattened output in pure SQL. */
  private def serdeNestedInput(e: DataFrame): DataFrame =
    e.select(col(Envelope.Offset).cast("long").as("offset"),
      col(Envelope.Key).as("key"), col(Envelope.Value).as("value"),
      col("event_type"),
      struct(substring(col("event_type"), 1, 2).as("lang"),
        coalesce(length(col(Envelope.Value)).cast("long"), lit(-1L)).as("n"))
        .as("meta"),
      map(lit("et"), col("event_type"), lit("k"), col(Envelope.Key)).as("props"),
      array(col(Envelope.Offset).cast("long"),
        col(Envelope.Offset).cast("long") + 1).as("ids"))

  /** Post-decode flattening shared by both roundtrips: nested fields
    * surface as scalar columns (map probed by key, array joined to csv)
    * so the DuckDB hash compare stays on scalar ground. */
  private def serdeFlatten(decoded: DataFrame): DataFrame =
    decoded.select(col("d.offset").as("offset"), col("d.key").as("key"),
      col("d.value").as("value"), col("d.event_type").as("event_type"),
      col("d.meta.lang").as("meta_lang"), col("d.meta.n").as("meta_n"),
      element_at(col("d.props"), "et").as("prop_et"),
      element_at(col("d.props"), "k").as("prop_k"),
      array_join(transform(col("d.ids"), _.cast("string")), ",").as("ids_csv"))
      .orderBy("offset")

  /** Identity oracle for the nested roundtrips: every flattened column
    * recomputed from the envelope in pure SQL. */
  private val serdeNestedOracle: String = envSql(
    """SELECT "offset", key, value, event_type,
      |  substr(event_type, 1, 2) AS meta_lang,
      |  CAST(COALESCE(length(value), -1) AS BIGINT) AS meta_n,
      |  event_type AS prop_et, key AS prop_k,
      |  CAST("offset" AS VARCHAR) || ',' || CAST("offset" + 1 AS VARCHAR) AS ids_csv
      |FROM envelope ORDER BY "offset"""".stripMargin)

  /** Schema-registry AVRO SerDe (§1.2): every envelope row encodes to
    * real Avro single-record binary — scalars, a [null,string] union, a
    * NESTED RECORD, a MAP and an ARRAY — and decodes back IN the query.
    * The oracle recomputes the flattened projection: any wire-format,
    * union-branch or nesting defect surfaces as a value/hash mismatch. */
  private def qAvroRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.AvroSerde
    val schemaJson =
      """{"type":"record","name":"env","fields":[
        |{"name":"offset","type":"long"},
        |{"name":"key","type":"string"},
        |{"name":"value","type":["null","string"],"default":null},
        |{"name":"event_type","type":"string"},
        |{"name":"meta","type":{"type":"record","name":"m","fields":[
        |  {"name":"lang","type":"string"},{"name":"n","type":"long"}]}},
        |{"name":"props","type":{"type":"map","values":"string"}},
        |{"name":"ids","type":{"type":"array","items":"long"}}]}""".stripMargin
    val in = serdeNestedInput(env(s, dir))
    val enc = AvroSerde.avro_encode(
      struct(in.columns.map(col).toIndexedSeq: _*), schemaJson)
    serdeFlatten(in.select(AvroSerde.avro_decode(enc, schemaJson).as("d")))
  }

  /** Schema-registry PROTOBUF_NATIVE SerDe (§1.2): same nested
    * identity-oracle pattern as [[qAvroRoundtrip]] over the hand-rolled
    * wire-format codec — tombstones exercise proto3 field omission and
    * presence; the nested struct / map / packed repeated field exercise
    * length-delimited submessages, map-entry messages and packed
    * encoding. */
  private def qProtoRoundtrip(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.ProtoSerde
    val spec = "1:int64:offset,2:string:key,3:string:value,4:string:event_type," +
      "5:message{1:string:lang,2:int64:n}:meta," +
      "6:map{string,string}:props,7:repeated int64:ids"
    val in = serdeNestedInput(env(s, dir))
    val enc = ProtoSerde.proto_encode(
      struct(in.columns.map(col).toIndexedSeq: _*), spec)
    serdeFlatten(in.select(ProtoSerde.proto_decode(enc, spec).as("d")))
  }

  /** §2.4 SpaceSaving top-k (the deterministic-guarantee heavy-hitter
    * sketch): one map-side-combined pass tracks m=64 counters over the
    * whole log; the certificate evaluates the Metwally guarantees IN the
    * query — tracked top-10 keys must satisfy `est−err ≤ exact ≤ est`
    * and `err ≤ floor(N/m)`; an untracked top-10 key must satisfy
    * `exact ≤ floor(N/m)` (anything heavier is guaranteed tracked).
    * Always-true booleans for a correct sketch regardless of Spark's
    * nondeterministic partition-merge order, so the hash is stable. */
  private def qSpaceSavingTopk(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.SpaceSaving
    val m = 64
    val e = env(s, dir)
    val sk = e.agg(SpaceSaving.ss_sketch(col(Envelope.Key), m).as("sk"),
      count(lit(1)).as("n_total"))
    val top = e.groupBy(Envelope.Key)
      .agg(count(lit(1)).cast("bigint").as("exact_n"))
      .orderBy(col("exact_n").desc, col(Envelope.Key))
      .limit(10)
    val probe = SpaceSaving.ss_probe(col("sk"), col(Envelope.Key))
    val cap = floor(col("n_total").cast("double") / m).cast("long")
    top.crossJoin(broadcast(sk))
      .select(col(Envelope.Key), col("exact_n"),
        when(probe.getField("tracked"),
          probe.getField("est") >= col("exact_n") &&
            probe.getField("est") - probe.getField("err") <= col("exact_n") &&
            probe.getField("err") <= cap)
          .otherwise(col("exact_n") <= cap)
          .as("guarantee_ok"))
      .orderBy(col("exact_n").desc, col(Envelope.Key))
  }

  /** §2.4 mergeable quantile sketch (KMV bottom-k row sample): per-type
    * sketches built in one pass, median probed from the sample. The
    * certificate is the TRUE rank of the estimated median, computed
    * exactly against the log: |rank − 0.5| ≤ 5% (k=1024 ⇒ σ ≈ 1.6%,
    * so 5% is ≥3σ — the [[qHllCardinality]] margin pattern). */
  private def qQuantileSketch(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Kmv
    val e = env(s, dir)
    val withEst = e.groupBy("event_type")
      .agg(Kmv.kmv_sketch(col("metric_value"), col(Envelope.Offset)).as("sk"),
        count(lit(1)).cast("bigint").as("n"))
      .select(col("event_type"), col("n"),
        Kmv.kmv_quantile(col("sk"), lit(0.5)).as("est_p50"))
    val ranks = e.join(broadcast(withEst), "event_type")
      .groupBy("event_type")
      .agg((sum(when(col("metric_value") <= col("est_p50"), 1L).otherwise(0L))
        .cast("double") / count(lit(1))).as("true_rank"))
    withEst.join(ranks, "event_type")
      .select(col("event_type"), col("n"),
        (abs(col("true_rank") - 0.5) <= 0.05).as("rank_ok"))
      .orderBy("event_type")
  }

  /** §2.7 keyed counters per user. */
  private def qCounters(s: SparkSession, dir: String): DataFrame =
    Windows.counters(env(s, dir), Envelope.Key)
      .withColumn("counter", col("counter").cast("bigint"))
      .orderBy(Envelope.Key)

  /** §2.1 multi-topic subscribe: union of two topic streams. */
  private def qMultiTopicUnion(s: SparkSession, dir: String): DataFrame = {
    val e = env(s, dir)
    val t1 = e.filter(col("event_type") === "purchase")
    val t2 = e.filter(col("event_type") === "click")
    t1.unionByName(t2)
      .groupBy("event_type").agg(count(lit(1)).cast("bigint").as("n"))
      .orderBy("event_type")
  }

  /** §2.1 DYNAMIC pattern subscribe (reference
    * PatternMultiTopicsConsumerImpl + TopicListWatcher semantics, the
    * PatternTopicsConsumerTest behaviors): the regex re-resolves per
    * microbatch, so evt-error — created only AFTER the first poll
    * already ran — contributes rows, while the simultaneously created
    * non-matching other-view never does. A once-resolved implementation
    * (the pre-r10 batch subscribePattern) would miss evt-error and
    * hash-mismatch. Fresh temp root + cursor per invocation: the
    * create-after-start sequence is the semantics under test, so it
    * must replay on every rep (dirs are GC'd by the shutdown hook). */
  private def qPatternSubscribe(s: SparkSession, dir: String): DataFrame = {
    val root = java.nio.file.Files.createTempDirectory("graft-pattern")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-pattern-ckpt")
    streamOutRoots.add(root); streamOutRoots.add(ckpt)
    val base = env(s, dir).filter(col(Envelope.Offset) < 3000)
      .drop(Envelope.Topic, Envelope.Partition)
    def mk(topic: String, etype: String): Unit =
      new graft.log.TopicLog(s, root.toString,
        graft.model.TopicName.parse(topic))
        .append(base.filter(col("event_type") === etype)): Unit
    mk("evt-purchase", "purchase"); mk("evt-click", "click")
    val sub = new graft.streaming.PatternSubscription(s, root.toString,
      "public", "default", "evt-.*", "oracle-sub", ckpt.toString)
    val batches = scala.collection.mutable.ArrayBuffer[DataFrame]()
    require(sub.poll((df, _) => { batches += df; () }) > 0,
      "initial match set must dispatch")
    mk("evt-error", "error"); mk("other-view", "view")
    require(sub.drain((df, _) => { batches += df; () }) > 0,
      "the mid-subscription topic must be discovered")
    batches.reduce(_.unionByName(_, allowMissingColumns = true))
      .groupBy("event_type").agg(count(lit(1)).cast("bigint").as("n"))
      .orderBy("event_type")
  }

  /** §2.10 Key_Shared ring assignment (murmur3 — rows-only oracle). */
  private def qKeyShared(s: SparkSession, dir: String): DataFrame =
    Dispatch.keySharedAssign(env(s, dir), 4)
      .groupBy("consumer_id").agg(count(lit(1)).cast("bigint").as("n"),
        countDistinct(Envelope.Key).cast("bigint").as("n_keys"))
      .orderBy("consumer_id")

  /** §2.2 chunking: split value into 4-byte chunks, reassemble, prove
    * content equality (output = the reassembled payloads themselves). */
  private def qChunkReassembly(s: SparkSession, dir: String): DataFrame = {
    val e = env(s, dir).filter(col(Envelope.Value).isNotNull &&
      col(Envelope.Offset) < 100)
      .select(col(Envelope.Offset), col(Envelope.Value))
    val chunks = operators.Chunking.split(e, Envelope.Value, chunkSize = 4,
      uuidCols = Seq(Envelope.Offset))
    operators.Chunking.reassemble(chunks)
      .select(col("chunk_uuid"), col("payload"))
      .orderBy("chunk_uuid")
  }

  /** §2.2 chunk reassembly on the CONSUME path (reference
    * ConsumerImpl.processMessageChunk buffers partial uuid groups
    * across deliveries; MessageChunkingTest): each uuid's chunks are
    * SCATTERED across 4 fixture files replayed one per trigger, so no
    * single microbatch ever sees a whole group — the
    * flatMapGroupsWithState buffer must carry partial groups across
    * triggers and emit each payload exactly once. Output hash-matches
    * the batch chunk_reassembly row (same oracle). */
  private def qChunkReassemblyStream(s: SparkSession, dir: String): DataFrame = {
    val root = Fixtures.dir(s, dir, "q-chunkstream") { r =>
      val e = env(s, dir).filter(col(Envelope.Value).isNotNull &&
        col(Envelope.Offset) < 100)
        .select(col(Envelope.Offset), col(Envelope.Value))
      val chunks = operators.Chunking.split(e, Envelope.Value, chunkSize = 4,
        uuidCols = Seq(Envelope.Offset))
      // 2 parity slices: every multi-chunk uuid still splits across
      // triggers (the buffering contract), at half the per-trigger
      // overhead of finer scatters; deeper 3-batch interleavings are
      // pinned by ChunkStreamSpec's MemoryStream cases
      val base = System.currentTimeMillis() - 16000L
      (0 until 2).foreach { i =>
        writeStreamSlice(chunks.filter(pmod(col("chunk_id"), lit(2)) === i),
          r, f"slice_$i%02d.parquet", base + i * 2000L)
      }
    }
    val schema = s.read.parquet(root).schema
    val stream = s.readStream.schema(schema).option("maxFilesPerTrigger", 1)
      .option("pathGlobFilter", "*.parquet").parquet(root)
    runStreamToLocal(s, operators.Chunking.reassembleStream(stream),
        mode = "append")
      .orderBy("chunk_uuid")
  }

  /** §2.2 message crypto: encrypt+decrypt round trip — output counts of
    * rows whose decrypted value equals the original (oracle = plain
    * envelope counts, so any crypto loss breaks the hash match). */
  private def qCryptoRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val key = "0123456789abcdef"
    val e = env(s, dir).filter(col(Envelope.Value).isNotNull)
    val roundtrip = operators.Produce.decryptValue(
      operators.Produce.encryptValue(
        e.withColumn("orig", col(Envelope.Value)), key), key)
    roundtrip.filter(col(Envelope.Value) === col("orig"))
      .groupBy("event_type").agg(count(lit(1)).cast("bigint").as("n"))
      .orderBy("event_type")
  }

  /** §2.3 backlog quota: per-partition backlog + eviction cursor. */
  private def qBacklogQuota(s: SparkSession, dir: String): DataFrame =
    graft.log.Admin.backlogQuota(env(s, dir),
        Map(0 -> -1L, 1 -> -1L, 2 -> -1L, 3 -> -1L), quotaMessages = 1000)
      .select(col(Envelope.Partition), col("backlog").cast("bigint").as("backlog"),
        col("head"), col("over_quota"), col("evict_to"))
      .orderBy(Envelope.Partition)

  /** §2.3 admin skip: cursor after skipping 100 messages per partition. */
  private def qAdminSkip(s: SparkSession, dir: String): DataFrame =
    Dispatch.skipMessages(env(s, dir),
        Map(0 -> -1L, 1 -> -1L, 2 -> -1L, 3 -> -1L), n = 100)
      .orderBy(Envelope.Partition)

  /** Topic stats (reference Topics.getStats): per-partition storage
    * counters + per-subscription mark-delete/backlog over two
    * deterministic ack fixtures — subA acks every offset not divisible
    * by 3 (out-of-order, gaps), subB acks the even offsets. The oracle
    * replays both cursors and the octet accounting in SQL. */
  /** Deterministic ack fixtures shared by EVERY stats query (and
    * mirrored in the shared `statsOracleCte` SQL — keep both in sync):
    * subA acks every offset not divisible by 3 (out-of-order, gap at
    * 0), subB acks the even offsets (dense prefix). */
  private def statsAckSubs(e: DataFrame): Map[String, DataFrame] = {
    def acks(pred: Column) = e.filter(pred)
      .select(col(Envelope.Partition).as("partition"),
        col(Envelope.Offset).as("offset"))
    Map("subA" -> acks(col(Envelope.Offset) % 3 =!= 0),
      "subB" -> acks(col(Envelope.Offset) % 2 === 0))
  }

  private def qTopicStats(s: SparkSession, dir: String): DataFrame = {
    val e = env(s, dir)
    graft.log.Admin.topicStats(e, statsAckSubs(e))
      .orderBy("subscription", "partition")
  }

  /** Topic throughput counters per hour (the msgRate/msgThroughput
    * surface of TopicStats as windowed counts). */
  private def qTopicRates(s: SparkSession, dir: String): DataFrame =
    graft.log.Admin.topicRates(env(s, dir), "1 hour")
      .select(col("partition"),
        date_format(col("bucket_start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("msgs"), col("bytes"))
      .orderBy("partition", "hour")

  /** Partitioned-topic stats rollup (Topics.getPartitionedStats,
    * perPartition=false): counters summed across partitions per
    * subscription, over the same ack fixtures as topic_stats. */
  private def qTopicStatsPartitioned(s: SparkSession, dir: String): DataFrame = {
    val e = env(s, dir)
    graft.log.Admin.partitionedStats(
        graft.log.Admin.topicStats(e, statsAckSubs(e)))
      .orderBy("subscription")
  }

  /** Per-partition storage counters on the STREAMING path: the live
    * stats a dashboard tails, as a complete-mode aggregation over
    * readStream — converges to the batch per-partition truth. */
  private def qTopicStatsStream(s: SparkSession, dir: String): DataFrame =
    runStreamToLocal(s, Envelope.fromEventsStream(s, dir)
        .groupBy(col(Envelope.Partition).as("partition"))
        .agg(count(lit(1)).cast("bigint").as("msg_count"),
          sum(graft.log.Admin.payloadOctets).cast("bigint").as("storage_bytes")))
      .orderBy("partition")

  /** §2.4 distinct aggregation: exact count-distinct users per type. */
  private def qCountDistinct(s: SparkSession, dir: String): DataFrame =
    env(s, dir).groupBy("event_type")
      .agg(countDistinct(Envelope.Key).cast("bigint").as("n_users"),
        count(lit(1)).cast("bigint").as("n_events"))
      .orderBy("event_type")

  /** §2.1 produce path end-to-end: route + append into a real topic log,
    * read back (murmur3 routing — rows-only oracle). */
  /** The shared built-once topic-log fixture (`q-log`): the envelope
    * appended through the real produce path. Every query that reads it
    * MUST build it through here — the fixture cache keys on the NAME,
    * so a second inline builder with a drifted recipe would silently
    * win or lose depending on run order. */
  private def qLogFixture(s: SparkSession, dir: String): graft.log.TopicLog = {
    val root = Fixtures.dir(s, dir, "q-log") { r =>
      val tl0 = new graft.log.TopicLog(s, r,
        graft.model.TopicName.parse("persistent://public/default/events"), 4)
      tl0.append(env(s, dir).drop(Envelope.Topic, Envelope.Partition))
    }
    new graft.log.TopicLog(s, root,
      graft.model.TopicName.parse("persistent://public/default/events"), 4)
  }

  private def qTopicLogRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val tl = qLogFixture(s, dir)
    tl.read().groupBy(Envelope.Partition)
      .agg(count(lit(1)).cast("bigint").as("n"),
        max(Envelope.Offset).as("max_offset"))
      .orderBy(Envelope.Partition)
  }

  /** §2.3/§4 manifest-history pruning on the oracle surface: six
    * appends build six manifest epochs, then the janitor prunes to the
    * newest two — and the read must stay byte-identical to the
    * full-envelope roundtrip (per-partition counts + dense offsets),
    * proving pruned history is never on the read path. A prune that
    * touched the latest manifest, a referenced data file, or the
    * high-water lines would shift counts or offsets and hash-mismatch. */
  private def qManifestPrune(s: SparkSession, dir: String): DataFrame = {
    val name = graft.model.TopicName.parse("persistent://public/default/events")
    val root = Fixtures.dir(s, dir, "q-prune") { r =>
      val tl = new graft.log.TopicLog(s, r, name, 4)
      val e = env(s, dir).drop(Envelope.Topic, Envelope.Partition)
      (0 until 6).foreach(i =>
        tl.append(e.filter(col(Envelope.Offset) % 6 === i)): Unit)
      require(tl.pruneManifests(keepLast = 2) > 0,
        "the prune must actually drop manifest history")
    }
    new graft.log.TopicLog(s, root, name, 4)
      .read().groupBy(Envelope.Partition)
      .agg(count(lit(1)).cast("bigint").as("n"),
        max(Envelope.Offset).as("max_offset"))
      .orderBy(Envelope.Partition)
  }

  /** Shadow-topic read view (reference ShadowReplicator.java): the
    * shadow shares the source log's committed storage, relabels the
    * topic name, and is read-only — so its per-partition truth is
    * exactly topic_log_roundtrip's with the shadow topic name attached;
    * any divergence means the shadow view dropped or duplicated rows. */
  private def qShadowRead(s: SparkSession, dir: String): DataFrame = {
    val shadow = new graft.log.ShadowTopic(qLogFixture(s, dir),
      graft.model.TopicName.parse("persistent://public/default/events-shadow"))
    shadow.read().groupBy(col(Envelope.Topic).as("topic"), col(Envelope.Partition))
      .agg(count(lit(1)).cast("bigint").as("n"),
        max(Envelope.Offset).as("max_offset"))
      .orderBy(Envelope.Partition)
  }

  /** §2.10/§4 dispatch rate limiting on the STREAMING path (VERDICT r7
    * #4 wiring): the committed topic log consumed through
    * [[graft.streaming.Subscription.consumeRateLimited]] — every
    * microbatch is admitted against the token bucket before dispatch —
    * and re-aggregated to the per-partition produce-roundtrip truth.
    * The throttle must be RESULT-NEUTRAL: a dropped or double-dispatched
    * batch breaks the same oracle as topic_log_roundtrip. Rate/burst are
    * set so the fixture takes a few admission waits (the loop really
    * throttles) without inflating the bench. */
  private def qDispatchRateStream(s: SparkSession, dir: String): DataFrame =
    rateLimitedRoundtrip(s, dir, "rate-sub")((sub, handler) =>
      sub.consumeRateLimited(rateMsgsPerSec = rateForScale(s, dir),
        burst = 2000L)(handler))

  /** Scale-invariant throttle rate: rows/rate — the configured wait
    * FLOOR — is semantics, not machinery; at a fixed 100k msg/s a 10×
    * fixture spends 10× wall purely WAITING, which measures the config
    * rather than the bucket. Keying the rate to the fixture row count
    * (min 100k, so the driver-scale fixtures are unchanged) pins the
    * floor at ~1 s at every scale while the 2000-token burst still
    * forces real admission waits on every trigger. */
  // WeakHashMap on the session: a strong (session, dir) key would pin
  // every stopped SparkSession for the JVM's lifetime
  private val rateCache =
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, Double]]()
  private def rateForScale(s: SparkSession, dir: String): Double = {
    // cached per (session, fixture): the count is a metadata job, but an
    // extra Spark job inside every TIMED bench rep of both rate twins
    // would re-contaminate the measurement the scaling exists to clean
    val perSession = rateCache.synchronized {
      var m = rateCache.get(s)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[String, Double]()
        rateCache.put(s, m): Unit
      }
      m
    }
    perSession.computeIfAbsent(dir, _ =>
      math.max(100000.0,
        s.read.parquet(s"$dir/events.parquet").count().toDouble))
  }

  /** Shared harness for the two rate-limited consume twins: same
    * fixture, fresh per-invocation checkpoint (registered with the
    * shutdown sweep so bench reps don't accumulate cursor dirs), same
    * per-batch metering and the same produce-roundtrip re-aggregation —
    * only the admission discipline differs. */
  private def rateLimitedRoundtrip(s: SparkSession, dir: String, subName: String)(
      start: (graft.streaming.Subscription, (DataFrame, Long) => Unit)
        => org.apache.spark.sql.streaming.StreamingQuery): DataFrame = {
    val tl = qLogFixture(s, dir)
    val ckpt = java.nio.file.Files.createTempDirectory("graft-rate-ckpt")
    streamOutRoots.add(ckpt)
    val sub = new graft.streaming.Subscription(tl, subName,
      graft.streaming.SubscriptionType.Exclusive, ckpt.toString,
      policy = graft.streaming.BatchReceivePolicy(maxFilesPerTrigger = Some(8)))
    val acc = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, Long)]()
    val q = start(sub, { (batch, _) =>
      batch.groupBy(col(Envelope.Partition))
        .agg(count(lit(1)).as("n"), max(Envelope.Offset).as("mx"))
        .collect().foreach(r => acc.add((r.getInt(0), r.getLong(1), r.getLong(2)))): Unit
    })
    try q.processAllAvailable() finally q.stop()
    import scala.collection.JavaConverters._
    import s.implicits._
    acc.iterator().asScala.toSeq.toDF("partition", "pn", "pmx")
      .groupBy("partition")
      .agg(sum("pn").cast("bigint").as("n"), max("pmx").as("max_offset"))
      .orderBy("partition")
  }

  /** [[qDispatchRateStream]]'s twin under the reference-exact
    * dispatch-then-debt discipline
    * ([[graft.streaming.Subscription.consumeRateLimitedDebt]];
    * AsyncTokenBucket's consume-unconditionally-then-pause flow): the
    * batch dispatches first and the bucket balance may go negative —
    * result-neutrality against the same produce-roundtrip truth proves
    * the debt pauses reorder NOTHING and drop NOTHING, they only time
    * the triggers. */
  private def qDispatchRateDebtStream(s: SparkSession, dir: String): DataFrame =
    rateLimitedRoundtrip(s, dir, "rate-debt-sub")((sub, handler) =>
      sub.consumeRateLimitedDebt(msgs = Some((rateForScale(s, dir), 2000L)),
        bytes = None)(handler))

  /** Chunking × dedup composition (reference
    * MessageChunkingDeduplicationTest; VERDICT r7 #7): documents are
    * chunk-split (one sequence id per LOGICAL message), the arrival
    * stream injects a mid-stream retransmit of chunk 1 (doc_id%7=0), a
    * full same-sequence resend (doc_id%11=0), and a lost final chunk
    * (doc_id%13=5 when no resend refills it). Two refill paths are part
    * of the truth: the %11 resend always refills, and the %7 chunk-1
    * retransmit refills exactly the 2-chunk documents (their final
    * chunk IS chunk 1) — the oracle's closed form carries both. Then
    * chunk-aware dedup + reassembly run. Correctness is BYTE IDENTITY: every surviving message must
    * reassemble to exactly the original text (md5 + length), and lost
    * messages must not surface — double-counted or dropped chunks break
    * the hash. The oracle never replays the pipeline; original text IS
    * the truth. */
  private def qChunkDedup(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Chunking, Dedup}
    val docs = tbl(s, dir, "documents").select(col("doc_id"), col("text"))
      .filter(col("text").isNotNull)
    val chunks = Chunking.split(docs, "text", 64, Seq("doc_id"))
      .withColumn(Envelope.ProducerName, concat(lit("p"), col("doc_id") % 3))
      .withColumn(Envelope.SequenceId, col("doc_id"))
    val dupChunk = chunks.filter(col("doc_id") % 7 === 0 && col("chunk_id") === 1)
    val resend = chunks.filter(col("doc_id") % 11 === 0)
    val lostLast = col("doc_id") % 13 === 5 && col("doc_id") % 11 =!= 0 &&
      col("chunk_id") === col("num_chunks") - 1 && col("num_chunks") > 1
    val arrivals = chunks.withColumn("attempt", lit(0)).filter(!lostLast)
      .unionByName(dupChunk.withColumn("attempt", lit(1)))
      .unionByName(resend.withColumn("attempt", lit(2)))
    // broker arrival order per producer: retransmits land mid-stream
    // (right after the chunk they duplicate) — the harder dedup case
    val w = Window.partitionBy(Envelope.ProducerName)
      .orderBy(col(Envelope.SequenceId), col("chunk_id"), col("attempt"))
    val withOffsets = arrivals
      .withColumn(Envelope.Offset, row_number().over(w).cast("long"))
    Chunking.reassemble(Dedup.dedupChunked(withOffsets))
      .select(col("chunk_uuid").cast("bigint").as("doc_id"),
        md5(col("payload")).as("payload_md5"),
        length(col("payload")).cast("bigint").as("payload_len"))
      .orderBy("doc_id")
  }

  /** §2.12 transactional acknowledgment (reference Transaction.java:30-93
    * via PendingAckHandleImpl): ONE txn acks a deterministic slice of the
    * input topic AND produces a derived batch to the output topic through
    * the same commit marker. The oracle rebuilds both legs in SQL: the
    * cursor (markDelete = largest dense acked prefix per partition), the
    * remaining backlog, and the output topic's per-partition counts —
    * a partial commit (ack without produce or vice versa) breaks the
    * hash match. Built once, cached (`q-txn-ack`). */
  private def qTxnAckFixture(s: SparkSession, dir: String)
      : (graft.log.TopicLog, graft.log.AckLog, graft.log.TopicLog) = {
    val inName = graft.model.TopicName.parse("persistent://public/default/txn-events")
    val outName = graft.model.TopicName.parse("persistent://public/default/txn-out")
    val root = Fixtures.dir(s, dir, "q-txn-ack") { r =>
      val in = new graft.log.TopicLog(s, r, inName, 4)
      val out = new graft.log.TopicLog(s, r, outName, 4)
      in.append(env(s, dir).drop(Envelope.Topic, Envelope.Partition))
      val acks = new graft.log.AckLog(s, in.name.path(r), "sub-a")
      // ack set defined purely on offset values (deterministic regardless
      // of offset-assignment tie-breaks): the 0..10 prefix + every 3rd
      val toAck = in.read()
        .filter(col(Envelope.Offset) <= 10 || col(Envelope.Offset) % 3 === 0)
        .select(col(Envelope.Partition).as("partition"),
          col(Envelope.Offset).as("offset"))
      // output selected pre-routing by a deterministic envelope column
      val outBatch = env(s, dir).filter(col(Envelope.SequenceId) % 5 === 0)
        .drop(Envelope.Topic, Envelope.Partition)
      graft.log.Txn.begin(r).produce(out, outBatch).ack(acks, toAck).commit()
    }
    val in = new graft.log.TopicLog(s, root, inName, 4)
    (in, new graft.log.AckLog(s, in.name.path(root), "sub-a"),
      new graft.log.TopicLog(s, root, outName, 4))
  }

  private def qTxnAck(s: SparkSession, dir: String): DataFrame = {
    val (in, acks, out) = qTxnAckFixture(s, dir)
    val md = graft.streaming.AckState.markDeletePosition(acks.read())
    val bl = graft.streaming.AckState.backlog(in.read(), acks.read())
    val outAgg = out.read()
      .groupBy(col(Envelope.Partition).as("partition"))
      .agg(count(lit(1)).cast("bigint").as("out_n"),
        max(Envelope.Offset).as("out_max_offset"))
    md.join(bl, Seq("partition")).join(outAgg, Seq("partition"))
      .orderBy("partition")
  }

  /** Ack-log compaction is ANSWER-PRESERVING (ManagedCursorImpl
    * semantics: cursor = markDeletePosition + individual acks above it,
    * history forgotten): the txn_ack fixture recipe replayed in its own
    * root, then `AckLog.compact()` folds the dense acked prefix into
    * the cursor floor and deletes its rows — and the floor-aware
    * accessors must still produce EXACTLY the txn_ack truth (same
    * oracle SQL). A compaction that loses an ack, resurrects one, or
    * mis-seats the floor breaks the hash. */
  private def qAckCompaction(s: SparkSession, dir: String): DataFrame = {
    val inName = graft.model.TopicName.parse("persistent://public/default/txnc-events")
    val outName = graft.model.TopicName.parse("persistent://public/default/txnc-out")
    val root = Fixtures.dir(s, dir, "q-ack-compaction") { r =>
      val in = new graft.log.TopicLog(s, r, inName, 4)
      val out = new graft.log.TopicLog(s, r, outName, 4)
      in.append(env(s, dir).drop(Envelope.Topic, Envelope.Partition))
      val acks = new graft.log.AckLog(s, in.name.path(r), "sub-a")
      val toAck = in.read()
        .filter(col(Envelope.Offset) <= 10 || col(Envelope.Offset) % 3 === 0)
        .select(col(Envelope.Partition).as("partition"),
          col(Envelope.Offset).as("offset"))
      val outBatch = env(s, dir).filter(col(Envelope.SequenceId) % 5 === 0)
        .drop(Envelope.Topic, Envelope.Partition)
      graft.log.Txn.begin(r).produce(out, outBatch).ack(acks, toAck).commit()
      acks.compact(): Unit
    }
    val in = new graft.log.TopicLog(s, root, inName, 4)
    val acks = new graft.log.AckLog(s, in.name.path(root), "sub-a")
    val out = new graft.log.TopicLog(s, root, outName, 4)
    val outAgg = out.read()
      .groupBy(col(Envelope.Partition).as("partition"))
      .agg(count(lit(1)).cast("bigint").as("out_n"),
        max(Envelope.Offset).as("out_max_offset"))
    acks.markDelete().join(acks.backlogAgainst(in.read()), Seq("partition"))
      .join(outAgg, Seq("partition"))
      .orderBy("partition")
  }

  /** §2.10 STICKY explicit hash ranges, oracle-checked — including the
    * reference behavior for slots OUTSIDE every range (no consumer:
    * NULL routing), exercised via a deliberate gap at 21846..29999. */
  private def qKeySharedSticky(s: SparkSession, dir: String): DataFrame =
    Dispatch.keySharedSticky(env(s, dir),
        Seq((0, 21845, "c1"), (30000, 52000, "c2"), (52001, 65535, "c3")))
      .groupBy("consumer_id")
      .agg(count(lit(1)).cast("bigint").as("n"),
        countDistinct(Envelope.Key).cast("bigint").as("n_keys"),
        min("slot").cast("bigint").as("min_slot"),
        max("slot").cast("bigint").as("max_slot"))
      // NULLS FIRST explicitly on both sides: Spark defaults nulls first,
      // DuckDB nulls last — the gap group must sort identically
      .orderBy(col("consumer_id").asc_nulls_first)

  /** §2.10 Key_Shared membership change, fully oracle-checked: the
    * DuckDB side rebuilds BOTH consistent-hash rings in SQL (ring point
    * = mm3_8("c-i") % 65536, ceiling lookup with the engine's exact
    * (point, owner) tie-break and wrap-around) and reproduces every
    * row's before/after owner — hash collisions between ring points
    * included. Movement counts per (before → after) pair are the output,
    * so the minimal-movement property is itself oracle-verified. */
  private def qKeySharedRebalance(s: SparkSession, dir: String): DataFrame =
    Dispatch.keySharedRebalance(env(s, dir),
        oldConsumers = Seq("c1", "c2", "c3"),
        newConsumers = Seq("c1", "c2", "c3", "c4"))
      .groupBy("consumer_before", "consumer_after")
      .agg(count(lit(1)).cast("bigint").as("n"),
        countDistinct(Envelope.Key).cast("bigint").as("n_keys"))
      .orderBy("consumer_before", "consumer_after")

  /** [[qKeySharedRebalance]] with DRAIN CURSORS (DrainingHashesTracker;
    * VERDICT r8 #3 as an oracle row, complementing KeySharedDrainSpec):
    * rows of a moved slot at or below the per-partition drain cursor
    * (60% of max offset) stay with the OLD owner — in flight, still
    * draining — while rows above route to the NEW owner. The oracle
    * replays the consistent-hash ring (mm3 macros) AND the cursor
    * split, so a drain rule that leaks a row to the wrong side of the
    * handover breaks the hash. */
  private def qKeySharedDrain(s: SparkSession, dir: String): DataFrame = {
    val e = env(s, dir)
    val cursors: Map[Int, Long] = e.groupBy(Envelope.Partition)
      .agg(expr(s"max(${Envelope.Offset}) * 3 div 5").as("md"))
      .collect() // bounded: one row per partition
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    Dispatch.keySharedRebalance(e,
        oldConsumers = Seq("c1", "c2", "c3"),
        newConsumers = Seq("c1", "c2", "c3", "c4"),
        drainedUpTo = cursors)
      .groupBy("moved", "consumer_id")
      .agg(count(lit(1)).cast("bigint").as("n"),
        countDistinct(Envelope.Key).cast("bigint").as("n_keys"),
        max(Envelope.Offset).as("max_offset"))
      .orderBy("moved", "consumer_id")
  }

  /** Snapshot coalesce end-to-end on the oracle surface: append through
    * the produce path, coalesce to one file per partition (manifest file
    * snapshot), vacuum the replaced files — and prove content identity:
    * the output (and oracle) is exactly topic_log_roundtrip's, so any
    * row lost or duplicated by the rewrite breaks the hash match. */
  private def qCoalesceRoundtrip(s: SparkSession, dir: String): DataFrame = {
    val root = Fixtures.dir(s, dir, "q-coalesce") { r =>
      val tl0 = new graft.log.TopicLog(s, r,
        graft.model.TopicName.parse("persistent://public/default/events"), 4)
      tl0.append(env(s, dir).drop(Envelope.Topic, Envelope.Partition))
      graft.log.Admin.coalesceFiles(tl0, filesPerPartition = 1)
      tl0.vacuum()
    }
    val tl = new graft.log.TopicLog(s, root,
      graft.model.TopicName.parse("persistent://public/default/events"), 4)
    tl.read().groupBy(Envelope.Partition)
      .agg(count(lit(1)).cast("bigint").as("n"),
        max(Envelope.Offset).as("max_offset"))
      .orderBy(Envelope.Partition)
  }

  /** §2.14 tiered-storage offload on the oracle surface (reference
    * LedgerOffloader.java:137/183 + transparent read-back): append
    * through the produce path, offload every file whose max offset sits
    * in the cold half, vacuum the hot originals, then read through
    * [[graft.log.Admin.readTiered]] (hot ∪ cold) — the output (and
    * oracle) is exactly topic_log_roundtrip's, so a row lost,
    * duplicated, or double-served at the hot/cold seam breaks the hash
    * match. */
  private def qOffloadRead(s: SparkSession, dir: String): DataFrame = {
    val name = graft.model.TopicName.parse("persistent://public/default/events")
    val root = Fixtures.dir(s, dir, "q-offload") { r =>
      val tl0 = new graft.log.TopicLog(s, r, name, 4)
      // four calendar-quartile appends (one append = one file per
      // partition with a contiguous offset range) — a single append
      // would leave ONE file per partition whose max offset exceeds any
      // mid cut, and offload would silently move nothing
      val e = env(s, dir).drop(Envelope.Topic, Envelope.Partition)
      val day = dayofmonth(col(Envelope.PublishTime))
      Seq(day <= 8, day > 8 && day <= 15, day > 15 && day <= 23, day > 23)
        .foreach(p => tl0.append(e.filter(p)): Unit)
      val mid = tl0.read().agg(max(Envelope.Offset)).head().getLong(0) / 2
      val moved = graft.log.Admin.offload(tl0, beforeOffset = mid)
      require(moved > 0,
        s"offload fixture is VACUOUS: no file's max offset <= $mid — " +
          "the row would test nothing; fix the batch layout")
      tl0.vacuum()
    }
    val tl = new graft.log.TopicLog(s, root, name, 4)
    graft.log.Admin.readTiered(tl)
      .groupBy(Envelope.Partition)
      .agg(count(lit(1)).cast("bigint").as("n"),
        max(Envelope.Offset).as("max_offset"))
      .orderBy(Envelope.Partition)
  }

  /** §2.3 retention trim on the oracle surface (reference ledger trim:
    * a ledger is deleted only when ENTIRELY out of retention —
    * file-granular here): the four-quartile fixture trimmed at
    * now=Feb 1, retention=14 days deletes exactly the day≤8 and day≤15
    * files; the day 16-23 file SURVIVES WHOLE even though its Jan 16-17
    * rows are outside retention — the file-granularity semantics the
    * oracle replays (survivors = day>15 rows, min surviving offset =
    * the count of trimmed rows, max untouched). */
  private def qRetentionTrim(s: SparkSession, dir: String): DataFrame = {
    val name = graft.model.TopicName.parse("persistent://public/default/events")
    val root = Fixtures.dir(s, dir, "q-retention") { r =>
      val tl0 = new graft.log.TopicLog(s, r, name, 4)
      val e = env(s, dir).drop(Envelope.Topic, Envelope.Partition)
      val day = dayofmonth(col(Envelope.PublishTime))
      Seq(day <= 8, day > 8 && day <= 15, day > 15 && day <= 23, day > 23)
        .foreach(p => tl0.append(e.filter(p)): Unit)
      val trimmed = graft.log.Admin.retentionTrim(tl0,
        nowMs = java.sql.Timestamp.valueOf("2024-02-01 00:00:00").getTime,
        retentionMs = 14L * 24 * 3600 * 1000)
      require(trimmed > 0, "retention fixture is VACUOUS: nothing trimmed")
    }
    val tl = new graft.log.TopicLog(s, root, name, 4)
    tl.read().groupBy(Envelope.Partition)
      .agg(count(lit(1)).cast("bigint").as("n"),
        min(Envelope.Offset).as("min_offset"),
        max(Envelope.Offset).as("max_offset"))
      .orderBy(Envelope.Partition)
  }

  /** Rotating-file-sink roundtrip on the oracle surface (hdfs3/alluxio
    * connector path): append through the produce path, stream the
    * committed log through the rotating text sink (tmp-write → fsync →
    * atomic rename, offset-ranged names), read the files back with the
    * codegen'd inverse mapping and recount — output (and oracle) is
    * exactly topic_log_roundtrip's, so a record lost, duplicated or
    * mis-bounded by the file layer breaks the hash match. */
  private def qFileSinkRoundtrip(s: SparkSession, dir: String): DataFrame = {
    def cfg(r: String) = graft.sources.FileRotatingSink.Config(
      s"$r/out", "events", rotationRecords = 512)
    val root = Fixtures.dir(s, dir, "q-filesink") { r =>
      val tl = new graft.log.TopicLog(s, s"$r/log",
        graft.model.TopicName.parse("persistent://public/default/events"), 4)
      tl.append(env(s, dir).drop(Envelope.Topic, Envelope.Partition)): Unit
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(s"$r/out")): Unit
      graft.sources.FileRotatingSink
        .topicToFileSink(tl, cfg(r), s"$r/ckpt").awaitTermination()
    }
    graft.sources.FileRotatingSink.readBack(s, cfg(root))
      .groupBy("partition")
      .agg(count(lit(1)).cast("bigint").as("n"), max("offset").as("max_offset"))
      .orderBy("partition")
  }

  /** Multimodal pipeline with REAL header decoding: spec-valid PNG/JPEG/
    * GIF/WAV fixture bytes are synthesized per doc_id, then parsed back
    * by the container-header codecs and fed through the resize planner.
    * The oracle recomputes the fixture formulas in SQL, so a hash match
    * proves the parsers recover the true dimensions/channels/duration
    * from the bytes on every row. */
  private def qMultimodal(s: SparkSession, dir: String): DataFrame = {
    val docs = tbl(s, dir, "documents").select("doc_id")
    val media = ext.Multimodal.synthesizeMedia(docs, "doc_id")
    val meta = ext.Multimodal.withDecodedMeta(media, "payload")
    ext.Multimodal.withResizeTarget(meta, maxSide = 256)
      .select(col("doc_id"), col("media_meta.format").as("format"),
        col("media_meta.width").as("width"),
        col("media_meta.height").as("height"),
        col("media_meta.n_channels").as("n_channels"),
        col("media_meta.duration_ms").as("duration_ms"),
        col("target_width"))
      .orderBy("doc_id")
  }

  /** §2.10 Shared-subscription priority dispatch, oracle-checked: the
    * permit-cycle schedule (reference example order C1,C2,C3,C1,C4,C5,C4
    * for C1(p0,2) C2(p0,1) C3(p0,1) C4(p1,2) C5(p1,1)) is RECOMPUTED in
    * SQL from the (priority, permits) table — one row per permit ranked
    * by (priority, round, position) — and applied to the same
    * per-partition arrival ranks; per-consumer counts and offset spans
    * must agree exactly. */
  private def qSharedPriority(s: SparkSession, dir: String): DataFrame =
    Dispatch.sharedPriorityDispatch(env(s, dir),
        Seq(("c1", 0, 2), ("c2", 0, 1), ("c3", 0, 1), ("c4", 1, 2), ("c5", 1, 1)))
      .groupBy("consumer_id")
      .agg(count(lit(1)).cast("bigint").as("n"),
        min(Envelope.Offset).as("min_offset"),
        max(Envelope.Offset).as("max_offset"))
      .orderBy("consumer_id")

  /** Video/audio frame sampling, oracle-checked: one row per sampled
    * frame index (every 700 ms of decoded duration; images contribute
    * their single frame at 0). The oracle inverts the fixture duration
    * formulas and counts arithmetic frames — dur//step + 1 — so the
    * hash match pins the explode(sequence(...)) fencepost behavior. */
  private def qFrameSample(s: SparkSession, dir: String): DataFrame = {
    val docs = tbl(s, dir, "documents").select("doc_id")
    val media = ext.Multimodal.synthesizeMedia(docs, "doc_id")
    val meta = ext.Multimodal.withDecodedMeta(media, "payload")
    ext.Multimodal.sampleFrames(meta, everyMs = 700L)
      .groupBy(col("doc_id"), col("media_meta.format").as("format"))
      .agg(count(lit(1)).cast("bigint").as("n_frames"),
        max("frame_ms").as("last_frame_ms"))
      .orderBy("doc_id")
  }

  /** CDC apply (reference pulsar-io/debezium), oracle-checked end to end:
    * the query BUILDS real Debezium-shaped change envelopes from the
    * fixture (op = d for tombstones, c/u by offset parity; after = the
    * original payload, JSON-escaped by to_json), then materializes table
    * state with [[Connectors.cdcApply]] — per key the highest offset
    * wins, deletes remove the key, `after` round-trips the escape. The
    * oracle recomputes the surviving state from the base columns alone
    * (never parsing JSON), so a hash match proves the escape/parse
    * round-trip AND the apply semantics. */
  private def qCdcApply(s: SparkSession, dir: String): DataFrame = {
    val e = env(s, dir)
    val cdc = e
      .withColumn("_op",
        when(col(Envelope.Value).isNull, lit("d"))
          .otherwise(when(col(Envelope.Offset) % 3 === 0, lit("c"))
            .otherwise(lit("u"))))
      .withColumn(Envelope.Value,
        to_json(struct(col("_op").as("op"), col(Envelope.Value).as("after"))))
    graft.sources.Connectors.cdcApply(cdc)
      .select(col(Envelope.Key).as("key"), col("op"),
        col("as_of_offset"), col("after"))
      .orderBy("key")
  }

  /** Canal binlog CDC apply with position-watermark resume: the envelope
    * becomes a position-stamped change stream (file = offset div 300,
    * pos within file — bijective with offset, so binlog order IS commit
    * order), a fixed resume watermark (mysql-bin.000001, 600) drops the
    * already-acked prefix, and last-writer-wins per pk materializes the
    * table. The oracle replays the identical file/pos arithmetic,
    * watermark filter and DELETE handling in SQL. */
  private def qCanalApply(s: SparkSession, dir: String): DataFrame = {
    val e = env(s, dir)
    val changes = e.select(
      col(Envelope.Key).as("pk"),
      concat(lit("mysql-bin."),
        lpad((col(Envelope.Offset) / 300).cast("int").cast("string"), 6, "0"))
        .as("binlog_file"),
      ((col(Envelope.Offset) % 300) * 4 + 4).cast("bigint").as("binlog_pos"),
      when(col(Envelope.Value).isNull, lit("DELETE"))
        .otherwise(when(col(Envelope.Offset) % 3 === 0, lit("INSERT"))
          .otherwise(lit("UPDATE"))).as("change_type"),
      col(Envelope.Value).as("data"))
    graft.sources.Connectors.canalApply(changes,
        resumeFile = "mysql-bin.000001", resumePos = 600L)
      .orderBy("pk")
  }

  /** §2.10 Failover dispatch, oracle-checked: only the HIGHEST-priority
    * tier serves (lower level = higher priority), partitions spread over
    * the tier in lexicographic name order (ConsumerBuilder.java:551-569).
    * The oracle recomputes the tier + spread from the same (name,
    * priority) table in SQL; the standby must appear in NEITHER result. */
  private def qFailover(s: SparkSession, dir: String): DataFrame =
    Dispatch.failoverActiveConsumer(env(s, dir),
        Seq(("standby", 5), ("b", 0), ("a", 0)))
      .groupBy("consumer_id")
      .agg(count(lit(1)).cast("bigint").as("n"),
        countDistinct(Envelope.Partition).cast("bigint").as("n_partitions"),
        min(Envelope.Offset).as("min_offset"),
        max(Envelope.Offset).as("max_offset"))
      .orderBy("consumer_id")

  /** §2.10 AUTO_SPLIT fixed-hash-range assignment, oracle-checked: the
    * oracle's slot boundaries (16384/32768/49152) are hand-derived from
    * the reference algorithm — join order c1..c4 splits biggest-range-
    * in-half with the joiner taking the lower half, giving layout
    * c3, c2, c4, c1 — NOT an even split by index. The engine must
    * reproduce that exact ownership from its own simulation. */
  private def qKeySharedAutoSplit(s: SparkSession, dir: String): DataFrame =
    Dispatch.keySharedAutoSplit(env(s, dir), Seq("c1", "c2", "c3", "c4"))
      .groupBy("consumer_id")
      .agg(count(lit(1)).cast("bigint").as("n"),
        countDistinct(Envelope.Key).cast("bigint").as("n_keys"),
        min("slot").cast("bigint").as("min_slot"),
        max("slot").cast("bigint").as("max_slot"))
      .orderBy("consumer_id")

  /** §2.2 producer batch assembly (batchingMaxMessages=100): per
    * partition, offset-ordered rows pack into batches; output is
    * per-batch stats + the top batch_index, which must always be
    * n−1 — the coordinates the batch-index ack machinery addresses. */
  private def qProducerBatches(s: SparkSession, dir: String): DataFrame =
    Produce.assignBatches(env(s, dir), maxMessages = 100)
      .groupBy(col(Envelope.Partition), col("batch_seq"))
      .agg(count(lit(1)).cast("bigint").as("n"),
        min(Envelope.Offset).as("min_offset"),
        max(Envelope.Offset).as("max_offset"),
        max(Envelope.BatchIndex).cast("int").as("top_batch_index"))
      .orderBy(Envelope.Partition, "batch_seq")

  /** §2.10 Key_Shared hash parity, oracle-checked: the DuckDB side
    * reimplements murmur3_32 in pure SQL (overflow-safe 32-bit arithmetic
    * macros), so the slot of every key — and thus the whole ring
    * assignment — hash-matches the engine's Catalyst pulsar_hash. */
  private def qKeySharedOracle(s: SparkSession, dir: String): DataFrame =
    Dispatch.keySharedAssign(env(s, dir), 4)
      .groupBy("consumer_id")
      .agg(count(lit(1)).cast("bigint").as("n"),
        countDistinct(Envelope.Key).cast("bigint").as("n_keys"),
        min("slot").cast("bigint").as("min_slot"),
        max("slot").cast("bigint").as("max_slot"))
      .orderBy("consumer_id")

  /** §2.10 hash parity across EVERY supported key width: each distinct
    * (key, event_type) pair spawns prefixes of length 1–15 of a padded
    * compound key, hashing all seven murmur3 length regimes (tail-only,
    * 1/2/3 body rounds, each ± tail) through the Catalyst kernel; the
    * oracle recomputes them with the staged mm3_8 macros. This is what
    * future-proofs every key-routed oracle past 7-byte keys (sf>1 key
    * widths). */
  private def qHashWide(s: SparkSession, dir: String): DataFrame = {
    val base = concat(col("key"), lit("#"), col("event_type"),
      lit("~abcdefghijklmnop"))
    env(s, dir).select(col(Envelope.Key).as("key"), col("event_type")).distinct()
      .select(col("key"), col("event_type"),
        explode(sequence(lit(1), lit(15))).as("n"))
      .select(col("key"), col("event_type"), col("n").cast("bigint").as("n"),
        base.substr(lit(1), col("n")).as("wk"))
      .withColumn("h", Murmur3Pulsar.pulsar_hash(col("wk")).cast("bigint"))
      .orderBy("key", "event_type", "n")
  }

  // =====================================================================
  // LLM-pipeline extension operators (BASELINE.json north star)
  // =====================================================================

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

  /** DSIR importance resampling: pick the 100 raw documents that look
    * most like the English-language target slice under hashed-ngram
    * importance weights, sampled via Gumbel top-k. The oracle replays
    * the bucket models, decimal weight sums, the Gumbel draws and the
    * final ranking in pure SQL. */
  private def qDsirSample(s: SparkSession, dir: String): DataFrame =
    ext.Sampling.dsirResample(tbl(s, dir, "documents"), col("lang") === "en", 100)
      .orderBy(col("rank"))

  /** Corpus-DF boilerplate removal: tokens present in > 60% of documents
    * are corpus chrome; each document is reassembled without them. The
    * md5 of every cleaned document is oracle-compared. The 60% cap is
    * computed inside the plan (broadcast scalar) — no count() pre-pass. */
  private def qBoilerplate(s: SparkSession, dir: String): DataFrame =
    TextOps.removeBoilerplateLinesByRatio(tbl(s, dir, "documents"),
        num = 6, den = 10, sep = " ")
      .select(col("doc_id"), md5(col("text")).as("clean_hash"))
      .orderBy("doc_id")

  /** Repetition-ratio quality rule (top-bigram fraction per doc). */
  private def qRepetition(s: SparkSession, dir: String): DataFrame =
    TextOps.withRepetitionRatio(tbl(s, dir, "documents"))
      .select(col("doc_id"), col("top_bigram_ratio"))
      .orderBy("doc_id")

  /** Gopher A1.1 quality verdict, zero-shuffle per-row signals; the
    * oracle recomputes every fraction through unnest/group-by SQL — a
    * structurally different plan arriving at bit-identical doubles
    * (every signal is a ratio of exact integers). */
  private def qGopherQuality(s: SparkSession, dir: String): DataFrame =
    TextOps.withGopherSignals(tbl(s, dir, "documents"))
      .select(col("doc_id"), col("n_tokens"), col("mean_word_len"),
        col("alpha_word_frac"), col("symbol_ratio"), col("stop_hits"),
        col("dup_line_frac"), col("dup_line_char_frac"),
        col("top2gram_char_frac"), col("top3gram_char_frac"),
        col("top4gram_char_frac"), col("gopher_ok"))
      .orderBy("doc_id")

  /** Deterministic corpus mixing: per-language mixture weights applied as
    * an exact stratified sample (md5-rank within stratum, `ceil(w·n)`
    * kept). Fractions are binary-exact (k/2³) so the ceil boundary is
    * bit-identical cross-engine. The rank itself is in the output — the
    * oracle re-derives the full ordering, not just membership. */
  private def qSampleStratified(s: SparkSession, dir: String): DataFrame =
    ext.Sampling.stratifiedSample(
        tbl(s, dir, "documents").select("doc_id", "lang"), "lang",
        fractions = Map("en" -> 0.5, "de" -> 0.25, "es" -> 0.25,
          "fr" -> 0.125, "zh" -> 0.375),
        defaultFraction = 0.125, salt = "mix1|")
      .select(col("doc_id"), col("lang"), col("rk").cast("bigint").as("rk"))
      .orderBy("doc_id")

  /** Temperature-weighted corpus mix (mT5-style α=0.5), oracle-checked
    * bit-for-bit: quota_s = floor(2000 · sqrt(n_s) / Σ sqrt(n_k)) capped
    * at n_s — sqrt is IEEE-correctly-rounded (pow is not) and the weight
    * total accumulates in stratum order on both engines, so the floor
    * boundary is reproducible. */
  private def qTemperatureMix(s: SparkSession, dir: String): DataFrame =
    ext.Sampling.temperatureMix(
        tbl(s, dir, "documents").select("doc_id", "lang"), "lang",
        targetRows = 2000L, salt = "temp|")
      .select(col("doc_id"), col("lang"), col("rk").cast("bigint").as("rk"))
      .orderBy("doc_id")

  /** Deterministic hash-fraction sample (the 100 TB path: pure filter, no
    * shuffle): keep docs whose md5 draw sorts below fraction 0.25 of the
    * 32-bit space. Reproducible by any engine with md5. */
  private def qSampleHash(s: SparkSession, dir: String): DataFrame =
    ext.Sampling.hashFractionSample(
        tbl(s, dir, "documents").select("doc_id", "lang", "source"),
        fraction = 0.25, salt = "s|")
      .orderBy("doc_id")

  /** Token-budget shard packing per language: docs in id order packed
    * into ≈1000-token shards via the distributed prefix sum (range
    * buckets of 64 ids — the multi-bucket path is what sf data
    * exercises). Output: per-shard doc and token counts. */
  private def qShardPack(s: SparkSession, dir: String): DataFrame = {
    val d = tbl(s, dir, "documents")
      .select(col("doc_id"), col("lang"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
    ext.Sampling.packShards(d, "lang", "n_tokens", budget = 1000L,
        bucketWidth = 64L)
      .groupBy("lang", "shard_id")
      .agg(count(lit(1)).cast("bigint").as("n_docs"),
        sum("n_tokens").cast("bigint").as("shard_tokens"))
      .withColumn("shard_id", col("shard_id").cast("bigint"))
      .orderBy("lang", "shard_id")
  }

  /** GPT-style sequence packing: the whole corpus concatenated in id
    * order and cut into 64-token training sequences via the distributed
    * prefix sum (bucketWidth 64 exercises the multi-bucket path); a doc
    * crossing a boundary splits. Output: the per-(doc, sequence) span
    * map a training loader consumes. */
  private def qSeqPack(s: SparkSession, dir: String): DataFrame = {
    val d = tbl(s, dir, "documents")
      .select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
    ext.Sampling.packSequences(d, seqLen = 64L, "n_tokens",
        bucketWidth = 64L)
      .select(col("doc_id"), col("seq_id"), col("tok_start"),
        col("tok_end"), col("seq_off"))
      .orderBy("doc_id", "seq_id")
  }

  /** PII scrub with injected fixtures: deterministic email/IP/phone
    * strings are appended to every document, then redacted by the
    * regexp chain; the oracle replays the same injection AND the same
    * patterns through DuckDB regexp_replace — a hash match proves exact
    * cross-engine regex parity, and the per-kind booleans prove every
    * token class was actually hit. */
  private def qPiiRedact(s: SparkSession, dir: String): DataFrame = {
    val withPii = tbl(s, dir, "documents").select(col("doc_id"),
      concat(col("text"),
        lit(" contact admin"), col("doc_id").cast("string"),
        lit("@corp.example.com from 10.0."),
        (col("doc_id") % 256).cast("string"), lit(".7 call +1 555-"),
        lpad(col("doc_id").cast("string"), 4, "0")).as("text"))
    TextOps.withPiiRedacted(withPii)
      .select(col("doc_id"), md5(col("text_redacted")).as("red_hash"),
        (instr(col("text_redacted"), "<EMAIL>") > 0).as("has_email"),
        (instr(col("text_redacted"), "<IP>") > 0).as("has_ip"),
        (instr(col("text_redacted"), "<PHONE>") > 0).as("has_phone"))
      .orderBy("doc_id")
  }

  /** Eval-set decontamination: docs sharing any distinct 5-gram with the
    * held-out eval slice (doc_id % 50 == 0) are reported with shared-
    * shingle and eval-doc counts. Inverted hash join, eval side
    * broadcast — the corpus never shuffles. */
  private def qDecontam(s: SparkSession, dir: String): DataFrame = {
    val docs = tbl(s, dir, "documents")
    val evals = docs.filter(col("doc_id") % 50 === 0)
    val corpus = docs.filter(col("doc_id") % 50 =!= 0)
    TextOps.contaminationReport(corpus, evals, n = 5, minShared = 1L)
      .select(col("doc_id"), col("n_shared").cast("bigint").as("n_shared"),
        col("n_eval_docs").cast("bigint").as("n_eval_docs"))
      .orderBy("doc_id")
  }

  /** C4-style global span dedup: every 5-word span kept only at its
    * first corpus occurrence (smallest doc_id, span_idx), documents
    * reassembled from survivors. clean_text ships as md5 so the result
    * stays narrow; the oracle rebuilds the identical string in SQL. */
  private def qLineDedup(s: SparkSession, dir: String): DataFrame =
    TextOps.dedupSpans(tbl(s, dir, "documents"), spanWords = 5)
      .select(col("doc_id"), col("n_kept"), col("n_dropped"),
        md5(col("clean_text")).as("clean_hash"))
      .orderBy("doc_id")

  /** Lee-style overlapping-window exact-substring dedup at k=10: every
    * token covered by a repeated 10-token window (at any alignment)
    * drops; first occurrence survives. clean_text ships as md5. */
  private def qSubstringDedup(s: SparkSession, dir: String): DataFrame =
    TextOps.dedupSubstrings(tbl(s, dir, "documents"), k = 10)
      .select(col("doc_id"), col("n_kept"), col("n_dropped"),
        md5(col("clean_text")).as("clean_hash"))
      .orderBy("doc_id")

  /** Int8 scalar quantization over the embeddings table: the oracle
    * replays scale/code arithmetic per element and the query carries
    * the reconstruction-bound certificate (max per-dim error ≤ scale/2,
    * true by construction for a correct quantizer). */
  private def qVecQuantize(s: SparkSession, dir: String): DataFrame = {
    val q = ext.VectorOps.withQuantizedI8(tbl(s, dir, "embeddings"))
    q.select(col("vec_id"),
        size(col("q.codes")).cast("bigint").as("n_dims"),
        aggregate(col("q.codes"), lit(0L), (a, c) => a + c).as("code_sum"),
        (aggregate(zip_with(col("embedding"), col("q.codes"),
            (x, c) => abs(x.cast("double") - c.cast("double") * col("q.scale"))),
          lit(0.0), (a, e) => greatest(a, e)) <=
          col("q.scale") * 0.5000001).as("err_ok"))
      .orderBy("vec_id")
  }

  /** Pretraining chunking: 32-token windows, 8-token overlap. The
    * oracle replays the stride arithmetic and rebuilds each chunk
    * string; chunk_text ships as md5 to stay narrow. */
  private def qDocChunks(s: SparkSession, dir: String): DataFrame =
    TextOps.chunkDocuments(tbl(s, dir, "documents"), chunkTokens = 32,
        overlapTokens = 8)
      .select(col("doc_id"), col("chunk_idx").cast("bigint").as("chunk_idx"),
        col("n_chunk_tokens"), md5(col("chunk_text")).as("chunk_hash"))
      .orderBy("doc_id", "chunk_idx")

  /** Bloom-prefiltered decontamination: MUST equal [[qDecontam]] row for
    * row (the bloom only prunes; the exact join restores soundness), so
    * it shares decontam's oracle — a false negative anywhere in the
    * bloom path breaks the hash match. */
  private def qDecontamBloom(s: SparkSession, dir: String): DataFrame = {
    val docs = tbl(s, dir, "documents")
    val evals = docs.filter(col("doc_id") % 50 === 0)
    val corpus = docs.filter(col("doc_id") % 50 =!= 0)
    TextOps.contaminationReportBloom(corpus, evals, n = 5, minShared = 1L)
      .select(col("doc_id"), col("n_shared").cast("bigint").as("n_shared"),
        col("n_eval_docs").cast("bigint").as("n_eval_docs"))
      .orderBy("doc_id")
  }

  /**
   * Composite training-data pipeline, end-to-end oracle-checked:
   * quality filter → exact dedup (md5) → near-dup removal (5-gram
   * Jaccard ≥ 0.8, keep the smaller doc_id of each pair) → corpus stats
   * per language. Every stage is SQL-expressible so the whole pipeline
   * hash-matches DuckDB.
   */
  private def qPipeline(s: SparkSession, dir: String): DataFrame = {
    val docs = tbl(s, dir, "documents")
    val quality = TextOps.withQualityScore(docs)
      .filter(col("n_tokens") >= 10 && col("mean_word_len").between(2.0, 12.0))
      .select("doc_id", "text", "lang")
    val exactDeduped = TextOps.exactDedup(quality)
    val nearDupIds = TextOps.jaccardPairs(exactDeduped, n = 5, threshold = 0.8,
        maxDf = 250)
      .select(col("id_b").as("doc_id")).distinct()
    val clean = exactDeduped.join(nearDupIds, Seq("doc_id"), "left_anti")
    clean.groupBy("lang")
      .agg(count(lit(1)).cast("bigint").as("n_docs"),
        sum(size(TextOps.tokens(col("text"))).cast("bigint")).cast("bigint")
          .as("total_tokens"))
      .orderBy("lang")
  }

  /**
   * §2.12 transaction VISIBILITY on the oracle surface (reference
   * TransactionIsolationLevel semantics, Consumer READ_COMMITTED
   * default): one topic receives three transactions' slices of the
   * envelope — txn A (sequence_id % 3 == 0) COMMITS, txn B (% 3 == 1)
   * ABORTS, and a third slice (% 3 == 2) is left STAGED with no marker
   * (an in-flight transaction mid-commit). READ_COMMITTED must see
   * exactly A's rows with dense offsets — an aborted or in-flight row
   * leaking into the committed view shifts every aggregate and breaks
   * the hash.
   */
  private def txnVisFixture(s: SparkSession, dir: String): graft.log.TopicLog = {
    val name = graft.model.TopicName.parse("persistent://public/default/txn-vis")
    val root = Fixtures.dir(s, dir, "q-txn-vis") { r =>
      val log = new graft.log.TopicLog(s, r, name, 4)
      val e = env(s, dir).drop(Envelope.Topic, Envelope.Partition)
      graft.log.Txn.begin(r)
        .produce(log, e.filter(col(Envelope.SequenceId) % 3 === 0)).commit()
      graft.log.Txn.begin(r)
        .produce(log, e.filter(col(Envelope.SequenceId) % 3 === 1)).abort()
      // in-flight: staged epoch, no marker, no manifest — the on-disk
      // state of an open transaction between stageAppend and commit
      log.stageAppend(e.filter(col(Envelope.SequenceId) % 3 === 2)): Unit
    }
    new graft.log.TopicLog(s, root, name, 4)
  }

  private def txnVisAgg(df: DataFrame): DataFrame =
    df.groupBy(Envelope.Partition)
      .agg(count(lit(1)).cast("bigint").as("n"),
        max(Envelope.Offset).as("max_offset"),
        countDistinct(Envelope.Key).cast("bigint").as("n_keys"))
      .orderBy(Envelope.Partition)

  private def qTxnVisibility(s: SparkSession, dir: String): DataFrame =
    txnVisAgg(txnVisFixture(s, dir)
      .read(graft.log.TopicLog.IsolationLevel.ReadCommitted))

  /** §2.12 READ_UNCOMMITTED dirty read over the SAME fixture: committed
    * (txn A) plus in-flight staged (the % 3 == 2 slice, offsets dense
    * above A's high-water). The aborted slice stays invisible at BOTH
    * isolation levels — a DOCUMENTED divergence from the reference
    * (whose READ_UNCOMMITTED delivers aborted data still sitting in the
    * ledger): here abort discards before persistence, so dirty reads of
    * aborted txns are structurally impossible (TopicLog.read scaladoc,
    * SURVEY §2.12). */
  private def qTxnUncommitted(s: SparkSession, dir: String): DataFrame =
    txnVisAgg(txnVisFixture(s, dir)
      .read(graft.log.TopicLog.IsolationLevel.ReadUncommitted))

  /** §2.1 Reader — the non-durable positioned scan (reference
    * Reader.java:49 / ConsumerImpl in reader mode): every partition read
    * from offset 100 to its head, no cursor created. The oracle replays
    * the dense-offset arithmetic (count − 100 rows, first = 100,
    * max = count − 1) over the murmur3-routed envelope. */
  private def qReaderScan(s: SparkSession, dir: String): DataFrame = {
    val tl = qLogFixture(s, dir)
    (0 until 4).map(p => tl.readFrom(p, 100L))
      .reduce(_.unionByName(_))
      .groupBy(Envelope.Partition)
      .agg(count(lit(1)).cast("bigint").as("n"),
        min(Envelope.Offset).as("first_offset"),
        max(Envelope.Offset).as("max_offset"))
      .orderBy(Envelope.Partition)
  }

  /** §2.2 producer interceptor chain (reference ProducerInterceptor
    * .onSend, applied in registration order): two value-rewriting
    * interceptors compose — order matters ("ic1:" prefix THEN ":ic2"
    * suffix), and the oracle rebuilds the wrapped payload per row, so a
    * dropped, re-ordered, or double-applied interceptor breaks the
    * length accounting. */
  private def qInterceptors(s: SparkSession, dir: String): DataFrame = {
    val e = env(s, dir).filter(col(Envelope.Value).isNotNull)
    operators.Produce.withInterceptors(e, Seq(
        df => df.withColumn(Envelope.Value,
          concat(lit("ic1:"), col(Envelope.Value))),
        df => df.withColumn(Envelope.Value,
          concat(col(Envelope.Value), lit(":ic2")))))
      .groupBy("event_type")
      .agg(count(lit(1)).cast("bigint").as("n"),
        sum(length(col(Envelope.Value))).cast("bigint").as("sum_len"))
      .orderBy("event_type")
  }

  /** §2.2 Function fan-out (reference Context.newOutputMessage:156):
    * each record emits to its per-type output topic, and high-metric
    * records ALSO emit to an audit topic — N sinks from one pass. The
    * oracle rebuilds both outputs' per-topic counts. */
  private def qFunctionFanout(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ds = env(s, dir)
      .select(col("event_type"), col(Envelope.Key), col("metric_value"))
      .as[(String, String, Double)]
    graft.streaming.Functions.fanOut(ds) { case (t, k, m) =>
      (s"fn-out-$t", k) +: (if (m > 250.0) Seq(("fn-audit", k)) else Nil)
    }.groupBy("out_topic")
      .agg(count(lit(1)).cast("bigint").as("n"),
        countDistinct("payload").cast("bigint").as("n_keys"))
      .orderBy("out_topic")
  }

  /** §2.2 Function 1→0/1 process() with the null-drop contract
    * (JavaInstanceRunnable.java:430 skips send on null result): error
    * events return None and are filtered; survivors double their metric.
    * Decimal-exact sums keep the aggregate engine-order independent. */
  private def qFunctionMap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ds = env(s, dir)
      .select(col("event_type"), col(Envelope.Key), col("metric_value"))
      .as[(String, String, Double)]
    graft.streaming.Functions.mapFunction(ds) { case (t, k, m) =>
      if (t == "error") None else Some((k.toLong % 10, m * 2))
    }.toDF("bucket", "doubled")
      .groupBy("bucket")
      .agg(count(lit(1)).cast("bigint").as("n"),
        sum(col("doubled").cast("decimal(18,9)")).cast("double").as("sum_doubled"))
      .orderBy("bucket")
  }

  /** §2.7 processing guarantees on the oracle surface: the WHOLE
    * [[graft.streaming.Functions.run]] pipeline — readStream source →
    * user transform (null-drop) → EFFECTIVELY_ONCE output boundary
    * (watermarked (producer, sequence_id) dedup) → parquet sink — runs
    * to convergence and the sink is read back. The envelope fixture
    * carries REAL (producer, seq) duplicates (every event_id % 10 == 0
    * shares its predecessor's sequence_id when both route to the same
    * producer), so `n_rows` equals `n_seq` ONLY if the dedup boundary
    * actually suppressed them; the aggregate uses countDistinct so the
    * arbitrary survivor choice inside a duplicate pair cannot affect
    * the hash. Fresh sink/checkpoint dirs per invocation (the run is
    * the semantics under test; dirs GC'd by the shutdown hook). */
  private def qFunctionPipelineStream(s: SparkSession, dir: String): DataFrame = {
    val out = java.nio.file.Files.createTempDirectory("graft-fnrun-out")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-fnrun-ckpt")
    streamOutRoots.add(out); streamOutRoots.add(ckpt)
    val q = graft.streaming.Functions.run(
      Envelope.fromEventsStream(s, dir),
      df => df.filter(col(Envelope.Value).isNotNull),
      out.toString, ckpt.toString,
      graft.streaming.Functions.Guarantee.EffectivelyOnce,
      // generous event-time window: the fixture's duplicate pairs are
      // adjacent event ids (≤ ~1 h apart), so any ORDERED-ARRIVAL
      // trigger slicing keeps both halves of a pair inside the dedup
      // state. ORDERED-ARRIVAL PRECONDITION (the r11 probe's boundary):
      // the fixture streams as a SINGLE file today (one batch, trivially
      // ordered); a future multi-part events fixture that arrives
      // time-unordered across triggers is OUTSIDE the contract — the
      // run() guard then fails this query loudly (never a silent
      // hash mismatch), and the catch-up form lives in
      // function_pipeline_replay via orderedReplaySource.
      dedupLag = "48 hours")
    drainGuarded(s, q)
    s.read.parquet(out.toString)
      .groupBy(col(Envelope.ProducerName))
      .agg(countDistinct(Envelope.SequenceId).cast("bigint").as("n_seq"),
        count(lit(1)).cast("bigint").as("n_rows"))
      .orderBy(Envelope.ProducerName)
  }

  /** §2.7 EFFECTIVELY_ONCE over a CATCH-UP REPLAY — the r11 probe's
    * failure shape, now run INSIDE the contract: the whole envelope is
    * handed to [[graft.streaming.Functions.orderedReplaySource]] as one
    * unordered batch, which rewrites it as 6 time-range bucket files
    * (mtime-pinned, so the file source replays them in event-time
    * order), and the pipeline streams them one file per trigger — a
    * REAL multi-batch replay, the slicing that silently dropped 78% of
    * an unordered 100× glob. Completeness is enforced twice: the run()
    * guard throws on ANY watermark drop, and the oracle is the same
    * one-row-per-(producer, seq) truth as function_pipeline_stream —
    * dup pairs straddling bucket boundaries (≤1 h apart vs ~5-day
    * buckets) must still dedup across triggers. */
  private def qFunctionPipelineReplay(s: SparkSession, dir: String): DataFrame = {
    val root = Fixtures.dir(s, dir, "q-fnreplay") { r =>
      graft.streaming.Functions.orderedReplaySource(
        Envelope.fromEvents(s, dir), Envelope.PublishTime, r, buckets = 6): Unit
    }
    // 2 bucket files per trigger → a REAL 3-batch replay (the contract
    // holds under ANY slicing — files inside a trigger interleave
    // freely, the watermark advances between triggers) without paying
    // 6 trigger setups; dup pairs straddling the 1|2 and 3|4 bucket
    // boundaries still dedup ACROSS triggers
    val src = s.readStream.schema(Envelope.fromEvents(s, dir).schema)
      .option("maxFilesPerTrigger", 2)
      .option("pathGlobFilter", "*.parquet").parquet(root)
    val out = java.nio.file.Files.createTempDirectory("graft-fnreplay-out")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-fnreplay-ckpt")
    streamOutRoots.add(out); streamOutRoots.add(ckpt)
    val q = graft.streaming.Functions.run(
      src,
      df => df.filter(col(Envelope.Value).isNotNull),
      out.toString, ckpt.toString,
      graft.streaming.Functions.Guarantee.EffectivelyOnce,
      dedupLag = "48 hours")
    drainGuarded(s, q)
    s.read.parquet(out.toString)
      .groupBy(col(Envelope.ProducerName))
      .agg(countDistinct(Envelope.SequenceId).cast("bigint").as("n_seq"),
        count(lit(1)).cast("bigint").as("n_rows"))
      .orderBy(Envelope.ProducerName)
  }

  /** §2.7 AT_MOST_ONCE on the oracle surface, BOTH crash windows of the
    * ack-before-process protocol (the reference acks on receipt,
    * JavaInstanceRunnable.java:328, with the same loss window):
    *  - crash AFTER ack, BEFORE sink: epoch 0's ack marker is
    *    pre-written (a previous attempt died mid-process), so the
    *    restart must DROP that batch — its rows are lost, never
    *    reprocessed;
    *  - crash AFTER sink, BEFORE checkpoint commit: the last batch's
    *    commit record is deleted and the stream restarted — Spark
    *    replays the epoch, the existing marker suppresses the second
    *    write, and the sink holds NO duplicate (vs AT_LEAST_ONCE,
    *    which would re-append — the spec suite pins that contrast).
    * The fixture splits the envelope into 3 slices by offset % 3
    * (mtime-ordered, one per trigger), so "epoch 0's rows" is the
    * SQL-expressible set offset % 3 = 0 and the oracle replays the
    * surviving slice exactly; n_rows > n_seq for producers whose seq
    * duplicates survive — AMO must NOT dedup, only not-redeliver. */
  private def qFunctionPipelineAmo(s: SparkSession, dir: String): DataFrame = {
    val root = Fixtures.dir(s, dir, "q-fnamo") { r =>
      val e = env(s, dir)
      val base = System.currentTimeMillis() - 10000L
      (0 until 3).foreach { i =>
        writeStreamSlice(e.filter(col(Envelope.Offset) % 3 === i), r,
          f"slice_$i%02d.parquet", base + i * 2000L)
      }
    }
    val out = java.nio.file.Files.createTempDirectory("graft-fnamo-out")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-fnamo-ckpt")
    streamOutRoots.add(out); streamOutRoots.add(ckpt)
    // crash window 1: epoch 0 was acked by an attempt that died before
    // its sink write — the marker exists, the data does not
    val acks = ckpt.resolve("_acks")
    java.nio.file.Files.createDirectories(acks)
    java.nio.file.Files.write(acks.resolve("0.acked"), Array.emptyByteArray)
    def run() = graft.streaming.Functions.run(
      s.readStream.schema(env(s, dir).schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "*.parquet").parquet(root),
      df => df.filter(col(Envelope.Value).isNotNull),
      out.toString, ckpt.toString,
      graft.streaming.Functions.Guarantee.AtMostOnce)
    drainGuarded(s, run())
    // crash window 2: the LAST batch's checkpoint commit never landed —
    // delete it (plus the local FS's hidden checksum twin: a real crash
    // loses both) and restart; the replayed epoch's marker must
    // suppress a duplicate append
    java.nio.file.Files.deleteIfExists(ckpt.resolve("commits").resolve("2"))
    java.nio.file.Files.deleteIfExists(ckpt.resolve("commits").resolve(".2.crc"))
    // plain drain, not drainGuarded: the restart's only work is the
    // REPLAYED epoch, which reports numInputRows = 0 (recovered batches
    // re-read files outside the progress row counter) — the zero-input
    // fixture guard already did its job on run 1
    val q2 = run()
    try q2.processAllAvailable() finally q2.stop()
    s.read.parquet(out.toString)
      .groupBy(col(Envelope.ProducerName))
      .agg(countDistinct(Envelope.SequenceId).cast("bigint").as("n_seq"),
        count(lit(1)).cast("bigint").as("n_rows"))
      .orderBy(Envelope.ProducerName)
  }

  /** Hybrid BM25 + dense-cosine retrieval fused by reciprocal rank
    * (the RAG/training-data retrieval shape) — both legs' ranks and the
    * fused ordering replay exactly in SQL. */
  private def qHybridRrf(s: SparkSession, dir: String): DataFrame =
    ext.Hybrid.rrf(tbl(s, dir, "documents"), tbl(s, dir, "embeddings"),
      "fast hash join order", queryVecId = 0L)

  /** Batch hybrid retrieval: three queries fused in ONE corpus pass
    * (corpus tokenized once, per-query ranks via windows) — the shape a
    * real query workload takes at corpus scale. */
  private val hybridQueries = Seq(
    (0L, "fast hash join order"), (1L, "stream window agg batch"),
    (2L, "vector scan filter merge"))

  private def qHybridRrfBatch(s: SparkSession, dir: String): DataFrame =
    ext.Hybrid.rrfBatch(tbl(s, dir, "documents"), tbl(s, dir, "embeddings"),
      hybridQueries)

  /** The same fused workload with the IVF dense leg in exact mode
    * (nprobe = nlist): result provably equals the brute-force leg's, so
    * it shares hybrid_rrf_batch's oracle — the whole
    * quantize→probe→verify machinery runs inside the fusion, and the
    * 100 TB configuration (nprobe < nlist over the disk index) drops in
    * without touching the fusion code. */
  private def qHybridRrfIvf(s: SparkSession, dir: String): DataFrame =
    ext.Hybrid.rrfBatch(tbl(s, dir, "documents"), tbl(s, dir, "embeddings"),
      hybridQueries,
      vectorLeg = (c, q, k) => ext.VectorOps.annIvf(c, q, k,
        nlist = 8, nprobe = 8, iters = 1, initMode = "random"))

  /** The 100 TB hybrid configuration CERTIFIED, not argued: the dense
    * leg runs PRUNED (nprobe = 2 of nlist = 8 over the DISK index, so
    * the probe scan reads 1/4 of the cell partitions) inside the same
    * fusion, and the fused top-10 set is compared against the exact
    * fused output in-query — the pq_recall pattern. The fixture
    * embeddings are uniform-random (no cluster structure, IVF's hostile
    * case: cell membership is ~arbitrary, so nprobe 2/8 carries ~25% of
    * dense candidates) yet fused recall stays well above the dense
    * leg's own, because the lexical leg is exact and RRF demotes rather
    * than removes a document the pruned leg misses: measured 0.63–0.70
    * across sf0.001–0.1. The certificate asserts ≥ 0.4 — a ≥7-document
    * margin below measurement, far above the ~kOut/N chance floor. */
  private def qHybridRrfPruned(s: SparkSession, dir: String): DataFrame = {
    val docs = tbl(s, dir, "documents")
    val vecs = tbl(s, dir, "embeddings")
    val idx = Fixtures.dir(s, dir, "q-hybivfidx") { r =>
      ext.VectorOps.buildIvfIndex(vecs, r, nlist = 8, iters = 1,
        initMode = "random")
    }
    val pruned = ext.Hybrid.rrfBatch(docs, vecs, hybridQueries,
        vectorLeg = (_, q, k) => ext.VectorOps.annIvfIndexed(q, idx, k,
          nprobe = 2))
      .select(col("query_id"), col("doc_id"), lit(1).as("hit"))
    ext.Hybrid.rrfBatch(docs, vecs, hybridQueries)
      .select("query_id", "doc_id")
      .join(pruned, Seq("query_id", "doc_id"), "left")
      .agg(count(lit(1)).cast("bigint").as("n_exact"),
        sum(coalesce(col("hit"), lit(0))).as("n_hit"))
      .select(col("n_exact"),
        (col("n_hit").cast("double") / col("n_exact") >= 0.4).as("recall_ok"))
  }

  /** §2.7 arbitrary keyed state (ByteBufferStateStore put/get/delete via
    * [[graft.streaming.Functions.statefulFunction]]): per user, a
    * running-max state emits one record per "record-breaking" metric in
    * offset order — the oracle replays the running max with a window
    * function, so dropped state, a wrong initial state, or unordered
    * group iteration all shift the break counts. */
  private def qStatefulMax(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ds = env(s, dir)
      .select(col(Envelope.Key), col(Envelope.Offset), col("metric_value"))
      .as[(String, Long, Double)]
    graft.streaming.Functions.statefulFunction(ds)(_._1) {
      (k: String, vs: Iterator[(String, Long, Double)], st: Option[Double]) =>
        // batch groups iterate in storage order — sort by offset so the
        // running max is the stream-arrival semantics
        val sorted = vs.toSeq.sortBy(_._2)
        var mx = st.getOrElse(Double.NegativeInfinity)
        val out = sorted.flatMap { case (_, off, m) =>
          if (m > mx) { mx = m; Some((k, off)) } else None
        }
        (out.iterator, Some(mx))
    }.toDF("key", "break_offset")
      .groupBy("key")
      .agg(count(lit(1)).cast("bigint").as("n_breaks"),
        max("break_offset").as("last_break_offset"))
      .orderBy("key")
  }

  // =====================================================================

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // relational
    "q1_pricing" -> (q1Pricing _),
    "q3_top_orders" -> (q3TopOrders _),
    "q5_region_revenue" -> (q5Region _),
    "q_semi_join" -> (qSemiJoin _),
    "q_anti_join" -> (qAntiJoin _),
    "q_window_rank" -> (qWindowRank _),
    "q_rollup" -> (qRollup _),
    "q_distinct" -> (qDistinct _),
    "q_top_customers" -> (qTopCustomers _),
    "q6_forecast" -> (q6Forecast _),
    "q7_volume" -> (q7Volume _),
    "q_left_outer" -> (qLeftOuter _),
    "q_cube" -> (qCube _),
    // pulsar parity
    "compaction_publish" -> (qCompactionPublish _),
    "compaction_eventtime" -> (qCompactionEventTime _),
    "tableview" -> (qTableView _),
    "tableview_stream" -> (qTableViewStream _),
    "quality_filter_stream" -> (qQualityFilterStream _),
    "dedup_seq" -> (qDedupSeq _),
    "dedup_stats" -> (qDedupStats _),
    "delayed_due" -> (qDelayedDue _),
    "delayed_due_stream" -> (qDelayedDueStream _),
    "ttl_expiry" -> (qTtl _),
    "seek_by_time" -> (qSeekByTime _),
    "last_message_ids" -> (qLastIds _),
    "peek_messages" -> (qPeek _),
    "examine_message" -> (qExamine _),
    "dlq_route" -> (qDlqRoute _),
    "dlq_route_stream" -> (qDlqRouteStream _),
    "redelivery" -> (qRedelivery _),
    "redelivery_stream" -> (qRedeliveryStream _),
    "schema_evolution" -> (qSchemaEvolution _),
    "repl_cursor" -> (qReplCursor _),
    "replication_filter" -> (qReplication _),
    "replication_filter_stream" -> (qReplicationStream _),
    "window_tumbling" -> (qWindowTumbling _),
    "window_tumbling_stream" -> (qWindowTumblingStream _),
    "window_sliding" -> (qWindowSliding _),
    "window_count" -> (qWindowCount _),
    "window_count_sliding" -> (qWindowCountSliding _),
    "session_windows" -> (qSessionWindows _),
    "session_windows_stream" -> (qSessionWindowsStream _),
    "session_windows_watermark" -> (qSessionWindowsWatermark _),
    "q_median" -> (qMedian _),
    "hll_cardinality" -> (qHllCardinality _),
    "heavy_hitters" -> (qHeavyHitters _),
    "spacesaving_topk" -> (qSpaceSavingTopk _),
    "avro_roundtrip" -> (qAvroRoundtrip _),
    "proto_roundtrip" -> (qProtoRoundtrip _),
    "quantile_sketch" -> (qQuantileSketch _),
    "counters" -> (qCounters _),
    "multi_topic_union" -> (qMultiTopicUnion _),
    "pattern_subscribe" -> (qPatternSubscribe _),
    "keyshared_assign" -> (qKeyShared _),
    "keyshared_rebalance" -> (qKeySharedRebalance _),
    "keyshared_drain" -> (qKeySharedDrain _),
    "offload_read" -> (qOffloadRead _),
    "retention_trim" -> (qRetentionTrim _),
    "compaction_strategic" -> (qCompactionStrategic _),
    "read_compacted" -> (qReadCompacted _),
    "partition_update" -> (qPartitionUpdate _),
    "keyshared_sticky" -> (qKeySharedSticky _),
    "keyshared_hash_oracle" -> (qKeySharedOracle _),
    "hash_wide" -> (qHashWide _),
    "shared_priority" -> (qSharedPriority _),
    "failover_assign" -> (qFailover _),
    "cdc_apply" -> (qCdcApply _),
    "canal_apply" -> (qCanalApply _),
    "frame_sample" -> (qFrameSample _),
    "producer_batches" -> (qProducerBatches _),
    "keyshared_autosplit" -> (qKeySharedAutoSplit _),
    "chunk_reassembly" -> (qChunkReassembly _),
    "chunk_reassembly_stream" -> (qChunkReassemblyStream _),
    "crypto_roundtrip" -> (qCryptoRoundtrip _),
    "backlog_quota" -> (qBacklogQuota _),
    "admin_skip" -> (qAdminSkip _),
    "topic_stats" -> (qTopicStats _),
    "topic_rates" -> (qTopicRates _),
    "topic_stats_partitioned" -> (qTopicStatsPartitioned _),
    "topic_stats_stream" -> (qTopicStatsStream _),
    "q_count_distinct" -> (qCountDistinct _),
    "topic_log_roundtrip" -> (qTopicLogRoundtrip _),
    "manifest_prune" -> (qManifestPrune _),
    "txn_ack" -> (qTxnAck _),
    "txn_visibility" -> (qTxnVisibility _),
    "txn_uncommitted" -> (qTxnUncommitted _),
    "reader_scan" -> (qReaderScan _),
    "interceptor_chain" -> (qInterceptors _),
    "function_fanout" -> (qFunctionFanout _),
    "function_map" -> (qFunctionMap _),
    "stateful_max" -> (qStatefulMax _),
    "function_pipeline_stream" -> (qFunctionPipelineStream _),
    "function_pipeline_replay" -> (qFunctionPipelineReplay _),
    "function_pipeline_amo" -> (qFunctionPipelineAmo _),
    "chunk_dedup" -> (qChunkDedup _),
    "dispatch_rate_stream" -> (qDispatchRateStream _),
    "dispatch_rate_debt_stream" -> (qDispatchRateDebtStream _),
    "ack_compaction" -> (qAckCompaction _),
    "shadow_read" -> (qShadowRead _),
    "coalesce_roundtrip" -> (qCoalesceRoundtrip _),
    "file_sink_roundtrip" -> (qFileSinkRoundtrip _),
    // data-generator connector: md5-deterministic Person stream; the
    // oracle SQL is generated from the same vocab constants
    "datagen_persons" -> ((s: SparkSession, _: String) =>
      graft.sources.DataGeneratorSource.persons(s, 1000, "dg").orderBy("person_id")),
    "multimodal_pipeline" -> (qMultimodal _),
    // llm-pipeline extensions
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
    "pipeline_clean_corpus" -> (qPipeline _),
    "boilerplate_removal" -> (qBoilerplate _),
    "repetition_ratio" -> (qRepetition _),
    "gopher_quality" -> (qGopherQuality _),
    "sample_stratified" -> (qSampleStratified _),
    "sample_temperature" -> (qTemperatureMix _),
    "sample_hash" -> (qSampleHash _),
    "dsir_sample" -> (qDsirSample _),
    "ccnet_buckets" -> (qCcnetBuckets _),
    "char_entropy" -> (qCharEntropy _),
    "shard_pack" -> (qShardPack _),
    "seq_pack" -> (qSeqPack _),
    "seq_pack_stream" -> (qSeqPackStream _),
    "token_mixture" -> (qTokenMixture _),
    "mixture_pack" -> (qMixturePack _),
    "token_mixture_stream" -> (qTokenMixtureStream _),
    "assemble_stream" -> (qAssembleStream _),
    "pii_redact" -> (qPiiRedact _),
    "decontam" -> (qDecontam _),
    "decontam_bloom" -> (qDecontamBloom _),
    "line_dedup" -> (qLineDedup _),
    "substring_dedup" -> (qSubstringDedup _),
    "doc_chunks" -> (qDocChunks _),
    "vec_quantize" -> (qVecQuantize _),
    "hybrid_rrf" -> (qHybridRrf _),
    "hybrid_rrf_batch" -> (qHybridRrfBatch _),
    "hybrid_rrf_ivf" -> (qHybridRrfIvf _),
    "hybrid_rrf_pruned" -> (qHybridRrfPruned _)
  )

  /** Shared oracle for hybrid_rrf_batch AND hybrid_rrf_ivf (exact-mode
    * IVF provably equals the brute-force dense leg). */
  private val hybridBatchSql: String =
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

  def oracleSql: Map[String, String] = Map(
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(COUNT(*) AS BIGINT) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_top_orders" ->
      """SELECT o_orderkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate, o_orderpriority
        |FROM customer JOIN orders ON o_custkey = c_custkey
        |  JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        |GROUP BY o_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "q5_region_revenue" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "q_semi_join" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        |FROM orders WHERE EXISTS (
        |  SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_anti_join" ->
      """SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers
        |FROM customer WHERE NOT EXISTS (
        |  SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q_window_rank" ->
      """SELECT o_custkey, rnk, o_orderkey, totalprice FROM (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rnk,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS totalprice
        |  FROM orders) t WHERE rnk <= 3 ORDER BY o_custkey, rnk""".stripMargin,
    "q_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q_distinct" ->
      """SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
    "q_top_customers" ->
      """SELECT c_custkey, c_name,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  CAST(COUNT(*) AS BIGINT) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name ORDER BY revenue DESC, c_custkey LIMIT 10""".stripMargin,
    "q6_forecast" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_discount BETWEEN 0.02 AND 0.09 AND l_quantity < 24""".stripMargin,
    "q7_volume" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l_shipdate) AS INT) AS l_year,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        |GROUP BY 1, 2, 3 ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "q_left_outer" ->
      """SELECT c_custkey, c_mktsegment,
        |  COALESCE(o.n_orders, 0) AS n_orders, o.total
        |FROM customer c LEFT JOIN (
        |  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |  FROM orders GROUP BY o_custkey) o ON c_custkey = o.o_custkey
        |ORDER BY c_custkey""".stripMargin,
    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "compaction_publish" -> envSql(
      """SELECT key, value, "offset" FROM (
        |  SELECT key, value, "offset",
        |    ROW_NUMBER() OVER (PARTITION BY key ORDER BY "offset" DESC) AS rn
        |  FROM envelope) t
        |WHERE rn = 1 AND value IS NOT NULL ORDER BY key""".stripMargin),
    "compaction_eventtime" -> envSql(
      """SELECT key, value, "offset" FROM (
        |  SELECT key, value, "offset",
        |    ROW_NUMBER() OVER (PARTITION BY key ORDER BY event_time DESC, "offset" DESC) AS rn
        |  FROM envelope) t
        |WHERE rn = 1 AND value IS NOT NULL ORDER BY key""".stripMargin),
    "tableview" -> envSql(
      """SELECT event_type, metric_value FROM (
        |  SELECT event_type, metric_value,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY "offset" DESC) AS rn
        |  FROM envelope) t
        |WHERE rn = 1 AND metric_value IS NOT NULL ORDER BY event_type""".stripMargin),
    // the STREAMING TableView must converge to the same end state as the
    // batch view — identical oracle
    "tableview_stream" -> envSql(
      """SELECT event_type, metric_value FROM (
        |  SELECT event_type, metric_value,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY "offset" DESC) AS rn
        |  FROM envelope) t
        |WHERE rn = 1 AND metric_value IS NOT NULL ORDER BY event_type""".stripMargin),
    "dedup_seq" -> envSql(
      """SELECT producer_name, sequence_id, "offset" FROM (
        |  SELECT producer_name, sequence_id, "offset",
        |    MAX(sequence_id) OVER (PARTITION BY producer_name ORDER BY "offset"
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
        |  FROM envelope) t
        |WHERE prev_max IS NULL OR sequence_id > prev_max
        |ORDER BY producer_name, "offset"""".stripMargin),
    "dedup_stats" -> envSql(
      """SELECT r.producer_name, r.received, k.kept,
        |  CAST(r.received - k.kept AS BIGINT) AS dropped
        |FROM (SELECT producer_name, CAST(COUNT(*) AS BIGINT) AS received
        |      FROM envelope GROUP BY producer_name) r
        |JOIN (SELECT producer_name, CAST(COUNT(*) AS BIGINT) AS kept FROM (
        |    SELECT producer_name,
        |      MAX(sequence_id) OVER (PARTITION BY producer_name ORDER BY "offset"
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max,
        |      sequence_id FROM envelope) t
        |  WHERE prev_max IS NULL OR sequence_id > prev_max
        |  GROUP BY producer_name) k USING (producer_name)
        |ORDER BY producer_name""".stripMargin),
    "delayed_due" -> envSql(
      """SELECT "offset", partition FROM envelope
        |WHERE deliver_at IS NULL OR deliver_at <= TIMESTAMP '2024-01-15 00:00:00'
        |ORDER BY "offset"""".stripMargin),
    // the streaming dispatch gate must emit the identical dispatchable set
    "delayed_due_stream" -> envSql(
      """SELECT "offset", partition FROM envelope
        |WHERE deliver_at IS NULL OR deliver_at <= TIMESTAMP '2024-01-15 00:00:00'
        |ORDER BY "offset"""".stripMargin),
    "ttl_expiry" -> envSql(
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM envelope
        |WHERE publish_time >= (SELECT MAX(publish_time) FROM envelope) - INTERVAL 7 DAY
        |GROUP BY event_type ORDER BY event_type""".stripMargin),
    "seek_by_time" -> envSql(
      """SELECT partition, MIN("offset") AS seek_offset FROM envelope
        |WHERE publish_time >= TIMESTAMP '2024-01-15 00:00:00'
        |GROUP BY partition ORDER BY partition""".stripMargin),
    "last_message_ids" -> envSql(
      """SELECT partition, MAX("offset") AS last_offset FROM envelope
        |GROUP BY partition ORDER BY partition""".stripMargin),
    "peek_messages" -> envSql(
      """SELECT partition, "offset", key FROM (
        |  SELECT partition, "offset", key,
        |    ROW_NUMBER() OVER (PARTITION BY partition ORDER BY "offset") AS rn
        |  FROM envelope) t WHERE rn <= 10 ORDER BY partition, "offset"""".stripMargin),
    "examine_message" -> envSql(
      """SELECT * FROM (
        |  SELECT 'earliest' AS from_pos, partition, "offset", key FROM (
        |    SELECT partition, "offset", key,
        |      ROW_NUMBER() OVER (PARTITION BY partition ORDER BY "offset") AS rn
        |    FROM envelope) t WHERE rn = 5
        |  UNION ALL
        |  SELECT 'latest' AS from_pos, partition, "offset", key FROM (
        |    SELECT partition, "offset", key,
        |      ROW_NUMBER() OVER (PARTITION BY partition ORDER BY "offset" DESC) AS rn
        |    FROM envelope) t WHERE rn = 3) u
        |ORDER BY from_pos, partition""".stripMargin),
    // unacked-timeout redelivery: delivered = even offsets (at
    // publish_time), acked = every 4th; timed out = delivered, unacked,
    // publish_time at least ackTimeout (1 h) before "now"; the
    // redelivered row carries count+1 and now + 60s·2^(old count)
    "redelivery" -> redeliverySql,
    // the streaming twin redelivers the identical set on the identical
    // schedule — ONE shared oracle string (the txnAckSql pattern), so an
    // edit to the backoff formula can never diverge the two twins
    "redelivery_stream" -> redeliverySql,
    // AUTO_CONSUME two-live-versions decode: v1 rows (even offsets)
    // carry only uid; v2 rows carry user_name + score — union_by_name
    // semantics replayed as per-parity CASEs over the payload formulas
    "schema_evolution" -> envSql(
      """SELECT "offset",
        |  CAST(CASE WHEN "offset" % 2 = 0 THEN 1 ELSE 2 END AS INT) AS schema_version,
        |  CASE WHEN "offset" % 2 = 0 THEN key END AS uid,
        |  CASE WHEN "offset" % 2 = 1 THEN key END AS user_name,
        |  CASE WHEN "offset" % 2 = 1 THEN round(metric_value, 6) END AS score_r
        |FROM envelope ORDER BY "offset"""".stripMargin),
    // replicated-subscription cursor translation: remote = block-reversed
    // re-offset of the same rows; acked identities = local rows at or
    // below the 60% cursor; markDelete = longest remote prefix entirely
    // acked (running MIN over the ack flag), resume = rows above it
    "repl_cursor" -> envSql(
      """, cur AS (
        |  SELECT partition, (MAX("offset") * 3) // 5 AS md
        |  FROM envelope GROUP BY partition),
        |remote AS (
        |  SELECT partition, producer_name, sequence_id,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY partition
        |      ORDER BY "offset" // 10, "offset" % 10 DESC, "offset")
        |      AS BIGINT) AS r_offset
        |  FROM envelope),
        |acked AS (
        |  SELECT DISTINCT e.producer_name, e.sequence_id
        |  FROM envelope e JOIN cur c
        |    ON e.partition = c.partition AND e."offset" <= c.md),
        |flags AS (
        |  SELECT r.partition, r.r_offset,
        |    CASE WHEN a.producer_name IS NOT NULL THEN 1 ELSE 0 END AS ack
        |  FROM remote r LEFT JOIN acked a
        |    ON r.producer_name = a.producer_name
        |   AND r.sequence_id = a.sequence_id),
        |pref AS (
        |  SELECT partition, r_offset,
        |    MIN(ack) OVER (PARTITION BY partition ORDER BY r_offset
        |      ROWS UNBOUNDED PRECEDING) AS ok
        |  FROM flags),
        |mdp AS (
        |  SELECT partition, MAX(r_offset) AS mark_delete
        |  FROM pref WHERE ok = 1 GROUP BY partition),
        |resume AS (
        |  SELECT f.partition, CAST(COUNT(*) AS BIGINT) AS resume_n
        |  FROM flags f JOIN mdp m ON f.partition = m.partition
        |  WHERE f.r_offset > m.mark_delete GROUP BY f.partition),
        |snap AS (
        |  SELECT partition, MAX("offset") AS snap_local,
        |    CAST(COUNT(*) AS BIGINT) AS snap_remote
        |  FROM envelope GROUP BY partition)
        |SELECT s.partition, s.snap_local, s.snap_remote, m.mark_delete,
        |  COALESCE(r.resume_n, 0) AS resume_n
        |FROM snap s JOIN mdp m ON s.partition = m.partition
        |LEFT JOIN resume r ON s.partition = r.partition
        |ORDER BY s.partition""".stripMargin),
    "dlq_route" -> envSql(
      """SELECT CASE WHEN redelivery_count >= 3
        |  THEN topic || '-sub1-DLQ' ELSE topic || '-sub1-RETRY' END AS route_topic,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM envelope GROUP BY 1 ORDER BY route_topic""".stripMargin),
    // streaming routing converges to the identical counts
    "dlq_route_stream" -> envSql(
      """SELECT CASE WHEN redelivery_count >= 3
        |  THEN topic || '-sub1-DLQ' ELSE topic || '-sub1-RETRY' END AS route_topic,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM envelope GROUP BY 1 ORDER BY route_topic""".stripMargin),
    "replication_filter" -> envSql(
      """SELECT replicated_from, CAST(COUNT(*) AS BIGINT) AS n FROM envelope
        |WHERE (replicated_from IS NULL OR replicated_from <> 'cluster-1')
        |  AND (replicated_from IS NULL OR replicated_from <> 'cluster-0')
        |GROUP BY replicated_from ORDER BY replicated_from""".stripMargin),
    // the continuous replicator's loop filter converges to the same counts
    "replication_filter_stream" -> envSql(
      """SELECT replicated_from, CAST(COUNT(*) AS BIGINT) AS n FROM envelope
        |WHERE (replicated_from IS NULL OR replicated_from <> 'cluster-1')
        |  AND (replicated_from IS NULL OR replicated_from <> 'cluster-0')
        |GROUP BY replicated_from ORDER BY replicated_from""".stripMargin),
    "window_tumbling" -> envSql(
      """SELECT strftime(date_trunc('hour', event_time), '%Y-%m-%d %H:%M:%S') AS hour,
        |  event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(metric_value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM envelope GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin),
    // stateful STREAMING window aggregation must converge to the batch
    // tumbling result — identical oracle
    "window_tumbling_stream" -> envSql(
      """SELECT strftime(date_trunc('hour', event_time), '%Y-%m-%d %H:%M:%S') AS hour,
        |  event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(metric_value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM envelope GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin),
    "window_sliding" -> envSql(
      """SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS wstart, event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM (
        |  SELECT event_type,
        |    time_bucket(INTERVAL 30 MINUTE, event_time) - k * INTERVAL 30 MINUTE AS ws
        |  FROM envelope CROSS JOIN (SELECT UNNEST([0, 1]) AS k) ks) t
        |GROUP BY ws, event_type ORDER BY wstart, event_type""".stripMargin),
    "window_count" -> envSql(
      """SELECT key, window_id,
        |  CAST(SUM(CAST(metric_value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  MAX("offset") AS last_offset
        |FROM (
        |  SELECT key, metric_value, "offset",
        |    CAST((ROW_NUMBER() OVER (PARTITION BY key ORDER BY "offset") - 1) // 20 AS BIGINT) AS window_id
        |  FROM envelope) t
        |GROUP BY key, window_id HAVING COUNT(*) = 20
        |ORDER BY key, window_id""".stripMargin),
    "window_count_sliding" -> envSql(
      """SELECT key, trigger_id, w_sum, w_max FROM (
        |  SELECT key,
        |    ROW_NUMBER() OVER w AS rn,
        |    COUNT(*) OVER f AS w_count,
        |    CAST(SUM(CAST(metric_value AS DECIMAL(18,2))) OVER f AS DOUBLE) AS w_sum,
        |    CAST(CAST(MAX(CAST(metric_value AS DECIMAL(18,2))) OVER f AS DECIMAL(18,2)) AS DOUBLE) AS w_max,
        |    CAST(ROW_NUMBER() OVER w // 10 AS BIGINT) AS trigger_id
        |  FROM envelope
        |  WINDOW w AS (PARTITION BY key ORDER BY "offset"),
        |         f AS (PARTITION BY key ORDER BY "offset"
        |               ROWS BETWEEN 24 PRECEDING AND CURRENT ROW)) t
        |WHERE rn % 10 = 0 AND w_count = 25
        |ORDER BY key, trigger_id""".stripMargin),
    "session_windows" -> envSql(
      """SELECT key, CAST(COUNT(DISTINCT sid) AS BIGINT) AS n_sessions,
        |  CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM (
        |  SELECT key, SUM(new_s) OVER (PARTITION BY key ORDER BY event_time, "offset"
        |    ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM (
        |    SELECT key, event_time, "offset",
        |      CASE WHEN LAG(event_time) OVER w IS NULL
        |           OR event_time - LAG(event_time) OVER w >= INTERVAL 30 MINUTE
        |        THEN 1 ELSE 0 END AS new_s
        |    FROM envelope WINDOW w AS (PARTITION BY key ORDER BY event_time, "offset")
        |  ) m) t
        |GROUP BY key ORDER BY key""".stripMargin),
    // the same islands derivation, emitted per session: the streaming
    // session_window state machine must land exactly these rows
    "session_windows_stream" -> envSql(
      """SELECT key,
        |  strftime(MIN(event_time), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM (
        |  SELECT key, event_time, SUM(new_s) OVER (PARTITION BY key
        |    ORDER BY event_time, "offset" ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM (
        |    SELECT key, event_time, "offset",
        |      CASE WHEN LAG(event_time) OVER w IS NULL
        |           OR event_time - LAG(event_time) OVER w >= INTERVAL 30 MINUTE
        |        THEN 1 ELSE 0 END AS new_s
        |    FROM envelope WINDOW w AS (PARTITION BY key ORDER BY event_time, "offset")
        |  ) m) t
        |GROUP BY key, sid ORDER BY key, session_start""".stripMargin),
    // identical islands replay for the BOUNDED-STATE (watermark +
    // append) configuration — session semantics are order-independent,
    // so the time-reordered fixture must land exactly the same rows;
    // any watermark-dropped event or doubly-emitted session mismatches
    "session_windows_watermark" -> envSql(
      """SELECT key,
        |  strftime(MIN(event_time), '%Y-%m-%d %H:%M:%S') AS session_start,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM (
        |  SELECT key, event_time, SUM(new_s) OVER (PARTITION BY key
        |    ORDER BY event_time, "offset" ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM (
        |    SELECT key, event_time, "offset",
        |      CASE WHEN LAG(event_time) OVER w IS NULL
        |           OR event_time - LAG(event_time) OVER w >= INTERVAL 30 MINUTE
        |        THEN 1 ELSE 0 END AS new_s
        |    FROM envelope WINDOW w AS (PARTITION BY key ORDER BY event_time, "offset")
        |  ) m) t
        |GROUP BY key, sid ORDER BY key, session_start""".stripMargin),
    "q_median" -> envSql(
      """SELECT event_type,
        |  quantile_cont(metric_value, 0.5) AS median_value,
        |  quantile_cont(metric_value, 0.25) AS p25,
        |  quantile_cont(metric_value, 0.75) AS p75
        |FROM envelope GROUP BY event_type ORDER BY event_type""".stripMargin),
    "counters" -> envSql(
      """SELECT key, CAST(COUNT(*) AS BIGINT) AS counter FROM envelope
        |GROUP BY key ORDER BY key""".stripMargin),
    "multi_topic_union" -> envSql(
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM (
        |  SELECT * FROM envelope WHERE event_type = 'purchase'
        |  UNION ALL SELECT * FROM envelope WHERE event_type = 'click') t
        |GROUP BY event_type ORDER BY event_type""".stripMargin),
    // the dynamic-discovery contract in SQL: the final topic set's union
    // — purchase + click (pre-subscription) + error (created mid-
    // subscription, matched) — and NOTHING from the non-matching view
    // topic. A subscriber that resolved the pattern once misses 'error'.
    "pattern_subscribe" -> envSql(
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM envelope
        |WHERE "offset" < 3000
        |  AND event_type IN ('purchase', 'click', 'error')
        |GROUP BY event_type ORDER BY event_type""".stripMargin),
    "keyshared_hash_oracle" -> (mm3Macros +
      """WITH ev AS (
        |  SELECT * REPLACE (make_timestamp(epoch_ns(ts) // 1000) AS ts) FROM events
        |), envelope AS (
        |  SELECT CAST(user_id AS VARCHAR) AS key FROM ev
        |), slots AS (
        |  SELECT key, mm3_8(key) % 65536 AS slot,
        |    CAST(least((mm3_8(key) % 65536) // 16384, 3) AS INT) AS consumer_id
        |  FROM envelope)
        |SELECT consumer_id, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(DISTINCT key) AS BIGINT) AS n_keys,
        |  MIN(slot) AS min_slot, MAX(slot) AS max_slot
        |FROM slots GROUP BY consumer_id ORDER BY consumer_id""".stripMargin),
    // every murmur3 length regime (0-3 tail-only, 4/8/12 pure rounds,
    // 5-7/9-11/13-15 rounds+tail) hashed by BOTH engines, bit-for-bit
    "hash_wide" -> (mm3Macros +
      """WITH ev AS (
        |  SELECT * REPLACE (make_timestamp(epoch_ns(ts) // 1000) AS ts) FROM events
        |), uniq AS (
        |  SELECT DISTINCT CAST(user_id AS VARCHAR) AS key, event_type FROM ev
        |), wide AS (
        |  SELECT key, event_type, CAST(n AS BIGINT) AS n,
        |    substr(key || '#' || event_type || '~abcdefghijklmnop', 1, CAST(n AS INT)) AS wk
        |  FROM uniq CROSS JOIN range(1, 16) t(n))
        |SELECT key, event_type, n, wk, CAST(mm3_8(wk) AS BIGINT) AS h
        |FROM wide ORDER BY key, event_type, n""".stripMargin),
    "keyshared_assign" -> (mm3Macros +
      """WITH ev AS (
        |  SELECT * REPLACE (make_timestamp(epoch_ns(ts) // 1000) AS ts) FROM events
        |), envelope AS (
        |  SELECT CAST(user_id AS VARCHAR) AS key FROM ev
        |), slots AS (
        |  SELECT key,
        |    CAST(least((mm3_8(key) % 65536) // 16384, 3) AS INT) AS consumer_id
        |  FROM envelope)
        |SELECT consumer_id, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(DISTINCT key) AS BIGINT) AS n_keys
        |FROM slots GROUP BY consumer_id ORDER BY consumer_id""".stripMargin),
    // Both consistent-hash rings rebuilt in pure SQL: point = mm3_8 of
    // the "consumer-i" name; ceiling lookup = first (point, owner) with
    // point >= slot, wrapping to the smallest point — the same
    // tie-break order as Dispatch.ringAssign's stable sort.
    "keyshared_sticky" -> (mm3Macros +
      """WITH ev AS (
        |  SELECT * REPLACE (make_timestamp(epoch_ns(ts) // 1000) AS ts) FROM events
        |), envelope AS (
        |  SELECT CAST(user_id AS VARCHAR) AS key FROM ev
        |), slots AS (
        |  SELECT key, mm3_8(key) % 65536 AS slot FROM envelope
        |), assigned AS (
        |  SELECT key, slot,
        |    CASE WHEN slot BETWEEN 0 AND 21845 THEN 'c1'
        |         WHEN slot BETWEEN 30000 AND 52000 THEN 'c2'
        |         WHEN slot BETWEEN 52001 AND 65535 THEN 'c3'
        |    END AS consumer_id
        |  FROM slots)
        |SELECT consumer_id, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(DISTINCT key) AS BIGINT) AS n_keys,
        |  MIN(slot) AS min_slot, MAX(slot) AS max_slot
        |FROM assigned GROUP BY consumer_id ORDER BY consumer_id NULLS FIRST""".stripMargin),
    // Boundaries hand-derived from the reference's split-biggest-in-half
    // algorithm for join order c1..c4 (HashRangeAutoSplitStickyKey
    // ConsumerSelector.java): c3 [0,16384], c2 (16384,32768],
    // c4 (32768,49152], c1 (49152,65535] — independent of the engine's
    // driver-side simulation, which must land on the same layout.
    "keyshared_autosplit" -> (mm3Macros +
      """WITH ev AS (
        |  SELECT * REPLACE (make_timestamp(epoch_ns(ts) // 1000) AS ts) FROM events
        |), envelope AS (
        |  SELECT CAST(user_id AS VARCHAR) AS key FROM ev
        |), slots AS (
        |  SELECT key, mm3_8(key) % 65536 AS slot FROM envelope
        |), assigned AS (
        |  SELECT key, slot,
        |    CASE WHEN slot <= 16384 THEN 'c3'
        |         WHEN slot <= 32768 THEN 'c2'
        |         WHEN slot <= 49152 THEN 'c4'
        |         ELSE 'c1'
        |    END AS consumer_id
        |  FROM slots)
        |SELECT consumer_id, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(DISTINCT key) AS BIGINT) AS n_keys,
        |  MIN(slot) AS min_slot, MAX(slot) AS max_slot
        |FROM assigned GROUP BY consumer_id ORDER BY consumer_id""".stripMargin),
    // The rings are materialized as temp tables (separate statements):
    // the mm3_8 macro expands to a large expression tree, and three
    // evaluation regions in one pipeline exhaust DuckDB's per-thread
    // allocations at high thread counts.
    "producer_batches" -> envSql(
      """, rnk AS (
        |  SELECT partition, "offset",
        |    ROW_NUMBER() OVER (PARTITION BY partition ORDER BY "offset") - 1 AS rn
        |  FROM envelope)
        |SELECT partition, CAST(rn // 100 AS BIGINT) AS batch_seq,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  MIN("offset") AS min_offset, MAX("offset") AS max_offset,
        |  CAST(MAX(rn % 100) AS INT) AS top_batch_index
        |FROM rnk GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    // schedule RECOMPUTED from the (priority, permits) table — one row
    // per permit ranked by (priority, round, list position); the engine's
    // driver-side cycle must agree slot-for-slot or counts/spans diverge
    "shared_priority" -> envSql(
      """, sched AS (
        |  SELECT name, ROW_NUMBER() OVER (ORDER BY priority, r, pos) - 1 AS slot
        |  FROM (
        |    SELECT name, priority, pos, unnest(range(permits)) AS r
        |    FROM (VALUES ('c1',0,2,0),('c2',0,1,1),('c3',0,1,2),('c4',1,2,3),('c5',1,1,4))
        |      AS c(name, priority, permits, pos)) t),
        |rnk AS (
        |  SELECT "offset", partition,
        |    ROW_NUMBER() OVER (PARTITION BY partition ORDER BY "offset") - 1 AS rn
        |  FROM envelope)
        |SELECT s.name AS consumer_id, CAST(COUNT(*) AS BIGINT) AS n,
        |  MIN("offset") AS min_offset, MAX("offset") AS max_offset
        |FROM rnk JOIN sched s ON s.slot = rnk.rn % (SELECT COUNT(*) FROM sched)
        |GROUP BY 1 ORDER BY 1""".stripMargin),
    // frame census from the inverted fixture-duration formulas:
    // dur//step + 1 frames pins explode(sequence(0, dur, step)) fenceposts
    "frame_sample" ->
      """WITH m AS (
        |  SELECT doc_id, doc_id % 6 AS k,
        |    CAST(1 + (doc_id % 2) AS INT) AS wav_ch,
        |    8000 + (doc_id % 100) * 16 AS wav_data,
        |    list_extract([32,40,48,56,64,80,96,112,128,160,192,224,256,320],
        |      CAST(1 + (doc_id % 14) AS INT)) AS kbps,
        |    2000 + (doc_id % 50) * 100 AS mp3_bytes,
        |    30000 + (doc_id % 100) * 500 AS mp4_dur
        |  FROM documents),
        |d AS (
        |  SELECT doc_id,
        |    CASE k WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' WHEN 2 THEN 'gif'
        |           WHEN 3 THEN 'wav' WHEN 4 THEN 'mp3' ELSE 'mp4' END AS format,
        |    CASE WHEN k < 3 THEN 0
        |         WHEN k = 3 THEN (wav_data * 1000) // (8000 * wav_ch * 2)
        |         WHEN k = 4 THEN (mp3_bytes * 8) // kbps
        |         ELSE mp4_dur END AS dur
        |  FROM m)
        |SELECT doc_id, format,
        |  CAST(dur // 700 + 1 AS BIGINT) AS n_frames,
        |  CAST((dur // 700) * 700 AS BIGINT) AS last_frame_ms
        |FROM d ORDER BY doc_id""".stripMargin,
    // surviving CDC state recomputed from the BASE columns (no JSON on
    // the oracle side): latest offset per key wins, tombstones (null
    // value -> op 'd') drop the key, after = the original payload —
    // a hash match proves the Spark side's JSON escape/parse round-trip
    "cdc_apply" -> envSql(
      """, latest AS (
        |  SELECT key, "offset", value,
        |    ROW_NUMBER() OVER (PARTITION BY key ORDER BY "offset" DESC) AS rn
        |  FROM envelope)
        |SELECT key,
        |  CASE WHEN "offset" % 3 = 0 THEN 'c' ELSE 'u' END AS op,
        |  "offset" AS as_of_offset, value AS after
        |FROM latest WHERE rn = 1 AND value IS NOT NULL
        |ORDER BY key""".stripMargin),
    // canal FlatMessage apply: identical file/pos arithmetic, the resume
    // watermark drops the acked prefix, last write per pk wins, DELETE
    // removes — replayed entirely in SQL
    "canal_apply" -> envSql(
      """, ch AS (
        |  SELECT key AS pk,
        |    'mysql-bin.' || lpad(CAST("offset" // 300 AS VARCHAR), 6, '0') AS binlog_file,
        |    CAST(("offset" % 300) * 4 + 4 AS BIGINT) AS binlog_pos,
        |    CASE WHEN value IS NULL THEN 'DELETE'
        |         WHEN "offset" % 3 = 0 THEN 'INSERT' ELSE 'UPDATE' END AS change_type,
        |    value AS data
        |  FROM envelope),
        |applied AS (
        |  SELECT * FROM ch
        |  WHERE binlog_file > 'mysql-bin.000001'
        |     OR (binlog_file = 'mysql-bin.000001' AND binlog_pos > 600)),
        |last AS (
        |  SELECT pk, change_type, data, binlog_file, binlog_pos,
        |    ROW_NUMBER() OVER (PARTITION BY pk
        |      ORDER BY binlog_file DESC, binlog_pos DESC) AS rn
        |  FROM applied)
        |SELECT pk, change_type, data, binlog_file, binlog_pos
        |FROM last WHERE rn = 1 AND change_type <> 'DELETE'
        |ORDER BY pk""".stripMargin),
    // active tier RECOMPUTED from the (name, priority) table: min
    // priority wins, lexicographic spread over partitions — the standby
    // consumer must appear in neither result
    "failover_assign" -> envSql(
      """, cons AS (
        |  SELECT * FROM (VALUES ('standby',5),('b',0),('a',0)) AS c(name, priority)),
        |tier AS (
        |  SELECT name, ROW_NUMBER() OVER (ORDER BY name) - 1 AS idx,
        |    COUNT(*) OVER () AS n_tier
        |  FROM cons WHERE priority = (SELECT MIN(priority) FROM cons))
        |SELECT t.name AS consumer_id, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(DISTINCT e.partition) AS BIGINT) AS n_partitions,
        |  MIN(e."offset") AS min_offset, MAX(e."offset") AS max_offset
        |FROM envelope e JOIN tier t ON t.idx = e.partition % t.n_tier
        |GROUP BY 1 ORDER BY 1""".stripMargin),
    "keyshared_rebalance" -> (mm3Macros +
      """CREATE OR REPLACE TEMP TABLE graft_ring_old AS
        |  SELECT mm3_8(c || '-' || CAST(i AS VARCHAR)) % 65536 AS point, c AS owner
        |  FROM (SELECT unnest(['c1','c2','c3']) AS c) cs CROSS JOIN range(0, 100) t(i);
        |CREATE OR REPLACE TEMP TABLE graft_ring_new AS
        |  SELECT mm3_8(c || '-' || CAST(i AS VARCHAR)) % 65536 AS point, c AS owner
        |  FROM (SELECT unnest(['c1','c2','c3','c4']) AS c) cs CROSS JOIN range(0, 100) t(i);
        |WITH ev AS (
        |  SELECT * REPLACE (make_timestamp(epoch_ns(ts) // 1000) AS ts) FROM events
        |), envelope AS (
        |  SELECT CAST(user_id AS VARCHAR) AS key FROM ev
        |), slots AS (
        |  SELECT key, mm3_8(key) % 65536 AS slot FROM envelope
        |), uniq AS (SELECT DISTINCT key, slot FROM slots
        |), a_old AS (
        |  SELECT key, owner AS consumer_before FROM (
        |    SELECT u.key, r.owner,
        |      ROW_NUMBER() OVER (PARTITION BY u.key ORDER BY (r.point < u.slot), r.point, r.owner) AS rn
        |    FROM uniq u CROSS JOIN graft_ring_old r) t WHERE rn = 1
        |), a_new AS (
        |  SELECT key, owner AS consumer_after FROM (
        |    SELECT u.key, r.owner,
        |      ROW_NUMBER() OVER (PARTITION BY u.key ORDER BY (r.point < u.slot), r.point, r.owner) AS rn
        |    FROM uniq u CROSS JOIN graft_ring_new r) t WHERE rn = 1
        |), joined AS (
        |  SELECT s.key, consumer_before, consumer_after
        |  FROM slots s JOIN a_old USING (key) JOIN a_new USING (key))
        |SELECT consumer_before, consumer_after, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(DISTINCT key) AS BIGINT) AS n_keys
        |FROM joined GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    // rebalance + drain cursors: ring ownership replayed as above, then
    // a moved slot's rows split on the per-partition 60% cursor — at or
    // below stays with the old owner (still draining), above routes new
    "keyshared_drain" -> (mm3Macros +
      """CREATE OR REPLACE TEMP TABLE graft_ring_old AS
        |  SELECT mm3_8(c || '-' || CAST(i AS VARCHAR)) % 65536 AS point, c AS owner
        |  FROM (SELECT unnest(['c1','c2','c3']) AS c) cs CROSS JOIN range(0, 100) t(i);
        |CREATE OR REPLACE TEMP TABLE graft_ring_new AS
        |  SELECT mm3_8(c || '-' || CAST(i AS VARCHAR)) % 65536 AS point, c AS owner
        |  FROM (SELECT unnest(['c1','c2','c3','c4']) AS c) cs CROSS JOIN range(0, 100) t(i);
        |WITH ev AS (
        |  SELECT * REPLACE (make_timestamp(epoch_ns(ts) // 1000) AS ts) FROM events
        |), envelope AS (
        |  SELECT CAST(user_id AS VARCHAR) AS key,
        |    CAST(user_id % 4 AS INT) AS partition, event_id AS "offset"
        |  FROM ev
        |), cur AS (
        |  SELECT partition, (MAX("offset") * 3) // 5 AS md
        |  FROM envelope GROUP BY partition
        |), uniq AS (
        |  SELECT DISTINCT key, mm3_8(key) % 65536 AS slot FROM envelope
        |), a_old AS (
        |  SELECT key, owner AS consumer_before FROM (
        |    SELECT u.key, r.owner,
        |      ROW_NUMBER() OVER (PARTITION BY u.key ORDER BY (r.point < u.slot), r.point, r.owner) AS rn
        |    FROM uniq u CROSS JOIN graft_ring_old r) t WHERE rn = 1
        |), a_new AS (
        |  SELECT key, owner AS consumer_after FROM (
        |    SELECT u.key, r.owner,
        |      ROW_NUMBER() OVER (PARTITION BY u.key ORDER BY (r.point < u.slot), r.point, r.owner) AS rn
        |    FROM uniq u CROSS JOIN graft_ring_new r) t WHERE rn = 1
        |), eff AS (
        |  SELECT e.key, (consumer_before <> consumer_after) AS moved,
        |    CASE WHEN consumer_before <> consumer_after AND e."offset" <= c.md
        |      THEN consumer_before ELSE consumer_after END AS consumer_id,
        |    e."offset"
        |  FROM envelope e
        |  JOIN a_old USING (key) JOIN a_new USING (key)
        |  JOIN cur c ON e.partition = c.partition)
        |SELECT moved, consumer_id, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(DISTINCT key) AS BIGINT) AS n_keys,
        |  MAX("offset") AS max_offset
        |FROM eff GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),
    "topic_log_roundtrip" -> topicLogRoundtripSql,
    // pruning manifest HISTORY must leave the read surface untouched —
    // identical counts and dense offsets to the un-pruned roundtrip
    "manifest_prune" -> topicLogRoundtripSql,
    // both txn legs rebuilt in SQL: dense per-partition offsets via
    // ROW_NUMBER (ack membership depends only on offset VALUES, so
    // (publish_time, sequence_id) ties cannot diverge the set), cursor =
    // largest dense acked prefix, backlog = anti-join, output = the
    // sequence_id%5 slice re-routed by key hash
    "txn_ack" -> txnAckSql,
    // compaction must not change any answer: same truth, computed
    // through the cursor floor + surviving individual acks
    "ack_compaction" -> txnAckSql,
    // READ_COMMITTED sees exactly the committed txn's slice, re-routed
    // by key hash with dense offsets; the aborted and in-flight slices
    // must contribute NOTHING
    "txn_visibility" -> txnVisSql("sequence_id % 3 = 0"),
    // READ_UNCOMMITTED sees committed + in-flight staged (dense above
    // the committed high-water — the max_offset arithmetic only holds
    // if the staged epoch's offsets stack exactly on the committed
    // ones); the aborted slice stays invisible here too
    "txn_uncommitted" -> txnVisSql("sequence_id % 3 IN (0, 2)"),
    // positioned reader: dense offsets make the tail arithmetic exact
    "reader_scan" -> (mm3Macros +
      """WITH ev AS (
        |  SELECT * REPLACE (make_timestamp(epoch_ns(ts) // 1000) AS ts) FROM events
        |), keys AS (SELECT CAST(user_id AS VARCHAR) AS key FROM ev),
        |routed AS (SELECT CAST(mm3_8(key) % 4 AS INT) AS partition FROM keys),
        |counts AS (SELECT partition, COUNT(*) AS cnt FROM routed GROUP BY partition)
        |SELECT partition, CAST(cnt - 100 AS BIGINT) AS n,
        |  CAST(100 AS BIGINT) AS first_offset,
        |  CAST(cnt - 1 AS BIGINT) AS max_offset
        |FROM counts WHERE cnt > 100 ORDER BY partition""".stripMargin),
    "interceptor_chain" -> envSql(
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(length('ic1:' || value || ':ic2')) AS BIGINT) AS sum_len
        |FROM envelope WHERE value IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin),
    "function_fanout" -> envSql(
      """SELECT out_topic, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(DISTINCT payload) AS BIGINT) AS n_keys
        |FROM (
        |  SELECT 'fn-out-' || event_type AS out_topic, key AS payload FROM envelope
        |  UNION ALL
        |  SELECT 'fn-audit' AS out_topic, key AS payload FROM envelope
        |  WHERE metric_value > 250.0
        |) t GROUP BY out_topic ORDER BY out_topic""".stripMargin),
    "function_map" -> envSql(
      """SELECT CAST(key AS BIGINT) % 10 AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(metric_value * 2 AS DECIMAL(18,9))) AS DOUBLE) AS sum_doubled
        |FROM envelope WHERE event_type <> 'error'
        |GROUP BY bucket ORDER BY bucket""".stripMargin),
    // Functions.run EFFECTIVELY_ONCE: the sink holds exactly one row per
    // (producer, seq) among the non-error slice — n_rows == n_seq ==
    // distinct seqs; a dedup miss inflates n_rows and breaks the hash
    "function_pipeline_stream" -> envSql(
      """SELECT producer_name,
        |  CAST(COUNT(DISTINCT sequence_id) AS BIGINT) AS n_seq,
        |  CAST(COUNT(DISTINCT sequence_id) AS BIGINT) AS n_rows
        |FROM envelope WHERE value IS NOT NULL
        |GROUP BY producer_name ORDER BY producer_name""".stripMargin),
    // the ordered catch-up replay must land on the IDENTICAL
    // one-row-per-(producer, seq) truth — a watermark drop anywhere in
    // the 6-trigger replay shrinks n_seq/n_rows and breaks the hash
    // (and the run() guard aborts the query before the oracle even runs)
    "function_pipeline_replay" -> envSql(
      """SELECT producer_name,
        |  CAST(COUNT(DISTINCT sequence_id) AS BIGINT) AS n_seq,
        |  CAST(COUNT(DISTINCT sequence_id) AS BIGINT) AS n_rows
        |FROM envelope WHERE value IS NOT NULL
        |GROUP BY producer_name ORDER BY producer_name""".stripMargin),
    // AT_MOST_ONCE truth: the pre-acked epoch's slice (offset % 3 = 0)
    // is LOST, everything else delivered exactly once even though the
    // final epoch was replayed after a deleted checkpoint commit — a
    // redelivered batch inflates n_rows; a dropped surviving slice
    // shrinks it. n_rows intentionally exceeds n_seq (AMO must not
    // dedup sequence ids, only never deliver the same epoch twice).
    "function_pipeline_amo" -> envSql(
      """SELECT producer_name,
        |  CAST(COUNT(DISTINCT sequence_id) AS BIGINT) AS n_seq,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows
        |FROM envelope WHERE value IS NOT NULL AND "offset" % 3 <> 0
        |GROUP BY producer_name ORDER BY producer_name""".stripMargin),
    // keyed-state running max replayed as a window: a break is a metric
    // strictly above every earlier metric of the same key (offset order)
    "stateful_max" -> envSql(
      """, seqd AS (
        |  SELECT key, "offset", metric_value,
        |    MAX(metric_value) OVER (PARTITION BY key ORDER BY "offset"
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
        |  FROM envelope),
        |breaks AS (
        |  SELECT key, "offset" FROM seqd
        |  WHERE prev_max IS NULL OR metric_value > prev_max)
        |SELECT key, CAST(COUNT(*) AS BIGINT) AS n_breaks,
        |  MAX("offset") AS last_break_offset
        |FROM breaks GROUP BY key ORDER BY key""".stripMargin),
    // chunk-dedup truth: a correct dedup+reassembly is the IDENTITY on
    // the original text; the excluded set is the closed-form lost-chunk
    // condition (last chunk dropped, no %11 resend to refill it, and
    // not a 2-chunk %7 doc whose chunk-1 retransmit refills the loss —
    // num_chunks = 2 ⟺ 64 < length ≤ 128 at the 64-char chunk size)
    "chunk_dedup" ->
      """SELECT doc_id, md5(text) AS payload_md5,
        |  CAST(length(text) AS BIGINT) AS payload_len
        |FROM documents
        |WHERE text IS NOT NULL
        |  AND NOT (doc_id % 13 = 5 AND doc_id % 11 <> 0 AND length(text) > 64
        |           AND NOT (doc_id % 7 = 0 AND length(text) <= 128))
        |ORDER BY doc_id""".stripMargin,
    // the shadow view is the same committed per-partition truth with the
    // shadow topic name relabeled
    "shadow_read" -> (mm3Macros +
      """WITH ev AS (
        |  SELECT * REPLACE (make_timestamp(epoch_ns(ts) // 1000) AS ts) FROM events
        |), envelope AS (
        |  SELECT CAST(user_id AS VARCHAR) AS key FROM ev
        |), routed AS (
        |  SELECT CAST(mm3_8(key) % 4 AS INT) AS partition FROM envelope)
        |SELECT 'persistent://public/default/events-shadow' AS topic,
        |  partition, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(*) - 1 AS BIGINT) AS max_offset
        |FROM routed GROUP BY partition ORDER BY partition""".stripMargin),
    // coalesce+vacuum must be content-neutral: same oracle as the plain
    // produce round trip — a lost or duplicated row breaks the match
    "coalesce_roundtrip" -> topicLogRoundtripSql,
    // offload + transparent hot∪cold read must preserve the same truth
    "offload_read" -> topicLogRoundtripSql,
    // file-granular retention: day>15 files survive whole; min surviving
    // offset = count of trimmed (day<=15) rows per partition
    "compaction_strategic" -> envSql(
      """SELECT key, round(metric_value, 6) AS metric_r, "offset"
        |FROM (
        |  SELECT key, value, metric_value, "offset",
        |    ROW_NUMBER() OVER (PARTITION BY key
        |      ORDER BY metric_value DESC, "offset" DESC) AS rn
        |  FROM envelope) t
        |WHERE rn = 1 AND value IS NOT NULL
        |ORDER BY key""".stripMargin),
    // partition expansion: originals at mm3%4 keep their slots and
    // offsets; the sequence_id%5 append routes over the NEW count (6),
    // with partitions 4-5 starting dense at 0
    "partition_update" -> (mm3Macros +
      s"WITH ${graft.model.Envelope.duckdbCte},\n" +
      """routed AS (
        |  SELECT CAST(mm3_8(key) % 4 AS INT) AS partition FROM envelope
        |  UNION ALL
        |  SELECT CAST(mm3_8(key) % 6 AS INT) AS partition FROM envelope
        |  WHERE sequence_id % 5 = 0)
        |SELECT partition, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(COUNT(*) - 1 AS BIGINT) AS max_offset
        |FROM routed GROUP BY partition ORDER BY partition""".stripMargin),
    // strategic compaction: max-(metric, offset) winner per key, null
    // values tombstoned after selection — see qCompactionStrategic.
    // retention_trim: file-granular survivors (day>15 files whole);
    // min surviving offset = count of trimmed (day<=15) rows/partition
    // triggerCompaction horizon cut: per-key last non-tombstone among
    // day<=23 (offset order == (publish_time, seq) order under quartile
    // appends), union the raw day>23 tail; rows re-route by mm3%4
    "read_compacted" -> (mm3Macros +
      s"WITH ${graft.model.Envelope.duckdbCte},\n" +
      """r AS (
        |  SELECT key, value, publish_time AS pt, sequence_id AS seq,
        |    date_part('day', publish_time) AS d,
        |    CAST(mm3_8(key) % 4 AS INT) AS partition
        |  FROM envelope
        |), snap AS (
        |  SELECT key, partition FROM (
        |    SELECT key, partition, value,
        |      ROW_NUMBER() OVER (PARTITION BY key ORDER BY pt DESC, seq DESC) AS rn
        |    FROM r WHERE d <= 23) t
        |  WHERE rn = 1 AND value IS NOT NULL
        |), tl AS (SELECT key, partition FROM r WHERE d > 23),
        |uni AS (SELECT key, partition FROM snap
        |        UNION ALL SELECT key, partition FROM tl),
        |tot AS (SELECT partition, COUNT(*) AS total FROM r GROUP BY partition)
        |SELECT u.partition, CAST(COUNT(*) AS BIGINT) AS n_rows,
        |  CAST(COUNT(DISTINCT u.key) AS BIGINT) AS n_keys,
        |  CAST(t.total - 1 AS BIGINT) AS max_offset
        |FROM uni u JOIN tot t ON u.partition = t.partition
        |GROUP BY u.partition, t.total ORDER BY u.partition""".stripMargin),
    "retention_trim" -> (mm3Macros +
      """WITH ev AS (
        |  SELECT * REPLACE (make_timestamp(epoch_ns(ts) // 1000) AS ts) FROM events
        |), routed AS (
        |  SELECT CAST(mm3_8(CAST(user_id AS VARCHAR)) % 4 AS INT) AS partition,
        |    date_part('day', ts) AS d
        |  FROM ev)
        |SELECT partition,
        |  CAST(SUM(CASE WHEN d > 15 THEN 1 ELSE 0 END) AS BIGINT) AS n,
        |  CAST(SUM(CASE WHEN d <= 15 THEN 1 ELSE 0 END) AS BIGINT) AS min_offset,
        |  CAST(COUNT(*) - 1 AS BIGINT) AS max_offset
        |FROM routed GROUP BY partition ORDER BY partition""".stripMargin),
    // the rate-limited dispatch loop must also be content-neutral: the
    // token bucket delays batches, never drops or replays them
    "dispatch_rate_stream" -> topicLogRoundtripSql,
    // the debt discipline must be result-neutral too — same truth
    "dispatch_rate_debt_stream" -> topicLogRoundtripSql,
    // the rotating file sink (hdfs3/alluxio path) must also be
    // content-neutral: write → read-back → identical counts
    "file_sink_roundtrip" -> topicLogRoundtripSql,
    "datagen_persons" -> graft.sources.DataGeneratorSource.oracleSql(1000, "dg"),
    "chunk_reassembly" -> envSql(
      """SELECT CAST("offset" AS VARCHAR) AS chunk_uuid, value AS payload
        |FROM envelope WHERE value IS NOT NULL AND "offset" < 100
        |ORDER BY chunk_uuid""".stripMargin),
    // the streaming consume-path twin must land the identical payloads
    // even though no microbatch ever sees a complete chunk group
    "chunk_reassembly_stream" -> envSql(
      """SELECT CAST("offset" AS VARCHAR) AS chunk_uuid, value AS payload
        |FROM envelope WHERE value IS NOT NULL AND "offset" < 100
        |ORDER BY chunk_uuid""".stripMargin),
    "crypto_roundtrip" -> envSql(
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM envelope
        |WHERE value IS NOT NULL GROUP BY event_type ORDER BY event_type""".stripMargin),
    "backlog_quota" -> envSql(
      """SELECT partition, CAST(COUNT(*) AS BIGINT) AS backlog,
        |  MAX("offset") AS head, COUNT(*) > 1000 AS over_quota,
        |  CASE WHEN COUNT(*) > 1000 THEN MAX("offset") - 1000 END AS evict_to
        |FROM envelope GROUP BY partition ORDER BY partition""".stripMargin),
    "admin_skip" -> envSql(
      """SELECT partition, MAX("offset") AS new_cursor FROM (
        |  SELECT partition, "offset",
        |    ROW_NUMBER() OVER (PARTITION BY partition ORDER BY "offset") AS rn
        |  FROM envelope) t WHERE rn <= 100
        |GROUP BY partition ORDER BY partition""".stripMargin),
    // Topics.getStats replay: storage octets (value+key), per-sub
    // backlog, and mark-delete derived the same sort-free way — highest
    // acked offset below the first unacked one
    "topic_stats" -> envSql(statsOracleCte +
      """
        |SELECT s.subscription, st.partition, st.msg_count, st.storage_bytes,
        |  round(CAST(st.storage_bytes AS DOUBLE) / st.msg_count, 6) AS avg_msg_size_r,
        |  st.head_offset, st.producers,
        |  COALESCE(md.mark_delete, -1) AS mark_delete,
        |  COALESCE(bl.backlog, 0) AS backlog
        |FROM store st CROSS JOIN subs s
        |LEFT JOIN bl ON bl.subscription = s.subscription AND bl.partition = st.partition
        |LEFT JOIN md ON md.subscription = s.subscription AND md.partition = st.partition
        |ORDER BY s.subscription, st.partition""".stripMargin),
    // windowed throughput counters: hour buckets of publish_time
    "topic_rates" -> envSql(
      """SELECT partition,
        |  strftime(date_trunc('hour', publish_time), '%Y-%m-%d %H:%M:%S') AS hour,
        |  CAST(COUNT(*) AS BIGINT) AS msgs,
        |  CAST(SUM(COALESCE(octet_length(CAST(value AS BLOB)), 0) +
        |    COALESCE(octet_length(CAST(key AS BLOB)), 0)) AS BIGINT) AS bytes
        |FROM envelope GROUP BY 1, 2 ORDER BY partition, hour""".stripMargin),
    // getPartitionedStats rollup: counters summed across partitions,
    // SAME shared CTE block as topic_stats (fixture parity by construction)
    "topic_stats_partitioned" -> envSql(statsOracleCte +
      """
        |SELECT s.subscription,
        |  CAST(COUNT(*) AS BIGINT) AS partitions,
        |  CAST(SUM(st.msg_count) AS BIGINT) AS msg_count,
        |  CAST(SUM(st.storage_bytes) AS BIGINT) AS storage_bytes,
        |  CAST(SUM(COALESCE(bl.backlog, 0)) AS BIGINT) AS backlog
        |FROM store st CROSS JOIN subs s
        |LEFT JOIN bl ON bl.subscription = s.subscription AND bl.partition = st.partition
        |GROUP BY s.subscription ORDER BY s.subscription""".stripMargin),
    // the live per-partition counters converge to the batch truth
    "topic_stats_stream" -> envSql(
      """SELECT partition, CAST(COUNT(*) AS BIGINT) AS msg_count,
        |  CAST(SUM(COALESCE(octet_length(CAST(value AS BLOB)), 0) +
        |    COALESCE(octet_length(CAST(key AS BLOB)), 0)) AS BIGINT) AS storage_bytes
        |FROM envelope GROUP BY partition ORDER BY partition""".stripMargin),
    "q_count_distinct" -> envSql(
      """SELECT event_type, CAST(COUNT(DISTINCT key) AS BIGINT) AS n_users,
        |  CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM envelope GROUP BY event_type ORDER BY event_type""".stripMargin),
    // the estimate itself is engine-side-only; the oracle checks the exact
    // counts AND the in-query error-bound certificate (TRUE expected)
    "hll_cardinality" -> envSql(
      """SELECT event_type, CAST(COUNT(DISTINCT key) AS BIGINT) AS exact,
        |  TRUE AS within_bound
        |FROM envelope GROUP BY event_type ORDER BY event_type""".stripMargin),
    // same certificate pattern: exact counts + the KMV rank-error bool
    "quantile_sketch" -> envSql(
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n, TRUE AS rank_ok
        |FROM envelope GROUP BY event_type ORDER BY event_type""".stripMargin),
    // same certificate pattern: exact top-10 + the CMS bound booleans
    "heavy_hitters" -> envSql(
      """SELECT key, exact_n, TRUE AS lower_ok, TRUE AS upper_ok FROM (
        |  SELECT key, CAST(COUNT(*) AS BIGINT) AS exact_n
        |  FROM envelope GROUP BY key
        |  ORDER BY exact_n DESC, key LIMIT 10) t
        |ORDER BY exact_n DESC, key""".stripMargin),
    // avro round-trip: nested identity projection — a wire-format,
    // union-branch or record/map/array nesting defect breaks the hash
    "avro_roundtrip" -> serdeNestedOracle,
    // same nested identity oracle: the protobuf wire round-trip (incl.
    // submessages, map entries, packed repeated) must be lossless
    "proto_roundtrip" -> serdeNestedOracle,
    // SpaceSaving certificate: the Metwally bounds are always-true for a
    // correct sketch, so the oracle is the exact top-10 + TRUE
    "spacesaving_topk" -> envSql(
      """SELECT key, exact_n, TRUE AS guarantee_ok FROM (
        |  SELECT key, CAST(COUNT(*) AS BIGINT) AS exact_n
        |  FROM envelope GROUP BY key
        |  ORDER BY exact_n DESC, key LIMIT 10) t
        |ORDER BY exact_n DESC, key""".stripMargin),
    "text_tokens" ->
      """SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
        |    / len(string_split(text, ' ')) AS avg_token_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    // NFC + control-strip replayed byte-for-byte (chr(769) = combining
    // acute, chr(233) = precomposed é, chr(7) = BEL to strip)
    "text_normalize" ->
      """SELECT doc_id, md5(regexp_replace(
        |  nfc_normalize(text || ' cafe' || chr(769) || ' ' || chr(233) || chr(7) || 'tail'),
        |  '[\x00-\x08\x0b-\x1f\x7f]', '', 'g')) AS norm_md5
        |FROM documents ORDER BY doc_id""".stripMargin,
    // each noise template's canonical form stated as a closed form —
    // the kernel must recover it exactly on every row
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
    // same idf/tf saturation, ranked by the same rounded score
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
    // ordering must all match for the hash to hold
    "hybrid_rrf" ->
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
        |  GROUP BY 1),
        |lexr AS (
        |  SELECT doc_id, CAST(ROW_NUMBER() OVER (
        |    ORDER BY round(score, 6) DESC, doc_id) AS BIGINT) AS lex_rank
        |  FROM scored),
        |lexk AS (SELECT doc_id, lex_rank FROM lexr WHERE lex_rank <= 50),
        |qv AS (SELECT CAST(embedding AS DOUBLE[]) AS qvec FROM embeddings WHERE vec_id = 0),
        |vscored AS (
        |  SELECT vec_id AS doc_id,
        |    list_cosine_similarity(CAST(embedding AS DOUBLE[]), qvec) AS sim
        |  FROM embeddings CROSS JOIN qv WHERE vec_id <> 0),
        |vecr AS (SELECT doc_id, CAST(ROW_NUMBER() OVER (
        |    ORDER BY sim DESC, doc_id) AS BIGINT) AS vec_rank FROM vscored),
        |veck AS (SELECT doc_id, vec_rank FROM vecr WHERE vec_rank <= 50),
        |fused AS (
        |  SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id, l.lex_rank, v.vec_rank,
        |    round(COALESCE(CAST(1.0 AS DOUBLE) / (60 + l.lex_rank), 0) +
        |          COALESCE(CAST(1.0 AS DOUBLE) / (60 + v.vec_rank), 0), 9) AS rrf
        |  FROM lexk l FULL OUTER JOIN veck v ON l.doc_id = v.doc_id)
        |SELECT doc_id, lex_rank, vec_rank, rrf FROM fused
        |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin,
    // the batch twin: same leg arithmetic with query_id carried through
    // every CTE and per-query window ranks — one corpus pass for all
    // three queries on both sides
    "hybrid_rrf_batch" -> hybridBatchSql,
    // IVF leg in exact mode (nprobe = nlist) provably equals brute
    // force — same oracle; the machinery difference is all Spark-side
    "hybrid_rrf_ivf" -> hybridBatchSql,
    // identical RE2-safe BPE pre-tokenizer pattern replayed in DuckDB;
    // leftmost-first non-overlapping matching matches Java exactly
    "bpe_tokens" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '''(?:s|t|re|ve|m|ll|d)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+|\s+')) AS BIGINT) AS n_bpe_tokens,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
        |  CAST(len(regexp_extract_all(text, '''(?:s|t|re|ve|m|ll|d)| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+|\s+')) AS DOUBLE)
        |    / len(string_split(text, ' ')) AS bpe_per_word
        |FROM documents ORDER BY doc_id""".stripMargin,
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
    "fingerprint_dups" ->
      """SELECT md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fp_norm_md5,
        |  CAST(COUNT(*) AS BIGINT) AS n, MIN(doc_id) AS keep_id
        |FROM documents GROUP BY 1 ORDER BY fp_norm_md5""".stripMargin,
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
    "boilerplate_removal" ->
      """WITH blocklist AS (
        |  SELECT list(tok) AS bl FROM (
        |    SELECT tok FROM (
        |      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
        |      FROM documents) t
        |    GROUP BY tok
        |    HAVING COUNT(*) > (SELECT COUNT(*) * 6 // 10 FROM documents)) b)
        |SELECT doc_id,
        |  md5(COALESCE(array_to_string(list_filter(string_split(text, ' '),
        |    t -> NOT list_contains(bl, t)), ' '), '')) AS clean_hash
        |FROM documents CROSS JOIN blocklist ORDER BY doc_id""".stripMargin,
    "repetition_ratio" ->
      """SELECT doc_id,
        |  CAST(MAX(c) AS DOUBLE) / SUM(c) AS top_bigram_ratio
        |FROM (
        |  SELECT doc_id, bg, COUNT(*) AS c FROM (
        |    SELECT doc_id,
        |      unnest(list_transform(range(1, len(string_split(text, ' '))),
        |        i -> array_to_string(string_split(text, ' ')[i:i+1], ' '))) AS bg
        |    FROM documents) t
        |  GROUP BY doc_id, bg) g
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // Gopher A1.1 signals: the oracle recomputes every per-row array scan
    // through list-HOF SQL; each fraction is a ratio of exact integers so
    // the doubles are bit-identical across engines
    "gopher_quality" ->
      """WITH base AS (
        |  SELECT doc_id, text, string_split(text, ' ') AS w,
        |         string_split(text, chr(10)) AS lines,
        |         length(text) AS n_chars
        |  FROM documents),
        |sig AS (
        |  SELECT doc_id,
        |    CAST(len(w) AS BIGINT) AS n_tokens,
        |    CAST(n_chars - (len(w) - 1) AS DOUBLE) / len(w) AS mean_word_len,
        |    CAST(len(list_filter(w, t -> regexp_matches(t, '[A-Za-z]'))) AS DOUBLE) / len(w) AS alpha_word_frac,
        |    ((n_chars - length(replace(text, '#', ''))) + (n_chars - length(replace(text, '...', ''))) / 3) / len(w) AS symbol_ratio,
        |    CAST(len(list_intersect(list_distinct(w), ['the','be','to','of','and','that','have','with'])) AS BIGINT) AS stop_hits,
        |    CAST(len(lines) - len(list_distinct(lines)) AS DOUBLE) / len(lines) AS dup_line_frac,
        |    CASE WHEN list_aggregate(list_transform(lines, x -> length(x)), 'sum') > 0 THEN
        |      CAST(list_aggregate(list_transform(list_distinct(lines),
        |        d -> (len(list_filter(lines, x -> x = d)) - 1) * length(d)), 'sum') AS DOUBLE)
        |      / list_aggregate(list_transform(lines, x -> length(x)), 'sum')
        |    ELSE 0.0 END AS dup_line_char_frac,
        |    CAST(len(list_filter(lines, l -> regexp_matches(l, '^[-*•]'))) AS DOUBLE) / len(lines) AS bullet_line_frac,
        |    CAST(len(list_filter(lines, l -> regexp_matches(l, '(\.\.\.|…)$'))) AS DOUBLE) / len(lines) AS ellipsis_line_frac,
        |    CASE WHEN len(w) >= 2 THEN CAST(list_max(list_transform(
        |      list_distinct(list_transform(range(0, len(w) - 1), i -> array_to_string(w[(i+1):(i+2)], ' '))),
        |      d -> len(list_filter(list_transform(range(0, len(w) - 1), i -> array_to_string(w[(i+1):(i+2)], ' ')), x -> x = d)) * length(d))) AS DOUBLE) / n_chars ELSE 0.0 END AS top2gram_char_frac,
        |    CASE WHEN len(w) >= 3 THEN CAST(list_max(list_transform(
        |      list_distinct(list_transform(range(0, len(w) - 2), i -> array_to_string(w[(i+1):(i+3)], ' '))),
        |      d -> len(list_filter(list_transform(range(0, len(w) - 2), i -> array_to_string(w[(i+1):(i+3)], ' ')), x -> x = d)) * length(d))) AS DOUBLE) / n_chars ELSE 0.0 END AS top3gram_char_frac,
        |    CASE WHEN len(w) >= 4 THEN CAST(list_max(list_transform(
        |      list_distinct(list_transform(range(0, len(w) - 3), i -> array_to_string(w[(i+1):(i+4)], ' '))),
        |      d -> len(list_filter(list_transform(range(0, len(w) - 3), i -> array_to_string(w[(i+1):(i+4)], ' ')), x -> x = d)) * length(d))) AS DOUBLE) / n_chars ELSE 0.0 END AS top4gram_char_frac
        |  FROM base)
        |SELECT doc_id, n_tokens, mean_word_len, alpha_word_frac, symbol_ratio, stop_hits,
        |  dup_line_frac, dup_line_char_frac,
        |  top2gram_char_frac, top3gram_char_frac, top4gram_char_frac,
        |  (n_tokens BETWEEN 50 AND 100000 AND mean_word_len BETWEEN 3.0 AND 10.0
        |   AND symbol_ratio <= 0.1 AND bullet_line_frac <= 0.9 AND ellipsis_line_frac <= 0.3
        |   AND alpha_word_frac >= 0.8 AND stop_hits >= 2
        |   AND dup_line_frac <= 0.3 AND dup_line_char_frac <= 0.2
        |   AND top2gram_char_frac <= 0.2 AND top3gram_char_frac <= 0.18
        |   AND top4gram_char_frac <= 0.16) AS gopher_ok
        |FROM sig ORDER BY doc_id""".stripMargin,
    "sample_stratified" ->
      """WITH r AS (
        |  SELECT doc_id, lang,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY md5('mix1|' || CAST(doc_id AS VARCHAR)), doc_id) AS rk,
        |    COUNT(*) OVER (PARTITION BY lang) AS n
        |  FROM documents)
        |SELECT doc_id, lang, CAST(rk AS BIGINT) AS rk
        |FROM r
        |WHERE rk <= CEIL(n * (CASE lang
        |  WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.25 WHEN 'es' THEN 0.25
        |  WHEN 'fr' THEN 0.125 WHEN 'zh' THEN 0.375 ELSE 0.125 END))
        |ORDER BY doc_id""".stripMargin,
    // α=0.5 temperature quotas recomputed with the SAME float recipe:
    // correctly-rounded sqrt, weight total summed in stratum order (a
    // full-frame ordered window, not an unordered aggregate) -> the
    // floor() boundary matches Spark bit-for-bit
    "sample_temperature" ->
      """WITH c AS (SELECT lang, COUNT(*) AS n_s FROM documents GROUP BY lang),
        |w AS (SELECT lang, n_s, sqrt(CAST(n_s AS DOUBLE)) AS w FROM c),
        |t AS (SELECT lang, n_s, w, SUM(w) OVER (ORDER BY lang
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS tw FROM w),
        |q AS (SELECT lang, LEAST(n_s, CAST(FLOOR(2000 * w / tw) AS BIGINT)) AS quota FROM t),
        |r AS (
        |  SELECT doc_id, lang,
        |    ROW_NUMBER() OVER (PARTITION BY lang
        |      ORDER BY md5('temp|' || CAST(doc_id AS VARCHAR)), doc_id) AS rk
        |  FROM documents)
        |SELECT doc_id, lang, CAST(rk AS BIGINT) AS rk
        |FROM r JOIN q USING (lang) WHERE rk <= quota
        |ORDER BY doc_id""".stripMargin,
    "sample_hash" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE substr(md5('s|' || CAST(doc_id AS VARCHAR)), 1, 8) < '40000000'
        |ORDER BY doc_id""".stripMargin,
    // Streaming cleaning pipeline: quality filter → keyed dedup state →
    // complete-mode stats; the oracle is the batch-equivalent SQL (the
    // quality formulas match withQualityScore term-for-term)
    "quality_filter_stream" ->
      """WITH q AS (
        |  SELECT doc_id, text, lang,
        |    len(string_split(text, ' ')) AS n_tokens,
        |    CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
        |      / len(string_split(text, ' ')) AS mwl
        |  FROM documents),
        |f AS (SELECT * FROM q WHERE n_tokens >= 10 AND mwl BETWEEN 2.0 AND 12.0),
        |d AS (
        |  SELECT lang, md5(text) AS h, MIN(n_tokens) AS toks
        |  FROM f GROUP BY lang, md5(text))
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(toks) AS BIGINT) AS total_tokens
        |FROM d GROUP BY lang ORDER BY lang""".stripMargin,
    // Entropy: the kernel's H = round(ln n - (Σ c·round(ln c, 9))/n, 6)
    // recomputed as explode → histogram → exact decimal aggregate
    // the final `+ 0.0` folds IEEE -0.0 (uniform text rounds to a tiny
    // negative before round(,6)) to the kernel's +0.0; the LEFT JOIN
    // keeps empty-text (score 0.0) and NULL-text (score NULL) rows the
    // unnest would otherwise drop
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
    // NTILE terciles — identical definition in both engines
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
    // noise, top-100 by the noised key — replayed term-for-term.
    "dsir_sample" ->
      """WITH toks AS (
        |  SELECT doc_id, lang = 'en' AS tgt, string_split(text, ' ') AS w
        |  FROM documents),
        |ng AS (
        |  SELECT doc_id, tgt, unnest(w) AS ngram FROM toks
        |  UNION ALL
        |  SELECT doc_id, tgt,
        |    unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i + 1])) AS ngram
        |  FROM toks),
        |db AS (
        |  SELECT doc_id, tgt, substr(md5(ngram), 1, 3) AS b, COUNT(*) AS c
        |  FROM ng GROUP BY doc_id, tgt, b),
        |bt AS (
        |  SELECT b, SUM(CASE WHEN tgt THEN c ELSE 0 END) AS tgt_b, SUM(c) AS all_b
        |  FROM db GROUP BY b),
        |tot AS (SELECT SUM(tgt_b) AS tgt_tot, SUM(all_b) AS all_tot FROM bt),
        |wt AS (
        |  SELECT b,
        |    round(ln(CAST(tgt_b + 1 AS DOUBLE) / CAST(tgt_tot + 4096 AS DOUBLE))
        |        - ln(CAST(all_b + 1 AS DOUBLE) / CAST(all_tot + 4096 AS DOUBLE)), 9) AS lnw
        |  FROM bt CROSS JOIN tot),
        |lw AS (
        |  SELECT doc_id,
        |    CAST(SUM(CAST(c AS DECIMAL(10,0)) * CAST(lnw AS DECIMAL(12,9))) AS DOUBLE) AS lw
        |  FROM db JOIN wt USING (b) GROUP BY doc_id),
        |keyed AS (
        |  SELECT doc_id, round(lw, 6) AS lw_r,
        |    round(lw + round(-ln(-ln(
        |      (CAST(('0x' || substr(md5('dsir|' || CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) + 0.5)
        |        / 4294967296.0)), 9), 6) AS key_r
        |  FROM lw)
        |SELECT CAST(ROW_NUMBER() OVER (ORDER BY key_r DESC, doc_id) AS BIGINT) AS rank,
        |  doc_id, lw_r, key_r
        |FROM keyed ORDER BY key_r DESC, doc_id LIMIT 100""".stripMargin,
    "pii_redact" ->
      """WITH withpii AS (
        |  SELECT doc_id, text || ' contact admin' || CAST(doc_id AS VARCHAR)
        |    || '@corp.example.com from 10.0.' || CAST(doc_id % 256 AS VARCHAR)
        |    || '.7 call +1 555-' || lpad(CAST(doc_id AS VARCHAR), 4, '0') AS text
        |  FROM documents),
        |red AS (
        |  SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |    '\+\d{1,3}[- ]\d{3}[- ]?\d{4}', '<PHONE>', 'g') AS r
        |  FROM withpii)
        |SELECT doc_id, md5(r) AS red_hash,
        |  POSITION('<EMAIL>' IN r) > 0 AS has_email,
        |  POSITION('<IP>' IN r) > 0 AS has_ip,
        |  POSITION('<PHONE>' IN r) > 0 AS has_phone
        |FROM red ORDER BY doc_id""".stripMargin,
    "decontam" ->
      """WITH sh AS (
        |  SELECT DISTINCT doc_id, shingle FROM (
        |    SELECT doc_id,
        |      unnest(list_transform(range(1, len(string_split(text, ' ')) - 3),
        |        i -> array_to_string(string_split(text, ' ')[i:i+4], ' '))) AS shingle
        |    FROM documents) t),
        |ev AS (SELECT * FROM sh WHERE doc_id % 50 = 0),
        |co AS (SELECT * FROM sh WHERE doc_id % 50 != 0)
        |SELECT co.doc_id,
        |  CAST(COUNT(DISTINCT co.shingle) AS BIGINT) AS n_shared,
        |  CAST(COUNT(DISTINCT ev.doc_id) AS BIGINT) AS n_eval_docs
        |FROM co JOIN ev ON co.shingle = ev.shingle
        |GROUP BY co.doc_id ORDER BY co.doc_id""".stripMargin,
    // C4-style span dedup: first corpus occurrence survives, docs
    // reassembled — the oracle rebuilds the exact clean string
    "line_dedup" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |spans AS (
        |  SELECT doc_id, i AS span_idx,
        |    array_to_string(w[(i*5+1):(i*5+5)], ' ') AS span
        |  FROM words, UNNEST(range(0, CAST(ceil(len(w)/5.0) AS BIGINT))) AS t(i)),
        |ranked AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY span ORDER BY doc_id, span_idx) AS rn,
        |    COUNT(*) OVER (PARTITION BY doc_id) AS total
        |  FROM spans)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
        |  CAST(ANY_VALUE(total) - COUNT(*) AS BIGINT) AS n_dropped,
        |  md5(string_agg(span, ' ' ORDER BY span_idx)) AS clean_hash
        |FROM ranked WHERE rn = 1
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // overlapping-window substring dedup: the oracle marks covered token
    // positions with a correlated range EXISTS over the dup-window starts
    // (the Spark side replaces that range join with one ordered window
    // pass); windows keyed by string here, by 64-bit hash there
    "substring_dedup" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |wins AS (
        |  SELECT doc_id, i AS pos, array_to_string(w[(i+1):(i+10)], ' ') AS win
        |  FROM words, UNNEST(range(0, GREATEST(len(w) - 9, 0))) AS t(i)),
        |dups AS (
        |  SELECT doc_id, pos FROM (
        |    SELECT doc_id, pos,
        |      ROW_NUMBER() OVER (PARTITION BY win ORDER BY doc_id, pos) AS rn
        |    FROM wins) r WHERE rn > 1),
        |toks AS (
        |  SELECT doc_id, j AS tpos, w[j+1] AS tok, len(w) AS n_total
        |  FROM words, UNNEST(range(0, len(w))) AS t(j)),
        |kept AS (
        |  SELECT t.* FROM toks t WHERE NOT EXISTS (
        |    SELECT 1 FROM dups d WHERE d.doc_id = t.doc_id
        |      AND d.pos <= t.tpos AND t.tpos < d.pos + 10))
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
        |  CAST(ANY_VALUE(n_total) - COUNT(*) AS BIGINT) AS n_dropped,
        |  md5(string_agg(tok, ' ' ORDER BY tpos)) AS clean_hash
        |FROM kept GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // int8 quantization: scale/code arithmetic replayed element-wise;
    // round-half-away spelled as sign·floor(|x|/scale + 0.5) so both
    // engines compute identical doubles
    "vec_quantize" ->
      """WITH q AS (
        |  SELECT vec_id, embedding,
        |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
        |  FROM embeddings),
        |c AS (
        |  SELECT vec_id, embedding, scale,
        |    CASE WHEN scale = 0 THEN list_transform(embedding, x -> CAST(0 AS BIGINT))
        |    ELSE list_transform(embedding, x ->
        |      CAST(sign(CAST(x AS DOUBLE)) * floor(abs(CAST(x AS DOUBLE)) / scale + 0.5) AS BIGINT))
        |    END AS codes
        |  FROM q)
        |SELECT vec_id, CAST(len(codes) AS BIGINT) AS n_dims,
        |  CAST(list_aggregate(codes, 'sum') AS BIGINT) AS code_sum,
        |  (list_max(list_transform(range(1, len(embedding) + 1),
        |     i -> abs(CAST(embedding[i] AS DOUBLE) - codes[i] * scale)))
        |   <= scale * 0.5000001) AS err_ok
        |FROM c ORDER BY vec_id""".stripMargin,
    // chunking: stride arithmetic replayed, chunk strings rebuilt; chunk
    // i covers tokens [i*24, i*24 + 32) (stride = 32 - 8)
    "doc_chunks" ->
      """WITH words AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |counted AS (
        |  SELECT doc_id, w, CASE WHEN len(w) <= 32 THEN 1
        |    ELSE 1 + CAST(ceil((len(w) - 32) / 24.0) AS BIGINT) END AS n_chunks
        |  FROM words)
        |SELECT doc_id, i AS chunk_idx,
        |  CAST(len(w[(i*24+1):(i*24+32)]) AS BIGINT) AS n_chunk_tokens,
        |  md5(array_to_string(w[(i*24+1):(i*24+32)], ' ')) AS chunk_hash
        |FROM counted, UNNEST(range(0, n_chunks)) AS t(i)
        |ORDER BY doc_id, chunk_idx""".stripMargin,
    // the bloom pre-filter is result-neutral by construction — same truth
    "decontam_bloom" ->
      """WITH sh AS (
        |  SELECT DISTINCT doc_id, shingle FROM (
        |    SELECT doc_id,
        |      unnest(list_transform(range(1, len(string_split(text, ' ')) - 3),
        |        i -> array_to_string(string_split(text, ' ')[i:i+4], ' '))) AS shingle
        |    FROM documents) t),
        |ev AS (SELECT * FROM sh WHERE doc_id % 50 = 0),
        |co AS (SELECT * FROM sh WHERE doc_id % 50 != 0)
        |SELECT co.doc_id,
        |  CAST(COUNT(DISTINCT co.shingle) AS BIGINT) AS n_shared,
        |  CAST(COUNT(DISTINCT ev.doc_id) AS BIGINT) AS n_eval_docs
        |FROM co JOIN ev ON co.shingle = ev.shingle
        |GROUP BY co.doc_id ORDER BY co.doc_id""".stripMargin,
    "shard_pack" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT lang, n_tokens,
        |    COALESCE(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
        |  FROM t)
        |SELECT lang, CAST(prior // 1000 AS BIGINT) AS shard_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "seq_pack" ->
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
    // the stream packs three id-range slices continuing the persisted
    // offset — on id-ordered arrival the result IS the batch rule, so
    // the oracle is the identical concat-and-chunk SQL
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
    // the md5-order exclusive-cumsum prefix — all replayed verbatim
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
    // md5(salt||id||'#'||copy) order, then the seq_pack span rule
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
    // boundary (unweighted langs: need 0, never admitted)
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
    // seq_pack concat-and-chunk rule over the ADMITTED corpus
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
        |ORDER BY doc_id, seq_id""".stripMargin,
    "pipeline_clean_corpus" ->
      """WITH quality AS (
        |  SELECT doc_id, text, lang FROM documents
        |  WHERE len(string_split(text, ' ')) >= 10
        |    AND CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
        |      / len(string_split(text, ' ')) BETWEEN 2.0 AND 12.0),
        |exact_deduped AS (
        |  SELECT doc_id, text, lang FROM (
        |    SELECT doc_id, text, lang,
        |      ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        |    FROM quality) t WHERE rn = 1),
        |sh AS (
        |  SELECT DISTINCT doc_id, shingle FROM (
        |    SELECT doc_id,
        |      unnest(list_transform(range(1, len(string_split(text, ' ')) - 3),
        |        i -> array_to_string(string_split(text, ' ')[i:i+4], ' '))) AS shingle
        |    FROM exact_deduped) t),
        |cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |near_dups AS (
        |  SELECT DISTINCT id_b AS doc_id FROM pairs
        |  JOIN cnt ca ON ca.doc_id = id_a JOIN cnt cb ON cb.doc_id = id_b
        |  WHERE CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter) >= 0.8),
        |clean AS (
        |  SELECT * FROM exact_deduped
        |  WHERE doc_id NOT IN (SELECT doc_id FROM near_dups))
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
        |FROM clean GROUP BY lang ORDER BY lang""".stripMargin,
    "ann_bruteforce" -> annBruteSql,
    // IVF in exact mode (nprobe = nlist) provably equals brute force —
    // same oracle; the machinery difference is all on the Spark side.
    "ann_ivf" -> annBruteSql,
    "ann_ivf_indexed" -> annBruteSql,
    // PQ certificate: candidate count is exact (20 queries × top-10) and
    // the recall bound is always-true for a working quantizer (3× margin
    // below measurement, ≥20× above chance on the uniform fixture)
    "pq_recall" ->
      "SELECT CAST(200 AS BIGINT) AS n_exact, TRUE AS recall_ok",
    // pruned-IVF hybrid certificate: candidate count is exact (3 queries
    // × fused top-10) and the recall bound holds with a wide margin
    // (measured 0.63–0.70 vs the 0.4 floor on the uniform fixture)
    "hybrid_rrf_pruned" ->
      "SELECT CAST(30 AS BIGINT) AS n_exact, TRUE AS recall_ok",
    "minhash_lsh" -> jaccardBruteSql("0.8"),
    "simhash_pairs" -> jaccardBruteSql("0.9"),
    // Same ≥0.8 exact-Jaccard pair graph as minhash_lsh, closed
    // transitively with a recursive CTE — the truth set for the
    // large-star/small-star connected-components path.
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
    // thresholds floor(0.8·2^32)=cccccccc / floor(0.9·2^32)=e6666666
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
    // match and the larger-event_id tie-break.
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
    // mirrored probe: earliest at-or-after, SMALLER event_id tie-break
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
    // keep rule = lowest round(cos-to-centroid, 6), id ties.
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
    // kept, mirroring the operator's eligibility bypass.
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
    // round(cosine, 6) >= 0.3.
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
    // exact survivors; aggregated per language like the batch capstone.
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
    // shingle construction as the batch decontam row.
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
    // ANY eval doc, arrival order erased.
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
    // (simc asc, id asc) within cluster, kept iff rank <= ceil(0.5 * n).
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
    // md5(cb|id) per-cluster rank capped at 8.
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
    // synthesized spec-valid PNG/JPEG/GIF/WAV bytes on every row.
    "multimodal_pipeline" ->
      """WITH m AS (
        |  SELECT doc_id, doc_id % 6 AS k,
        |    CAST(64 + (doc_id % 512) AS INT) AS w,
        |    CAST(64 + ((doc_id * 7) % 512) AS INT) AS h,
        |    CAST(1 + (doc_id % 2) AS INT) AS wav_ch,
        |    8000 + (doc_id % 100) * 16 AS wav_data,
        |    list_extract([32,40,48,56,64,80,96,112,128,160,192,224,256,320],
        |      CAST(1 + (doc_id % 14) AS INT)) AS kbps,
        |    2000 + (doc_id % 50) * 100 AS mp3_bytes,
        |    30000 + (doc_id % 100) * 500 AS mp4_dur
        |  FROM documents)
        |SELECT doc_id,
        |  CASE k WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' WHEN 2 THEN 'gif'
        |         WHEN 3 THEN 'wav' WHEN 4 THEN 'mp3' ELSE 'mp4' END AS format,
        |  CASE WHEN k < 3 OR k = 5 THEN w END AS width,
        |  CASE WHEN k < 3 OR k = 5 THEN h END AS height,
        |  CASE WHEN k < 3 OR k = 5 THEN CAST(3 AS INT) WHEN k = 3 THEN wav_ch
        |       ELSE CAST(CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 1 END AS INT) END AS n_channels,
        |  CAST(CASE WHEN k < 3 THEN 0
        |            WHEN k = 3 THEN (wav_data * 1000) // (8000 * wav_ch * 2)
        |            WHEN k = 4 THEN (mp3_bytes * 8) // kbps
        |            ELSE mp4_dur END AS BIGINT) AS duration_ms,
        |  CASE WHEN k < 3 OR k = 5 THEN CAST(floor(w * least(CAST(1 AS DOUBLE), CAST(256 AS DOUBLE) / greatest(w, h))) AS INT) END AS target_width
        |FROM m ORDER BY doc_id""".stripMargin
    // Every registered query has an oracle. The similarity tier is
    // checked by reproducing LSH bucketing in SQL (murmur3 hyperplanes)
    // or by brute-forcing the exact-verified truth set; multimodal by
    // inverting the fixture formulas; hll_cardinality by a self-checking
    // error-bound certificate beside exact counts.
  )
}
