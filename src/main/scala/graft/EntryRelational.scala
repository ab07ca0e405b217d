package graft

import graft.model.Envelope
import graft.operators.{AsOfJoin, Compaction, Dedup, Dispatch, Produce, Windows}
import graft.ext.{Graph, MinHash, TextOps, VectorOps}
import graft.functions.Murmur3Pulsar

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TPC-H-style relational surface (SURVEY §2.16): joins, aggregates, windows, rollup/cube.
  *
  * One domain slice of the driver-contract registry: `queries` holds
  * this domain's `SparkEntry.queries` entries, `oracleSql` the
  * matching DuckDB oracles; [[SparkEntry]] concatenates the slices.
  * Split from the former single-file registry for hygiene — no
  * behavior change, same 161 keys. Shared helpers and oracle CTE
  * fragments live in [[EntryShared]]. */
private[graft] object EntryRelational {
  import EntryShared._

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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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
    "q_cube" -> (qCube _)
  )

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
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin
  )
}
