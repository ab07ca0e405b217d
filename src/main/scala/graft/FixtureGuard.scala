package graft

import org.apache.spark.sql.SparkSession

/**
 * Fail-fast guard against driver-side fixture regeneration (VERDICT r7
 * #2): the driver regenerates `/root/testdata` between rounds and has
 * changed column types before (round 7 opened with `ts` silently moving
 * from int64-nanos to timestamp[us], costing the opening turns of the
 * session to diagnosis). This pins the schema every query in
 * [[SparkEntry]] assumes, so a regeneration with a NEW schema surfaces
 * as one clear message at session start (FixtureGuardSpec, first suite
 * alphabetically close to the top) instead of as scattered analysis
 * errors — and [[Bench]] embeds the observed schemas + file mtimes in
 * its JSON line so a bench regression can be checked against a fixture
 * change after the fact.
 */
object FixtureGuard {
  /** Expected Spark schema (simpleString) per fixture table. */
  val expected: Map[String, String] = Map(
    "customer" -> "struct<c_custkey:bigint,c_name:string,c_nationkey:int,c_acctbal:double,c_mktsegment:string>",
    "documents" -> "struct<doc_id:bigint,text:string,lang:string,source:string,n_chars:bigint>",
    "embeddings" -> "struct<vec_id:bigint,embedding:array<float>,label:int>",
    "events" -> "struct<event_id:bigint,ts:timestamp_ntz,user_id:bigint,event_type:string,value:double,props:string>",
    "lineitem" -> "struct<l_orderkey:bigint,l_partkey:bigint,l_suppkey:bigint,l_linenumber:int,l_quantity:double,l_extendedprice:double,l_discount:double,l_tax:double,l_returnflag:string,l_linestatus:string,l_shipdate:timestamp_ntz>",
    "nation" -> "struct<n_nationkey:int,n_name:string,n_regionkey:int>",
    "orders" -> "struct<o_orderkey:bigint,o_custkey:bigint,o_orderstatus:string,o_totalprice:double,o_orderdate:timestamp_ntz,o_orderpriority:string>",
    "part" -> "struct<p_partkey:bigint,p_name:string,p_brand:string,p_type:string,p_size:int,p_retailprice:double>",
    "region" -> "struct<r_regionkey:int,r_name:string>",
    "supplier" -> "struct<s_suppkey:bigint,s_name:string,s_nationkey:int,s_acctbal:double>")

  /** Observed (table → (mtimeMillis, schemaSimpleString)) for every
    * fixture parquet present in `sfDir`. */
  def observe(spark: SparkSession, sfDir: String): Map[String, (Long, String)] = {
    val dir = new java.io.File(sfDir)
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      .map { f =>
        val table = f.getName.stripSuffix(".parquet")
        val schema =
          try spark.read.parquet(f.getPath).schema.simpleString
          catch { case e: Throwable => s"UNREADABLE(${e.getClass.getSimpleName})" }
        table -> (f.lastModified(), schema)
      }.toMap
  }

  /** Mismatch lines ("table: expected ... got ..."); empty = fixtures
    * match the pinned contract. Tables absent from `expected` (a driver
    * ADDING a fixture) are reported too — new data is a signal, not an
    * error, but it should be seen. */
  def check(spark: SparkSession, sfDir: String): Seq[String] =
    check(observe(spark, sfDir))

  /** [[check]] against an already-observed fingerprint — callers that
    * also embed the observation ([[Bench]]) pass it here so the fixture
    * footers are read once, not twice. */
  def check(obs: Map[String, (Long, String)]): Seq[String] = {
    val wrong = expected.toSeq.sortBy(_._1).flatMap { case (table, want) =>
      obs.get(table) match {
        case None => Some(s"$table: MISSING from the fixture dir (expected $want)")
        case Some((_, got)) if got != want =>
          Some(s"$table: schema changed — expected $want, got $got")
        case _ => None
      }
    }
    val unexpected = (obs.keySet -- expected.keySet).toSeq.sorted
      .map(t => s"$t: NEW fixture table not in the pinned contract")
    wrong ++ unexpected
  }
}
