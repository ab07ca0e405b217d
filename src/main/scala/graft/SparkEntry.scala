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
  import EntryShared.dec

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

  /** The driver-contract registry: concatenation of the per-domain
    * slices (the registry was one 5600-line object through round 14;
    * the split is hygiene only — identical keys, identical plans). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    EntryRelational.queries ++ EntryEnvelope.queries ++
      EntryAdmin.queries ++ EntryText.queries ++ EntryComposition.queries

  def oracleSql: Map[String, String] =
    EntryRelational.oracleSql ++ EntryEnvelope.oracleSql ++
      EntryAdmin.oracleSql ++ EntryText.oracleSql ++
      EntryComposition.oracleSql

  /** Forwarder kept for external callers (tests) of the shared
    * guarded-drain helper. */
  private[graft] def drainGuarded(s: SparkSession,
      q: org.apache.spark.sql.streaming.StreamingQuery): Unit =
    EntryShared.drainGuarded(s, q)
}
