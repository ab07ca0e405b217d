package graft.operators

import graft.model.Envelope
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Topic compaction = last-value-per-key with tombstone removal; the
 * reference's one real aggregation pipeline.
 *
 * Behavioral spec: two-phase compactor, reference
 * pulsar-broker/.../compaction/AbstractTwoPhaseCompactor.java:60-136 —
 * phase one builds `latestForKey`, phase two copies only the latest entry
 * per key; a null/empty payload is a tombstone and removes the key.
 * Variants: PublishingOrderCompactor.java (latest by publish/offset order)
 * and EventTimeOrderCompactor.java (latest by event time).
 *
 * Spark-first: no two-phase scan needed — a single hash aggregation
 * `max_by(struct(*), orderKey)` gives latestForKey and the copy in one
 * distributed pass (map-side partial agg keeps shuffle ≈ |keys|, not
 * |log|, which is what makes this O(distinct keys) at 100 TB).
 */
object Compaction {

  /**
   * Latest row per key by the given ordering, tombstones removed.
   * Implemented with max_by over the full row struct so it stays a single
   * shuffle-reduced aggregate (no row_number window = no total sort).
   *
   * Strategy note: max_by on a struct buffer plans as SortAggregate (the
   * struct buffer isn't UnsafeRow-mutable), which is still the right call
   * at 100 TB — the partial aggregate emits ≤ one row per key per task,
   * so the SHUFFLE carries |keys| rows. The alternative (hash-agg
   * max(offset) then self-join the log on (key, offset)) would shuffle
   * the full log through the join; per-task sort CPU is the cheaper coin.
   * Mirrors the reference's phase-1/phase-2 trade
   * (AbstractTwoPhaseCompactor scans twice; we sort once).
   */
  def compact(log: DataFrame, keyCol: String, orderBy: Seq[Column],
              valueCol: String, retainNullKey: Boolean = false): DataFrame = {
    val ord = struct(orderBy: _*)
    // null-key messages are not compactable: the reference DROPS them by
    // default (ServiceConfiguration.java:3173 topicCompactionRetainNullKey
    // = false) or passes them through UNCOMPACTED when retaining
    // (AbstractTwoPhaseCompactor.java:253) — never last-one-per-null-group,
    // which is what a bare groupBy would do
    val keyed = log.filter(col(keyCol).isNotNull)
    val latest = keyed
      .groupBy(col(keyCol))
      .agg(max_by(struct(log.columns.map(col): _*), ord).as("_latest"))
      .select(col(keyCol) +: log.columns.filterNot(_ == keyCol)
        .map(c => col(s"_latest.$c").as(c)): _*)
    val compacted = latest.filter(col(valueCol).isNotNull) // tombstone removal
    if (retainNullKey) compacted.unionByName(log.filter(col(keyCol).isNull))
    else compacted
  }

  /** Publish-order compaction (PublishingOrderCompactor): latest by offset. */
  def publishOrder(log: DataFrame): DataFrame =
    compact(log, Envelope.Key, Seq(col(Envelope.Offset)), Envelope.Value)

  /**
   * Event-time-order compaction (EventTimeOrderCompactor.java:158): latest
   * by (event_time, offset) — offset tie-breaks equal event times, matching
   * the reference's "newer than" comparison falling back to message id.
   */
  def eventTimeOrder(log: DataFrame): DataFrame =
    compact(log, Envelope.Key,
      Seq(col(Envelope.EventTime), col(Envelope.Offset)), Envelope.Value)

  /**
   * Strategic compaction (reference StrategicTwoPhaseCompactor.java:62
   * with a pluggable TopicCompactionStrategy — "should this message
   * replace the current latest for its key?"): any total-order strategy
   * expressible as a sort key keeps the same single-aggregation plan.
   * E.g. `Seq(col("metric_value"), col(Envelope.Offset))` keeps the
   * max-valued message per key (offset tie-break).
   */
  def strategic(log: DataFrame, strategyOrder: Seq[Column]): DataFrame =
    compact(log, Envelope.Key, strategyOrder, Envelope.Value)

  /**
   * TableView batch snapshot (reference TableView.java:28-146,
   * TableViewImpl.java:206 `handleMessage` keeps last value per key,
   * removing the key on null payload): identical to publish-order
   * compaction but exposed as a (key, value) map view.
   */
  def tableView(log: DataFrame, keyCol: String = Envelope.Key,
                valueCol: String = Envelope.Value): DataFrame =
    compact(log, keyCol, Seq(col(Envelope.Offset)), valueCol)
      .select(col(keyCol), col(valueCol))

  /**
   * readCompacted consumer view (CompactedTopicImpl.java): compacted
   * snapshot up to `horizon` unioned with the uncompacted tail after it.
   */
  def readCompacted(log: DataFrame, horizon: Long): DataFrame = {
    val snapshot = publishOrder(log.filter(col(Envelope.Offset) <= horizon))
    val tail = log.filter(col(Envelope.Offset) > horizon)
    snapshot.unionByName(tail)
  }

  /**
   * Admin triggerCompaction (reference Topics.triggerCompaction:2066 →
   * the two-phase compactor writing a compacted ledger): materialize the
   * compacted snapshot to `<topic>/_compacted/` with the horizon offset
   * recorded, so readCompacted consumers read the snapshot file + tail
   * instead of recompacting. Returns the horizon.
   */
  def triggerCompaction(log: graft.log.TopicLog): Map[Int, Long] = {
    // horizon is PER PARTITION — offsets (like the reference's MessageIds)
    // only order within a partition. Snapshot it FIRST and bound the scan
    // by it: a commit landing between "read" and "record horizon" would
    // otherwise fall into neither snapshot nor tail.
    val horizon = log.highWater()
    if (horizon.isEmpty) return Map.empty
    // tiered scan: rows at or below the horizon may have been OFFLOADED
    // to cold storage (Admin.offload) — a hot-only scan would silently
    // compact without them, and the snapshot would lose keys whose last
    // write sits in a cold file (the offloaded-but-compacted overlap).
    // readTiered == read() when no _cold dir exists.
    val data = graft.log.Admin.readTiered(log).filter(horizon.map { case (p, o) =>
      (col(Envelope.Partition) === p) && (col(Envelope.Offset) <= o)
    }.reduce(_ || _))
    val outDir = log.name.path(log.root) + "/_compacted"
    publishOrder(data).write.mode("overwrite").parquet(outDir)
    graft.log.PathIO.writeString(
      graft.log.PathIO.path(outDir, "_horizon"),
      horizon.map { case (p, o) => s"$p,$o" }.mkString("\n"))
    horizon
  }

  /** Consumer with readCompacted=true against a materialized snapshot:
    * snapshot files + uncompacted tail past the recorded per-partition
    * horizon. */
  def readCompactedTopic(log: graft.log.TopicLog): DataFrame = {
    val outDir = log.name.path(log.root) + "/_compacted"
    val horizonFile = graft.log.PathIO.path(outDir, "_horizon")
    require(graft.log.PathIO.exists(horizonFile),
      "no compacted snapshot — run triggerCompaction first")
    val horizon = graft.log.PathIO.readString(horizonFile).trim
      .split("\n").filter(_.nonEmpty)
      .map { l => val Array(p, o) = l.split(","); p.toInt -> o.toLong }.toMap
    val snapshot = log.spark.read.parquet(outDir)
    val pastHorizon = horizon.map { case (p, o) =>
      (col(Envelope.Partition) === p) && (col(Envelope.Offset) > o)
    }.reduce(_ || _) ||
      !col(Envelope.Partition).isin(horizon.keys.toSeq: _*)
    // tiered tail: offload can run between compaction and this read;
    // cold rows at or below the horizon are filtered out either way.
    // allowMissingColumns: an EMPTY hot tier reads back with the full
    // envelope schema while parquet-backed sides carry the appended
    // columns — the union must tolerate either side being wider
    val tail = graft.log.Admin.readTiered(log).filter(pastHorizon)
    snapshot.unionByName(tail, allowMissingColumns = true)
  }
}
