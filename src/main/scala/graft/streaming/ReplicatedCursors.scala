package graft.streaming

import graft.model.Envelope
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Replicated-subscription cursor travel (reference
 * pulsar-broker/src/main/java/org/apache/pulsar/broker/service/persistent/
 * ReplicatedSubscriptionsController.java): a subscription consumed against
 * one cluster resumes on a replica at an equivalent position.
 *
 * The reference flow: the controller periodically builds a SNAPSHOT — a
 * marker round-trip that associates each cluster with a position forming
 * a consistent cut (ReplicatedSubscriptionsSnapshotBuilder) — and when a
 * local cursor's markDelete passes a snapshot's local position it
 * replicates a SubscriptionUpdate marker; the remote cluster cumulatively
 * acks its own subscription to the snapshot's position for that cluster
 * (ReplicatedSubscriptionsController.java:185-219, creating the
 * subscription if absent).
 *
 * Spark-first mapping: clusters here are topic logs whose rows carry the
 * stable identity `(producer_name, sequence_id)` — the same key §2.8
 * dedup and the replicator loop filter already rely on — so the position
 * association the reference buys with marker round-trips is a JOIN:
 *
 *  - [[snapshot]] = the consistent cut: per partition, the pair of
 *    (local position, remote position) such that every local row at or
 *    below the local position exists on the replica. `None` when
 *    replication hasn't caught up — the reference's timed-out /
 *    not-ready snapshot (ReplicatedSubscriptionsSnapshotBuilder
 *    isTimedOut).
 *  - [[translateCursor]] = receiveSubscriptionUpdated: map a local
 *    cursor (per-partition markDelete offsets) to remote per-partition
 *    positions, PREFIX-CLOSED on the remote log: the returned position
 *    for a remote partition is the highest remote offset below which
 *    every remote row is locally acked. Cumulative-ack semantics are
 *    therefore safe even if replication interleaved rows differently:
 *    nothing unacked is ever skipped (no loss); acked rows above a gap
 *    re-deliver (the reference's own at-least-once envelope).
 *
 * Scale shape: one hash join on (producer_name, sequence_id) + one
 * window per partition over the remote log — no driver-side row loops;
 * the returned cursor is one row per partition.
 */
object ReplicatedCursors {

  private val IdCols = Seq(Envelope.ProducerName, Envelope.SequenceId)

  /**
   * Consistent-cut snapshot across the two logs: `Some((localPositions,
   * remotePositions))` when every committed local row exists on the
   * replica (matched on the stable identity), else `None` — replication
   * is still draining and the snapshot must be retried, exactly the
   * pending-snapshot behavior of the reference controller.
   */
  def snapshot(local: DataFrame, remote: DataFrame)
      : Option[(Map[Int, Long], Map[Int, Long])] = {
    val missing = local.select(IdCols.map(col): _*)
      .join(remote.select(IdCols.map(col): _*), IdCols, "left_anti")
    if (!missing.isEmpty) None
    else {
      def tops(df: DataFrame): Map[Int, Long] =
        df.groupBy(Envelope.Partition).agg(max(Envelope.Offset).as("hi"))
          .collect() // bounded: one row per partition
          .map(r => r.getInt(0) -> r.getLong(1)).toMap
      Some((tops(local), tops(remote)))
    }
  }

  /**
   * Translate a local cursor into remote per-partition resume positions
   * (the SubscriptionUpdate application). `localCursor` is the local
   * markDelete per partition (a partition absent from the map has
   * consumed nothing). Returns the remote markDelete per partition —
   * resume the replica subscription with `offset > returned(partition)`
   * ([[applyCursor]]); remote partitions whose first row is already
   * unacked are absent from the map (resume from the beginning).
   */
  def translateCursor(local: DataFrame, remote: DataFrame,
                      localCursor: Map[Int, Long]): Map[Int, Long] = {
    if (localCursor.isEmpty) return Map.empty
    val ackedFilter = localCursor.map { case (p, o) =>
      (col(Envelope.Partition) === p) && (col(Envelope.Offset) <= o)
    }.reduce(_ || _)
    val acked = local.filter(ackedFilter)
      .select(IdCols.map(col): _*).distinct()
    // flag each remote row acked/unacked, then keep the longest per-
    // partition prefix (by remote offset) that is entirely acked — the
    // highest position cumulative ack may advance to without skipping
    // an unacked row
    val w = Window.partitionBy(Envelope.Partition).orderBy(Envelope.Offset)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    remote.select((Seq(Envelope.Partition, Envelope.Offset) ++ IdCols)
        .map(col): _*)
      .join(acked.withColumn("_acked", lit(1)), IdCols, "left_outer")
      .withColumn("_prefix_ok", min(coalesce(col("_acked"), lit(0))).over(w))
      .filter(col("_prefix_ok") === 1)
      .groupBy(Envelope.Partition).agg(max(Envelope.Offset).as("mark_delete"))
      .collect() // bounded: one row per partition
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
  }

  /** Resume view of the replica: rows above the translated cursor —
    * what a subscription created by receiveSubscriptionUpdated reads. */
  def applyCursor(remote: DataFrame, cursor: Map[Int, Long]): DataFrame =
    if (cursor.isEmpty) remote
    else remote.filter(cursor.map { case (p, o) =>
      (col(Envelope.Partition) === p) && (col(Envelope.Offset) <= o)
    }.reduce(_ || _) === false)
}
