package graft.log

import graft.model.{Envelope, TopicName}
import graft.streaming.{BatchReceivePolicy, Subscription, SubscriptionType}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Shadow topic: a read-only same-cluster replica view of a source topic
 * (reference `pulsar-broker/.../persistent/ShadowReplicator.java`;
 * shadow topics share the source topic's ledger data — here, the source
 * parquet log — while keeping their own topic name and an independent
 * subscription namespace).
 *
 * Spark mapping: zero data movement. The shadow "replicates" by reading
 * the source's committed manifest snapshot directly — every committed
 * source append is immediately visible through the shadow (the
 * reference's shadow replication lag collapses to zero because there is
 * no second ledger to copy into). Rows are relabeled with the shadow's
 * topic name, mirroring how shadow messages carry the shadow topic.
 *
 * Writes are rejected: the reference broker refuses producers on a
 * shadow topic (only the internal shadow replicator may write; with the
 * shared-storage mapping there is nothing to write at all).
 *
 * Subscriptions get their own cursor namespace under the SHADOW's
 * topic path, so a shadow subscription named "s" and a source
 * subscription named "s" advance independently.
 */
final class ShadowTopic(val source: TopicLog, val name: TopicName) {
  require(name.fqn != source.name.fqn,
    s"shadow topic must differ from its source: ${name.fqn}")

  /** Committed source rows, relabeled with the shadow topic name. */
  def read(): DataFrame =
    source.read().withColumn(Envelope.Topic, lit(name.fqn))

  /** Positioned scan over the shadow view. */
  def readFrom(partition: Int, fromOffset: Long): DataFrame =
    read().filter(col(Envelope.Partition) === partition &&
      col(Envelope.Offset) >= fromOffset)

  /** Producers are rejected on shadow topics. */
  def append(df: DataFrame): Long =
    throw new UnsupportedOperationException(
      s"${name.fqn} is a shadow topic (source ${source.name.fqn}); " +
        "producers are not allowed")

  /**
   * Subscription over the shadow: streams the SOURCE log (shared
   * storage) but checkpoints its cursor under the shadow topic's path —
   * the independent subscription namespace of the reference's shadow
   * topics.
   */
  def subscription(subName: String, subType: SubscriptionType,
                   checkpointRoot: String, numWorkers: Int = 4,
                   policy: BatchReceivePolicy = BatchReceivePolicy()): Subscription =
    new Subscription(source, subName, subType,
      s"$checkpointRoot/_shadow/${name.tenant}/${name.namespace}/${name.topic}",
      numWorkers, policy, topicOverride = Some(name.fqn))
}
