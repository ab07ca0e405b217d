package graft.operators

import graft.model.Envelope
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Bucketed delayed-delivery index — the scale path for §2.11.
 *
 * The naive due-check (`deliver_at <= T` over the whole log) is O(backlog)
 * per trigger; the reference hit the same wall in memory and moved to
 * hash-bucketed persistent segments (BucketDelayedDeliveryTracker.java:68).
 * Spark-first analog: delayed rows are laid out hive-partitioned by a
 * coarse due bucket (`due_bucket=yyyyMMddHH`); a trigger at time T reads
 * only buckets ≤ bucket(T) — partition pruning makes the due scan
 * O(due data), never O(backlog). Rows with no deliver_at dispatch
 * immediately and never enter the index.
 */
object DelayedBuckets {

  // Daily buckets by default: granularity trades pruning precision
  // against partition-directory count (the residual deliver_at filter
  // keeps results exact either way). Hourly ("yyyyMMddHH") suits dense
  // short-horizon backlogs; daily keeps file counts sane when delays
  // spread over months.
  private val BucketFmt = "yyyyMMdd"

  def bucketOf(c: org.apache.spark.sql.Column) = date_format(c, BucketFmt)

  /** Write the delayed subset of `log` into the bucketed index dir.
    * Rows are repartitioned BY the bucket first: without it every task
    * opens a writer for every bucket it sees (tasks × buckets tiny
    * files); with it each bucket is one task's single file. */
  def buildIndex(log: DataFrame, indexPath: String): Unit =
    log.filter(col(Envelope.DeliverAt).isNotNull)
      .withColumn("due_bucket", bucketOf(col(Envelope.DeliverAt)))
      .repartition(col("due_bucket"))
      .write.mode("overwrite")
      .partitionBy("due_bucket")
      .parquet(indexPath)

  /**
   * Due rows at trigger time `t`: the bucket predicate prunes partitions
   * (only buckets ≤ bucket(t) are read — verify `PartitionFilters` in the
   * scan); the residual `deliver_at <= t` handles the current bucket's
   * sub-hour boundary.
   */
  def dueAt(spark: SparkSession, indexPath: String,
            t: java.sql.Timestamp): DataFrame = {
    // compute the bucket label with the SAME expression + session timezone
    // used by buildIndex (a driver-side formatter with a different tz
    // would mislabel the horizon and silently never dispatch)
    val bucket = spark.range(1)
      .select(bucketOf(lit(t)).as("b")).head().getString(0)
    spark.read.parquet(indexPath)
      .filter(col("due_bucket") <= bucket)          // partition-pruned
      .filter(col(Envelope.DeliverAt) <= lit(t))    // row-level residual
  }
}
