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

  // Sidecar carrying the index schema (underscore-prefixed → invisible to
  // Spark's file listing). A topic with zero pending delayed rows writes an
  // index dir with no parquet part files; without a recorded schema the
  // trigger-path read would throw "Unable to infer schema" — a legitimate,
  // common state that must read as empty, not crash.
  private val SchemaSidecar = "_index_schema.json"

  /** Write the delayed subset of `log` into the bucketed index dir.
    * Rows are repartitioned BY the bucket first: without it every task
    * opens a writer for every bucket it sees (tasks × buckets tiny
    * files); with it each bucket is one task's single file. */
  def buildIndex(log: DataFrame, indexPath: String): Unit = {
    log.filter(col(Envelope.DeliverAt).isNotNull)
      .withColumn("due_bucket", bucketOf(col(Envelope.DeliverAt)))
      .repartition(col("due_bucket"))
      .write.mode("overwrite")
      .partitionBy("due_bucket")
      .parquet(indexPath)
    val schema = log.schema.add("due_bucket", org.apache.spark.sql.types.StringType)
    val conf = log.sparkSession.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(indexPath, SchemaSidecar)
    val tmp = new org.apache.hadoop.fs.Path(indexPath, SchemaSidecar + ".tmp")
    val fs = p.getFileSystem(conf)
    // write-then-rename (the manifest-commit pattern): a crash mid-write
    // must never leave a truncated sidecar that breaks every later dueAt
    val out = fs.create(tmp, true)
    try out.write(schema.json.getBytes("UTF-8")) finally out.close()
    fs.delete(p, false)
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"could not publish $p")
  }

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
    val reader = readSchema(spark, indexPath) match {
      case Some(s) => spark.read.schema(s) // empty index reads as empty DF
      case None    => spark.read           // pre-sidecar index: infer
    }
    reader.parquet(indexPath)
      .filter(col("due_bucket") <= bucket)          // partition-pruned
      .filter(col(Envelope.DeliverAt) <= lit(t))    // row-level residual
  }

  private def readSchema(spark: SparkSession,
                         indexPath: String): Option[org.apache.spark.sql.types.StructType] = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(indexPath, SchemaSidecar)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val json = try {
        val bos = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 8192, false)
        bos.toString("UTF-8")
      } finally in.close()
      Some(org.apache.spark.sql.types.DataType.fromJson(json)
        .asInstanceOf[org.apache.spark.sql.types.StructType])
    }
  }
}
