package graft.log

import graft.model.TopicName
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Topic catalog over the log root — the namespace/topic discovery surface
 * (reference NamespaceService lookup + `CommandWatchTopicList`
 * PulsarApi.proto:794 for regex subscriptions).
 *
 * Layout convention: `<root>/<tenant>/<namespace>/<topic>/partition=i/`.
 * Discovery is a directory walk through [[PathIO]] (the metadata-store
 * read — depth-bounded, one listing RPC per directory); regex
 * subscribe re-resolves per call — call again per microbatch for the
 * reference's dynamic topic discovery.
 */
object Topics {

  /** All topics under the root, as fully-qualified names. */
  def list(root: String): Seq[TopicName] = {
    val rootPath = PathIO.path(root)
    if (!PathIO.exists(rootPath)) return Seq.empty
    def dirs(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] =
      PathIO.listStatusSeq(p).filter(_.isDirectory).map(_.getPath)
        .filterNot(_.getName.startsWith("_"))
    (for {
      tenant <- dirs(rootPath)
      ns <- dirs(tenant)
      topic <- dirs(ns)
    } yield TopicName("persistent", tenant.getName, ns.getName, topic.getName))
      .sortBy(_.fqn)
  }

  /** Topics in a namespace whose topic name matches `pattern` (the
    * `ConsumerBuilder.topicsPattern` regex subscribe). */
  def listMatching(root: String, tenant: String, namespace: String,
                   pattern: String): Seq[TopicName] = {
    val re = pattern.r
    list(root).filter(t => t.tenant == tenant && t.namespace == namespace &&
      re.pattern.matcher(t.topic).matches())
  }

  /**
   * Multi-topic / regex subscribe as one DataFrame: bag union of every
   * matching topic's committed log (per-topic order preserved within
   * partitions; no dedup — exactly the reference's multi-topic consumer).
   */
  def subscribePattern(spark: SparkSession, root: String, tenant: String,
                       namespace: String, pattern: String,
                       numPartitions: Int = 4): DataFrame = {
    val matching = listMatching(root, tenant, namespace, pattern)
    // an empty match set is a LEGAL subscription state (the reference's
    // pattern consumer starts against an empty namespace and waits for
    // the watcher to announce topics) — it reads as an empty envelope
    // frame, not an error; graft.streaming.PatternSubscription is the
    // dynamic-discovery (re-resolving) form of this one-shot resolve
    if (matching.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        graft.model.Envelope.schema)
    else matching.map(t => new TopicLog(spark, root, t, numPartitions).read())
      .reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Create a partitioned topic (metadata only — data dirs appear on
    * first append). Reference Topics.createPartitionedTopic. */
  def createPartitioned(root: String, name: TopicName, partitions: Int): Unit = {
    val meta = PathIO.path(name.path(root), "_meta")
    PathIO.mkdirs(meta)
    PathIO.writeString(PathIO.child(meta, "partitions"), partitions.toString)
  }

  def partitionCount(root: String, name: TopicName): Option[Int] = {
    val f = PathIO.path(name.path(root), "_meta", "partitions")
    if (PathIO.exists(f)) Some(PathIO.readString(f).trim.toInt) else None
  }
}
