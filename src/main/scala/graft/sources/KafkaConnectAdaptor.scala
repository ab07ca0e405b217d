package graft.sources

import graft.log.TopicLog
import graft.model.Envelope
import graft.operators.Compaction

import org.apache.spark.sql.functions._

/**
 * Kafka Connect adaptor (reference `pulsar-io/kafka-connect-adaptor/`):
 * runs Connect-style source tasks against the topic log, mirroring the
 * three load-bearing semantics of the reference without any Kafka jars:
 *
 *  - **Offset backing store in a compacted topic**
 *    (`PulsarOffsetBackingStore.java:57`): each flush writes one
 *    message per source partition — key = serialized source partition,
 *    value = serialized offset map; restore replays the topic from
 *    earliest and keeps the LAST value per key
 *    (`processMessage`, PulsarOffsetBackingStore.java:143). Here the
 *    store is a [[TopicLog]] and restore is
 *    [[Compaction.tableView]] — the same last-value-per-key operator
 *    the engine already exposes.
 *  - **Batch-boundary offset commit**
 *    (`AbstractKafkaConnectSource.java:304`): a poll batch's offsets
 *    flush only after EVERY record of the batch is acked — here, only
 *    after the data append commits its manifest. A crash between data
 *    commit and offset flush replays the batch: at-least-once, same as
 *    the reference.
 *  - **Single-message transforms with negatable predicates**
 *    (`KafkaConnectSource.java:62-…` predicates/transforms config): an
 *    ordered chain; each stage applies when its predicate (possibly
 *    negated) passes, and a transform may DROP the record by returning
 *    None.
 *
 * Offset keys/values serialize as canonical JSON (sorted keys) so a
 * map's encoding — and therefore its compaction identity — is unique.
 */
object KafkaConnectAdaptor {

  /** The Connect SourceRecord surface we consume (sourcePartition /
    * sourceOffset structured maps, like Connect's). */
  final case class SourceRecord(sourcePartition: Map[String, String],
                                sourceOffset: Map[String, String],
                                key: String, value: String,
                                timestampMs: Option[Long] = None)

  /** A Connect-style pull task: `start` receives the restored offsets,
    * `poll` returns the next batch (empty = drained for now). */
  trait SourceTask {
    def start(offsets: Map[Map[String, String], Map[String, String]]): Unit
    def poll(): Seq[SourceRecord]
  }

  type Predicate = SourceRecord => Boolean
  type Transform = SourceRecord => Option[SourceRecord]

  /** One SMT stage: `transform` fires when `predicate` (negated if so
    * configured) passes; absent predicate = always fires. */
  final case class PredicatedTransform(transform: Transform,
                                       predicate: Option[Predicate] = None,
                                       negated: Boolean = false)

  /** The reference's transform pipeline: stages in order; a non-firing
    * stage passes the record through untouched. */
  private[graft] def applyTransforms(r: SourceRecord,
                                     chain: Seq[PredicatedTransform]): Option[SourceRecord] =
    chain.foldLeft(Option(r)) { (acc, pt) =>
      acc.flatMap { rec =>
        val fires = pt.predicate.forall(p => p(rec) != pt.negated)
        if (fires) pt.transform(rec) else Some(rec)
      }
    }

  /** Canonical JSON of a string map — sorted keys, escaped — so equal
    * maps encode equal (the store's compaction key). */
  private[graft] def canonicalJson(m: Map[String, String]): String = {
    def esc(s: String): String = {
      val sb = new StringBuilder
      s.foreach {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case c => sb.append(c)
      }
      sb.toString
    }
    m.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}":${if (v == null) "null" else s""""${esc(v)}""""}""" }
      .mkString("{", ",", "}")
  }

  private[graft] def parseFlatJson(json: String): Map[String, String] = {
    // inverse of canonicalJson: flat string→string|null object
    val re = """"((?:[^"\\]|\\.)*)"\s*:\s*(null|"(?:[^"\\]|\\.)*")""".r
    def unesc(s: String): String = {
      val sb = new StringBuilder
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length) {
          s.charAt(i + 1) match {
            case 'u' => sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 5
            case e => sb.append(e); i += 1
          }
        } else sb.append(c)
        i += 1
      }
      sb.toString
    }
    re.findAllMatchIn(json).map { m =>
      val v = m.group(2)
      unesc(m.group(1)) -> (if (v == "null") null else unesc(v.substring(1, v.length - 1)))
    }.toMap
  }

  /**
   * The offset backing store over a topic log. Offsets are tiny —
   * bounded by the number of SOURCE partitions (files, binlogs, shards
   * — not rows), so the restore collect is a bounded driver-side read,
   * same as the reference's full topic replay into an in-memory map.
   */
  final class OffsetStore(topic: TopicLog) {

    def restore(): Map[Map[String, String], Map[String, String]] =
      Compaction.tableView(topic.read())
        .select(Envelope.Key, Envelope.Value)
        .collect() // bounded: one row per source partition
        .iterator
        .filter(r => !r.isNullAt(0) && !r.isNullAt(1))
        .map(r => parseFlatJson(r.getString(0)) -> parseFlatJson(r.getString(1)))
        .toMap

    /** One append per flush, one row per dirty partition — the
      * reference's one-message-per-partition producer writes. */
    def flush(offsets: Map[Map[String, String], Map[String, String]]): Unit =
      if (offsets.nonEmpty) {
        val spark = topic.spark
        import spark.implicits._
        topic.append(offsets.toSeq
          .map { case (p, o) => (canonicalJson(p), canonicalJson(o)) }
          .toDF(Envelope.Key, Envelope.Value)
          .withColumn(Envelope.ProducerName, lit("connect-offsets"))
          .withColumn(Envelope.SequenceId, monotonically_increasing_id())
          .withColumn(Envelope.PublishTime, current_timestamp())
          .withColumn(Envelope.EventTime, current_timestamp())): Unit
      }
  }

  /**
   * Drive `task` until it reports drained (an empty poll) or
   * `maxBatches` is hit. Per poll batch: transform chain → append
   * surviving records to `dataTopic` (manifest commit = every record
   * of the batch is durable) → THEN flush the batch's max offsets per
   * source partition. Returns the number of records landed.
   */
  def run(task: SourceTask, dataTopic: TopicLog, offsetTopic: TopicLog,
          transforms: Seq[PredicatedTransform] = Nil,
          maxBatches: Int = Int.MaxValue): Long = {
    val store = new OffsetStore(offsetTopic)
    task.start(store.restore())
    val spark = dataTopic.spark
    import spark.implicits._
    var landed = 0L
    var batches = 0
    var batch = task.poll()
    while (batch.nonEmpty && batches < maxBatches) {
      val surviving = batch.flatMap(applyTransforms(_, transforms))
      if (surviving.nonEmpty) {
        dataTopic.append(surviving
          .map(r => (r.key, r.value))
          .toDF(Envelope.Key, Envelope.Value)
          .withColumn(Envelope.ProducerName, lit("connect-source"))
          .withColumn(Envelope.SequenceId, monotonically_increasing_id())
          .withColumn(Envelope.PublishTime, current_timestamp())
          .withColumn(Envelope.EventTime, current_timestamp())): Unit
        landed += surviving.size
      }
      // batch-boundary commit: last offset per source partition, and
      // only now that the data manifest is committed
      store.flush(batch.groupBy(_.sourcePartition)
        .map { case (p, rs) => p -> rs.last.sourceOffset })
      batches += 1
      batch = task.poll()
    }
    landed
  }
}
