package graft.sources

import graft.log.TopicLog
import org.apache.spark.sql.Row
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Topic → MongoDB sink (reference pulsar-io/mongo/.../MongoSink.java:63
 * write path: value parsed as a JSON document, batched insertMany, bad
 * documents fail the record; MongoConfig.java batchSize/batchTimeMs).
 * The testable substance is the bulk COMMAND DOCUMENT shaping — the
 * `insert` / `delete` database commands MongoDB actually executes
 * (public wire contract: the MongoDB Database Command reference;
 * drivers wrap these same JSON commands in OP_MSG) — plus batching,
 * `_id` stamping, tombstone routing and apply order. The socket is a
 * pluggable `transport: commandJson => responseJson`; a response with
 * `"ok": 1` and no `writeErrors` commits the batch.
 *
 * Semantics mirrored from the reference write():
 *  - value is a JSON object → document in an `insert` command; the
 *    record key (when present) becomes `_id`, making replays converge
 *    by-id instead of duplicating (the driver answers a duplicate-key
 *    writeError on exact replay, which `dupesOk` tolerates — same
 *    effectively-once stance as the reference's es/jdbc sinks).
 *  - value == null → `delete` command on `_id` (tombstone; skipped when
 *    the key is also null).
 *  - value not a JSON object → fail the batch (reference: record.fail).
 *
 * Scale shape: identical to the jdbc/es/redis sinks — HW-filtered
 * foreachBatch, repartition by key + offset order within partitions,
 * `batchSize` documents per command, executors post in parallel.
 */
object MongoSink {

  /** Collection-name rules (public MongoDB naming restrictions): no
    * `$`, no NUL, non-empty, not starting with `system.`. */
  private[graft] def checkCollection(name: String): String = {
    require(name != null && name.nonEmpty && name.length < 120 &&
      !name.contains("$") && !name.contains("\u0000") &&
      !name.startsWith("system."),
      s"illegal mongo collection name '$name'")
    name
  }

  @transient private lazy val mapper =
    new com.fasterxml.jackson.databind.ObjectMapper()

  private def jsonEscape(s: String): String = JsonUtil.escape(s)

  /** Re-serialize a record value as a compact document with `_id`
    * stamped from the key; None when the value isn't a JSON object. */
  private[graft] def document(key: String, value: String): Option[String] =
    try {
      val tree = mapper.readTree(value)
      if (!tree.isObject) None
      else {
        val obj = tree.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        if (key != null) obj.put("_id", key): Unit
        Some(obj.toString)
      }
    } catch { case _: Exception => None }

  /** The `insert` command for a batch of KEYLESS documents (`ordered:
    * false` lets the server apply past duplicate-key errors on replay).
    * Keyed documents go through [[upsertCommand]] — an insert-only path
    * with dup-key tolerance silently kept the FIRST write of every key,
    * dropping all later updates to an existing document. */
  private[graft] def insertCommand(collection: String, docs: Seq[String]): String =
    s"""{"insert":"${jsonEscape(collection)}","ordered":false,"documents":[${docs.mkString(",")}]}"""

  /** The `update` command applying keyed documents as ordered UPSERTS:
    * a later value for the same _id REPLACES the earlier one (the
    * last-write-wins / replay-convergence contract the doc promises);
    * `ordered: true` so within-batch per-key order holds server-side. */
  private[graft] def upsertCommand(collection: String,
                                   docs: Seq[(String, String)]): String =
    s"""{"update":"${jsonEscape(collection)}","ordered":true,"updates":[${
      docs.map { case (id, doc) =>
        s"""{"q":{"_id":"${jsonEscape(id)}"},"u":$doc,"upsert":true}"""
      }.mkString(",")}]}"""

  /** The `delete` command for a batch of tombstoned ids. */
  private[graft] def deleteCommand(collection: String, ids: Seq[String]): String =
    s"""{"delete":"${jsonEscape(collection)}","deletes":[${
      ids.map(id => s"""{"q":{"_id":"${jsonEscape(id)}"},"limit":1}""").mkString(",")}]}"""

  /**
   * Stream the topic into MongoDB through `transport: command =>
   * response`. The microbatch fails unless every response has `ok: 1`;
   * `writeErrors` fail too, EXCEPT duplicate-key (code 11000) which a
   * replay of an already-applied insert legitimately produces.
   */
  def topicToMongoSink(topic: TopicLog, collection: String,
                       transport: String => String,
                       checkpoint: String,
                       batchSize: Int = 500): StreamingQuery = {
    checkCollection(collection): Unit
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    SinkHarness.startKeyed(topic, checkpoint) { rows =>
      flushPartition(rows, collection, transport, batchSize)
    }
  }

  /** Executor-side writer: consecutive same-kind ops batch into one
    * command; a kind switch (insert → delete on the same key range)
    * flushes first so apply order survives batching. */
  private def flushPartition(rows: Iterator[Row], collection: String,
                             transport: String => String, batchSize: Int): Unit = {
    val docs = new scala.collection.mutable.ArrayBuffer[String]
    val ups = new scala.collection.mutable.ArrayBuffer[(String, String)]
    val dels = new scala.collection.mutable.ArrayBuffer[String]
    def send(cmd: String): Unit = {
      val resp = transport(cmd)
      val tree = mapper.readTree(resp)
      require(tree.path("ok").asDouble(0) == 1.0, s"mongo command failed: ${resp.take(300)}")
      val errs = tree.path("writeErrors")
      if (errs.isArray && errs.size() > 0) {
        val fatal = (0 until errs.size()).map(errs.get)
          .filter(_.path("code").asInt() != 11000) // dup key on replay is ok
        require(fatal.isEmpty, s"mongo writeErrors: ${fatal.mkString(",").take(300)}")
      }
    }
    def flushDocs(): Unit = if (docs.nonEmpty) { send(insertCommand(collection, docs.toSeq)); docs.clear() }
    def flushUps(): Unit = if (ups.nonEmpty) { send(upsertCommand(collection, ups.toSeq)); ups.clear() }
    def flushDels(): Unit = if (dels.nonEmpty) { send(deleteCommand(collection, dels.toSeq)); dels.clear() }
    rows.foreach { r =>
      val (key, value) = (r.getString(0), r.getString(1))
      if (value == null) {
        if (key != null) {
          flushDocs(); flushUps()
          dels += key; if (dels.length >= batchSize) flushDels()
        }
      } else document(key, value) match {
        case Some(doc) if key != null =>
          flushDels(); flushDocs()
          ups += ((key, doc)); if (ups.length >= batchSize) flushUps()
        case Some(doc) =>
          // keyless documents have no identity to upsert on: plain
          // insert (replay of an uncommitted batch can duplicate them —
          // the keyless caveat every at-least-once sink shares)
          flushDels(); flushUps()
          docs += doc; if (docs.length >= batchSize) flushDocs()
        case None => throw new IllegalArgumentException(
          s"value for key=$key is not a JSON object")
      }
    }
    flushDocs(); flushUps(); flushDels()
  }
}
