package graft.sources

import graft.log.TopicLog
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Topic → Elasticsearch sink (reference pulsar-io/elastic-search/.../
 * ElasticSearchSink.java:112-164 and ElasticSearchConfig.java:256-266),
 * mapped like the other connectors: the part that holds the bugs — bulk
 * NDJSON assembly, _id extraction, null-value and malformed-doc action
 * routing, batch sizing, per-key apply order — is concrete and tested;
 * the HTTP layer is a pluggable `transport: String => Int` (POST body →
 * status code). Production wires it to `POST /_bulk`; tests capture the
 * payloads.
 *
 * Semantics mirrored from the reference write() path:
 *  - value != null        → `index` action, `_id` = record key (so
 *    replays and redeliveries converge by-id — the same idempotence the
 *    reference relies on for effectively-once).
 *  - value == null        → [[NullValueAction]]: Ignore (default), Delete
 *    (tombstone → `delete` action, skipped when the key is also null),
 *    Fail (error the batch).
 *  - value not valid JSON → [[MalformedDocAction]]: Ignore, Fail
 *    (default, like the reference).
 *
 * Scale shape: identical to the JDBC sink — foreachBatch is HW-filtered
 * (read-committed), rows repartition by key and apply in offset order
 * (last-write-wins under replay), each partition flushes `batchSize`
 * actions per transport round trip, executors post in parallel, nothing
 * funnels through the driver.
 */
object ElasticSink {

  sealed trait NullValueAction
  object NullValueAction {
    case object Ignore extends NullValueAction
    case object Delete extends NullValueAction
    case object Fail extends NullValueAction
  }

  sealed trait MalformedDocAction
  object MalformedDocAction {
    case object Ignore extends MalformedDocAction
    case object Fail extends MalformedDocAction
  }

  /** ES index-name rules: lowercase, none of the characters
    * backslash slash star question quote angle-brackets pipe space
    * comma hash colon, not `.` or `..`, and no leading
    * dash/underscore/plus — validated at wiring time like the JDBC
    * identifiers (a bad name otherwise 400s on the first microbatch). */
  private[graft] def checkIndexName(index: String): String = {
    require(index != null && index.nonEmpty && index.length <= 255 &&
      index == index.toLowerCase &&
      index != "." && index != ".." &&
      !index.exists("\\/*?\"<>| ,#:".contains(_)) &&
      !"-_+".contains(index.head),
      s"illegal elasticsearch index name '$index'")
    index
  }

  private def jsonEscape(s: String): String = JsonUtil.escape(s)

  // ObjectMapper is thread-safe for reads; one shared instance per JVM
  @transient private lazy val mapper =
    new com.fasterxml.jackson.databind.ObjectMapper()

  /** Parse-or-None; the parsed tree also yields the COMPACT form the
    * bulk body needs — a pretty-printed (multi-line) value is valid JSON
    * but raw newlines would break NDJSON framing, so documents always
    * ship re-serialized one-per-line (the reference serializes through
    * ObjectMapper the same way). */
  private def parseJson(s: String): Option[String] =
    try Some(mapper.readTree(s).toString)
    catch { case _: Exception => None }

  /**
   * Assemble bulk NDJSON action lines for one row — `Nil` when the action
   * routing says skip. Exposed for tests: this is the byte format that
   * reaches the wire.
   */
  private[graft] def bulkLines(index: String, key: String, value: String,
                               nullAction: NullValueAction,
                               malformedAction: MalformedDocAction): Seq[String] =
    if (value == null) nullAction match {
      case NullValueAction.Ignore => Nil
      case NullValueAction.Delete =>
        if (key == null) Nil // reference: delete only with an id
        else Seq(s"""{"delete":{"_index":"$index","_id":"${jsonEscape(key)}"}}""")
      case NullValueAction.Fail =>
        throw new IllegalArgumentException("Unexpected null message value")
    } else parseJson(value) match {
      case None => malformedAction match {
        case MalformedDocAction.Ignore => Nil
        case MalformedDocAction.Fail =>
          throw new IllegalArgumentException(s"Malformed document for id=$key")
      }
      case Some(compact) =>
        val idPart =
          if (key == null) "" else s""","_id":"${jsonEscape(key)}""""
        Seq(s"""{"index":{"_index":"$index"$idPart}}""", compact)
    }

  /**
   * Stream the topic into Elasticsearch through `transport: body =>
   * (status, responseBody)`. A non-2xx status OR a 2xx whose response
   * carries `"errors": true` fails the microbatch (retried by the
   * streaming engine) — ES `_bulk` answers 200 even when individual
   * actions are rejected, so judging by status alone silently drops
   * rows; the reference checks per-item responses the same way.
   */
  def topicToElasticSink(topic: TopicLog, index: String,
                         transport: String => (Int, String),
                         nullAction: NullValueAction = NullValueAction.Ignore,
                         malformedAction: MalformedDocAction = MalformedDocAction.Fail,
                         checkpoint: String,
                         batchSize: Int = 500): StreamingQuery = {
    checkIndexName(index): Unit
    SinkHarness.startKeyed(topic, checkpoint) { rows =>
      flushPartition(rows, index, transport, nullAction,
        malformedAction, batchSize)
    }
  }

  /** Executor-side partition writer: `batchSize` actions per POST. */
  private def flushPartition(rows: Iterator[Row], index: String,
                             transport: String => (Int, String),
                             nullAction: NullValueAction,
                             malformedAction: MalformedDocAction,
                             batchSize: Int): Unit = {
    val buf = new scala.collection.mutable.ArrayBuffer[String]
    var actions = 0
    def flush(): Unit = if (actions > 0) {
      val (status, body) = transport(buf.mkString("", "\n", "\n"))
      require(status / 100 == 2, s"bulk request failed with status $status")
      val itemErrors =
        try mapper.readTree(body).path("errors").asBoolean(false)
        catch { case _: Exception => false } // non-JSON body: trust status
      require(!itemErrors, s"bulk response reported per-item errors: " +
        body.take(500))
      buf.clear(); actions = 0
    }
    rows.foreach { r =>
      val lines = bulkLines(index, r.getString(0), r.getString(1),
        nullAction, malformedAction)
      if (lines.nonEmpty) {
        buf ++= lines; actions += 1
        if (actions >= batchSize) flush()
      }
    }
    flush()
  }
}
