package graft.sources

import graft.log.TopicLog

import org.apache.spark.sql.streaming.StreamingQuery

import java.nio.charset.StandardCharsets.UTF_8

/**
 * Topic → HBase sink (reference `pulsar-io/hbase/.../
 * HbaseAbstractSink.java:45`): records accumulate to `batchSize` (or a
 * `batchTimeMs` tick), each binds into a Put of
 * (rowKey, family, qualifiers) per the configured TableDefinition
 * (`HbaseSinkConfig.java:45-57`), the batch lands via one
 * `table.batch(puts)` and the WHOLE batch acks on success or fails on
 * error (HbaseAbstractSink.java:150-158 — all-or-nothing per flush).
 *
 * The reference speaks the native region-server RPC through the HBase
 * client jar; here the wire is HBase's PUBLIC REST (Stargate) surface:
 * a multi-row put is `PUT /<table>/false-row-key` carrying a CellSet
 * JSON — `{"Row":[{"key":b64(row),"Cell":[{"column":
 * b64("family:qualifier"),"$":b64(value)},…]},…]}` — with every key,
 * column and value base64-encoded.
 *
 * Binding: rowKey = envelope key; with no `qualifierNames`, the raw
 * value lands under one `value` qualifier; with declared qualifiers,
 * the value parses as a flat JSON object and each present field binds
 * to its qualifier (the reference's POJO-field binding). A record that
 * fails to bind is dropped from the batch and failed alone
 * (HbaseAbstractSink.java:141), not the whole flush.
 */
object HbaseSink {

  private def b64(b: Array[Byte]): String =
    java.util.Base64.getEncoder.encodeToString(b)

  final case class Cell(family: String, qualifier: String, value: Array[Byte])
  final case class RowPut(rowKey: String, cells: Seq[Cell])

  /** One CellSet document (the REST multi-row put body). */
  def cellSetJson(rows: Seq[RowPut]): String =
    rows.map { r =>
      val cells = r.cells.map { c =>
        s"""{"column":"${b64(s"${c.family}:${c.qualifier}".getBytes(UTF_8))}",""" +
          s""""$$":"${b64(c.value)}"}"""
      }.mkString(",")
      s"""{"key":"${b64(r.rowKey.getBytes(UTF_8))}","Cell":[$cells]}"""
    }.mkString("""{"Row":[""", ",", "]}")

  /** Bind one envelope record to a RowPut, or None when it can't bind
    * (keyless, or no declared qualifier present in the value). */
  @transient private lazy val mapper =
    new com.fasterxml.jackson.databind.ObjectMapper

  private[graft] def bind(key: String, value: String, family: String,
                          qualifierNames: Seq[String]): Option[RowPut] = {
    if (key == null) return None
    if (qualifierNames.isEmpty)
      Some(RowPut(key, Seq(Cell(family, "value",
        if (value == null) Array.emptyByteArray else value.getBytes(UTF_8)))))
    else {
      // real JSON parse, not the flat string→string canonical-form
      // inverse (parseFlatJson): a record with numeric/boolean fields —
      // {"age":36} — matched NOTHING under the string-only regex, so
      // every such record silently vanished from the batch. Scalar
      // values bind via their text form; nested objects/arrays and
      // nulls stay non-binding (the reference's POJO-field binding is
      // scalar-per-qualifier too).
      val fields: Map[String, String] =
        try {
          val tree = mapper.readTree(if (value == null) "{}" else value)
          if (!tree.isObject) Map.empty
          else {
            import scala.jdk.CollectionConverters._
            tree.fields().asScala.collect {
              case e if e.getValue.isValueNode && !e.getValue.isNull =>
                e.getKey -> e.getValue.asText()
            }.toMap
          }
        } catch { case scala.util.control.NonFatal(_) => Map.empty[String, String] }
      val cells = qualifierNames.flatMap(q =>
        fields.get(q).map(v => Cell(family, q, v.getBytes(UTF_8))))
      if (cells.isEmpty) None else Some(RowPut(key, cells))
    }
  }

  /**
   * Stream the topic into HBase through `transport: body => status`.
   * Batches bound by `batchSize`; 5xx/429 statuses retry with backoff,
   * other non-2xx fail the stream; a batch acks all-or-nothing (an
   * engine replay resends the same puts — HBase cells are idempotent
   * under identical timestamps/content).
   */
  def topicToHbaseSink(topic: TopicLog,
                       transport: Array[Byte] => Int,
                       checkpoint: String,
                       family: String,
                       qualifierNames: Seq[String] = Nil,
                       batchSize: Int = 200,
                       maxAttempts: Int = 3,
                       backoffMs: Long = 100L,
                       sleeper: Long => Unit = Thread.sleep(_)): StreamingQuery = {
    require(batchSize >= 1, "batchSize must be >= 1")
    SinkHarness.startKeyed(topic, checkpoint) { rows =>
      rows.grouped(batchSize).foreach { chunk =>
        val puts = chunk.flatMap { row =>
          bind(
            key = if (row.isNullAt(0)) null else row.getString(0),
            value = if (row.isNullAt(1)) null else row.getString(1),
            family, qualifierNames)
        }.toSeq
        if (puts.nonEmpty) {
          val body = cellSetJson(puts).getBytes(UTF_8)
          var attempt = 1
          var done = false
          while (!done) {
            val status = transport(body)
            if (status >= 200 && status < 300) done = true
            else if ((status == 429 || status >= 500) && attempt < maxAttempts) {
              attempt += 1
              sleeper(backoffMs << (attempt - 2))
            } else throw new IllegalStateException(
              s"hbase batch put failed: HTTP $status after $attempt attempts")
          }
        }
      }
    }
  }
}
