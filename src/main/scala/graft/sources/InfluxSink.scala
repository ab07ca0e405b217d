package graft.sources

import graft.log.TopicLog
import graft.model.Envelope
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{BooleanType, ByteType, IntegerType, LongType, ShortType, StringType}

/**
 * Topic → InfluxDB sink (reference pulsar-io/influxdb/.../InfluxDBSink
 * batch-points write path and sink config batchSize/precision):
 * each record becomes one line-protocol point; lines batch into write
 * bodies. The encoding — InfluxDB line protocol with its three distinct
 * escaping contexts, integer `i` suffixes, string field quoting,
 * nanosecond timestamps — is where the bugs live and is fully concrete
 * and tested; HTTP is a pluggable `transport: body => status` (the v2
 * `/api/v2/write` endpoint answers 204).
 *
 * Line protocol (public spec: docs.influxdata.com line-protocol):
 * `measurement,tagK=tagV fieldK=fieldV[,&hellip;] ts` where
 *  - measurement escapes `,` and space;
 *  - tag keys/values and field keys escape `,`, `=`, and space;
 *  - string field values are double-quoted and escape `"` and `\`;
 *  - integer fields carry an `i` suffix, floats are bare, booleans are
 *    `true`/`false`;
 *  - the trailing timestamp is epoch nanoseconds.
 *
 * The whole line is built as ONE Catalyst expression (concat of escaped
 * columns — [[lineProtocol]]), so encoding runs inside whole-stage
 * codegen on executors; the sink never funnels rows through the driver.
 * Tags with NULL values are omitted (InfluxDB rejects empty tag values);
 * NULL fields are omitted; a row whose fields are ALL null produces no
 * line (a point needs at least one field).
 */
object InfluxSink {

  private def esc(c: Column, chars: String): Column =
    chars.foldLeft(c) { (acc, ch) =>
      regexp_replace(acc, java.util.regex.Pattern.quote(ch.toString), "\\\\" + ch)
    }

  /** Measurement context: escape comma and space. */
  private[graft] def escMeasurement(c: Column): Column = esc(c, ", ")
  /** Tag/field-key context: escape comma, equals, space. */
  private[graft] def escTag(c: Column): Column = esc(c, ",= ")
  /** String field value context: escape backslash then double-quote. */
  private[graft] def escFieldString(c: Column): Column =
    regexp_replace(regexp_replace(c, "\\\\", "\\\\\\\\"), "\"", "\\\\\"")

  /** One field's `key=value` fragment, typed per line-protocol rules;
    * NULL when the value is NULL (dropped from the line). */
  private def fieldFragment(name: String, v: Column, dt: org.apache.spark.sql.types.DataType): Column = {
    val key = escTag(lit(name))
    val rendered = dt match {
      case ByteType | ShortType | IntegerType | LongType =>
        concat(v.cast("string"), lit("i"))
      case BooleanType => v.cast("string")
      case StringType => concat(lit("\""), escFieldString(v), lit("\""))
      case _ => v.cast("double").cast("string") // floats are bare
    }
    when(v.isNotNull, concat(key, lit("="), rendered))
  }

  /**
   * Line-protocol point as a single string Column. `tags` and `fields`
   * are (name, column) pairs; `tsNanos` is epoch nanoseconds. NULL tags
   * and NULL fields are omitted; the result is NULL when every field is
   * NULL (callers filter those rows out).
   */
  def lineProtocol(df: DataFrame, measurement: String,
                   tags: Seq[(String, Column)], fields: Seq[(String, Column)],
                   tsNanos: Column): Column = {
    require(fields.nonEmpty, "a point needs at least one field")
    val m = escMeasurement(lit(measurement))
    val tagFrags = tags.map { case (k, v) =>
      when(v.isNotNull, concat(lit(","), escTag(lit(k)), lit("="), escTag(v.cast("string"))))
    }
    val tagPart = if (tagFrags.isEmpty) lit("") else concat_ws("", tagFrags: _*)
    val fieldFrags = fields.map { case (k, v) =>
      fieldFragment(k, v, df.select(v).schema.head.dataType)
    }
    val fieldPart = concat_ws(",", fieldFrags: _*)
    when(fieldPart =!= "",
      concat(m, tagPart, lit(" "), fieldPart, lit(" "), tsNanos.cast("string")))
  }

  /**
   * Stream the topic into InfluxDB: the envelope value is expected to be
   * a JSON object of fields; topic/partition become tags; publish_time
   * becomes the point timestamp. `fieldSpecs` maps JSON paths to typed
   * field columns, e.g. `Seq("v" -> "double")`. A non-2xx status fails
   * the microbatch (write is idempotent at equal timestamps — InfluxDB
   * upserts points on (measurement, tagset, ts) — so retries converge).
   */
  def topicToInfluxSink(topic: TopicLog, measurement: String,
                        fieldSpecs: Seq[(String, String)],
                        transport: String => Int,
                        checkpoint: String,
                        batchSize: Int = 1000): StreamingQuery = {
    require(fieldSpecs.nonEmpty, "fieldSpecs must name at least one field")
    require(batchSize > 0, s"batchSize must be positive, got $batchSize")
    // points are timestamped and idempotent in influx (same line replays
    // to the same point), so no keyed layout — just the committed rows
    SinkHarness.start(topic, checkpoint) { committed =>
        val typed = committed.select(
          Seq(col(Envelope.Partition), col(Envelope.Key),
            (unix_micros(col(Envelope.PublishTime)) * 1000L).as("_ts_ns")) ++
          fieldSpecs.map { case (path, typ) =>
            get_json_object(col(Envelope.Value), s"$$.$path").cast(typ).as(path)
          }: _*)
        val withLine = typed.withColumn("_line",
          lineProtocol(typed, measurement,
            tags = Seq("partition" -> col(Envelope.Partition),
              "key" -> col(Envelope.Key)),
            fields = fieldSpecs.map { case (path, _) => path -> col(path) },
            tsNanos = col("_ts_ns")))
          .filter(col("_line").isNotNull)
        withLine.select("_line").rdd.foreachPartition { rows =>
          val buf = new scala.collection.mutable.ArrayBuffer[String]
          def flush(): Unit = if (buf.nonEmpty) {
            val status = transport(buf.mkString("\n"))
            require(status / 100 == 2, s"influx write failed with status $status")
            buf.clear()
          }
          rows.foreach { r => buf += r.getString(0); if (buf.length >= batchSize) flush() }
          flush()
        }
    }
  }
}
