package graft.sources

import graft.log.TopicLog
import graft.model.{Envelope, TopicName}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Flume connector (reference `pulsar-io/flume/.../FlumeConnector.java:39`
 * — embeds a Flume agent whose sources/channels/sinks are wired by the
 * standard Flume agent properties file; records bridge between the
 * topic side and the agent through in-memory queues,
 * `sink/AbstractSink.java:40` and `source/AbstractSource.java:71`).
 *
 * The Flume-specific semantics worth carrying are the AGENT
 * CONFIGURATION MODEL (the public Flume properties grammar) and the
 * channel contract, re-expressed on engine primitives:
 *
 *  - `<agent>.sources|channels|sinks = n1 n2 …` declare components;
 *    `<agent>.<kind>.<name>.<key> = v` configures them;
 *  - every component needs a `type`; a source fans out to ≥1 declared
 *    `channels`; a sink drains EXACTLY ONE declared `channel`;
 *  - Flume's validator DROPS invalid components with a warning rather
 *    than failing the agent — only an agent with nothing left is an
 *    error;
 *  - a channel is a transactional buffer: a put batch commits
 *    atomically, takes see committed batches in order. Here a channel
 *    IS a [[TopicLog]] — the atomic manifest append is the channel
 *    transaction, and a drain is an offset-ordered committed read, so
 *    channel durability at 100 TB is the log's durability, not a JVM
 *    queue's.
 */
object FlumeAgent {

  final case class Component(name: String, tpe: String, props: Map[String, String])
  final case class SourceDef(c: Component, channels: Seq[String])
  final case class SinkDef(c: Component, channel: String)
  final case class AgentConfig(name: String, sources: Seq[SourceDef],
                               channels: Seq[Component], sinks: Seq[SinkDef],
                               warnings: Seq[String])

  /** One Flume event: headers + body (the unit both bridge queues
    * carry). */
  final case class Event(headers: Map[String, String], body: String)

  /**
   * Parse one agent's wiring from Flume properties-file text. Mirrors
   * Flume's validation disposition: invalid components are dropped and
   * reported in `warnings`; an agent left with no valid source+channel
   * +sink pairing fails loudly.
   */
  def parse(propsText: String, agent: String): AgentConfig = {
    val entries = propsText.linesIterator
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#"))
      .flatMap { l =>
        l.split("=", 2) match {
          case Array(k, v) => Some(k.trim -> v.trim)
          case _ => None
        }
      }.toSeq.toMap

    def declared(kind: String): Seq[String] =
      entries.get(s"$agent.$kind").map(_.split("\\s+").toSeq.filter(_.nonEmpty))
        .getOrElse(Nil)

    def propsOf(kind: String, name: String): Map[String, String] = {
      val prefix = s"$agent.$kind.$name."
      entries.collect { case (k, v) if k.startsWith(prefix) =>
        k.substring(prefix.length) -> v
      }
    }

    val warnings = scala.collection.mutable.ArrayBuffer.empty[String]

    val channels = declared("channels").flatMap { n =>
      val p = propsOf("channels", n)
      p.get("type") match {
        case Some(t) => Some(Component(n, t, p - "type"))
        case None => warnings += s"channel $n dropped: no type"; None
      }
    }
    val channelNames = channels.map(_.name).toSet

    val sources = declared("sources").flatMap { n =>
      val p = propsOf("sources", n)
      val chans = p.get("channels").map(_.split("\\s+").toSeq.filter(_.nonEmpty))
        .getOrElse(Nil)
      val live = chans.filter(channelNames)
      (p.get("type"), live) match {
        case (None, _) => warnings += s"source $n dropped: no type"; None
        case (_, Nil) => warnings += s"source $n dropped: no valid channels"; None
        case (Some(t), cs) =>
          chans.diff(cs).foreach(c => warnings += s"source $n: unknown channel $c ignored")
          Some(SourceDef(Component(n, t, p - "type" - "channels"), cs))
      }
    }

    val sinks = declared("sinks").flatMap { n =>
      val p = propsOf("sinks", n)
      (p.get("type"), p.get("channel")) match {
        case (None, _) => warnings += s"sink $n dropped: no type"; None
        case (_, None) => warnings += s"sink $n dropped: no channel"; None
        case (_, Some(c)) if c.split("\\s+").length != 1 =>
          warnings += s"sink $n dropped: a sink drains exactly one channel"; None
        case (_, Some(c)) if !channelNames(c) =>
          warnings += s"sink $n dropped: unknown channel $c"; None
        case (Some(t), Some(c)) =>
          Some(SinkDef(Component(n, t, p - "type" - "channel"), c))
      }
    }

    require(sources.nonEmpty && sinks.nonEmpty && channels.nonEmpty,
      s"agent $agent has no valid source+channel+sink wiring " +
        s"(warnings: ${warnings.mkString("; ")})")
    AgentConfig(agent, sources, channels, sinks, warnings.toSeq)
  }

  /**
   * A channel materialized as a topic log. Headers ride the envelope
   * key as canonical JSON so an event round-trips
   * intact; the body is the value.
   */
  final class Channel(val topic: TopicLog) {

    /** A put TRANSACTION: the whole batch lands in one atomic manifest
      * commit, or not at all (Flume channel put semantics). */
    def put(events: Seq[Event]): Unit = if (events.nonEmpty) {
      val spark = topic.spark
      import spark.implicits._
      // headers always encode as JSON ("{}" when empty): the envelope
      // key routes the partition, and a null key would not route
      topic.append(events
        .map(e => (KafkaConnectAdaptor.canonicalJson(e.headers), e.body))
        .toDF(Envelope.Key, Envelope.Value)
        .withColumn(Envelope.ProducerName, lit("flume-source"))
        .withColumn(Envelope.SequenceId, monotonically_increasing_id())
        .withColumn(Envelope.PublishTime, current_timestamp())
        .withColumn(Envelope.EventTime, current_timestamp())): Unit
    }

    /** The committed stream in channel order, as (headers, body). */
    def events: DataFrame =
      topic.read()
        .orderBy(Envelope.Partition, Envelope.Offset)
        .select(col(Envelope.Key).as("headers_json"),
          col(Envelope.Value).as("body"))

    /** Driver-side take for bridge consumers (bounded batches). */
    def take(max: Int): Seq[Event] =
      events.limit(max).collect().iterator.map { r =>
        Event(
          if (r.isNullAt(0)) Map.empty
          else KafkaConnectAdaptor.parseFlatJson(r.getString(0)),
          if (r.isNullAt(1)) null else r.getString(1))
      }.toSeq
  }

  /** Materialize every channel of a parsed agent under `root`; a
    * source putting to N channels writes N logs (Flume replicating
    * channel-selector default). */
  def wire(spark: SparkSession, config: AgentConfig, root: String): Map[String, Channel] =
    config.channels.map { ch =>
      ch.name -> new Channel(new TopicLog(spark, s"$root/${config.name}",
        TopicName.parse(s"flume-${config.name}-${ch.name}"), 1))
    }.toMap

  /** Fan a source's put across its declared channels (replicating
    * selector). */
  def putAll(channels: Map[String, Channel], src: SourceDef, events: Seq[Event]): Unit =
    src.channels.foreach(c => channels(c).put(events))
}
