package graft

import graft.sources.FlumeAgent
import graft.sources.FlumeAgent.Event

import java.nio.file.Files

class FlumeAgentSpec extends SparkSpec {

  private val canonical =
    """# the canonical single-hop agent from the public Flume docs
      |a1.sources = r1
      |a1.sinks = k1
      |a1.channels = c1
      |a1.sources.r1.type = netcat
      |a1.sources.r1.bind = localhost
      |a1.sources.r1.port = 44444
      |a1.sources.r1.channels = c1
      |a1.sinks.k1.type = logger
      |a1.sinks.k1.channel = c1
      |a1.channels.c1.type = memory
      |a1.channels.c1.capacity = 1000
      |""".stripMargin

  test("parses the canonical agent wiring with component props") {
    val cfg = FlumeAgent.parse(canonical, "a1")
    assert(cfg.sources.map(_.c.name) === Seq("r1"))
    assert(cfg.sources.head.c.tpe === "netcat")
    assert(cfg.sources.head.c.props === Map("bind" -> "localhost", "port" -> "44444"))
    assert(cfg.sources.head.channels === Seq("c1"))
    assert(cfg.sinks.map(s => (s.c.name, s.c.tpe, s.channel)) === Seq(("k1", "logger", "c1")))
    assert(cfg.channels.map(c => (c.name, c.tpe)) === Seq(("c1", "memory")))
    assert(cfg.warnings.isEmpty)
  }

  test("invalid components drop with warnings, like Flume's validator") {
    val cfg = FlumeAgent.parse(
      """a1.sources = r1 r2 r3
        |a1.sinks = k1 k2 k3 k4
        |a1.channels = c1 cBad
        |a1.sources.r1.type = t
        |a1.sources.r1.channels = c1 ghost
        |a1.sources.r2.channels = c1
        |a1.sources.r3.type = t
        |a1.sources.r3.channels = ghost
        |a1.sinks.k1.type = t
        |a1.sinks.k1.channel = c1
        |a1.sinks.k2.type = t
        |a1.sinks.k2.channel = c1 c2
        |a1.sinks.k3.type = t
        |a1.sinks.k3.channel = ghost
        |a1.sinks.k4.type = t
        |a1.channels.c1.type = memory
        |a1.channels.cBad.capacity = 5
        |""".stripMargin, "a1")
    assert(cfg.sources.map(_.c.name) === Seq("r1")) // r2 no type, r3 no valid channel
    assert(cfg.sources.head.channels === Seq("c1")) // ghost ignored with warning
    assert(cfg.sinks.map(_.c.name) === Seq("k1")) // k2 two channels, k3 ghost, k4 none
    assert(cfg.channels.map(_.name) === Seq("c1")) // cBad no type
    assert(cfg.warnings.size === 7) // ghost-ignored + 3 sources/sinks ×2 + cBad
    assert(cfg.warnings.exists(_.contains("exactly one channel")))
  }

  test("an agent with nothing valid left fails loudly") {
    intercept[IllegalArgumentException](FlumeAgent.parse(
      """a1.sources = r1
        |a1.channels = c1
        |a1.sinks = k1
        |a1.channels.c1.type = memory
        |""".stripMargin, "a1"))
  }

  test("channels are topic logs: atomic put batches, ordered take, headers round-trip") {
    val root = Files.createTempDirectory("flume").toString
    val cfg = FlumeAgent.parse(canonical, "a1")
    val channels = FlumeAgent.wire(spark, cfg, root)
    val c1 = channels("c1")
    c1.put(Seq(
      Event(Map("host" -> "h1", "ts" -> "1"), "line one"),
      Event(Map.empty, "line two")))
    c1.put(Seq(Event(Map("host" -> "h2"), "line three")))
    val got = c1.take(10)
    assert(got === Seq(
      Event(Map("host" -> "h1", "ts" -> "1"), "line one"),
      Event(Map.empty, "line two"),
      Event(Map("host" -> "h2"), "line three")))
  }

  test("a multi-channel source replicates its events to every channel") {
    val root = Files.createTempDirectory("flume2").toString
    val cfg = FlumeAgent.parse(
      """a2.sources = r1
        |a2.sinks = k1 k2
        |a2.channels = c1 c2
        |a2.sources.r1.type = netcat
        |a2.sources.r1.channels = c1 c2
        |a2.sinks.k1.type = logger
        |a2.sinks.k1.channel = c1
        |a2.sinks.k2.type = file_roll
        |a2.sinks.k2.channel = c2
        |a2.channels.c1.type = memory
        |a2.channels.c2.type = file
        |""".stripMargin, "a2")
    val channels = FlumeAgent.wire(spark, cfg, root)
    FlumeAgent.putAll(channels, cfg.sources.head,
      Seq(Event(Map.empty, "fan"), Event(Map("k" -> "v"), "out")))
    assert(channels("c1").take(10) === channels("c2").take(10))
    assert(channels("c1").take(10).map(_.body) === Seq("fan", "out"))
  }
}
