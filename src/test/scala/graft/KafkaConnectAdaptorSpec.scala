package graft

import graft.log.TopicLog
import graft.model.{Envelope, TopicName}
import graft.sources.KafkaConnectAdaptor
import graft.sources.KafkaConnectAdaptor._

import java.nio.file.Files

class KafkaConnectAdaptorSpec extends SparkSpec {

  test("canonical JSON: sorted keys, escaping, null values, exact inverse") {
    val m = Map("b" -> "2", "a" -> "v\"q\\x", "z" -> null, "n" -> "line\nbreak")
    val j = canonicalJson(m)
    assert(j === """{"a":"v\"q\\x","b":"2","n":"line
break","z":null}""".replace("\n", "\\u000a"))
    assert(parseFlatJson(j) === m)
    // canonical: map ordering never changes the encoding
    assert(canonicalJson(Map("x" -> "1", "y" -> "2"))
      === canonicalJson(Map("y" -> "2", "x" -> "1")))
  }

  test("transform chain: predicates gate, negation flips, transforms drop") {
    val upcase: Transform = r => Some(r.copy(value = r.value.toUpperCase))
    val dropShort: Transform = r => if (r.value.length < 3) None else Some(r)
    val isEven: Predicate = _.key.drop(1).toInt % 2 == 0
    def rec(i: Int, v: String) = SourceRecord(Map("p" -> "0"), Map("o" -> i.toString), s"k$i", v)

    val chain = Seq(
      PredicatedTransform(upcase, Some(isEven)),           // evens upcased
      PredicatedTransform(dropShort, Some(isEven), negated = true)) // odds len-filtered
    assert(applyTransforms(rec(2, "ab"), chain) === Some(rec(2, "AB")))
    assert(applyTransforms(rec(3, "ab"), chain) === None)
    assert(applyTransforms(rec(3, "abcd"), chain) === Some(rec(3, "abcd")))
  }

  private class ScriptedTask(batches: Seq[Seq[SourceRecord]]) extends SourceTask {
    var restored: Map[Map[String, String], Map[String, String]] = Map.empty
    private var remaining: Seq[Seq[SourceRecord]] = batches
    override def start(offsets: Map[Map[String, String], Map[String, String]]): Unit = {
      restored = offsets
      // a real task resumes past the committed offset
      remaining = batches.map(_.filter { r =>
        val committed = offsets.get(r.sourcePartition).map(_("o").toLong)
        committed.forall(r.sourceOffset("o").toLong > _)
      }).filter(_.nonEmpty)
    }
    override def poll(): Seq[SourceRecord] =
      remaining match {
        case head +: tail => remaining = tail; head
        case _ => Nil
      }
  }

  private def rec(part: String, off: Int, v: String) =
    SourceRecord(Map("file" -> part), Map("o" -> off.toString), s"$part-$off", v)

  test("run: records land, offsets compact per source partition, restart resumes without dups") {
    val dir = Files.createTempDirectory("kca").toString
    val data = new TopicLog(spark, s"$dir/data", TopicName.parse("connect-data"), 1)
    val offsets = new TopicLog(spark, s"$dir/offsets", TopicName.parse("connect-offsets"), 1)

    val first = new ScriptedTask(Seq(
      Seq(rec("a", 1, "v1"), rec("a", 2, "v2"), rec("b", 1, "w1")),
      Seq(rec("a", 3, "v3"))))
    assert(KafkaConnectAdaptor.run(first, data, offsets) === 4L)
    assert(first.restored === Map.empty)
    assert(data.read().count() === 4)

    // the store holds the LAST offset per source partition
    val store = new OffsetStore(offsets)
    assert(store.restore() === Map(
      Map("file" -> "a") -> Map("o" -> "3"),
      Map("file" -> "b") -> Map("o" -> "1")))

    // restart with overlapping input: the committed prefix is skipped
    val second = new ScriptedTask(Seq(
      Seq(rec("a", 2, "v2"), rec("a", 3, "v3"), rec("a", 4, "v4"), rec("b", 2, "w2"))))
    assert(KafkaConnectAdaptor.run(second, data, offsets) === 2L)
    assert(second.restored === Map(
      Map("file" -> "a") -> Map("o" -> "3"),
      Map("file" -> "b") -> Map("o" -> "1")))
    val values = data.read().select(Envelope.Value)
      .collect().map(_.getString(0)).sorted.toSeq
    assert(values === Seq("v1", "v2", "v3", "v4", "w1", "w2"))
  }

  test("offsets flush only at batch boundaries, after the data commit") {
    val dir = Files.createTempDirectory("kca2").toString
    val data = new TopicLog(spark, s"$dir/data", TopicName.parse("connect-data2"), 1)
    val offsets = new TopicLog(spark, s"$dir/offsets", TopicName.parse("connect-offsets2"), 1)
    val task = new ScriptedTask(Seq(
      Seq(rec("a", 1, "x"), rec("a", 2, "y")),
      Seq(rec("a", 3, "z"))))
    KafkaConnectAdaptor.run(task, data, offsets): Unit
    // two batches → two offset appends for partition a; intermediate
    // offset 2 visible in the raw log, only 3 in the compacted view
    val raw = offsets.read().orderBy(Envelope.Partition, Envelope.Offset)
      .select(Envelope.Value).collect().map(_.getString(0)).toSeq
    assert(raw === Seq("""{"o":"2"}""", """{"o":"3"}"""))
    assert(new OffsetStore(offsets).restore()
      === Map(Map("file" -> "a") -> Map("o" -> "3")))
  }

  test("transforms apply before landing; dropped records still advance offsets") {
    val dir = Files.createTempDirectory("kca3").toString
    val data = new TopicLog(spark, s"$dir/data", TopicName.parse("connect-data3"), 1)
    val offsets = new TopicLog(spark, s"$dir/offsets", TopicName.parse("connect-offsets3"), 1)
    val dropOdd = PredicatedTransform(
      r => if (r.sourceOffset("o").toInt % 2 == 1) None else Some(r))
    val task = new ScriptedTask(Seq(Seq(rec("a", 1, "x"), rec("a", 2, "y"), rec("a", 3, "z"))))
    assert(KafkaConnectAdaptor.run(task, data, offsets, Seq(dropOdd)) === 1L)
    assert(data.read().select(Envelope.Value).collect().map(_.getString(0)).toSeq === Seq("y"))
    // offset 3 committed even though record 3 was dropped — Connect
    // semantics: SMT drops must not stall the source position
    assert(new OffsetStore(offsets).restore()
      === Map(Map("file" -> "a") -> Map("o" -> "3")))
  }
}
