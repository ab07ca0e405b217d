package graft

import graft.streaming.Functions
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Pulsar-Functions compute surface semantics. */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("map function: None filters the record out (null-return drop)") {
    val in = Seq(1, 2, 3, 4, 5, 6).toDS()
    val out = Functions.mapFunction(in)(i =>
      if (i % 2 == 0) Some(i * 10) else None)
    assert(out.collect().sorted.toSeq == Seq(20, 40, 60))
  }

  test("fan-out emits to multiple topics from one pass") {
    val in = Seq("a", "bb").toDS()
    val out = Functions.fanOut(in)(s =>
      Seq(("t-main", s), ("t-len", s.length.toString)))
    val byTopic = out.groupBy("out_topic").count().as[(String, Long)]
      .collect().toMap
    assert(byTopic == Map("t-main" -> 2, "t-len" -> 2))
  }

  test("counter store accumulates per key") {
    val in = Seq("a", "b", "a", "a").toDS()
    val counters = Functions.counterStore(in)(identity, _ => 1L)
      .as[(String, Long)].collect().toMap
    assert(counters == Map("a" -> 3, "b" -> 1))
  }

  test("stateful function: put/get/delete state across microbatches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Int)]
    // running sum per key; state deleted (and emitted) when sum >= 10
    val out = Functions.statefulFunction[String, (String, Int), Int, (String, Int)](
      input.toDS())(_._1) { case (k, vs, prev) =>
        val total = prev.getOrElse(0) + vs.map(_._2).sum
        if (total >= 10) (Iterator((k, total)), None)
        else (Iterator.empty, Some(total))
      }
    val q = out.toDF("key", "total").writeStream
      .format("memory").queryName("sf").outputMode("append").start()
    try {
      input.addData(("a", 4), ("b", 2))
      q.processAllAvailable()
      assert(spark.table("sf").count() == 0)     // below threshold, buffered
      input.addData(("a", 7))                    // a: 4+7 = 11 -> fires, state cleared
      q.processAllAvailable()
      assert(spark.table("sf").as[(String, Int)].collect().toSet == Set(("a", 11)))
      input.addData(("a", 3))                    // state was deleted -> restart from 3
      q.processAllAvailable()
      assert(spark.table("sf").count() == 1)
    } finally q.stop()
  }

  test("window function hands the full record collection to user code") {
    val in = Envelope.fromEventsTestView(spark, sf001)
    val w = Functions.windowFunction(in, "event_time", "6 hours", "1 minute",
      Seq("event_type"))
    val row = w.filter(col("n_records") > 1).limit(1)
      .select(size(col("records")), col("n_records")).as[(Int, Long)].head()
    assert(row._1.toLong == row._2)
  }

  private object Envelope {
    def fromEventsTestView(s: org.apache.spark.sql.SparkSession, dir: String) =
      graft.model.Envelope.fromEvents(s, dir)
  }
}
