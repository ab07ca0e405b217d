package graft

import graft.model.Envelope
import graft.operators.Windows
import graft.streaming.StreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming semantics: count windows fire incrementally with state,
  * streaming TableView tracks last-by-key, watermark dedup. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming count windows fire across microbatches with buffered state") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Double)]
    val out = Windows.countTumblingStream(input.toDS(), count = 3)
    val q = out.writeStream.format("memory").queryName("cw")
      .outputMode("append").start()
    try {
      input.addData(("a", 1.0), ("a", 2.0))           // no fire yet
      q.processAllAvailable()
      assert(spark.table("cw").count() == 0)
      input.addData(("a", 3.0), ("a", 4.0), ("b", 1.0)) // a fires w0, buffers 4.0
      q.processAllAvailable()
      val r1 = spark.table("cw").as[Windows.CountWindowFired].collect()
      assert(r1.toSeq == Seq(Windows.CountWindowFired("a", 0, 3, 6.0, 1.0, 3.0)))
      input.addData(("a", 5.0), ("a", 6.0), ("b", 2.0), ("b", 3.0)) // a w1, b w0
      q.processAllAvailable()
      val r2 = spark.table("cw").as[Windows.CountWindowFired].collect()
        .map(f => (f.key, f.windowId, f.sum)).toSet
      assert(r2 == Set(("a", 0L, 6.0), ("a", 1L, 15.0), ("b", 0L, 6.0)))
    } finally q.stop()
  }

  test("streaming session windows: events within the gap merge, session fires past watermark") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val df = input.toDS().toDF("k", "secs")
      .withColumn("ts", timestamp_seconds(col("secs") + 1700000000L))
    val out = Windows.session(df, "ts", gap = "10 minutes",
      keys = Seq(col("k")),
      aggs = Seq(count(lit(1)).as("n"), min("secs").as("first"), max("secs").as("last")),
      maxLag = Some("0 seconds"))
    val q = out.writeStream.format("memory").queryName("sess")
      .outputMode("append").start()
    try {
      // two events 5 min apart: one open session (nothing fires yet)
      input.addData(("u1", 0L), ("u1", 300L))
      q.processAllAvailable()
      assert(spark.table("sess").count() == 0)
      // an event 5 more minutes on MERGES into the same session across
      // microbatches; a far-future event then pushes the watermark past
      // the gap and the merged session fires as ONE row of 3 events
      input.addData(("u1", 600L))
      q.processAllAvailable()
      input.addData(("u1", 7200L))
      q.processAllAvailable()
      val fired = spark.table("sess")
        .select("k", "n", "first", "last")
        .as[(String, Long, Long, Long)].collect().toSet
      assert(fired == Set(("u1", 3L, 0L, 600L)),
        s"expected one merged 3-event session, got $fired")
    } finally q.stop()
  }

  test("streaming sliding count windows: trigger every `slide`, evict to `length`") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Double)]
    val out = Windows.countSlidingStream(input.toDS(), length = 3, slide = 2)
    val q = out.writeStream.format("memory").queryName("csw")
      .outputMode("append").start()
    try {
      input.addData(("a", 1.0), ("a", 2.0)) // arrival 2: trigger, buffer only 2 -> no fire
      q.processAllAvailable()
      assert(spark.table("csw").count() == 0)
      input.addData(("a", 3.0), ("a", 4.0)) // arrival 4: trigger over last 3 = [2,3,4]
      q.processAllAvailable()
      val r = spark.table("csw").as[Windows.CountWindowFired].collect()
      assert(r.map(f => (f.windowId, f.sum)).toSet == Set((2L, 9.0)))
      input.addData(("a", 5.0), ("a", 6.0)) // arrival 6: last 3 = [4,5,6]
      q.processAllAvailable()
      val r2 = spark.table("csw").as[Windows.CountWindowFired].collect()
      assert(r2.map(f => (f.windowId, f.sum)).toSet == Set((2L, 9.0), (3L, 15.0)))
    } finally q.stop()
  }

  test("strategic compaction: custom strategy keeps max-valued message per key") {
    import graft.operators.Compaction
    val log = Seq(
      ("k1", "low", 0L, 1.0), ("k1", "high", 1L, 9.0), ("k1", "mid", 2L, 5.0),
      ("k2", "only", 3L, 2.0))
      .toDF(Envelope.Key, Envelope.Value, Envelope.Offset, "metric_value")
    val got = Compaction.strategic(log,
        Seq(col("metric_value"), col(Envelope.Offset)))
      .select(Envelope.Key, Envelope.Value).as[(String, String)].collect().toMap
    assert(got == Map("k1" -> "high", "k2" -> "only"))
  }

  test("streaming TableView converges to last value per key") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String, Long)]
    val stream = input.toDF()
      .toDF(Envelope.Key, Envelope.Value, Envelope.Offset)
    val ckpt = Files.createTempDirectory("tv-ckpt").toString
    val q = StreamOps.tableViewQuery(stream, "tv_test", ckpt)
    try {
      input.addData(("k1", "v1", 0L), ("k2", "a", 1L))
      q.processAllAvailable() // TableView.refresh barrier
      val s1 = spark.table("tv_test")
        .select(Envelope.Key, Envelope.Value).as[(String, String)].collect().toMap
      assert(s1 == Map("k1" -> "v1", "k2" -> "a"))
      input.addData(("k1", "v2", 2L))
      q.processAllAvailable()
      val s2 = spark.table("tv_test")
        .select(Envelope.Key, Envelope.Value).as[(String, String)].collect().toMap
      assert(s2 == Map("k1" -> "v2", "k2" -> "a"))
    } finally q.stop()
  }

  test("streaming dedup within watermark drops (producer, seq) duplicates") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Long)]
    val stream = input.toDF()
      .toDF(Envelope.ProducerName, Envelope.SequenceId, "t")
      .withColumn(Envelope.PublishTime, timestamp_seconds(col("t")))
    val deduped = StreamOps.dedupWithinWatermark(stream, "1 hour")
    val q = deduped.writeStream.format("memory").queryName("dd")
      .outputMode("append").start()
    try {
      input.addData(("p1", 0L, 100L), ("p1", 1L, 101L), ("p1", 1L, 102L))
      q.processAllAvailable()
      input.addData(("p1", 1L, 103L), ("p1", 2L, 104L)) // dup again + new
      q.processAllAvailable()
      val seqs = spark.table("dd")
        .select(Envelope.SequenceId).as[Long].collect().sorted
      assert(seqs.toSeq == Seq(0L, 1L, 2L))
    } finally q.stop()
  }

  test("streaming quality-filter pipeline equals its batch twin") {
    import graft.ext.TextOps
    val streamed = SparkEntry.queries("quality_filter_stream")(spark, sf001)
      .select("lang", "n_docs", "total_tokens")
      .as[(String, Long, Long)].collect().toSet
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val batch = TextOps.withQualityScore(docs)
      .filter(col("n_tokens") >= 10 && col("mean_word_len").between(2.0, 12.0))
      .select(col("lang"), md5(col("text")).as("h"),
        size(TextOps.tokens(col("text"))).cast("bigint").as("toks"))
      .dropDuplicates("lang", "h")
      .groupBy("lang")
      .agg(count(lit(1)).cast("bigint").as("n_docs"),
        sum("toks").cast("bigint").as("total_tokens"))
      .as[(String, Long, Long)].collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }
}
