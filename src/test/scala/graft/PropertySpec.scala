package graft

import graft.model.Envelope
import graft.operators.{Compaction, Dedup, Windows}
import org.apache.spark.sql.functions._

/** Top-level so Spark can derive an Encoder. */
case class PropMsg(key: String, value: String, offset: Long,
                   ets: Long, producer: String, seq: Long)

/** Randomized property tests (SURVEY §5): operator outputs equal a naive
  * in-memory reference implementation over seeded random logs. */
class PropertySpec extends SparkSpec {
  import spark.implicits._
  private type Msg = PropMsg
  private def Msg(key: String, value: String, offset: Long,
                  ets: Long, producer: String, seq: Long): PropMsg =
    PropMsg(key, value, offset, ets, producer, seq)

  private def randomLog(seed: Long, n: Int): Seq[Msg] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      Msg(s"k${rnd.nextInt(8)}",
        if (rnd.nextInt(10) == 0) null else s"v${rnd.nextInt(100)}",
        i.toLong, rnd.nextInt(1000).toLong,
        s"p${rnd.nextInt(4)}", rnd.nextInt(50).toLong)
    }
  }

  private def toDf(log: Seq[Msg]) =
    log.toDF("key", "value", "offset", "ets", "producer_name", "sequence_id")
      .withColumn(Envelope.EventTime, timestamp_seconds(col("ets")))
      .drop("ets")

  test("compaction == naive last-write-wins for random logs (5 seeds)") {
    for (seed <- 1L to 5L) {
      val log = randomLog(seed, 300)
      val naive = log.groupBy(_.key).map { case (k, msgs) =>
        k -> msgs.maxBy(_.offset).value
      }.collect { case (k, v) if v != null => k -> v }
      val got = Compaction.publishOrder(toDf(log))
        .select("key", "value").as[(String, String)].collect().toMap
      assert(got == naive.toMap, s"seed $seed")
    }
  }

  test("event-time compaction == naive max-(event_time, offset) (5 seeds)") {
    for (seed <- 10L to 14L) {
      val log = randomLog(seed, 300)
      val naive = log.groupBy(_.key).map { case (k, msgs) =>
        k -> msgs.maxBy(m => (m.ets, m.offset)).value
      }.collect { case (k, v) if v != null => k -> v }
      val got = Compaction.eventTimeOrder(toDf(log))
        .select("key", "value").as[(String, String)].collect().toMap
      assert(got == naive.toMap, s"seed $seed")
    }
  }

  test("seq dedup == naive serialized broker check (5 seeds)") {
    for (seed <- 20L to 24L) {
      val log = randomLog(seed, 300)
      // naive: per producer in offset order, keep only strictly-increasing seqs
      val naive = log.groupBy(_.producer).flatMap { case (_, msgs) =>
        var hw = Long.MinValue
        msgs.sortBy(_.offset).flatMap { m =>
          if (m.seq > hw) { hw = m.seq; Some(m.offset) } else None
        }
      }.toSet
      val got = Dedup.dedupBatch(toDf(log))
        .select("offset").as[Long].collect().toSet
      assert(got == naive, s"seed $seed")
    }
  }

  test("count windows == naive chunking (5 seeds)") {
    for (seed <- 30L to 34L) {
      val log = randomLog(seed, 200).map(m => m.copy(value = "x"))
      val size = 7
      val naive = log.groupBy(_.key).flatMap { case (k, msgs) =>
        msgs.sortBy(_.offset).grouped(size).zipWithIndex
          .filter(_._1.size == size)
          .map { case (chunk, i) => (k, i.toLong, chunk.map(_.offset).max) }
      }.toSet
      val got = Windows.countTumblingBatch(toDf(log), "key", "offset", size,
          Seq(max("offset").as("mx")))
        .select("key", "window_id", "mx").as[(String, Long, Long)]
        .collect().toSet
      assert(got == naive, s"seed $seed")
    }
  }
}
