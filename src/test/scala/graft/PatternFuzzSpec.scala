package graft

import graft.log.TopicLog
import graft.model.{Envelope, TopicName}
import graft.streaming.PatternSubscription
import org.apache.spark.sql.functions._

import java.nio.file.Files

/**
 * Randomized interleaving of topic creation, appends, and polls against
 * the exactly-once-per-row delivery invariant (absent crashes, the
 * at-least-once cursor protocol delivers every committed row of a
 * matching topic exactly once, and never a non-matching row) — the
 * TxnProtocolFuzzSpec posture applied to the watcher. Seeded, so a
 * failure replays deterministically.
 */
class PatternFuzzSpec extends SparkSpec {
  import spark.implicits._

  test("random create/append/poll interleavings deliver each matching row exactly once") {
    val rnd = new scala.util.Random(20260814L)
    val root = Files.createTempDirectory("graft-pat-fuzz").toString
    val sub = new PatternSubscription(spark, root, "public", "default",
      "evt-.*", "fuzz",
      Files.createTempDirectory("graft-pat-fuzz-ckpt").toString,
      maxTopicsPerPoll = 2) // small cap: polls under backlog exercise rotation
    val matching = (0 until 5).map(i => s"evt-$i")
    val nonMatching = (0 until 3).map(i => s"other-$i")
    val appended = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    val delivered = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
    var seq = 0
    def append(topic: String, n: Int): Unit = {
      val df = (0 until n).map(j => (s"k${(seq + j) % 3}", s"v-$topic-${seq + j}",
          "p0", (seq + j).toLong))
        .toDF(Envelope.Key, Envelope.Value, Envelope.ProducerName, Envelope.SequenceId)
        .withColumn(Envelope.PublishTime, timestamp_seconds(col(Envelope.SequenceId)))
      seq += n
      new TopicLog(spark, root, TopicName.parse(topic)).append(df): Unit
      appended(topic) += n
    }
    def collect(df: org.apache.spark.sql.DataFrame): Unit =
      df.groupBy(Envelope.Topic).count().collect().foreach { r =>
        delivered(TopicName.parse(r.getString(0)).topic) += r.getLong(1)
      }
    (0 until 60).foreach { _ =>
      rnd.nextInt(10) match {
        case k if k <= 5 => // append 1-4 rows to a random topic (2/8 non-matching)
          val pool = if (rnd.nextInt(4) == 0) nonMatching else matching
          append(pool(rnd.nextInt(pool.size)), 1 + rnd.nextInt(4))
        case 6 | 7 | 8 => sub.poll((df, _) => collect(df)): Unit
        case 9 => sub.drain((df, _) => collect(df)): Unit
      }
    }
    sub.drain((df, _) => collect(df)): Unit
    matching.foreach { t =>
      assert(delivered(t) == appended(t),
        s"$t: delivered ${delivered(t)} of ${appended(t)} appended")
    }
    nonMatching.foreach(t => assert(delivered(t) == 0,
      s"non-matching $t leaked ${delivered(t)} rows"))
  }
}
