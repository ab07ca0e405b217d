package graft

import graft.functions.Kmv
import org.apache.spark.sql.functions._
import scala.util.Random

/** KMV bottom-k quantile sketch: buffer mechanics, merge algebra,
  * accuracy, and the registered certificate query. */
class KmvSpec extends SparkSpec {
  import spark.implicits._

  test("buffer keeps exactly the k smallest hashes") {
    val b = new Kmv.Buffer(8)
    val items = (0 until 100).map(i => (Kmv.hashId(i.toLong), i.toDouble))
    items.foreach { case (h, v) => b.offer(h, v) }
    val kept = (0 until b.m).map(b.hashes).sorted
    assert(kept === items.map(_._1).sorted.take(8))
  }

  test("merge equals single-pass over the union (disjoint ids)") {
    val a = new Kmv.Buffer(64); val b = new Kmv.Buffer(64); val all = new Kmv.Buffer(64)
    for (i <- 0 until 5000) {
      val h = Kmv.hashId(i.toLong); val v = i.toDouble
      if (i % 2 == 0) a.offer(h, v) else b.offer(h, v)
      all.offer(h, v)
    }
    assert(Kmv.serialize(Kmv.merge(a, b)).toSeq === Kmv.serialize(all).toSeq)
  }

  test("serialize/deserialize round trip; k mismatch fails") {
    val b = new Kmv.Buffer(32)
    (0 until 500).foreach(i => b.offer(Kmv.hashId(i.toLong), i * 1.5))
    assert(Kmv.serialize(Kmv.deserialize(Kmv.serialize(b))).toSeq ===
      Kmv.serialize(b).toSeq)
    intercept[IllegalArgumentException] {
      Kmv.merge(new Kmv.Buffer(32), new Kmv.Buffer(64))
    }
  }

  test("median estimate lands within 5% rank error on skewed data") {
    val rnd = new Random(3)
    val n = 50000
    val values = Array.fill(n)(math.exp(rnd.nextGaussian())) // lognormal
    val b = new Kmv.Buffer(1024)
    values.zipWithIndex.foreach { case (v, i) => b.offer(Kmv.hashId(i.toLong), v) }
    val est = Kmv.quantile(Kmv.serialize(b), 0.5).get
    val trueRank = values.count(_ <= est).toDouble / n
    assert(math.abs(trueRank - 0.5) <= 0.05, s"rank $trueRank")
    // empty sketch -> None
    assert(Kmv.quantile(Kmv.serialize(new Kmv.Buffer(16)), 0.5).isEmpty)
  }

  test("kmv_merge over per-group sketches equals the global sketch") {
    val df = (0 until 8000).map(i => (i % 4, i.toLong, (i % 617).toDouble))
      .toDF("g", "id", "v")
    val global = df.agg(Kmv.kmv_sketch(col("v"), col("id"), 128).as("sk"))
      .select("sk").as[Array[Byte]].head()
    val merged = df.groupBy("g").agg(Kmv.kmv_sketch(col("v"), col("id"), 128).as("sk"))
      .agg(Kmv.kmv_merge(col("sk")).as("m"))
      .select("m").as[Array[Byte]].head()
    assert(merged.toSeq === global.toSeq)
  }

  test("quantile_sketch registered query certificate holds at sf0.001") {
    val rows = SparkEntry.queries("quantile_sketch")(spark, sf001)
      .as[(String, Long, Boolean)].collect()
    assert(rows.length === 5) // five event types
    assert(rows.forall(_._3), s"rank certificate violated: ${rows.mkString(",")}")
  }
}
