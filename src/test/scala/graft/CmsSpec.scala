package graft

import graft.functions.Cms
import org.apache.spark.sql.functions._
import scala.util.Random

/** Count-Min sketch: core counter math, aggregate/merge paths, and the
  * registered heavy-hitters certificate. */
class CmsSpec extends SparkSpec {
  import spark.implicits._

  test("estimate is exact when keys don't collide") {
    val sk = Cms.empty(5, 2048)
    for (i <- 0 until 50; _ <- 0 to i) Cms.update(sk, i.toLong)
    for (i <- 0 until 50)
      assert(Cms.estimate(sk, i.toLong) === i + 1L)
    assert(Cms.estimate(sk, 999L) === 0L)
  }

  test("estimate never undercounts, and respects the eN bound here") {
    val rnd = new Random(1)
    val sk = Cms.empty(5, 256) // small width to force collisions
    val truth = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for (_ <- 0 until 20000) {
      val k = rnd.nextInt(2000).toLong
      Cms.update(sk, k); truth(k) += 1
    }
    val bound = math.ceil(math.E / 256 * 20000).toLong
    truth.foreach { case (k, n) =>
      val est = Cms.estimate(sk, k)
      assert(est >= n, s"undercount for $k")
      assert(est <= n + bound, s"overcount beyond eN for $k: $est vs $n + $bound")
    }
  }

  test("merge equals single-pass sketch; geometry mismatch fails loudly") {
    val a = Cms.empty(5, 512); val b = Cms.empty(5, 512); val all = Cms.empty(5, 512)
    for (i <- 0 until 1000) {
      val k = s"k${i % 97}"
      if (i % 2 == 0) Cms.update(a, org.apache.spark.unsafe.types.UTF8String.fromString(k))
      else Cms.update(b, org.apache.spark.unsafe.types.UTF8String.fromString(k))
      Cms.update(all, org.apache.spark.unsafe.types.UTF8String.fromString(k))
    }
    assert(Cms.merge(a, b).toSeq === all.toSeq)
    val oddShape = Cms.empty(4, 512)
    intercept[IllegalArgumentException] { Cms.merge(a, oddShape) }
  }

  test("serialize/deserialize round trip") {
    val sk = Cms.empty(3, 64)
    (0 until 500).foreach(i => Cms.update(sk, i.toLong % 37))
    assert(Cms.deserialize(Cms.serialize(sk)).toSeq === sk.toSeq)
  }

  test("cms_sketch aggregate + cms_estimate match driver-side math") {
    val df = (0 until 2000).map(i => (i % 13).toString).toDF("k")
    val skBytes = df.agg(Cms.cms_sketch(col("k")).as("sk"))
      .select("sk").as[Array[Byte]].head()
    val sk = Cms.deserialize(skBytes)
    for (i <- 0 until 13) {
      val expected = 2000 / 13 + (if (i < 2000 % 13) 1 else 0)
      assert(Cms.estimate(sk,
        org.apache.spark.unsafe.types.UTF8String.fromString(i.toString)) >= expected)
    }
    // probe through the expression too
    val est = df.agg(Cms.cms_sketch(col("k")).as("sk"))
      .select(Cms.cms_estimate(col("sk"), lit("0")).as("e")).as[Long].head()
    assert(est >= 154L) // true count of "0" is 154
  }

  test("cms_merge over per-group sketches equals the global sketch") {
    val df = (0 until 3000).map(i => (i % 4, (i % 61).toString)).toDF("g", "k")
    val global = df.agg(Cms.cms_sketch(col("k")).as("sk"))
      .select("sk").as[Array[Byte]].head()
    val merged = df.groupBy("g").agg(Cms.cms_sketch(col("k")).as("sk"))
      .agg(Cms.cms_merge(col("sk")).as("m"))
      .select("m").as[Array[Byte]].head()
    assert(merged.toSeq === global.toSeq)
  }

  test("heavy_hitters certificate holds at sf0.001") {
    val rows = SparkEntry.queries("heavy_hitters")(spark, sf001)
      .as[(String, Long, Boolean, Boolean)].collect()
    assert(rows.length === 10)
    assert(rows.forall(_._3), "lower bound violated")
    assert(rows.forall(_._4), "upper bound violated")
    // descending by exact count, key tie-break
    assert(rows.map(_._2).toSeq === rows.map(_._2).sortBy(-_).toSeq)
  }
}
