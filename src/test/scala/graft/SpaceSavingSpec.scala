package graft

import graft.functions.SpaceSaving
import org.apache.spark.sql.functions._
import scala.util.Random

/** SpaceSaving heavy hitters: exactness when capacity covers the domain,
  * the Metwally guarantees under eviction, the Cafaro parallel-merge
  * rule, and the SQL surface. */
class SpaceSavingSpec extends SparkSpec {
  import spark.implicits._

  test("capacity >= distinct domain => exact counts, zero error") {
    val rnd = new Random(7)
    val data = Seq.fill(5000)(s"k${rnd.nextInt(40)}")
    val truth = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sk = SpaceSaving.deserialize(
      data.toDF("k").repartition(8)
        .agg(SpaceSaving.ss_sketch(col("k"), 64)).as[Array[Byte]].head())
    assert(sk.counters.size === 40)
    sk.counters.foreach { case (item, (c, e)) =>
      assert(c === truth(item), s"count for $item")
      assert(e === 0L, s"error for $item")
    }
  }

  test("guarantees hold under eviction, single partition and distributed") {
    val rnd = new Random(13)
    // zipf-ish: key i with weight ~ 1/(i+1)
    val data = Seq.fill(20000) {
      val u = rnd.nextDouble()
      s"k${(math.pow(400.0, u) - 1).toInt}"
    }
    val truth = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = data.size.toLong
    val m = 16
    for (parts <- Seq(1, 13)) {
      val sk = SpaceSaving.deserialize(
        data.toDF("k").repartition(parts)
          .agg(SpaceSaving.ss_sketch(col("k"), m)).as[Array[Byte]].head())
      assert(sk.counters.size === m)
      sk.counters.foreach { case (item, (c, e)) =>
        val t = truth.getOrElse(item, 0L)
        assert(c >= t, s"est undercounts $item ($parts parts)")
        assert(c - e <= t, s"lower bound broken for $item ($parts parts)")
        assert(e <= n / m, s"error above N/m for $item ($parts parts)")
      }
      // every item heavier than N/m must be tracked
      truth.filter(_._2 > n / m).keys.foreach { hot =>
        assert(sk.counters.contains(hot), s"heavy item $hot untracked ($parts parts)")
      }
    }
  }

  test("merge charges absent items the other side's min; truncates to top m") {
    val a = SpaceSaving.empty(2)
    Seq("x", "x", "x", "y").foreach(SpaceSaving.update(a, _))   // x:3, y:1; full
    val b = SpaceSaving.empty(2)
    Seq("z", "z").foreach(SpaceSaving.update(b, _))             // z:2; not full
    val merged = SpaceSaving.merge(a, b)
    // epsA = 1 (a full, min 1); epsB = 0 (b not full)
    // x: 3+0=3; z: 1+2=3 err 1+0=1; y: 1+0=1 -> top-2 keeps x and z
    assert(merged.counters.toMap === Map("x" -> ((3L, 0L)), "z" -> ((3L, 1L))))
    intercept[IllegalArgumentException] {
      SpaceSaving.merge(SpaceSaving.empty(2), SpaceSaving.empty(4))
    }
  }

  test("serialization round-trips ordered by (count desc, item)") {
    val buf = SpaceSaving.empty(8)
    Seq("b", "a", "a", "c", "a", "b").foreach(SpaceSaving.update(buf, _))
    val rt = SpaceSaving.deserialize(SpaceSaving.serialize(buf))
    assert(rt.m === 8)
    assert(rt.counters.toMap === buf.counters.toMap)
  }

  test("SQL surface: ss_sketch / ss_merge / ss_probe / ss_topk") {
    graft.functions.Registry.registerAll(spark)
    Seq("a", "a", "a", "b", "b", "c").toDF("k").createOrReplaceTempView("ss_in")
    val row = spark.sql(
      """SELECT ss_topk(sk, 2) AS top,
        |       ss_probe(sk, 'a') AS pa,
        |       ss_probe(sk, 'zzz') AS pz
        |FROM (SELECT ss_merge(sk) AS sk FROM (
        |  SELECT k, ss_sketch(k, 8) AS sk FROM ss_in GROUP BY k))""".stripMargin)
      .collect().head
    val top = row.getSeq[org.apache.spark.sql.Row](0)
    assert(top.map(r => (r.getString(0), r.getLong(1))) === Seq(("a", 3L), ("b", 2L)))
    assert(row.getStruct(1).getBoolean(0) === true)
    assert(row.getStruct(1).getLong(1) === 3L)
    assert(row.getStruct(2).getBoolean(0) === false)
  }

  test("registered spacesaving_topk query: certificate true on real data") {
    val out = SparkEntry.queries("spacesaving_topk")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.length === 10)
    assert(out.forall(_.getBoolean(2)), "a Metwally guarantee failed")
  }
}
