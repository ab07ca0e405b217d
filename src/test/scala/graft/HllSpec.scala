package graft

import graft.functions.Hll
import org.apache.spark.sql.functions._

class HllSpec extends SparkSpec {
  import spark.implicits._

  test("hll estimate within 5% of exact on 100k distinct values") {
    val df = spark.range(100000).select(concat(lit("user-"), col("id")).as("u"))
    val est = df.agg(Hll.hll_estimate(Hll.hll_sketch(col("u"))).as("e"))
      .as[Long].head()
    assert(math.abs(est - 100000) < 5000, s"estimate $est")
  }

  test("sketch-per-partition merged equals whole-data sketch (mergeability)") {
    val df = spark.range(50000)
      .select((col("id") % 1000).as("k"), concat(lit("v"), col("id") % 7919).as("u"))
    // per-group sketches (the materialized-view shape), merged afterwards
    val merged = df.groupBy("k").agg(Hll.hll_sketch(col("u")).as("sk"))
      .agg(Hll.hll_estimate(Hll.hll_merge(col("sk"))).as("e")).as[Long].head()
    val direct = df.agg(Hll.hll_estimate(Hll.hll_sketch(col("u"))).as("e"))
      .as[Long].head()
    assert(merged == direct,
      s"merge of partials ($merged) must equal whole-data sketch ($direct)")
  }

  test("merging cross-topic sketches counts the union, not the sum") {
    val t1 = spark.range(0, 6000).select(col("id").cast("string").as("u"))
    val t2 = spark.range(3000, 9000).select(col("id").cast("string").as("u"))
    val sk1 = t1.agg(Hll.hll_sketch(col("u")).as("sk"))
    val sk2 = t2.agg(Hll.hll_sketch(col("u")).as("sk"))
    val union = sk1.unionAll(sk2)
      .agg(Hll.hll_estimate(Hll.hll_merge(col("sk"))).as("e")).as[Long].head()
    assert(math.abs(union - 9000) < 500, s"union estimate $union (true 9000)")
    assert(union < 11000, "must not double-count the 3000 overlap")
  }

  test("small cardinalities are near-exact (linear counting range)") {
    val df = spark.range(50).select(col("id").cast("string").as("u"))
    val est = df.agg(Hll.hll_estimate(Hll.hll_sketch(col("u"))).as("e"))
      .as[Long].head()
    assert(math.abs(est - 50) <= 3,
      s"linear-counting range should be near-exact, got $est")
  }
}
