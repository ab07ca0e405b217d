package graft

import graft.sources.DataGeneratorSource

import org.apache.spark.sql.functions._

class DataGeneratorSourceSpec extends SparkSpec {

  test("deterministic: same (seed, n) regenerates identical rows; seeds diverge") {
    val a = DataGeneratorSource.persons(spark, 100, "s1").collect()
    val b = DataGeneratorSource.persons(spark, 100, "s1").collect()
    val c = DataGeneratorSource.persons(spark, 100, "s2").collect()
    assert(a.toSeq === b.toSeq)
    assert(a.map(_.getString(1)).toSeq !== c.map(_.getString(1)).toSeq)
  }

  test("field domains: ranges, formats, nested company fields stay parallel") {
    val df = DataGeneratorSource.persons(spark, 500, "dom").cache()
    try {
      assert(df.count() === 500)
      assert(df.filter(col("age") < 18 || col("age") > 80).count() === 0)
      assert(df.filter(!col("sex").isin("MALE", "FEMALE")).count() === 0)
      assert(df.filter(!col("email").rlike(
        "^[a-z]+\\.[a-z]+\\d+@(mail\\.example\\.com|post\\.example\\.net|box\\.example\\.org)$"))
        .count() === 0)
      assert(df.filter(!col("telephone_number").rlike("^555-\\d{4}$")).count() === 0)
      // one company draw indexes parallel (name, domain) vocab — email
      // always matches the domain of the same index
      assert(df.filter(col("company_email") =!= concat(lit("contact@"), col("company_domain")))
        .count() === 0)
      // nullable fields actually go null sometimes, but not always
      val mids = df.filter(col("middle_name").isNull).count()
      assert(mids > 0 && mids < 500)
      assert(df.filter(col("date_of_birth") < lit("1950-01-01")).count() === 0)
    } finally df.unpersist(): Unit
  }

  test("generation is shuffle-free at any parallelism") {
    val plan = DataGeneratorSource.persons(spark, 10000, "p")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"generator plan shuffles:\n$plan")
  }

  test("streaming variant emits a prefix-consistent stream of the same rows") {
    val q = DataGeneratorSource.personsStream(spark, sleepBetweenMessagesMs = 1L)
      .writeStream.format("memory").queryName("dg_stream").start()
    try {
      val deadline = System.currentTimeMillis() + 30000
      while (spark.table("dg_stream").isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      val got = spark.table("dg_stream").orderBy("person_id").limit(5).collect()
      assert(got.nonEmpty, "rate stream produced no rows in 30s")
      // every streamed row equals the batch derivation at the same id
      val ids = got.map(_.getLong(0))
      val expect = DataGeneratorSource.persons(spark, ids.max + 1, "stream")
        .filter(col("person_id").isin(ids.toIndexedSeq: _*))
        .orderBy("person_id").collect()
      assert(got.toSeq === expect.toSeq)
    } finally {
      q.stop()
      spark.sql("DROP TABLE IF EXISTS dg_stream"): Unit
    }
  }

  test("sleep pacing validated") {
    intercept[IllegalArgumentException](
      DataGeneratorSource.personsStream(spark, sleepBetweenMessagesMs = 0L))
  }
}
