package graft

import graft.log.Bucketing
import org.apache.spark.sql.functions._

/** Bucketed co-located joins: same-key bucketed tables join with no
  * shuffle exchange at all. */
class BucketedJoinSpec extends SparkSpec {

  private def dropTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val loc = java.nio.file.Paths.get("spark-warehouse", name)
    if (java.nio.file.Files.exists(loc)) {
      import scala.collection.JavaConverters._
      java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  test("join of two same-bucketed tables has no shuffle exchange") {
    dropTable("orders_b"); dropTable("lineitem_b")
    val o = spark.read.parquet(s"$sf001/orders.parquet")
    val l = spark.read.parquet(s"$sf001/lineitem.parquet")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    Bucketing.writeBucketed(o, "orders_b", "o_orderkey", 4)
    Bucketing.writeBucketed(l, "lineitem_b", "o_orderkey", 4)

    // at 100 TB neither side broadcasts — force the large-table path
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val joined =
      try {
        val j = Bucketing.read(spark, "lineitem_b")
          .join(Bucketing.read(spark, "orders_b"), "o_orderkey")
          .select("o_orderkey", "o_orderpriority", "l_quantity")
        val plan = j.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"), plan.take(1200))
        assert(!plan.contains("Exchange hashpartitioning"),
          "bucketed join must not shuffle:\n" + plan.take(1200))
        assert(plan.contains("Bucketed: true"), plan.take(1200))
        j.collect() // materialize under the forced config
        j
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)

    // correctness unchanged vs plain join
    val expected = l.join(o, "o_orderkey")
      .select("o_orderkey", "o_orderpriority", "l_quantity")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).sorted
    val got = joined
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).sorted
    assert(got.toSeq == expected.toSeq)
  }
}
