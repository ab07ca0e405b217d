package graft

import org.apache.spark.sql.SparkSession

/** Dump executed plans for registered queries (docs/PLANS.md evidence).
  * Usage: sbt "runMain graft.PlanDump /root/testdata/sf0.01 q1_pricing ..."
  * — with no query names, dumps every registered query. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n## $n\n\n```")
      println(SparkEntry.queries(n)(spark, sfDir).queryExecution.executedPlan.toString.take(4000))
      println("```")
    }
    spark.stop()
  }
}
