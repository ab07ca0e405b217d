package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Materialize a K×-scaled copy of an sf directory for full-suite stress
 * benching (default 10× sf0.1 ≈ sf1.0). This data is for TIMINGS only —
 * the correctness gate always runs on the driver-shipped fixtures.
 *
 * Scaling rules keep the workload's SHAPE honest at K×:
 *  - fact tables replicate with shifted ids, foreign keys shifted in
 *    lockstep (lineitem.l_orderkey ↔ orders.o_orderkey ↔ o_custkey ↔
 *    c_custkey), so joins neither break nor fan out;
 *  - dimension tables (region/nation/supplier/part) stay 1× — TPC-H
 *    itself scales this way, and it preserves the broadcast-side sizes
 *    the plans are built around;
 *  - documents perturb ~6% of words per copy (every 17th token gets a
 *    copy suffix): cross-copy 3-gram Jaccard lands ≈0.7, BELOW the
 *    0.8/0.9 near-dup thresholds, so planted near-dup pairs scale
 *    LINEARLY with K instead of quadratically (identical copies would
 *    manufacture K² pair blowup that says nothing about plan quality);
 *  - embeddings rotate by copy index (norm-preserving, cross-copy
 *    cosine ≈ random) for the same reason.
 *
 * Usage: SPARK_GRAFT_SCALE=10 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
 *        SPARK_GRAFT_OUT=/tmp/graft_sf1 sbt "runMain graft.ScaleUp"
 */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val k = sys.env.getOrElse("SPARK_GRAFT_SCALE", "10").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val outDir = sys.env.getOrElse("SPARK_GRAFT_OUT", "/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config(graft.log.DirectCommitProtocol.Key, graft.log.DirectCommitProtocol.Value)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val Shift = 100000000L
    def read(t: String) = spark.read.parquet(s"$sfDir/$t.parquet")
    def write(df: DataFrame, t: String): Unit = {
      df.write.mode("overwrite").parquet(s"$outDir/$t.parquet")
      println(s"[scaleup] $t: ${spark.read.parquet(s"$outDir/$t.parquet").count()} rows")
    }

    /** K copies, each id column shifted by i·Shift (K× rows, K× keys). */
    def replicate(df: DataFrame, idCols: Seq[String])
                 (perCopy: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame =
      (0 until k).map { i =>
        perCopy(idCols.foldLeft(df)((d, c) =>
          d.withColumn(c, col(c) + lit(i * Shift))), i)
      }.reduce(_.unionByName(_))

    // dims stay 1× (broadcast-side sizes preserved)
    Seq("region", "nation", "supplier", "part").foreach(t => write(read(t), t))

    write(replicate(read("customer"), Seq("c_custkey"))(), "customer")
    write(replicate(read("orders"), Seq("o_orderkey", "o_custkey"))(), "orders")
    write(replicate(read("lineitem"), Seq("l_orderkey"))(), "lineitem")
    write(replicate(read("events"), Seq("event_id", "user_id"))(), "events")

    // every 17th word gets a per-copy suffix → cross-copy Jaccard ≈ 0.7
    write(replicate(read("documents"), Seq("doc_id")) { (d, i) =>
      if (i == 0) d
      else d.withColumn("text",
        array_join(
          zip_with(split(col("text"), " "),
            sequence(lit(0), size(split(col("text"), " ")) - 1),
            (w, p) => when((p + i) % 17 === 0, concat(w, lit(s"_$i")))
              .otherwise(w)),
          " "))
    }, "documents")

    // rotate the vector by the copy index (norm-preserving; cross-copy
    // cosine ≈ random so near-dup pairs don't explode quadratically)
    write(replicate(read("embeddings"), Seq("vec_id")) { (d, i) =>
      if (i == 0) d
      else d.withColumn("embedding",
        concat(slice(col("embedding"), i + 1, 64 - i),
          slice(col("embedding"), 1, i)))
    }, "embeddings")

    spark.stop()
  }
}
