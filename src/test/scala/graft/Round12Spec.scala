package graft

import graft.model.Envelope
import graft.streaming.Functions
import graft.streaming.Functions.Guarantee

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}
import scala.collection.JavaConverters._

/**
 * Round-12 contract enforcement, pinned by behavior:
 *  - the EFFECTIVELY_ONCE ordered-arrival contract is ENFORCED, not
 *    documented: an unordered multi-batch catch-up replay fails LOUDLY
 *    (the r11 probe measured the old behavior silently dropping 78% of
 *    a 100× replay; reference analog MessageDeduplication.java:330 —
 *    there producers cannot legally regress ids, here replays can);
 *  - [[Functions.orderedReplaySource]] brings the same replay INSIDE
 *    the contract: complete sink, duplicates still suppressed across
 *    trigger boundaries;
 *  - AT_MOST_ONCE vs AT_LEAST_ONCE on the SAME crash schedule (a
 *    deleted checkpoint commit, i.e. crash after sink write but before
 *    commit): ALO re-appends the replayed batch (duplicates — its
 *    contract), AMO's ack marker suppresses it (no redelivery, the
 *    reference's ack-on-receipt semantics, JavaInstanceRunnable.java:328).
 */
class Round12Spec extends SparkSpec {
  import spark.implicits._

  /** Envelope-shaped frame: (producer, seq, publish_time offset minutes,
    * value). Times are hours past a fixed 2024 base so nothing sits at
    * the epoch-zero initial watermark. */
  private def envFrame(rows: Seq[(String, Long, Long, String)]): DataFrame = {
    val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
    rows.toDF(Envelope.ProducerName, Envelope.SequenceId, "_m", Envelope.Value)
      .withColumn(Envelope.PublishTime,
        timestamp_millis(lit(base) + col("_m") * 60000L))
      .drop("_m")
  }

  /** One parquet FILE per slice with a pinned mtime (the unit of replay
    * order for the file stream source). */
  private def writeSlice(df: DataFrame, destDir: String, name: String,
                         mtimeMs: Long): Unit = {
    val tmp = Files.createTempDirectory("r12-slice")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val src = {
      val l = Files.list(tmp)
      try l.iterator().asScala.find(_.toString.endsWith(".parquet")).get
      finally l.close()
    }
    Files.createDirectories(Paths.get(destDir))
    val dst = Paths.get(destDir, name)
    Files.move(src, dst)
    Files.setLastModifiedTime(dst,
      java.nio.file.attribute.FileTime.fromMillis(mtimeMs)): Unit
  }

  private def fileStream(dir: String, schema: org.apache.spark.sql.types.StructType) =
    spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
      .option("pathGlobFilter", "*.parquet").parquet(dir)

  test("EFFECTIVELY_ONCE fails LOUDLY on a time-unordered multi-batch replay") {
    // slice A: late rows (minutes 600..604); slice A2 keeps the
    // watermark there; slice B: early rows (0..4). A replays first
    // (oldest mtime) → the watermark races to 600−60, and by batch 2
    // (Spark's late-row filter uses the one-batch-lagged watermark)
    // every B row is behind it. Before round 12 this completed
    // "successfully" with B silently missing from the sink.
    val a = envFrame((0 until 5).map(i => ("pA", 100L + i, 600L + i, s"a$i")))
    val a2 = envFrame((0 until 5).map(i => ("pA2", 150L + i, 590L + i, s"m$i")))
    val b = envFrame((0 until 5).map(i => ("pB", 200L + i, 0L + i, s"b$i")))
    val src = Files.createTempDirectory("r12-unordered").toString
    val t0 = System.currentTimeMillis() - 60000L
    writeSlice(a, src, "s0.parquet", t0)
    writeSlice(a2, src, "s1.parquet", t0 + 2000L)
    writeSlice(b, src, "s2.parquet", t0 + 4000L)
    val out = Files.createTempDirectory("r12-eo-out").toString
    val ckpt = Files.createTempDirectory("r12-eo-ckpt").toString
    val q = Functions.run(fileStream(src, a.schema), identity,
      out, ckpt, Guarantee.EffectivelyOnce, dedupLag = "1 hour")
    val ex = intercept[IllegalStateException] {
      try q.processAllAvailable() finally q.stop()
    }
    assert(ex.getMessage.contains("EFFECTIVELY_ONCE"),
      s"guard message must name the violated guarantee: ${ex.getMessage}")
    assert(ex.getMessage.contains("orderedReplaySource"),
      "guard message must point at the in-contract replay path")
  }

  test("orderedReplaySource completes the SAME replay and still dedups across triggers") {
    // the same disorder, PLUS a (producer, seq) duplicate pair whose
    // halves land in DIFFERENT time buckets (minutes 299 and 301 around
    // the bucket boundary) — the replay must keep exactly one
    val rows = (0 until 5).map(i => ("pA", 100L + i, 600L + i, s"a$i")) ++
      (0 until 5).map(i => ("pB", 200L + i, 0L + i, s"b$i")) ++
      Seq(("pC", 300L, 299L, "c-first"), ("pC", 300L, 301L, "c-dup"))
    val unordered = envFrame(scala.util.Random.shuffle(rows))
    val staging = Files.createTempDirectory("r12-ordered").toString
    val src = Functions.orderedReplaySource(unordered, Envelope.PublishTime,
      staging, buckets = 4)
    val out = Files.createTempDirectory("r12-eo2-out").toString
    val ckpt = Files.createTempDirectory("r12-eo2-ckpt").toString
    val q = Functions.run(src, identity, out, ckpt,
      Guarantee.EffectivelyOnce, dedupLag = "1 hour")
    try q.processAllAvailable() finally q.stop()
    val sink = spark.read.parquet(out)
    assert(sink.count() == 11L, "10 uniques + exactly one of the dup pair")
    assert(sink.filter(col(Envelope.ProducerName) === "pC").count() == 1L,
      "the cross-bucket duplicate must be suppressed, not double-delivered")
    assert(sink.select(Envelope.ProducerName, Envelope.SequenceId)
      .distinct().count() == 11L)
  }

  test("deleted checkpoint commit: replay redelivers through a raw sink, AMO and the txn file sink suppress it") {
    val s0 = envFrame(Seq(("p0", 1L, 0L, "v1"), ("p0", 2L, 1L, "v2")))
    val s1 = envFrame(Seq(("p0", 3L, 2L, "v3")))
    def build(): String = {
      val src = Files.createTempDirectory("r12-amo-src").toString
      val t0 = System.currentTimeMillis() - 60000L
      writeSlice(s0, src, "s0.parquet", t0)
      writeSlice(s1, src, "s1.parquet", t0 + 2000L)
      src
    }
    // crash after sink write, before checkpoint commit of batch 1 (the
    // local checksummed FS keeps a hidden .crc beside the commit — a
    // real crash loses both, so the simulation must too)
    def crash(ckpt: String): Unit = {
      Files.deleteIfExists(Paths.get(ckpt, "commits", "1"))
      Files.deleteIfExists(Paths.get(ckpt, "commits", ".1.crc")): Unit
    }
    def crashReplay(g: Guarantee): Long = {
      val src = build()
      val out = Files.createTempDirectory("r12-g-out").toString
      val ckpt = Files.createTempDirectory("r12-g-ckpt").toString
      def run() = Functions.run(fileStream(src, s0.schema), identity,
        out, ckpt, g)
      val q1 = run(); try q1.processAllAvailable() finally q1.stop()
      crash(ckpt)
      val q2 = run(); try q2.processAllAvailable() finally q2.stop()
      spark.read.parquet(out).count()
    }
    // AT_LEAST_ONCE's redelivery is the SOURCE contract: the replayed
    // epoch re-runs. Through a NON-transactional sink (plain foreachBatch
    // append — an external system without idempotence) it lands twice:
    def rawAppendReplay(): Long = {
      val src = build()
      val out = Files.createTempDirectory("r12-raw-out").toString
      val ckpt = Files.createTempDirectory("r12-raw-ckpt").toString
      def run() = fileStream(src, s0.schema).writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.write.mode("append").parquet(out)
        }.start()
      val q1 = run(); try q1.processAllAvailable() finally q1.stop()
      crash(ckpt)
      val q2 = run(); try q2.processAllAvailable() finally q2.stop()
      spark.read.parquet(out).count()
    }
    assert(rawAppendReplay() == 4L,
      "a replayed epoch re-delivers through a non-transactional sink — ALO's contract")
    // the parquet FileStreamSink is per-epoch transactional
    // (_spark_metadata skips an already-committed batch id), so the SAME
    // crash through Functions.run(AtLeastOnce) upgrades to exactly-once
    // at the sink — that sink-side idempotence is exactly what
    // EFFECTIVELY_ONCE composes with the seq-dedup:
    assert(crashReplay(Guarantee.AtLeastOnce) == 3L,
      "the transactional file sink suppresses the replayed epoch's rewrite")
    // AMO suppresses the replay at the ACK layer (marker precedes the
    // sink write), independent of any sink idempotence:
    assert(crashReplay(Guarantee.AtMostOnce) == 3L,
      "AMO's pre-sink ack marker suppresses the replayed batch — never twice")
  }

  test("AT_MOST_ONCE drops a batch acked by an attempt that died before its sink write") {
    val src = build2Slices()
    val out = Files.createTempDirectory("r12-amo2-out").toString
    val ckpt = Files.createTempDirectory("r12-amo2-ckpt")
    Files.createDirectories(ckpt.resolve("_acks"))
    Files.write(ckpt.resolve("_acks").resolve("0.acked"), Array.emptyByteArray)
    val schema = envFrame(Seq(("p0", 0L, 0L, "v"))).schema
    val q = Functions.run(fileStream(src, schema), identity,
      out, ckpt.toString, Guarantee.AtMostOnce)
    try q.processAllAvailable() finally q.stop()
    val sink = spark.read.parquet(out)
    assert(sink.count() == 1L, "epoch 0 was acked-then-lost; only slice 1 delivers")
    assert(sink.select(Envelope.SequenceId).as[Long].collect().toSet == Set(3L))
  }

  test("hybrid retrieval queries pin no storage blocks after completion") {
    // VERDICT r11 #8: rrfBatch builds on cached BM25/ANN internals —
    // the whole fused path (batch, exact-IVF, pruned-IVF) must release
    // every block it pins (the getPersistentRDDs zero-leak rule
    // Round10FixesSpec pins for the MinHash caches)
    val base = spark.sparkContext.getPersistentRDDs.size
    Seq("hybrid_rrf_batch", "hybrid_rrf_ivf", "hybrid_rrf_pruned").foreach { name =>
      SparkEntry.queries(name)(spark, sf001)
        .write.format("noop").mode("overwrite").save()
      assert(spark.sparkContext.getPersistentRDDs.size == base,
        s"$name left pinned storage blocks after completing")
    }
  }

  private def build2Slices(): String = {
    val s0 = envFrame(Seq(("p0", 1L, 0L, "v1"), ("p0", 2L, 1L, "v2")))
    val s1 = envFrame(Seq(("p0", 3L, 2L, "v3")))
    val src = Files.createTempDirectory("r12-amo2-src").toString
    val t0 = System.currentTimeMillis() - 60000L
    writeSlice(s0, src, "s0.parquet", t0)
    writeSlice(s1, src, "s1.parquet", t0 + 2000L)
    src
  }

  test("property: ordered replay completes with exact (producer, seq) dedup under random slicing") {
    // the generic contract behind function_pipeline_replay: for ANY
    // bucket count and trigger slicing, orderedReplaySource + the
    // EFFECTIVELY_ONCE pipeline deliver each (producer, seq) exactly
    // once — duplicates within dedupLag suppressed, nothing watermark-
    // dropped. Why it must hold: buckets are range-disjoint and replay
    // oldest-first, so at any trigger the watermark (prevTriggerMax −
    // lag) sits ≤ currentBucketMin − lag, and a duplicate's original
    // (≤ 30 min older than the dup, lag = 2 h) is still in state.
    val rnd = new scala.util.Random(1206L)
    (1 to 3).foreach { trial =>
      val buckets = 1 + rnd.nextInt(5)
      val perTrigger = 1 + rnd.nextInt(3)
      val n = 200 + rnd.nextInt(200)
      val base = (0 until n).map { i =>
        (s"p${rnd.nextInt(4)}", 1000L + i, rnd.nextInt(14400).toLong, s"v$i")
      }
      val dups = base.filter(_ => rnd.nextDouble() < 0.15).map {
        case (p, sq, m, v) => (p, sq, m + rnd.nextInt(30).toLong, v + "-dup")
      }
      val unordered = envFrame(rnd.shuffle(base ++ dups))
      val staging = Files.createTempDirectory(s"r12-prop-src$trial").toString
      val src = graft.streaming.Functions.orderedReplaySource(
        unordered, Envelope.PublishTime, staging, buckets, perTrigger)
      val out = Files.createTempDirectory(s"r12-prop-out$trial").toString
      val ckpt = Files.createTempDirectory(s"r12-prop-ckpt$trial").toString
      val q = Functions.run(src, identity, out, ckpt,
        Guarantee.EffectivelyOnce, dedupLag = "2 hours")
      try q.processAllAvailable() finally q.stop()
      val sink = spark.read.parquet(out)
      val label = s"trial $trial (buckets=$buckets perTrigger=$perTrigger " +
        s"n=$n dups=${dups.size})"
      assert(sink.count() == n.toLong, s"$label: exactly one row per key")
      assert(sink.select(Envelope.ProducerName, Envelope.SequenceId)
        .distinct().count() == n.toLong, s"$label: all keys present")
    }
  }

  test("AT_MOST_ONCE ack markers GC to the replayable tail (bounded metadata)") {
    val s0 = envFrame(Seq(("p0", 1L, 0L, "a")))
    val s1 = envFrame(Seq(("p0", 2L, 1L, "b")))
    val s2 = envFrame(Seq(("p0", 3L, 2L, "c")))
    val src = Files.createTempDirectory("r12-gc-src").toString
    val t0 = System.currentTimeMillis() - 60000L
    writeSlice(s0, src, "s0.parquet", t0)
    writeSlice(s1, src, "s1.parquet", t0 + 2000L)
    writeSlice(s2, src, "s2.parquet", t0 + 4000L)
    val out = Files.createTempDirectory("r12-gc-out").toString
    val ckpt = Files.createTempDirectory("r12-gc-ckpt").toString
    def run() = Functions.run(fileStream(src, s0.schema), identity,
      out, ckpt, Guarantee.AtMostOnce)
    val q1 = run(); try q1.processAllAvailable() finally q1.stop()
    def markers(): Set[String] = {
      val l = Files.list(Paths.get(ckpt, "_acks"))
      try l.iterator().asScala.map(_.getFileName.toString)
        .filter(_.endsWith(".acked")).toSet
      finally l.close()
    }
    // epoch 2's GC horizon (epochId − 1 = 1) retired marker 0 — the
    // checkpoint can only ever replay the tail, so the dir stays O(1)
    // instead of one file per epoch forever
    assert(markers() == Set("1.acked", "2.acked"), markers().toString)
    // and the kept window is exactly what a tail replay needs: crash
    // the last commit, restart — the replayed epoch's marker suppresses
    Files.deleteIfExists(Paths.get(ckpt, "commits", "2"))
    Files.deleteIfExists(Paths.get(ckpt, "commits", ".2.crc"))
    val q2 = run(); try q2.processAllAvailable() finally q2.stop()
    assert(spark.read.parquet(out).count() == 3L, "no duplicate after tail replay")
    assert(markers() == Set("1.acked", "2.acked"), markers().toString)
  }
}
