package graft

import graft.log.{Admin, TopicLog, Txn}
import graft.model.{Envelope, TopicName}
import graft.operators.{Chunking, Produce}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Chunking, routing modes, crypto, admin jobs, transactions-lite,
  * multimodal plumbing, SQL registration. */
class AdminChunkTxnSpec extends SparkSpec {
  import spark.implicits._

  private def freshLog(parts: Int = 4): TopicLog = {
    val root = Files.createTempDirectory("graft-admin").toString
    new TopicLog(spark, root, TopicName.parse("t"), numPartitions = parts)
  }

  private def batch(ids: Range) =
    ids.map(i => (s"u${i % 7}", s"payload-$i", s"prod-${i % 3}", i.toLong, i.toLong))
      .toDF(Envelope.Key, Envelope.Value, Envelope.ProducerName,
        Envelope.SequenceId, "t")
      .withColumn(Envelope.PublishTime, timestamp_seconds(col("t"))).drop("t")

  test("chunk split + reassemble round-trips payloads over the chunk size") {
    val docs = Seq((1L, "A" * 25 + "B" * 25 + "C" * 10), (2L, "short"))
      .toDF("id", "payload")
    val chunks = Chunking.split(docs, "payload", chunkSize = 25, uuidCols = Seq("id"))
    assert(chunks.filter($"chunk_uuid" === "1").count() == 3)
    assert(chunks.filter($"chunk_uuid" === "2").count() == 1)
    val back = Chunking.reassemble(chunks)
      .select($"chunk_uuid", $"payload").as[(String, String)].collect().toMap
    assert(back("1") == "A" * 25 + "B" * 25 + "C" * 10)
    assert(back("2") == "short")
  }

  test("reassemble drops incomplete chunk groups") {
    val docs = Seq((1L, "x" * 50)).toDF("id", "payload")
    val chunks = Chunking.split(docs, "payload", 20, Seq("id"))
      .filter($"chunk_id" =!= 1) // lose the middle chunk
    assert(Chunking.reassemble(chunks).count() == 0)
  }

  test("routing: single-partition, round-robin spread, custom") {
    val unkeyed = (0 until 100).map(i => (null: String, s"v$i"))
      .toDF(Envelope.Key, Envelope.Value)
    val single = Produce.route(unkeyed, Produce.Routing.SinglePartition, 4)
    assert(single.select(Envelope.Partition).distinct().as[Int].collect().toSeq == Seq(0))
    val rr = Produce.route(unkeyed, Produce.Routing.RoundRobin, 4)
    assert(rr.select(Envelope.Partition).distinct().count() > 1)
    val custom = Produce.route(unkeyed, Produce.Routing.Custom(lit(2)), 4)
    assert(custom.select(Envelope.Partition).distinct().as[Int].collect().toSeq == Seq(2))
  }

  test("message crypto round-trips through aes encrypt/decrypt") {
    val df = Seq(("k1", "secret-payload")).toDF(Envelope.Key, Envelope.Value)
    val key = "0123456789abcdef" // 16-byte AES key
    val enc = Produce.encryptValue(df, key)
    assert(enc.select(Envelope.Value).as[String].head() != "secret-payload")
    val dec = Produce.decryptValue(enc, key)
    assert(dec.select(Envelope.Value).as[String].head() == "secret-payload")
  }

  test("aes-gcm kernel is layout-compatible with Spark's builtin, both directions") {
    val key = "0123456789abcdef"
    val df = Seq(("k1", "cross-engine-payload")).toDF(Envelope.Key, Envelope.Value)
    // our kernel's output decrypts through Spark's aes_decrypt
    val ours = Produce.encryptValue(df, key)
    val viaSpark = ours.select(
      aes_decrypt(unbase64(col(Envelope.Value)), lit(key)).cast("string").as("v"))
    assert(viaSpark.as[String].head() == "cross-engine-payload")
    // Spark's aes_encrypt output decrypts through our kernel
    val sparkEnc = df.withColumn(Envelope.Value,
      base64(aes_encrypt(col(Envelope.Value).cast("binary"), lit(key))))
    val viaOurs = Produce.decryptValue(sparkEnc, key)
    assert(viaOurs.select(Envelope.Value).as[String].head() == "cross-engine-payload")
  }

  private def parquetFiles(log: TopicLog): Int = {
    import scala.collection.JavaConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(log.name.path(log.root)))
      .iterator().asScala
      .count(p => p.toString.endsWith(".parquet") &&
        !p.toString.contains("_cold"))
  }

  test("retention trim deletes fully-expired files, truncate removes all") {
    val log = freshLog()
    log.append(batch(0 until 50))    // publish_time seconds 0..49 (1970)
    assert(Admin.retentionTrim(log, nowMs = 100000L, retentionMs = 10000L) > 0)
    assert(parquetFiles(log) == 0)   // everything was ancient
    val log2 = freshLog()
    log2.append(batch(0 until 30))
    assert(Admin.truncate(log2) > 0)
    assert(parquetFiles(log2) == 0)
  }

  test("offload moves cold files; tiered read still sees every row") {
    val log = freshLog()
    log.append(batch(0 until 40))
    val hw1 = log.highWater().values.max  // first-batch files all <= hw1
    log.append(batch(40 until 80))
    val total = log.read().count()
    val moved = Admin.offload(log, beforeOffset = hw1)
    assert(moved > 0)
    assert(Admin.readTiered(log).count() == total)
  }

  test("coalesceFiles preserves data while reducing file count") {
    val log = freshLog()
    log.append(batch(0 until 30))
    log.append(batch(30 until 60))
    val before = log.read().orderBy(Envelope.Partition, Envelope.Offset)
      .select(Envelope.Value).as[String].collect().toSeq
    Admin.coalesceFiles(log, filesPerPartition = 1)
    val after = log.read().orderBy(Envelope.Partition, Envelope.Offset)
      .select(Envelope.Value).as[String].collect().toSeq
    assert(after == before)
  }

  test("backlog quota flags partitions over quota with eviction cursor") {
    val log = freshLog(2)
    log.append(batch(0 until 100))
    val verdict = Admin.backlogQuota(log.read(), Map(0 -> -1L, 1 -> -1L),
      quotaMessages = 10)
    val over = verdict.filter($"over_quota").count()
    assert(over == 2)
    val evict = verdict.filter($"evict_to".isNotNull).count()
    assert(evict == 2)
  }

  test("READ_COMMITTED vs READ_UNCOMMITTED across the manifest boundary") {
    import graft.log.TopicLog.IsolationLevel
    val log = freshLog(2)
    log.append(batch(0 until 20))
    // stageAppend is the in-flight-transaction phase (Txn.commit runs it
    // before the marker): data on disk, manifest unpublished
    val staged = log.stageAppend(batch(20 until 30))
    assert(log.read().count() == 20, "default read is READ_COMMITTED")
    assert(log.read(IsolationLevel.ReadCommitted).count() == 20)
    val dirty = log.read(IsolationLevel.ReadUncommitted)
    assert(dirty.count() == 30, "dirty read must surface the staged epoch")
    // the dirty rows sit above the committed high-water per partition
    val hw = log.highWater()
    val above = dirty.filter(hw.map { case (p, o) =>
      (col(Envelope.Partition) === p) && (col(Envelope.Offset) > o)
    }.reduce(_ || _)).count()
    assert(above == 10)
    log.publishManifest(staged)
    assert(log.read().count() == 30)
    assert(log.read(IsolationLevel.ReadUncommitted).count() == 30,
      "a committed epoch must not double-count under READ_UNCOMMITTED")
    // a staged epoch whose only parquet lives under _temporary (a write
    // in flight / crashed mid-write) must not crash or surface rows
    val base = java.nio.file.Paths.get(log.name.path(log.root),
      "_staging", "99", "_temporary", "0")
    Files.createDirectories(base)
    Files.write(base.resolve("part-0.parquet"), Array[Byte](1, 2, 3))
    assert(log.read(IsolationLevel.ReadUncommitted).count() == 30,
      "hidden-dir-only staged epochs must be invisible")
  }

  test("two healers completing the same staged epoch race without losing rows") {
    // publishManifest, Txn.recover and a READ_UNCOMMITTED reader may all
    // call completeStagedMoves for one epoch concurrently; per-file move
    // races must resolve silently with every row visible exactly once
    val log = freshLog(2)
    log.append(batch(0 until 10))
    val staged = log.stageAppend(batch(10 until 40))
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(2)
    val gate = new CountDownLatch(1)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    (1 to 2).foreach { _ =>
      pool.execute(() => {
        gate.await()
        try log.publishManifest(staged)
        catch { case t: Throwable => errs.add(t) }
      })
    }
    gate.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(60, TimeUnit.SECONDS))
    assert(errs.isEmpty, s"concurrent healers must not throw: ${errs.peek()}")
    assert(log.read().count() == 40, "every committed row visible exactly once")
  }

  test("publishManifest hammer: six republishers per epoch, the tmp sweep never breaks an identical commit") {
    // ADVICE r7 medium: the winner's leftover sweep could delete a
    // concurrent publisher's tmp between its write and createLink,
    // throwing NoSuchFileException out of an IDENTICAL republish.
    // Six concurrent identical publishers × four epochs keeps several
    // losers inside that window while a winner sweeps; the fix treats
    // a swept tmp + existing target as a lost race, so every call must
    // return silently and every row stay exactly-once visible.
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val log = freshLog(2)
    log.append(batch(0 until 5))
    var expected = 5L
    (1 to 4).foreach { r =>
      val staged = log.stageAppend(batch(r * 30 until r * 30 + 30))
      val pool = Executors.newFixedThreadPool(6)
      val gate = new CountDownLatch(1)
      val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      (1 to 6).foreach { _ =>
        pool.execute(() => {
          gate.await()
          try log.publishManifest(staged)
          catch { case t: Throwable => errs.add(t) }
        })
      }
      gate.countDown()
      pool.shutdown()
      assert(pool.awaitTermination(60, TimeUnit.SECONDS))
      assert(errs.isEmpty,
        s"epoch round $r: identical republish threw: ${errs.peek()}")
      expected += 30
      assert(log.read().count() == expected,
        s"epoch round $r: rows must be exactly-once visible")
    }
  }

  test("atomicCreate: first writer wins, loser sees the winner's content, tmp never lingers") {
    import graft.log.TopicLog
    val dir = Files.createTempDirectory("graft-atomic")
    // the seam's Hadoop-path form — resolves to RawLocalFileSystem here,
    // where atomicCreate runs the hard-link first-writer-wins protocol
    val target = graft.log.PathIO.path(dir.toString, "0.commit")
    val targetNio = dir.resolve("0.commit")
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(2)
    val gate = new CountDownLatch(1)
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    Seq("content-A", "content-B").foreach { c =>
      pool.execute(() => {
        gate.await()
        if (TopicLog.atomicCreate(target, c.getBytes)) wins.incrementAndGet(): Unit
      })
    }
    gate.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(30, TimeUnit.SECONDS))
    assert(wins.get() == 1, "exactly one writer must win")
    val content = new String(Files.readAllBytes(targetNio))
    assert(content == "content-A" || content == "content-B")
    // no tmp leftovers on the non-crash path
    val leftovers = Files.list(dir).iterator()
    val names = new scala.collection.mutable.ArrayBuffer[String]
    while (leftovers.hasNext) names += leftovers.next().getFileName.toString
    assert(names.toSeq == Seq("0.commit"), s"tmp leftovers: $names")
    // a conflicting re-publish through the manifest path still fails loudly
    assert(!TopicLog.atomicCreate(target, "content-C".getBytes),
      "existing target must never be replaced")
    assert(new String(Files.readAllBytes(targetNio)) == content)
  }

  test("shadow topic: read-only view tracking the source, independent cursors") {
    import graft.log.ShadowTopic
    import graft.streaming.{Subscription, SubscriptionType}
    val log = freshLog(2)
    log.append(batch(0 until 20))
    val shadow = new ShadowTopic(log, TopicName.parse("t-shadow"))
    assert(shadow.read().count() == 20)
    assert(shadow.read().select(Envelope.Topic).distinct().as[String].head()
      == "persistent://public/default/t-shadow",
      "shadow rows must carry the shadow topic name")
    intercept[UnsupportedOperationException] { shadow.append(batch(0 until 5)) }
    log.append(batch(20 until 30))
    assert(shadow.read().count() == 30, "shadow must track source appends")
    intercept[IllegalArgumentException] {
      new ShadowTopic(log, log.name) // self-shadow rejected
    }
    val ckpt = Files.createTempDirectory("graft-shadow-ckpt").toString
    val srcSub = new Subscription(log, "s", SubscriptionType.Exclusive, ckpt)
    val shSub = shadow.subscription("s", SubscriptionType.Exclusive, ckpt)
    assert(srcSub.checkpointDir != shSub.checkpointDir,
      "same-named subscriptions must cursor independently")
    // the shadow SUBSCRIPTION stream must also carry the shadow topic
    // name (same relabeling as the batch read view)
    val view = "shadow_sub_" + java.lang.Long.toHexString(System.nanoTime())
    val q = shSub.stream().writeStream.format("memory").queryName(view)
      .option("checkpointLocation",
        Files.createTempDirectory("graft-shadow-q").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    val topics = spark.table(view).select(Envelope.Topic)
      .distinct().as[String].collect().toSet
    spark.catalog.dropTempView(view)
    assert(topics == Set("persistent://public/default/t-shadow"),
      s"shadow subscription rows must carry the shadow topic: $topics")
  }

  test("topicStats: per-subscription mark-delete and backlog semantics") {
    // one partition, offsets 0..9; subA acked {1,2,4} (gap at 0 →
    // mark_delete -1), subB acked {0,1,2,5} (dense prefix to 2), subC
    // acked everything (mark_delete = head, backlog 0)
    val log = (0L until 10L).map(o =>
        (0, o, s"k$o", "x" * 10, "p0"))
      .toDF(Envelope.Partition, Envelope.Offset, Envelope.Key,
        Envelope.Value, Envelope.ProducerName)
    def acks(os: Long*) = os.map(o => (0, o)).toDF("partition", "offset")
    val out = Admin.topicStats(log, Map(
        "subA" -> acks(1, 2, 4),
        "subB" -> acks(0, 1, 2, 5),
        "subC" -> acks(0L until 10L: _*)))
      .select("subscription", "mark_delete", "backlog", "msg_count",
        "storage_bytes", "head_offset", "producers")
      .as[(String, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(out("subA") == (("subA", -1L, 7L, 10L, 120L, 9L, 1L)))
    assert(out("subB") == (("subB", 2L, 6L, 10L, 120L, 9L, 1L)))
    assert(out("subC") == (("subC", 9L, 0L, 10L, 120L, 9L, 1L)))
  }

  test("topicInternalStats: per-partition file topology from the log") {
    val log = freshLog(2)
    log.append(batch(0 until 40))
    log.append(batch(40 until 60))
    val st = Admin.topicInternalStats(log)
      .select("partition", "n_files", "entries", "storage_bytes", "head_offset")
      .as[(Int, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(st.keySet == Set(0, 1))
    assert(st.values.map(_._3).sum == 60L, "entries must cover both appends")
    assert(st.values.forall(_._2 >= 2L), "two appends → ≥2 files per partition")
    assert(st.values.forall(_._4 > 0L), "file sizes must be real")
    // head offset per partition = entries - 1 (dense per-partition offsets)
    assert(st.values.forall(v => v._5 == v._3 - 1))
  }

  test("updatePartitions: old rows keep partition/order, new appends route over the new count") {
    val tl2 = freshLog(parts = 2)
    tl2.append(batch(0 until 60))
    val before = tl2.read()
      .select(Envelope.Partition, Envelope.Offset, Envelope.SequenceId)
      .collect().toSet
    assert(before.map(_.getInt(0)).forall(p => p >= 0 && p < 2))

    // shrink is rejected like the reference's updatePartitionedTopic
    intercept[IllegalArgumentException](Admin.updatePartitions(tl2, 2))

    val tl4 = Admin.updatePartitions(tl2, 4)
    tl4.append(batch(60 until 120))
    val after = tl4.read()
    // every pre-expansion row is intact: same partition, offset, payload
    val stillThere = after.filter(col(Envelope.SequenceId) < 60)
      .select(Envelope.Partition, Envelope.Offset, Envelope.SequenceId)
      .collect().toSet
    assert(stillThere == before)
    // post-expansion rows spread over the widened ring (some beyond p1)
    val newParts = after.filter(col(Envelope.SequenceId) >= 60)
      .select(Envelope.Partition).distinct().collect().map(_.getInt(0)).toSet
    assert(newParts.exists(_ >= 2), s"expansion unused: $newParts")
    // new routing = murmur3(key) % 4 exactly
    val misrouted = after.filter(col(Envelope.SequenceId) >= 60)
      .filter(col(Envelope.Partition) =!=
        pmod(graft.functions.Murmur3Pulsar.pulsar_hash(col(Envelope.Key)), lit(4)))
    assert(misrouted.count() == 0)
    // offsets stay dense and FIFO per partition across the boundary
    val gaps = after.groupBy(Envelope.Partition)
      .agg(count(lit(1)).as("n"), (max(Envelope.Offset) + 1).as("m"))
      .filter(col("n") =!= col("m"))
    assert(gaps.count() == 0, "offset gaps after expansion")

    // a write through the STALE 2-partition handle must not truncate the
    // manifest's high-water to its own range: rows committed on p2/p3
    // stay visible and their offsets never restart
    val p23Before = after.filter(col(Envelope.Partition) >= 2).count()
    assert(p23Before > 0)
    tl2.append(batch(120 until 150))
    val viaStale = tl2.read()
    assert(viaStale.filter(col(Envelope.Partition) >= 2).count() == p23Before,
      "stale-handle append hid expanded-partition rows")
    tl4.append(batch(150 until 180))
    val dupIds = tl4.read()
      .groupBy(Envelope.Partition, Envelope.Offset)
      .agg(count(lit(1)).as("n")).filter(col("n") > 1)
    assert(dupIds.count() == 0, "offset reuse after stale-handle append")
  }

  test("txn commit makes all topics visible; abort leaves nothing") {
    val root = Files.createTempDirectory("graft-txn").toString
    val l1 = new TopicLog(spark, root, TopicName.parse("t1"))
    val l2 = new TopicLog(spark, root, TopicName.parse("t2"))
    Txn.begin(root).produce(l1, batch(0 until 10))
      .produce(l2, batch(0 until 5)).commit()
    assert(l1.read().count() == 10 && l2.read().count() == 5)
    Txn.begin(root).produce(l1, batch(10 until 20)).abort()
    assert(l1.read().count() == 10, "aborted txn must be invisible")
  }

  test("multimodal: decode meta, features, resize plan, frame sampling") {
    import graft.ext.Multimodal
    val media = Seq((1L, "fake-image-bytes-aaaa"), (2L, "bb"))
      .toDF("id", "s").withColumn("payload", $"s".cast("binary")).drop("s")
    val meta = Multimodal.withDecodedMeta(media, "payload")
    assert(meta.select($"media_meta.width").as[Int].collect().forall(_ >= 64))
    val feats = Multimodal.withFeatures(media, "payload", dim = 16)
    assert(feats.select(size($"features")).as[Int].collect().forall(_ == 16))
    // determinism: same bytes -> same features
    val f2 = Multimodal.withFeatures(media, "payload", dim = 16)
    assert(feats.select("id", "features").collect().toSeq ==
      f2.select("id", "features").collect().toSeq)
    val resized = Multimodal.withResizeTarget(meta, maxSide = 128)
    assert(resized.filter($"target_width" > 128 || $"target_height" > 128).count() == 0)
    val frames = Multimodal.sampleFrames(meta, everyMs = 50)
    assert(frames.count() >= meta.count())
  }

  test("SQL registration exposes custom expressions") {
    graft.functions.Registry.registerAll(spark)
    val h = spark.sql("SELECT pulsar_hash('user-1') AS h").as[Int].head()
    assert(h == graft.functions.Murmur3Pulsar.hashBytes("user-1".getBytes("UTF-8")))
    val c = spark.sql(
      "SELECT cosine_sim(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
      .as[Double].head()
    assert(math.abs(c - 1.0) < 1e-12)
    // the sketch trio is SQL-reachable end to end: build, merge, probe
    val cmsEst = spark.sql(
      """SELECT cms_estimate(cms_merge(sk), 'k3') AS e FROM (
        |  SELECT id % 4 AS g, cms_sketch(concat('k', CAST(id % 10 AS STRING))) AS sk
        |  FROM range(1000) GROUP BY id % 4)""".stripMargin).as[Long].head()
    assert(cmsEst >= 100L) // true count of k3 is 100; CMS never undercounts
    val kmvMed = spark.sql(
      """SELECT kmv_quantile(kmv_merge(sk), 0.5D) AS m FROM (
        |  SELECT id % 4 AS g, kmv_sketch(CAST(id AS DOUBLE), id, 64) AS sk
        |  FROM range(1000) GROUP BY id % 4)""".stripMargin).as[Double].head()
    assert(kmvMed > 100.0 && kmvMed < 900.0) // sampled median of 0..999
  }
}
