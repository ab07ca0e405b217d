package graft

import graft.model.Envelope
import graft.operators.{Compaction, Dedup, Windows}
import org.apache.spark.sql.functions._

/** Top-level so Spark can derive an Encoder. */
case class PropMsg(key: String, value: String, offset: Long,
                   ets: Long, producer: String, seq: Long)

/** Randomized property tests (SURVEY §5): operator outputs equal a naive
  * in-memory reference implementation over seeded random logs. */
class PropertySpec extends SparkSpec {
  import spark.implicits._
  private type Msg = PropMsg
  private def Msg(key: String, value: String, offset: Long,
                  ets: Long, producer: String, seq: Long): PropMsg =
    PropMsg(key, value, offset, ets, producer, seq)

  private def randomLog(seed: Long, n: Int): Seq[Msg] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      Msg(s"k${rnd.nextInt(8)}",
        if (rnd.nextInt(10) == 0) null else s"v${rnd.nextInt(100)}",
        i.toLong, rnd.nextInt(1000).toLong,
        s"p${rnd.nextInt(4)}", rnd.nextInt(50).toLong)
    }
  }

  private def toDf(log: Seq[Msg]) =
    log.toDF("key", "value", "offset", "ets", "producer_name", "sequence_id")
      .withColumn(Envelope.EventTime, timestamp_seconds(col("ets")))
      .drop("ets")

  test("compaction == naive last-write-wins for random logs (5 seeds)") {
    for (seed <- 1L to 5L) {
      val log = randomLog(seed, 300)
      val naive = log.groupBy(_.key).map { case (k, msgs) =>
        k -> msgs.maxBy(_.offset).value
      }.collect { case (k, v) if v != null => k -> v }
      val got = Compaction.publishOrder(toDf(log))
        .select("key", "value").as[(String, String)].collect().toMap
      assert(got == naive.toMap, s"seed $seed")
    }
  }

  test("event-time compaction == naive max-(event_time, offset) (5 seeds)") {
    for (seed <- 10L to 14L) {
      val log = randomLog(seed, 300)
      val naive = log.groupBy(_.key).map { case (k, msgs) =>
        k -> msgs.maxBy(m => (m.ets, m.offset)).value
      }.collect { case (k, v) if v != null => k -> v }
      val got = Compaction.eventTimeOrder(toDf(log))
        .select("key", "value").as[(String, String)].collect().toMap
      assert(got == naive.toMap, s"seed $seed")
    }
  }

  test("seq dedup == naive serialized broker check (5 seeds)") {
    for (seed <- 20L to 24L) {
      val log = randomLog(seed, 300)
      // naive: per producer in offset order, keep only strictly-increasing seqs
      val naive = log.groupBy(_.producer).flatMap { case (_, msgs) =>
        var hw = Long.MinValue
        msgs.sortBy(_.offset).flatMap { m =>
          if (m.seq > hw) { hw = m.seq; Some(m.offset) } else None
        }
      }.toSet
      val got = Dedup.dedupBatch(toDf(log))
        .select("offset").as[Long].collect().toSet
      assert(got == naive, s"seed $seed")
    }
  }

  test("verified LSH pairs == naive exact jaccard >= 0.8 over random corpora with planted dups (3 seeds)") {
    import graft.ext.MinHash
    for (seed <- 40L to 42L) {
      val rnd = new scala.util.Random(seed)
      val vocab = (0 until 300).map(i => s"w$i")
      val base = scala.collection.mutable.ArrayBuffer[String]()
      val docs = (0 until 120).map { i =>
        val text =
          if (i >= 10 && rnd.nextInt(4) == 0 && base.nonEmpty) {
            // planted near-dup: mutate ~2% of a previous doc's tokens
            val src = base(rnd.nextInt(base.length)).split(" ")
            src.map(t => if (rnd.nextInt(50) == 0)
              vocab(rnd.nextInt(vocab.size)) else t).mkString(" ")
          } else (0 until 80 + rnd.nextInt(40))
            .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
        base += text
        (i.toLong, text)
      }
      // naive truth: exact 3-gram shingle-set jaccard over all pairs
      def sh(t: String): Set[Seq[String]] =
        t.split(" ", -1).toSeq.sliding(3).filter(_.size == 3).toSet
      val truth = (for {
        a <- docs; b <- docs if a._1 < b._1
        sa = sh(a._2); sb = sh(b._2)
        u = (sa ++ sb).size if u > 0
        j = (sa & sb).size.toDouble / u if j >= 0.8
        // round like Spark's round(): BigDecimal HALF_UP — math.rint is
        // half-even and would flake on a 6th-decimal tie under a new seed
        jr = BigDecimal(j).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      } yield (a._1, b._1, jr)).toSet
      assert(truth.nonEmpty, s"seed $seed planted no dups")

      val df = docs.toDF("doc_id", "text")
      val viaMinhash = MinHash.lshVerifiedPairs(df, threshold = 0.8)
        .select("id_a", "id_b", "jac_r").as[(Long, Long, Double)].collect().toSet
      assert(viaMinhash == truth, s"minhash seed $seed")
      val viaSimhash = MinHash.simhashVerifiedPairs(df, maxHamming = 7,
          threshold = 0.8)
        .select("id_a", "id_b", "jac_r").as[(Long, Long, Double)].collect().toSet
      assert(viaSimhash == truth, s"simhash seed $seed")
    }
  }

  test("simhash pair set is invariant under bucket sharding (forced caps, 3 seeds)") {
    import graft.ext.MinHash
    // the default cap (1024) never triggers at test scale, so the
    // triangle-shard path — shard-pair keys, one-orientation pairs,
    // least/greatest normalization — gets exercised here with caps small
    // enough that EVERY bucket shards, including clone cliques that
    // collapse whole buckets onto one blk_val
    for (seed <- 50L to 52L) {
      val rnd = new scala.util.Random(seed)
      val vocab = (0 until 120).map(i => s"w$i")
      val docs = (0 until 90).map { i =>
        val text =
          if (i % 3 == 0 && i > 0)
            // heavy clone pressure: 1/3 of docs copy an earlier one
            // verbatim (identical signature → maximal bucket pile-up)
            (0 until 60).map(j => vocab((i / 3 + j) % vocab.size)).mkString(" ")
          else (0 until 50 + rnd.nextInt(30))
            .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
        (i.toLong, text)
      }
      val df = docs.toDF("doc_id", "text")
      for (mh <- Seq(3, 7)) {
        val unsharded = MinHash.simhashPairs(df, mh,
            bucketShardCap = Int.MaxValue)
          .as[(Long, Long, Int)].collect().toSet
        for (cap <- Seq(2, 5)) {
          val sharded = MinHash.simhashPairs(df, mh, bucketShardCap = cap)
            .as[(Long, Long, Int)].collect().toSet
          assert(sharded == unsharded,
            s"seed $seed maxHamming $mh cap $cap: " +
              s"missing=${(unsharded -- sharded).take(5)} " +
              s"extra=${(sharded -- unsharded).take(5)}")
        }
      }
    }
  }

  test("count windows == naive chunking (5 seeds)") {
    for (seed <- 30L to 34L) {
      val log = randomLog(seed, 200).map(m => m.copy(value = "x"))
      val size = 7
      val naive = log.groupBy(_.key).flatMap { case (k, msgs) =>
        msgs.sortBy(_.offset).grouped(size).zipWithIndex
          .filter(_._1.size == size)
          .map { case (chunk, i) => (k, i.toLong, chunk.map(_.offset).max) }
      }.toSet
      val got = Windows.countTumblingBatch(toDf(log), "key", "offset", size,
          Seq(max("offset").as("mx")))
        .select("key", "window_id", "mx").as[(String, Long, Long)]
        .collect().toSet
      assert(got == naive, s"seed $seed")
    }
  }

  test("shard packing: distributed prefix sum == naive, random corpora/budgets/widths (5 seeds)") {
    for (seed <- 40L to 44L) {
      val rnd = new scala.util.Random(seed)
      val rows = (0 until 300).map { i =>
        val stratum = rnd.nextInt(4) match {
          case 0 => null; case n => s"s$n"
        }
        // sparse, non-contiguous but UNIQUE ids (packShards orders by id;
        // duplicate ordering keys have unspecified tie order in ANY
        // engine); token counts include zeros
        (i.toLong * 5 + rnd.nextInt(5), stratum, rnd.nextInt(40).toLong)
      }
      val df = rows.toDF("doc_id", "lang", "n_tokens")
      val budget = 50L + rnd.nextInt(300)
      val width = 1L + rnd.nextInt(200)
      val dist = graft.ext.Sampling.packShards(df, "lang", "n_tokens",
          budget, bucketWidth = width)
        .select("doc_id", "shard_id").as[(Long, Long)].collect().toSet
      val naive = graft.ext.Sampling.packShardsNaive(df, "lang", "n_tokens",
          budget)
        .select("doc_id", "shard_id").as[(Long, Long)].collect().toSet
      assert(dist == naive, s"seed $seed budget $budget width $width")
    }
  }

  test("nested proto + avro roundtrips are identity over random nested values (5 seeds)") {
    import graft.functions.{AvroSerde, ProtoSerde}
    val pspec = "1:int64:a,2:string:s," +
      "3:message{1:string:lang,2:int64:n}:meta," +
      "4:map{string,string}:props,5:repeated int64:ids"
    val aschema =
      """{"type":"record","name":"t","fields":[
        |{"name":"a","type":"long"},
        |{"name":"s","type":"string"},
        |{"name":"meta","type":{"type":"record","name":"m","fields":[
        |  {"name":"lang","type":"string"},{"name":"n","type":"long"}]}},
        |{"name":"props","type":{"type":"map","values":"string"}},
        |{"name":"ids","type":{"type":"array","items":"long"}}]}""".stripMargin
    for (seed <- 70L to 74L) {
      val rnd = new scala.util.Random(seed)
      def str() = rnd.alphanumeric.take(rnd.nextInt(12)).mkString
      val rows = (0 until 200).map { i =>
        (rnd.nextLong(), str(), str(), rnd.nextLong(),
          (0 until rnd.nextInt(4)).map(j => s"k$j" -> str()).toMap,
          Seq.fill(rnd.nextInt(5))(rnd.nextLong()))
      }
      val df = rows.toDF("a", "s", "lang", "n", "props", "ids")
        .select(col("a"), col("s"),
          struct(col("lang"), col("n")).as("meta"), col("props"), col("ids"))
      def flat(d: org.apache.spark.sql.DataFrame) = d
        .select(col("a"), col("s"), col("meta.lang"), col("meta.n"),
          map_entries(col("props")).cast("array<struct<k:string,v:string>>").as("pe"),
          col("ids"))
        .withColumn("pe", array_sort(col("pe")))
        .as[(Long, String, String, Long, Seq[(String, String)], Seq[Long])]
        .collect().toSeq.sortBy(_._1)
      val expected = flat(df)
      val viaProto = flat(df.select(ProtoSerde.proto_decode(
        ProtoSerde.proto_encode(struct(df.columns.map(col).toIndexedSeq: _*), pspec),
        pspec).as("r")).select("r.*"))
      assert(viaProto == expected, s"proto roundtrip diverged, seed $seed")
      val viaAvro = flat(df.select(AvroSerde.avro_decode(
        AvroSerde.avro_encode(struct(df.columns.map(col).toIndexedSeq: _*), aschema),
        aschema).as("r")).select("r.*"))
      assert(viaAvro == expected, s"avro roundtrip diverged, seed $seed")
    }
  }

  test("assignTerciles == literal NTILE(3) on random scored tables with heavy ties (5 seeds)") {
    import org.apache.spark.sql.expressions.Window
    for (seed <- 70L to 74L) {
      val rnd = new scala.util.Random(seed)
      val langs = Seq("en", "de", "fr", "xx")
      // coarse score grid → many ties, including whole-language tie
      // classes; language sizes deliberately include 1, 2, and 3 mod 3
      val rows = (0 until 200 + rnd.nextInt(7)).map { i =>
        (i.toLong, langs(rnd.nextInt(langs.size)),
          -rnd.nextInt(6).toDouble / 2)
      }
      val scored = rows.toDF("id", "lang", "lp_mean_r")
        .withColumn("n_tri", lit(1L))
      val w = Window.partitionBy("lang")
        .orderBy(col("lp_mean_r").desc, col("id"))
      val expected = scored.withColumn("bucket",
          when(ntile(3).over(w) === 1, "head")
            .when(ntile(3).over(w) === 2, "middle").otherwise("tail"))
        .select("id", "bucket").as[(Long, String)].collect().toMap
      val got = graft.ext.LmScore.assignTerciles(scored)
        .select("id", "bucket").as[(Long, String)].collect().toMap
      assert(got == expected, s"seed $seed: " +
        (expected.keySet ++ got.keySet).filter(k =>
          expected.get(k) != got.get(k)).take(5).map(k =>
          s"$k exp=${expected.get(k)} got=${got.get(k)}").mkString(", "))
    }
  }

  test("topicStats mark-delete/backlog == naive cursor replay for random ack sets (5 seeds)") {
    for (seed <- 80L to 84L) {
      val rnd = new scala.util.Random(seed)
      val offsets = (0L until 60L)
      val log = offsets.map(o => (0, o, s"k$o", "x", "p0"))
        .toDF(Envelope.Partition, Envelope.Offset, Envelope.Key,
          Envelope.Value, Envelope.ProducerName)
      val ackSet = offsets.filter(_ => rnd.nextBoolean()).toSet
      val acks = ackSet.toSeq.map(o => (0, o)).toDF("partition", "offset")
      val out = graft.log.Admin.topicStats(log, Map("s" -> acks))
        .select("mark_delete", "backlog").as[(Long, Long)].head()
      // naive replay: mark-delete = last offset of the dense acked
      // prefix from 0; backlog = unacked count
      val naiveMd = offsets.takeWhile(ackSet.contains).lastOption.getOrElse(-1L)
      val naiveBacklog = offsets.count(!ackSet.contains(_)).toLong
      assert(out == ((naiveMd, naiveBacklog)),
        s"seed $seed: got $out want ($naiveMd, $naiveBacklog)")
    }
  }

  test("stratified sample: exact ceil(frac*n) per stratum for random fraction maps (5 seeds)") {
    for (seed <- 50L to 54L) {
      val rnd = new scala.util.Random(seed)
      val strata = Seq("a", "b", "c", "d")
      val rows = (0 until 400).map(i => (i.toLong, strata(rnd.nextInt(4))))
      val df = rows.toDF("doc_id", "lang")
      // binary-exact fractions k/16
      val fr = strata.map(s => s -> rnd.nextInt(17).toDouble / 16).toMap
      val expected = rows.groupBy(_._2).map { case (s, g) =>
        s -> math.ceil(g.size * fr(s)).toLong
      }
      val got = graft.ext.Sampling.stratifiedSample(df, "lang", fr,
          salt = s"seed$seed|")
        .groupBy("lang").count().as[(String, Long)].collect().toMap
      expected.foreach { case (s, n) =>
        assert(got.getOrElse(s, 0L) == n, s"seed $seed stratum $s")
      }
    }
  }
}
