package graft

import graft.ext.Hybrid
import graft.log.{TopicLog, Txn}
import graft.model.{Envelope, TopicName}

import org.apache.spark.sql.functions._

import java.nio.file.Files

/**
 * Round-11 additions, pinned by behavior:
 *  - transaction isolation on the read path: READ_COMMITTED sees only
 *    committed slices, READ_UNCOMMITTED adds in-flight staged epochs,
 *    and an aborted transaction is invisible at both levels
 *    (reference TransactionIsolationLevel semantics);
 *  - the positioned Reader scan (Reader.java:49 non-durable scan);
 *  - hybrid BM25 + cosine retrieval fused by reciprocal rank.
 */
class Round11Spec extends SparkSpec {
  import spark.implicits._

  private def mkLog(root: String, topic: String): TopicLog =
    new TopicLog(spark, root,
      TopicName.parse(s"persistent://public/default/$topic"), 2)

  private def batch(ids: Range, keyOf: Int => String) =
    ids.map(i => (keyOf(i), s"v$i", new java.sql.Timestamp(1700000000000L + i * 1000L),
        i.toLong, s"p0"))
      .toDF("key", "value", "publish_time", "sequence_id", "producer_name")
      .withColumn("event_time", col("publish_time"))

  test("txn isolation: committed visible, aborted gone, staged only under READ_UNCOMMITTED") {
    val root = Files.createTempDirectory("graft-txn-iso").toString
    val log = mkLog(root, "iso")
    Txn.begin(root).produce(log, batch(0 until 20, i => s"k$i")).commit()
    Txn.begin(root).produce(log, batch(20 until 40, i => s"a$i")).abort()
    log.stageAppend(batch(40 until 50, i => s"s$i")): Unit

    val committed = log.read(TopicLog.IsolationLevel.ReadCommitted)
    assert(committed.count() == 20)
    assert(committed.filter(col(Envelope.Key).startsWith("a")).isEmpty)
    assert(committed.filter(col(Envelope.Key).startsWith("s")).isEmpty)

    val dirty = log.read(TopicLog.IsolationLevel.ReadUncommitted)
    assert(dirty.count() == 30)
    assert(dirty.filter(col(Envelope.Key).startsWith("a")).isEmpty,
      "aborted slice stays invisible even to dirty reads — the documented " +
        "divergence from the reference's READ_UNCOMMITTED (which delivers " +
        "aborted ledger data): abort here discards before persistence")
    assert(dirty.filter(col(Envelope.Key).startsWith("s")).count() == 10)
    // staged offsets stack densely above the committed high-water —
    // the arithmetic txn_uncommitted's oracle depends on
    val perPartition = dirty.groupBy(Envelope.Partition)
      .agg(count(lit(1)).as("n"), max(Envelope.Offset).as("mx"))
      .collect()
    perPartition.foreach { r =>
      assert(r.getAs[Long]("mx") == r.getAs[Long]("n") - 1,
        s"offsets must be dense per partition: $r")
    }
  }

  test("positioned reader returns the offset-bounded tail of one partition") {
    val root = Files.createTempDirectory("graft-reader").toString
    val log = mkLog(root, "rd")
    log.append(batch(0 until 30, i => s"k${i % 6}"))
    val hw = log.highWater()
    val p = hw.keys.head
    val from = 3L
    val tail = log.readFrom(p, from)
    assert(tail.agg(min(Envelope.Offset)).as[Long].head() == from)
    assert(tail.count() == hw(p) - from + 1)
    assert(tail.select(Envelope.Partition).distinct().as[Int].collect().toSeq == Seq(p))
  }

  test("hybrid RRF: fused ranking rewards docs present in both legs") {
    val docs = Seq(
      (0L, "alpha beta gamma delta common word soup here"),
      (1L, "fast hash join order fast hash join order"),
      (2L, "fast hash something else entirely different tokens"),
      (3L, "unrelated text with no query terms at all"),
      (4L, "join order join order hash fast query terms"))
      .toDF("doc_id", "text")
    // embeddings: vec_id 0 is the query; 1 and 4 near it, 2 orthogonal-ish
    def v(xs: Double*) = xs.toArray.map(_.toFloat)
    val vecs = Seq(
      (0L, v(1, 0, 0, 0)), (1L, v(0.9, 0.1, 0, 0)), (2L, v(0, 1, 0, 0)),
      (3L, v(0, 0, 1, 0)), (4L, v(0.8, 0.2, 0, 0)))
      .toDF("vec_id", "embedding")
    val out = Hybrid.rrf(docs, vecs, "fast hash join order", queryVecId = 0L,
      kLex = 3, kVec = 3, kOut = 5).collect()
    assert(out.nonEmpty && out.length <= 5)
    val byId = out.map(r => r.getAs[Long]("doc_id") -> r).toMap
    // docs 1 and 4 rank in both legs; doc 3 in neither
    assert(byId.contains(1L) && byId.contains(4L))
    assert(!byId.contains(3L))
    val top = out.head
    assert(top.getAs[Long]("doc_id") == 1L,
      s"doc 1 is rank-1 in both legs and must fuse first: ${out.toSeq}")
    assert(top.getAs[Long]("lex_rank") == 1L && top.getAs[Long]("vec_rank") == 1L)
    // fused score is exactly the two-leg reciprocal sum
    assert(math.abs(top.getAs[Double]("rrf") - (1.0 / 61 + 1.0 / 61)) < 1e-9)
    // a doc in ONE leg scores below a doc at the same ranks in both
    val rrfs = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("rrf")).toMap
    assert(rrfs(1L) > rrfs.collect { case (k, v) if k != 1L => v }.max)
  }

  test("batch hybrid RRF with one query reproduces the single-query fusion") {
    val docs = Seq(
      (0L, "alpha beta gamma delta common word soup here"),
      (1L, "fast hash join order fast hash join order"),
      (2L, "fast hash something else entirely different tokens"),
      (3L, "unrelated text with no query terms at all"),
      (4L, "join order join order hash fast query terms"))
      .toDF("doc_id", "text")
    def v(xs: Double*) = xs.toArray.map(_.toFloat)
    val vecs = Seq(
      (0L, v(1, 0, 0, 0)), (1L, v(0.9, 0.1, 0, 0)), (2L, v(0, 1, 0, 0)),
      (3L, v(0, 0, 1, 0)), (4L, v(0.8, 0.2, 0, 0)))
      .toDF("vec_id", "embedding")
    val single = Hybrid.rrf(docs, vecs, "fast hash join order", 0L,
        kLex = 3, kVec = 3, kOut = 5)
      .select("doc_id", "lex_rank", "vec_rank", "rrf").collect().toSeq
    val batch = Hybrid.rrfBatch(docs, vecs, Seq((0L, "fast hash join order")),
        kLex = 3, kVec = 3, kOut = 5)
      .select("doc_id", "lex_rank", "vec_rank", "rrf").collect().toSeq
    assert(batch == single,
      s"batch-of-one must equal the single-query path:\n$batch\n$single")
  }

  test("batch hybrid RRF keeps per-query rankings independent") {
    val docs = Seq(
      (0L, "fast hash join order"), (1L, "stream window agg batch"),
      (2L, "fast hash stream window"), (3L, "nothing relevant here"))
      .toDF("doc_id", "text")
    def v(xs: Double*) = xs.toArray.map(_.toFloat)
    val vecs = Seq(
      (0L, v(1, 0, 0)), (1L, v(0, 1, 0)), (2L, v(0.7, 0.7, 0)), (3L, v(0, 0, 1)))
      .toDF("vec_id", "embedding")
    val out = Hybrid.rrfBatch(docs, vecs,
      Seq((0L, "fast hash join order"), (1L, "stream window agg batch")),
      kLex = 3, kVec = 2, kOut = 3)
    val byQuery = out.collect().groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.keySet == Set(0L, 1L))
    def ranked(q: Long) = byQuery(q).sortBy(_.getAs[Long]("fused_rank"))
      .map(_.getAs[Long]("doc_id")).toSeq
    // doc 2 is strong in BOTH legs of BOTH queries (each query's own doc
    // is excluded from its vector leg) and must fuse first for both;
    // second place is each query's own lexical exact match — per-query
    // rankings are independent
    assert(ranked(0L).take(2) == Seq(2L, 0L), s"q0: ${ranked(0L)}")
    assert(ranked(1L).take(2) == Seq(2L, 1L), s"q1: ${ranked(1L)}")
    // doc 3 matches neither query lexically and loses every vector
    // tie-break at kVec=2 — it must not appear at all
    assert(!byQuery.values.flatten.exists(_.getAs[Long]("doc_id") == 3L))
    // fused ranks are dense from 1 within each query
    byQuery.values.foreach { rows =>
      assert(rows.map(_.getAs[Long]("fused_rank")).sorted.toSeq ==
        (1L to rows.length).toSeq)
    }
  }

  test("property: batch fusion equals per-query single fusion on random corpora") {
    val rnd = new scala.util.Random(11)
    val vocab = Seq("fast", "hash", "join", "order", "stream", "window",
      "agg", "batch", "scan", "merge", "key", "row")
    for (round <- 0 until 3) {
      val nDocs = 12 + rnd.nextInt(8)
      val docs = (0 until nDocs).map { i =>
        (i.toLong, Seq.fill(5 + rnd.nextInt(20))(
          vocab(rnd.nextInt(vocab.length))).mkString(" "))
      }.toDF("doc_id", "text")
      val vecs = (0 until nDocs).map { i =>
        (i.toLong, Array.fill(8)(rnd.nextFloat()))
      }.toDF("vec_id", "embedding")
      val queries = Seq(
        (0L, Seq.fill(3)(vocab(rnd.nextInt(vocab.length))).mkString(" ")),
        (1L, Seq.fill(3)(vocab(rnd.nextInt(vocab.length))).mkString(" ")))
      val batch = Hybrid.rrfBatch(docs, vecs, queries,
          kLex = 5, kVec = 5, kOut = 8).collect()
        .groupBy(_.getAs[Long]("query_id"))
        .map { case (q, rows) => q -> rows.sortBy(_.getAs[Long]("fused_rank"))
          .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("lex_rank"),
            r.getAs[Long]("vec_rank"), r.getAs[Double]("rrf"))).toSeq }
      queries.foreach { case (qid, qtext) =>
        val single = Hybrid.rrf(docs, vecs, qtext, qid,
            kLex = 5, kVec = 5, kOut = 8).collect()
          .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("lex_rank"),
            r.getAs[Long]("vec_rank"), r.getAs[Double]("rrf"))).toSeq
        assert(batch(qid) == single,
          s"round $round query $qid diverged:\nbatch=${batch(qid)}\nsingle=$single")
      }
    }
  }

  test("hybrid RRF handles a doc present in only the vector leg") {
    val docs = Seq((0L, "query terms absent"), (1L, "also absent")).toDF("doc_id", "text")
    def v(xs: Double*) = xs.toArray.map(_.toFloat)
    val vecs = Seq((0L, v(1, 0)), (1L, v(0.5, 0.5))).toDF("vec_id", "embedding")
    // no doc matches the lexical query except via vector leg
    val out = Hybrid.rrf(docs, vecs, "absent query terms", queryVecId = 0L,
      kLex = 2, kVec = 2, kOut = 2).collect()
    assert(out.nonEmpty)
    // doc 1 must appear with a vector rank even when lexical leg is thin
    assert(out.exists(r => r.getAs[Long]("doc_id") == 1L && !r.isNullAt(r.fieldIndex("vec_rank"))))
  }
}
