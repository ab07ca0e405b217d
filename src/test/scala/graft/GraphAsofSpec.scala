package graft

import graft.ext.{Graph, MinHash}
import graft.operators.AsOfJoin

import org.apache.spark.sql.functions._
import scala.collection.mutable
import scala.util.Random

/** Connected-components dup grouping + as-of join, each checked against a
  * naive in-memory implementation (union-find / scan-all-rights). */
class GraphAsofSpec extends SparkSpec {
  import spark.implicits._

  /** Union-find with min-root union: final root == component minimum. */
  private def naiveComponents(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    edges.flatMap(e => Seq(e._1, e._2)).distinct.map(n => n -> find(n)).toMap
  }

  test("connectedComponents: chain + triangle + singleton edge") {
    // 1-2-3-4 chain, 10-11-12 triangle, 20-21 pair
    val edges = Seq((2L, 1L), (3L, 2L), (3L, 4L), (10L, 11L), (11L, 12L),
      (12L, 10L), (21L, 20L)).toDF("u", "v")
    val got = Graph.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("connectedComponents matches union-find on random graphs") {
    val rnd = new Random(42)
    for (trial <- 0 until 3) {
      val n = 60 + trial * 40
      val edges = Seq.fill(n) {
        (rnd.nextInt(50).toLong, rnd.nextInt(50).toLong)
      }.filter(e => e._1 != e._2)
      val got = Graph.connectedComponents(edges.toDF("u", "v"))
        .as[(Long, Long)].collect().toMap
      assert(got === naiveComponents(edges), s"trial $trial")
    }
  }

  test("connectedComponents converges fast on a long path graph") {
    // 256-node path: worst case for label propagation (diameter 255);
    // large-star/small-star must converge in O(log^2 n) rounds — the
    // maxIter=30 default would trip on a propagation-style algorithm.
    val edges = (0L until 255L).map(i => (i, i + 1)).toDF("u", "v")
    val got = Graph.connectedComponents(edges).agg(max("component"), count(lit(1))).head()
    assert(got.getLong(0) === 0L && got.getLong(1) === 256L)
  }

  test("dupGroups: transitive closure of verified pairs, with sizes") {
    val docs = spark.createDataFrame(Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta"),
      (1L, "alpha beta gamma delta epsilon zeta eta theta"), // dup of 0
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),  // near-dup of 0/1
      (3L, "one two three four five six seven eight nine"),
      (4L, "one two three four five six seven eight nine"),  // dup of 3
      (5L, "completely different text with no overlap at all whatsoever")
    )).toDF("doc_id", "text")
    val pairs = MinHash.lshVerifiedPairs(docs, threshold = 0.5)
    val groups = Graph.dupGroups(pairs).as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(groups(0L)._1 === 0L && groups(1L)._1 === 0L)
    assert(groups(3L)._1 === 3L && groups(4L)._1 === 3L)
    assert(groups(3L)._2 === 2L)
    assert(!groups.contains(5L)) // no pair -> no group row
    // all members of a group report the same size
    assert(groups.values.groupBy(_._1).forall { case (_, vs) => vs.map(_._2).toSet.size == 1 })
  }

  test("dedupByGroup keeps one representative per cluster") {
    val docs = Seq((0L, "a b c d e f g h"), (1L, "a b c d e f g h"),
      (2L, "a b c d e f g h"), (9L, "unrelated text here entirely"))
      .toDF("doc_id", "text")
    val pairs = Seq((0L, 1L), (1L, 2L)).toDF("id_a", "id_b")
    val kept = Graph.dedupByGroup(docs, pairs).select("doc_id")
      .as[Long].collect().sorted
    assert(kept === Array(0L, 9L))
  }

  private def naiveAsof(left: Seq[(Long, Long, Long)],
                        right: Seq[(Long, Long, Long, Double)]): Map[Long, Option[(Long, Double)]] =
    left.map { case (eid, u, ts) =>
      val m = right.filter(r => r._2 == u && r._3 <= ts)
        .sortBy(r => (r._3, r._1)).lastOption
      eid -> m.map(r => (r._1, r._4))
    }.toMap

  test("asof: inclusive match, tie-break on seq, left-outer nulls") {
    val left = Seq((100L, 1L, 50L), (101L, 1L, 10L), (102L, 2L, 50L)) // eid,user,ts
      .toDF("event_id", "user_id", "ts")
    val right = Seq(
      (1L, 1L, 50L, 1.0),  // equal ts -> inclusive match for eid 100
      (2L, 1L, 50L, 2.0),  // same ts, larger seq -> wins
      (3L, 1L, 20L, 3.0)   // after eid 101's ts -> no match for it
    ).toDF("event_id", "user_id", "ts", "value")
    val got = AsOfJoin.asof(left, right, Seq("user_id"), "ts", "ts", "event_id", Seq("value"))
      .select(col("event_id"), col("matched.event_id").as("m"), col("matched.value").as("v"))
      .as[(Long, Option[Long], Option[Double])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(100L) === ((Some(2L), Some(2.0))))
    assert(got(101L) === ((None, None)))
    assert(got(102L) === ((None, None)))
  }

  test("asof matches naive scan on random data") {
    val rnd = new Random(7)
    val left = Seq.tabulate(120)(i => (i.toLong, rnd.nextInt(8).toLong, rnd.nextInt(40).toLong))
    val right = Seq.tabulate(150)(i =>
      (1000L + i, rnd.nextInt(8).toLong, rnd.nextInt(40).toLong, rnd.nextInt(100).toDouble))
    val got = AsOfJoin.asof(
        left.toDF("event_id", "user_id", "ts"),
        right.toDF("event_id", "user_id", "ts", "value"),
        Seq("user_id"), "ts", "ts", "event_id", Seq("value"))
      .select(col("event_id"), col("matched.event_id").as("m"), col("matched.value").as("v"))
      .as[(Long, Option[Long], Option[Double])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val want = naiveAsof(left, right)
    left.foreach { case (eid, _, _) =>
      val w = want(eid)
      assert(got(eid) === ((w.map(_._1), w.map(_._2))), s"event $eid")
    }
  }

  private def naiveAsofForward(left: Seq[(Long, Long, Long)],
                               right: Seq[(Long, Long, Long, Double)]): Map[Long, Option[(Long, Double)]] =
    left.map { case (eid, u, ts) =>
      val m = right.filter(r => r._2 == u && r._3 >= ts)
        .sortBy(r => (r._3, r._1)).headOption
      eid -> m.map(r => (r._1, r._4))
    }.toMap

  test("asof forward: earliest at-or-after, smaller seq wins ties") {
    val left = Seq((100L, 1L, 50L), (101L, 1L, 90L)).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (5L, 1L, 50L, 1.0),  // equal ts, smaller seq -> wins forward
      (6L, 1L, 50L, 2.0),
      (7L, 1L, 80L, 3.0)   // before eid 101's ts -> no match for it
    ).toDF("event_id", "user_id", "ts", "value")
    val got = AsOfJoin.asof(left, right, Seq("user_id"), "ts", "ts", "event_id",
        Seq("value"), direction = AsOfJoin.Direction.Forward)
      .select(col("event_id"), col("matched.event_id").as("m"), col("matched.value").as("v"))
      .as[(Long, Option[Long], Option[Double])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(100L) === ((Some(5L), Some(1.0))))
    assert(got(101L) === ((None, None)))
  }

  test("asof forward matches naive scan on random data, tolerance bounds the wait") {
    val rnd = new Random(11)
    val left = Seq.tabulate(100)(i => (i.toLong, rnd.nextInt(6).toLong, rnd.nextInt(40).toLong))
    val right = Seq.tabulate(120)(i =>
      (1000L + i, rnd.nextInt(6).toLong, rnd.nextInt(40).toLong, rnd.nextInt(100).toDouble))
    val got = AsOfJoin.asof(
        left.toDF("event_id", "user_id", "ts"),
        right.toDF("event_id", "user_id", "ts", "value"),
        Seq("user_id"), "ts", "ts", "event_id", Seq("value"),
        direction = AsOfJoin.Direction.Forward)
      .select(col("event_id"), col("matched.event_id").as("m"), col("matched.value").as("v"))
      .as[(Long, Option[Long], Option[Double])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val want = naiveAsofForward(left, right)
    left.foreach { case (eid, _, _) =>
      assert(got(eid) === ((want(eid).map(_._1), want(eid).map(_._2))), s"event $eid")
    }
    // forward tolerance: a match 60 units ahead dies under tol=59
    val l1 = Seq((1L, 1L, 40L)).toDF("event_id", "user_id", "ts")
    val r1 = Seq((10L, 1L, 100L, 5.0)).toDF("event_id", "user_id", "ts", "value")
    def run(tol: Long) = AsOfJoin.asof(l1, r1, Seq("user_id"), "ts", "ts", "event_id",
        Seq("value"), tolerance = Some(lit(tol)), direction = AsOfJoin.Direction.Forward)
      .select(col("matched.event_id")).as[Option[Long]].head()
    assert(run(60L) === Some(10L))
    assert(run(59L) === None)
  }

  test("asof nearest: smaller |dt| wins, backward wins exact ties, tolerance per side") {
    val left = Seq((1L, 1L, 100L), (2L, 1L, 10L), (3L, 1L, 300L)).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, 1L, 90L, 1.0),   // 10 behind eid1
      (11L, 1L, 105L, 2.0),  // 5 ahead of eid1 -> nearest
      (12L, 1L, 20L, 3.0)    // only candidate ahead of eid2
    ).toDF("event_id", "user_id", "ts", "value")
    def run(tol: Option[Long]) = AsOfJoin.asof(left, right, Seq("user_id"),
        "ts", "ts", "event_id", Seq("value"),
        tolerance = tol.map(lit(_)), direction = AsOfJoin.Direction.Nearest)
      .select(col("event_id"), col("matched.event_id").as("m"))
      .as[(Long, Option[Long])].collect().toMap
    val got = run(None)
    assert(got(1L) === Some(11L)) // forward 5 beats backward 10
    assert(got(2L) === Some(12L)) // nothing behind -> forward
    assert(got(3L) === Some(11L)) // nothing ahead -> backward (195 behind)
    // tolerance 100 kills eid3's backward match, keeps the others
    val bounded = run(Some(100L))
    assert(bounded(1L) === Some(11L))
    assert(bounded(2L) === Some(12L))
    assert(bounded(3L) === None)
    // exact tie: equidistant candidates -> backward wins
    val l2 = Seq((9L, 1L, 50L)).toDF("event_id", "user_id", "ts")
    val r2 = Seq((20L, 1L, 40L, 1.0), (21L, 1L, 60L, 2.0))
      .toDF("event_id", "user_id", "ts", "value")
    val tie = AsOfJoin.asof(l2, r2, Seq("user_id"), "ts", "ts", "event_id",
        Seq("value"), direction = AsOfJoin.Direction.Nearest)
      .select(col("matched.event_id")).as[Option[Long]].head()
    assert(tie === Some(20L))
  }

  test("asof nearest matches naive scan on random data") {
    val rnd = new Random(23)
    val left = Seq.tabulate(100)(i => (i.toLong, rnd.nextInt(6).toLong, rnd.nextInt(40).toLong))
    val right = Seq.tabulate(120)(i =>
      (1000L + i, rnd.nextInt(6).toLong, rnd.nextInt(40).toLong, rnd.nextInt(100).toDouble))
    val got = AsOfJoin.asof(
        left.toDF("event_id", "user_id", "ts"),
        right.toDF("event_id", "user_id", "ts", "value"),
        Seq("user_id"), "ts", "ts", "event_id", Seq("value"),
        direction = AsOfJoin.Direction.Nearest)
      .select(col("event_id"), col("matched.event_id").as("m"))
      .as[(Long, Option[Long])].collect().toMap
    left.foreach { case (eid, u, ts) =>
      // naive nearest: min |dt|; backward wins ties; backward tie-break
      // largest seq, forward tie-break smallest seq
      val back = right.filter(r => r._2 == u && r._3 <= ts)
        .sortBy(r => (-r._3, -r._1)).headOption
      val fwd = right.filter(r => r._2 == u && r._3 >= ts)
        .sortBy(r => (r._3, r._1)).headOption
      val want = (back, fwd) match {
        case (Some(b), Some(f)) =>
          if (ts - b._3 <= f._3 - ts) Some(b._1) else Some(f._1)
        case (Some(b), None) => Some(b._1)
        case (None, Some(f)) => Some(f._1)
        case _ => None
      }
      assert(got(eid) === want, s"event $eid")
    }
  }

  test("asof nearest plans one exchange, two window passes, no join") {
    val left = Seq((1L, 1L, 100L)).toDF("event_id", "user_id", "ts")
    val right = Seq((10L, 1L, 90L, 1.0)).toDF("event_id", "user_id", "ts", "value")
    val p = AsOfJoin.asof(left, right, Seq("user_id"), "ts", "ts", "event_id",
        Seq("value"), direction = AsOfJoin.Direction.Nearest)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), p.take(600))
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p.take(600))
    assert("Window".r.findAllIn(p).size >= 2)
  }

  test("asof tolerance turns stale matches into no-match") {
    val left = Seq((1L, 1L, 100L)).toDF("event_id", "user_id", "ts")
    val right = Seq((10L, 1L, 40L, 5.0)).toDF("event_id", "user_id", "ts", "value")
    def run(tol: Long) =
      AsOfJoin.asof(left, right, Seq("user_id"), "ts", "ts", "event_id",
          Seq("value"), tolerance = Some(lit(tol)))
        .select(col("matched.event_id")).as[Option[Long]].head()
    assert(run(60L) === Some(10L)) // age 60 <= 60
    assert(run(59L) === None)      // age 60 > 59
  }

  test("asof_join registered query matches a naive scan at sf0.001") {
    val got = SparkEntry.queries("asof_join")(spark, sf001)
      .select(col("event_id"), col("click_event"), col("click_value"))
      .as[(Long, Option[Long], Option[Double])].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val ev = graft.model.Envelope.normalizeTs(
        spark.read.parquet(s"$sf001/events.parquet"))
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts"),
        col("event_type"), col("value"))
      .as[(Long, Long, Long, String, Double)].collect()
    val want = naiveAsof(
      ev.filter(_._4 == "error").map(e => (e._1, e._2, e._3)).toSeq,
      ev.filter(_._4 == "click").map(e => (e._1, e._2, e._3, e._5)).toSeq)
    assert(got.size === want.size)
    want.foreach { case (eid, w) =>
      assert(got(eid) === ((w.map(_._1), w.map(_._2))), s"event $eid")
    }
  }
}
