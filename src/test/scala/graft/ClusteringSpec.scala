package graft

import graft.ext.{Clustering, VectorOps}
import org.apache.spark.sql.functions._

/** Invariant specs for the cluster-curation operators
  * (ext.Clustering): the DuckDB oracle pins exact values at sf0.01;
  * these pin the CONTRACTS — per-cluster keep counts, hardness
  * ordering, cap bounds, determinism, and the keepFrac=1 degeneracy —
  * plus the plan shapes the 100 TB story depends on. */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = spark.read.parquet(s"$sf001/embeddings.parquet")

  test("prototypePrune: per-cluster kept count == ceil(frac * n), kept are the hardest") {
    val out = Clustering.prototypePrune(vecs, 0.5).cache()
    try {
      val perCluster = out.groupBy("cluster")
        .agg(count(lit(1)).as("n"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
          // hardest = lowest simc; every kept row must rank before every
          // dropped row under (simc_r, vec_id)
          max(when(col("kept"), col("keep_rank"))).as("max_kept_rank"),
          min(when(!col("kept"), col("keep_rank"))).as("min_drop_rank"))
        .collect()
      assert(perCluster.nonEmpty)
      perCluster.foreach { r =>
        val n = r.getAs[Long]("n"); val kept = r.getAs[Long]("n_kept")
        assert(kept === math.ceil(0.5 * n).toLong,
          s"cluster ${r.get(0)}: kept $kept of $n")
        val maxKept = r.getAs[Long]("max_kept_rank")
        Option(r.getAs[java.lang.Long]("min_drop_rank")).foreach { minDrop =>
          assert(maxKept < minDrop, s"cluster ${r.get(0)}: rank order broken")
        }
      }
      // keep_rank is a permutation of 1..n within each cluster
      val badRank = out.groupBy("cluster")
        .agg(count(lit(1)).as("n"), max("keep_rank").as("mx"),
          min("keep_rank").as("mn"), countDistinct("keep_rank").as("d"))
        .filter(col("mx") =!= col("n") || col("mn") =!= 1 || col("d") =!= col("n"))
        .count()
      assert(badRank === 0)
    } finally out.unpersist()
  }

  test("prototypePrune: keepFrac = 1 keeps every row; scores match semanticDedup's") {
    val all = Clustering.prototypePrune(vecs, 1.0)
    assert(all.filter(!col("kept")).count() === 0)
    // same quantizer + centroid scoring as semanticDedup: (cluster,
    // simc_r) agree row for row
    val sd = VectorOps.semanticDedup(vecs, 0.3)
      .select(col("vec_id"), col("cluster").as("c2"), col("simc_r").as("s2"))
    val mismatch = all.join(sd, "vec_id")
      .filter(col("cluster") =!= col("c2") || col("simc_r") =!= col("s2"))
      .count()
    assert(mismatch === 0)
  }

  test("prototypePrune is deterministic across runs") {
    val a = Clustering.prototypePrune(vecs, 0.5).orderBy("vec_id").collect()
    val b = Clustering.prototypePrune(vecs, 0.5).orderBy("vec_id").collect()
    assert(a.toSeq === b.toSeq)
  }

  test("clusterCapSample: cap respected, picks deterministic, subset of corpus") {
    val out = Clustering.clusterCapSample(vecs, 3).cache()
    try {
      assert(out.groupBy("cluster").count().filter(col("count") > 3).count() === 0)
      // pick_rank within each cluster is 1..min(3, n) with no gaps
      val bad = out.groupBy("cluster")
        .agg(count(lit(1)).as("n"), max("pick_rank").as("mx"))
        .filter(col("mx") =!= col("n")).count()
      assert(bad === 0)
      val ids = out.select("vec_id").as[Long].collect().toSet
      val corpus = vecs.select("vec_id").as[Long].collect().toSet
      assert(ids.subsetOf(corpus))
      val again = Clustering.clusterCapSample(vecs, 3)
        .select("vec_id").as[Long].collect().toSet
      assert(again === ids)
    } finally out.unpersist()
  }

  test("prototypePrune: singleton clusters score simc_r = 1 and are always kept") {
    // 20 quantizer bits over 500 rows force mostly-singleton clusters;
    // a singleton's centroid IS its own vector, so cosine rounds to 1
    // exactly, and ceil(frac·1) = 1 keeps it at ANY keepFrac
    val out = Clustering.prototypePrune(vecs, 0.25, clusterBits = Some(20)).cache()
    try {
      val singletons = out.groupBy("cluster").count().filter(col("count") === 1)
        .select("cluster")
      val bad = out.join(singletons, "cluster")
        .filter(col("simc_r") =!= 1.0 || !col("kept") || col("keep_rank") =!= 1L)
      assert(singletons.count() > 0, "fixture should yield singleton clusters at 20 bits")
      assert(bad.count() === 0)
    } finally out.unpersist()
  }

  test("prototypePrune: keep counts hold across a keepFrac sweep") {
    for (frac <- Seq(0.1, 0.25, 0.75)) {
      val bad = Clustering.prototypePrune(vecs, frac)
        .groupBy("cluster")
        .agg(count(lit(1)).as("n"),
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"))
        .filter(col("n_kept") =!= ceil(lit(frac) * col("n")))
        .count()
      assert(bad === 0, s"keepFrac=$frac")
    }
  }

  test("clusterCapSample: a cap above every cluster size returns the whole corpus") {
    val n = vecs.count()
    assert(Clustering.clusterCapSample(vecs, n.toInt).count() === n)
  }

  test("plan: clusterCapSample's literal cap is WindowGroupLimit-pruned map-side") {
    val plan = Clustering.clusterCapSample(vecs, 8)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("WindowGroupLimit"),
      s"expected map-side rank pruning in:\n$plan")
  }

  test("plan: prototypePrune centroids broadcast; no cartesian; one cluster window exchange") {
    val plan = Clustering.prototypePrune(vecs, 0.5)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"), "centroid attach must broadcast")
    assert(!plan.contains("CartesianProduct"))
    // whole-plan shuffle budget: (cluster,pos) centroid partial-sum,
    // (cluster) centroid assemble, and ONE (cluster) exchange shared by
    // the rank and size windows — MORE than 3 would mean the windows
    // split into separate shuffles (an UPPER bound, not an exact pin:
    // a Spark/AQE planning change that fuses or re-renders exchanges
    // must not fail the suite without a real regression)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 3,
      s"expected at most 3 shuffle exchanges (2 centroid agg + 1 shared window) in:\n$plan")
    // the regression this gate exists for: the rank window and the size
    // window must SHARE one cluster-keyed Window node region — two
    // Window operators each preceded by its own cluster exchange is the
    // split shape. Count exchanges whose partitioning key set is
    // exactly the cluster column.
    val clusterExchanges = "Exchange hashpartitioning\\(cluster#\\d+[,)]".r
      .findAllIn(plan).length
    assert(clusterExchanges <= 1,
      s"rank and size windows must share ONE cluster exchange in:\n$plan")
  }
}
