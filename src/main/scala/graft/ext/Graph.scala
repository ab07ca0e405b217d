package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Distributed connected components over an edge list, via alternating
 * large-star / small-star contractions (Kiveris et al., "Connected
 * Components in MapReduce and Beyond", ACM SoCC 2014). Each round is two
 * shuffles (a groupBy-min and a join back), and the algorithm converges
 * in O(log^2 n) rounds regardless of graph diameter — the property that
 * matters at 100 TB, where plain min-label propagation needs O(diameter)
 * shuffles and one long near-dup chain stalls the whole job.
 *
 * Motivating use: near-duplicate GROUPING. The MinHash/SimHash tiers
 * ([[MinHash.lshVerifiedPairs]]) emit verified pairs; dedup policy wants
 * one representative per transitive cluster, not per pair (doc A~B and
 * B~C must collapse to one kept doc even when A~C was never a candidate).
 * The reference's analog is last-per-key compaction (one survivor per
 * key); here the "key" is the component a doc belongs to.
 *
 * Edges carry two scalar longs end to end — no payload ever enters the
 * iteration's exchanges. Intermediate edge sets are persisted per round
 * and the previous round unpersisted, so lineage stays one round deep.
 */
object Graph {

  /** Canonical undirected edge form: (u, v) with u < v, no self-loops,
    * distinct. Input columns are the first two of `edges`. */
  private def canonical(edges: DataFrame): DataFrame = {
    // loud, at plan time: the long cast below would throw
    // CAST_INVALID_INPUT deep inside the job under ANSI for string ids
    // (UUIDs, URLs) — or, with ANSI off, null every edge and SILENTLY
    // return empty components, which in leakageSafeSplit means near-dup
    // docs split across train/test (the exact leak it prevents). String
    // ids must be mapped to longs (e.g. xxhash64) before entering.
    edges.schema.fields.take(2).foreach { f =>
      require(f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"connectedComponents needs numeric node ids; column '${f.name}' " +
          s"is ${f.dataType.simpleString} — hash string ids to longs first")
    }
    val Seq(a, b) = edges.columns.take(2).toSeq.map(col)
    edges.select(least(a, b).cast("long").as("u"),
        greatest(a, b).cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct()
  }

  /** Large-star: every node u links each STRICTLY LARGER neighbor to the
    * minimum of its neighborhood (including u itself). Kiveris et al. §3. */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("u"), col("v"))
      .union(e.select(col("v").as("u"), col("u").as("v")))
    val mins = sym.groupBy("u").agg(min("v").as("nmin"))
      .select(col("u"), least(col("nmin"), col("u")).as("m"))
    sym.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), col("m").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** Small-star: every node u links its smaller-or-equal neighbors (and
    * itself) to the minimum of that neighborhood. Kiveris et al. §3. */
  private def smallStar(e: DataFrame): DataFrame = {
    val dir = e.select(greatest(col("u"), col("v")).as("u"),
      least(col("u"), col("v")).as("v"))
    val mins = dir.groupBy("u").agg(min("v").as("m"))
    val j = dir.join(mins, "u")
    j.select(col("v").as("u"), col("m").as("v"))
      .union(j.select(col("u"), col("m").as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /**
   * Connected components of the undirected graph given by `edges` (first
   * two columns = endpoints, any numeric type). Returns one row per node
   * that appears in an edge: (node, component) where component is the
   * minimum node id reachable from it.
   *
   * Iterates large-star/small-star to fixpoint, detected by an order-
   * independent checksum (count + sum of per-edge hashes) — one tiny
   * 2-column aggregate per round, no driver-side edge materialization.
   */
  def connectedComponents(edges: DataFrame, maxIter: Int = 30,
                          checkpointDir: Option[String] = None,
                          onRound: (Int, Long) => Unit = (_, _) => ()): DataFrame = {
    // localCheckpoint (eager) TRUNCATES LINEAGE each round, not just
    // caches: each round's plan references the previous round 6× (two
    // symmetrizing unions + two groupBy-join pairs), so without
    // truncation the logical plan grows ~6^rounds and Catalyst analysis
    // — not the data — dominates within a handful of iterations.
    // `checkpointDir` switches to RELIABLE checkpoint(): blocks persist
    // to the given (HDFS/DBFS) directory instead of executor memory, so
    // an executor loss mid-iteration recomputes from the checkpoint
    // instead of failing the lineage-truncated job — the right mode for
    // long cluster runs; identical algorithm, one extra write per round.
    // `onRound` observes (round, edge-count) per iteration — the
    // convergence telemetry the Stress probe records; the count is read
    // from the checksum aggregate the loop already runs (no extra job).
    // Reliable-mode checkpoint GC: Spark never deletes checkpoint data
    // on its own (cleanCheckpoints only fires on RDD GC with reference
    // tracking on), so without cleanup a run leaves O(rounds × edges)
    // of dead blocks in checkpointDir for the application's lifetime.
    // checkpoint() is EAGER here, so once round N+1's files are on disk
    // its LogicalRDD has no lineage back to round N — round N's
    // directory is dead and is deleted right then. Only the FINAL
    // round's files survive the call (the returned DataFrame reads
    // them); callers should TTL/clean the directory when done with the
    // result.
    var prevCpFile: Option[String] = None
    def persistRound(df: DataFrame): DataFrame = checkpointDir match {
      case Some(_) =>
        val cp = df.checkpoint() // eager: materialized before any delete
        val newFile = cp.queryExecution.analyzed.collectFirst {
          case l: org.apache.spark.sql.execution.LogicalRDD =>
            l.rdd.getCheckpointFile
        }.flatten
        // only swap-and-delete when the new round's file is identified:
        // deleting on a None would risk orphaning the tracked state
        newFile.foreach { nf =>
          prevCpFile.filterNot(_ == nf).foreach { prev =>
            try {
              val p = new org.apache.hadoop.fs.Path(prev)
              p.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
                .delete(p, true); ()
            } catch { case _: java.io.IOException => () } // best-effort GC
          }
          prevCpFile = Some(nf)
        }
        cp
      case None => df.localCheckpoint()
    }
    // setCheckpointDir is SparkContext-GLOBAL: remember and restore the
    // application's own dir so this call can't silently redirect later
    // unrelated checkpoint() calls (e.g. durable state meant for HDFS)
    // into our directory. getCheckpointDir returns the INTERNAL
    // UUID-suffixed subdir of what the app passed — restoring it
    // verbatim would nest another UUID level per call — so restore its
    // PARENT (the app's original argument). Residual: if the app had NO
    // dir set, ours stays set after return (there is no unset API), and
    // two concurrent calls with different dirs race — pass the same dir
    // or serialize in that case.
    val sc = edges.sparkSession.sparkContext
    val previousUserDir = sc.getCheckpointDir
      .flatMap(d => Option(new org.apache.hadoop.fs.Path(d).getParent))
      .map(_.toString)
    checkpointDir.foreach(sc.setCheckpointDir)
    try {
      connectedComponentsLoop(edges, maxIter, persistRound, onRound)
    } finally {
      if (checkpointDir.isDefined) previousUserDir.foreach(sc.setCheckpointDir)
    }
  }

  private def connectedComponentsLoop(edges: DataFrame, maxIter: Int,
                                      persistRound: DataFrame => DataFrame,
                                      onRound: (Int, Long) => Unit): DataFrame = {
    var e = persistRound(canonical(edges))
    var check = checksum(e)
    onRound(0, check._1)
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      val next = persistRound(smallStar(largeStar(e)))
      val nextCheck = checksum(next)
      onRound(it + 1, nextCheck._1)
      converged = nextCheck == check
      e = next
      check = nextCheck
      it += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds")
    // Fixpoint state is a set of stars: every edge is (member, root).
    e.select(col("u").as("node"), col("v").as("component"))
      .union(e.select(col("v").as("node"), col("v").as("component")))
      .groupBy("node").agg(min("component").as("component"))
  }

  /** Order-independent fixpoint fingerprint of an edge set. The per-edge
    * hashes are summed as decimal(38,0) — a long sum overflows under
    * ANSI mode (Spark 4 default) after a few thousand edges. */
  private def checksum(e: DataFrame): (Long, String) = {
    val r = e.agg(count(lit(1)),
      coalesce(sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)"))).head()
    (r.getLong(0), r.getDecimal(1).toBigInteger.toString)
  }

  /**
   * Near-dup groups from a verified-pairs frame (columns `id_a`, `id_b`):
   * (doc_id, group_id = min doc id in the transitive cluster, group_size).
   * Only docs that belong to some group (size >= 2) appear — singletons
   * by definition have no pair row.
   */
  def dupGroups(pairs: DataFrame, idA: String = "id_a", idB: String = "id_b"): DataFrame = {
    val comps = connectedComponents(pairs.select(col(idA), col(idB)))
    val sizes = comps.groupBy("component").agg(count(lit(1)).as("group_size"))
    comps.join(sizes, "component")
      .select(col("node").as("doc_id"), col("component").as("group_id"),
        col("group_size").cast("long").as("group_size"))
  }

  /**
   * Cluster-dedup: keep exactly one representative (the minimum id) per
   * near-dup cluster, plus every doc not in any cluster. The companion
   * policy to [[dupGroups]] — this is the frame a corpus pipeline feeds
   * downstream.
   */
  def dedupByGroup(docs: DataFrame, pairs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    // components directly — dupGroups' per-group size aggregate+join is
    // unused here (node =!= component IS "not the representative"), so
    // skipping it saves one corpus-component shuffle per run
    val drop = connectedComponents(pairs.select(col("id_a"), col("id_b")))
      .filter(col("node") =!= col("component"))
      .select(col("node").as(idCol))
    docs.join(drop, Seq(idCol), "left_anti")
  }
}
