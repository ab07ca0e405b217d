package graft.log

import graft.model.{Envelope, TopicName}
import graft.functions.Murmur3Pulsar
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import org.apache.hadoop.fs.{Path => HPath}
import java.io.{FileNotFoundException, IOException}
import scala.collection.JavaConverters._

/**
 * Parquet-backed topic log: the storage layer replacing the reference's
 * BookKeeper managed ledger (managed-ledger/.../ManagedLedgerImpl.java:781
 * `asyncAddEntry`) with an offset-assigning atomic append.
 *
 * Layout: `<root>/<tenant>/<namespace>/<topic>/partition=<i>/...parquet`
 * plus a `_manifest/` directory of commit files. Readers only see data
 * referenced by committed manifests (READ_COMMITTED semantics — the Spark
 * stand-in for the reference's transaction buffer markers, SURVEY.md §2.12).
 *
 * All control-plane IO (manifests, staging moves, vacuum) goes through
 * [[PathIO]] — the Hadoop FileSystem seam — so the log root may live on
 * any scheme the data plane can read (`file:`, `hdfs://`; see
 * [[PathIO]]'s per-scheme rename semantics).
 *
 * Scale notes (100 TB):
 *  - the log is hive-partitioned on `partition` so per-partition consumers
 *    prune files at planning time;
 *  - offsets are assigned per partition with a window over only the incoming
 *    batch plus a tiny per-partition max-offset manifest read — never a scan
 *    of the existing log;
 *  - appends are append-only parquet writes; the manifest commit is a single
 *    atomic file move (same pattern as a Spark streaming sink commit log).
 */
object TopicLog {
  /** Marker path meaning "file snapshot active but empty" (see
    * [[TopicLog.manifestFiles]]). */
  private[log] val EmptySnapshotMarker = "-"

  /** Reader-visible transaction isolation (reference
    * pulsar-common TransactionIsolationLevel; SURVEY §2.12): the
    * manifest commit is the transaction boundary, so READ_COMMITTED sees
    * only manifest-referenced rows (the default everywhere) while
    * READ_UNCOMMITTED additionally surfaces staged-but-uncommitted
    * epochs — data written by an in-flight [[TopicLog.stageAppend]] /
    * [[Txn]] whose manifest has not been published. */
  sealed trait IsolationLevel
  object IsolationLevel {
    case object ReadCommitted extends IsolationLevel
    case object ReadUncommitted extends IsolationLevel
  }

  /** A staged (data-written, not yet reader-visible) append: the manifest
    * content is the commit token — publishing it is one atomic file move.
    * Used by [[graft.log.Txn]] for multi-topic atomicity. `epoch` is the
    * RESERVED chain position; if a lifecycle rewrite takes it first, the
    * publish merges forward onto the advanced chain
    * ([[TopicLog.mergeForwardPublish]]) and the actual commit lands at a
    * later epoch. */
  final case class StagedAppend(epoch: Long, manifestLines: String, count: Long) {
    def manifestPath: String = s"$epoch.commit"
  }

  /** Marker line a SNAPSHOT-REWRITE (lifecycle) manifest carries —
    * retention/offload/truncate drops and coalesce rewrites. These
    * manifests preserve the per-partition high-water (they add no rows),
    * which is what makes it legal for a staged append that finds its
    * reserved epoch taken by one to MERGE FORWARD: its offsets, assigned
    * against the committed high-water at stage time, are still past the
    * (unchanged) high-water of the advanced chain. A manifest WITHOUT
    * this line at/after a staged epoch is another append — colliding
    * offsets, the single-writer violation — and stays a loud failure.
    * The reference gets the same serialization from the broker: these
    * verbs and the transaction buffer share one write path
    * (pulsar-broker/.../persistent/PersistentTopic.java). */
  private[log] val LifecycleLine = "V,rewrite"

  private[log] def isLifecycleManifest(lines: Seq[String]): Boolean =
    lines.exists(_.startsWith("V,"))

  /** Staged epochs whose content a (merged) manifest carries — its
    * `M,<stagedEpoch>` provenance lines. */
  private[log] def mergeProvenance(lines: Seq[String]): Set[Long] =
    lines.filter(_.startsWith("M,"))
      .flatMap(l => scala.util.Try(l.stripPrefix("M,").toLong).toOption)
      .toSet

  /** Durable record that staged epoch `epoch`'s content was merged
    * forward into a later manifest (content: the merged-into epoch).
    * Lives beside the commits so [[stagedEpochResolved]] is one
    * existence probe even after the merged manifest itself is pruned;
    * pruned with its epoch by [[pruneManifestHistory]] once no txn
    * marker references it. */
  private[graft] def mergedMarker(basePath: String, epoch: Long): HPath =
    PathIO.path(basePath, "_manifest", s"$epoch.merged")

  /** Whether staged epoch `epoch`'s CONTENT is committed to the chain —
    * via its own manifest (an append manifest at `epoch`, never a
    * lifecycle `V,` one: lifecycle verbs may legally occupy a staged
    * epoch's number without carrying its rows) or via a merged-forward
    * manifest recorded by [[mergedMarker]]. This is the check every
    * janitor/recovery path must use where it used to ask "does
    * `<epoch>.commit` exist": with merge-forward, existence alone no
    * longer means the staged rows are live. */
  private[graft] def stagedEpochResolved(basePath: String, epoch: Long): Boolean =
    PathIO.exists(mergedMarker(basePath, epoch)) || {
      val m = PathIO.path(basePath, "_manifest", s"$epoch.commit")
      PathIO.exists(m) &&
        (try !isLifecycleManifest(PathIO.readLines(m))
         catch { case _: IOException => false })
    }

  /** Committed epochs of a TopicLog-layout base, ascending (static —
    * shared by instance reads, merge-forward, and [[Txn]] recovery). */
  private[graft] def committedEpochsAt(basePath: String): Seq[Long] = {
    val manifestDir = PathIO.path(basePath, "_manifest")
    if (!PathIO.exists(manifestDir)) Seq.empty
    else PathIO.listDir(manifestDir)
      .map(_.getName).filter(_.endsWith(".commit"))
      .map(_.stripSuffix(".commit").toLong).sorted
  }

  /** Latest committed manifest's lines, retrying the list→read race
    * against a concurrent [[pruneManifestHistory]] (a vanished "latest"
    * means a newer one exists). */
  private[log] def latestManifestLinesAt(basePath: String): Seq[String] = {
    val manifestDir = PathIO.path(basePath, "_manifest")
    var attempt = 0
    while (attempt < 5) {
      committedEpochsAt(basePath).lastOption match {
        case None => return Seq.empty
        case Some(e) =>
          try return PathIO.readLines(PathIO.child(manifestDir, s"$e.commit"))
            .filter(_.nonEmpty)
          catch { case _: FileNotFoundException => attempt += 1 }
      }
    }
    sys.error(s"manifest snapshot unreadable after 5 attempts on $basePath")
  }

  /** Per-partition high-water lines (`p,offset`) of a manifest body —
    * `F,`/`L,` snapshot, `V,` lifecycle and `M,` provenance lines are
    * structural, never offsets. */
  private[log] def parseHw(lines: Seq[String]): Map[Int, Long] =
    lines.filter(_.headOption.exists(_.isDigit)).map { line =>
      val Array(p, o) = line.split(","); p.toInt -> o.toLong
    }.toMap

  /** Resolve a manifest body's file snapshot (inline `F,` plus `L,`
    * side files): Some(files) when a snapshot is active, None in
    * offset-only mode. Static twin of the instance [[manifestFiles]]
    * (which adds the prune-race retry around the latest-epoch lookup). */
  private[log] def filesFromManifestLines(basePath: String,
                                          lines: Seq[String]): Option[Seq[String]] = {
    val manifestDir = PathIO.path(basePath, "_manifest")
    val direct = lines.filter(_.startsWith("F,")).map(_.stripPrefix("F,"))
    val chunked = lines.filter(_.startsWith("L,")).map(_.stripPrefix("L,"))
      .flatMap { n =>
        PathIO.readLines(PathIO.child(manifestDir, n)).filter(_.nonEmpty)
      }
    val fs = direct ++ chunked
    if (fs.isEmpty) None else Some(fs.filterNot(_ == EmptySnapshotMarker))
  }

  /** Outcome of one first-writer-wins manifest commit attempt. */
  private[log] sealed trait CommitOutcome
  private[log] object CommitOutcome {
    /** This call created the manifest. */
    case object Committed extends CommitOutcome
    /** The manifest already existed (or a racer won) with IDENTICAL
      * content — a replay; the commit happened. */
    case object Identical extends CommitOutcome
    /** The epoch is taken by a DIFFERENT manifest — the chain advanced
      * (lifecycle rewrite, merged append) or a writer raced us. */
    final case class Conflict(existing: Seq[String]) extends CommitOutcome
  }

  /** One atomic, first-writer-wins attempt to commit `content` as epoch
    * `epoch`'s manifest. Never throws on a lost race — callers decide
    * whether a [[CommitOutcome.Conflict]] means re-base (lifecycle
    * verbs, merge-forward) or a loud single-writer violation. */
  private[log] def tryCommitManifest(basePath: String, epoch: Long,
                                     content: String): CommitOutcome = {
    val manifestDir = PathIO.path(basePath, "_manifest")
    PathIO.mkdirs(manifestDir)
    val target = PathIO.child(manifestDir, s"$epoch.commit")
    def existingLines(): Seq[String] =
      new String(PathIO.readBytes(target)).split("\n", -1).toSeq
    if (PathIO.exists(target)) {
      if (new String(PathIO.readBytes(target)) == content) CommitOutcome.Identical
      else CommitOutcome.Conflict(existingLines())
    } else {
      val won = atomicCreate(target, content.getBytes("UTF-8"))
      val existing = new String(PathIO.readBytes(target))
      if (existing == content) {
        if (won)
          // sweep tmp leftovers of crashed earlier attempts at this epoch
          PathIO.listDir(manifestDir)
            .filter(_.getName.startsWith(s"$epoch.commit.tmp."))
            .foreach(p => try { PathIO.deleteIfExists(p); () }
              catch { case _: Throwable => () })
        if (won) CommitOutcome.Committed else CommitOutcome.Identical
      } else CommitOutcome.Conflict(existingLines())
    }
  }

  /** Snapshot section lines for `epoch` over `files` (inline `F,` up to
    * `listThreshold`, else content-addressed `L,` side files written
    * atomically BEFORE the manifest commit — see the instance
    * [[TopicLog.manifestFiles]] crash argument). Static so
    * merge-forward and [[Txn.recover]] can build manifests without a
    * TopicLog handle. */
  private[log] def fileSnapshotLinesAt(basePath: String, epoch: Long,
                                       files: Seq[String],
                                       listThreshold: Int): Seq[String] = {
    val manifestDir = PathIO.path(basePath, "_manifest")
    if (files.isEmpty) Seq(s"F,$EmptySnapshotMarker")
    else if (files.size <= listThreshold) files.map("F," + _)
    else {
      PathIO.mkdirs(manifestDir)
      files.grouped(4096).zipWithIndex.map { case (chunk, k) =>
        val bytes = chunk.mkString("\n").getBytes("UTF-8")
        val digest = java.security.MessageDigest.getInstance("MD5")
          .digest(bytes).take(8).map("%02x".format(_)).mkString
        val sideName = s"$epoch.flist.$k.$digest"
        val side = PathIO.child(manifestDir, sideName)
        // atomicCreate, never a plain write: a crash mid-write would
        // leave a TRUNCATED file at the content-addressed name and a
        // retry (same digest) would adopt it — see instance doc
        if (!PathIO.exists(side)) {
          atomicCreate(side, bytes): Unit
        }
        s"L,$sideName"
      }.toSeq
    }
  }

  /** The staged epoch's OWN files (relative final paths): the direct
    * staging record when present, else the staged tree's contents.
    * Loud when neither exists — a merge-forward publish without them
    * cannot proceed, and by protocol they survive until
    * [[finishStagedEpoch]] (which runs only after the commit or merge
    * is durably recorded). */
  private[log] def stagedOwnFilesAt(basePath: String, epoch: Long): Seq[String] = {
    val rec = stagingRecord(basePath, epoch)
    if (PathIO.exists(rec)) readStagingRecord(basePath, epoch)
    else {
      val tree = PathIO.path(basePath, "_staging", epoch.toString)
      require(PathIO.exists(tree),
        s"staged epoch $epoch on $basePath has neither a staging record " +
          "nor a staged tree — nothing to merge forward (staging lost?)")
      PathIO.walkAll(tree)
        .filter(_.getName.endsWith(".parquet"))
        .map(p => PathIO.relativize(tree, p)).sorted
    }
  }

  /** Post-commit staging cleanup for epoch `epoch`: move a staged tree's
    * files into the readable layout and drop the direct-staging record
    * (the files were final all along; the committed/merged manifest is
    * their liveness from here on). Idempotent and race-tolerant. */
  private[log] def finishStagedEpoch(basePath: String, epoch: Long): Unit = {
    completeStagedMoves(basePath, epoch)
    PathIO.deleteIfExists(stagingRecord(basePath, epoch)): Unit
  }

  /**
   * Merge-forward publish (the upgrade past the round-16 refusal
   * contract): a staged append whose RESERVED epoch was taken by
   * lifecycle rewrites re-bases onto the advanced chain instead of
   * failing — per-partition high-water = max(latest, staged), file
   * snapshot = latest snapshot ∪ the staging's own files — and commits
   * at `latest + 1` with an `M,<stagedEpoch>` provenance line plus a
   * durable [[mergedMarker]]. This is what lets retention, offload,
   * truncate and coalesce keep running while a transaction holds a
   * staged epoch open, the availability the reference gets from broker
   * serialization (PersistentTopic.java's single ML-executor;
   * transaction buffer pulsar-broker/.../transaction/buffer/).
   *
   * Correctness rests on two invariants:
   *  - lifecycle manifests PRESERVE the high-water, so the staged
   *    offsets (assigned past the committed high-water at stage time)
   *    are still past the merged high-water — no offset collisions;
   *  - the merge is recorded durably ([[mergedMarker]], created after
   *    the merged manifest, before staging cleanup) so replays
   *    ([[Txn.recover]], a crashed publisher's retry) converge to a
   *    no-op instead of re-merging.
   *
   * Any non-lifecycle manifest at/after the reserved epoch that does
   * NOT carry our provenance is a second concurrent APPEND — colliding
   * offsets — and fails loudly (single-writer per topic,
   * ManagedLedgerImpl.internalAsyncAddEntry:821).
   */
  private[log] def mergeForwardPublish(basePath: String, who: String,
                                       staged: StagedAppend,
                                       listThreshold: Int = 256): Unit = {
    val manifestDir = PathIO.path(basePath, "_manifest")
    def finishVia(mergedEpoch: Long): Unit = {
      // durable BEFORE cleanup: once the marker exists every replay
      // short-circuits here, so staged files are only ever merged once
      atomicCreate(mergedMarker(basePath, staged.epoch),
        mergedEpoch.toString.getBytes("UTF-8")): Unit
      finishStagedEpoch(basePath, staged.epoch)
    }
    if (PathIO.exists(mergedMarker(basePath, staged.epoch))) {
      // replay after a crash between merge and cleanup
      finishStagedEpoch(basePath, staged.epoch)
      return
    }
    // audit the advanced chain: every epoch at/after our reservation
    // must be a lifecycle rewrite — or already carry our provenance
    // (crash between merged commit and marker create)
    committedEpochsAt(basePath).filter(_ >= staged.epoch).foreach { e =>
      val lines =
        try PathIO.readLines(PathIO.child(manifestDir, s"$e.commit"))
        catch { case _: FileNotFoundException => Seq.empty[String] }
      if (mergeProvenance(lines).contains(staged.epoch)) {
        finishVia(e)
        return
      }
      require(isLifecycleManifest(lines) || lines.isEmpty,
        s"manifest epoch $e on $who advanced past staged epoch " +
          s"${staged.epoch} and is not a lifecycle rewrite — a second " +
          "append writer raced this staging (appends are single-writer " +
          "per topic)")
    }
    val stagedHw = parseHw(staged.manifestLines.split("\n", -1).toSeq)
    val own = stagedOwnFilesAt(basePath, staged.epoch)
    var attempts = 0
    while (true) {
      attempts += 1
      require(attempts <= 16,
        s"merge-forward publish of staged epoch ${staged.epoch} on $who " +
          "did not converge after 16 re-bases")
      val latestLines = latestManifestLinesAt(basePath)
      val latestEpoch = committedEpochsAt(basePath).lastOption.getOrElse(
        sys.error(s"merge-forward on $who found an empty manifest chain"))
      val curHw = parseHw(latestLines)
      val curFiles = filesFromManifestLines(basePath, latestLines).getOrElse(
        sys.error(s"merge-forward on $who: the advanced chain has no file " +
          "snapshot — lifecycle rewrites always carry one"))
      val pids = (curHw.keySet ++ stagedHw.keySet).toSeq.sorted
      val hwLines = pids.map(p =>
        s"$p,${math.max(curHw.getOrElse(p, -1L), stagedHw.getOrElse(p, -1L))}")
      val curSet = curFiles.toSet
      val merged = curFiles ++ own.filterNot(curSet)
      val e2 = latestEpoch + 1
      val content = (hwLines ++
        fileSnapshotLinesAt(basePath, e2, merged, listThreshold) ++
        Seq(s"M,${staged.epoch}")).mkString("\n")
      tryCommitManifest(basePath, e2, content) match {
        case CommitOutcome.Committed | CommitOutcome.Identical =>
          finishVia(e2)
          return
        case CommitOutcome.Conflict(occ) =>
          if (mergeProvenance(occ).contains(staged.epoch)) {
            // another healer (Txn.recover) completed the merge first
            finishVia(e2)
            return
          }
          require(isLifecycleManifest(occ),
            s"merge-forward of staged epoch ${staged.epoch} on $who raced " +
              s"a non-lifecycle manifest at epoch $e2 — a second append " +
              "writer is live (appends are single-writer per topic)")
          // a lifecycle rewrite raced the merge — loop and re-base
      }
    }
  }

  /** Non-recursive children (one listStatus RPC). */
  private[log] def listDir(dir: HPath): Seq[HPath] = PathIO.listDir(dir)

  /** Recursive pre-order walk, start included (statuses via
    * [[PathIO.walkStatuses]] when mtimes are also needed — one RPC per
    * directory instead of one per entry). */
  private[log] def walkAll(dir: HPath): Seq[HPath] = PathIO.walkAll(dir)

  /** The DIRECT-staging record of one epoch (object-store topics): a
    * small `_staging/<epoch>.files` file, atomicCreate'd right after the
    * epoch's data files are written AT THEIR FINAL PATHS, listing those
    * relative paths. It plays exactly the `_staging/<epoch>/` tree's
    * protocol role — existence marks an in-flight/abandoned staging,
    * mtime carries its age, the txn-marker set protects it — without
    * the per-object COPY+DELETE the publish-time moves cost on stores
    * whose rename is a copy. Deleted by [[TopicLog.publishManifest]]
    * after the manifest commits (the files are live from the manifest
    * alone) or by [[dropStagedEpoch]] when the staging is abandoned. */
  private[graft] def stagingRecord(basePath: String, epoch: Long): HPath =
    PathIO.path(basePath, "_staging", s"$epoch.files")

  /** Relative final paths listed by a direct-staging record; empty when
    * the record is absent (or vanished to a competing healer). */
  private[graft] def readStagingRecord(basePath: String, epoch: Long): Seq[String] =
    try PathIO.readLines(stagingRecord(basePath, epoch)).filter(_.nonEmpty)
    catch { case _: IOException => Seq.empty }

  /** Delete one staged epoch — the `_staging/<epoch>/` tree AND, for a
    * direct staging, the record's listed final-path files plus the
    * record itself (best-effort — a competing healer may be completing
    * or cleaning the same epoch). Callers gate on the epoch's manifest
    * being ABSENT: a direct staging whose manifest committed is live
    * data. Shared by [[vacuumStaged]] and [[Txn]]'s at-deadline
    * cleanup. */
  private[log] def dropStagedEpoch(basePath: String, epoch: Long): Unit = {
    val dir = PathIO.path(basePath, "_staging", epoch.toString)
    try { PathIO.deleteTree(dir); () } catch { case _: IOException => () }
    val rec = stagingRecord(basePath, epoch)
    try {
      if (PathIO.exists(rec)) {
        readStagingRecord(basePath, epoch).foreach { rel =>
          try { PathIO.deleteIfExists(PathIO.path(basePath, rel)); () }
          catch { case _: IOException => () }
        }
        PathIO.deleteIfExists(rec): Unit
      }
    } catch { case _: IOException => () }
  }

  /**
   * Atomically publish `content` at `target` iff absent — FIRST writer
   * wins; either way the caller must verify the target's content
   * against its own. [[PathIO.atomicCreate]]: hard-link protocol on
   * local schemes (link(2) fails atomically where rename(2) silently
   * REPLACES — the TOCTOU this primitive closes), exclusive rename on
   * HDFS. Shared by [[TopicLog.publishManifest]] and [[Txn.recover]].
   */
  private[graft] def atomicCreate(target: HPath, content: Array[Byte]): Boolean =
    PathIO.atomicCreate(target, content)

  /**
   * Bound the `_manifest` history of a TopicLog-layout base dir (topic
   * or ack log): delete committed manifests — and their `.flist.` side
   * files — older than the newest `keepLast`. Readers consult only the
   * LATEST manifest, so pruned history is never on a read path; what
   * makes this safe are the two skip rules:
   *
   *  1. an epoch referenced by a live txn marker under `<root>/_txn`
   *     survives — deleting its manifest would make the marker
   *     unretireable (vacuumAll retires a marker only when every line's
   *     manifest exists) and ping-pong with [[graft.log.Txn.recover]],
   *     which re-heals missing marker manifests;
   *  2. an epoch whose `_staging/<epoch>/` tree still exists survives —
   *     that is a committed-but-unmoved crash window, and
   *     [[recoverStaging]] refuses manifest-less epochs, so pruning the
   *     manifest first would orphan the staged rows.
   *
   * Without pruning, `_manifest` grows one file per append FOREVER and
   * every `committedEpochs()` listing — on every read — pays
   * O(all-time appends); with it, the listing is O(keepLast). Run from
   * the same operational janitor cadence as [[graft.log.Txn.vacuumAll]]
   * (`Admin.pruneManifests` sweeps a whole root). Returns files
   * deleted.
   */
  def pruneManifestHistory(basePath: String, root: String,
                           keepLast: Int = 16,
                           markersByBase: Option[Map[String, Set[Long]]] = None): Int = {
    require(keepLast >= 1, "must keep at least the latest manifest")
    val manifestDir = PathIO.path(basePath, "_manifest")
    if (!PathIO.exists(manifestDir)) return 0
    // ONE directory listing for the whole prune: the first sweep of a
    // long-history topic has O(all-time appends) victims, and a
    // per-victim re-list would make that first run quadratic in
    // exactly the case the janitor exists to fix
    val entries = PathIO.listDir(manifestDir).map(p => p -> p.getName)
    val epochs = entries.map(_._2).filter(_.endsWith(".commit"))
      .map(_.stripSuffix(".commit").toLong).sorted
    if (epochs.size <= keepLast) return 0
    // `markersByBase` lets Admin.pruneManifests parse the `_txn` marker
    // set ONCE per sweep instead of once per topic/ack base — the same
    // (T+S)-passes hazard Txn.vacuumAll documents
    val marked = markersByBase.getOrElse(Txn.markerEpochs(root))
      .getOrElse(PathIO.qualify(basePath).toString, Set.empty)
    val victims = epochs.dropRight(keepLast)
      .filterNot(marked.contains)
      .filterNot(e => PathIO.exists(PathIO.path(basePath, "_staging", e.toString)))
      .filterNot(e => PathIO.exists(stagingRecord(basePath, e)))
    val flistByEpoch = entries
      .filter(_._2.contains(".flist."))
      .groupBy(_._2.takeWhile(_ != '.'))
    var deleted = 0
    victims.foreach { e =>
      if (PathIO.deleteIfExists(PathIO.child(manifestDir, s"$e.commit"))) deleted += 1
      // a retired merge-provenance marker prunes with its epoch — it was
      // only needed while a txn marker could still ask about the epoch,
      // and marker-referenced epochs are never victims
      if (PathIO.deleteIfExists(PathIO.child(manifestDir, s"$e.merged"))) deleted += 1
      flistByEpoch.getOrElse(e.toString, Seq.empty)
        .foreach { case (p, _) => if (PathIO.deleteIfExists(p)) deleted += 1 }
    }
    deleted
  }

  /** Move `_staging/<epoch>/` files into the readable partition dirs,
    * preserving relative paths; idempotent (skips already-moved files)
    * AND race-tolerant: two healers (publishManifest, Txn.recover, a
    * READ_UNCOMMITTED reader) may complete the same epoch concurrently —
    * whichever loses a per-file move race treats the competing move as
    * its own success instead of crashing a commit that already
    * happened. */
  private[log] def completeStagedMoves(basePath: String, epoch: Long): Unit =
    completeMovesFrom(basePath, PathIO.path(basePath, "_staging", epoch.toString))

  /** [[completeStagedMoves]] generalized to ANY staging tree under
    * `_staging/` — epoch-numbered trees and `rw-` rewrite trees share
    * the move protocol; only their commit bookkeeping differs. */
  private[log] def completeMovesFrom(basePath: String, stagingDir: HPath): Unit = {
    if (!PathIO.exists(stagingDir)) return
    // the walk races the competing healer's moves/deletes: an entry
    // vanishing mid-walk aborts the iteration, so RETRY until one walk
    // completes — returning a partial listing and then cleaning up
    // would delete parquet the partial walk never moved
    def walkOnce(): Option[Seq[HPath]] =
      try Some(PathIO.walkAll(stagingDir))
      catch { case _: IOException => None }
    var entries: Option[Seq[HPath]] = None
    var attempts = 0
    while (entries.isEmpty && attempts < 8 && PathIO.exists(stagingDir)) {
      entries = walkOnce()
      attempts += 1
      // linear backoff so the retries outlive the competitor's burst of
      // moves/deletes instead of all burning in one contention window
      if (entries.isEmpty) Thread.sleep(5L * attempts)
    }
    // giving up silently would return success from publishManifest with
    // committed rows never moved into place — if the staging tree still
    // exists and we could not list it, fail so the caller retries
    if (entries.isEmpty && PathIO.exists(stagingDir))
      throw new IllegalStateException(
        s"staging $stagingDir: could not complete moves after $attempts " +
          "contended walks")
    entries.getOrElse(Seq.empty)
      .filter(_.getName.endsWith(".parquet"))
      .foreach { p =>
        val rel = PathIO.relativize(stagingDir, p)
        val target = PathIO.path(basePath, rel)
        PathIO.mkdirs(target.getParent)
        // tolerant: competitor already moved it (src gone) or it is
        // already at the target — either way the commit happened
        PathIO.moveTolerant(p, target)
      }
    // clean the emptied staging tree — but NEVER delete a data file:
    // if a parquet somehow lingers (competitor mid-move), a later
    // recoverStaging pass finishes it; deleting directories that still
    // hold files just no-ops (not-empty failures swallowed)
    if (entries.isDefined)
      walkOnce().getOrElse(Seq.empty).reverse
        .filterNot(_.getName.endsWith(".parquet"))
        .foreach(p => try { PathIO.deleteIfExists(p); () } catch { case _: Throwable => () })
  }

  /** Prefix of REWRITE stagings ([[TopicLog.replaceDataFiles]]): unlike
    * append stagings they are NOT keyed by a reserved epoch — a rewrite
    * may commit at any chain position after re-basing — so they stage
    * under a job-unique name that can never collide with a transaction's
    * staged epoch. Their commit test is membership: a rewrite is
    * committed iff its files are in the current snapshot. */
  private[log] val RewritePrefix = "rw-"

  /** Current-snapshot file set of a base (empty when offset-only). */
  private[log] def currentSnapshotSet(basePath: String): Set[String] =
    filesFromManifestLines(basePath, latestManifestLinesAt(basePath))
      .map(_.toSet).getOrElse(Set.empty)

  /** Heal one `rw-` staging entry whose rewrite COMMITTED (its files
    * are in the current snapshot) but whose cleanup crashed: complete a
    * tree's moves / drop a record. Uncommitted rw stagings are left for
    * the aged janitor ([[vacuumStagedProtected]]). Returns true if it
    * healed. */
  private[log] def healRwStaging(basePath: String, entry: HPath,
                                 snapshot: Set[String]): Boolean = {
    val n = entry.getName
    if (n.endsWith(".files")) {
      val rels =
        try PathIO.readLines(entry).filter(_.nonEmpty)
        catch { case _: IOException => Seq.empty }
      if (rels.exists(snapshot.contains)) {
        PathIO.deleteIfExists(entry): Unit
        true
      } else false
    } else {
      val rels =
        try PathIO.walkAll(entry).filter(_.getName.endsWith(".parquet"))
          .map(p => PathIO.relativize(entry, p))
        catch { case _: IOException => Seq.empty }
      if (rels.exists(snapshot.contains)) {
        completeMovesFrom(basePath, entry)
        true
      } else false
    }
  }

  /** Recovery: complete moves / drop records for every staged epoch
    * whose content is committed ([[stagedEpochResolved]] — its own
    * manifest or a merged-forward one) and every committed `rw-`
    * rewrite staging (crash between manifest write and cleanup).
    * Unresolved epochs and uncommitted rewrites stay staged — invisible
    * garbage or in-flight writer state, never visible rows. Returns
    * entries healed. */
  def recoverStaging(topicPath: String): Int = {
    val stagingRoot = PathIO.path(topicPath, "_staging")
    if (!PathIO.exists(stagingRoot)) return 0
    var healed = 0
    lazy val snapshot = currentSnapshotSet(topicPath)
    PathIO.listDir(stagingRoot).foreach { dir =>
      val n = dir.getName
      if (n.startsWith(RewritePrefix)) {
        if (healRwStaging(topicPath, dir, snapshot)) healed += 1
      } else if (n.endsWith(".files")) {
        // DIRECT staging: the files are already final; a resolved epoch
        // means only the record's cleanup crashed — finish it
        scala.util.Try(n.stripSuffix(".files").toLong).toOption.foreach { e =>
          if (stagedEpochResolved(topicPath, e)) {
            PathIO.deleteIfExists(dir): Unit
            healed += 1
          }
        }
      } else scala.util.Try(n.toLong).toOption.foreach { e =>
        if (stagedEpochResolved(topicPath, e)) {
          completeStagedMoves(topicPath, e)
          healed += 1
        }
      }
    }
    healed
  }

  /**
   * Drop staged epochs abandoned by transactions that can no longer
   * commit — the storage half of the reference's timeout abort
   * (TransactionTimeoutTracker.java:37 fires, the metadata store moves
   * the txn to ABORTING, and the transaction buffer discards its data;
   * for acks, PendingAckHandleImpl releases the pending set so the
   * messages redeliver). A staged epoch with no committed manifest is
   * invisible garbage for READ_COMMITTED, but on an [[AckLog]] it is
   * ALSO the pending-ack set that blocks redelivery — without this
   * verb a producer that crashed mid-transaction pins its pending acks
   * (and its disk) forever.
   *
   * Safety contract, three guards:
   *  - `olderThanMs` must be ≥ the transaction timeout ([[Txn.begin]]'s
   *    `timeoutMs`). A txn writes its commit marker no later than its
   *    deadline = openedAt + timeout ([[Txn.commit]] re-checks the
   *    clock immediately before the marker write), and staging happens
   *    after openedAt, so a staged tree whose NEWEST file is older than
   *    `timeoutMs` either belongs to a txn whose marker already exists
   *    or to no committable txn at all.
   *  - Epochs whose manifest IS committed are never touched (they
   *    belong to [[recoverStaging]]); the manifest re-check sits
   *    immediately before the delete to shrink the window against a
   *    racing legal commit.
   *  - `txnRoot` (the [[Txn.begin]] root) protects epochs referenced by
   *    a `_txn/<id>.committed` marker whose manifest has not been
   *    published yet — the crash-after-marker-before-publish window,
   *    where the staged files are COMMITTED data awaiting
   *    [[Txn.recover]]. Pass it whenever the log participates in
   *    transactions; without it such an epoch would age past the
   *    horizon and be deleted, losing a committed transaction.
   * Returns the number of staged epochs dropped.
   */
  def vacuumStaged(basePath: String, olderThanMs: Long,
                   nowMs: () => Long = () => System.currentTimeMillis(),
                   txnRoot: Option[String] = None): Int = {
    // txnRoot omitted: AUTO-DETECT a `_txn` marker directory at the log
    // root or ANY ancestor up to the filesystem root (the Txn.begin
    // root sits above tenant/namespace/topic for a topic base, and two
    // MORE levels above <topic>/_subs/<sub>/acks for an ack-log base —
    // a bounded probe would reach one but not the other, leaving the
    // data-loss window open on whichever leg it missed; existence
    // checks are cheap, so walk all the way). The old default — no
    // protection unless the caller remembered the parameter — made the
    // DANGEROUS mode the implicit one: a crash in the marker-written-
    // but-manifest-unpublished window plus a parameterless vacuumStaged
    // call would permanently delete a committed transaction's staged
    // data once it aged past the horizon.
    val detectedRoot = txnRoot.orElse {
      Iterator.iterate(PathIO.qualify(basePath))(_.getParent)
        .takeWhile(_ != null)
        .find(p => PathIO.isDirectory(PathIO.child(p, "_txn")))
        .map(_.toString)
    }
    val baseAbs = PathIO.qualify(basePath).toString
    def parse(): Set[Long] = detectedRoot
      .map(r => Txn.markerEpochs(r).getOrElse(baseAbs, Set.empty))
      .getOrElse(Set.empty)
    vacuumStagedProtected(basePath, olderThanMs, nowMs, parse(),
      reProtect = detectedRoot.map(_ => () => parse()))
  }

  /** [[vacuumStaged]] against an already-parsed protected-epoch set —
    * [[Txn.vacuumAll]] parses the marker directory once per SWEEP
    * instead of once per log. */
  /** `reProtect`, when given, is re-evaluated IMMEDIATELY before each
    * epoch delete: the sweep-wide marker parse proves no marker was
    * written before the parse, but a marker WRITE can land arbitrarily
    * late (GC pause, slow FS) after its clock re-check — re-parsing at
    * delete time shrinks that TOCTOU window from sweep-length to
    * filesystem-operation scale, and is cheap relative to the recursive
    * delete it gates (zero cost when nothing expires). */
  private[log] def vacuumStagedProtected(basePath: String, olderThanMs: Long,
                                         nowMs: () => Long,
                                         markerProtected: Set[Long],
                                         reProtect: Option[() => Set[Long]] = None): Int = {
    val stagingRoot = PathIO.path(basePath, "_staging")
    if (!PathIO.exists(stagingRoot)) return 0
    var dropped = 0
    lazy val snapshot = currentSnapshotSet(basePath)
    // mtimes of a record entry include its listed final-path files
    def newestMs(dir: HPath, rels: => Seq[String]): Long =
      try {
        val recordMs = PathIO.walkStatuses(dir).map(_.getModificationTime)
          .foldLeft(0L)(math.max)
        rels.foldLeft(recordMs) { (m, rel) =>
          try math.max(m, PathIO.lastModified(PathIO.path(basePath, rel)))
          catch { case _: IOException => m }
        }
      } catch { case _: IOException => Long.MaxValue }
    PathIO.listDir(stagingRoot).foreach { dir =>
      val n = dir.getName
      // staged entries come in three forms: the `<epoch>/` tree
      // (move-based staging), the `<epoch>.files` record (direct
      // staging — final-path files, see [[stagingRecord]]), and
      // `rw-*` rewrite stagings ([[RewritePrefix]] — not txn work,
      // never marker-protected); any other name is not staged state —
      // never touch it
      if (n.startsWith(RewritePrefix)) {
        if (!healRwStaging(basePath, dir, snapshot)) {
          // uncommitted rewrite: a crashed/abandoned coalesce attempt —
          // droppable once aged past the horizon (its caller is gone)
          val rels: Seq[String] =
            if (!n.endsWith(".files")) Seq.empty
            else try PathIO.readLines(dir).filter(_.nonEmpty)
            catch { case _: IOException => Seq.empty }
          if (nowMs() - newestMs(dir, rels) > olderThanMs) {
            rels.foreach { rel =>
              try { PathIO.deleteIfExists(PathIO.path(basePath, rel)); () }
              catch { case _: IOException => () }
            }
            if (n.endsWith(".files")) PathIO.deleteIfExists(dir): Unit
            else PathIO.deleteTree(dir): Unit
            if (!PathIO.exists(dir)) dropped += 1
          }
        }
      } else {
        val epochOpt =
          if (n.endsWith(".files"))
            scala.util.Try(n.stripSuffix(".files").toLong).toOption
          else scala.util.Try(n.toLong).toOption
        epochOpt.foreach { epoch =>
          val expired = nowMs() - newestMs(dir,
            if (n.endsWith(".files")) readStagingRecord(basePath, epoch)
            else Seq.empty) > olderThanMs
          // resolved = the staged CONTENT is committed (own manifest or
          // merged forward) — NOT mere existence of `<epoch>.commit`,
          // which a lifecycle rewrite may occupy while the staging is
          // still legitimately in flight awaiting its merge
          lazy val resolved = stagedEpochResolved(basePath, epoch)
          if (n.endsWith(".files") && resolved) {
            // publish crashed between commit/merge and record cleanup:
            // the files are live — heal by removing only the record
            PathIO.deleteIfExists(dir): Unit
          } else if (expired && !markerProtected.contains(epoch) &&
              reProtect.forall(f => !f().contains(epoch)) &&
              !resolved) {
            dropStagedEpoch(basePath, epoch)
            if (!PathIO.exists(dir) &&
                !PathIO.exists(stagingRecord(basePath, epoch))) dropped += 1
          }
        }
      }
    }
    dropped
  }
}

final class TopicLog(val spark: SparkSession, val root: String, val name: TopicName,
                     val numPartitions: Int = 4) {

  private val basePath = name.path(root)
  private val manifestDir = PathIO.path(basePath, "_manifest")

  /** Committed epochs, ascending. */
  private def committedEpochs(): Seq[Long] = TopicLog.committedEpochsAt(basePath)

  /** Latest manifest's lines, with the prune-race retry
    * ([[TopicLog.latestManifestLinesAt]]). */
  private def latestManifestLines(): Seq[String] =
    TopicLog.latestManifestLinesAt(basePath)

  /** Per-partition high-water offsets from the latest commit manifest
    * (`p,offset` lines; `F,` file-snapshot lines are skipped). */
  /** Partition ids every manifest writer must carry high-water lines
    * for: this handle's count UNION whatever the latest manifest already
    * tracks. After a partition-count expansion (Admin.updatePartitions),
    * a write through a stale smaller-count handle would otherwise
    * truncate the manifest to its own range — silently hiding committed
    * rows on the expanded partitions and restarting their offsets. */
  private def hwPartitionIds(hw: Map[Int, Long]): Seq[Int] =
    (hw.keySet ++ (0 until numPartitions)).toSeq.sorted

  /** [[TopicLog.pruneManifestHistory]] for this topic's base dir. */
  def pruneManifests(keepLast: Int = 16): Int =
    TopicLog.pruneManifestHistory(basePath, root, keepLast)

  def highWater(): Map[Int, Long] =
    TopicLog.parseHw(latestManifestLines())

  /**
   * Explicit file snapshot from the latest manifest: relative paths of
   * the live data files, or None while the manifest is offset-only
   * (append-only mode, where the directory listing IS the snapshot).
   * A file snapshot appears after the first [[replaceDataFiles]]
   * (coalesce) and is carried forward by every later append — the same
   * snapshot-isolation trick as a Delta/Iceberg commit log: rewrites
   * become visible at one atomic manifest commit, and replaced files
   * stay on disk (unreferenced) until [[vacuum]], so concurrent readers
   * planned against the old snapshot never lose rows.
   */
  def manifestFiles(): Option[Seq[String]] = {
    // bounded retry for the same prune race latestManifestLines guards:
    // a side file vanishes only when its whole EPOCH was pruned (side
    // files delete with their commit), which requires a newer commit —
    // re-resolving from the new latest converges
    // TWO-LEVEL snapshot (`L,<side-file>` lines): above the inline
    // threshold the F-section lives in manifest-list side files — the
    // Iceberg manifest-list shape — so the per-epoch commit file stays
    // O(1) in size however many data files the snapshot tracks. Side
    // files are written atomically BEFORE the manifest move (crash ⇒
    // invisible garbage, identical to staged data files), so a
    // committed manifest's references always resolve. "F,-" is the
    // explicit EMPTY snapshot — distinct from "no F lines" =
    // offset-only legacy mode.
    var attempt = 0
    while (true) {
      val lines = latestManifestLines()
      try return TopicLog.filesFromManifestLines(basePath, lines)
      catch {
        case e: FileNotFoundException =>
          attempt += 1
          if (attempt >= 5) throw e
      }
    }
    None // unreachable
  }

  /** Inline-F-section ceiling: snapshots tracking more files than this
    * switch to manifest-list side files (`spark.graft.manifestListThreshold`;
    * the default keeps driver-fixture topics inline while a 100 TB
    * topic's hundred-thousand-file snapshot becomes ~file-per-4096
    * chunks read only by [[manifestFiles]], never per-row). */
  private def manifestListThreshold: Int =
    spark.conf.getOption("spark.graft.manifestListThreshold")
      .map(_.toInt).getOrElse(256)

  /** Snapshot section for `epoch`: inline `F,` lines up to the
    * threshold, else `L,` references to side chunk files written here
    * (before the manifest move — see [[manifestFiles]] crash argument).
    * Side names are CONTENT-ADDRESSED (`<epoch>.flist.<k>.<md5/16>`):
    * the manifest line itself then carries the chunk's content
    * identity, so [[publishManifest]]'s same-epoch race detection —
    * which compares manifest BYTES — still distinguishes two racing
    * writers' different file lists (name-only references would make
    * their manifests byte-identical and let the loser silently corrupt
    * the winner's snapshot). Same content ⇒ same name, so a retried
    * publish is a no-op write; a losing racer's side file stays as
    * orphan garbage in `_manifest/` (tiny, same class as `.tmp`
    * leftovers). */
  private def fileSnapshotLines(epoch: Long, files: Seq[String]): Seq[String] =
    TopicLog.fileSnapshotLinesAt(basePath, epoch, files, manifestListThreshold)

  import TopicLog.StagedAppend

  /**
   * Produce a batch: route rows to partitions, assign monotonically
   * increasing offsets per partition, append parquet, commit manifest.
   *
   * Routing parity (reference MessageRoutingMode.java:39-55):
   *   keyed rows  → murmur3(key) % numPartitions  (key-hash routing)
   *   unkeyed     → caller pre-assigns `partition` (round-robin stand-in)
   *
   * `df` must carry envelope columns except topic/partition/offset, which
   * this method derives. Returns count appended. Appends are single-writer
   * per topic (the reference serializes per-partition adds the same way,
   * ManagedLedgerImpl.internalAsyncAddEntry:821).
   */
  def append(df: DataFrame): Long = {
    val staged = stageAppend(df)
    publishManifest(staged)
    staged.count
  }

  /** Phase 1: write data files + compute the manifest, WITHOUT publishing
    * — rows stay invisible to readers until [[publishManifest]]. */
  def stageAppend(df: DataFrame): StagedAppend = {
    // a direct-staged topic is ALWAYS in snapshot mode: flip offset-only
    // history into an explicit snapshot BEFORE the first direct write
    // (see [[bootstrapSnapshot]] — closes the crashed-write orphan
    // window structurally: orphans at final paths are outside the
    // committed snapshot from the first direct byte onward)
    if (directStage && manifestFiles().isEmpty) bootstrapSnapshot()
    val hw = highWater()
    val hwDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        (0 until numPartitions).map(p => org.apache.spark.sql.Row(p, hw.getOrElse(p, -1L))), 1),
      StructType(Seq(StructField("partition", IntegerType), StructField("base_offset", LongType))))

    val routed = (if (df.columns.contains(Envelope.Partition)) df
      else df.withColumn(Envelope.Partition,
        pmod(Murmur3Pulsar.pulsar_hash(col(Envelope.Key)), lit(numPartitions)).cast(IntegerType)))
      .withColumn(Envelope.Topic, lit(name.fqn))

    // Offset assignment: rank within the incoming batch per partition,
    // ordered by (publish_time, sequence_id) for determinism, added to the
    // committed high-water mark. Only the new batch is shuffled.
    val w = Window.partitionBy(Envelope.Partition)
      .orderBy(col(Envelope.PublishTime), col(Envelope.SequenceId))
    val withOffsets = routed
      .withColumn("_rn", row_number().over(w).cast(LongType))
      .join(broadcast(hwDf), Seq(Envelope.Partition))
      .withColumn(Envelope.Offset, col("base_offset") + col("_rn"))
      .drop("_rn", "base_offset")

    val epoch = committedEpochs().lastOption.getOrElse(-1L) + 1L
    clearStaging(epoch) // a crashed prior attempt may have left files here
    val stagedFiles: Seq[String] =
      if (directStage) {
        // DIRECT staging (object-store topics): write the data files AT
        // THEIR FINAL PATHS through the rename-free committer — the
        // publish-time per-file moves, which an object store bills as a
        // server-side COPY of the batch's entire bytes, do not exist.
        // Invisibility before publish holds because direct-staged topics
        // are always in SNAPSHOT mode (bootstrapped above): readers plan
        // only committed-snapshot files. The write is TOKEN-BOUND
        // ([[DirectCommitProtocol.TokenProp]]): the job manifest read
        // back is verified to be THIS job's, so two racing same-topic
        // writers are detected even when one's `_SUCCESS` overwrote the
        // other's. The staging RECORD (`_staging/<epoch>.files`)
        // carries the protocol state the staged TREE used to: age for
        // the vacuum horizon, txn-marker protection, loud single-writer
        // collisions. The reference's cold tier has the same posture —
        // direct block uploads, an index activating them
        // (tiered-storage/jcloud/.../BlobStoreManagedLedgerOffloader.java).
        val fs = directWriteAtFinalPaths(withOffsets,
          s"direct staged append on ${name.fqn}")
        if (!TopicLog.atomicCreate(TopicLog.stagingRecord(basePath, epoch),
            fs.mkString("\n").getBytes("UTF-8"))) {
          val existing = TopicLog.readStagingRecord(basePath, epoch)
          require(existing == fs,
            s"staging record for epoch $epoch exists with different " +
              s"content — concurrent writers detected on ${name.fqn}")
        }
        fs
      } else {
        // ONE computation of the batch, straight to disk — data lands
        // under _staging/<epoch>/ (underscore dirs are invisible to
        // Spark file listing, so neither batch readers nor streaming
        // subscribers can observe rows before publishManifest moves
        // them). No persist: a 100 TB incoming batch cannot be cached,
        // but the just-written staged files can be re-read cheaply (two
        // columns, parquet min/max stats, page-cache warm) for the
        // count + high-water.
        withOffsets.write.mode("append").partitionBy(Envelope.Partition)
          .parquet(s"$basePath/_staging/$epoch")
        if (PathIO.exists(PathIO.path(basePath, "_staging", epoch.toString)))
          stagedRelPaths(epoch)
        else Seq.empty // empty batch: nothing staged
      }
    // count + per-partition max offset from the parquet FOOTERS of the
    // just-written files — metadata-only, no second scan of the batch
    // (row counts and column min/max live in the block metadata). The
    // partition id comes from the hive path segment.
    val statsBase =
      if (directStage) PathIO.path(basePath)
      else PathIO.path(basePath, "_staging", epoch.toString)
    val stagedStats = footerStatsAt(statsBase, stagedFiles)
    val n = stagedStats.values.map(_._1).sum
    val merged = hwPartitionIds(hw)
      .map(p => p -> math.max(hw.getOrElse(p, -1L),
        stagedStats.get(p).map(_._2).getOrElse(-1L)))
    val hwLines = merged.map { case (p, o) => s"$p,$o" }
    // once a file snapshot is active (post-coalesce, and ALWAYS on
    // direct-staged topics — bootstrapped at entry), every manifest
    // carries it forward: previous live files + the files this append
    // stages
    val fileLines = manifestFiles() match {
      case Some(prev) => fileSnapshotLines(epoch, prev ++ stagedFiles)
      case None => Seq.empty
    }
    StagedAppend(epoch, (hwLines ++ fileLines).mkString("\n"), n)
  }

  /** Token-bound direct write at final paths: bind the job to a fresh
    * token via the thread-local [[DirectCommitProtocol.TokenProp]], run
    * the write, and read back the job manifest VERIFYING it is this
    * job's (a racing same-directory writer's `_SUCCESS` overwrite is a
    * loud failure, not a silently adopted file list). Returns the
    * job's relative file paths, sorted. */
  private def directWriteAtFinalPaths(df: DataFrame, what: String): Seq[String] = {
    val token = java.util.UUID.randomUUID().toString
    val sc = spark.sparkContext
    val prevToken = sc.getLocalProperty(DirectCommitProtocol.TokenProp)
    sc.setLocalProperty(DirectCommitProtocol.TokenProp, token)
    try df.write.mode("append").partitionBy(Envelope.Partition).parquet(basePath)
    finally sc.setLocalProperty(DirectCommitProtocol.TokenProp, prevToken)
    DirectCommitProtocol.readManifest(basePath, expectToken = Some(token))
      .map(_.map(_._1).sorted)
      .getOrElse(sys.error(
        s"$what found no direct-commit manifest — object-store topics " +
          s"require ${DirectCommitProtocol.Key} = ${DirectCommitProtocol.Value}"))
  }

  /** Flip an offset-only direct topic into snapshot mode with a
    * committed lifecycle manifest listing the walked live set, BEFORE
    * any direct write happens. Direct writes land at final paths, so in
    * offset-only mode a crashed attempt's complete-but-unrecorded files
    * (job abort with committed tasks whose cleanup died, driver death
    * before the staging record) would be swept into the next walk as
    * committed data — serving every staged row twice once the retry
    * lands. With the snapshot committed first, anything a later crash
    * orphans is OUTSIDE the snapshot by construction: invisible to
    * readers, collected by [[vacuum]]. On a topic born direct this is
    * one tiny empty-snapshot manifest at epoch 0. */
  private def bootstrapSnapshot(): Unit = {
    var attempts = 0
    while (manifestFiles().isEmpty) {
      attempts += 1
      require(attempts <= 16,
        s"snapshot bootstrap on ${name.fqn} did not converge after 16 attempts")
      val hw = highWater()
      val epoch = committedEpochs().lastOption.getOrElse(-1L) + 1L
      val hwLines = hwPartitionIds(hw).map(p => s"$p,${hw.getOrElse(p, -1L)}")
      val fileLines = fileSnapshotLines(epoch, bootstrapLiveFiles(Seq.empty))
      val content =
        (hwLines ++ fileLines ++ Seq(TopicLog.LifecycleLine)).mkString("\n")
      TopicLog.tryCommitManifest(basePath, epoch, content) match {
        case TopicLog.CommitOutcome.Committed |
             TopicLog.CommitOutcome.Identical => ()
        case TopicLog.CommitOutcome.Conflict(_) => () // raced — re-read, loop
      }
    }
  }

  /** Whether this topic stages appends DIRECTLY at final paths (class
    * doc of [[TopicLog.stagingRecord]]): object-store base paths, the
    * rename-free posture. Opt-out with `spark.graft.directStage=false`
    * (compatibility escape hatch); never engages under speculative
    * execution, whose duplicate task attempts need the stock staging's
    * isolation. */
  private def directStage: Boolean =
    PathIO.isObjectStore(PathIO.path(basePath)) &&
      spark.conf.getOption("spark.graft.directStage").forall(_.toBoolean) &&
      !spark.sparkContext.getConf.getBoolean("spark.speculation",
        defaultValue = false)

  /** Pre-snapshot live files of this topic for the snapshot bootstrap:
    * every data file under the base EXCEPT files claimed by ANY staging
    * record (an abandoned earlier direct staging's files are at final
    * paths but were never committed) and — the footer guard — files
    * whose max offset EXCEEDS the committed high-water of their
    * partition. In offset-only history every committed file's offsets
    * are ≤ the manifest high-water, so a candidate past it can only be
    * a crashed record-less direct attempt's orphan (e.g. left by a
    * pre-bootstrap-era binary): it is deleted and excluded rather than
    * swept in as committed data, which would serve its rows twice once
    * the retried append lands the same offsets. Files in partitions the
    * manifest has never tracked are kept — they are foreign/imported
    * data this engine cannot judge. One-time O(files) footer reads,
    * paid only at the offset-only → snapshot flip. */
  private def bootstrapLiveFiles(stagedFiles: Seq[String]): Seq[String] = {
    val base = PathIO.path(basePath)
    if (!PathIO.exists(base)) return Seq.empty
    val staged = stagedFiles.toSet
    val recorded = stagingRecordFiles()
    val hw = highWater()
    TopicLog.walkAll(base)
      .filter(p => p.getName.endsWith(".parquet"))
      .map(p => PathIO.relativize(base, p))
      .filterNot(rel => rel.split('/').exists(_.startsWith("_")))
      .filterNot(staged.contains)
      .filterNot(recorded.contains)
      .filter { rel =>
        footerFileStat(PathIO.path(basePath), rel) match {
          case Some((p, _, maxOffset))
              if hw.contains(p) && maxOffset > hw(p) =>
            // orphan of a crashed, record-less direct attempt — its
            // offsets were never committed; purge instead of adopting
            PathIO.deleteIfExists(PathIO.path(basePath, rel)): Unit
            false
          case _ => true
        }
      }
      .sorted
  }

  /** Per-partition (rowCount, max offset) for staged files under
    * `statsBase` (the `_staging/<epoch>/` tree, or the topic base
    * itself for direct stagings), read from parquet block metadata
    * only — O(files) footer reads on the driver, never a scan of the
    * data pages. */
  private def footerStatsAt(statsBase: org.apache.hadoop.fs.Path,
                            relPaths: Seq[String]): Map[Int, (Long, Long)] =
    relPaths.flatMap { rel =>
      footerFileStat(statsBase, rel).map { case (p, rows, maxOffset) =>
        require(maxOffset >= 0L || rows == 0L,
          s"no offset statistics in staged file $rel — cannot advance high-water")
        p -> (rows, maxOffset)
      }
    }.groupBy(_._1).map { case (p, vs) =>
      p -> (vs.map(_._2._1).sum, vs.map(_._2._2).max)
    }

  /** One file's (partition, rowCount, max offset) from its parquet
    * footer; None for a zero-row file. Max offset is −1 when the file
    * has rows but no offset statistics (callers decide whether that is
    * an error — the staging stats path requires them; the bootstrap
    * guard treats such a file as unjudgeable and keeps it). */
  private def footerFileStat(statsBase: org.apache.hadoop.fs.Path,
                             rel: String): Option[(Int, Long, Long)] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val conf = spark.sparkContext.hadoopConfiguration
    val partition = rel.split('/').collectFirst {
      case seg if seg.startsWith(s"${Envelope.Partition}=") =>
        seg.substring(Envelope.Partition.length + 1).toInt
    }.getOrElse(sys.error(s"staged file outside a partition dir: $rel"))
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
      PathIO.path(statsBase.toString, rel), conf))
    try {
      val blocks = reader.getFooter.getBlocks.asScala
      val rows = blocks.map(_.getRowCount).sum
      val maxOffset = blocks.flatMap { b =>
        b.getColumns.asScala
          .find(_.getPath.toDotString == Envelope.Offset)
          .flatMap { c =>
            val st = c.getStatistics
            if (st == null || !st.hasNonNullValue) None
            else Some(st.genericGetMax.asInstanceOf[java.lang.Long].longValue)
          }
      }
      if (rows == 0) None
      else Some((partition, rows, if (maxOffset.isEmpty) -1L else maxOffset.max))
    } finally reader.close()
  }

  /** Remove any leftover staging tree for `epoch`. An un-published epoch
    * ≥ the last committed one can only be garbage from a crashed attempt
    * (a COMMITTED epoch would have advanced committedEpochs, so the next
    * staging write picks a higher number) — without this purge, a retry
    * writing with mode("append") would stage the stale files alongside
    * the fresh ones and commit every row twice. */
  private def clearStaging(epoch: Long): Unit = {
    val dir = PathIO.path(basePath, "_staging", epoch.toString)
    if (PathIO.exists(dir) && !PathIO.deleteTree(dir) && PathIO.exists(dir))
      throw new IOException(s"could not clear stale staging tree $dir")
    // a crashed DIRECT attempt at this epoch left final-path files under
    // a record — this epoch is un-published by construction (a committed
    // epoch would have advanced committedEpochs), so its files are
    // garbage a retry must purge before re-staging
    if (PathIO.exists(TopicLog.stagingRecord(basePath, epoch)))
      TopicLog.dropStagedEpoch(basePath, epoch)
  }

  /** Relative (final) paths of the parquet files staged for `epoch` —
    * staging preserves the partition subtree, so the relative path under
    * `_staging/<epoch>/` is the path the file will live at after publish. */
  private def stagedRelPaths(epoch: Long): Seq[String] = {
    val stagingDir = PathIO.path(basePath, "_staging", epoch.toString)
    PathIO.walkAll(stagingDir)
      .filter(_.getName.endsWith(".parquet"))
      .map(p => PathIO.relativize(stagingDir, p)).sorted
  }

  /**
   * Atomically replace the topic's data files with `df` (same rows, new
   * physical layout — the coalesce/rewrite path): stage the new files
   * under a job-unique `rw-` staging ([[TopicLog.RewritePrefix]] — a
   * name that can never collide with a transaction's reserved epoch),
   * then commit a LIFECYCLE manifest whose snapshot lists the rewrite
   * output plus any files appended since the rewrite's basis. The swap
   * is one atomic manifest commit; a crash before it leaves the old
   * snapshot intact (staged files are invisible garbage the janitor
   * ages out), a crash after it is healed by
   * [[TopicLog.recoverStaging]]. Replaced files stay on disk until
   * [[vacuum]] so readers mid-plan keep working. No caching: `df` is
   * written once, directly to staging.
   *
   * CONCURRENCY (round-17 merge-forward): this verb no longer refuses
   * while a staged append is in flight. It commits at the next chain
   * epoch — possibly the one a staged transaction reserved, whose late
   * publish then merges forward ([[TopicLog.mergeForwardPublish]]) —
   * and on losing a commit race it RE-BASES: recompute against the new
   * latest snapshot, carrying the racer's files (`latest − basis`)
   * alongside the rewrite output. The caller's `df` must be derived
   * from the snapshot at call time (our callers plan `read()`
   * immediately before). Escape hatch: `spark.graft.lifecycleMerge=false`
   * restores the round-16 refusal.
   */
  def replaceDataFiles(df: DataFrame): Unit = {
    if (!lifecycleMergeEnabled)
      requireNoInflightStagings("data-file replace (coalesce)")
    // direct topics rewrite in snapshot mode only (same orphan argument
    // as stageAppend — a crashed final-path rewrite must be outside a
    // committed snapshot, not ambient in an offset-only walk)
    if (directStage && manifestFiles().isEmpty) bootstrapSnapshot()
    val basis = manifestFiles().map(_.toSet).getOrElse(Set.empty)
    val rwId = s"${TopicLog.RewritePrefix}${java.util.UUID.randomUUID().toString.take(13)}"
    val newFiles =
      if (directStage) {
        // same rename-free posture as [[stageAppend]]'s direct branch:
        // the rewrite lands at final paths (job-unique names — they can
        // never collide with the files they replace), the snapshot flip
        // is the manifest commit, and the REPLACED files await vacuum()
        val fs = directWriteAtFinalPaths(df,
          s"direct data-file replace on ${name.fqn}")
        require(TopicLog.atomicCreate(
          PathIO.path(basePath, "_staging", s"$rwId.files"),
          fs.mkString("\n").getBytes("UTF-8")),
          s"rewrite staging record $rwId already exists on ${name.fqn} — " +
            "UUID collision")
        fs
      } else {
        df.write.mode("append").partitionBy(Envelope.Partition)
          .parquet(s"$basePath/_staging/$rwId")
        val tree = PathIO.path(basePath, "_staging", rwId)
        if (!PathIO.exists(tree)) Seq.empty[String]
        else PathIO.walkAll(tree)
          .filter(_.getName.endsWith(".parquet"))
          .map(p => PathIO.relativize(tree, p)).sorted
      }
    val newSet = newFiles.toSet
    var attempts = 0
    var committed = false
    while (!committed) {
      attempts += 1
      require(attempts <= 16,
        s"data-file replace on ${name.fqn} did not converge after 16 re-bases")
      val hw = highWater()
      val epoch = committedEpochs().lastOption.getOrElse(-1L) + 1L
      // files appended/merged since our basis stay live alongside the
      // rewrite output (e.g. a transaction that committed mid-rewrite
      // lands wholly in the uncompacted tail)
      val sinceBasis = manifestFiles().getOrElse(Seq.empty)
        .filterNot(f => basis.contains(f) || newSet.contains(f))
      val hwLines = hwPartitionIds(hw).map(p => s"$p,${hw.getOrElse(p, -1L)}")
      val fileLines = fileSnapshotLines(epoch, newFiles ++ sinceBasis)
      val content =
        (hwLines ++ fileLines ++ Seq(TopicLog.LifecycleLine)).mkString("\n")
      TopicLog.tryCommitManifest(basePath, epoch, content) match {
        case TopicLog.CommitOutcome.Committed |
             TopicLog.CommitOutcome.Identical => committed = true
        case TopicLog.CommitOutcome.Conflict(_) => () // re-base and retry
      }
    }
    // cleanup after the durable commit: move tree files into the
    // readable layout / drop the direct record (crash here is healed by
    // recoverStaging's rw rules — the files are snapshot-referenced)
    if (directStage)
      PathIO.deleteIfExists(PathIO.path(basePath, "_staging", s"$rwId.files")): Unit
    else
      TopicLog.completeMovesFrom(basePath, PathIO.path(basePath, "_staging", rwId))
  }

  /** In-flight staged epochs (tree or record form) whose manifest has
    * not been committed — the set the snapshot-REWRITE verbs must
    * serialize against: they allocate `committedEpochs.last + 1`, the
    * very number an in-flight staging reserved at stage time, and a
    * manifest landing there first makes the staging's later publish
    * collide (loud) or, worse, strands a marker-committed transaction
    * behind a newer snapshot that omits its rows. */
  /** Relative final paths claimed by ANY direct-staging record of this
    * log — in-flight (or crashed, pre-janitor) writer state that
    * directory-walking verbs must treat as invisible. */
  private[log] def stagingRecordFiles(): Set[String] = {
    val stagingRoot = PathIO.path(basePath, "_staging")
    if (!PathIO.exists(stagingRoot)) Set.empty
    else PathIO.listDir(stagingRoot)
      .filter(_.getName.endsWith(".files"))
      .flatMap { rec =>
        // epoch-keyed records AND rw- rewrite records: every listed
        // final path is in-flight writer state, invisible to walks
        try PathIO.readLines(rec).filter(_.nonEmpty)
        catch { case _: IOException => Seq.empty[String] }
      }
      .toSet
  }

  private def inflightStagedEpochs(): Seq[Long] = {
    val stagingRoot = PathIO.path(basePath, "_staging")
    if (!PathIO.exists(stagingRoot)) Seq.empty
    else PathIO.listDir(stagingRoot).map(_.getName)
      .filterNot(_.startsWith(TopicLog.RewritePrefix))
      .flatMap { n =>
        if (n.endsWith(".files"))
          scala.util.Try(n.stripSuffix(".files").toLong).toOption
        else scala.util.Try(n.toLong).toOption
      }.distinct
      .filterNot(e => TopicLog.stagedEpochResolved(basePath, e))
      .sorted
  }

  /** Merge-forward on/off switch (`spark.graft.lifecycleMerge`, default
    * ON). OFF restores the round-16 posture: snapshot-rewrite verbs
    * REFUSE while stagings are in flight. */
  private def lifecycleMergeEnabled: Boolean =
    spark.conf.getOption("spark.graft.lifecycleMerge").forall(_.toBoolean)

  /** The round-16 refusal (escape hatch, see [[lifecycleMergeEnabled]]):
    * serialize snapshot-rewrite verbs against in-flight stagings by
    * refusing. The remedy is operational: let the txn finish, or run
    * [[Txn.recover]] / [[Txn.vacuumAll]] to heal/collect crashed ones,
    * then re-run. */
  private def requireNoInflightStagings(verb: String): Unit = {
    val inflight = inflightStagedEpochs()
    require(inflight.isEmpty,
      s"$verb on ${name.fqn} would race in-flight staged epoch(s) " +
        s"${inflight.mkString(",")} for the next manifest number — " +
        "quiesce writers (commit/abort open transactions, or heal " +
        "crashed ones with Txn.recover / collect them with " +
        "Txn.vacuumAll) and re-run")
  }

  /** Publish a next-epoch LIFECYCLE manifest dropping `relPaths` from
    * the file snapshot. Call BEFORE physically deleting/moving files
    * (retention, offload, truncate) so no committed manifest ever
    * references a missing file. No-op in offset-only mode, where the
    * directory listing reflects deletions by itself. Runs WITHOUT
    * refusing during in-flight stagings: it may take a staged
    * transaction's reserved epoch (the txn's late publish merges
    * forward, [[TopicLog.mergeForwardPublish]]), and on losing a commit
    * race it re-bases against the new latest snapshot and retries. */
  def dropFromSnapshot(relPaths: Seq[String]): Unit = manifestFiles() match {
    case Some(_) =>
      if (!lifecycleMergeEnabled)
        requireNoInflightStagings("snapshot rewrite (retention/offload/truncate)")
      val drop = relPaths.toSet
      var attempts = 0
      var committed = false
      while (!committed) {
        attempts += 1
        require(attempts <= 16,
          s"snapshot drop on ${name.fqn} did not converge after 16 re-bases")
        val hw = highWater()
        val epoch = committedEpochs().last + 1
        val live = manifestFiles().getOrElse(Seq.empty)
        val hwLines = hwPartitionIds(hw).map(p => s"$p,${hw.getOrElse(p, -1L)}")
        val fileLines = fileSnapshotLines(epoch, live.filterNot(drop))
        val content =
          (hwLines ++ fileLines ++ Seq(TopicLog.LifecycleLine)).mkString("\n")
        TopicLog.tryCommitManifest(basePath, epoch, content) match {
          case TopicLog.CommitOutcome.Committed |
               TopicLog.CommitOutcome.Identical => committed = true
          case TopicLog.CommitOutcome.Conflict(_) => () // re-base and retry
        }
      }
    case None => ()
  }

  /** Delete data files no longer referenced by the current file snapshot
    * (the deferred half of [[replaceDataFiles]]). Run once in-flight
    * reader plans have drained. Returns files deleted; no-op (0) in
    * offset-only mode. */
  def vacuum(): Int = manifestFiles() match {
    case Some(live) =>
      // DIRECT stagings park their files at final paths before any
      // manifest references them — record-listed files are in-flight
      // writer state, never vacuum victims (their own lifecycle is the
      // staged-epoch protocol: publish, or dropStagedEpoch via the
      // aged/marker-aware janitor)
      val liveSet = live.toSet ++ stagingRecordFiles()
      val base = PathIO.path(basePath)
      val victims = PathIO.walkAll(base)
        .filter { p =>
          p.getName.endsWith(".parquet") && {
            val rel = PathIO.relativize(base, p)
            !rel.split('/').exists(_.startsWith("_")) && !liveSet.contains(rel)
          }
        }
      victims.foreach(PathIO.deleteIfExists(_))
      victims.size
    case None => 0
  }

  /** Phase 2: publish — manifest commit (the atomic commit point,
    * first-writer-wins [[TopicLog.tryCommitManifest]]) then move the
    * staged files into the readable partition dirs / drop the direct
    * record. Streaming subscribers list files only after the move, by
    * which time the manifest exists, so the read-committed gate passes
    * them through (never drops a committed row). A crash between
    * manifest and moves is healed by [[TopicLog.recoverStaging]].
    * Idempotent when the same manifest is republished (txn recovery).
    *
    * If the reserved epoch was taken by LIFECYCLE rewrites (retention/
    * offload/truncate/coalesce ran while this staging was open), the
    * publish MERGES FORWARD ([[TopicLog.mergeForwardPublish]]): hw max,
    * latest snapshot ∪ the staged files, committed at the next epoch
    * with durable provenance. A conflicting NON-lifecycle manifest
    * means two append writers raced — fail loudly rather than silently
    * dropping one commit (appends are single-writer per topic,
    * ManagedLedgerImpl.internalAsyncAddEntry:821). */
  def publishManifest(staged: StagedAppend): Unit = {
    PathIO.mkdirs(manifestDir)
    TopicLog.tryCommitManifest(basePath, staged.epoch, staged.manifestLines) match {
      case TopicLog.CommitOutcome.Committed | TopicLog.CommitOutcome.Identical =>
        // staged moves complete / direct record dropped: the files were
        // final (direct) or become so now; with the manifest committed
        // the staging has nothing left to protect
        TopicLog.finishStagedEpoch(basePath, staged.epoch)
      case TopicLog.CommitOutcome.Conflict(occupying) =>
        require(TopicLog.isLifecycleManifest(occupying),
          s"manifest epoch ${staged.epoch} already committed with different " +
            s"content — concurrent writers detected on ${name.fqn}")
        TopicLog.mergeForwardPublish(basePath, name.fqn, staged,
          manifestListThreshold)
    }
  }

  /** Full-log batch read (committed data only — up to the manifest HW,
    * restricted to the manifest file snapshot when one is active). */
  def read(): DataFrame = {
    val hw = highWater()
    if (hw.isEmpty) spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Envelope.schema)
    else {
      val cond = hw.map { case (p, o) =>
        (col(Envelope.Partition) === p) && (col(Envelope.Offset) <= o)
      }.reduce(_ || _)
      manifestFiles() match {
        case Some(files) if files.isEmpty =>
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Envelope.schema)
        case Some(files) =>
          // explicit snapshot: plan exactly the listed files (basePath
          // keeps hive partition-column discovery working)
          spark.read.option("basePath", basePath)
            .parquet(files.map(f => s"$basePath/$f"): _*)
            .filter(cond)
        case None =>
          // offset-only mode: the directory listing is the snapshot. A
          // truncate/retention pass may have deleted EVERY data file
          // while the high-water lines survive — that state must read
          // as empty (exactly what the explicit empty snapshot above
          // returns), not throw UNABLE_TO_INFER_SCHEMA.
          // SHORT-CIRCUITING walk, not walkAll: this emptiness probe
          // runs on every offset-only read, and materializing the whole
          // tree first made it O(total-files) per read on large topics —
          // the walk stops at the first data file (non-empty topics,
          // the common case, exit almost immediately)
          val hasData = PathIO.existsFileWhere(PathIO.path(basePath)) { rel =>
            rel.endsWith(".parquet") && !rel.split('/').exists(_.startsWith("_"))
          }
          if (!hasData) spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], Envelope.schema)
          else spark.read.parquet(basePath).filter(cond)
      }
    }
  }

  /**
   * [[read]] with an explicit isolation level. READ_COMMITTED is the
   * plain manifest-gated read; READ_UNCOMMITTED unions in the staged
   * files of epochs whose manifest is NOT yet committed (an in-flight
   * transaction's writes — dirty reads). Staged epochs whose manifest
   * IS committed are excluded: they are already visible through the
   * committed path the moment recovery moves them.
   *
   * DELIBERATE DIVERGENCE from the reference (SURVEY §2.12): the
   * reference's TransactionIsolationLevel.READ_UNCOMMITTED
   * (TransactionIsolationLevel.java:29) also delivers ABORTED
   * transactions' messages — they persist in the ledger until the
   * transaction buffer truncates them. In this storage model an abort
   * discards staged batches BEFORE anything reaches disk
   * ([[graft.log.Txn.abort]] clears driver-staged work; files exist
   * only once commit() stages them), so aborted data is structurally
   * unreadable at EVERY isolation level — a strictly smaller
   * dirty-read surface, not reference parity on that one clause.
   */
  def read(isolation: TopicLog.IsolationLevel): DataFrame = isolation match {
    case TopicLog.IsolationLevel.ReadCommitted => read()
    case TopicLog.IsolationLevel.ReadUncommitted =>
      // heal the crash window first: a staged epoch whose manifest IS
      // committed (crash between manifest move and file moves) belongs
      // to the committed view — completing the moves here keeps the
      // "sees everything committed plus in-flight" contract exact.
      // Safe against a concurrent publishManifest healing the same
      // epoch: completeStagedMoves is race-tolerant per file.
      TopicLog.recoverStaging(basePath)
      val stagingRoot = PathIO.path(basePath, "_staging")
      // the listing races live writers by design (dirty reads run
      // concurrently with in-flight transactions): a dir or file that
      // vanishes mid-walk means the epoch is being completed or
      // cleaned — treat it as nothing to surface, never crash the read
      val inFlight: Seq[String] =
        if (!PathIO.exists(stagingRoot)) Seq.empty[String]
        else try {
          PathIO.listDir(stagingRoot)
            // ONLY epoch-numbered staged trees are transaction data. An
            // `rw-` rewrite staging is a mid-flight COPY of committed
            // rows — surfacing it would double-count every row — and a
            // `.files` record's rows are planned via the snapshot path
            // once committed, never as a dirty union.
            .filter(d => scala.util.Try(d.getName.toLong).isSuccess)
            .filter { d =>
              // resolved = the staged CONTENT is committed (own manifest
              // or merged forward). A lifecycle manifest merely
              // OCCUPYING this epoch's number leaves the staging
              // in-flight — exactly the dirty rows this isolation level
              // surfaces.
              val committed = TopicLog.stagedEpochResolved(basePath,
                d.getName.toLong)
              // an epoch that resolved BETWEEN recoverStaging() above
              // and this listing is excluded from the in-flight union,
              // but its staged files may not have moved yet — the
              // committed read() planned below would then hit
              // manifest-listed paths that don't exist. Heal it here so
              // "committed plus in-flight" stays exact (race-tolerant:
              // the publisher may be completing the same moves).
              if (committed)
                try TopicLog.completeStagedMoves(basePath, d.getName.toLong)
                catch { case _: IllegalStateException | _: NumberFormatException => () }
              !committed
            }
            // only epochs with VISIBLE data files: a write still inside
            // _temporary (or a crashed attempt's leftovers) has nothing
            // Spark's listing would surface — underscore-prefixed
            // segments are hidden to Spark, and planning a dir with
            // only hidden files fails schema inference
            .filter { d =>
              try PathIO.existsFileWhere(d) { rel =>
                rel.endsWith(".parquet") && !rel.split('/').exists(_.startsWith("_"))
              } catch { case _: IOException => false }
            }
            .map(_.toString).sorted
        } catch {
          case _: IOException => Seq.empty[String]
        }
      inFlight.foldLeft(read()) { (acc, epochDir) =>
        // basePath at the epoch dir keeps partition=<i> discovery
        // working; ignoreMissingFiles because a competing
        // publish/recovery can move a listed file before execution
        acc.unionByName(
          spark.read.option("basePath", epochDir)
            .option("ignoreMissingFiles", "true").parquet(epochDir),
          allowMissingColumns = true)
      }
  }

  /**
   * Reader positioned at an offset (reference Reader.java:49 non-durable
   * scan): `offset >= from` within one partition.
   */
  def readFrom(partition: Int, fromOffset: Long): DataFrame =
    read().filter(col(Envelope.Partition) === partition &&
      col(Envelope.Offset) >= fromOffset)

  /**
   * Seek-by-timestamp (reference PersistentMessageFinder.java:63 binary
   * search over publish time): smallest offset per partition with
   * publish_time >= ts. Parquet min/max stats give the pruning the
   * reference gets from its ledger time index.
   */
  def seekByTime(ts: java.sql.Timestamp): DataFrame =
    read().filter(col(Envelope.PublishTime) >= lit(ts))
      .groupBy(col(Envelope.Partition))
      .agg(min(Envelope.Offset).as("seek_offset"))
}
