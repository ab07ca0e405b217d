package graft.log

import org.apache.spark.sql.DataFrame

import java.io.IOException
import java.io.FileNotFoundException

/**
 * Transactions-lite: atomic multi-topic produce with read-committed
 * visibility — the Spark-first stand-in for the reference's transaction
 * subsystem (Transaction.java:30-93 commit/abort, transaction buffer
 * markers, TransactionIsolationLevel READ_COMMITTED).
 *
 * Protocol (no 2PC coordinator rebuilt; the txn MARKER is the single
 * commit point):
 *  1. stage: every topic's data files are written, invisible (readers
 *     only see manifest-committed offsets);
 *  2. marker: one atomic file move writes `<txnId>.committed` carrying
 *     every topic's manifest content;
 *  3. publish: each topic's manifest is moved into place (idempotent).
 *
 * Crash analysis: before the marker → nothing was ever visible, staged
 * files are invisible garbage; after the marker but before/during
 * publish → [[Txn.recover]] replays the manifests straight from the
 * marker (publishManifest is idempotent), completing the commit. So a
 * consumer either eventually sees every topic's batch or none — the
 * same end-to-end contract the reference's txn-produce gives, with the
 * marker playing the transaction buffer's commit-marker role.
 *
 * Marker IO goes through [[PathIO]] (Hadoop FileSystem), so the txn
 * root may live on any scheme with atomic rename ([[PathIO]] class doc)
 * — the reference keeps this layer in its metadata store.
 */
final class Txn private (val txnId: String, root: String,
                         deadlineMs: Long, clock: () => Long) {
  private val staged =
    scala.collection.mutable.ListBuffer[(TopicLog, DataFrame)]()
  private val stagedAcks =
    scala.collection.mutable.ListBuffer[(AckLog, DataFrame)]()
  private var state: String = "OPEN"

  /** Timeout gate at every operation entry — the client-visible half of
    * the reference's coordinator timeout (TransactionTimeoutTracker.java:37
    * fires at the absolute deadline; the store aborts the txn; the
    * client's next produce/ack/commit fails InvalidTxnStatus). Past the
    * deadline the txn self-aborts (staged work dropped — it was never
    * visible) and the operation throws. The check sits only at entry:
    * once commit() writes the marker, the txn IS committed even if the
    * deadline passes mid-publish — the marker is the single commit
    * point, exactly as a coordinator-side END op that won the race. */
  private def checkOpen(): Unit = {
    if (state == "OPEN" && clock() > deadlineMs) {
      staged.clear()
      stagedAcks.clear()
      state = "TIMED_OUT"
    }
    require(state == "OPEN", s"txn $txnId is $state")
  }

  /** Stage a batch for `log`; nothing becomes visible until commit(). */
  def produce(log: TopicLog, batch: DataFrame): Txn = {
    checkOpen()
    staged += ((log, batch))
    this
  }

  /** Stage acks (rows of (partition, offset)) for a subscription's
    * [[AckLog]] — the reference's transactional acknowledgment
    * (Transaction.java:30-93 via PendingAckHandleImpl): the ack and any
    * produced output commit through the SAME marker, so an exactly-once
    * consume-process-produce step either moves the cursor AND publishes
    * its output, or does neither. Until commit the acks are pending:
    * invisible to [[AckLog.read]], so the messages stay in the unacked
    * set; an abort drops them — the message redelivers, the reference's
    * pending-ack release semantics. */
  def ack(ackLog: AckLog, acks: DataFrame): Txn = {
    checkOpen()
    stagedAcks += ((ackLog, acks))
    this
  }

  /** Commit: stage all data, write the marker (the atomic commit point),
    * then publish every manifest. */
  def commit(): Unit = {
    checkOpen()
    val markerDir = PathIO.path(root, "_txn")
    PathIO.mkdirs(markerDir)
    // phase 1: stage every batch (data invisible). Batches to the SAME
    // topic are unioned first — staging them separately would compute the
    // same epoch/base offsets twice (colliding offsets, dropped manifest).
    val perTopic = staged.toList.groupBy(_._1.name.fqn).values.map { group =>
      val log = group.head._1
      val combined = group.map(_._2).reduce(_.unionByName(_))
      (log, combined)
    }.toList
    val prepared = perTopic.map { case (log, batch) =>
      (log, log.stageAppend(batch))
    }
    // acks stage the same way (AckLog shares TopicLog's layout); acks to
    // the SAME subscription union first for the same epoch-collision
    // reason as same-topic produces
    val preparedAcks = stagedAcks.toList.groupBy(_._1.basePath).values.map {
      group =>
        val ackLog = group.head._1
        val combined = group.map(_._2).reduce(_.unionByName(_))
        (ackLog, ackLog.stageAck(combined))
    }.toList
    // deadline re-check at the COMMIT POINT, not just at entry: staging
    // above is data-sized work that can outlive the deadline, and
    // vacuumStaged's safety proof needs "no marker is ever written after
    // openedAt + timeout" (its age horizon starts at the staged files'
    // mtimes, which are ≥ openedAt). On expiry the staged epochs are
    // dropped eagerly — they are the abandoned garbage vacuum would
    // otherwise collect later.
    if (clock() > deadlineMs) {
      prepared.foreach { case (log, s) =>
        TopicLog.dropStagedEpoch(log.name.path(root), s.epoch) }
      preparedAcks.foreach { case (ackLog, s) =>
        TopicLog.dropStagedEpoch(ackLog.basePath, s.epoch) }
      staged.clear()
      stagedAcks.clear()
      state = "TIMED_OUT"
      require(false, s"txn $txnId is TIMED_OUT (deadline passed during staging)")
    }
    // phase 2: single atomic commit point — ONE marker carries produce
    // manifests AND ack manifests (consume-process-produce atomicity;
    // an AckLog line's first field is its base path, which recover()
    // replays through the identical layout)
    val produceLines = prepared.map { case (log, s) =>
      Seq(log.name.path(root), s.epoch.toString, s.count.toString,
        s.manifestLines.replace("\n", ";")).mkString("\t")
    }
    val ackLines = preparedAcks.map { case (ackLog, s) =>
      Seq(ackLog.basePath, s.epoch.toString, s.count.toString,
        s.manifestLines.replace("\n", ";")).mkString("\t")
    }
    // atomicCreate, not write-tmp+rename: complete-or-absent on every
    // scheme (hard-link locally, exclusive rename on HDFS, conditional
    // PUT on object stores). Txn ids are unique per begin(), so an
    // existing marker can only be a replay of THIS commit — verify,
    // never replace.
    val markerBytes = (produceLines ++ ackLines).mkString("\n").getBytes
    val marker = PathIO.child(markerDir, s"$txnId.committed")
    if (!PathIO.atomicCreate(marker, markerBytes))
      require(java.util.Arrays.equals(PathIO.readBytes(marker), markerBytes),
        s"txn marker $txnId exists with different content — txn id collision")
    // phase 3: publish (idempotent; recover() replays on crash)
    prepared.foreach { case (log, s) => log.publishManifest(s) }
    preparedAcks.foreach { case (ackLog, s) => ackLog.publish(s) }
    state = "COMMITTED"
  }

  /** Abort: drop staged batches AND pending acks; no data was ever
    * visible, and the pending-acked messages stay unacked — they
    * redeliver (the reference's pending-ack release on txn abort). */
  def abort(): Unit = {
    require(state == "OPEN", s"txn $txnId is $state")
    staged.clear()
    stagedAcks.clear()
    state = "ABORTED"
  }

  def status: String = state
}

object Txn {
  private val counter = new java.util.concurrent.atomic.AtomicLong(0)

  /** The reference client's default transaction TTL
    * (TransactionBuilderImpl.java:38, `txnTimeout = 60000`). */
  val DefaultTimeoutMs: Long = 60000L

  /** Begin a transaction (TransactionBuilder.build analog;
    * `timeoutMs` = withTransactionTimeout, TransactionBuilder.java:45).
    * The deadline is absolute — openedAt + timeoutMs, the same shape the
    * coordinator's timeout tracker stores — and every subsequent
    * produce/ack/commit checks it. `clock` is injectable so specs replay
    * timeout schedules deterministically. */
  def begin(root: String, timeoutMs: Long = DefaultTimeoutMs,
            clock: () => Long = () => System.currentTimeMillis()): Txn =
    new Txn(s"txn-${System.currentTimeMillis()}-${counter.incrementAndGet()}",
      root, clock() + timeoutMs, clock)

  /**
   * Operational janitor: [[recover]] first (completing every marker
   * whose publish crashed — committed data becomes manifest-visible and
   * thereby vacuum-proof), then [[TopicLog.vacuumStaged]] over every
   * topic's staging AND every subscription ack log's staging under the
   * root, markers protecting anything a slow healer hasn't finished.
   * The reference analog is the transaction subsystem's periodic
   * cleanup — the timeout tracker firing aborts and the transaction
   * buffer discarding the aborted data; on ack logs the sweep releases
   * dead transactions' pending acks so their messages redeliver.
   * `olderThanMs` must be ≥ every producer's `timeoutMs` (the
   * [[TopicLog.vacuumStaged]] age contract). Returns (epochs healed,
   * staged epochs dropped).
   */
  def vacuumAll(root: String, olderThanMs: Long,
                nowMs: () => Long = () => System.currentTimeMillis()): (Int, Int) = {
    val healed = recover(root)
    // anchor the sweep's clock BEFORE the marker parse: expiry is then
    // "older than the horizon as of a moment when the parse had not yet
    // happened", so any marker covering an epoch that can test expired
    // was already on disk when we parsed (marker time ≤ openedAt +
    // timeout ≤ newestMtime + timeout < sweepNow < parse time). Without
    // the anchor, a long sweep against a live clock could age an epoch
    // past the horizon while its marker — written after the parse —
    // goes unseen.
    val sweepNow = nowMs()
    // parse the marker set ONCE for the whole sweep (the txnRoot form
    // of vacuumStaged re-reads every marker per call — with T topics and
    // S ack logs that is (T+S) full marker passes per sweep)
    val protectedByBase = markerEpochs(root)
    def protectedFor(base: String): Set[Long] =
      protectedByBase.getOrElse(PathIO.qualify(base).toString, Set.empty)
    // delete-time re-parse (fresh, not the sweep-wide snapshot): a
    // marker whose write landed after the sweep parse is seen here,
    // shrinking the unseen-marker window to filesystem-op scale
    def reProtectFor(base: String): Option[() => Set[Long]] =
      Some(() => markerEpochs(root).getOrElse(
        PathIO.qualify(base).toString, Set.empty))
    var dropped = 0
    Topics.list(root).foreach { t =>
      val base = t.path(root)
      dropped += TopicLog.vacuumStagedProtected(base, olderThanMs,
        () => sweepNow, protectedFor(base), reProtectFor(base))
      val subsDir = PathIO.path(base, "_subs")
      if (PathIO.exists(subsDir))
        TopicLog.listDir(subsDir).filter(PathIO.isDirectory(_)).foreach { s =>
          // keep the CALLER's base spelling (listing-derived paths come
          // back scheme-qualified; markerEpochs keys qualify either way)
          val ackBase = s"$base/_subs/${s.getName}/acks"
          if (PathIO.exists(PathIO.path(ackBase)))
            dropped += TopicLog.vacuumStagedProtected(ackBase,
              olderThanMs, () => sweepNow, protectedFor(ackBase),
              reProtectFor(ackBase))
        }
    }
    // retire fully-published markers: every line's manifest exists, so
    // the marker has nothing left to heal and nothing left to protect
    // (the manifest itself is the vacuum guard from here on). Without
    // retirement the marker set — and every future sweep's parse —
    // grows with all-time committed txn count.
    val markerDir = PathIO.path(root, "_txn")
    if (PathIO.exists(markerDir))
      TopicLog.listDir(markerDir)
        .filter(_.getName.endsWith(".committed"))
        .foreach { marker =>
          // a concurrent janitor can retire this marker between our
          // listDir and the read — skip it (best-effort, like the rest
          // of the sweep) instead of aborting the pass mid-way
          scala.util.Try(PathIO.readLines(marker)).foreach { lines =>
            val done = lines.filter(_.nonEmpty)
              .forall { line =>
                val f = line.split("\t")
                // resolved, not mere `<epoch>.commit` existence: a
                // lifecycle rewrite may occupy the epoch number while
                // the staged content still awaits its merge — retiring
                // the marker then would unprotect committed txn data
                f.length >= 2 && scala.util.Try(f(1).toLong).toOption
                  .exists(e => TopicLog.stagedEpochResolved(f(0), e))
              }
            if (done) { PathIO.deleteIfExists(marker); () }
          }
        }
    (healed, dropped)
  }

  /** One in-flight staged epoch surfaced by [[slowTransactions]]:
    * `markerCommitted` separates "committed, awaiting [[recover]]"
    * (heal it) from "abandoned by a crashed/expired producer"
    * (a [[vacuumAll]] candidate once older than the txn timeout). */
  final case class SlowStaging(basePath: String, epoch: Long, ageMs: Long,
                               markerCommitted: Boolean)

  /**
   * In-flight staged epochs under the root older than `olderThanMs` —
   * the `pulsar-admin transactions slow-transactions` analog
   * (MLTransactionMetadataStore.getSlowTransactions:521 lists TxnMetas
   * past their timeout). Our durable footprint of an open/crashed txn
   * IS its staged epochs, so the listing walks topic + ack staging
   * (driver-side, bounded by staging-dir count, no data read) and
   * classifies each against the commit markers. The operator loop:
   * `slowTransactions` to see, [[recover]]/[[vacuumAll]] to act.
   */
  def slowTransactions(root: String, olderThanMs: Long,
                       nowMs: () => Long = () => System.currentTimeMillis())
      : Seq[SlowStaging] = {
    val marked = markerEpochs(root)
    def scan(base: String): Seq[SlowStaging] = {
      val stagingRoot = PathIO.path(base, "_staging")
      if (!PathIO.exists(stagingRoot)) Seq.empty
      else TopicLog.listDir(stagingRoot).flatMap { dir =>
        // both staging forms are in-flight txn footprints: the
        // `<epoch>/` tree (move-based) and the `<epoch>.files` record
        // (direct staging at final paths)
        val n = dir.getName
        val epochOpt =
          if (n.endsWith(".files"))
            scala.util.Try(n.stripSuffix(".files").toLong).toOption
          else scala.util.Try(n.toLong).toOption
        epochOpt.flatMap { epoch =>
          // content resolved (own or merged manifest) = not in-flight
          // (recoverStaging's job); a lifecycle manifest merely
          // occupying the number leaves the staging in-flight
          if (TopicLog.stagedEpochResolved(base, epoch)) None
          else {
            val newest =
              try PathIO.walkStatuses(dir).map(_.getModificationTime)
                .foldLeft(0L)(math.max)
              catch { case _: IOException => Long.MaxValue }
            val age = nowMs() - newest
            if (age <= olderThanMs) None
            else Some(SlowStaging(base, epoch, age,
              marked.getOrElse(PathIO.qualify(base).toString,
                Set.empty).contains(epoch)))
          }
        }
      }
    }
    Topics.list(root).flatMap { t =>
      val base = t.path(root)
      val subsDir = PathIO.path(base, "_subs")
      val ackBases =
        if (!PathIO.exists(subsDir)) Seq.empty[String]
        else TopicLog.listDir(subsDir).filter(PathIO.isDirectory(_))
          .map(s => s"$base/_subs/${s.getName}/acks")
          .filter(b => PathIO.exists(PathIO.path(b)))
      (base +: ackBases).flatMap(scan)
    }.sortBy(s => (s.basePath, s.epoch))
  }

  /** Marker-protected epochs per QUALIFIED base path
    * ([[PathIO.qualify]] — "/a/b" and "file:/a/b" key identically) —
    * one parse of the `_txn` directory shared by a whole [[vacuumAll]]
    * sweep. */
  private[log] def markerEpochs(root: String): Map[String, Set[Long]] = {
    val markerDir = PathIO.path(root, "_txn")
    if (!PathIO.exists(markerDir)) return Map.empty
    TopicLog.listDir(markerDir)
      .filter(_.getName.endsWith(".committed"))
      // a concurrent janitor may retire a marker between our listDir and
      // this read — a VANISHED marker contributes nothing. That is the
      // ONLY tolerated failure: any other IO error on a still-existing
      // marker must propagate and abort the sweep, because silently
      // yielding zero protected epochs would let vacuumStagedProtected
      // delete a committed-but-unpublished transaction's staged data
      // (the fail-safe direction is "can't read ⇒ can't sweep")
      .flatMap { m =>
        try PathIO.readLines(m).filter(_.nonEmpty)
        catch {
          case _: FileNotFoundException if !PathIO.exists(m) => Nil
        }
      }
      .flatMap { line =>
        val f = line.split("\t")
        if (f.length >= 2)
          scala.util.Try(f(1).toLong).toOption
            .map(e => PathIO.qualify(f(0)).toString -> e)
        else None
      }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
  }

  /**
   * Recovery: replay the manifests of every committed marker (recovery
   * rule from the class doc — a marker without its manifests means the
   * process died mid-publish). Idempotent; run at startup. Returns the
   * number of DISTINCT (topic, epoch)s this call healed — an epoch
   * counts once whether it needed its manifest written, its staged
   * files moved, or both.
   */
  def recover(root: String): Int = {
    val markerDir = PathIO.path(root, "_txn")
    if (!PathIO.exists(markerDir)) return 0
    val healed = scala.collection.mutable.Set[(String, Long)]()
    TopicLog.listDir(markerDir)
      .filter(_.getName.endsWith(".committed"))
      .foreach { marker =>
        PathIO.readLines(marker).filter(_.nonEmpty).foreach { line =>
          val Array(topicPath, epochStr, countStr, hwJoined) = line.split("\t")
          val epoch = epochStr.toLong
          val content = hwJoined.replace(";", "\n")
          val manifestFile = PathIO.path(topicPath, "_manifest",
            s"$epochStr.commit")
          if (!PathIO.exists(manifestFile)) {
            PathIO.mkdirs(manifestFile.getParent)
            // first-writer-wins: two processes recovering the same
            // marker at startup must not consume each other's tmp file
            // (TopicLog.atomicCreate — the rename race publishManifest
            // also guards against)
            if (TopicLog.atomicCreate(manifestFile, content.getBytes))
              healed += ((topicPath, epoch))
          }
          // the reserved epoch may hold a LIFECYCLE rewrite's manifest:
          // retention/offload/coalesce advanced the chain while the txn
          // was mid-publish. Replay the merge exactly as the publisher
          // would — stagedEpochResolved short-circuits a merge that
          // already completed, so this converges to a no-op.
          if (PathIO.exists(manifestFile) &&
              new String(PathIO.readBytes(manifestFile)) != content &&
              !TopicLog.stagedEpochResolved(topicPath, epoch)) {
            TopicLog.mergeForwardPublish(topicPath, topicPath,
              TopicLog.StagedAppend(epoch, content, countStr.toLong))
            healed += ((topicPath, epoch))
          }
          // crash between commit/merge and staged-file cleanup: count
          // the epoch healed iff staged leftovers actually existed
          if (PathIO.exists(PathIO.path(topicPath, "_staging", epochStr)) ||
              PathIO.exists(TopicLog.stagingRecord(topicPath, epoch))) {
            TopicLog.recoverStaging(topicPath): Unit
            healed += ((topicPath, epoch))
          }
        }
      }
    healed.size
  }
}
