package graft.ext

import graft.log.PathIO

/**
 * Shared commit protocol for tiny cross-batch stream state (the
 * [[SeqPackStream]] running offset, the [[MixtureStream]] budget
 * totals): one `<prefix><epoch>` file per batch beside the epoch
 * output dirs, committed with [[PathIO.atomicCreate]]
 * (complete-or-absent on every scheme) under one replay argument:
 *
 *  - a replayed batch reads the highest STRICTLY-prior entry (its own
 *    possibly-committed entry is filtered out) and recomputes
 *    deterministically;
 *  - its own stale commit is then tolerated only on byte-identical
 *    content — a mismatch means a second writer or nondeterministic
 *    input and fails loudly (the single-writer posture of every
 *    stream here);
 *  - entries older than `epoch - 1` prune after commit — replay only
 *    ever needs the immediately-prior entry, so the chain holds at
 *    two tiny files regardless of stream lifetime.
 *
 * Name parsing is loud — an unrecognized `<prefix>*` name is
 * corruption, not a skip — with ONE recognized exception:
 * atomicCreate's own crash leftovers. The local and HDFS
 * implementations stage through a `<name>.tmp.<uuid>` sibling deleted
 * in a finally block; a driver kill between write and delete strands
 * it, and a strict parser would then refuse every later batch — a
 * permanent crash loop over protocol-known garbage. Such names are
 * excluded from reads and garbage-collected by the prune once their
 * epoch falls out of the replay window (single-writer: nothing can be
 * mid-create on an epoch two batches old).
 */
private[ext] final class EpochState[A](prefix: String,
                                       renderA: A => Array[Byte],
                                       parseA: String => A, emptyA: A) {

  /** (epoch, isCrashLeftover); loud on any other `<prefix>*` name. */
  private def parseName(name: String): (Long, Boolean) = {
    val rest = name.stripPrefix(prefix)
    val digits = rest.takeWhile(_.isDigit)
    val tail = rest.drop(digits.length)
    require(digits.nonEmpty && (tail.isEmpty || tail.startsWith(".tmp.")),
      s"unrecognized stream state name: $name")
    (digits.toLong, tail.nonEmpty)
  }

  /** Highest committed value below `epoch` (the pre-batch stream
    * position); `empty` before the first batch. */
  def prior(outDir: String, epoch: Long): A = {
    val root = PathIO.path(outDir)
    if (!PathIO.exists(root)) return emptyA
    val epochs = PathIO.listDir(root).map(_.getName)
      .filter(_.startsWith(prefix)).map(parseName)
      .collect { case (e, false) if e < epoch => e }
    if (epochs.isEmpty) emptyA
    else parseA(PathIO.readString(
      PathIO.path(outDir, s"$prefix${epochs.max}")))
  }

  /** Commit this epoch's post-batch value; tolerate a byte-identical
    * replay-stale entry, refuse a diverging one; prune entries (and
    * crash leftovers) the replay window can never read again. */
  def commit(outDir: String, epoch: Long, value: A): Unit = {
    val content = renderA(value)
    val target = PathIO.path(outDir, s"$prefix$epoch")
    if (!PathIO.atomicCreate(target, content)) {
      val existing = PathIO.readString(target)
      if (existing != new String(content, "UTF-8"))
        sys.error(s"stream state $target diverges from this batch's " +
          "recomputation — second writer or nondeterministic input")
    }
    PathIO.listDir(PathIO.path(outDir))
      .filter(_.getName.startsWith(prefix))
      .filter(p => parseName(p.getName)._1 < epoch - 1)
      .foreach(p => PathIO.deleteIfExists(p): Unit)
  }
}
