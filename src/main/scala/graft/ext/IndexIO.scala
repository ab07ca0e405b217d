package graft.ext

import graft.log.PathIO
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Storage protocol of the persisted streaming-dedup indexes
 * ([[NearDupStream]] bands/shingles, [[SemanticDedupStream]] vecs,
 * [[CleanCorpusStream]] hashes, [[DecontamStream]] ngrams): epoch
 * partition dirs, plus a compaction that folds old epochs into one
 * consolidated directory — committed by POINTER-FILE INDIRECTION, not
 * directory rename.
 *
 * Layout of one index level dir:
 *  - `epoch=<id>/...`            — written directly by batch `<id>`
 *    (plain overwrite; epoch is constant within a batch, so a replayed
 *    batch rewrites exactly its own directory);
 *  - `_fold-<upTo>-<gen>/epoch=<upTo>/<bucket>=<v>/...` — IMMUTABLE
 *    consolidated data, underscore-hidden from Spark discovery;
 *  - `_live-<upTo>-<gen>`        — the commit record: a pointer file
 *    published with [[PathIO.atomicCreate]] naming the fold dir it
 *    activates. The HIGHEST (upTo, gen) pointer defines the committed
 *    view; everything it subsumes (plain epoch dirs ≤ upTo, earlier
 *    pointers and their fold dirs) is garbage the janitor deletes.
 *
 * Why pointers: the previous protocol finished a fold with ONE
 * directory rename (`_compact_tmp-N` → `epoch=N`) — atomic on
 * HDFS/POSIX, but per-object copy+delete on an object store, where a
 * crash mid-rename left a partially-copied `epoch=N` with the source
 * epochs already deleted. Here no commit step ever renames: data dirs
 * are written once and never move, and the only atomic primitive is
 * [[PathIO.atomicCreate]] of the pointer — native on every scheme
 * (hard-link locally, exclusive rename on HDFS, conditional PUT on
 * object stores). The reference's tiered storage commits the same way
 * (tiered-storage/jcloud/.../OffloadIndexBlockImpl.java — an index
 * block of immutable data blocks, activated by one small index write).
 *
 * Crash windows (all healed by [[resume]], which every stream batch
 * and every fold entry-point runs first):
 *  - mid-write of a fold dir (no pointer): fold dirs unreferenced by
 *    the live pointer are deleted; source epochs intact — the fold
 *    simply re-runs later.
 *  - after the pointer, mid-cleanup: readers already see exactly the
 *    folded view ([[entries]] excludes subsumed dirs), resume finishes
 *    the deletes.
 *
 * Single-writer by construction (foreachBatch is sequential; rebucket
 * is an offline op) — a lost pointer publish therefore means two
 * writers and fails loudly.
 */
private[graft] object IndexIO {
  private type HPath = org.apache.hadoop.fs.Path

  private val PtrPrefix = "_live-"
  private val FoldPrefix = "_fold-"

  /** A committed fold: `_live-<upTo>-<gen>` activating `_fold-<upTo>-<gen>`. */
  private final case class Pointer(upTo: Long, gen: Long) {
    def ptrName: String = s"$PtrPrefix$upTo-$gen"
    def foldName: String = s"$FoldPrefix$upTo-$gen"
  }

  /** Parse a pointer file name, loudly: an unrecognized `_live-*` name
    * is corruption, not something to index into a generic split. */
  private def parsePointer(name: String): Pointer = {
    val rest = name.stripPrefix(PtrPrefix)
    rest.split('-') match {
      case Array(u, g) if u.nonEmpty && g.nonEmpty &&
          u.forall(_.isDigit) && g.forall(_.isDigit) =>
        Pointer(u.toLong, g.toLong)
      case _ => sys.error(s"unrecognized index pointer name: $name")
    }
  }

  /** Committed view of one level: the live pointer (highest (upTo,
    * gen)), and the plain epoch dirs NOT subsumed by it. Subsumed
    * plain dirs (epoch ≤ live.upTo) may still exist in the
    * crash-after-pointer window — their content is inside the fold,
    * so readers must exclude them or double-count. */
  private def view(dir: HPath): (Option[Pointer], Seq[(Long, HPath)]) = {
    if (!PathIO.exists(dir)) return (None, Seq.empty)
    val names = PathIO.listDir(dir)
    // the pre-pointer protocol's rename-swap tmps cannot be healed by
    // this code — refuse loudly rather than misread the level
    names.map(_.getName)
      .find(n => n.startsWith("_compact_tmp-") || n.startsWith("_rebucket_tmp-"))
      .foreach(n => sys.error(
        s"legacy rename-swap tmp '$n' in $dir — pre-pointer-protocol " +
          "index; finish or discard it with the engine version that wrote it"))
    val ptrs = names.map(_.getName).filter(_.startsWith(PtrPrefix)).map(parsePointer)
    val live = if (ptrs.isEmpty) None
      else Some(ptrs.maxBy(p => (p.upTo, p.gen)))
    val floor = live.map(_.upTo).getOrElse(Long.MinValue)
    val plain = names.filter(_.getName.startsWith("epoch="))
      .map(p => (p.getName.stripPrefix("epoch=").toLong, p))
      .filter(_._1 > floor)
      .sortBy(_._1)
    (live, plain)
  }

  /** Committed epoch ids, fold entry included — the layout-independent
    * replacement for counting `epoch=` dirs. */
  private[graft] def committedEpochs(levelDir: String): Seq[Long] = {
    val (live, plain) = view(PathIO.path(levelDir))
    (live.map(_.upTo).toSeq ++ plain.map(_._1)).sorted
  }

  /** Root paths of the committed view, paired with the basePath each
    * must be read under (plain dirs under the level dir; the fold's
    * `epoch=<upTo>` subtree under its own `_fold-*` dir, so partition
    * parsing sees the identical `epoch=`/`<bucket>=` segments) and the
    * root's epoch id. */
  private def committedRoots(levelDir: String): Seq[(String, String, Long)] = {
    val dir = PathIO.path(levelDir)
    val (live, plain) = view(dir)
    val foldRoot = live.map { p =>
      val base = PathIO.child(dir, p.foldName)
      (base.toString, PathIO.child(base, s"epoch=${p.upTo}").toString, p.upTo)
    }
    plain.map { case (e, p) => (levelDir, p.toString, e) } ++ foldRoot
  }

  /** Read the committed view of one level (partition columns `epoch` +
    * the bucket column intact, so `epoch <`/`bucket isin` filters stay
    * PartitionFilters on every branch); empty-with-schema when the
    * level doesn't exist yet. `like` supplies the data schema.
    *
    * Discovery cost: when EVERY committed root carries a
    * [[graft.log.DirectCommitProtocol]] manifest (levels written on
    * object-store schemes), the read plans from the recorded file sets
    * through a [[CatalogFileIndex]] — one GET per root, ZERO directory
    * LISTs — instead of Spark's recursive discovery, whose
    * O(epochs × buckets) LISTs were the one per-epoch-growing request
    * axis in the round-15 os_stream record. Stock-committed levels
    * (local/HDFS, where listing is a namenode call, not a billed
    * request) keep the listing path byte-identically. */
  def read(spark: SparkSession, levelDir: String, like: DataFrame): DataFrame = {
    val roots = committedRoots(levelDir)
    if (roots.isEmpty) like.withColumn("epoch", lit(0L)).limit(0)
    else catalogRead(spark, levelDir, roots, like).getOrElse(listingRead(spark, roots))
  }

  /** The listing-discovery read branch (pre-round-16 behavior). */
  private def listingRead(spark: SparkSession,
                          roots: Seq[(String, String, Long)]): DataFrame =
    roots.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (base, rs) =>
        spark.read.option("basePath", base).parquet(rs.map(_._2): _*)
      }
      .reduce(_.unionByName(_))

  /** The manifest-catalog read branch: Some(df) iff every root's
    * `_SUCCESS` is a direct-commit manifest with a uniform `k=v`
    * partition-segment layout; None falls back to listing (mixed or
    * stock-committed levels, irregular names). */
  private def catalogRead(spark: SparkSession, levelDir: String,
                          roots: Seq[(String, String, Long)],
                          like: DataFrame): Option[DataFrame] = {
    import graft.log.DirectCommitProtocol
    val perRoot = roots.map { case (_, root, epoch) =>
      DirectCommitProtocol.readManifest(root).map { mf =>
        mf.map { case (rel, size) =>
          CatalogFileIndex.parseRel(rel).map { case (cols, vals) =>
            (cols, CatalogFileIndex.Entry(epoch +: vals,
              PathIO.path(root, rel), size))
          }
        }
      }
    }
    if (perRoot.exists(_.isEmpty)) return None // a stock-committed root
    val flat = perRoot.flatMap(_.get)
    if (flat.exists(_.isEmpty)) return None // unparseable segment layout
    val parsed = flat.flatten
    if (parsed.isEmpty) return None // all-empty manifests: let listing decide
    val colSets = parsed.map(_._1).distinct
    if (colSets.size != 1) return None // non-uniform bucket segments
    val partCols = "epoch" +: colSets.head
    val partSet = partCols.toSet
    val dataSchema = org.apache.spark.sql.types.StructType(
      like.schema.fields.filterNot(f => partSet.contains(f.name)))
    Some(CatalogFileIndex.relation(spark, PathIO.path(levelDir), partCols,
      parsed.map(_._2), dataSchema))
  }

  /** [[read]] of a level that must already have committed entries —
    * the ops/verification form. No `like` schema is available here, so
    * it stays on the listing branch (footer-inferred schema); these
    * callers read the whole level anyway, so discovery cost tracks the
    * data read. */
  private[graft] def readLevel(spark: SparkSession, levelDir: String): DataFrame = {
    val roots = committedRoots(levelDir)
    require(roots.nonEmpty, s"no committed index entries under $levelDir")
    listingRead(spark, roots)
  }

  /** On-disk bytes of one level's committed view — the index-size
    * signal [[BatchTune.adapt]] folds into the batch's shuffle width
    * (a trickle batch against a large index must not fold/join the
    * whole index through 2 reducers). Manifest-first: a direct-commit
    * root answers from its recorded file sizes (one GET, no LIST);
    * stock-committed roots pay one recursive walk. */
  private[graft] def committedBytes(levelDir: String): Long =
    committedRoots(levelDir).map { case (_, root, _) =>
      graft.log.DirectCommitProtocol.readManifest(root) match {
        case Some(mf) => mf.map(_._2).sum
        case None =>
          val hp = PathIO.path(root)
          if (!PathIO.exists(hp)) 0L
          else PathIO.walkStatuses(hp).filter(!_.isDirectory).map(_.getLen).sum
      }
    }.sum

  /** Heal + garbage-collect one level (see class doc crash windows).
    * Idempotent; every stream batch runs it before reading. */
  def resume(levelDir: String): Unit = {
    val dir = PathIO.path(levelDir)
    if (!PathIO.exists(dir)) return
    val (live, _) = view(dir) // also validates pointer names
    val names = PathIO.listDir(dir)
    live match {
      case None =>
        // no commit: fold dirs are mid-write garbage; epochs intact
        names.filter(_.getName.startsWith(FoldPrefix))
          .foreach(p => PathIO.deleteTree(p): Unit)
      case Some(p) =>
        require(PathIO.exists(PathIO.path(
            PathIO.child(dir, p.foldName).toString, s"epoch=${p.upTo}")),
          s"live pointer ${p.ptrName} names a missing fold dir in $dir")
        names.foreach { entry =>
          val n = entry.getName
          val subsumedEpoch = n.startsWith("epoch=") &&
            n.stripPrefix("epoch=").toLong <= p.upTo
          val stalePtr = n.startsWith(PtrPrefix) && n != p.ptrName
          val staleFold = n.startsWith(FoldPrefix) && n != p.foldName
          if (subsumedEpoch || staleFold) PathIO.deleteTree(entry): Unit
          else if (stalePtr) PathIO.deleteIfExists(entry): Unit
        }
    }
  }

  /** Fold every committed entry with epoch ≤ `upToEpoch` into one
    * consolidated fold dir, committed by pointer. No-op below two
    * sources. `bucketCol` is the level's bucket partition column —
    * repartitioned on before the write so each bucket lands in one
    * file (the per-file fixed cost every later pruned read pays).
    *
    * `gcNow = false` defers the post-commit cleanup (deleting the
    * subsumed plain epoch dirs) to the NEXT [[resume]] call: the fold
    * then never deletes anything, so it can run CONCURRENTLY with
    * readers of the same level — a batch's index reads planned against
    * the pre-fold view keep their files until the next batch's resume.
    * This is exactly the documented "after the pointer, mid-cleanup"
    * crash window, held open deliberately for one batch. */
  def compact(spark: SparkSession, levelDir: String, bucketCol: String,
              upToEpoch: Long, gcNow: Boolean = true): Unit =
    fold(spark, levelDir, bucketCol, rebucketTo = None, Some(upToEpoch), gcNow)

  /** Bucket-fanout migration: fold EVERY committed entry, recomputing
    * the bucket column as `pmod(srcCol, newBuckets)` — proceeds even
    * from a single source (the point is the new fanout, not the fold).
    * OFFLINE op: run with the stream stopped (single-writer, like the
    * resize it implements). */
  def rebucket(spark: SparkSession, levelDir: String, bucketCol: String,
               srcCol: String, newBuckets: Int): Unit = {
    require(newBuckets >= 1, s"newBuckets $newBuckets must be >= 1")
    fold(spark, levelDir, bucketCol, rebucketTo = Some((srcCol, newBuckets)),
      upTo = None, gcNow = true)
  }

  private def fold(spark: SparkSession, levelDir: String, bucketCol: String,
                   rebucketTo: Option[(String, Int)],
                   upTo: Option[Long], gcNow: Boolean): Unit = {
    val dir = PathIO.path(levelDir)
    if (!PathIO.exists(dir)) return
    resume(levelDir) // finish/discard anything pending before folding
    val (live, plain) = view(dir)
    val liveEntry = live.map(p =>
      (p.upTo, PathIO.path(PathIO.child(dir, p.foldName).toString,
        s"epoch=${p.upTo}")))
    val sources = (liveEntry.toSeq ++ plain)
      .filter { case (e, _) => upTo.forall(e <= _) }
    val minSources = if (rebucketTo.isDefined) 1 else 2
    if (sources.size < minSources) return
    val foldPoint = sources.map(_._1).max
    val next = Pointer(foldPoint, live.map(_.gen + 1).getOrElse(0L))
    val foldBase = PathIO.child(dir, next.foldName)
    PathIO.deleteTree(foldBase): Unit // unreachable name unless resume raced
    // the sources may span two basePaths (plain dirs vs the live fold's
    // subtree) — read each group under its own base so `epoch` parses,
    // then drop it (the fold dir IS the new epoch)
    val byBase = sources.map { case (_, p) =>
      val s = p.toString
      if (liveEntry.exists(_._2.toString == s))
        (PathIO.child(dir, live.get.foldName).toString, s)
      else (levelDir, s)
    }
    val input = byBase.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (base, rs) =>
        spark.read.option("basePath", base).parquet(rs.map(_._2): _*)
      }
      .reduce(_.unionByName(_))
      .drop("epoch")
    val rebucketed = rebucketTo.fold(input) { case (srcCol, n) =>
      input.drop(bucketCol)
        .withColumn(bucketCol, pmod(col(srcCol), lit(n.toLong)))
    }
    rebucketed.repartition(col(bucketCol))
      .write.partitionBy(bucketCol)
      .parquet(PathIO.child(foldBase, s"epoch=$foldPoint").toString)
    // the commit: one atomicCreate of the pointer. Single-writer, so a
    // loss means a competing folder — fail loudly, never replace.
    if (!PathIO.atomicCreate(PathIO.child(dir, next.ptrName),
        next.foldName.getBytes("UTF-8")))
      sys.error(s"index fold pointer ${next.ptrName} already exists in " +
        s"$dir — concurrent compaction writers detected")
    // delete what the new pointer subsumes — unless the caller runs this
    // fold concurrently with same-level readers (gcNow = false), in
    // which case the next resume() performs the identical cleanup
    if (gcNow) resume(levelDir)
  }
}
