package graft.ext

import graft.log.DirectCommitProtocol

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BoundReference, Expression, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/**
 * A manifest-backed [[FileIndex]] over the streaming-index epoch
 * layout — the read-side half of the rename-free object-store posture
 * ([[graft.log.DirectCommitProtocol]] is the write side). Spark's
 * default partition discovery LISTs every epoch directory AND every
 * bucket subdirectory under every read root on every batch: the
 * round-15 `os_stream` cost record measured LIST/batch growing
 * ~+103 per live epoch between folds — O(epochs × buckets) requests
 * to plan a read that then PRUNES most of what was listed. The
 * direct committer already records each job's exact file set (relative
 * path + size) in its `_SUCCESS` manifest, so a committed epoch dir's
 * contents are knowable for ONE GET; this index feeds those recorded
 * files straight into a [[HadoopFsRelation]] — zero LIST, zero HEAD at
 * scan planning, with partition pruning evaluated natively against the
 * recorded `(epoch, bucket)` values (the same name-bound predicate
 * form Spark's own `PartitioningAwareFileIndex` uses). The reference's
 * cold tier reads the same way — an index block enumerating immutable
 * data blocks, never a directory listing (tiered-storage/jcloud/.../
 * OffloadIndexBlockImpl.java).
 *
 * Instances are built by [[IndexIO.read]] when every committed root
 * carries a direct-commit manifest (object-store-written levels);
 * levels written by the stock committer fall back to listing-based
 * discovery unchanged.
 */
private[ext] object CatalogFileIndex {

  /** One committed data file: partition values in `partCols` order
    * (all LongType in this layout), absolute path, size in bytes. */
  final case class Entry(partValues: Seq[Long], path: Path, size: Long)

  /** Parse one manifest line's relative path into (partition col names,
    * values) from its `k=v` directory segments; None when a segment
    * isn't a `name=long` pair (caller falls back to listing). */
  def parseRel(rel: String): Option[(Seq[String], Seq[Long])] = {
    val segs = rel.split('/').toSeq.dropRight(1)
    val parsed = segs.map { s =>
      s.split('=') match {
        case Array(k, v) if k.nonEmpty && v.nonEmpty && v.forall(_.isDigit) =>
          Some((k, v.toLong))
        case _ => None
      }
    }
    if (parsed.contains(None)) None
    else Some((parsed.flatten.map(_._1), parsed.flatten.map(_._2)))
  }

  /** Assemble the catalog DataFrame: files grouped into partition
    * directories keyed by their recorded values, typed by `partCols`
    * (epoch first, then the level's bucket column), with `dataSchema`
    * taken from the caller's `like` frame instead of a footer read. */
  def relation(spark: SparkSession, levelPath: Path, partCols: Seq[String],
               entries: Seq[Entry], dataSchema: StructType): DataFrame = {
    val partSchema = StructType(partCols.map(c =>
      StructField(c, LongType, nullable = false)))
    val index = new CatalogFileIndex(levelPath, partSchema, entries)
    // everything nullable, as footer-inferred reads are (asNullable is
    // private[sql]; the caller's `like` frame may carry tighter marks)
    val dataNullable = StructType(dataSchema.fields.map(_.copy(nullable = true)))
    val rel = HadoopFsRelation(index, partSchema, dataNullable,
      bucketSpec = None, new ParquetFileFormat(), options = Map.empty)(spark)
    spark.baseRelationToDataFrame(rel)
  }
}

private[ext] final class CatalogFileIndex(
    levelPath: Path,
    override val partitionSchema: StructType,
    entries: Seq[CatalogFileIndex.Entry]) extends FileIndex {

  private val groups: Seq[PartitionDirectory] =
    entries.groupBy(_.partValues).toSeq.sortBy(_._1.mkString(","))
      .map { case (values, fs) =>
        PartitionDirectory(
          InternalRow.fromSeq(values),
          fs.map(e => new FileStatus(e.size, false, 1, 128L * 1024 * 1024,
            0L, e.path)).toArray)
      }

  override def rootPaths: Seq[Path] = Seq(levelPath)

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    if (partitionFilters.isEmpty) groups
    else {
      // name-bound interpretation, the PartitioningAwareFileIndex form:
      // only partition columns can appear here, and they bind by NAME
      // (the relation's attribute ids are not ours to know)
      val predicate = Predicate.createInterpreted(
        partitionFilters.reduce(And).transform {
          case a: AttributeReference =>
            val i = partitionSchema.fieldIndex(a.name)
            BoundReference(i, partitionSchema(i).dataType, nullable = true)
        })
      predicate.initialize(0)
      groups.filter(p => predicate.eval(p.values))
    }

  override def inputFiles: Array[String] = entries.map(_.path.toString).toArray

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = entries.map(_.size).sum
}
