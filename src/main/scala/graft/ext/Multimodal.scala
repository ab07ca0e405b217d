package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal-column plumbing for training-data pipelines: image/audio/
 * video travel as opaque `BINARY` columns with a typed metadata struct;
 * decode / feature-extract / resize / frame-sample run as partition-local
 * batch transforms.
 *
 * The actual codec calls are STUBBED (no image/audio libraries in this
 * environment) with deterministic fakes derived from the bytes — clearly
 * marked below. Everything Spark-side is real and load-bearing at scale:
 * the schema, the binary column handling, the mapPartitions batch shape
 * (one JVM-side batch per partition, the Scala analog of mapInPandas
 * batches), and the partition sizing guidance.
 *
 * Scale notes (100 TB of media): keep payloads in parquet BINARY next to
 * metadata so predicate pushdown on metadata prunes before any decode;
 * size `spark.sql.files.maxPartitionBytes` so a partition of payloads
 * fits executor memory; decode once per partition batch, not per row.
 */
object Multimodal {

  /** Typed metadata carried beside every media payload. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),   // image | audio | video
    StructField("format", StringType),       // jpeg | wav | mp4 ...
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_channels", IntegerType),
    StructField("duration_ms", LongType),
    StructField("size_bytes", LongType)))

  // ======================================================================
  // STUB: deterministic fake codecs. In production these call the real
  // image/audio libraries; signatures and batch shape are the contract.
  // ======================================================================

  /** STUB decode: fake metadata derived deterministically from content
    * bytes (stands in for reading the real container header). */
  private[ext] def stubDecode(bytes: Array[Byte], mediaType: String): Row = {
    val h = graft.functions.Sketch.splitmix64(
      java.util.Arrays.hashCode(bytes).toLong)
    val w = 64 + (math.abs(h) % 1024).toInt
    val ht = 64 + (math.abs(h >> 10) % 1024).toInt
    Row(mediaType, "stub", w, ht, 3, bytes.length.toLong * 10, bytes.length.toLong)
  }

  /** STUB feature extraction: deterministic pseudo-embedding from bytes
    * (stands in for a vision/audio encoder forward pass). */
  private[ext] def stubFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = graft.functions.Sketch.splitmix64(
      java.util.Arrays.hashCode(bytes).toLong)
    var i = 0
    while (i < dim) {
      h = graft.functions.Sketch.splitmix64(h)
      out(i) = ((h % 2000) / 1000.0f)
      i += 1
    }
    out
  }

  // ======================================================================
  // Real Spark plumbing
  // ======================================================================

  /**
   * Decode a binary media column into the metadata struct. Runs
   * partition-local over batches (mapPartitions — the JVM analog of
   * mapInPandas: one iterator per partition, amortized codec setup).
   */
  def withDecodedMeta(df: DataFrame, bytesCol: String,
                      mediaType: String = "image"): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(df.schema.fields :+
      StructField("media_meta", mediaMetaSchema))
    val bytesIdx = df.schema.fieldIndex(bytesCol)
    val rdd = df.rdd.mapPartitions { rows =>
      // codec init happens once per partition here (stubbed)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](bytesIdx)
        Row.fromSeq(r.toSeq :+ stubDecode(bytes, mediaType))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Feature-extract a binary media column into a float embedding. */
  def withFeatures(df: DataFrame, bytesCol: String, dim: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val outSchema = StructType(df.schema.fields :+
      StructField("features", ArrayType(FloatType, containsNull = false)))
    val bytesIdx = df.schema.fieldIndex(bytesCol)
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](bytesIdx)
        Row.fromSeq(r.toSeq :+ stubFeatures(bytes, dim).toSeq)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /**
   * Resize plan: pure-metadata transform (target dims recorded; actual
   * pixel work happens at decode time in production). Declarative so
   * Catalyst can prune/push it — resizing 100 TB is a plan property,
   * not an eager pass.
   */
  def withResizeTarget(df: DataFrame, maxSide: Int): DataFrame =
    df.withColumn("resize_scale",
        least(lit(1.0),
          lit(maxSide).cast("double") /
            greatest(col("media_meta.width"), col("media_meta.height"))))
      .withColumn("target_width",
        (col("media_meta.width") * col("resize_scale")).cast("int"))
      .withColumn("target_height",
        (col("media_meta.height") * col("resize_scale")).cast("int"))

  /**
   * Frame sampling for video payloads: emit one row per sampled frame
   * index (every `everyMs` of stub duration). The explode is the real
   * operator — per-frame decode is the stub.
   */
  def sampleFrames(df: DataFrame, everyMs: Long): DataFrame =
    df.withColumn("frame_ms",
        explode(sequence(lit(0L), col("media_meta.duration_ms"), lit(everyMs))))
      .withColumn("frame_id",
        concat_ws(":", col("media_meta.size_bytes"), col("frame_ms")))
}
