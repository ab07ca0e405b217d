package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Embedding similarity operators over `Array[Float]` columns: cosine
 * similarity, brute-force top-k ANN (exact baseline), LSH-bucketed ANN
 * (random-hyperplane signatures) and cosine near-duplicate pairs.
 *
 * All vector math is `zip_with`/`aggregate` over array columns —
 * codegen'd, no UDFs, computed in double precision.
 *
 * Scale design: brute-force is the correctness baseline (broadcast the
 * query set, never the corpus). The scale path is sign-LSH bucketing:
 * corpus vectors map to a b-bit hyperplane signature; queries probe
 * matching buckets only, turning top-k from O(|corpus|·|queries|) into
 * O(bucket sizes). An IVF (k-means coarse quantizer) slots into the same
 * probe-join shape.
 */
object VectorOps {

  /** dot(a, b) in double precision, sequential (deterministic) order —
    * native kernel (graft.functions.DotProductExpr), one call per row. */
  def dot(a: Column, b: Column): Column = graft.functions.Sketch.dot_product(a, b)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Single-pass cosine similarity (native kernel). */
  def cosine(a: Column, b: Column): Column = graft.functions.Sketch.cosine_sim(a, b)

  /**
   * Symmetric per-vector int8 scalar quantization — the standard 4×
   * memory cut on the ANN corpus side (FAISS SQ8 / every production
   * vector store): `scale = max|x| / 127`, `code = sign(x) ·
   * floor(|x|/scale + 0.5)` (round-half-away-from-zero, spelled out so
   * any engine reproduces it bit-for-bit), codes in [−127, 127] by
   * construction with reconstruction error ≤ scale/2 per dimension.
   * Zero vectors quantize to (scale 0, all-zero codes). Returns
   * struct(scale double, codes array<tinyint>).
   */
  def quantizeI8(vec: Column): Column = {
    val mx = array_max(transform(vec, x => abs(x.cast("double"))))
    val scale = mx / lit(127.0)
    val codes = transform(vec, x =>
      (signum(x.cast("double")) * floor(abs(x.cast("double")) / scale + 0.5))
        .cast("tinyint"))
    when(mx === 0.0, struct(lit(0.0).as("scale"),
        transform(vec, _ => lit(0).cast("tinyint")).as("codes")))
      .otherwise(struct(scale.as("scale"), codes.as("codes")))
  }

  /** [[quantizeI8]] with the scale STAGED as its own projection, so the
    * per-element lambda references an attribute instead of re-deriving
    * the row max d times (Catalyst does not collapse the two Projects —
    * the alias is expensive and multiply-referenced). Adds `q`. */
  def withQuantizedI8(df: DataFrame, vecCol: String = "embedding"): DataFrame =
    df.withColumn("_q_scale",
        array_max(transform(col(vecCol), x => abs(x.cast("double")))) / lit(127.0))
      .withColumn("q",
        when(col("_q_scale") === 0.0,
          struct(lit(0.0).as("scale"),
            transform(col(vecCol), _ => lit(0).cast("tinyint")).as("codes")))
          .otherwise(struct(col("_q_scale").as("scale"),
            transform(col(vecCol), x =>
              (signum(x.cast("double")) *
                floor(abs(x.cast("double")) / col("_q_scale") + 0.5))
                .cast("tinyint")).as("codes"))))
      .drop("_q_scale")

  /** Reconstruct approximate doubles from a quantized vector. */
  def dequantizeI8(q: Column): Column =
    transform(q.getField("codes"),
      c => c.cast("double") * q.getField("scale"))

  /** Dot product in the quantized domain: scaleA·scaleB·Σ codeA·codeB —
    * the integer kernel ANN scan engines run; one narrow pass. */
  def quantizedDot(a: Column, b: Column): Column =
    a.getField("scale") * b.getField("scale") *
      dot(transform(a.getField("codes"), _.cast("int")),
        transform(b.getField("codes"), _.cast("int")))

  /**
   * Brute-force exact top-k cosine neighbors for each query vector.
   * Queries broadcast; corpus streams through one narrow pass; per-query
   * top-k via window rank over (query, similarity).
   */
  def annBruteForce(corpus: DataFrame, queries: DataFrame, k: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("corpus_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("cv"), col("qv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("corpus_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "sim", "rank")
  }

  /**
   * Random-hyperplane (sign) LSH signature: bit i = sign(dot(v, h_i))
   * where hyperplane h_i is a deterministic pseudo-random ±1 vector —
   * native single-pass kernel (graft.functions.SignLshExpr), reproducible
   * across runs with no stored model.
   */
  def signLshSignature(vec: Column, dim: Int, bits: Int): Column =
    graft.functions.Sketch.sign_lsh(vec, bits)

  /**
   * LSH-bucketed approximate top-k: probe only corpus vectors whose
   * signature matches the query's in at least one of `tables`
   * independent bands of `bitsPerTable` bits. Falls back to fewer than k
   * results when buckets are sparse (standard ANN recall trade-off).
   */
  def annLsh(corpus: DataFrame, queries: DataFrame, k: Int, dim: Int,
             tables: Int = 4, bitsPerTable: Int = 8,
             idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val bits = tables * bitsPerTable
    def keyed(df: DataFrame, id: String, v: String) = {
      val sig = signLshSignature(col(vecCol), dim, bits)
      df.select(col(idCol).as(id), col(vecCol).as(v), sig.as("sig"))
        .select(col(id), col(v), explode(array((0 until tables).map { t =>
          struct(lit(t).as("tbl"),
            shiftright(col("sig"), t * bitsPerTable)
              .bitwiseAND((1L << bitsPerTable) - 1).as("bucket"))
        }: _*)).as("tb"))
        .select(col(id), col(v), col("tb.tbl"), col("tb.bucket"))
    }
    val c = keyed(corpus, "corpus_id", "cv")
    val q = keyed(queries, "query_id", "qv")
    // sim is deterministic per (query, corpus) pair, so compute it BEFORE
    // the candidate dedup: the distinct's exchange then carries
    // (id, id, double) instead of both full embedding arrays.
    val cands = c.join(q, Seq("tbl", "bucket"))
      .filter(col("corpus_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("cv"), col("qv")))
      .select("query_id", "corpus_id", "sim").distinct()
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("corpus_id"))
    cands.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "sim", "rank")
  }

  /**
   * IVF (inverted-file) approximate top-k — the second scale path beside
   * sign-LSH, same probe-join shape: a deterministic k-means coarse
   * quantizer (Spark ML, fixed seed) partitions the corpus into `nlist`
   * cells; each query probes its `nprobe` nearest cells and verifies
   * exact cosine on candidates only. With `nprobe = nlist` this equals
   * brute force (the spec asserts it); smaller nprobe trades recall for
   * an `nprobe/nlist` slice of the scan — at 100 TB the cell assignment
   * is a partition key, so a probe touches only its cells' files.
   */
  def annIvf(corpus: DataFrame, queries: DataFrame, k: Int,
             nlist: Int = 16, nprobe: Int = 4, iters: Int = 5,
             initMode: String = "k-means||",
             idCol: String = "vec_id", vecCol: String = "embedding",
             fitSampleCap: Long = 100000L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    require(fitSampleCap > 0)
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
      .withColumn("fv", array_to_vector(col("cv").cast("array<double>")))
    // The quantizer fits on a deterministic hash-fraction sample capped at
    // ~fitSampleCap vectors, never the full corpus: at 100 TB a full-corpus
    // fit is `iters` complete passes just to place `nlist` centroids, while
    // ~100k vectors already pin them. The sizing count is ONE cheap
    // aggregate pass; the sample itself is a pushed-down filter (no
    // shuffle). Centroid placement cannot change results when
    // nprobe = nlist (the spec asserts equality), and for nprobe < nlist
    // it only shifts the recall/scan trade — determinism is what matters,
    // and md5-hash sampling is engine-reproducible.
    val nCorpus = c.count()
    val fitSet =
      if (nCorpus <= fitSampleCap) c
      else Sampling.hashFractionSample(c, fitSampleCap.toDouble / nCorpus,
        idCol = "corpus_id", salt = "ivf-fit|")
    // initMode "random" skips the multi-job k-means|| seeding — the right
    // trade when nprobe = nlist (centroid quality cannot change results)
    val model = new KMeans().setK(nlist).setSeed(42).setMaxIter(iters)
      .setInitMode(initMode)
      .setFeaturesCol("fv").setPredictionCol("cell")
      .fit(fitSet.select("fv"))
    val cells = model.transform(c).drop("fv")
    // centroids are tiny (nlist × dim) — broadcast as a literal table
    val centroids = corpus.sparkSession.createDataFrame(
      model.clusterCenters.zipWithIndex.map { case (v, i) => (i, v.toArray) }.toSeq)
      .toDF("cell", "centroid")
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val probeW = Window.partitionBy("query_id")
      .orderBy(col("cdist").desc, col("cell"))
    val probed = q.crossJoin(broadcast(centroids))
      .withColumn("cdist", cosine(col("qv"), col("centroid")))
      .withColumn("crank", row_number().over(probeW))
      .filter(col("crank") <= nprobe)
      .select("query_id", "qv", "cell")
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("corpus_id"))
    probed.join(cells, Seq("cell"))
      .filter(col("corpus_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("cv"), col("qv")))
      .select("query_id", "corpus_id", "sim").distinct()
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "sim", "rank")
  }

  /**
   * Embedding-cosine near-duplicate pairs above `threshold`, via the same
   * LSH bucketing (exact verify on candidates).
   */
  def cosineNearDupPairs(vecs: DataFrame, threshold: Double, dim: Int,
                         tables: Int = 4, bitsPerTable: Int = 8,
                         idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val bits = tables * bitsPerTable
    val sig = vecs.select(col(idCol).as("id"), col(vecCol).as("v"),
      signLshSignature(col(vecCol), dim, bits).as("sig"))
    val keyed = sig.select(col("id"), col("v"),
        explode(array((0 until tables).map { t =>
          struct(lit(t).as("tbl"),
            shiftright(col("sig"), t * bitsPerTable)
              .bitwiseAND((1L << bitsPerTable) - 1).as("bucket"))
        }: _*)).as("tb"))
      .select(col("id"), col("v"), col("tb.tbl"), col("tb.bucket"))
    val a = keyed.toDF("id_a", "va", "tbl", "bucket")
    val b = keyed.toDF("id_b", "vb", "tbl", "bucket")
    // Exact verify runs pre-distinct: threshold filter drops most
    // candidates before the dedup exchange, which then shuffles only
    // (id_a, id_b, sim) — never the vectors.
    a.join(b, Seq("tbl", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", cosine(col("va"), col("vb")))
      .filter(col("sim") >= threshold)
      .select("id_a", "id_b", "sim").distinct()
  }
}
