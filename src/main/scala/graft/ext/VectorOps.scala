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
    val (model, c) = fitIvf(corpus, nlist, iters, initMode, idCol, vecCol, fitSampleCap)
    val cells = model.transform(c).drop("fv")
    probeCells(queries, cells,
      model.clusterCenters.map(_.toArray), k, nprobe, idCol, vecCol)
  }

  /** Shared IVF coarse-quantizer fit (used by [[annIvf]] and
    * [[buildIvfIndex]] — one code path means the on-disk index and the
    * inline operator place centroids IDENTICALLY, so their results are
    * bit-equal).
    *
    * The quantizer fits on a deterministic hash-fraction sample capped at
    * ~fitSampleCap vectors, never the full corpus: at 100 TB a full-corpus
    * fit is `iters` complete passes just to place `nlist` centroids, while
    * ~100k vectors already pin them. The sizing count is ONE cheap
    * aggregate pass; the sample itself is a pushed-down filter (no
    * shuffle). Centroid placement cannot change results when
    * nprobe = nlist (the spec asserts equality), and for nprobe < nlist
    * it only shifts the recall/scan trade — determinism is what matters,
    * and md5-hash sampling is engine-reproducible. */
  private def fitIvf(corpus: DataFrame, nlist: Int, iters: Int,
                     initMode: String, idCol: String, vecCol: String,
                     fitSampleCap: Long)
      : (org.apache.spark.ml.clustering.KMeansModel, DataFrame) = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    require(fitSampleCap > 0)
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
      .withColumn("fv", array_to_vector(col("cv").cast("array<double>")))
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
    (model, c)
  }

  /** Each query's `nprobe` nearest cells: (query_id, qv, cell). The
    * centroids are tiny (nlist × dim) — broadcast as a literal table. */
  private def probeAssignments(queries: DataFrame,
                               centroidArrays: Array[Array[Double]],
                               nprobe: Int, idCol: String,
                               vecCol: String): DataFrame = {
    val centroids = queries.sparkSession.createDataFrame(
      centroidArrays.zipWithIndex.map { case (v, i) => (i, v) }.toSeq)
      .toDF("cell", "centroid")
    val probeW = Window.partitionBy("query_id")
      .orderBy(col("cdist").desc, col("cell"))
    queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .crossJoin(broadcast(centroids))
      .withColumn("cdist", cosine(col("qv"), col("centroid")))
      .withColumn("crank", row_number().over(probeW))
      .filter(col("crank") <= nprobe)
      .select("query_id", "qv", "cell")
  }

  /** Exact-verify tail shared by [[annIvf]] and [[annIvfIndexed]]:
    * candidates from the probed cells, exact cosine, per-query top-k.
    * `cells` must carry (cell, corpus_id, cv).
    *
    * No dedup stage: (query_id, corpus_id) pairs are unique by
    * construction — every corpus row lives in exactly ONE cell and
    * `probed` has one row per (query, probed cell) (row_number ≤ nprobe
    * over distinct cells), so the join cannot fan a pair out twice. A
    * defensive distinct here used to cost a full candidate-set shuffle
    * BEFORE the rank window's map-side top-k pruning could bound
    * anything — at 100× the extra exchange was most of the pruned
    * path's wall. */
  private def verifyProbe(probed: DataFrame, cells: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("corpus_id"))
    probed.join(cells, Seq("cell"))
      .filter(col("corpus_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("cv"), col("qv")))
      .select("query_id", "corpus_id", "sim")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "sim", "rank")
  }

  private def probeCells(queries: DataFrame, cells: DataFrame,
                         centroidArrays: Array[Array[Double]], k: Int,
                         nprobe: Int, idCol: String, vecCol: String): DataFrame =
    verifyProbe(
      probeAssignments(queries, centroidArrays, nprobe, idCol, vecCol),
      cells, k)

  // Centroid sidecar carrying the coarse quantizer next to the data files
  // (underscore prefix → invisible to Spark's file listing). Doubles are
  // stored via java.lang.Double.toString, which round-trips exactly.
  private val CentroidSidecar = "_ivf_centroids.tsv"

  /**
   * Materialize the IVF index ON DISK, hive-partitioned by `cell` — the
   * 100 TB layout where a probe touches only its cells' files (same
   * pattern as [[graft.operators.DelayedBuckets]]: partition pruning
   * makes the probe O(probed cells), never O(corpus)). The fitted
   * centroids ride along in a sidecar so probing never re-fits.
   *
   * Rows are repartitioned BY cell before the write: without it every
   * task opens a writer per cell it sees (tasks × cells tiny files);
   * with it each cell is one task's single file.
   */
  def buildIvfIndex(corpus: DataFrame, indexPath: String,
                    nlist: Int = 16, iters: Int = 5,
                    initMode: String = "k-means||",
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    fitSampleCap: Long = 100000L): Unit = {
    val (model, c) = fitIvf(corpus, nlist, iters, initMode, idCol, vecCol, fitSampleCap)
    model.transform(c).drop("fv")
      .repartition(col("cell"))
      .write.mode("overwrite")
      .partitionBy("cell")
      .parquet(indexPath)
    val body = model.clusterCenters.zipWithIndex.map { case (v, i) =>
      s"$i\t${v.toArray.map(java.lang.Double.toString).mkString(",")}"
    }.mkString("\n")
    val conf = corpus.sparkSession.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(indexPath, CentroidSidecar)
    val tmp = new org.apache.hadoop.fs.Path(indexPath, CentroidSidecar + ".tmp")
    val fs = p.getFileSystem(conf)
    // write-then-rename (manifest-commit pattern): a crash mid-write must
    // never leave a truncated sidecar that poisons every later probe
    val out = fs.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    fs.delete(p, false)
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"could not publish $p")
  }

  private def readCentroids(spark: org.apache.spark.sql.SparkSession,
                            indexPath: String): Array[Array[Double]] = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(indexPath, CentroidSidecar)
    val fs = p.getFileSystem(conf)
    require(fs.exists(p), s"no IVF centroid sidecar at $p — not an IVF index?")
    val in = fs.open(p)
    val text = try {
      val bos = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, bos, 8192, false)
      bos.toString("UTF-8")
    } finally in.close()
    text.split('\n').map { line =>
      val Array(i, vs) = line.split('\t')
      (i.toInt, vs.split(',').map(_.toDouble))
    }.sortBy(_._1).map(_._2)
  }

  /**
   * Probe a disk-materialized IVF index (built by [[buildIvfIndex]]).
   * Each query's `nprobe` nearest cells come from the sidecar centroids;
   * the probed cell set is then pushed as a STATIC `cell IN (…)`
   * predicate so it reaches the file listing as a PartitionFilter — the
   * scan reads only the probed cells' files (plan-gated in
   * PlanQualitySpec). With the same fit parameters the result is
   * bit-equal to [[annIvf]] (shared [[fitIvf]] + fixed seed).
   */
  def annIvfIndexed(queries: DataFrame, indexPath: String, k: Int,
                    nprobe: Int = 4,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val spark = queries.sparkSession
    val centroidArrays = readCentroids(spark, indexPath)
    val probed = probeAssignments(queries, centroidArrays, nprobe, idCol, vecCol)
    // BOUNDED driver-side collect: the distinct probed-cell set is capped
    // by nlist (dozens), never by data size. Collecting it turns the cell
    // predicate into a static partition filter — a join would only prune
    // dynamically (DPP) and only under a broadcast plan; `isin` prunes at
    // file-listing time unconditionally. The probe plan therefore runs
    // twice (once for this collect, once in the returned plan) — it is a
    // broadcast of nlist rows plus one window over the QUERY set, never
    // a corpus scan, so re-running it is cheaper than caching it.
    val probedCellSet = probed.select("cell").distinct()
      .collect().map(_.getInt(0)).sorted
    val cells = spark.read.parquet(indexPath)
      .filter(col("cell").isin(probedCellSet.map(Int.box): _*))
    verifyProbe(probed, cells, k)
  }

  // =====================================================================
  // Product quantization (Jégou, Douze, Schmid 2011: "Product
  // Quantization for Nearest Neighbor Search") — the fourth member of
  // the vector tier beside brute force / sign-LSH / IVF and the int8
  // scalar quantizer: the vector splits into m subvectors, each encoded
  // as its nearest centroid in a per-subspace codebook of ksub entries,
  // so a D-dim float vector compresses to m bytes and approximate dot
  // products become m table lookups (ADC — asymmetric distance
  // computation: the QUERY stays exact, only the corpus is quantized).
  // =====================================================================

  /** Seeded k-means++ init + Lloyd iterations over an in-memory point
    * set. The ++ D² weighting gives duplicates of a chosen point zero
    * mass, so while distinct values remain every init pick is distinct —
    * with k ≥ #distinct values the fit converges EXACTLY onto them
    * (the exact-codebook property ExtOpsSpec certifies). An emptied
    * cluster keeps its previous centroid. */
  private[graft] def localKMeans(points: Array[Array[Double]], k: Int,
                                 iters: Int, seed: Long): Array[Array[Double]] = {
    require(points.nonEmpty, "k-means needs at least one point")
    val d = points(0).length
    def sq(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < d) { val t = a(i) - b(i); s += t * t; i += 1 }
      s
    }
    val rnd = new java.util.Random(seed)
    val n = points.length
    val centers = Array.ofDim[Array[Double]](k)
    centers(0) = points(rnd.nextInt(n)).clone()
    val d2 = Array.fill(n)(Double.MaxValue)
    var c = 1
    while (c < k) {
      var total = 0.0
      var i = 0
      while (i < n) {
        val v = sq(points(i), centers(c - 1))
        if (v < d2(i)) d2(i) = v
        total += d2(i); i += 1
      }
      if (total == 0) centers(c) = points(rnd.nextInt(n)).clone()
      else {
        var r = rnd.nextDouble() * total
        var pick = 0
        while (pick < n - 1 && r >= d2(pick)) { r -= d2(pick); pick += 1 }
        centers(c) = points(pick).clone()
      }
      c += 1
    }
    val assign = new Array[Int](n)
    val sums = Array.ofDim[Double](k, d)
    val counts = new Array[Long](k)
    (0 until iters).foreach { _ =>
      java.util.Arrays.fill(counts, 0L)
      sums.foreach(java.util.Arrays.fill(_, 0.0))
      var i = 0
      while (i < n) {
        var best = 0; var bestD = Double.MaxValue; var cc = 0
        while (cc < k) {
          val v = sq(points(i), centers(cc))
          if (v < bestD) { bestD = v; best = cc }
          cc += 1
        }
        assign(i) = best
        counts(best) += 1
        var j = 0
        while (j < d) { sums(best)(j) += points(i)(j); j += 1 }
        i += 1
      }
      var cc = 0
      while (cc < k) {
        if (counts(cc) > 0) {
          var j = 0
          while (j < d) { centers(cc)(j) = sums(cc)(j) / counts(cc); j += 1 }
        }
        cc += 1
      }
    }
    centers
  }

  /**
   * Fit the per-subspace codebooks: m independent k-means fits (fixed
   * seeds, capped deterministic sample — the same 100 TB stance as
   * [[annIvf]]'s coarse quantizer: a bounded sample pins ksub
   * centroids, never `iters` full-corpus passes). The sample collects
   * to the driver (cap × dim doubles ≈ 10 MB at the default) and all m
   * fits run locally — ksub=16 centroids don't justify m distributed
   * k-means jobs' scheduling overhead; the corpus-sized work (encode,
   * scoring) stays in codegen'd expressions. Returns codebooks(j)(c) =
   * centroid c of subspace j, a driver-side array of m·ksub·(dim/m)
   * doubles (a few KB) that broadcasts as a literal into the encode and
   * scoring expressions.
   */
  def pqTrain(corpus: DataFrame, dim: Int, m: Int = 8, ksub: Int = 16,
              iters: Int = 5, idCol: String = "vec_id",
              vecCol: String = "embedding",
              fitSampleCap: Long = 20000L): Array[Array[Array[Double]]] = {
    require(dim % m == 0, s"dim $dim must divide into m=$m subspaces")
    val dsub = dim / m
    val c = corpus.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    val nCorpus = c.count()
    val fitSet =
      if (nCorpus <= fitSampleCap) c
      else Sampling.hashFractionSample(c, fitSampleCap.toDouble / nCorpus,
        idCol = "id", salt = "pq-fit|")
    // bounded collect: ≤ fitSampleCap rows of dim doubles (the fit set)
    val sample = fitSet.select("v").collect()
      .map(_.getSeq[Double](0).toArray)
    (0 until m).map { j =>
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, j * dsub, (j + 1) * dsub))
      // a few seeded restarts stand in for kmeans‖'s stronger init;
      // local points make them nearly free
      (0 until 5).map { r =>
        val cb = localKMeans(sub, ksub, iters, seed = 42L + j * 31L + r)
        val sse = sub.iterator.map { p =>
          cb.iterator.map { ctr =>
            var s = 0.0; var i = 0
            while (i < dsub) { val t = p(i) - ctr(i); s += t * t; i += 1 }
            s
          }.min
        }.sum
        (sse, cb)
      }.minBy(_._1)._2
    }.toArray
  }

  /** Codebooks as a flat literal `array<array<double>>` column indexed
    * by j·ksub + c (1-based for element_at). */
  private def codebookLit(codebooks: Array[Array[Array[Double]]]): Column =
    array(codebooks.flatten.map(cent =>
      array(cent.map(lit(_)).toIndexedSeq: _*)).toIndexedSeq: _*)

  /**
   * Encode each vector as its m nearest-centroid codes:
   * `pq_codes` = array<int> of length m. One native codegen'd kernel
   * ([[graft.functions.Pq.pq_encode]]) — one narrow pass, no join, no
   * shuffle, and the codebook rides along as a referenced `double[]`
   * instead of a ~1k-node literal tree (the HOF formulation it replaces
   * swung 2.5–52 s per run at sf0.1 on optimizer/JIT churn alone).
   */
  def withPqCodes(df: DataFrame, codebooks: Array[Array[Array[Double]]],
                  vecCol: String = "embedding"): DataFrame =
    df.withColumn("pq_codes",
      graft.functions.Pq.pq_encode(col(vecCol).cast("array<double>"), codebooks))

  /** Reconstruct the approximate vector from its codes (tests / debug). */
  def pqDecode(codes: Column, codebooks: Array[Array[Array[Double]]]): Column = {
    val ksub = codebooks(0).length
    val cb = codebookLit(codebooks)
    flatten(zip_with(codes,
      sequence(lit(0), lit(codebooks.length - 1)),
      (code, j) => element_at(cb, (j * ksub + code + 1).cast("int"))))
  }

  /**
   * ADC approximate top-k: the exact query vector scores against the
   * QUANTIZED corpus — approx_dot(q, d) = Σ_j dot(q_j, centroid(j,
   * codes_j)). Queries broadcast; the corpus side reads only the m-byte
   * codes (the 100 TB point of PQ: the scan is m codes per vector, not
   * D floats); per-query top-k via window rank.
   */
  def annPq(corpusCodes: DataFrame, queries: DataFrame, k: Int,
            codebooks: Array[Array[Array[Double]]],
            idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val ksub = codebooks(0).length
    val c = corpusCodes.select(col(idCol).as("corpus_id"), col("pq_codes"))
    // the ADC factorization: each query computes its m·ksub lookup table
    // ONCE (queries-sized work), so the corpus×queries pair stage below
    // does m gathers per candidate — never arithmetic on the D floats
    val q = queries.select(col(idCol).as("query_id"),
      graft.functions.Pq.pq_adc_lut(
        col(vecCol).cast("array<double>"), codebooks).as("lut"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("approx_dot").desc, col("corpus_id"))
    c.crossJoin(broadcast(q))
      .filter(col("corpus_id") =!= col("query_id"))
      .withColumn("approx_dot",
        graft.functions.Pq.pq_adc_score(col("pq_codes"), col("lut"), ksub))
      .drop("lut")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "corpus_id", "approx_dot", "rank")
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
    // SHUFFLE_HASH (same rationale as MinHash.simhashPairs): the bucket
    // join's work is quadratic in per-bucket matches and carries full
    // vectors — a byte-based broadcast choice would serialize it onto
    // the input partitions
    a.join(b.hint("shuffle_hash"), Seq("tbl", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim", cosine(col("va"), col("vb")))
      .filter(col("sim") >= threshold)
      .select("id_a", "id_b", "sim").distinct()
  }

  /**
   * SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
   * deduplication by clustering the embedding space and pruning
   * near-duplicates WITHIN each cluster only — the approximation that
   * turns the quadratic all-pairs scan into a sum of per-cluster
   * quadratics. The paper clusters with k-means; here the coarse
   * quantizer is the deterministic sign-LSH signature's low
   * `clusterBits` bits, so the whole pipeline is reproducible
   * cross-engine with no stored model (the DuckDB oracle replays the
   * hyperplanes, the centroids and the keep rule exactly).
   *
   * Keep rule (paper §2.2): inside a τ-neighborhood the example kept is
   * the one with the LOWEST cosine similarity to its cluster centroid —
   * "farthest from the centroid" retains the most diverse member — with
   * ties broken by lower id. A row is removed iff some same-cluster row
   * within `threshold` cosine outranks it under that order. The
   * centroid is the elementwise sum of member embeddings (cosine is
   * scale-invariant, so the mean's division is skipped and the sum
   * stays EXACT as a decimal — no cross-engine float-accumulation
   * drift); components are rounded to 9 decimals at the decimal cast,
   * which is the operator's definition of the centroid, not a fudge.
   *
   * Scale: cluster id is the shuffle key everywhere. The centroid table
   * is 2^clusterBits × dim scalars (tiny → broadcast); the pairwise
   * stage joins on cluster so its cost is Σ|cluster|², the same bound
   * the paper engineers for (their k=50k clusters at 100 TB ≡ raising
   * `clusterBits`); similarity is computed and thresholded before the
   * distinct, so the dedup exchange carries only ids.
   *
   * SIZING `clusterBits` (measured, Stress semanticBitsTier at 10×
   * sf0.1 = 200k vectors): bits=6 leaves Σ|cluster|² ≈ n²/64 and the
   * heaviest cluster's pair task dominates the stage; bits=12 cuts the
   * candidate pairs ~20× and flattens the task distribution. Choose
   * bits ≈ log2(n / target_cluster_size); the paper's k≈50k at web
   * scale corresponds to bits 16-17. Raising bits splits clusters
   * (mask-nested refinement — see ExtOpsSpec), shrinking the pair bound
   * monotonically; kept sets legitimately differ across settings
   * because the keep rule is per-cluster and centroid-relative.
   *
   * `clusterBits = None` (the default) applies that sizing rule
   * automatically from one cheap count — [[autoClusterBits]]: bits =
   * ceil(log2(n / 64)) clamped to [1, 20], i.e. ~64-vector clusters, a
   * Σ|cluster|² pair bound LINEAR in n (≈64·n). At the measured tiers
   * this reproduces the sweet spots exactly (2.5k vectors → 6,
   * 200k → 12), so a 100 TB user no longer inherits a fixture's
   * hand-picked bits. Pass `Some(bits)` to pin (the oracle fixture
   * pins nothing — sf0.01's auto value IS 6, the oracle's setting).
   *
   * Returns (vec_id, cluster, simc_r = round(cos-to-centroid, 6), kept).
   */
  def semanticDedup(vecs: DataFrame, threshold: Double,
                    clusterBits: Option[Int] = None,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val bits = clusterBits.getOrElse(autoClusterBits(vecs.count()))
    val scored = clusterScored(vecs, bits, idCol, vecCol)

    // A row is removed iff a same-cluster row within the threshold
    // outranks it under (simc_r asc, id asc) — the EXISTS is a
    // distinct-on-id semi side computed pre-join-back, so the final
    // exchange carries only ids.
    val a = scored.toDF("id_a", "cluster", "va", "simc_a")
    val b = scored.toDF("id_b", "cluster", "vb", "simc_b")
    // SHUFFLE_HASH: per-cluster quadratic work must partition by
    // cluster, not broadcast (see MinHash.simhashPairs)
    val removed = a.join(b.hint("shuffle_hash"), Seq("cluster"))
      .filter(col("id_a") =!= col("id_b"))
      // rounded to 6 like simc_r, so a last-ulp cross-engine difference
      // exactly at the threshold can't flip a kept/removed verdict
      .filter(round(cosine(col("va"), col("vb")), 6) >= threshold)
      .filter(col("simc_b") < col("simc_a") ||
        (col("simc_b") === col("simc_a") && col("id_b") < col("id_a")))
      .select(col("id_a").as("rid")).distinct()

    scored.join(removed, col("id") === col("rid"), "left_outer")
      .select(col("id").as(idCol), col("cluster"), col("simc_r"),
        col("rid").isNull.as("kept"))
  }

  /** The deterministic quantize-and-score stage shared by
    * [[semanticDedup]] and the cluster-curation operators
    * ([[Clustering.prototypePrune]], [[Clustering.clusterCapSample]]):
    * cluster = low `bits` bits of the 32-bit sign-LSH signature;
    * `simc_r` = round(cosine(v, cluster centroid), 6) against the
    * EXACT per-cluster centroid direction — the elementwise
    * DECIMAL(28,9) sum of member embeddings (cosine is scale-invariant,
    * so the mean's division is skipped and the sum stays exact as a
    * decimal: no cross-engine float-accumulation drift; the DuckDB
    * oracles replay every step bit-for-bit).
    *
    * Scale: the centroid agg shuffles (cluster, pos) partial sums —
    * map-side combine keeps it at partitions × 2^bits × dim rows; the
    * centroid table itself is 2^bits × dim scalars → broadcast back, so
    * the corpus is never reshuffled to attach its score.
    *
    * Returns (id, cluster, v, simc_r). */
  private[graft] def clusterScored(vecs: DataFrame, bits: Int,
                                   idCol: String, vecCol: String): DataFrame = {
    require(bits >= 1 && bits <= 32, s"clusterBits $bits not in [1,32]")
    val base = vecs.select(col(idCol).as("id"), col(vecCol).as("v"),
      graft.functions.Sketch.sign_lsh(col(vecCol), 32)
        .bitwiseAND((1L << bits) - 1).as("cluster"))

    // Exact per-cluster centroid direction: explode to (cluster, pos, x),
    // sum each component as a decimal (order-independent), reassemble the
    // array sorted by position. 2^clusterBits rows → broadcast.
    val exploded = base.select(col("cluster"), posexplode(col("v")).as(Seq("pos", "x")))
    val centroids = exploded
      .groupBy("cluster", "pos")
      .agg(sum(col("x").cast("double").cast("decimal(28,9)")).cast("double").as("c"))
      .groupBy("cluster")
      .agg(array_sort(collect_list(struct(col("pos"), col("c")))).as("pc"))
      .select(col("cluster"), transform(col("pc"), p => p.getField("c")).as("cv"))

    base.join(broadcast(centroids), Seq("cluster"))
      .withColumn("simc_r", round(cosine(transform(col("v"), _.cast("double")),
        col("cv")), 6))
      .select("id", "cluster", "v", "simc_r")
  }

  /** The [[semanticDedup]] auto-sizing rule, exposed so specs can pin
    * it: bits = ceil(log2(n / targetClusterSize)) clamped to [1, 20].
    * target 64 keeps the per-cluster pair work ~64² and the total
    * Σ|cluster|² bound ≈ targetClusterSize·n — linear in n, the
    * property that holds the operator together at 100 TB. The 20-bit
    * cap (1M clusters) matches the paper's largest useful k; below
    * 2·target the data fits one comparison tier (bits=1). */
  def autoClusterBits(n: Long, targetClusterSize: Long = 64L): Int = {
    // integer ceil-log2 (bit length of clusters-1), NOT floating log2:
    // the DuckDB oracle computes the identical mask via length(bin(c-1)),
    // and float log at exact powers of two could ceil differently
    // across engines
    val clusters = math.max(2L, (n + targetClusterSize - 1) / targetClusterSize)
    val bits = 64 - java.lang.Long.numberOfLeadingZeros(clusters - 1)
    math.min(20, math.max(1, bits))
  }
}
