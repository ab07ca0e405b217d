package graft

import org.apache.spark.sql.SparkSession

/** Dump executed plans for registered queries (docs/PLANS.md evidence).
  * Usage: sbt "runMain graft.PlanDump /root/testdata/sf0.01 q1_pricing ..."
  * — with no query names, dumps every registered query. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config(graft.log.DirectCommitProtocol.Key, graft.log.DirectCommitProtocol.Value)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_GRAFT_PLAN_MODE=formatted emits .explain("formatted") output
    // (the plans/r{N}/ evidence format the optimization-round judge
    // checks); default stays the compact executedPlan tree PLANS.md uses
    val formatted = sys.env.get("SPARK_GRAFT_PLAN_MODE").contains("formatted")
    val cap = if (formatted) 20000 else 4000
    names.foreach { n =>
      println(s"\n## $n\n\n```")
      if (Inner.contains(n)) println(Inner(n)(spark, sfDir).take(cap))
      else {
        val qe = SparkEntry.queries(n)(spark, sfDir).queryExecution
        val s = if (formatted)
          qe.explainString(org.apache.spark.sql.execution.FormattedMode)
        else qe.executedPlan.toString
        println(s.take(cap))
      }
      println("```")
    }
    spark.stop()
  }

  /** Inner per-batch index reads of the streaming dedup operators —
    * the plan-gated subtrees (their specs assert the PartitionFilters;
    * this dump is the PLANS.md evidence). Each seeds a one-epoch index
    * from the fixture, then plans batch 1's pruned read against it. */
  private val Inner: Map[String, (SparkSession, String) => String] = Map(
    "inner_semantic_index_read" -> ((s, sfDir) => {
      import org.apache.spark.sql.functions._
      val vecs = s.read.parquet(s"$sfDir/embeddings.parquet")
        .select("vec_id", "embedding")
      val idx = java.nio.file.Files.createTempDirectory("plan-sd-idx").toString
      val q0 = ext.SemanticDedupStream.quantized(
        vecs.filter(col("vec_id") % 3 === 0), "vec_id", "embedding", 6, 64)
      q0.repartition(col("cb")).write.partitionBy("cb")
        .parquet(s"$idx/vecs/epoch=0")
      val q1 = ext.SemanticDedupStream.quantized(
        vecs.filter(col("vec_id") % 3 === 1), "vec_id", "embedding", 6, 64)
      ext.SemanticDedupStream.indexDropped(s, s"$idx/vecs", q1, 1L, 0.3)
        .queryExecution.executedPlan.toString
    }),
    "inner_decontam_read" -> ((s, sfDir) => {
      import org.apache.spark.sql.functions._
      val docs = s.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id", "text")
      val idx = java.nio.file.Files.createTempDirectory("plan-dc-idx").toString
      val ev0 = ext.DecontamStream.evalPostings(
        docs.filter(col("doc_id") % 50 === 0), "text", 5,
        ext.DecontamStream.EvalBuckets)
      ev0.repartition(col("eb")).write.partitionBy("eb")
        .parquet(s"$idx/ngrams/epoch=0")
      val none = ext.DecontamStream.evalPostings(
        docs.filter(lit(false)), "text", 5, ext.DecontamStream.EvalBuckets)
      ext.DecontamStream.contaminatedIds(s, s"$idx/ngrams",
          docs.filter(col("doc_id") % 50 =!= 0), none, 1L, 5, 1L,
          "doc_id", "text")
        .queryExecution.executedPlan.toString
    }),
    "inner_index_fold_read" -> ((s, sfDir) => {
      // the r14 pointer-commit layout: epochs 0,1 folded by IndexIO
      // pointer, epoch 2 plain — the committed view reads TWO roots and
      // BOTH FileScans must keep the (epoch, bp) PartitionFilters
      import org.apache.spark.sql.functions._
      val docs = s.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id", "text")
      val idx = java.nio.file.Files.createTempDirectory("plan-if-idx").toString
      (0 until 3).foreach { i =>
        val b = ext.NearDupStream.bandedSigs(
          docs.filter(col("doc_id") % 3 === i), "doc_id", "text", 3, 32, 16,
          ext.NearDupStream.BandBuckets)
        b.repartition(col("bp")).write.partitionBy("bp")
          .parquet(s"$idx/bands/epoch=$i")
      }
      ext.IndexIO.compact(s, s"$idx/bands", "bp", 1L)
      val b3 = ext.NearDupStream.bandedSigs(
        docs.filter(col("doc_id") % 3 === 0).limit(50), "doc_id", "text",
        3, 32, 16, ext.NearDupStream.BandBuckets)
      ext.NearDupStream.indexCandidates(s, s"$idx/bands", b3, 3L)
        .queryExecution.executedPlan.toString
    }),
    "inner_decontam_fallback" -> ((s, sfDir) => {
      // the guarded-broadcast fallback (eval postings past
      // evalBroadcastCap): shuffle-hash join, eval still the build side
      import org.apache.spark.sql.functions._
      val docs = s.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id", "text")
      val idx = java.nio.file.Files.createTempDirectory("plan-dcf-idx").toString
      val ev0 = ext.DecontamStream.evalPostings(
        docs.filter(col("doc_id") % 50 === 0), "text", 5,
        ext.DecontamStream.EvalBuckets)
      ev0.repartition(col("eb")).write.partitionBy("eb")
        .parquet(s"$idx/ngrams/epoch=0")
      val none = ext.DecontamStream.evalPostings(
        docs.filter(lit(false)), "text", 5, ext.DecontamStream.EvalBuckets)
      ext.DecontamStream.contaminatedIds(s, s"$idx/ngrams",
          docs.filter(col("doc_id") % 50 =!= 0), none, 1L, 5, 1L,
          "doc_id", "text", broadcastOk = false)
        .queryExecution.executedPlan.toString
    }),
    "inner_cleancorpus_hash_read" -> ((s, sfDir) => {
      import org.apache.spark.sql.functions._
      val docs = s.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id", "text")
      val idx = java.nio.file.Files.createTempDirectory("plan-cc-idx").toString
      val h0 = ext.CleanCorpusStream.hashed(
        docs.filter(col("doc_id") % 3 === 0), "doc_id", "text", 32)
      h0.repartition(col("hb")).write.partitionBy("hb")
        .parquet(s"$idx/hashes/epoch=0")
      val h1 = ext.CleanCorpusStream.hashed(
        docs.filter(col("doc_id") % 3 === 1), "doc_id", "text", 32)
      ext.CleanCorpusStream.indexExactDropped(s, s"$idx/hashes", h1, 1L)
        .queryExecution.executedPlan.toString
    }))
}
