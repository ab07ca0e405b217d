package graft

import graft.ext.IndexIO
import graft.log.PathIO
import org.apache.spark.sql.functions._

/**
 * Model-based fuzz of the [[IndexIO]] pointer-commit protocol: random
 * interleavings of plain epoch writes, pointer-committed folds, bucket
 * fanout migrations, BOTH crash windows (mid-fold garbage, resurrected
 * subsumed sources), and heals — after EVERY step the committed view
 * [[IndexIO.read]] must equal an in-memory model exactly. The targeted
 * schedules live in ObjectStoreSeamSpec/RebucketSpec; this suite walks
 * the compositions those fixed schedules can't enumerate (a crash
 * window stacked on a crash window, rebucket over unswept garbage,
 * folds of folds across generations).
 */
class IndexIOFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val like = Seq((0L, 0L, 0L)).toDF("doc_id", "band_hash", "bp")

  private def writeDir(path: String, rows: Seq[(Long, Long)], fanout: Int): Unit =
    rows.toDF("doc_id", "band_hash")
      .withColumn("bp", pmod(col("band_hash"), lit(fanout.toLong)))
      .repartition(1)
      .write.partitionBy("bp").parquet(path)

  private def readModel(root: String): Set[(Long, Long)] =
    IndexIO.read(spark, root, like)
      .select("doc_id", "band_hash").as[(Long, Long)].collect().toSet

  test("random op/crash interleavings: committed view always equals the model") {
    for (seed <- Seq(11L, 42L)) {
      val rnd = new scala.util.Random(seed)
      val root = java.nio.file.Files
        .createTempDirectory(s"idxfuzz-$seed").toString
      // the model: per-epoch row sets as written (epoch id -> rows),
      // committed view = union of values; archive keeps content of
      // every PLAIN epoch ever written, for crash-B resurrection
      var epochs = Map.empty[Long, Set[(Long, Long)]]
      val archive = scala.collection.mutable.Map.empty[Long, (Set[(Long, Long)], Int)]
      var nextEpoch = 0L
      var nextDoc = 0L
      var fanout = 4
      var foldedUpTo = -1L // highest epoch a committed fold subsumed

      def check(step: String): Unit = {
        val want = epochs.values.flatten.toSet
        val got = readModel(root)
        assert(got == want, s"seed=$seed $step: committed view diverged " +
          s"(missing=${want -- got} extra=${got -- want})")
        // a resurrected subsumed dir holds IDENTICAL rows — set equality
        // alone would mask a double-count, so gate the raw row count too
        val n = IndexIO.read(spark, root, like).count()
        assert(n == want.size.toLong,
          s"seed=$seed $step: double-counted rows ($n != ${want.size})")
        // at most one live pointer is ever interpreted: reads above
        // already prove it semantically; also require resume idempotence
        IndexIO.resume(root)
        assert(readModel(root) == want, s"seed=$seed $step: resume changed the view")
      }

      for (step <- 1 to 25) {
        val op = rnd.nextInt(10)
        if (op <= 4 || epochs.isEmpty) { // write a plain epoch (weighted)
          val e = nextEpoch; nextEpoch += 1
          val rows = (0 until 1 + rnd.nextInt(4)).map { _ =>
            val d = nextDoc; nextDoc += 1
            (d, rnd.nextLong(1000000L))
          }.toSet
          writeDir(s"$root/epoch=$e", rows.toSeq, fanout)
          epochs += (e -> rows)
          archive(e) = (rows, fanout)
          check(s"step$step writeEpoch($e)")
        } else if (op <= 6) { // fold up to a random committed epoch
          val upTo = {
            val es = epochs.keys.toSeq.sorted
            es(rnd.nextInt(es.size))
          }
          IndexIO.compact(spark, root, "bp", upToEpoch = upTo)
          // model: epochs <= upTo merge into one entry keyed upTo
          // (no-op below two sources, which merges to the same model)
          val (folded, kept) = epochs.partition(_._1 <= upTo)
          if (folded.size >= 2) {
            epochs = kept + (upTo -> folded.values.flatten.toSet)
            foldedUpTo = math.max(foldedUpTo, upTo)
          }
          check(s"step$step compact($upTo)")
        } else if (op == 7) { // rebucket: content invariant, new fanout
          fanout = Seq(1, 2, 4, 8, 16)(rnd.nextInt(5))
          IndexIO.rebucket(spark, root, "bp", "band_hash", fanout)
          // model: everything committed folds into max epoch
          if (epochs.nonEmpty) {
            val top = epochs.keys.max
            epochs = Map(top -> epochs.values.flatten.toSet)
            foldedUpTo = math.max(foldedUpTo, top)
            // every stored row must carry the recomputed bucket
            val bad = IndexIO.read(spark, root, like)
              .where(expr(s"bp != pmod(band_hash, $fanout)")).count()
            assert(bad == 0L, s"seed=$seed step$step rebucket($fanout): stale buckets")
          }
          check(s"step$step rebucket($fanout)")
        } else if (op == 8) { // crash window A: mid-fold garbage, no pointer
          val upTo = if (epochs.isEmpty) 0L else epochs.keys.max
          val gen = 1000L + step // a generation no real fold will claim
          writeDir(s"$root/_fold-$upTo-$gen/epoch=$upTo",
            Seq((-1L * step, 999999L)), fanout)
          check(s"step$step crashA($upTo-$gen)") // view blind to it; resume sweeps
          assert(!PathIO.exists(PathIO.path(root, s"_fold-$upTo-$gen")),
            s"seed=$seed step$step: resume left uncommitted fold garbage")
        } else { // crash window B: resurrect a subsumed plain epoch dir
          val candidates = archive.keys.filter(_ <= foldedUpTo).toSeq.sorted
          if (candidates.nonEmpty) {
            val e = candidates(rnd.nextInt(candidates.size))
            val (rows, f) = archive(e)
            writeDir(s"$root/epoch=$e", rows.toSeq, f)
            // the resurrected dir's content is INSIDE the fold: the view
            // must exclude it (no double count), resume must sweep it
            check(s"step$step crashB(epoch=$e)")
            assert(!PathIO.exists(PathIO.path(root, s"epoch=$e")),
              s"seed=$seed step$step: resume left a subsumed epoch dir")
          }
        }
      }
      // end state: one more full fold leaves exactly one generation
      if (epochs.size >= 2) {
        IndexIO.compact(spark, root, "bp", upToEpoch = epochs.keys.max)
        val top = epochs.keys.max
        epochs = Map(top -> epochs.values.flatten.toSet)
        check("final compact")
        val names = PathIO.listDir(PathIO.path(root)).map(_.getName)
        assert(names.count(_.startsWith("_live-")) == 1, s"seed=$seed end: $names")
        assert(names.count(_.startsWith("_fold-")) == 1, s"seed=$seed end: $names")
        assert(!names.exists(_.startsWith("epoch=")), s"seed=$seed end: $names")
      }
    }
  }
}
