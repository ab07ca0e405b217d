package graft.streaming

import graft.model.Envelope
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, StreamingQueryListener}

/**
 * The Pulsar Functions compute surface (reference
 * pulsar-functions/api-java/.../Function.java:34 `T process(X, Context)`;
 * Context.java: counters, state, per-message properties, fan-out via
 * newOutputMessage) re-expressed Spark-first.
 *
 * Execution parity (JavaInstanceRunnable.run §3.3): one streaming query
 * per function; `parallelism` = shuffle partitions, not processes. The
 * process() contract:
 *  - return Some(out) → publish to the output topic;
 *  - return None      → message filtered out (reference
 *    JavaInstanceRunnable.java:430 skips send on null result).
 */
object Functions {

  /** Per-record view handed to the user function (Record.java:46-115). */
  final case class FnRecord[T](
      key: String, value: T, eventTime: java.sql.Timestamp,
      partition: Int, offset: Long, properties: Map[String, String])

  /**
   * 1→0/1 map function over a typed stream — `Function.process`. Runs as
   * a codegen-friendly flatMap; None drops the record.
   */
  def mapFunction[I: Encoder, O: Encoder](in: Dataset[I])(
      process: I => Option[O]): Dataset[O] =
    in.flatMap(process(_))

  /**
   * Fan-out / side outputs (Context.newOutputMessage:156): the function
   * emits (topic, payload) pairs; the runner groups by topic and appends
   * each group to its log — N sinks from one pass, the foreachBatch shape.
   */
  def fanOut[I: Encoder](in: Dataset[I])(
      emit: I => Seq[(String, String)]): DataFrame = {
    import in.sparkSession.implicits._
    in.flatMap(emit(_)).toDF("out_topic", "payload")
  }

  /**
   * Keyed counters (BaseContext.incrCounter:161-187 / getCounter): a
   * running streaming aggregation per (function, counter-key) — the
   * BookKeeper-table counter store becomes Spark state-store state.
   */
  def counterStore[I](in: Dataset[I])(key: I => String, incr: I => Long)(
      implicit e: Encoder[I]): DataFrame = {
    import in.sparkSession.implicits._
    in.map(r => (key(r), incr(r))).toDF("counter_key", "delta")
      .groupBy("counter_key").agg(sum("delta").as("counter"))
  }

  /**
   * Arbitrary keyed state (ByteBufferStateStore.java:82-92 put/get/
   * delete): flatMapGroupsWithState with a user state type. `step`
   * receives (key, new values, previous state) and returns (outputs,
   * next state or None to delete) — exactly the put/get/delete surface.
   */
  def statefulFunction[K: Encoder, V: Encoder, S: Encoder, O: Encoder](
      in: Dataset[V])(keyOf: V => K)(
      step: (K, Iterator[V], Option[S]) => (Iterator[O], Option[S])): Dataset[O] =
    in.groupByKey(keyOf)
      .flatMapGroupsWithState[S, O](OutputMode.Append(),
        GroupStateTimeout.NoTimeout()) {
        case (k, vs, state: GroupState[S]) =>
          val (out, next) = step(k, vs, state.getOption)
          next match {
            case Some(s) => state.update(s)
            case None    => if (state.exists) state.remove()
          }
          out
      }

  /**
   * Windowed function (WindowFunction.java:38 `process(Collection<Record>)`)
   * over event-time windows: watermark + groupBy(window) +
   * collect_list, then the user function over the window's records —
   * the WindowManager/trigger machinery is Spark's (SURVEY §2.5).
   */
  def windowFunction(in: DataFrame, eventTimeCol: String, length: String,
                     maxLag: String, keyCols: Seq[String]): DataFrame =
    in.withWatermark(eventTimeCol, maxLag)
      .groupBy(window(col(eventTimeCol), length) +:
        keyCols.map(col): _*)
      .agg(collect_list(struct(in.columns.map(col): _*)).as("records"),
        count(lit(1)).as("n_records"))

  /**
   * Processing guarantees (JavaInstanceRunnable.java:328,436-440):
   *  - AT_LEAST_ONCE: default — checkpoint commits after sink write;
   *  - EFFECTIVELY_ONCE: AT_LEAST_ONCE + seq-dedup at the output append
   *    (StreamOps.dedupWithinWatermark) + idempotent manifest commit.
   *    ORDERED-ARRIVAL CONTRACT — ENFORCED IN CODE: the dedup window is
   *    an event-time watermark, so input must arrive roughly
   *    time-ordered across microbatches (a live subscription —
   *    per-partition FIFO — or any continuous source; disorder must
   *    stay under `dedupLag`). A catch-up REPLAY over time-unordered
   *    files advances the watermark past old rows in the first batch
   *    and would DROP them from later batches (probe-measured: 78% of a
   *    100× unordered glob replay, `numRowsDroppedByWatermark` in the
   *    progress telemetry). The reference has the same boundary on its
   *    dedup path: a producer whose sequence ids regress beyond the
   *    snapshot horizon is dropped as duplicate
   *    (MessageDeduplication.java:330 seq high-water) — but there the
   *    producer CANNOT legally regress ids, while our replay path makes
   *    disorder easy to hit operationally, so scaladoc alone is not a
   *    contract. Two code-level defenses:
   *    (a) the returned query is a GUARD: any watermark drop stops the
   *        query and every await/drain on the handle throws — a
   *        violated guarantee can never read as a successful run with a
   *        silently incomplete sink;
   *    (b) [[orderedReplaySource]] converts an unordered catch-up batch
   *        into a time-ordered multi-trigger file stream (the
   *        session-window fixture's range-file recipe, generalized), so
   *        replays can run INSIDE the contract instead of around it;
   *  - AT_MOST_ONCE: ack-before-process — an atomic per-epoch ack marker
   *    is committed BEFORE the sink write, and a replayed epoch whose
   *    marker already exists is dropped, not reprocessed. A crash between
   *    ack and sink loses exactly that in-flight batch and nothing is
   *    ever delivered twice (the reference acks the message on receipt
   *    for this mode, with the same loss window). Markers below the
   *    replayable tail (epoch − 1; checkpoint commits are written in
   *    order, a crash loses at most the last) are GC'd each batch, so
   *    marker metadata is O(1) over the stream's lifetime.
   */
  sealed trait Guarantee
  object Guarantee {
    case object AtLeastOnce extends Guarantee
    case object EffectivelyOnce extends Guarantee
    case object AtMostOnce extends Guarantee
  }

  /** Total watermark-dropped rows visible for `q` right now: the
    * listener's accumulation (covers arbitrarily long runs; delivery is
    * async) maxed with a direct `recentProgress` scan (written
    * synchronously by the execution thread, so it has no delivery lag —
    * but rotates past 100 entries). Together they close both windows. */
  private def observedDrops(q: StreamingQuery,
                            accumulated: java.util.concurrent.atomic.AtomicLong): Long =
    math.max(accumulated.get(),
      q.recentProgress.map(_.stateOperators.map(_.numRowsDroppedByWatermark).sum).sum)

  /**
   * The EFFECTIVELY_ONCE ordered-arrival guard: wraps the running query
   * so that ANY `numRowsDroppedByWatermark > 0` — never benign in this
   * mode; every dropped row is a silently lost output — (a) STOPS the
   * query (fail-fast: no further output lands after rows are known
   * missing) and (b) makes every await/drain call on the handle throw.
   * A violated guarantee can therefore never be observed as a normal
   * query completion with an incomplete sink, which is exactly how the
   * round-11 probe's 78%-drop replay presented.
   */
  private def guardEffectivelyOnce(q: StreamingQuery): StreamingQuery = {
    val spark = q.sparkSession
    val accumulated = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener: StreamingQueryListener = new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        if (e.progress.id == q.id) {
          val d = e.progress.stateOperators.map(_.numRowsDroppedByWatermark).sum
          if (d > 0 && accumulated.getAndAdd(d) == 0L) {
            // first detection: stop the query. stop() joins the stream
            // execution thread — never call it on the listener-bus
            // thread (progress delivery would deadlock behind us).
            val t = new Thread(() =>
              try q.stop() catch { case _: Throwable => () },
              s"graft-eo-guard-stop-${q.id}")
            t.setDaemon(true)
            t.start()
          }
        }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        if (e.id == q.id) spark.streams.removeListener(this)
    }
    spark.streams.addListener(listener)
    new StreamingQuery {
      private def check(): Unit = {
        val d = observedDrops(q, accumulated)
        if (d > 0) throw new IllegalStateException(
          s"EFFECTIVELY_ONCE guarantee VIOLATED: the dedup watermark dropped " +
            s"$d input row(s) — the source did not arrive time-ordered " +
            s"within dedupLag (the ordered-arrival contract, Functions.run " +
            s"scaladoc). Replay the catch-up input through " +
            s"Functions.orderedReplaySource, or widen dedupLag past the " +
            s"disorder span. The query was stopped at first detection; the " +
            s"sink is INCOMPLETE and must not be consumed as a result.")
      }
      override def name: String = q.name
      override def id: java.util.UUID = q.id
      override def runId: java.util.UUID = q.runId
      override def sparkSession: SparkSession = q.sparkSession
      override def isActive: Boolean = q.isActive
      override def exception: Option[org.apache.spark.sql.streaming.StreamingQueryException] =
        q.exception
      override def status: org.apache.spark.sql.streaming.StreamingQueryStatus = q.status
      override def recentProgress: Array[org.apache.spark.sql.streaming.StreamingQueryProgress] =
        q.recentProgress
      override def lastProgress: org.apache.spark.sql.streaming.StreamingQueryProgress =
        q.lastProgress
      override def awaitTermination(): Unit = { q.awaitTermination(); check() }
      override def awaitTermination(timeoutMs: Long): Boolean = {
        val r = q.awaitTermination(timeoutMs); check(); r
      }
      override def processAllAvailable(): Unit = {
        q.processAllAvailable()
        // the guard may have stopped the query between the source
        // snapshot and the sink commit — surface that as the violation
        // it is, not as "all available processed"
        check()
      }
      // stop() is cleanup, not an assertion point: a caller's
      // try/finally q.stop() must not replace the original violation
      // exception with a second copy thrown from the finally block
      override def stop(): Unit = q.stop()
      override def explain(): Unit = q.explain()
      override def explain(extended: Boolean): Unit = q.explain(extended)
    }
  }

  /**
   * Convert an UNORDERED catch-up batch into a time-ordered file stream
   * that satisfies the EFFECTIVELY_ONCE ordered-arrival contract: rows
   * are range-bucketed by `eventTimeCol` (bucket i's max ≤ bucket i+1's
   * min), each bucket's files land in `stagingDir` with pinned,
   * strictly-increasing mtimes, and the returned `readStream` replays
   * them oldest-first — so the watermark never overtakes a pending row,
   * whatever `maxFilesPerTrigger` slicing applies (files inside one
   * trigger interleave freely: the watermark only advances BETWEEN
   * triggers, and no trigger's files are time-later than a later
   * trigger's).
   *
   * 100 TB shape: ONE distributed pass over the input
   * (`partitionBy` bucket write — no coalesce; a bucket may hold
   * terabytes across many part files, all sharing the bucket's mtime),
   * then O(buckets) driver listings and a DISTRIBUTED metadata job for
   * the per-file rename + mtime pins
   * ([[graft.log.PathIO.distributedMoveAndPin]]). Bucket count is a
   * replay-granularity knob, not a correctness one: any `buckets ≥ 1`
   * is contract-safe; more buckets bound per-trigger source volume.
   * Rows with NULL event time go to bucket 0 (a null is never "late").
   */
  def orderedReplaySource(input: DataFrame, eventTimeCol: String,
                          stagingDir: String, buckets: Int = 8,
                          maxFilesPerTrigger: Int = 1): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    import graft.log.PathIO
    val spark = input.sparkSession
    val b = input.agg(min(col(eventTimeCol)), max(col(eventTimeCol))).head()
    require(!b.isNullAt(0),
      s"orderedReplaySource: no non-null '$eventTimeCol' values to order by")
    val lo = b.getTimestamp(0).getTime
    val hi = b.getTimestamp(1).getTime
    val span = math.max(1L, hi - lo + 1)
    val dst = PathIO.path(stagingDir)
    PathIO.mkdirs(dst)
    // the bucketed copy stages INSIDE stagingDir (underscore-prefixed —
    // invisible to the file source): same filesystem as the final
    // files, so the renames below stay renames, and executors on a
    // multi-node cluster can reach it — a driver-local temp dir here
    // only ever worked in local mode
    val tmp = PathIO.child(dst, s"_replay_tmp_${java.util.UUID.randomUUID}")
    input.withColumn("_b",
        when(col(eventTimeCol).isNull, lit(0)).otherwise(
          least(lit(buckets - 1),
            floor((unix_millis(col(eventTimeCol)) - lo) * buckets / span))
            .cast("int")))
      .repartition(buckets, col("_b"))
      .write.partitionBy("_b").mode("overwrite").parquet(tmp.toString)
    // pinned mtimes, 2 s apart per bucket: the file source lists
    // oldest-mtime-first, and an explicit pin beats relying on move
    // timing (a same-ms batch of moves would tie arbitrarily). The
    // driver does O(buckets) listings; the per-file rename + mtime ops
    // — O(files) of metadata — run DISTRIBUTED, never as a sequential
    // driver loop (a million-part replay would serialize for hours).
    val base = System.currentTimeMillis() - (buckets + 2) * 2000L
    val specs = (0 until buckets).flatMap { i =>
      val bDir = PathIO.child(tmp, s"_b=$i")
      if (!PathIO.exists(bDir)) Seq.empty[(String, String, Long)]
      else PathIO.listDir(bDir)
        .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
        .zipWithIndex.map { case (p, j) =>
          (p.toString,
            PathIO.child(dst, f"replay_b$i%04d_p$j%05d.parquet").toString,
            base + i * 2000L)
        }
    }
    PathIO.distributedMoveAndPin(spark, specs)
    PathIO.deleteTree(tmp): Unit // data files already moved out
    spark.readStream.schema(input.schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("pathGlobFilter", "*.parquet")
      .parquet(stagingDir)
  }

  /** Run a function pipeline source→transform→sink with the chosen
    * guarantee applied at the output boundary. `dedupLag` sizes the
    * EFFECTIVELY_ONCE seq-dedup state window (how far apart in event
    * time a producer's replayed duplicate can arrive and still be
    * suppressed — the reference's dedup snapshot horizon). */
  def run(source: DataFrame, transform: DataFrame => DataFrame,
          sinkPath: String, checkpoint: String,
          guarantee: Guarantee = Guarantee.AtLeastOnce,
          dedupLag: String = "10 minutes"): StreamingQuery = {
    val transformed = transform(source)
    guarantee match {
      case Guarantee.AtMostOnce =>
        // the ack markers live beside the checkpoint and ride
        // graft.log.PathIO (the Hadoop FileSystem seam), so a remote
        // checkpoint (hdfs://) carries its markers with it — the
        // guarantee survives a driver move exactly as far as the
        // checkpoint itself does. (The pre-seam code was local-only
        // and fail-louded on '://' checkpoints.)
        transformed.writeStream
          .option("checkpointLocation", checkpoint)
          .foreachBatch { (batch: DataFrame, epochId: Long) =>
            import graft.log.PathIO
            graft.ext.BatchTune.adapt(batch)
            val ackDir = PathIO.path(checkpoint, "_acks")
            PathIO.mkdirs(ackDir)
            val marker = PathIO.child(ackDir, s"$epochId.acked")
            // ack FIRST (atomicCreate: complete-or-absent on every
            // scheme, conditional PUT on object stores), process
            // second — the order is the whole guarantee. Losing the
            // create means a previous attempt already acked this epoch
            // and died mid-process: drop the batch (at-most-once).
            if (!PathIO.exists(marker) &&
                PathIO.atomicCreate(marker, Array.emptyByteArray)) {
              batch.write.mode("append").parquet(sinkPath)
            }
            // marker already present: this epoch was acked by a previous
            // attempt that died mid-process — drop it (at-most-once)
            //
            // marker GC: checkpoint commit files are written in batch
            // order and a crash loses at most the uncommitted TAIL, so
            // a restart can only ever replay epochs ≥ epochId − 1 —
            // markers below that are unreachable, and without GC the
            // _acks dir grows one file per epoch for the stream's
            // lifetime (unbounded metadata on a long-running function).
            // After GC the dir holds ≤ 2 markers, so this listing is
            // O(1) per batch.
            PathIO.listDir(ackDir).foreach { p =>
              val n = p.getName
              if (n.endsWith(".acked")) {
                val id = n.stripSuffix(".acked")
                if (id.forall(_.isDigit) && id.toLong < epochId - 1)
                  PathIO.deleteIfExists(p): Unit
              }
            }
          }
          .start()
      case g =>
        val out = g match {
          case Guarantee.EffectivelyOnce =>
            StreamOps.dedupWithinWatermark(transformed, dedupLag)
          case _ => transformed
        }
        val q = out.writeStream
          .option("checkpointLocation", checkpoint)
          .format("parquet").option("path", sinkPath)
          .start()
        g match {
          case Guarantee.EffectivelyOnce => guardEffectivelyOnce(q)
          case _ => q
        }
    }
  }
}
