package graft.streaming

import graft.model.Envelope
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

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
   *    ORDERED-ARRIVAL CONTRACT: the dedup window is an event-time
   *    watermark, so input must arrive roughly time-ordered across
   *    microbatches (a live subscription — per-partition FIFO — or any
   *    continuous source; disorder must stay under `dedupLag`). A
   *    catch-up REPLAY over time-unordered files advances the watermark
   *    past old rows in the first batch and DROPS them from later
   *    batches (probe-measured: 78% of a 100× unordered glob replay,
   *    `numRowsDroppedByWatermark` in the progress telemetry). The
   *    reference has the same boundary on its dedup path: a producer
   *    whose sequence ids regress beyond the snapshot horizon is
   *    dropped as duplicate (PersistentTopic dedup seq high-water). For
   *    unordered replays, either sort the replay by event time (the
   *    session-window fixture's range-file recipe) or size `dedupLag`
   *    beyond the disorder span;
   *  - AT_MOST_ONCE: ack-before-process — an atomic per-epoch ack marker
   *    is committed BEFORE the sink write, and a replayed epoch whose
   *    marker already exists is dropped, not reprocessed. A crash between
   *    ack and sink loses exactly that in-flight batch and nothing is
   *    ever delivered twice (the reference acks the message on receipt
   *    for this mode, with the same loss window).
   */
  sealed trait Guarantee
  object Guarantee {
    case object AtLeastOnce extends Guarantee
    case object EffectivelyOnce extends Guarantee
    case object AtMostOnce extends Guarantee
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
        // the ack markers live beside the checkpoint via LOCAL file IO:
        // on a remote checkpoint (hdfs://, s3a://) Paths.get would
        // silently resolve to a bogus driver-local dir, markers would
        // not survive a driver move, and the guarantee would silently
        // degrade to duplicates — fail loudly instead (extend with
        // Hadoop FS when a remote checkpoint is actually needed)
        require(!checkpoint.contains("://"),
          s"AT_MOST_ONCE ack markers require a locally-mounted " +
            s"checkpoint; got '$checkpoint'")
        transformed.writeStream
          .option("checkpointLocation", checkpoint)
          .foreachBatch { (batch: DataFrame, epochId: Long) =>
            import java.nio.file.{Files, Paths, StandardCopyOption}
            val ackDir = Paths.get(checkpoint, "_acks")
            Files.createDirectories(ackDir)
            val marker = ackDir.resolve(s"$epochId.acked")
            if (!Files.exists(marker)) {
              // ack FIRST (atomic marker), process second — the order is
              // the whole guarantee
              val tmp = ackDir.resolve(s"$epochId.tmp")
              Files.write(tmp, Array.emptyByteArray)
              Files.move(tmp, marker, StandardCopyOption.ATOMIC_MOVE)
              batch.write.mode("append").parquet(sinkPath)
            }
            // marker already present: this epoch was acked by a previous
            // attempt that died mid-process — drop it (at-most-once)
          }
          .start()
      case g =>
        val out = g match {
          case Guarantee.EffectivelyOnce =>
            StreamOps.dedupWithinWatermark(transformed, dedupLag)
          case _ => transformed
        }
        out.writeStream
          .option("checkpointLocation", checkpoint)
          .format("parquet").option("path", sinkPath)
          .start()
    }
  }
}
