package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Windowing parity with the Pulsar Functions windowing engine
 * (pulsar-functions/instance/.../windowing/WindowManager.java:37-330;
 * config WindowConfig.java:33-51: windowLengthCount/DurationMs,
 * slidingIntervalCount/DurationMs, maxLagMs, lateDataTopic).
 *
 * Time windows map straight onto Spark's `window()` + `withWatermark`
 * (WaterMarkEventGenerator.java:43 computes min-across-partitions − maxLag,
 * exactly Spark's watermark). Count windows have no Spark primitive —
 * batch uses a rank-chunk aggregation; streaming buffers per key in
 * flatMapGroupsWithState (SURVEY.md §7.4 hard part).
 */
object Windows {

  /** Tumbling event-time window aggregate (TimeTriggerPolicy + duration). */
  def tumbling(df: DataFrame, tsCol: String, length: String,
               keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(window(col(tsCol), length) +: keys: _*).agg(aggs.head, aggs.tail: _*)

  /** Sliding (hopping) event-time window aggregate. */
  def sliding(df: DataFrame, tsCol: String, length: String, slide: String,
              keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.groupBy(window(col(tsCol), length, slide) +: keys: _*).agg(aggs.head, aggs.tail: _*)

  /** Session windows (inactivity gap) — batch or streaming input. On a
    * stream, pair with `withWatermark` upstream (or use `maxLag` here)
    * and Append output: a session fires once the watermark passes its
    * last event + gap, and events arriving within the gap MERGE into the
    * open session across microbatches (Spark's native session merge). */
  def session(df: DataFrame, tsCol: String, gap: String,
              keys: Seq[Column], aggs: Seq[Column],
              maxLag: Option[String] = None): DataFrame = {
    val in = maxLag.fold(df)(df.withWatermark(tsCol, _))
    in.groupBy(session_window(col(tsCol), gap) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /**
   * Batch count-based tumbling windows (CountTriggerPolicy.java:34 +
   * CountEvictionPolicy): per key, rows are grouped into consecutive
   * chunks of `count` in arrival (offset) order; each full chunk is one
   * window. The trailing partial chunk has not triggered yet and is
   * excluded — matching WindowManager, which only fires on the count
   * threshold.
   */
  def countTumblingBatch(df: DataFrame, keyCol: String, orderCol: String,
                         windowSize: Int, aggs: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(orderCol)
    val chunked = df
      .withColumn("_rn", row_number().over(w) - 1)
      .withColumn("window_id", floor(col("_rn") / windowSize).cast("long"))
    chunked
      .groupBy(col(keyCol), col("window_id"))
      .agg(count(lit(1)).as("_n"), aggs: _*)
      .filter(col("_n") === windowSize)
      .drop("_n")
  }

  /**
   * Batch sliding count windows (WindowConfig windowLengthCount +
   * slidingIntervalCount; CountTriggerPolicy fires every `slide` rows,
   * CountEvictionPolicy keeps the last `length` rows): per key, a window
   * fires at every `slide`-th arrival and aggregates the most recent
   * `length` rows. One pass: rank rows per key, compute the frame
   * aggregate ROWS BETWEEN length-1 PRECEDING AND CURRENT ROW, keep
   * trigger rows — no self-join, no buffering.
   */
  def countSlidingBatch(df: DataFrame, keyCol: String, orderCol: String,
                        length: Int, slide: Int, valueCol: String): DataFrame = {
    val byKey = Window.partitionBy(keyCol).orderBy(orderCol)
    val frame = byKey.rowsBetween(-(length - 1), 0)
    df.withColumn("_rn", row_number().over(byKey))
      .withColumn("w_count", count(lit(1)).over(frame))
      .withColumn("w_sum", sum(col(valueCol)).over(frame))
      .withColumn("w_max", max(col(valueCol)).over(frame))
      .filter(col("_rn") % slide === 0 && col("w_count") === length)
      .withColumn("trigger_id", (col("_rn") / slide).cast("long"))
      .drop("_rn")
  }

  /** Late-row split relative to an explicit watermark timestamp:
   * (onTime, late). Reference routes late rows to `lateDataTopic`
   * (WindowConfig.java:41); Spark drops them, so the side output is an
   * explicit fork — in streaming do this inside foreachBatch against
   * `lastProgress.eventTime.watermark`. */
  def lateDataSplit(df: DataFrame, tsCol: String, watermark: Column): (DataFrame, DataFrame) =
    (df.filter(col(tsCol) >= watermark), df.filter(col(tsCol) < watermark))

  // ---------------------------------------------------------------------
  // Streaming count windows (flatMapGroupsWithState)
  // ---------------------------------------------------------------------

  /** Buffered per-key state for streaming count windows. */
  case class CountWindowState(buffer: List[Double], windowsFired: Long)
  case class CountWindowFired(key: String, windowId: Long, n: Int,
                              sum: Double, min: Double, max: Double)

  /**
   * Streaming count-tumbling window over (key, value) rows: fires an
   * aggregate every `count` rows per key, buffering the remainder in
   * group state — the WindowManager.add:103 / onTrigger:204 loop as a
   * Spark state function. Works under OutputMode.Append.
   */
  def countTumblingStream(ds: Dataset[(String, Double)], count: Int): Dataset[CountWindowFired] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[CountWindowState, CountWindowFired](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key, rows, state: GroupState[CountWindowState]) =>
          val prev = state.getOption.getOrElse(CountWindowState(Nil, 0L))
          var buf = prev.buffer
          var fired = prev.windowsFired
          val out = scala.collection.mutable.ListBuffer[CountWindowFired]()
          rows.foreach { case (_, v) =>
            buf = buf :+ v
            if (buf.size >= count) {
              val w = buf.take(count)
              out += CountWindowFired(key, fired, count, w.sum, w.min, w.max)
              fired += 1
              buf = buf.drop(count)
            }
          }
          state.update(CountWindowState(buf, fired))
          out.iterator
      }
  }

  /**
   * Streaming sliding count windows (windowLengthCount +
   * slidingIntervalCount): keep the last `length` values per key in
   * state; every `slide`-th arrival fires an aggregate over the buffer —
   * WindowManager's count trigger + count eviction as one state function.
   */
  def countSlidingStream(ds: Dataset[(String, Double)], length: Int,
                         slide: Int): Dataset[CountWindowFired] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .flatMapGroupsWithState[CountWindowState, CountWindowFired](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (key, rows, state: GroupState[CountWindowState]) =>
          val prev = state.getOption.getOrElse(CountWindowState(Nil, 0L))
          var buf = prev.buffer
          var arrivals = prev.windowsFired // reused as arrival counter
          val out = scala.collection.mutable.ListBuffer[CountWindowFired]()
          rows.foreach { case (_, v) =>
            buf = (buf :+ v).takeRight(length) // count eviction
            arrivals += 1
            if (arrivals % slide == 0 && buf.size == length)
              out += CountWindowFired(key, arrivals / slide, length,
                buf.sum, buf.min, buf.max)
          }
          state.update(CountWindowState(buf, arrivals))
          out.iterator
      }
  }

  /** Keyed counter state (BaseContext.incrCounter:161-187) as a streaming
   * aggregation — counters are just a running grouped count/sum. */
  def counters(df: DataFrame, keyCol: String): DataFrame =
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("counter"))
}
