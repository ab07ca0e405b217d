package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Event-time as-of join: each left row is matched with the most recent
 * right row at-or-before its timestamp on the same key — the reference's
 * "latest value as of time T" read pattern (TableView snapshot semantics
 * combined with seek-by-timestamp,
 * reference pulsar-client-api/.../api/TableView.java:30,
 * pulsar-client-api/.../api/Consumer.java seek(long timestamp)) expressed
 * as a relational operator over whole tables at once.
 *
 * Scale design (100 TB): implemented as UNION + ONE WINDOW PASS, not a
 * join. Both sides shuffle once on the key and sort once by
 * (ts, side, seq); a running last_value(..., ignoreNulls) carries the
 * latest right payload forward into each left row. There is no join
 * explosion and no per-row probe — total cost is the single Exchange +
 * Sort any time-ordered merge needs, and it is skew-tolerant: a hot key
 * costs one sorted partition scan, never a quadratic blowup.
 *
 * Determinism at ties: right rows order BEFORE left rows at equal ts
 * (the match is inclusive), and among right rows with equal ts the
 * largest `rightSeq` wins — the same "latest sequence id at a timestamp"
 * rule the reference's cursor seek applies.
 */
object AsOfJoin {

  sealed trait Direction
  object Direction {
    /** Most recent right row at-or-before leftTs (the default). */
    case object Backward extends Direction
    /** Earliest right row at-or-after leftTs. */
    case object Forward extends Direction
    /** Smaller |leftTs − rightTs| of the two; backward wins exact ties
      * (pandas merge_asof direction="nearest" parity). */
    case object Nearest extends Direction
  }

  /**
   * As-of join, backward (most-recent-at-or-before) by default or
   * forward (earliest-at-or-after).
   *
   * @param left      probe side; all its columns survive
   * @param right     reference side
   * @param keys      equi-key column names present on both sides
   * @param leftTs    left event-time column name
   * @param rightTs   right event-time column name
   * @param rightSeq  right tie-break column: at equal ts the LARGER seq
   *                  wins backward (latest writer), the SMALLER wins
   *                  forward (first writer) — both deterministic
   * @param payload   right columns to expose on matches
   * @param tolerance max allowed age |leftTs - rightTs| (in the ts
   *                  column's native unit — seconds for timestamps);
   *                  staler matches become no-match. None = unbounded.
   * @param direction [[Direction.Backward]], [[Direction.Forward]] or
   *                  [[Direction.Nearest]]
   * @return left rows plus a `matched` struct of
   *         (rightTs, rightSeq, payload...) — NULL when no match
   *         (left-outer semantics)
   */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String, rightSeq: String,
           payload: Seq[String], tolerance: Option[Column] = None,
           direction: Direction = Direction.Backward): DataFrame = {
    val payloadCols = (Seq(rightTs, rightSeq) ++ payload).distinct
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("__ts"),
        lit(0).as("__side"),
        col(rightSeq).cast("long").as("__seq"),
        struct(payloadCols.map(col): _*).as("__payload")): _*)
    val l = left.select(
      left.columns.map(col) ++ Seq(
        col(leftTs).as("__ts"),
        lit(1).as("__side"),
        lit(0L).as("__seq"),
        lit(null).cast(r.schema("__payload").dataType).as("__payload")): _*)
    // One sorted pass per direction: backward scans time ascending and
    // the running last_value is the latest right at-or-before; forward
    // scans time DESCENDING so the running last_value is the earliest
    // right at-or-after. Right rows order before left rows at equal ts
    // (the match is inclusive); the seq sort makes the winner at equal
    // right ts the last one scanned. Nearest evaluates BOTH passes over
    // the same union — same key partitioning, so Catalyst plans one
    // Exchange with two Sort+Window pairs, still no join.
    def pass(dir: Direction): Window.type => Column = _ => {
      val w = (dir match {
        case Direction.Backward => Window.partitionBy(keys.map(col): _*)
          .orderBy(col("__ts").asc, col("__side").asc, col("__seq").asc)
        case _ => Window.partitionBy(keys.map(col): _*)
          .orderBy(col("__ts").desc, col("__side").asc, col("__seq").desc)
      }).rowsBetween(Window.unboundedPreceding, Window.currentRow)
      last(col("__payload"), ignoreNulls = true).over(w)
    }
    def age(dir: Direction, m: Column): Column = dir match {
      case Direction.Forward =>
        m.getField(rightTs).cast("double") - col("__ts").cast("double")
      case _ =>
        col("__ts").cast("double") - m.getField(rightTs).cast("double")
    }
    def valid(dir: Direction, m: Column): Column = tolerance match {
      case Some(tol) => m.isNotNull && age(dir, m) <= tol.cast("double")
      case None => m.isNotNull
    }
    val union = l.unionByName(r, allowMissingColumns = true)
    val carried = direction match {
      case Direction.Nearest =>
        val withBoth = union
          .withColumn("__mb", pass(Direction.Backward)(Window))
          .withColumn("__mf", pass(Direction.Forward)(Window))
          .filter(col("__side") === 1)
        val mb = col("__mb"); val mf = col("__mf")
        val pickBackward = valid(Direction.Backward, mb) &&
          (!valid(Direction.Forward, mf) ||
            age(Direction.Backward, mb) <= age(Direction.Forward, mf))
        withBoth
          .withColumn("matched",
            when(pickBackward, mb).when(valid(Direction.Forward, mf), mf))
          .drop("__mb", "__mf")
      case dir =>
        union
          .withColumn("__match", pass(dir)(Window))
          .filter(col("__side") === 1)
          .withColumn("matched",
            when(valid(dir, col("__match")), col("__match")))
          .drop("__match")
    }
    carried.drop("__ts", "__side", "__seq", "__payload")
  }
}
