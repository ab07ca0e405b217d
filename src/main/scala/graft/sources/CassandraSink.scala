package graft.sources

import graft.log.TopicLog
import org.apache.spark.sql.Row
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Topic → Cassandra sink (reference pulsar-io/cassandra/.../
 * CassandraAbstractSink.java:60 open/write: cluster connect, prepared
 * INSERT of (key, payload), async execute per record). The testable
 * substance: CQL statement shaping with identifier validation, bound
 * parameters (never literal interpolation — same injection stance as
 * the JDBC sink), tombstone → DELETE routing, and SINGLE-PARTITION
 * UNLOGGED BATCH grouping — consecutive mutations for the SAME key
 * (same Cassandra partition) batch atomically, which is the one batch
 * shape Cassandra recommends; cross-partition batches are an
 * anti-pattern and are never emitted. The wire is a pluggable
 * `transport: (cql, boundParams) => Unit`.
 *
 * Scale shape: identical to the other sinks — HW-filtered foreachBatch,
 * repartition by key + offset order within partitions (so same-key runs
 * ARE consecutive), executors write in parallel.
 */
object CassandraSink {

  /** Unquoted CQL identifiers: `[a-zA-Z][a-zA-Z0-9_]*` (the server
    * lowercases them; names needing quoting are rejected loudly — the
    * JDBC-sink allowlist stance). */
  private[graft] def checkIdentifier(id: String): String = {
    require(id != null && id.matches("[A-Za-z][A-Za-z0-9_]*") && id.length <= 48,
      s"illegal CQL identifier '$id'")
    id
  }

  /** Every mutation carries an explicit USING TIMESTAMP bound to the
    * row's topic OFFSET: inside an UNLOGGED BATCH Cassandra assigns ONE
    * shared timestamp to all statements, and at equal timestamps a
    * tombstone beats a later insert regardless of statement order — a
    * delete-then-reinsert of a key inside one batch would resolve to
    * deleted. Offset-derived timestamps also make replay idempotent
    * (same row → same timestamp → a replayed write can't regress a
    * newer state). The sink owns the table by contract, so the offset
    * domain never competes with wall-clock writers. */
  private[graft] def insertCql(keyspace: String, table: String,
                               keyCol: String, valueCol: String): String =
    s"INSERT INTO ${checkIdentifier(keyspace)}.${checkIdentifier(table)} " +
      s"(${checkIdentifier(keyCol)}, ${checkIdentifier(valueCol)}) VALUES (?, ?) " +
      s"USING TIMESTAMP ?"

  private[graft] def deleteCql(keyspace: String, table: String,
                               keyCol: String): String =
    s"DELETE FROM ${checkIdentifier(keyspace)}.${checkIdentifier(table)} " +
      s"USING TIMESTAMP ? " +
      s"WHERE ${checkIdentifier(keyCol)} = ?"

  /** A single-partition atomic batch: every statement binds the same
    * key. Emitted only for runs of length ≥ 2. */
  private[graft] def batchCql(statements: Seq[String]): String =
    statements.mkString("BEGIN UNLOGGED BATCH\n", ";\n", ";\nAPPLY BATCH")

  /**
   * Stream the topic into Cassandra. Consecutive mutations of one key
   * (they ARE consecutive — the batch repartitions by key and sorts by
   * offset) group into one single-partition UNLOGGED BATCH, so a key's
   * updates within a microbatch apply atomically and in order; distinct
   * keys execute as independent statements.
   */
  def topicToCassandraSink(topic: TopicLog, keyspace: String, table: String,
                           keyCol: String, valueCol: String,
                           transport: (String, Seq[String]) => Unit,
                           checkpoint: String): StreamingQuery = {
    // identifier validation happens here, at wiring time — not first batch
    val ins = insertCql(keyspace, table, keyCol, valueCol)
    val del = deleteCql(keyspace, table, keyCol)
    // groupKeyRuns: a key's rows must be CONSECUTIVE so its microbatch
    // updates fold into one atomic single-partition UNLOGGED BATCH
    SinkHarness.startKeyed(topic, checkpoint, groupKeyRuns = true) { rows =>
      flushPartition(rows, ins, del, transport)
    }
  }

  /** Executor-side writer: runs of one key → one atomic batch. */
  private def flushPartition(rows: Iterator[Row], ins: String, del: String,
                             transport: (String, Seq[String]) => Unit): Unit = {
    val run = new scala.collection.mutable.ArrayBuffer[(String, Seq[String])]
    var runKey: String = null
    def flush(): Unit = {
      if (run.length == 1) transport(run.head._1, run.head._2)
      else if (run.length > 1)
        transport(batchCql(run.map(_._1).toSeq), run.flatMap(_._2).toSeq)
      run.clear()
    }
    rows.foreach { r =>
      val (key, value) = (r.getString(0), r.getString(1))
      val ts = r.getLong(2).toString // offset → explicit write timestamp
      if (key != null) { // cassandra: partition key can't be null
        if (key != runKey) { flush(); runKey = key }
        run += (if (value == null) (del, Seq(ts, key))
          else (ins, Seq(key, value, ts)))
      }
    }
    flush()
  }
}
