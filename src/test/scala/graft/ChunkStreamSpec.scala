package graft

import graft.operators.Chunking
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/**
 * Streaming chunk reassembly (reference ConsumerImpl.processMessageChunk
 * + MessageChunkingTest): partial groups buffer across microbatches,
 * each payload emits exactly once, duplicate chunks are idempotent.
 */
class ChunkStreamSpec extends SparkSpec {
  import spark.implicits._

  private def run(batches: Seq[Seq[(String, Int, Int, String)]],
                  incompleteTimeout: Option[String] = None): Seq[(String, String)] = {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Int, Int, String)]
    val chunks = mem.toDF()
      .toDF("chunk_uuid", "chunk_id", "num_chunks", "chunk_bytes")
    val out = Chunking.reassembleStream(chunks, incompleteTimeout = incompleteTimeout)
    val name = "chunk_stream_" + java.lang.Long.toHexString(System.nanoTime())
    val ckpt = java.nio.file.Files.createTempDirectory("graft-chunkstream-ckpt")
    val q = out.writeStream.format("memory").outputMode("append")
      .queryName(name).option("checkpointLocation", ckpt.toString).start()
    try {
      // deadline-poll on consumed-row progress instead of
      // processAllAvailable: with ProcessingTimeTimeout registered
      // state the engine keeps scheduling timeout-check batches and
      // processAllAvailable's no-new-data latch never fires
      var added = 0L
      batches.foreach { b =>
        mem.addData(b: _*); added += b.size
        val deadline = System.nanoTime() + 30_000_000_000L
        def consumed = q.recentProgress.map(_.numInputRows).sum
        while (consumed < added && System.nanoTime() < deadline)
          Thread.sleep(50)
        assert(consumed >= added, s"stream did not consume batch within 30s")
      }
      Thread.sleep(300) // let the final sink commit land
      spark.table(name).as[(String, String)].collect().toSeq.sorted
    } finally {
      q.stop()
      spark.catalog.dropTempView(name): Unit
    }
  }

  test("groups split across batches buffer in state and emit once, complete") {
    val out = run(Seq(
      Seq(("a", 0, 3, "AA"), ("b", 0, 2, "B0"), ("b", 1, 2, "B1")),
      Seq(("a", 2, 3, "CC")),         // still incomplete — chunk 1 missing
      Seq(("a", 1, 3, "BB"))))        // completes out of order
    assert(out == Seq(("a", "AABBCC"), ("b", "B0B1")))
  }

  test("duplicate chunks (redelivery) are idempotent before completion") {
    val out = run(Seq(
      Seq(("x", 0, 2, "L")),
      Seq(("x", 0, 2, "L"), ("x", 1, 2, "R"))))
    assert(out == Seq(("x", "LR")))
  }

  test("with a timeout, a FULL redelivery of a completed group emits nothing twice") {
    // at-least-once upstream can redeliver every chunk of an already-
    // emitted group; the emitted tombstone absorbs them for one timeout
    // window instead of rebuilding state and double-emitting
    val group = Seq(("t", 0, 2, "A"), ("t", 1, 2, "B"))
    val out = run(Seq(group, group, group),
      incompleteTimeout = Some("10 minutes"))
    assert(out == Seq(("t", "AB")))
  }

  test("incomplete groups never emit") {
    val out = run(Seq(Seq(("y", 0, 3, "Y0"), ("y", 1, 3, "Y1"))))
    assert(out.isEmpty)
  }

  test("stream twin equals batch reassemble on a scattered fixture") {
    val payloads = Seq(("u1", "hello-world"), ("u2", "xyz"), ("u3", "0123456789abcdef"))
      .toDF("id", "payload")
    val chunks = Chunking.split(payloads, "payload", chunkSize = 4, uuidCols = Seq("id"))
      .select("chunk_uuid", "chunk_id", "num_chunks", "chunk_bytes")
      .as[(String, Int, Int, String)].collect().toSeq
    // scatter by chunk_id parity — no batch carries a whole group
    val out = run(Seq(chunks.filter(_._2 % 2 == 0), chunks.filter(_._2 % 2 == 1)))
    val batch = Chunking.reassemble(
      chunks.toDF("chunk_uuid", "chunk_id", "num_chunks", "chunk_bytes"))
      .orderBy("chunk_uuid").as[(String, String)].collect().toSeq
    assert(out == batch)
    assert(out.map(_._2) == Seq("hello-world", "xyz", "0123456789abcdef"))
  }
}
