package graft

import graft.functions.Murmur3Pulsar
import org.apache.spark.sql.functions._

/**
 * pulsar_hash must equal Guava murmur3_32 (the public algorithm the
 * reference's Murmur3_32Hash.java implements) masked to non-negative.
 */
class PulsarHashSpec extends SparkSpec {

  private def guava(bytes: Array[Byte]): Int =
    com.google.common.hash.Hashing.murmur3_32_fixed()
      .hashBytes(bytes).asInt() & Integer.MAX_VALUE

  test("matches guava murmur3_32 on random byte arrays (all tail lengths)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 2000) {
      val arr = new Array[Byte](rnd.nextInt(40))
      rnd.nextBytes(arr)
      assert(Murmur3Pulsar.hashBytes(arr) == guava(arr))
    }
  }

  test("matches guava murmur3_32 on UTF-8 strings incl. multibyte") {
    for (s <- Seq("", "a", "ab", "abc", "abcd", "abcde", "user-123",
                  "日本語キー", "ключ", "🎯🎯🎯")) {
      assert(Murmur3Pulsar.hashBytes(s.getBytes("UTF-8")) ==
        guava(s.getBytes("UTF-8")), s"mismatch for '$s'")
    }
  }

  test("Catalyst expression (codegen path) agrees with Scala impl") {
    import spark.implicits._
    val keys = (0 until 1000).map(i => s"key-$i")
    val viaExpr = keys.toDF("k")
      .select(Murmur3Pulsar.pulsar_hash(col("k")).as("h"))
      .as[Int].collect()
    val direct = keys.map(k => Murmur3Pulsar.hashBytes(k.getBytes("UTF-8")))
    assert(viaExpr.toSeq == direct)
  }

  test("hashInt equals hashBytes of the int's little-endian bytes") {
    val rnd = new scala.util.Random(11)
    for (k <- Seq(0, 1, 5, 65536, 31 * 65536 + 63, Int.MaxValue, -1) ++
              Seq.fill(500)(rnd.nextInt())) {
      val le = Array[Byte](k.toByte, (k >> 8).toByte, (k >> 16).toByte, (k >> 24).toByte)
      assert(Murmur3Pulsar.hashInt(k) == Murmur3Pulsar.hashBytes(le), s"k=$k")
    }
  }

  test("hash is non-negative; slot in [0, 65536)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 2000) {
      val h = Murmur3Pulsar.hashBytes(
        rnd.nextString(rnd.nextInt(20)).getBytes("UTF-8"))
      assert(h >= 0)
      val slot = h % Murmur3Pulsar.HashRangeSize
      assert(slot >= 0 && slot < 65536)
    }
  }
}
