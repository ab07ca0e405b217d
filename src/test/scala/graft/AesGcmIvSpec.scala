package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.AesGcm

/**
 * GCM IV uniqueness is structural, not probabilistic-per-JVM (round-14
 * ADVICE): every thread seeds its own 96-bit IV state (4-byte fixed
 * field + random-start 8-byte counter) from SecureRandom, so IV
 * sequences from distinct threads — a fortiori distinct executor JVMs —
 * can only collide if 32 fixed bits match AND 64-bit counter windows
 * overlap (~2n/2^96 per pair).
 */
class AesGcmIvSpec extends AnyFunSuite {

  private def ivOf(ct: Array[Byte]): Seq[Byte] = ct.take(12).toSeq

  test("distinct threads draw distinct per-thread IV states") {
    val n = 64
    val ivs = new java.util.concurrent.ConcurrentLinkedQueue[Seq[Byte]]()
    val threads = (1 to n).map { _ =>
      new Thread(() => ivs.add(AesGcm.peekIv().toSeq))
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val all = ivs.toArray(Array.empty[Seq[Byte]]).toSeq
    assert(all.size == n)
    assert(all.distinct.size == n, "two threads drew the same 96-bit IV state")
    // the fixed fields themselves vary per thread (not one per-JVM value)
    val fixedFields = all.map(_.take(4)).distinct
    assert(fixedFields.size > 1, "fixed field looks per-JVM, not per-thread")
  }

  test("within one thread the IV counter advances by exactly 1 per encryption") {
    val key = "0123456789abcdef".getBytes("UTF-8")
    val ivs = (1 to 5).map { i =>
      val ct = AesGcm.encrypt(s"payload-$i".getBytes("UTF-8"), key)
      ct.take(12)
    }
    // fixed field constant within the thread
    assert(ivs.map(_.take(4).toSeq).distinct.size == 1)
    def lo64(iv: Array[Byte]): BigInt =
      iv.drop(4).foldLeft(BigInt(0))((acc, b) => (acc << 8) | (b & 0xff))
    val counters = ivs.map(lo64)
    counters.sliding(2).foreach { case Seq(a, b) =>
      assert((b - a).mod(BigInt(2).pow(64)) == 1, s"counter stepped $a -> $b")
    }
    // and no IV ever repeats
    assert(ivs.map(_.toSeq).distinct.size == ivs.size)
  }

  test("peekIv does not consume the counter") {
    val key = "0123456789abcdef".getBytes("UTF-8")
    val peeked = AesGcm.peekIv().toSeq
    val used = ivOf(AesGcm.encrypt("x".getBytes("UTF-8"), key))
    assert(peeked == used, "peek must show the IV the next encryption will use")
  }
}
