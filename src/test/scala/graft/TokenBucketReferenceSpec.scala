package graft

import graft.streaming.TokenBucket
import org.scalatest.funsuite.AnyFunSuite

/**
 * Transliteration of the reference broker's token-bucket unit tests
 * (pulsar-broker/src/test/java/org/apache/pulsar/broker/qos/
 * AsyncTokenBucketTest.java:30-197) onto [[TokenBucket]] — the same
 * manual-clock schedules, the same expected balances, pause durations
 * and negative-balance (debt) behavior.
 *
 * One documented divergence in MECHANISM, none in semantics: the
 * reference retains sub-token leftovers as an integer nanos remainder;
 * we retain them as the fractional part of a double balance. Whole-
 * second schedules are bit-exact either way; the iterated 1 ms
 * schedules accumulate ≤1e-12 of floating error, so those cases assert
 * the exact expected balance within 1e-6 (far sharper than the
 * reference's truncate-to-long assertions) and only assert truncation
 * where the expected value is ≥0.5 from an integer boundary.
 */
class TokenBucketReferenceSpec extends AnyFunSuite {
  private val S = 1000000000L

  /** The reference builder shape: capacity/rate/initialTokens/clock. */
  private def bucket(capacity: Long, rate: Double, initialTokens: Double,
                     nowNanos: Long = 100 * S): TokenBucket =
    TokenBucket(rate, capacity, initialTokens, nowNanos)

  test("shouldAddTokensWithConfiguredRate (AsyncTokenBucketTest.java:51)") {
    var now = 100 * S
    var b = bucket(100, 10, 0, now)
    now += 5 * S
    assert(b.budget(now) == 50)
    now += 1 * S
    assert(b.budget(now) == 60)
    now += 4 * S
    assert(b.budget(now) == 100)
    // no matter how long the period, tokens do not go above capacity
    now += 5 * S
    assert(b.budget(now) == 100)
    // consume all, verify none available, wait one period, replenished
    b = b.consumeAndCheck(100, now)._1
    assert(b.budget(now) == 0)
    now += 1 * S
    assert(b.budget(now) == 10)
  }

  test("shouldCalculatePauseCorrectly (AsyncTokenBucketTest.java:74): debt extends the pause") {
    var now = 100 * S
    var b = bucket(100, 10, 0, now)
    now += 5 * S
    val (b2, ok) = b.consumeAndCheck(100, now)
    b = b2
    assert(!ok)
    assert(b.tokens == -50.0, "negative balance: the whole batch consumed")
    // need 1 − (−50) = 51 tokens at 10/s → 5100 ms
    assert(b.throttleNanos(now) / 1000000 == 5100)
  }

  test("shouldSupportFractions (AsyncTokenBucketTest.java:85): 100 ms at 10/s = 1 token") {
    val now = 100 * S
    val b = bucket(100, 10, 0, now)
    assert(b.budget(now + 100000000L) == 1)
  }

  test("shouldSupportFractionsAndRetainLeftover (AsyncTokenBucketTest.java:93)") {
    var now = 100 * S
    var b = bucket(100, 10, 0, now)
    // 150 × 1 ms steps: leftover fractions must RETAIN across updates
    (1 to 150).foreach { _ =>
      now += 1000000L
      b = b.refill(now)
    }
    assert(math.abs(b.tokens - 1.5) < 1e-6)
    assert(b.budget(now) == 1)
    now += 150000000L
    b = b.refill(now)
    assert(math.abs(b.tokens - 3.0) < 1e-6) // reference asserts getTokens == 3
    now += 1000000L
    b = b.refill(now)
    assert(math.abs(b.tokens - 3.01) < 1e-6)
    assert(b.budget(now) == 3)
    now += 99000000L
    b = b.refill(now)
    assert(math.abs(b.tokens - 4.0) < 1e-6)
  }

  test("shouldSupportFractionsAndRetainLeftover2 (AsyncTokenBucketTest.java:113): rate 1/s") {
    var now = 100 * S
    var b = bucket(100, 1, 0, now)
    (1 to 150).foreach { _ =>
      now += 1000000L
      b = b.refill(now)
      assert(b.budget(now) == 0)
    }
    now += 150000000L
    b = b.refill(now)
    assert(b.budget(now) == 0) // 0.3 tokens
    now += 699000000L
    b = b.refill(now)
    assert(math.abs(b.tokens - 0.999) < 1e-6)
    now += 1000000L
    b = b.refill(now)
    assert(math.abs(b.tokens - 1.0) < 1e-6) // reference: exactly 1
    now += 1000 * 1000000L
    b = b.refill(now)
    assert(math.abs(b.tokens - 2.0) < 1e-6)
  }

  test("shouldHandleNegativeBalance (AsyncTokenBucketTest.java:135): 10000 debt cycles") {
    var now = 100 * S
    var b = bucket(100, 10, 0, now)
    assert(b.budget(now) == 0)
    // consume 500 then wait 50 s (exactly the rate) — balance returns to
    // 0 every cycle, never drifting, for 10000 cycles
    (1 to 10000).foreach { _ =>
      b = b.consumeAndCheck(500, now)._1
      now += 50 * S
    }
    now += 9 * S
    assert(b.budget(now) == 90)
  }

  test("shouldNotExceedTokenBucketSizeWithNegativeTokens (AsyncTokenBucketTest.java:155)") {
    var now = 100 * S
    var b = bucket(100, 10, 0, now)
    (0 until 100).foreach { i =>
      b = b.consumeAndCheck(600, now)._1
      now += 50 * S
      if ((i + 1) % 10 == 0) now += 100 * S
    }
    now += 9 * S
    assert(b.budget(now) == 90)
  }

  test("shouldHandleEventualConsistency (AsyncTokenBucketTest.java:177): 100k 1ms/1token cycles") {
    var now = 100 * S
    var b = bucket(100000, 1000, 500, now)
    (1 to 100000).foreach { _ =>
      now += 1000000L // 1 ms at 1000/s = exactly 1 token
      b = b.consumeAndCheck(1, now)._1
    }
    assert(math.abs(b.tokens - 500.0) < 1e-3,
      s"net-zero cycles must preserve the initial balance, got ${b.tokens}")
    assert(b.budget(now) == 500)
  }
}
