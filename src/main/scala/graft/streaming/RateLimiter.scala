package graft.streaming

/**
 * Token-bucket admission for dispatch/publish rate limiting — the
 * Spark-first twin of the reference's per-topic/subscription QoS
 * (pulsar-broker/.../qos/AsyncTokenBucket.java;
 * DispatchRateLimiterAsyncTokenBucketImpl.java). SURVEY §4 previously
 * mapped rate limiting onto `maxFilesPerTrigger`/`maxBytesPerTrigger`,
 * which bounds batch SIZE but not RATE (msgs/sec with burst credit) —
 * this closes that gap (VERDICT r7 #4).
 *
 * Contract (the reference's "consistent rate" guarantee, kept testable
 * by a pure deterministic state machine — the clock is a parameter, so
 * property specs replay arbitrary schedules):
 *  - tokens accrue at `ratePerSec`, saturating at `capacity` (the burst
 *    credit: an idle subscription may dispatch up to `capacity` at once,
 *    never more);
 *  - any single acquire grants at most the available tokens, so over any
 *    window [t1, t2] the total granted ≤ rate·(t2−t1) + capacity;
 *  - long-run throughput under sustained demand converges to `ratePerSec`.
 *
 * Two admission disciplines, both offered:
 *  - [[acquire]]: classic non-negative admission (tokens ∈ [0,
 *    capacity]) — the pause happens BEFORE dispatch. Natural in a
 *    microbatch engine where the batch is already size-bounded.
 *  - [[consumeAndCheck]] + [[throttleNanos]]: the reference's EXACT
 *    discipline (AsyncTokenBucket.consumeTokensAndCheckIfContainsTokens
 *    / calculateThrottlingDuration): a dispatch batch is not
 *    splittable, so the WHOLE batch consumes unconditionally — the
 *    balance may go negative — and the debt is paid by pausing the
 *    NEXT dispatch until the balance refills past the target. Same
 *    long-run rate; overshoot bounded by one batch.
 */
final case class TokenBucket(ratePerSec: Double, capacity: Long,
                             tokens: Double, lastNanos: Long) {
  require(ratePerSec > 0, s"ratePerSec must be positive, got $ratePerSec")
  require(capacity > 0, s"capacity must be positive, got $capacity")

  /** Accrue tokens for the elapsed time, saturating at capacity. A
    * non-monotone clock (NTP step) accrues nothing rather than going
    * negative. */
  def refill(nowNanos: Long): TokenBucket = {
    val dt = math.max(0L, nowNanos - lastNanos) / 1e9
    copy(tokens = math.min(capacity.toDouble, tokens + ratePerSec * dt),
      lastNanos = nowNanos)
  }

  /** Grant up to `demand` units from the refilled balance; returns the
    * advanced bucket and the grant (0 when empty — the caller waits). */
  def acquire(demand: Long, nowNanos: Long): (TokenBucket, Long) = {
    val b = refill(nowNanos)
    val granted = math.max(0L, math.min(demand, b.tokens.toLong))
    (b.copy(tokens = b.tokens - granted), granted)
  }

  /** The microbatch budget this instant — what a polling consume loop
    * passes as its next `maxFilesPerTrigger` (after dividing by rows per
    * file): admission-by-planning rather than admission-by-blocking. */
  def budget(nowNanos: Long): Long = refill(nowNanos).tokens.toLong

  /** Reference-exact dispatch discipline
    * (AsyncTokenBucket.consumeTokensAndCheckIfContainsTokens:239): the
    * whole `demand` consumes UNCONDITIONALLY — an entry batch is not
    * splittable, so the balance may go negative (debt) — and the
    * returned flag is whether tokens remain (> 0 AFTER the consume).
    * `false` tells the dispatcher to throttle before its next read. */
  def consumeAndCheck(demand: Long, nowNanos: Long): (TokenBucket, Boolean) = {
    require(demand >= 0, s"demand must be >= 0, got $demand")
    val b = refill(nowNanos)
    val nb = b.copy(tokens = b.tokens - demand)
    (nb, nb.tokens > 0)
  }

  /** Nanos to pause until the balance refills to `required` tokens
    * (AsyncTokenBucket.calculateThrottlingDuration:264): 0 when already
    * there; a NEGATIVE balance adds its absolute value to the need —
    * the debt from the last oversized batch extends the pause. */
  def throttleNanos(nowNanos: Long, required: Long = 1L): Long = {
    val b = refill(nowNanos)
    if (b.tokens >= required) 0L
    else math.ceil((required - b.tokens) / ratePerSec * 1e9).toLong
  }
}

object TokenBucket {
  /** A bucket starting FULL — the reference's initial burst credit
    * (AsyncTokenBucket builds with tokens = capacity). */
  def full(ratePerSec: Double, capacity: Long, nowNanos: Long): TokenBucket =
    TokenBucket(ratePerSec, capacity, capacity.toDouble, nowNanos)
}
