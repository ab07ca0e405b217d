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
 * Divergence from the reference, on purpose: AsyncTokenBucket lets the
 * balance go NEGATIVE (it admits an oversized batch, then pays the debt
 * by pausing). In a microbatch engine the batch is already bounded by
 * `maxFilesPerTrigger`, so classic non-negative admission gives the same
 * long-run rate with a simpler invariant (tokens ∈ [0, capacity]) — the
 * pause happens BEFORE dispatch instead of after.
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
}

object TokenBucket {
  /** A bucket starting FULL — the reference's initial burst credit
    * (AsyncTokenBucket builds with tokens = capacity). */
  def full(ratePerSec: Double, capacity: Long, nowNanos: Long): TokenBucket =
    TokenBucket(ratePerSec, capacity, capacity.toDouble, nowNanos)
}
