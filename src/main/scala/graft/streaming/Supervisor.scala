package graft.streaming

import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryException}

/** The reference's process babysitter (`scripts/hypervisor.c:161-246`) as
  * an engine concern: restart a streaming query that DIES, resuming from
  * its own checkpoint, with the hypervisor's doubling backoff ladder
  * (`ssec = min(ssec << 1, MAXINTERVAL)`, reset to the base interval
  * after a run that survived long enough to be called healthy; base 5 s,
  * cap 180 s in the reference — both scaled by `backoffUnitMs` here so
  * harnesses don't sleep wall-clock minutes).
  *
  * Safe by construction, which is why this is a LOOP and not a saga:
  * every write path is an idempotent MERGE (K1) and the engine checkpoint
  * commits only after the batch's segments acked (T8), so the crashed
  * batch replays on restart and converges — the same at-least-once ×
  * idempotence contract the reference relies on when the hypervisor
  * revives a dead collector mid-batch.
  *
  * A query that terminates CLEANLY ends supervision (the hypervisor's
  * normal-exit path); `maxRestarts` consecutive failures exhaust the
  * ladder and supervision gives up with the last error recorded —
  * reported, never silently swallowed.
  */
object Supervisor {

  /** @param restarts  total restarts consumed (0 = first run terminated cleanly)
    * @param gaveUp    true when maxRestarts CONSECUTIVE failures exhausted
    *                  the ladder
    * @param lastError message of the final failure (gave-up runs), if any
    */
  case class Report(restarts: Int, gaveUp: Boolean, lastError: Option[String])

  /** @param healthyAfterMs a run that survives at least this long before
    *   failing counts as recovered: the consecutive-failure counter and
    *   the backoff ladder reset to base (hypervisor.c's `ssec = INTERVAL`
    *   reset arm) — an isolated daily crash never exhausts maxRestarts.
    *   Defaults to a FIXED 60 s, deliberately NOT scaled by
    *   `backoffUnitMs`: a harness that shrinks the sleep ladder to
    *   milliseconds must not also shrink the health bar below real
    *   streaming wall-clock, or every crash would count as "recovered"
    *   and a persistently-failing query would restart forever.
    * @param maxTotalRestarts absolute backstop independent of the
    *   consecutive counter (default 20× maxRestarts): even a query whose
    *   attempts each outlive healthyAfterMs before dying cannot loop
    *   unboundedly — supervision gives up once the lifetime budget is
    *   spent, mirroring an operator eventually paging out a flapping
    *   process the hypervisor alone would revive forever.
    */
  def supervise(start: () => StreamingQuery, maxRestarts: Int = 10,
      backoffUnitMs: Long = 5000L, maxBackoffMs: Long = 180000L,
      healthyAfterMs: Long = -1L, maxTotalRestarts: Int = -1): Report = {
    val healthyMs = if (healthyAfterMs >= 0) healthyAfterMs else 60000L
    val totalCap = if (maxTotalRestarts >= 0) maxTotalRestarts else maxRestarts * 20
    var restarts = 0
    var consecutive = 0
    var backoff = backoffUnitMs
    var last: Option[String] = None
    while (true) {
      val t0 = System.nanoTime()
      val q = start()
      try {
        q.awaitTermination()
        return Report(restarts, gaveUp = false, last)
      } catch {
        case e: StreamingQueryException =>
          last = Some(Option(e.getMessage).getOrElse(e.toString))
          val ranMs = (System.nanoTime() - t0) / 1000000L
          if (ranMs >= healthyMs) { consecutive = 0; backoff = backoffUnitMs }
          if (consecutive >= maxRestarts || restarts >= totalCap)
            return Report(restarts, gaveUp = true, last)
          restarts += 1
          consecutive += 1
          Thread.sleep(backoff)
          backoff = math.min(backoff << 1, maxBackoffMs)
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
