package graft.pipeline

/** Orchestration policies (SURVEY §2.12 B9-B11) as pure, testable
  * functions — the driver-side glue around the distributed plans.
  */
object RunPolicies {

  /** B9: HTTP retry schedule (reference `fetcher/base.py:29-41` +
    * `MAX_RETRIES`): at most 3 retries; delay = min(2^attempt, 30) seconds,
    * a server-provided Retry-After overrides the backoff. Returns None when
    * the retry budget is exhausted. */
  def retryDelaySeconds(attempt: Int, retryAfter: Option[Int] = None,
                        maxRetries: Int = 3): Option[Int] =
    if (attempt >= maxRetries) None
    else Some(retryAfter.getOrElse(math.min(math.pow(2, attempt + 1).toInt, 30)))

  /** B10: sliding-rate ETA (reference `_update_progress_live`,
    * `ticker_batch_runner.py:27-48`): rate from completions inside the
    * window, ETA = remaining / rate. None until the window has data. */
  def etaSeconds(completionTimesSec: Seq[Double], nowSec: Double,
                 remaining: Long, windowSec: Double = 120.0): Option[Double] = {
    val inWindow = completionTimesSec.count(t => t >= nowSec - windowSec && t <= nowSec)
    if (inWindow == 0 || remaining <= 0) None
    else {
      val rate = inWindow / windowSec // completions per second
      Some(remaining / rate)
    }
  }

  /** B11: process exit policy (reference `ticker_batch_runner.py:624`) —
    * exit 1 iff any task FAILED; flagged rows never fail the run. */
  def exitCode(stats: graft.sinks.Sinks.RunStats): Int =
    if (stats.failed > 0) 1 else 0
}
