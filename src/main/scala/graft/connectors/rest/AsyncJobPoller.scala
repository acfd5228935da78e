package graft.connectors.rest

/** Async report-job orchestration with exponential poll backoff — the
  * facebook-ads insights pattern (sources/facebook_ads/helpers.py:134-180:
  * 10 s initial poll, ×2 backoff capped at 300 s, 5 min start timeout /
  * 30 min completion timeout). Driver-side by design: jobs are remote
  * server work; the cluster only sees the finished report pages.
  */
object AsyncJobPoller {

  sealed trait JobStatus
  case object Pending extends JobStatus
  case object Running extends JobStatus
  final case class Completed(resultRef: String) extends JobStatus
  final case class Failed(reason: String) extends JobStatus

  final case class PollConfig(
      initialIntervalMs: Long = 10000,
      backoffFactor: Double = 2.0,
      maxIntervalMs: Long = 300000,
      startTimeoutMs: Long = 5 * 60 * 1000,
      completionTimeoutMs: Long = 30 * 60 * 1000,
  )

  /** Poll `check` until Completed/Failed under the timeout discipline:
    * a job that never leaves Pending within startTimeout fails fast;
    * a Running job gets the full completion timeout.
    */
  def await(
      check: () => JobStatus,
      cfg: PollConfig = PollConfig(),
      sleeper: Long => Unit = Thread.sleep,
      clock: () => Long = System.currentTimeMillis,
  ): Either[String, String] = {
    val t0 = clock()
    var interval = cfg.initialIntervalMs
    var started = false
    while (true) {
      check() match {
        case Completed(ref) => return Right(ref)
        case Failed(reason) => return Left(reason)
        case status =>
          if (status == Running) started = true
          val elapsed = clock() - t0
          if (!started && elapsed > cfg.startTimeoutMs)
            return Left(s"job did not start within ${cfg.startTimeoutMs} ms")
          if (elapsed > cfg.completionTimeoutMs)
            return Left(s"job did not complete within ${cfg.completionTimeoutMs} ms")
          sleeper(interval)
          interval = math.min((interval * cfg.backoffFactor).toLong, cfg.maxIntervalMs)
      }
    }
    Left("unreachable")
  }
}
