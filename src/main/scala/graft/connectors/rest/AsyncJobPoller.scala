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

  /** Poll many already-submitted jobs on ONE shared timeline. Each job
    * keeps its own backoff interval, started flag and timeout discipline —
    * its check instants are identical to what [[await]] would produce —
    * but the sleeps are shared: the loop always sleeps to the EARLIEST due
    * poll among the pending jobs, so the fan-out's wall-clock is
    * max(per-job schedule), not Σ over jobs. (The reference polls its
    * report jobs serially, sources/facebook_ads/__init__.py:120-220 —
    * this is the submit-all-then-poll improvement on that.)
    *
    * Returns one result per input job, in input order.
    */
  def awaitAll[K](
      jobs: Seq[(K, () => JobStatus)],
      cfg: PollConfig = PollConfig(),
      sleeper: Long => Unit = Thread.sleep,
      clock: () => Long = System.currentTimeMillis,
  ): Seq[(K, Either[String, String])] = {
    final class St(val key: K, val check: () => JobStatus) {
      var interval: Long = cfg.initialIntervalMs
      var started = false
      var nextDue: Long = clock() // first poll immediate, like await
      var result: Option[Either[String, String]] = None
    }
    val t0 = clock()
    val states = jobs.map { case (k, c) => new St(k, c) }
    while (states.exists(_.result.isEmpty)) {
      val pending = states.filter(_.result.isEmpty)
      val now = clock()
      val due = pending.filter(_.nextDue <= now)
      if (due.isEmpty) {
        // one shared sleep to the earliest due poll — every other pending
        // job's wait rides the same sleep
        sleeper(math.max(1L, pending.map(_.nextDue).min - now))
      } else due.foreach { st =>
        st.check() match {
          case Completed(ref) => st.result = Some(Right(ref))
          case Failed(reason) => st.result = Some(Left(reason))
          case status =>
            if (status == Running) st.started = true
            val elapsed = clock() - t0
            if (!st.started && elapsed > cfg.startTimeoutMs)
              st.result = Some(Left(s"job did not start within ${cfg.startTimeoutMs} ms"))
            else if (elapsed > cfg.completionTimeoutMs)
              st.result = Some(Left(s"job did not complete within ${cfg.completionTimeoutMs} ms"))
            else {
              st.nextDue = clock() + st.interval
              st.interval = math.min((st.interval * cfg.backoffFactor).toLong, cfg.maxIntervalMs)
            }
        }
      }
    }
    states.map(st => st.key -> st.result.get)
  }
}
