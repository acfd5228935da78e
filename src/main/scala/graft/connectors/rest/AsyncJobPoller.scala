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

  /** ONE per-check transition, shared by [[await]] and [[awaitAll]] so
    * the timeout discipline and its messages can never diverge between
    * the serial and fan-out paths: Some(result) if the job resolved
    * (Completed / Failed / timed out), None if it should be polled again.
    */
  private def resolve(status: JobStatus, started: Boolean, elapsed: Long,
      cfg: PollConfig): Option[Either[String, String]] = status match {
    case Completed(ref) => Some(Right(ref))
    case Failed(reason) => Some(Left(reason))
    case _ =>
      if (!started && elapsed > cfg.startTimeoutMs)
        Some(Left(s"job did not start within ${cfg.startTimeoutMs} ms"))
      else if (elapsed > cfg.completionTimeoutMs)
        Some(Left(s"job did not complete within ${cfg.completionTimeoutMs} ms"))
      else None
  }

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
      val status = check()
      if (status == Running) started = true
      resolve(status, started, clock() - t0, cfg) match {
        case Some(r) => return r
        case None =>
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
      var lastError: String = null
      def reschedule(): Unit = {
        nextDue = clock() + interval
        interval = math.min((interval * cfg.backoffFactor).toLong, cfg.maxIntervalMs)
      }
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
        // one job's throwing status check must NOT abort the shared
        // timeline (it would discard every already-resolved ref): treat a
        // transient check failure as still-pending and keep polling THIS
        // job on its backoff schedule — its own timeout discipline bounds
        // a persistently failing check.
        val checked =
          try Right(st.check())
          catch { case scala.util.control.NonFatal(e) => Left(e) }
        checked match {
          case Right(status) =>
            if (status == Running) st.started = true
            resolve(status, st.started, clock() - t0, cfg) match {
              case Some(r) => st.result = Some(r)
              case None => st.reschedule()
            }
          case Left(e) =>
            st.lastError = s"${e.getClass.getName}: ${e.getMessage}"
            resolve(Pending, st.started, clock() - t0, cfg) match {
              case Some(Left(msg)) =>
                st.result = Some(Left(s"$msg (last status-check error: ${st.lastError})"))
              case _ => st.reschedule()
            }
        }
      }
    }
    states.map(st => st.key -> st.result.get)
  }
}
