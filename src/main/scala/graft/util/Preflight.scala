package graft.util

/** Preflight health checks (reference O13): the reference verifies the
  * argot binary is on PATH (driver.go:113-117,120-122) and that Redis
  * answers PING when authorities are enabled (driver.go:133-145),
  * aborting early on failure.  In the Spark engine every external
  * dependency (sink, enrichment store) exposes a `healthCheck()` that
  * the driver calls before `spark.read` starts any work.
  */
trait HealthCheck {
  /** Human-readable component name for error reporting. */
  def name: String

  /** Right(()) when healthy, Left(reason) otherwise. Must be cheap and
    * side-effect free; called on the driver before the job starts.
    */
  def healthCheck(): Either[String, Unit]
}

object Preflight {
  /** Run all checks, collecting every failure (the reference aborts on
    * the first; collecting all gives the operator one round-trip).
    */
  def run(checks: Seq[HealthCheck]): Either[Seq[String], Unit] = {
    val failures = checks.flatMap { c =>
      c.healthCheck() match {
        case Left(reason) => Some(s"${c.name}: $reason")
        case Right(_) => None
      }
    }
    if (failures.isEmpty) Right(()) else Left(failures)
  }
}
