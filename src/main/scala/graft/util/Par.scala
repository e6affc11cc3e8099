package graft.util

/** Overlap INDEPENDENT Spark actions from a small driver-side pool
  * (optimization guide §2.6): Spark's scheduler happily runs several
  * jobs at once inside one application — actions are only sequential
  * because the driver calls them sequentially.  Used where an operator
  * must pay several small, mutually independent jobs (staging the
  * per-micro-batch stream fixtures, publishing the three ANALYZE
  * artifacts): the later jobs' tasks back-fill executor threads freed
  * by the earlier jobs' tails instead of waiting for them.
  *
  * Constraints on callers (same rules as any concurrent Spark action):
  * thunks must be independent (no shared temp paths, no conf writes —
  * `spark.conf.set` is session-global, not thread-local) and must not
  * first-materialize a LAZY localCheckpoint (the util/Pins deadlock);
  * every current call site passes plain scan→filter→write jobs.
  * Failures propagate after all thunks settle (the pool is always
  * drained, so no job keeps writing into a dir a failed caller is
  * already deleting).
  */
object Par {
  /** Pool ceiling (ADVICE r21): current call sites pass ≤3-5 thunks,
    * but a future caller handing over a large Seq must not spawn one
    * driver thread per element — a handful of concurrent jobs is
    * enough to back-fill executor tails (guide §2.6: "2-3 jobs in
    * flight is plenty"); excess thunks queue on the bounded pool.
    */
  private val MaxPool = 8

  def run(thunks: Seq[() => Unit]): Unit =
    if (thunks.length <= 1) thunks.foreach(_())
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(thunks.length, MaxPool))
      try {
        val futs = thunks.map { t =>
          pool.submit(new java.util.concurrent.Callable[Unit] {
            def call(): Unit = t()
          })
        }
        // collect every outcome before throwing: a failed slice must
        // not leave sibling jobs racing the caller's cleanup
        val errs = futs.flatMap { f =>
          try { f.get(); None }
          catch {
            case e: java.util.concurrent.ExecutionException =>
              Some(Option(e.getCause).getOrElse(e))
            case e: Throwable => Some(e)
          }
        }
        errs.headOption.foreach(throw _)
      } finally {
        // defensive drain (ADVICE r21): every future was get()'d above,
        // so this returns immediately today; it exists so a future
        // code path that skips a get() still can't leak a running job
        // past the caller's cleanup
        pool.shutdown()
        pool.awaitTermination(1, java.util.concurrent.TimeUnit.HOURS)
        ()
      }
    }
}
