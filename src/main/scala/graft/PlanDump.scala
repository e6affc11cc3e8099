package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import java.util.concurrent.atomic.AtomicLong

/** Optimization-round tooling: dump `explain("formatted")` for named
  * queries (or the whole registry) into `<outDir>/<query>_<tag>.txt`,
  * and print a one-line execution profile per query — wall seconds,
  * Spark job count, stage count, task count — so job-count regressions
  * and wins are measurable, not guessed.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <tag> [query ...]
  * Env: SPARK_GRAFT_PLANDUMP_EXEC=0 skips execution (plans only).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    val tag = args(2)
    val names =
      if (args.length > 3) args.drop(3).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val exec = sys.env.getOrElse("SPARK_GRAFT_PLANDUMP_EXEC", "1") == "1"
    java.nio.file.Files.createDirectories(outDir)
    val spark = GraftSession.get(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    val jobs = new AtomicLong(0L)
    val stages = new AtomicLong(0L)
    val tasks = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks.toLong); ()
      }
    })
    def drain(): Unit =
      try {
        val sc = spark.sparkContext
        val bus = sc.getClass.getMethod("listenerBus").invoke(sc)
        bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
        ()
      } catch { case _: Throwable => Thread.sleep(100) }

    // warm-up (same rationale as Bench)
    try {
      spark.range(1000000).selectExpr("sum(id)")
        .write.format("noop").mode("overwrite").save()
      Tables.lineitem(spark, sfDir).limit(1000)
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }

    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"PROF $name UNKNOWN")
        case Some(fn) =>
          try {
            drain()
            val (j0, s0, t0) = (jobs.get, stages.get, tasks.get)
            val t = System.nanoTime()
            val df = fn(spark, sfDir)
            val planTxt =
              try df.queryExecution.explainString(
                org.apache.spark.sql.execution.FormattedMode)
              catch { case e: Throwable => s"explain failed: $e" }
            java.nio.file.Files.write(
              outDir.resolve(s"${name}_$tag.txt"),
              planTxt.getBytes("UTF-8"))
            if (exec)
              df.write.format("noop").mode("overwrite").save()
            val sec = (System.nanoTime() - t) / 1e9
            spark.catalog.clearCache()
            graft.util.Pins.releaseAll(spark)
            drain()
            println(f"PROF $name%-28s sec=$sec%7.2f jobs=${jobs.get - j0}%3d " +
              s"stages=${stages.get - s0} tasks=${tasks.get - t0}")
          } catch {
            case e: Throwable =>
              println(s"PROF $name ERROR ${Option(e.getMessage).getOrElse(e.getClass.getName).take(120)}")
          }
      }
    }
    spark.stop()
  }
}
