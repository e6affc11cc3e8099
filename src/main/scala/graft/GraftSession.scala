package graft

import org.apache.spark.sql.SparkSession

/** Canonical SparkSession factory for the engine.
  *
  * Tuned for the harness's `local[32]` single-JVM mode: AQE on
  * (runtime shuffle-partition coalescing + skew-join splitting),
  * shuffle partitions sized to cores (not the 200 default), UTC
  * session time zone for oracle parity.  The same conf keys are what
  * you would set on a real cluster; only the hardcoded local master is
  * harness-specific, so an externally configured master
  * (spark.master system property, e.g. from spark-submit) wins over
  * the local default.
  */
object GraftSession {
  /** @param cores thread count for the local master AND the shuffle
    *              partition count — a single Int so the two can't
    *              drift apart or receive a non-numeric master string.
    */
  def builder(cores: Int = 32): SparkSession.Builder = {
    val b = SparkSession.builder()
      .appName("graft")
      // the engine's extensions (native SQL functions + the
      // RewriteTokenCount optimizer rule) ride every session built
      // here — mains and clusters alike; already-constructed sessions
      // use plans.RegisterFunctions for the function half
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (sys.props.contains("spark.master")) b else b.master(s"local[$cores]")
  }

  def get(cores: Int = 32): SparkSession = {
    SparkSession.getActiveSession.foreach { s =>
      val have = s.sparkContext.getConf.get("spark.sql.shuffle.partitions", "?")
      if (have != cores.toString)
        System.err.println(
          s"[graft] WARNING: reusing existing SparkSession (shuffle.partitions=$have, requested $cores) — " +
            "getOrCreate only applies configs on first creation")
    }
    val spark = builder(cores).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** String-env convenience for the driver mains (SPARK_GRAFT_CPUS). */
  def get(cores: String): SparkSession =
    get(scala.util.Try(cores.trim.toInt).getOrElse(32))
}
