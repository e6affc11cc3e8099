package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.AtomicLong

/** Benchmark entry point (driver contract): runs every registered query
  * against SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Measurement fixes from VERDICT r1:
  *  - results are forced with a `noop`-format write, not `.count()`
  *    (count lets Catalyst prune every column and collapse the plan);
  *  - a failing query records `-1` and an `err` entry instead of
  *    masquerading as a fast run.
  */
object Bench {

  /** Cumulative task-level I/O counters (observability, O16): records
    * read from sources and shuffle bytes written, snapshotted around
    * each query to report its I/O footprint alongside wall time.
    */
  private final class IoListener extends SparkListener {
    val recordsRead = new AtomicLong(0L)
    val shuffleBytes = new AtomicLong(0L)
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        recordsRead.addAndGet(m.inputMetrics.recordsRead)
        shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        ()
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.get(cpus)

    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""

    // Warm up the JVM (codegen compiler, parquet reader, shuffle
    // machinery) so per-query timings measure the query, not first-run
    // JIT: without this the first query absorbs ~7s of fixed startup.
    try {
      spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()
      Tables.lineitem(spark, sfDir).limit(1000).write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }

    val io = new IoListener
    spark.sparkContext.addSparkListener(io)

    var errs = List.empty[(String, String)]
    var ioStats = List.empty[(String, (Long, Long))]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (r0, s0) = (io.recordsRead.get, io.shuffleBytes.get)
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        errs ::= (name, Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
      }
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(50) // let the async listener bus drain this query's task events
      ioStats ::= (name, (io.recordsRead.get - r0, io.shuffleBytes.get - s0))
      name -> (if (errs.exists(_._1 == name)) -1.0 else sec)
    }
    val qs = results.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val es = errs.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val ios = ioStats.reverse.map { case (k, (r, s)) =>
      s"${jstr(k)}:{" + s""""recordsRead":$r,"shuffleBytes":$s}""" }.mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es,"io":$ios,"sf":${jstr(sfDir)}}""")
    spark.stop()
  }
}
