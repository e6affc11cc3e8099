package graft

import org.apache.spark.sql.SparkSession

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

    var errs = List.empty[(String, String)]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        errs ::= (name, Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
      }
      val sec = (System.nanoTime() - t0) / 1e9
      name -> (if (errs.exists(_._1 == name)) -1.0 else sec)
    }
    val qs = results.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")
    val es = errs.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es,"sf":${jstr(sfDir)}}""")
    spark.stop()
  }
}
