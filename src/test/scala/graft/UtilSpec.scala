package graft

import graft.util.{ErrorCollector, HealthCheck, Lockfile, Preflight}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Driver-plane utilities: lockfile (O12), preflight (O13), error
  * collection (O11/B10).
  */
class UtilSpec extends AnyFunSuite {

  test("lockfile: second acquire refused while held, pid recorded, release frees") {
    val dir = Files.createTempDirectory("graft-lock")
    val l1 = Lockfile.default(dir.toString)
    val l2 = Lockfile.default(dir.toString)
    assert(l1.acquire())
    assert(!l2.acquire(), "second instance must be refused (O12)")
    assert(l1.holderPid.contains(ProcessHandle.current.pid))
    l1.release()
    assert(l2.acquire())
    l2.release()
  }

  test("preflight collects every failure, not just the first") {
    def check(n: String, ok: Boolean): HealthCheck = new HealthCheck {
      val name = n
      def healthCheck(): Either[String, Unit] = if (ok) Right(()) else Left("down")
    }
    assert(Preflight.run(Seq(check("a", true), check("b", true))).isRight)
    val r = Preflight.run(Seq(check("a", false), check("b", true), check("c", false)))
    assert(r.left.exists(_.size == 2))
  }
}

/** Accumulator-based soft-error accounting inside Spark tasks. */
class ErrorCollectorSpec extends SparkSuite {
  import spark.implicits._

  test("soft errors are counted with samples; good records survive (fixes B10)") {
    val ec = ErrorCollector(spark.sparkContext)
    val out = spark.range(100).as[Long].mapPartitions { it =>
      it.flatMap(i => ec.guard(s"rec $i") {
        if (i % 10 == 0) throw new IllegalStateException(s"bad $i")
        i * 2
      })
    }.collect()
    assert(out.length == 90)
    assert(ec.count == 10)
    assert(ec.report.nonEmpty && ec.report.size <= 300)
    assert(ec.report.head.contains("IllegalStateException"))
  }

  test("priorBenchRecord reads the newest BENCH artifact's qNN minimums") {
    val dir = Files.createTempDirectory("graft-bench")
    assert(Bench.priorBenchRecord(dir).isEmpty, "no artifact → empty map")
    Files.write(dir.resolve("BENCH_r08.json"),
      """{"queries":{"q01":9.99,"q67":9.99}}""".getBytes("UTF-8"))
    // the driver's artifact repeats each value (tail + parsed) and may
    // carry full-name keys and -1 failures; newest round (r9) wins
    Files.write(dir.resolve("BENCH_r09.json"),
      ("""{"tail":"{\"q01_pricing\":1.05,\"q67_session_window\":2.27}",""" +
        """"parsed":{"queries":{"q01":1.05,"q67":2.27,"q99":-1}}}""").getBytes("UTF-8"))
    val rec = Bench.priorBenchRecord(dir)
    assert(rec.get("q01").contains(1.05))
    assert(rec.get("q67").contains(2.27))
    assert(!rec.contains("q99"), "failed (-1) entries must not become records")
  }

  test("README query counts match the SparkEntry registry (doc-drift gate)") {
    // Three consecutive round verdicts flagged stale README numbers;
    // this pins the contract paragraph to the registry so adding a
    // query without updating the doc fails the build.
    val readme = new String(
      Files.readAllBytes(java.nio.file.Paths.get("README.md")), "UTF-8")
    val m = """\((\d+) queries, (\d+) DuckDB-oracle-checked""".r
      .findFirstMatchIn(readme)
      .getOrElse(fail("README.md lost its '(NN queries, MM DuckDB-oracle-checked' contract line"))
    assert(m.group(1).toInt == SparkEntry.queries.size,
      s"README says ${m.group(1)} queries but SparkEntry registers ${SparkEntry.queries.size}")
    assert(m.group(2).toInt == SparkEntry.oracleSql.size,
      s"README says ${m.group(2)} oracle-checked but SparkEntry.oracleSql has ${SparkEntry.oracleSql.size}")
    // The performance-notes sentence carries its own count ("NN.NN s for
    // all NN queries") and drifted independently in round 6 — pin it too.
    val perf = """for all (\d+) queries""".r
      .findFirstMatchIn(readme)
      .getOrElse(fail("README.md lost its 'for all NN queries' performance sentence"))
    assert(perf.group(1).toInt == SparkEntry.queries.size,
      s"README perf notes say ${perf.group(1)} queries but SparkEntry registers ${SparkEntry.queries.size}")
  }
}
