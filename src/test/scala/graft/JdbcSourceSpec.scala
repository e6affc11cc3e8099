package graft

import graft.config.ReindexConfig
import graft.sources.JdbcDocSource
import java.sql.DriverManager

/** End-to-end JDBC source coverage (VERDICT r3 "What's missing" #3):
  * an embedded Derby database stands in for Postgres, proving the
  * partitioned scan actually executes — slicing covers every row
  * exactly once, the configured query is the scan, and the resume
  * predicate filters server-side.  `hashtext()` being Postgres-only,
  * the test supplies a MOD partition expression over the numeric ids
  * (the partitionExpr escape hatch the non-Postgres path requires).
  */
class JdbcSourceSpec extends SparkSuite {

  private val url = "jdbc:derby:memory:graftdb"
  private val nDocs = 60

  private lazy val db: Unit = {
    val c = DriverManager.getConnection(url + ";create=true")
    try {
      val st = c.createStatement()
      st.execute("CREATE TABLE documents (id VARCHAR(32) PRIMARY KEY, " +
        "txn_id VARCHAR(32), owner VARCHAR(32), content VARCHAR(200), deleted BOOLEAN)")
      val ins = c.prepareStatement("INSERT INTO documents VALUES (?, ?, ?, ?, ?)")
      (0 until nDocs).foreach { i =>
        ins.setString(1, f"$i%03d")
        ins.setString(2, s"t$i")
        ins.setString(3, if (i % 2 == 0) "alpha" else "beta")
        ins.setString(4, s"content of doc $i")
        ins.setBoolean(5, i % 10 == 9) // every 10th doc is deleted
        ins.executeUpdate()
      }
      ins.close(); st.close()
    } finally c.close()
  }

  private def conf(extra: ReindexConfig => ReindexConfig = identity): ReindexConfig =
    extra(ReindexConfig(jdbcUrlOverride = url, dbUser = "", password = "x"))

  private def source(c: ReindexConfig, parts: Int = 4): JdbcDocSource =
    new JdbcDocSource(c, numPartitions = parts,
      partitionExpr = Some(s"MOD(CAST(id AS INT), $parts)"))

  test("partitioned scan reads every non-deleted row exactly once") {
    db
    val df = source(conf()).load(spark)
    assert(df.rdd.getNumPartitions == 4)
    val ids = df.select("id").collect().map(_.getString(0))
    val expected = (0 until nDocs).filterNot(_ % 10 == 9).map(i => f"$i%03d")
    assert(ids.sorted.toSeq == expected) // no dup, no loss across slices
    assert(df.columns.toSeq == Seq("id", "txn_id", "owner", "content"))
  }

  test("resume predicate filters server-side inside the user query") {
    db
    val df = source(conf(_.copy(startId = "030"))).load(spark)
    val ids = df.select("id").collect().map(_.getString(0))
    val expected = (0 until nDocs).filterNot(_ % 10 == 9)
      .map(i => f"$i%03d").filter(_ >= "030") // inclusive (B4)
    assert(ids.sorted.toSeq == expected)
  }

  test("configured query changes the scan (B2 end-to-end)") {
    db
    val c = conf(_.copy(
      query = "select id, txn_id, owner, content from documents " +
        "WHERE NOT deleted AND owner = 'alpha'"))
    val df = source(c).load(spark)
    val owners = df.select("owner").distinct().collect().map(_.getString(0))
    assert(owners.toSeq == Seq("alpha"))
    val n = (0 until nDocs).count(i => i % 10 != 9 && i % 2 == 0)
    assert(df.count() == n)
  }

  test("health check succeeds against a live database") {
    db
    assert(source(conf()).healthCheck().isRight)
  }

  test("plan pin: the resume predicate executes inside the JDBC scan, never as a Spark-side filter") {
    db
    val df = source(conf(_.copy(startId = "030"))).load(spark)
    val plan = df.queryExecution.executedPlan
    val flat = plan.collect { case n => n }
    // O4's pushdown, locked the way PlanGuardSpec locks parquet scans:
    // the whole plan is ONE JDBC row scan — no FilterExec may reappear
    // (a Spark-side `id >= startId` would mean the database shipped
    // every row and the resume filter ran client-side)
    assert(!flat.exists(_.isInstanceOf[org.apache.spark.sql.execution.FilterExec]),
      s"no Spark-side filter, got:\n$plan")
    val scans = flat.collect {
      case s: org.apache.spark.sql.execution.RowDataSourceScanExec => s }
    assert(scans.length == 1, "exactly one JDBC scan")
    // the predicate is spliced INTO the server-side subquery (deeper
    // than PushedFilters — it is part of the dbtable text itself)
    assert(plan.toString.contains("id >= '030'"),
      s"resume predicate must live in the JDBC relation's query:\n$plan")
  }
}
