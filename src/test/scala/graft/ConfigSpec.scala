package graft

import graft.config.ReindexConfig
import org.scalatest.funsuite.AnyFunSuite

/** Config plane (O14) — mirrors the reference's only unit tests and
  * adds the bound/splice cases the reference gets wrong (B2/B3/B4,
  * SURVEY.md §0.1).
  */
class ConfigSpec extends AnyFunSuite {

  private def valid = ReindexConfig(password = "pw", solrUrl = "http://solr:8983/solr/x")

  test("defaults match the reference (config.go:73-84)") {
    val c = ReindexConfig()
    assert(c.dbHost == "localhost" && c.dbPort == 5432)
    assert(c.chunkSize == 20000)
    assert(c.workers >= 1)
    assert(c.query == ReindexConfig.DefaultQuery)
    // reference config.go:82: authority processing is ON by default
    assert(c.authorities)
    assert(c.redisUrl == "redis://localhost:6379/0")
  }

  test("negative workers fails validation (reference config_test.go fixture)") {
    // port of config/testdata/config_negative_workers.json
    val parsed = ReindexConfig.parse("""{"password":"ignored","workers":-1}""")
    assert(parsed.isRight)
    assert(parsed.flatMap(_.validate).isLeft)
  }

  test("chunkSize bounds [10, 100000]") {
    assert(valid.copy(chunkSize = 9).validate.isLeft)
    assert(valid.copy(chunkSize = 100001).validate.isLeft)
    assert(valid.copy(chunkSize = 10).validate.isRight)
    assert(valid.copy(chunkSize = 100000).validate.isRight)
  }

  test("password and solrUrl required") {
    assert(valid.copy(password = "").validate.isLeft)
    assert(valid.copy(solrUrl = "").validate.isLeft)
    assert(valid.validate.isRight)
  }

  test("query is genuinely configurable (fixes B2)") {
    val c = ReindexConfig.parse("""{"query":"select 1"}""")
    assert(c.exists(_.query == "select 1"))
  }

  test("resume splice fires on the default query's uppercase NOT deleted (fixes B3)") {
    val c = valid.copy(startId = "abc123")
    assert(c.queryString.contains("NOT deleted AND id >= 'abc123'"))
    assert(c.queryString.endsWith("ORDER BY id ASC"))
  }

  test("resume splice is inclusive >= (B4 kept as coded)") {
    assert(valid.copy(startId = "x").queryString.contains("id >= 'x'"))
  }

  test("resume splice escapes quotes and wraps anchor-less queries") {
    val c = valid.copy(startId = "o'id")
    assert(c.queryString.contains("id >= 'o''id'"))
    val custom = valid.copy(query = "select id from t", startId = "5")
    assert(custom.queryString == "SELECT * FROM (select id from t) AS graft_q WHERE id >= '5'")
  }

  test("unknown keys ignored; bad JSON is a Left") {
    assert(ReindexConfig.parse("""{"nope": 1}""").isRight)
    assert(ReindexConfig.parse("""{"chunkSize": """).isLeft)
  }

  test("jdbcUrl and redacted display") {
    val c = valid.copy(dbHost = "db", dbPort = 5433, dbName = "x")
    assert(c.jdbcUrl == "jdbc:postgresql://db:5433/x")
    assert(!c.display.contains("pw"))
  }
}
