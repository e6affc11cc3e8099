package graft.sources

import graft.config.ReindexConfig
import graft.util.HealthCheck
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Document sources behind one trait so the zero-egress test env can
  * swap parquet for Postgres (SURVEY.md §7.1).  Every source yields the
  * reference's document schema: id, txn_id, owner, content — all
  * strings, id compared asciibetically (reference driver.go:21-26).
  */
trait DocSource extends HealthCheck {
  def load(spark: SparkSession): DataFrame
}

object DocSource {
  val schema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("txn_id", StringType),
    StructField("owner", StringType),
    StructField("content", StringType)))
}

/** Partitioned JDBC source (reference O1 — and the architectural win
  * over its single server-side cursor, SURVEY.md §2.A/O1).
  *
  * The reference streams every row through ONE Postgres cursor
  * (driver.go:85-92,192); at 100 TB that cursor is the pipeline.  Here
  * the scan is split into `numPartitions` slices on a synthetic hash
  * partition key, one concurrent JDBC connection per slice.
  *
  * The scan executes the USER-CONFIGURED query (reference
  * README.md:64,80-88; `config/config.go:78` default) — the B2 fix
  * carried end-to-end: `conf.queryString` (which already splices the
  * inclusive `id >= startId` resume predicate case-insensitively into
  * the query text, fixing B3/B5) becomes the inner subquery of
  * `dbtable`, so filtering — including NOT-deleted and resume — runs
  * server-side inside the user's own SQL.
  *
  * `partitionColumn` must be numeric for Spark's JDBC slicer, so we
  * wrap the query with a hash of the string id — Postgres
  * `abs(hashtext(id)) % numPartitions` — keeping asciibetical id
  * semantics intact while slicing the scan evenly.  `hashtext()` is
  * Postgres-only; other databases must supply `partitionExpr` (the
  * Derby e2e test passes a MOD over the numeric id).
  */
final class JdbcDocSource(conf: ReindexConfig, numPartitions: Int = 16,
                          partitionExpr: Option[String] = None) extends DocSource {
  override def name: String = s"jdbc:${conf.dbHost}:${conf.dbPort}/${conf.dbName}"

  /** The int partition-key expression over the user query's columns. */
  private[graft] def partExpr: String = partitionExpr.getOrElse {
    require(conf.isPostgres,
      s"hashtext() id-partitioning is Postgres-only; pass partitionExpr for ${conf.jdbcUrl}")
    // ::bigint BEFORE abs: hashtext returns int4, and abs(INT_MIN)
    // raises 'integer out of range' — near-certain to hit some id at
    // billions of rows
    s"abs(hashtext(id)::bigint) % $numPartitions"
  }

  /** The pushdown-ready subquery: the configured query (resume
    * predicate already spliced in) plus a stable int partition key.
    */
  private[graft] def dbtable: String =
    s"(SELECT graft_q.*, ($partExpr) AS graft_part " +
      s"FROM (${conf.queryString}) AS graft_q) AS graft_docs"

  override def load(spark: SparkSession): DataFrame =
    spark.read.format("jdbc")
      .option("url", conf.jdbcUrl)
      .option("user", conf.dbUser)
      .option("password", conf.password)
      .option("dbtable", dbtable)
      .option("partitionColumn", "graft_part")
      .option("lowerBound", 0)
      .option("upperBound", numPartitions)
      .option("numPartitions", numPartitions)
      .option("fetchsize", 10000)
      .load()
      .select("id", "txn_id", "owner", "content")

  /** Driver-side connectivity preflight (reference O13 analog). */
  override def healthCheck(): Either[String, Unit] =
    try {
      val c = java.sql.DriverManager.getConnection(conf.jdbcUrl, conf.dbUser, conf.password)
      // JDBC-standard ping (a bare `SELECT 1` is not portable: Derby
      // requires a FROM clause / VALUES)
      try { if (c.isValid(5)) Right(()) else Left("connection invalid") } finally c.close()
    } catch { case e: Exception => Left(s"cannot reach database: ${e.getMessage}") }
}

/** Parquet-backed source over the testdata `documents` fixture
  * (doc_id↔id, source↔owner, text↔content; no deleted column —
  * FIXTURES.md §B.3).  Scan benefits: splittable files, column
  * pruning, row-group predicate pushdown.
  */
final class ParquetDocSource(path: String, startId: String = "") extends DocSource {
  override def name: String = s"parquet:$path"

  override def load(spark: SparkSession): DataFrame = {
    val base = spark.read.parquet(path).select(
      col("doc_id").cast("string").as("id"),
      col("doc_id").cast("string").as("txn_id"),
      col("source").as("owner"),
      col("text").as("content"))
    if (startId.isEmpty) base else base.filter(col("id") >= startId)
  }

  override def healthCheck(): Either[String, Unit] =
    if (new java.io.File(path).exists) Right(()) else Left(s"missing $path")
}

/** NDJSON source — reads chunk files the engine's own sink emits (the
  * reference's temp-file intermediates, made a real format: one JSON
  * object per line, explicit schema so no inference pass).  Honors the
  * same inclusive startId resume contract as the other sources.
  */
final class NdjsonDocSource(path: String, startId: String = "") extends DocSource {
  override def name: String = s"ndjson:$path"

  override def load(spark: SparkSession): DataFrame = {
    val base = spark.read.schema(DocSource.schema).json(path)
    if (startId.isEmpty) base else base.filter(col("id") >= startId)
  }

  override def healthCheck(): Either[String, Unit] =
    if (new java.io.File(path).exists) Right(()) else Left(s"missing $path")
}
