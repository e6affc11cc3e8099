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
  * the scan is split into `numPartitions` range slices on a partition
  * column, one concurrent JDBC connection per slice, and the
  * filter/projection (`NOT deleted`, 4 columns) are pushed into
  * Postgres by Catalyst.
  *
  * The resume predicate (`id >= startId`, inclusive — B4) and the
  * NOT-deleted filter are applied as DataFrame filters so Catalyst
  * pushes them down; B3's broken string splice has no analog here.
  *
  * `partitionColumn` must be numeric/date for Spark's range
  * partitioner, so we partition on a hash of the string id —
  * `abs(hash(id)) % numPartitions` via the `dbtable` subquery —
  * keeping asciibetical id semantics intact while still slicing the
  * scan evenly.
  */
final class JdbcDocSource(conf: ReindexConfig, numPartitions: Int = 16) extends DocSource {
  override def name: String = s"jdbc:${conf.dbHost}:${conf.dbPort}/${conf.dbName}"

  /** The pushdown-ready subquery: adds a stable int partition key. */
  private[graft] def dbtable: String =
    s"(SELECT id, txn_id, owner, content, deleted, " +
      s"abs(hashtext(id)) % $numPartitions AS graft_part FROM documents) graft_docs"

  override def load(spark: SparkSession): DataFrame = {
    var r = spark.read.format("jdbc")
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
      .filter(!col("deleted"))
    if (conf.hasStartId) r = r.filter(col("id") >= conf.startId)
    r.select("id", "txn_id", "owner", "content")
  }

  /** Driver-side connectivity preflight (reference O13 analog). */
  override def healthCheck(): Either[String, Unit] =
    try {
      val c = java.sql.DriverManager.getConnection(conf.jdbcUrl, conf.dbUser, conf.password)
      try { c.createStatement().execute("SELECT 1"); Right(()) } finally c.close()
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
