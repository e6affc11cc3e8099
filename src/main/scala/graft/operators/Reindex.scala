package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's reindex pipeline re-expressed as a declarative plan
  * (reference driver.go:178-212; SURVEY.md §7.2-M1):
  *
  *   scan documents → filter(NOT deleted) → project 4 cols
  *     → optional resume `id >= startId` → order by id (asciibetical)
  *     → chunk into ≤ chunkSize record groups → sink
  *
  * Fidelity decisions (SURVEY.md §0.1 policy):
  *  - ids sort and compare as STRINGS ("asciibetical", README.md:77-78):
  *    the fixture's numeric doc_id is cast to string before any
  *    ordering or resume comparison, so '150' < '2'.
  *  - resume is INCLUSIVE (`id >= startId`) as coded (B4 kept).
  *  - chunk index is derived from the global rank, so chunk boundaries
  *    are deterministic and an exact multiple of chunkSize never
  *    produces an empty trailing chunk (B8 fixed by construction).
  *
  * Scale note: the oracle-facing `chunked` uses a global row_number
  * (single-partition window) to make chunk ids portable; the production
  * write path in NdjsonDirSink instead uses repartitionByRange +
  * sortWithinPartitions + maxRecordsPerFile — same semantics, no
  * global barrier (SURVEY.md §7.3).
  */
object Reindex {

  /** The scan→filter→project→resume slice over the documents fixture
    * (doc_id↔id, text↔content, source↔owner; the fixture has no
    * `deleted` column so that filter is identity here — the JDBC source
    * keeps it, see sources.JdbcDocSource).
    */
  def scanSlice(spark: SparkSession, dir: String, startId: String = ""): DataFrame = {
    val base = Tables.documents(spark, dir)
      .select(
        col("doc_id").cast("string").as("id"),
        col("doc_id").cast("string").as("txn_id"),
        col("source").as("owner"),
        col("text").as("content"))
    if (startId.isEmpty) base else base.filter(col("id") >= startId)
  }

  /** Resume-aware ordered scan with deterministic chunk assignment:
    * every output row carries its chunk index (size `chunkSize`,
    * asciibetical id order).
    */
  def chunked(spark: SparkSession, dir: String,
              chunkSize: Int = 20, startId: String = ""): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("id"))
    scanSlice(spark, dir, startId)
      .withColumn("chunk", floor((row_number().over(w) - 1) / chunkSize).cast("long"))
      .select("id", "owner", "chunk")
  }

  /** Authority enrichment (reference O8): a broadcast lookup join
    * against a small authority dimension.  Here the dimension is
    * derived per-source (the fixture has no external Redis store); the
    * production shape is identical — broadcast(authorities) keeps the
    * fact side shuffle-free at any scale.
    */
  def enriched(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val authorities = docs.groupBy("source")
      .agg(count(lit(1)).as("source_docs"), max(col("n_chars")).as("source_max_chars"))
    docs.join(broadcast(authorities), "source")
      .select(col("doc_id"), col("source"), col("source_docs"), col("source_max_chars"))
  }

  /** Reindex diff (SURVEY.md §2.B set ops): documents present in the
    * source but missing from the sink — the operational "what still
    * needs indexing" query, as an anti join.
    */
  def diff(source: DataFrame, sink: DataFrame): DataFrame =
    source.join(sink, Seq("id"), "left_anti")
}
