package graft.streaming

import graft.functions.TextFunctions
import graft.sinks.DocSink
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Streaming document ingest with dedup-against-corpus: the
  * incremental form of Dedup.againstCorpus, run per micro-batch.
  *
  * Every batch is (1) deduped within itself (keep min id per
  * fingerprint — deterministic survivor), (2) anti-joined against the
  * persistent fingerprint store, (3) delivered to the sink and THEN
  * appended to the store.  Ordering is load-bearing for at-least-once
  * replay: sink-first means a crash between the two steps replays the
  * batch with its fingerprints still absent from the store, so the
  * same fresh docs are recomputed and the per-batch-idempotent sink
  * rewrites them (store-first would anti-join the replayed docs away
  * before they ever reached the sink — silent loss).  A replay of a
  * FULLY completed batch anti-joins to empty and the sink write is
  * skipped, leaving the batch's existing output untouched.
  *
  * Scale: the store is a parquet directory keyed by fingerprint —
  * the anti-join is one shuffle on fp (or a broadcast when the batch
  * is small).  Production upgrades the store to a bucketed/Delta
  * table so the join prunes files by fp; the operator shape here is
  * unchanged.
  */
object DocStream {

  private val storeSchema = StructType(Seq(StructField("fp", StringType)))

  /** Start the dedup-ingest stream over a 4-column document stream
    * (id, txn_id, owner, content).  `storeDir` holds the fingerprint
    * corpus (created on first batch); fresh docs flow to `sink`.
    */
  def dedupIngest(docs: DataFrame, storeDir: String, sink: DocSink,
                  checkpointDir: String): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) { processBatch(batch, storeDir, sink, batchId); () }
      }
      .start()

  /** One batch of the dedup-ingest pipeline (factored out so batch
    * jobs and tests can drive it directly).  Returns the fresh docs
    * written.
    */
  def processBatch(batch: DataFrame, storeDir: String, sink: DocSink,
                   batchId: Long): Long = {
    val spark = batch.sparkSession
    val withFp = batch.withColumn("fp", TextFunctions.fingerprint(col("content")))
    // within-batch dedup: deterministic survivor = min id per fp
    val w = Window.partitionBy("fp").orderBy(col("id").asc)
    val batchUnique = withFp
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
    val store = readStore(spark, storeDir)
    val fresh = batchUnique.join(store, Seq("fp"), "left_anti").persist()
    try {
      if (fresh.isEmpty) 0L // full replay: leave the batch's prior output alone
      else {
        // sink BEFORE store (see scaladoc): crash in between replays
        // with fps still unstored → same docs recomputed and
        // idempotently rewritten; the reverse order loses them
        val written = sink.writeBatch(fresh.drop("fp"), batchId)
        fresh.select("fp").write.mode("append").parquet(storeDir)
        written
      }
    } finally { fresh.unpersist(); () }
  }

  private def readStore(spark: SparkSession, storeDir: String): DataFrame =
    if (new java.io.File(storeDir).exists)
      spark.read.schema(storeSchema).parquet(storeDir)
    else
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], storeSchema)
}
