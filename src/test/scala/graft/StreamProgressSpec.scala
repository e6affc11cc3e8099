package graft

import graft.streaming.StreamQueries
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryProgress}

/** Streaming-tier plan pins — the `StreamingQueryProgress` analog of
  * PlanGuardSpec's batch-plan pins.  The oracle gate proves the six
  * streaming queries' VALUES; these tests lock their SHAPES: which
  * stateful operator runs, that state genuinely crosses micro-batch
  * boundaries (the whole point of q228/q230/q239's multi-file
  * staging), that each staged file rides exactly one micro-batch
  * (maxFilesPerTrigger=1 actually honored under AvailableNow), and
  * that the state-partition sizing documented at
  * StreamQueries.runToTable is the partition count the state store
  * actually applied.  A regression that, e.g., collapsed the staged
  * files into one batch (making the cross-batch dedup vacuous) or
  * silently planned 32 near-empty state stores would pass the value
  * oracle and fail here.
  */
class StreamProgressSpec extends SparkSuite {

  /** Run a StreamQueries entry point, capturing the finished query's
    * recent progress through the inspect hook.  The result frame is
    * forced (count) so lazily-read outputs (q230) are materialized
    * before temp dirs could matter.
    */
  private def capture(run: (StreamingQuery => Unit) => DataFrame)
      : (Long, Seq[StreamingQueryProgress]) = {
    var progs: Seq[StreamingQueryProgress] = Nil
    val df = run(q => progs = q.recentProgress.toSeq)
    (df.count(), progs)
  }

  /** Micro-batches that actually consumed input, in batch order. */
  private def dataBatches(progs: Seq[StreamingQueryProgress]): Seq[StreamingQueryProgress] =
    progs.filter(_.numInputRows > 0).sortBy(_.batchId)

  /** The final state snapshot: the stateOperators array of the last
    * progress that reports one (no-data watermark-advance batches
    * still carry state metrics; empty-progress tails do not).
    */
  private def finalState(progs: Seq[StreamingQueryProgress]) =
    progs.sortBy(_.batchId).reverse.find(_.stateOperators.nonEmpty)
      .map(_.stateOperators.toSeq).getOrElse(Seq.empty)

  private lazy val events = Tables.events(spark, sf).cache()
  private lazy val nEvents = events.count()

  test("q226 windowed totals: one aggregation state operator, sized-8 stores, state rows = emitted groups") {
    val (rows, progs) = capture(StreamQueries.windowedTotals(spark, sf, _))
    assert(dataBatches(progs).map(_.numInputRows).sum == nEvents,
      "every fixture event must flow through the stream")
    val ops = finalState(progs)
    assert(ops.length == 1, s"exactly one stateful operator, got ${ops.map(_.operatorName)}")
    assert(ops.head.operatorName.contains("stateStoreSave"), ops.head.operatorName)
    assert(ops.head.numShufflePartitions == 8,
      s"state-partition sizing (runToTable statePartitions=8) must reach the store, got ${ops.head.numShufflePartitions}")
    assert(ops.head.numRowsTotal == rows,
      s"state holds exactly the emitted (window,type) groups: state=${ops.head.numRowsTotal} rows=$rows")
  }

  test("q227 session totals: session-window state operator, state rows = emitted sessions") {
    val (rows, progs) = capture(StreamQueries.sessionTotals(spark, sf, _))
    val ops = finalState(progs)
    assert(ops.length == 1, s"exactly one stateful operator, got ${ops.map(_.operatorName)}")
    assert(ops.head.operatorName.toLowerCase.contains("session"), ops.head.operatorName)
    assert(ops.head.numShufflePartitions == 8)
    assert(ops.head.numRowsTotal == rows,
      s"state holds exactly the merged sessions: state=${ops.head.numRowsTotal} rows=$rows")
  }

  test("q228 replay dedup: two micro-batches, second batch updates ZERO state rows") {
    val (_, progs) = capture(StreamQueries.dedupReplayAudit(spark, sf, _))
    val batches = dataBatches(progs)
    assert(batches.length == 2,
      s"two staged copies + maxFilesPerTrigger=1 must ride two micro-batches, got ${batches.length}")
    assert(batches.forall(_.numInputRows == nEvents),
      s"each batch replays the whole fixture: ${batches.map(_.numInputRows)}")
    val perBatch = batches.map(p => p.stateOperators.head.numRowsUpdated)
    assert(perBatch.head == nEvents,
      s"batch 1 inserts every event_id into state, got ${perBatch.head}")
    assert(perBatch(1) == 0L,
      s"batch 2 is a pure replay — the state store must already hold every key, got ${perBatch(1)} updates")
    val ops = finalState(progs)
    assert(ops.head.operatorName.toLowerCase.contains("dedupe"), ops.head.operatorName)
    assert(ops.head.numRowsTotal == nEvents)
    assert(ops.head.numShufflePartitions == 8)
  }

  test("q229 stream-stream join: one symmetric-hash-join operator buffering both sides") {
    val nPurchases = events.filter(col("event_type") === "purchase").count()
    val nViews = events.filter(col("event_type") === "view").count()
    val (_, progs) = capture(StreamQueries.joinedPairs(spark, sf, _))
    val ops = finalState(progs)
    assert(ops.length == 1, s"exactly one stateful operator, got ${ops.map(_.operatorName)}")
    assert(ops.head.operatorName.toLowerCase.contains("join"), ops.head.operatorName)
    assert(ops.head.numShufflePartitions == 8)
    assert(ops.head.numRowsTotal == nPurchases + nViews,
      s"with the far watermark, state buffers every purchase (${nPurchases}) + view (${nViews}) row; got ${ops.head.numRowsTotal}")
  }

  test("q230 ingest pipeline: two file-staged micro-batches with the staged row counts, dedup batch-side not in the state store") {
    val maxId = Tables.documents(spark, sf).agg(max(col("doc_id"))).head().getLong(0)
    val cut1 = (maxId + 1) * 3 / 5
    val cut0 = cut1 / 2
    val docs = Tables.documents(spark, sf)
    val expect = Seq(docs.filter(col("doc_id") < cut1).count(),
      docs.filter(col("doc_id") >= cut0).count())
    val (_, progs) = capture(StreamQueries.ingestAudit(spark, sf, _))
    val batches = dataBatches(progs)
    assert(batches.length == 2,
      s"two staged files + maxFilesPerTrigger=1 must ride two micro-batches, got ${batches.length}")
    assert(batches.map(_.numInputRows) == expect,
      s"per-batch input must be the staged slice sizes $expect, got ${batches.map(_.numInputRows)}")
    // dedup runs inside foreachBatch against the rename-published fp
    // store — a state-store operator appearing here would mean the
    // pipeline silently swapped to dropDuplicates state, losing the
    // persistent (restart-survivable) store semantics
    assert(progs.forall(_.stateOperators.isEmpty),
      "ingest keeps its dedup in the fp store, not the streaming state store")
  }

  test("q278 stream-static join: ZERO join state — only the aggregate's state operator exists") {
    val (rows, progs) = capture(StreamQueries.staticEnriched(spark, sf, _))
    assert(rows > 0)
    assert(dataBatches(progs).map(_.numInputRows).sum == nEvents)
    val ops = finalState(progs)
    assert(ops.length == 1,
      s"a stream-STATIC join buffers nothing — one state operator (the agg), got ${ops.map(_.operatorName)}")
    assert(ops.head.operatorName.contains("stateStoreSave"), ops.head.operatorName)
    assert(!ops.exists(_.operatorName.toLowerCase.contains("join")),
      "broadcast enrichment must not plan stream-join state (q229's shape)")
    assert(ops.head.numShufflePartitions == 8)
  }

  test("q239 keyed state: both micro-batches update state, final state rows = distinct users") {
    val nUsers = events.select("user_id").distinct().count()
    val (rows, progs) = capture(StreamQueries.statefulTotals(spark, sf, _))
    val batches = dataBatches(progs)
    assert(batches.length == 2,
      s"the timestamp-split staging must ride two micro-batches, got ${batches.length}")
    val updated = batches.map(_.stateOperators.head.numRowsUpdated)
    assert(updated.forall(_ > 0L),
      s"state must be written in BOTH batches (cross-batch accumulation), got $updated")
    val ops = finalState(progs)
    assert(ops.head.operatorName.toLowerCase.contains("groupswithstate"), ops.head.operatorName)
    assert(ops.head.numShufflePartitions == 8)
    assert(ops.head.numRowsTotal == nUsers,
      s"one state row per user: state=${ops.head.numRowsTotal} users=$nUsers")
    assert(rows == nUsers, s"collapsed update-mode output is one row per user: $rows vs $nUsers")
  }
}
