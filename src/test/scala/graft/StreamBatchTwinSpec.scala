package graft

import graft.streaming.EventStream
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Batch-twin determinism harness (VERDICT r13 #8): every streaming
  * operator must converge to EXACTLY what its batch form computes over
  * the same data — the property that makes the streaming tier trustable
  * as an incremental refresh of the batch pipeline at scale.
  *
  * Two delivery shapes are exercised:
  *  - file-drop with maxFilesPerTrigger=1 over time-ordered chunks of
  *    the real events fixture (genuinely incremental state, a real
  *    advancing watermark, append-mode emission), and
  *  - MemoryStream multi-batch feeds (state merged across batches).
  *
  * Equivalence statements are exact for counts/keys/timestamps.  For
  * DOUBLE sums the comparison is 1e-9-relative: streaming accumulates
  * per-batch into store state while batch partial aggregation folds in
  * partition order — same values, different association order, so
  * bit-equality is not the contract (unlike the oracle queries, which
  * route money sums through DECIMAL precisely to BE order-independent).
  */
class StreamBatchTwinSpec extends SparkSuite {
  import spark.implicits._

  private def approxEq(a: Double, b: Double): Boolean =
    (a == b) || math.abs(a - b) <= 1e-9 * math.max(math.abs(a), math.abs(b))

  /** The fixture's events sorted by time and cut into `n` contiguous
    * time ranges — chunk i+1's min ts >= chunk i's max ts, so dropping
    * them in order advances the watermark monotonically and nothing is
    * ever late (the twin needs no drop modeling).
    */
  private def orderedChunks(n: Int): Seq[Seq[Ev]] = {
    val all = Tables.events(spark, sf)
      .select($"event_id", $"ts", $"user_id", $"event_type", $"value", $"props")
      .as[Ev].collect().sortBy(e => (e.ts.getTime, e.event_id)).toSeq
    val per = (all.size + n - 1) / n
    all.grouped(per).toSeq
  }

  test("file-drop windowedCounts (append): emitted set == batch windows closed by the final watermark") {
    // time-ordered chunks, ts re-encoded as the epoch-NANOS longs
    // rawSchema declares (the sf0.001 fixture file stores micros
    // timestamps; other SFs store TIMESTAMP(NANOS) — going through the
    // normalized loader makes the twin fixture-encoding-independent)
    val raw = Tables.events(spark, sf)
      .withColumn("ts", expr("unix_micros(ts) * 1000"))
      .orderBy("ts", "event_id")
    val nRows = raw.count()
    val withPart = raw.withColumn(
      "chunk", ntile(4).over(org.apache.spark.sql.expressions.Window.orderBy("ts", "event_id")))
    val dropDir = java.nio.file.Files.createTempDirectory("graft-twin-drop")
    val stage = java.nio.file.Files.createTempDirectory("graft-twin-stage")
    for (i <- 1 to 4) {
      val part = s"$stage/c$i"
      withPart.filter($"chunk" === i).drop("chunk").coalesce(1).write.parquet(part)
      val src = java.nio.file.Files.list(java.nio.file.Paths.get(part))
        .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
      val dst = dropDir.resolve(f"chunk$i%02d.parquet")
      java.nio.file.Files.copy(src, dst)
      // distinct ascending mod-times pin the FileStreamSource pickup order
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 1000L))
    }
    val name = s"twin_fd_${System.nanoTime()}"
    val q = EventStream.windowedCounts(
      EventStream.readEvents(spark, dropDir.toString, Map("maxFilesPerTrigger" -> "1")),
      watermark = "10 minutes", win = "1 hour")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      q.processAllAvailable()
      // ≥4 micro-batches really ran (the whole point of the file split)
      assert(q.recentProgress.count(_.numInputRows > 0) >= 4,
        s"expected one micro-batch per file: ${q.recentProgress.map(_.numInputRows).mkString(",")}")
      val wmStr = q.lastProgress.eventTime.get("watermark")
      assert(wmStr != null, "query must report a watermark")
      val finalWm = java.sql.Timestamp.from(java.time.Instant.parse(wmStr))
      val got = spark.table(name)
        .select($"win_start", $"event_type", $"n_events", $"total_value")
        .as[(java.sql.Timestamp, String, Long, Double)].collect()
        .sortBy(r => (r._1.getTime, r._2))
      val want = Tables.events(spark, sf)
        .groupBy(window($"ts", "1 hour"), $"event_type")
        .agg(count(lit(1)).as("n_events"), sum($"value").as("total_value"))
        .filter($"window.end" <= lit(finalWm))
        .select($"window.start", $"event_type", $"n_events", $"total_value")
        .as[(java.sql.Timestamp, String, Long, Double)].collect()
        .sortBy(r => (r._1.getTime, r._2))
      assert(got.length == want.length && got.nonEmpty,
        s"append must emit exactly the closed windows: got ${got.length}, want ${want.length} (wm=$finalWm)")
      got.zip(want).foreach { case (g, w) =>
        assert(g._1 == w._1 && g._2 == w._2 && g._3 == w._3, s"$g vs $w")
        assert(approxEq(g._4, w._4), s"sum drift beyond fp-reassociation: $g vs $w")
      }
      // and everything the fixture holds in closed windows was seen once
      assert(got.map(_._3).sum == Tables.events(spark, sf)
        .filter(window($"ts", "1 hour")("end") <= lit(finalWm)).count())
      assert(nRows > got.map(_._3).sum, "the final open window stays unemitted in append mode")
    } finally q.stop()
  }

  test("windowedCounts across MemoryStream batches == batch aggregate (complete mode, state carried)") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val name = s"twin_wc_${System.nanoTime()}"
    val q = EventStream.windowedCounts(mem.toDF(), watermark = "3650 days", win = "1 hour")
      .writeStream.format("memory").queryName(name).outputMode("complete").start()
    try {
      orderedChunks(3).foreach { b => mem.addData(b); q.processAllAvailable() }
      val got = spark.table(name)
        .as[(java.sql.Timestamp, String, Long, Double)].collect()
        .sortBy(r => (r._1.getTime, r._2))
      val want = Tables.events(spark, sf)
        .groupBy(window($"ts", "1 hour"), $"event_type")
        .agg(count(lit(1)).as("n"), sum($"value").as("v"))
        .select($"window.start", $"event_type", $"n", $"v")
        .as[(java.sql.Timestamp, String, Long, Double)].collect()
        .sortBy(r => (r._1.getTime, r._2))
      assert(got.length == want.length)
      got.zip(want).foreach { case (g, w) =>
        assert(g._1 == w._1 && g._2 == w._2 && g._3 == w._3, s"$g vs $w")
        assert(approxEq(g._4, w._4), s"$g vs $w")
      }
    } finally q.stop()
  }

  test("sessionWindows across MemoryStream batches == batch session_window (sessions merge in state)") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val name = s"twin_sw_${System.nanoTime()}"
    val q = EventStream.sessionWindows(mem.toDF(), watermark = "3650 days", gap = "30 minutes")
      .writeStream.format("memory").queryName(name).outputMode("complete").start()
    try {
      // contiguous time chunks split many sessions across batch
      // boundaries — the state store must merge them back
      orderedChunks(3).foreach { b => mem.addData(b); q.processAllAvailable() }
      val got = spark.table(name)
        .as[(java.sql.Timestamp, java.sql.Timestamp, Long, Long, Double)].collect()
        .sortBy(r => (r._3, r._1.getTime))
      val want = Tables.events(spark, sf)
        .groupBy(session_window($"ts", "30 minutes"), $"user_id")
        .agg(count(lit(1)).as("n"), sum($"value").as("v"))
        .select($"session_window.start", $"session_window.end", $"user_id", $"n", $"v")
        .as[(java.sql.Timestamp, java.sql.Timestamp, Long, Long, Double)].collect()
        .sortBy(r => (r._3, r._1.getTime))
      assert(got.length == want.length, s"${got.length} sessions vs batch ${want.length}")
      got.zip(want).foreach { case (g, w) =>
        assert(g._1 == w._1 && g._2 == w._2 && g._3 == w._3 && g._4 == w._4, s"$g vs $w")
        assert(approxEq(g._5, w._5), s"$g vs $w")
      }
    } finally q.stop()
  }

  test("dedupEvents replaying a whole chunk == batch dropDuplicates over the union") {
    implicit val sq = spark.sqlContext
    val chunks = orderedChunks(3)
    // replay chunk 2 in full, plus re-send chunk 1 inside chunk 3's
    // batch: cross-batch AND in-flight duplicates
    val feed = Seq(chunks(0), chunks(1), chunks(1), chunks(2) ++ chunks(0))
    val mem = MemoryStream[Ev]
    val name = s"twin_dd_${System.nanoTime()}"
    val q = EventStream.dedupEvents(mem.toDF(), watermark = "3650 days")
      .select("event_id")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      feed.foreach { b => mem.addData(b); q.processAllAvailable() }
      val got = spark.table(name).as[Long].collect().sorted
      val want = chunks.flatten.map(_.event_id).distinct.sorted
      assert(got.toSeq == want.toSeq,
        s"streaming dedup must equal batch distinct: ${got.length} vs ${want.length}")
    } finally q.stop()
  }

  test("purchaseViewJoin across MemoryStream batches == the same interval join run in batch") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val name = s"twin_pv_${System.nanoTime()}"
    val q = EventStream.purchaseViewJoin(mem.toDF(), watermark = "3650 days", horizon = "1 hour")
      .select($"purchase_id", $"user_id", $"view_id")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      // purchases in a later batch must still find views buffered from
      // earlier batches (join state carried across micro-batches)
      orderedChunks(4).foreach { b => mem.addData(b); q.processAllAvailable() }
      val got = spark.table(name).as[(Long, Long, Long)].collect()
        .sortBy(r => (r._1, r._3)).toSeq
      val e = Tables.events(spark, sf)
      val want = e.filter($"event_type" === "purchase")
        .select($"user_id".as("p_user"), $"event_id".as("purchase_id"), $"ts".as("p_ts"))
        .join(e.filter($"event_type" === "view")
            .select($"user_id".as("v_user"), $"event_id".as("view_id"), $"ts".as("v_ts")),
          expr("p_user = v_user AND v_ts <= p_ts AND v_ts >= p_ts - INTERVAL 1 HOUR"))
        .select($"purchase_id", $"p_user", $"view_id")
        .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._3)).toSeq
      assert(want.nonEmpty, "fixture must produce joined pairs or the twin proves nothing")
      assert(got == want, s"stream-stream join diverged from batch: ${got.length} vs ${want.length} rows")
    } finally q.stop()
  }

  test("q226/q227 gate runners == their batch equivalents, exact (integer-quantized sums)") {
    var progs: Seq[org.apache.spark.sql.streaming.StreamingQueryProgress] = Nil
    val w = streaming.StreamQueries.windowedTotals(spark, sf, q => progs = q.recentProgress.toSeq)
      .as[(Long, String, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(progs.exists(_.stateOperators.nonEmpty), "windows must run through the state store")
    val wantW = Tables.events(spark, sf)
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"),
        sum(floor($"value" * lit(1.0e6) + lit(0.5)).cast("long")).as("v"))
      .select(unix_micros($"window.start"), $"event_type", $"n", $"v")
      .as[(Long, String, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(w == wantW, s"q226 diverged from batch: ${w.length} vs ${wantW.length} rows")

    val s = streaming.StreamQueries.sessionTotals(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(r => (r._3, r._1)).toSeq
    val wantS = Tables.events(spark, sf)
      .groupBy(session_window($"ts", "30 minutes"), $"user_id")
      .agg(count(lit(1)).as("n"),
        sum(floor($"value" * lit(1.0e6) + lit(0.5)).cast("long")).as("v"))
      .select(unix_micros($"session_window.start"), unix_micros($"session_window.end"),
        $"user_id", $"n", $"v")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(r => (r._3, r._1)).toSeq
    assert(s == wantS, s"q227 diverged from batch: ${s.length} vs ${wantS.length} sessions")
  }

  test("q229 gate runner: streamed interval join == the identical batch join, exact") {
    val got = streaming.StreamQueries.joinedPairs(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._3)).toSeq
    val e = Tables.events(spark, sf)
    val want = e.filter($"event_type" === "purchase")
      .select($"user_id".as("p_user"), $"event_id".as("purchase_id"), $"ts".as("p_ts"))
      .join(e.filter($"event_type" === "view")
          .select($"user_id".as("v_user"), $"event_id".as("view_id"), $"ts".as("v_ts")),
        expr("p_user = v_user AND v_ts <= p_ts AND v_ts >= p_ts - INTERVAL 1 HOUR"))
      .select($"purchase_id", $"p_user", $"view_id",
        unix_micros($"p_ts"), unix_micros($"v_ts"))
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._3)).toSeq
    assert(want.nonEmpty && got == want,
      s"gate join diverged from batch: ${got.length} vs ${want.length} rows")
  }

  test("q228 gate runner: replay rides >=2 micro-batches through dedup state; totals == fixture") {
    var progs: Seq[org.apache.spark.sql.streaming.StreamingQueryProgress] = Nil
    val row = streaming.StreamQueries.dedupReplayAudit(spark, sf, q => progs = q.recentProgress.toSeq)
      .as[(Long, Long, Long)].head()
    assert(progs.count(_.numInputRows > 0) >= 2,
      s"the replayed copy must arrive in its own micro-batch: ${progs.map(_.numInputRows).mkString(",")}")
    assert(progs.exists(_.stateOperators.exists(_.numRowsTotal > 0)),
      "dedup must hold seen keys in the state store")
    val want = Tables.events(spark, sf)
      .agg(count(lit(1)), sum($"event_id"),
        sum(floor($"value" * lit(1.0e6) + lit(0.5)).cast("long")))
      .as[(Long, Long, Long)].head()
    assert(row == want, s"dedup-under-replay must equal the fixture aggregates: $row vs $want")
  }

  test("session gap boundary: exactly-30min gap MERGES — pins the q227 oracle's strict-> rule") {
    // the fixture holds no exact-gap pair (checked at sf0.01), so this
    // cross-engine semantics boundary needs crafted data.  Measured,
    // not assumed: Spark session_window MERGES an event landing
    // exactly at the previous session's end (split only when the gap
    // is STRICTLY greater) — the first draft of the q227 oracle said
    // `>=` and no fixture row could catch it; this test keeps the
    // engines agreeing at the boundary forever
    val gapUs = 1800000000L
    def sessions(deltaUs: Long): Seq[(Long, Long)] = Seq(0L, deltaUs)
      .toDF("us")
      .select(lit(7L).as("user_id"), timestamp_micros($"us").as("ts"))
      .groupBy(session_window($"ts", "30 minutes"), $"user_id")
      .agg(count(lit(1)).as("n"))
      .select(unix_micros($"session_window.start"), $"n")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(sessions(gapUs) == Seq((0L, 2L)),
      "an event exactly at the session end must MERGE into the session")
    assert(sessions(gapUs + 1000L) == Seq((0L, 1L), (gapUs + 1000L, 1L)),
      "a gap beyond the horizon must start a NEW session")
    // and the oracle's island rule states the same boundary: strict >
    val oracleBrk = SparkEntry.oracleSql("q227_stream_sessions")
    assert(oracleBrk.contains("> 1800000000") && !oracleBrk.contains(">= 1800000000"),
      "q227 oracle must split only on STRICTLY greater gaps")
  }

  test("q230 gate runner: ingest rides 2 micro-batches; sink holds exactly the global min-id-per-fp survivors") {
    var progs: Seq[org.apache.spark.sql.streaming.StreamingQueryProgress] = Nil
    val got = streaming.StreamQueries.ingestAudit(spark, sf, q => progs = q.recentProgress.toSeq)
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(progs.count(_.numInputRows > 0) >= 2,
      s"each source file must ride its own micro-batch: ${progs.map(_.numInputRows).mkString(",")}")
    val want = Tables.documents(spark, sf)
      .withColumn("fp", graft.functions.TextFunctions.fingerprint($"text"))
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"fp").orderBy($"doc_id")))
      .filter($"rn" === 1)
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"), sum($"doc_id").as("id_sum"))
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == want,
      s"streamed ingest must equal batch min-id-per-fp dedup: $got vs $want")
  }

  test("userActivity final state across batches == batch per-user count/sum") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val name = s"twin_ua_${System.nanoTime()}"
    val q = EventStream.userActivity(spark, mem.toDF())
      .writeStream.format("memory").queryName(name).outputMode("update").start()
    try {
      orderedChunks(3).foreach { b => mem.addData(b); q.processAllAvailable() }
      // n_events grows monotonically per user — the max-n row IS the
      // final state
      val got = spark.table(name).as[(Long, Long, Double)].collect()
        .groupBy(_._1).map { case (_, rs) => rs.maxBy(_._2) }.toSeq.sortBy(_._1)
      val want = Tables.events(spark, sf)
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n"), sum($"value").as("v"))
        .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
      assert(got.length == want.length)
      got.zip(want).foreach { case (g, w) =>
        assert(g._1 == w._1 && g._2 == w._2, s"$g vs $w")
        assert(approxEq(g._3, w._3), s"$g vs $w")
      }
    } finally q.stop()
  }

  test("q239 gate runner: keyed state rides >=2 micro-batches; collapsed state == fixture aggregate") {
    var progs: Seq[org.apache.spark.sql.streaming.StreamingQueryProgress] = Nil
    val got = streaming.StreamQueries.statefulTotals(spark, sf,
        q => progs = q.recentProgress.toSeq)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(progs.count(_.numInputRows > 0) >= 2,
      s"the time-split halves must arrive as separate micro-batches: ${progs.map(_.numInputRows).mkString(",")}")
    val want = Tables.events(spark, sf)
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n"),
        sum(floor($"value" * lit(1.0e6) + lit(0.5)).cast("long")).as("u"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == want, s"state must converge to the batch aggregate (${got.take(3)} vs ${want.take(3)})")
    // the split genuinely crosses batches for most users: at least one
    // user must have been UPDATED twice (rows in both halves)
    val cut = 1705708800000000L
    val both = Tables.events(spark, sf)
      .select($"user_id", unix_micros($"ts").as("us"))
      .groupBy($"user_id")
      .agg((max(when($"us" < cut, 1).otherwise(0)) +
        max(when($"us" >= cut, 1).otherwise(0))).as("sides"))
      .filter($"sides" === 2).count()
    assert(both > 0, "fixture must exercise cross-batch state accumulation")
  }
}
