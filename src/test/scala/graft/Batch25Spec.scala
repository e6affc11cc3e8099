package graft

import graft.operators.{EventOps, PipelineAudits}
import org.apache.spark.sql.functions._

/** Batch 30 (q343-q345): watermark late-data accounting (value side —
  * the protocol pins live in StreamProgressSpec), the purged
  * walk-forward temporal split, and Hamilton budget apportionment.
  */
class Batch25Spec extends SparkSuite {

  test("q343 late data: emitted mass == replayed admit∩emit, nothing beyond the final watermark") {
    val out = graft.streaming.StreamQueries.lateDataAudit(spark, sf).collect()
    val us = Tables.events(spark, sf)
      .select(col("event_id"), unix_micros(col("ts")).as("us")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val h = 3600000000L
    val lw = us.filter(_._1 % 3 == 0).map(_._2).max - h
    val fwm = us.map(_._2).max - h
    val admitted = us.filter { case (id, t) =>
      id % 3 != 2 || (t / h) * h + h > lw }
    val expect = admitted.map(_._2).filter(t => (t / h) * h + h <= fwm)
      .groupBy(t => (t / h) * h).map { case (w, ts) => w -> ts.length.toLong }
    assert(out.map(r => r.getLong(0) -> r.getLong(1)).toMap == expect,
      "stream output replays the dual-watermark protocol exactly")
    assert(admitted.length < us.length, "the staging produced real late drops")
    assert(out.map(_.getLong(0)).max + h <= fwm, "no window beyond the final watermark")
  }

  test("q344 walk-forward: cuts monotone, masses recount, embargo separates train from test") {
    val rows = EventOps.walkForwardSplit(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    val td = rows.map(_.getLong(1))
    assert(td.zip(td.tail).forall { case (a, b) => a < b }, "train window grows per fold")
    val days = Tables.events(spark, sf)
      .select(expr("unix_micros(ts) div 86400000000").as("day")).collect()
      .map(_.getLong(0))
    val (d0, d1) = (days.min, days.max)
    val span = d1 - d0 + 1
    for (r <- rows) {
      val fold = r.getInt(0)
      val cut = d0 + (span * fold + 4) / 5
      val tEnd = cut + 1 + (span + 4) / 5
      assert(r.getLong(1) == cut - d0)
      assert(r.getLong(2) == days.count(_ < cut).toLong, "train recount")
      assert(r.getLong(3) == days.count(d => d >= cut && d < cut + 1).toLong)
      assert(r.getLong(4) == days.count(d => d >= cut + 1 && d < tEnd).toLong)
      assert(r.getLong(2) > 0 && r.getLong(4) > 0, "non-degenerate folds on the fixture")
    }
  }

  test("q345 budget: sum of allocations is exactly the budget, remainders bounded") {
    val rows = PipelineAudits.tokenBudget(spark, sf).collect()
    assert(rows.map(_.getLong(4)).sum == 1000000L,
      "Hamilton apportionment conserves the budget exactly")
    for (r <- rows) {
      val d = r.getLong(4) - r.getLong(2)
      assert(d == 0L || d == 1L, "alloc is base or base+1")
      assert(r.getLong(2) >= 0L && r.getLong(3) >= 0L)
    }
    // proportionality: every quota within one unit of the real share
    val wt = rows.map(_.getLong(1)).sum
    for (r <- rows) {
      val exact = 1000000.0 * r.getLong(1) / wt
      assert(math.abs(r.getLong(4) - exact) < 1.0, "quota within 1 of exact share")
    }
  }
}
