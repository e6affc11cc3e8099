package graft

import graft.operators.{EventOps, PipelineAudits, TextAnalysis}
import org.apache.spark.sql.functions._

/** Batch 22 (q324-q326): semantic invariants checked against direct
  * recounts — eigenvector centrality of the token co-occurrence
  * graph, the day-partitioned interval sweep-line, and the Simpson's
  * paradox pooled-vs-stratified audit.
  */
class Batch20Spec extends SparkSuite {

  test("q324 eigencentrality: ranks contiguous, scores normalized and non-increasing, df recounts") {
    val rows = TextAnalysis.eigenCentrality(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.map(_.getInt(0)).toSeq == (1 to rows.length), "ranks contiguous")
    val xq = rows.map(_.getLong(3))
    assert(xq.zip(xq.tail).forall { case (a, b) => a >= b }, "iterate non-increasing")
    assert(xq.head == 1000000L, "L-inf normalization puts the top token at exactly 1.0")
    assert(xq.forall(q => q >= 0L && q <= 1000000L))
    for (r <- rows)
      assert(r.getDouble(4) == r.getLong(3).toDouble / 1.0e6, "score replays from xq")
    // doc frequency recounts for the reported tokens
    val df = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "").distinct()
      .groupBy("token").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for (r <- rows)
      assert(df(r.getString(1)) == r.getLong(2), s"df recount for '${r.getString(1)}'")
  }

  test("q325 concurrency: start/end mass balances, peaks bounded by open sessions, carry-in telescopes") {
    val rows = EventOps.sessionConcurrency(spark, sf).collect()
    assert(rows.nonEmpty)
    val days = rows.map(_.getLong(0))
    assert(days.sorted.toSeq == days.toSeq, "days ascending")
    val starts = rows.map(_.getLong(2)).sum
    val ends = rows.map(_.getLong(3)).sum
    assert(starts == ends, "every session both starts and ends")
    // starts recount as the number of q12 sessions
    val nSessions = EventOps.sessionize(spark, sf).count()
    assert(starts == nSessions, "one +1 per q12 session")
    for (r <- rows) {
      assert(r.getLong(1) >= 0L, "carry-in non-negative (ends never precede starts)")
      assert(r.getLong(4) >= r.getLong(1), "peak at least the day's baseline")
      assert(r.getLong(4) <= r.getLong(1) + r.getLong(2),
        "peak bounded by baseline + day's starts")
    }
    // carry-in telescopes: next day's baseline = this baseline + net
    for (Array(a, b) <- rows.sliding(2).map(_.toArray)) {
      assert(b.getLong(1) == a.getLong(1) + a.getLong(2) - a.getLong(3),
        "carry-in is the running net of starts minus ends")
    }
    // global sanity: peak never exceeds the total session count
    assert(rows.map(_.getLong(4)).max <= nSessions)
  }

  test("q326 simpson: strata partition users, arms partition strata, directions consistent") {
    val rows = PipelineAudits.simpson(spark, sf).collect()
    assert(rows.nonEmpty)
    val nUsers = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(rows.map(r => r.getLong(1) + r.getLong(3)).sum == nUsers,
      "stratum arm counts partition the user base")
    for (r <- rows) {
      assert(r.getLong(2) <= r.getLong(1) && r.getLong(4) <= r.getLong(3),
        "conversions bounded by arm sizes")
      val dir = r.getInt(7)
      assert(dir >= -1 && dir <= 1)
      // direction agrees with the rate comparison when both arms exist
      if (r.getLong(1) > 0L && r.getLong(3) > 0L) {
        val pa = r.getLong(2).toDouble / r.getLong(1).toDouble
        val pb = r.getLong(4).toDouble / r.getLong(3).toDouble
        if (pb > pa) assert(dir == 1) else if (pb < pa) assert(dir == -1)
      }
      assert((r.getInt(9) == 1) == (r.getInt(7) * r.getInt(8) == -1),
        "flip flag replays from the two directions")
    }
    assert(rows.map(_.getInt(8)).distinct.length == 1, "pooled direction constant")
  }
}
