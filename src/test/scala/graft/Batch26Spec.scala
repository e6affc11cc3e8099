package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

/** Batch 32 (q347-q348): the CBO loop's final decisions — the
  * re-ANALYZE drift gate and the join-order choice — checked against
  * their own boundary identities and ground-truth recounts.
  */
class Batch26Spec extends SparkSuite {

  test("q347 freshness: full-range scales exactly, empty range never flags, flags recount") {
    val rows = Relational.statsFreshness(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 6L))
    val n = Tables.lineitem(spark, sf).count()
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    // the full-range predicate covers every stale bucket completely:
    // est = n_stale exactly, so the scale-up lands on n_today exactly
    assert(byId(2L).getDouble(3) == n.toDouble, "scaled full-range estimate exact")
    assert(byId(2L).getDouble(5) == 0.0 && byId(2L).getInt(6) == 0)
    // below-min: zero actual, NULL error, never a refresh trigger
    assert(byId(5L).getLong(4) == 0L && byId(5L).isNullAt(5) && byId(5L).getInt(6) == 0)
    for (r <- rows if !r.isNullAt(5)) {
      assert((r.getInt(6) == 1) == (r.getDouble(5) > 0.10), "flag == err > 10%")
      assert(r.getDouble(5) ==
        math.abs(r.getDouble(3) - r.getLong(4).toDouble) / r.getLong(4).toDouble)
    }
    // a 90% uniform sample's scaled estimates stay within 10% on the
    // broad predicates — the gate should NOT cry wolf on mere sampling
    for (id <- Seq(1L, 2L, 3L, 4L))
      assert(byId(id).getInt(6) == 0, s"pred $id flagged refresh on a fresh-enough table")
  }

  test("q348 join order: FK chain makes both estimates exact; co_first wins; actuals recount") {
    val rows = Relational.joinOrderAdvisor(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("co_first", "ol_first"))
    assert(rows.map(_.getInt(4)).sum == 1, "exactly one order is chosen")
    val co = rows(0); val ol = rows(1)
    assert(co.getInt(4) == 1, "the smaller intermediate (orders-sized) wins")
    // on a clean FK fixture the containment estimate is EXACT:
    // n·n/max(d,d) collapses to the child cardinality
    assert(co.getDouble(1) == co.getLong(2).toDouble, "est_co exact on FK join")
    assert(ol.getDouble(1) == ol.getLong(2).toDouble, "est_ol exact on FK join")
    val aCo = Tables.customer(spark, sf).join(Tables.orders(spark, sf),
      col("c_custkey") === col("o_custkey")).count()
    val aOl = Tables.orders(spark, sf).join(Tables.lineitem(spark, sf),
      col("o_orderkey") === col("l_orderkey")).count()
    assert(co.getLong(2) == aCo && ol.getLong(2) == aOl, "actual intermediates recount")
    assert(co.getDouble(3) > 0.0 && ol.getDouble(3) > 0.0)
  }

  test("q349 yield: gates cumulative and monotone, raw row exact, retentions recount") {
    val rows = operators.PipelineAudits.pipelineYield(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq == (0 to 4))
    val docs = rows.map(_.getLong(2)); val toks = rows.map(_.getLong(3))
    assert(docs.zip(docs.tail).forall { case (a, b) => b <= a }, "docs monotone down")
    assert(toks.zip(toks.tail).forall { case (a, b) => b <= a }, "tokens monotone down")
    assert(docs.head == Tables.documents(spark, sf).count(), "raw stage exact")
    assert(docs.last >= 1, "something survives the whole pipeline")
    for (r <- rows) {
      assert(r.getDouble(4) == r.getLong(2).toDouble / docs.head.toDouble)
      assert(r.getDouble(5) == r.getLong(3).toDouble / toks.head.toDouble)
    }
  }

  test("q350 mixture: quotas never exceeded, packing greedy-maximal, utilization recounts") {
    val rows = operators.PipelineAudits.mixtureSample(spark, sf).collect()
    val quotas = operators.PipelineAudits.tokenBudget(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(4)).toMap
    assert(rows.map(_.getString(0)).toSet == quotas.keySet, "every source reports")
    for (r <- rows) {
      assert(r.getLong(1) == quotas(r.getString(0)), "quota column is the q345 alloc")
      assert(r.getLong(3) <= r.getLong(1), "packed tokens never exceed the quota")
      assert(r.getDouble(4) == r.getLong(3).toDouble / r.getLong(1).toDouble)
      assert(r.getLong(2) >= 1, "fixture quotas admit at least one doc per source")
    }
    // greedy maximality: for one source, the first EXCLUDED doc in
    // hash order must overflow the quota
    val src = rows.head.getString(0)
    val packedToks = rows.head.getLong(3)
    val quota = rows.head.getLong(1)
    val nPacked = rows.head.getLong(2).toInt
    val ordered = Tables.documents(spark, sf).filter(col("source") === src)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("tok")).collect()
      .map { r =>
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(s"mx:${r.getLong(0)}".getBytes("UTF-8"))
        val hv = java.lang.Long.parseLong(
          d.map(b => f"$b%02x").mkString.substring(0, 15), 16)
        (hv, r.getLong(0), r.getLong(1))
      }.sortBy(t => (t._1, t._2))
    assert(ordered.take(nPacked).map(_._3).sum == packedToks,
      "the packed set is exactly the hash-order prefix")
    if (nPacked < ordered.length)
      assert(packedToks + ordered(nPacked)._3 > quota,
        "the next doc in hash order would overflow — packing is maximal")
  }
}
