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
}
