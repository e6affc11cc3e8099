package graft

import graft.operators.{EventOps, PipelineAudits}
import org.apache.spark.sql.functions._

/** Batch 21 (q321-q323): semantic invariants checked against direct
  * recounts — rank-1 ALS factorization, the t-closeness release
  * gate, and the register-replayed HyperLogLog sketch.
  */
class Batch19Spec extends SparkSuite {

  test("q321 als: ranks contiguous, factor non-increasing and positive, num/den replay") {
    val rows = EventOps.alsRank1(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getInt(0)).toSeq == (1 to rows.length), "ranks contiguous")
    val vs = rows.map(_.getDouble(5))
    assert(vs.zip(vs.tail).forall { case (a, b) => a >= b }, "factor non-increasing")
    assert(vs.forall(_ > 0.0), "all-positive ratings give all-positive factors")
    for (r <- rows) {
      assert(r.getLong(2) >= 1L, "every ranked part has raters")
      assert(r.getLong(3) > 0L && r.getLong(4) > 0L, "num/den positive")
      assert(r.getDouble(5) == r.getLong(3).toDouble * 1.0e6 / r.getLong(4).toDouble,
        "factor replays from the exact num/den pair")
    }
    // n_raters recounts: distinct customers with >=1 order line of the part
    val deg = Tables.orders(spark, sf).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_partkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_partkey")).distinct()
      .groupBy("l_partkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (r <- rows)
      assert(deg(r.getLong(1)) == r.getLong(2), s"rater recount for part ${r.getLong(1)}")
  }

  test("q322 t-closeness: groups constant, violations monotone DECREASING in t, rates bounded") {
    val rows = PipelineAudits.tCloseness(spark, sf).collect()
    assert(rows.map(_.getDouble(0)).toSeq == Seq(0.15, 0.25, 0.4))
    assert(rows.map(_.getLong(1)).distinct.length == 1, "group count independent of t")
    // a looser threshold can only admit more cells: violations and
    // risk mass are monotone NON-INCREASING as t grows
    val viol = rows.map(_.getLong(2))
    assert(viol.zip(viol.tail).forall { case (a, b) => a >= b },
      "violations monotone non-increasing in t")
    val risk = rows.map(_.getLong(3))
    assert(risk.zip(risk.tail).forall { case (a, b) => a >= b })
    val nGroups = Tables.documents(spark, sf)
      .select(col("source"), expr("n_chars div 100").as("band"))
      .distinct().count()
    assert(rows.head.getLong(1) == nGroups, "groups recount as distinct QI cells")
    for (r <- rows) {
      assert(r.getLong(2) <= r.getLong(1), "violating groups bounded by groups")
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
    }
  }

  test("q323 hll: full register spine, rho bounded, estimate replays from registers, flag consistent") {
    val rows = PipelineAudits.hllReplay(spark, sf).collect()
    assert(rows.length == 64, "all 64 registers present, silent ones included")
    assert(rows.map(_.getLong(0)).toSeq == (0L until 64L), "spine ordered 0..63")
    assert(rows.forall(r => r.getLong(1) >= 0L && r.getLong(1) <= 55L),
      "rho rank within the 54-bit suffix bound")
    val est = rows.map(_.getDouble(3)).distinct
    val exact = rows.map(_.getLong(2)).distinct
    assert(est.length == 1 && exact.length == 1, "summary columns constant")
    // replay the estimator from the register table itself
    val s = rows.map(r => 1L << (55 - r.getLong(1)).toInt).sum
    val v = rows.count(_.getLong(1) == 0L)
    val raw = ((0.709 * 4096.0) * 36028797018963968.0) / s.toDouble
    val expected =
      if (raw <= 160.0 && v > 0) 64.0 * math.log(64.0 / v.toDouble) else raw
    assert(est.head == expected, "estimate replays from the 64 registers")
    // exact recount
    val nTok = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "").select("token").distinct().count()
    assert(exact.head == nTok, "exact distinct recounts")
    val flag = rows.head.getInt(4)
    assert((flag == 1) == (math.abs(est.head - nTok.toDouble) <= 0.39 * nTok.toDouble),
      "3-sigma flag consistent")
  }
}
