package graft

import graft.operators.{EventOps, PipelineAudits}
import org.apache.spark.sql.functions._

/** Batch 23 (q327-q329): semantic invariants checked against direct
  * recounts — the UCB1 bandit replay, IPF raking calibration, and the
  * referential-erasure cascade audit.
  */
class Batch21Spec extends SparkSuite {

  test("q327 ucb: one chosen arm per day, priors telescope, ucb dominates mean") {
    val rows = EventOps.ucbReplay(spark, sf).collect()
    assert(rows.nonEmpty)
    val byDay = rows.groupBy(_.getLong(0))
    for ((_, rs) <- byDay) {
      assert(rs.length == 3, "all three arms scored every emitted day")
      assert(rs.map(_.getInt(7)).sum == 1, "exactly one chosen arm per day")
      // the chosen arm carries the maximal ucb (ties to smallest arm)
      val best = rs.maxBy(r => (r.getDouble(6), -r.getLong(1)))
      assert(best.getInt(7) == 1, "argmax is the chosen arm")
    }
    for (r <- rows) {
      assert(r.getLong(5) <= r.getLong(4), "successes bounded by trials")
      assert(r.getDouble(6) > r.getLong(5).toDouble / r.getLong(4).toDouble,
        "ucb strictly exceeds the mean (bonus > 0 once t_prior >= 2)")
    }
    // priors telescope per arm: next day's prior = prior + that day's obs
    for ((_, rs) <- rows.groupBy(_.getLong(1))) {
      val seq = rs.sortBy(_.getLong(0))
      for (Array(a, b) <- seq.sliding(2).map(_.toArray)) {
        assert(b.getLong(4) == a.getLong(4) + a.getLong(2), "n_prior telescopes")
        assert(b.getLong(5) == a.getLong(5) + a.getLong(3), "x_prior telescopes")
      }
    }
  }

  test("q328 raking: lang margin matches targets after the final lang step, weights positive") {
    val rows = PipelineAudits.raking(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(3) > 0L), "weights stay positive")
    // the LAST half-step scaled on lang, so the weighted lang margin
    // must hit the lang targets to within quantization (1e-6 per cell)
    val langT = Tables.documents(spark, sf).groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((lang, rs) <- rows.groupBy(_.getString(1))) {
      val achieved = rs.map(r => r.getLong(2) * r.getLong(3)).sum.toDouble / 1.0e6
      val target = langT(lang).toDouble
      assert(math.abs(achieved - target) < 1.0e-3 * target + 1.0e-2,
        s"lang '$lang' margin $achieved vs target $target")
    }
    // src_achieved replays from the cells themselves
    for ((src, rs) <- rows.groupBy(_.getString(0))) {
      val ms = rs.map(r => r.getLong(2) * r.getLong(3)).sum
      for (r <- rs)
        assert(r.getDouble(6) == ms.toDouble / 1.0e6, "src_achieved replays")
      assert(rs.map(_.getLong(5)).distinct.length == 1, "src_target constant per source")
    }
  }

  test("q329 erasure: forgotten bounded, cascade counts recount, revenue non-negative") {
    val rows = PipelineAudits.erasureCascade(spark, sf).collect()
    val nNations = Tables.customer(spark, sf).select("c_nationkey").distinct().count()
    assert(rows.length == nNations, "one row per customer-bearing nation")
    assert(rows.map(_.getLong(1)).sum == Tables.customer(spark, sf).count(),
      "customer totals partition the customer table")
    for (r <- rows) {
      assert(r.getLong(2) <= r.getLong(1), "forgotten bounded by customers")
      assert(r.getDouble(5) >= 0.0)
      if (r.getLong(2) == 0L)
        assert(r.getLong(3) == 0L && r.getLong(4) == 0L && r.getDouble(5) == 0.0,
          "no forgotten customers, no cascade")
    }
    // cascade order count recounts directly (JVM-side md5 fold — the
    // OperatorSpec md5hv60 twin keeps the hash contract independent)
    def md5hv60(t: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.map(b => f"$b%02x").mkString.substring(0, 15), 16)
    }
    val forgottenKeys = Tables.customer(spark, sf).select("c_custkey").collect()
      .map(_.getLong(0)).filter(k => md5hv60(s"forget:$k") % 20L == 0L).toSet
    assert(forgottenKeys.size.toLong == rows.map(_.getLong(2)).sum,
      "forgotten designation recounts via the independent JVM hash")
    val orderRecount = Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey")).collect()
      .count(r => forgottenKeys.contains(r.getLong(0)))
    // the LEFT lineitem join keeps line-less orders (the fixture ships
    // one) in the cascade, so the recount matches exactly
    assert(rows.map(_.getLong(3)).sum == orderRecount, "cascade orders recount")
  }
}
