package graft

import graft.operators.{Dedup, Relational}
import org.apache.spark.sql.functions._

/** Batch 27 (q335): the q331 CBO loop closed — selectivity estimates
  * interpolated from the equi-depth histogram, checked against exact
  * recounts and against the estimator's own boundary identities.
  */
class Batch24Spec extends SparkSuite {

  test("q335 selectivity: full-range estimate is exact, empty range is zero, errors recount") {
    val rows = Relational.selectivityAudit(spark, sf).collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 6L), "all six pinned predicates")
    val n = Tables.lineitem(spark, sf).count()
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    // predicate 2 covers every bucket fully: the interpolation
    // degenerates to sum of exact bucket masses — est == n EXACTLY
    assert(byId(2L).getDouble(3) == n.toDouble, "full-range estimate exact")
    assert(byId(2L).getLong(4) == n)
    // predicate 5 sits below the corpus minimum: both sides zero
    assert(byId(5L).getDouble(3) == 0.0 && byId(5L).getLong(4) == 0L)
    // actuals recount against a direct filter; abs_err is |est-actual|
    val cents = Tables.lineitem(spark, sf)
      .select(floor(col("l_extendedprice") * lit(100.0) + lit(0.5))
        .cast("long").as("v"))
    for (r <- rows) {
      val act = cents.filter(col("v") >= r.getLong(1) && col("v") <= r.getLong(2)).count()
      assert(r.getLong(4) == act, s"actual recount for pred ${r.getLong(0)}")
      assert(r.getDouble(5) == math.abs(r.getDouble(3) - act.toDouble))
      assert(r.getDouble(3) >= 0.0)
    }
    // the equi-depth histogram earns its keep: on the broad in-range
    // predicates the uniform-within-bucket estimate lands within 15%
    // of truth (loose — this guards gross regressions, not the value)
    for (id <- Seq(1L, 3L, 4L); r = byId(id) if r.getLong(4) > 0) {
      val rel = r.getDouble(5) / r.getLong(4).toDouble
      assert(rel <= 0.15, s"pred $id relative error $rel out of band")
    }
  }

  test("q338 multi-col stats: one scan's rows everywhere, moments recount, ndv bounded") {
    val rows = Relational.multiColStats(spark, sf).collect()
    val n = Tables.lineitem(spark, sf).count()
    assert(rows.length == 4)
    for (r <- rows) {
      assert(r.getLong(1) == n, "n_rows is the table cardinality")
      assert(r.getLong(2) == 0L, "fixture has no nulls — computed, not assumed")
      assert(r.getLong(3) >= 1L && r.getLong(3) <= n, "ndv in [1, n]")
      assert(r.getLong(4) <= r.getLong(5), "min <= max")
      assert(r.getDouble(7) == r.getLong(6).toDouble / n.toDouble, "avg = sum/n")
    }
    val qty = rows.find(_.getString(0) == "l_quantity").get
    val direct = Tables.lineitem(spark, sf)
      .select(floor(col("l_quantity") * lit(100.0) + lit(0.5)).cast("long").as("v"))
      .agg(sum(col("v")), countDistinct(col("v"))).head()
    assert(qty.getLong(6) == direct.getLong(0) && qty.getLong(3) == direct.getLong(1))
  }

  test("q339 bloom prune: zero false negatives, pass superset of true, fpr sane, bits bounded") {
    val r = Relational.bloomPruneAudit(spark, sf).head()
    assert(r.getLong(6) == 0L, "a true match can never fail its own bits")
    assert(r.getLong(4) >= r.getLong(3), "pass is a superset of true")
    assert(r.getLong(1) <= math.min(16384L, 2L * r.getLong(0)),
      "bit set bounded by 2 hashes per key and by m")
    assert(r.getLong(2) > r.getLong(3), "fixture has true negatives to measure FPR on")
    val fpr = r.getDouble(7)
    assert(fpr >= 0.0 && fpr < 0.5, s"k=2/m=16384 bloom FPR sane, got $fpr")
    val truth = Tables.lineitem(spark, sf).select(col("l_orderkey"))
      .join(Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === "1-URGENT").select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    assert(r.getLong(3) == truth, "n_true recounts against the real semi join")
  }

  test("q340 contamination: eval spine complete, flags recount, hits bounded") {
    val rows = Dedup.evalContamination(spark, sf).collect()
    // recount the hash designation with a LOCAL md5 fold (hv60 is
    // private[operators] by design — the OperatorSpec.md5hv60 rule)
    def md5hv60(t: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.map(b => f"$b%02x").mkString.substring(0, 15), 16)
    }
    val nEval = Tables.documents(spark, sf).select(col("doc_id")).collect()
      .map(_.getLong(0)).count(id => md5hv60(s"ev:$id") % 10L == 0L).toLong
    assert(rows.length == nEval && nEval > 0, "every hash-designated eval doc reports")
    for (r <- rows) {
      assert(r.getLong(2) <= r.getLong(1), "hits bounded by grams")
      assert((r.getInt(4) == 1) == (r.getLong(2) >= 1L), "flag consistent")
      if (r.getLong(1) > 0)
        assert(r.getDouble(3) == r.getLong(2).toDouble / r.getLong(1).toDouble)
      else assert(r.isNullAt(3), "short docs surface with NULL fraction")
    }
    assert(rows.exists(_.getInt(4) == 1), "fixture dup pressure reaches the split")
  }

  test("q341 stats merge: the certification actually certifies — all five stats match") {
    val rows = Relational.statsMergeCert(spark, sf).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq ==
      Seq("count", "max", "min", "ndv", "sum"))
    assert(rows.forall(_.getInt(3) == 1),
      "merged partials equal direct stats bit-for-bit")
    val n = Tables.documents(spark, sf).count()
    assert(rows.find(_.getString(0) == "count").get.getLong(1) == n)
  }

  test("q342 encoding advisor: formula recounts; low-NDV columns dict, near-unique stays plain") {
    val rows = Relational.encodingAdvisor(spark, sf).collect()
    for (r <- rows) {
      val (n, d, bits) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(bits == math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(
        math.max(1L, d - 1))), "idx_bits = bitlen(ndv-1)")
      assert(r.getLong(4) == n * 8)
      assert(r.getLong(5) == d * 8 + (n * bits + 7) / 8, "dict bytes recount")
      assert((r.getString(6) == "dict") == (r.getLong(5) < r.getLong(4)))
    }
    val by = rows.map(r => r.getString(0) -> r.getString(6)).toMap
    assert(by("l_discount") == "dict" && by("l_tax") == "dict",
      "11-value columns dictionary-encode")
    assert(by("l_extendedprice") == "plain", "near-unique prices stay plain")
  }
}
