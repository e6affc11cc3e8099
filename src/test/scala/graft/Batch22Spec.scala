package graft

import graft.operators.{Dedup, EventOps, Relational}
import org.apache.spark.sql.functions._

/** Batch 24 (q330-q332): semantic invariants checked against direct
  * recounts — the SCD2 point-in-time probe, equi-depth histogram
  * statistics, and the snapshot reconciliation diff.
  */
class Batch22Spec extends SparkSuite {

  test("q330 pit join: purchases partition across states, every probe matches at most one version") {
    val rows = EventOps.pitJoin(spark, sf).collect()
    val nPurch = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(rows.map(_.getLong(1)).sum == nPurch,
      "every purchase lands in exactly one prior-state bucket")
    for (r <- rows) {
      assert(r.getLong(2) <= r.getLong(1), "users bounded by purchases")
      assert(r.getLong(1) >= 1L)
    }
    // the SCD2 partition invariant the join relies on: probing every
    // purchase instant-1 against the dimension yields <= 1 match each
    val dim = EventOps.scd2Dimension(spark, sf)
      .select(col("user_id"), col("valid_from_us"), col("valid_to_us"))
    val facts = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"),
        (unix_micros(col("ts")) - lit(1L)).as("p"))
    val matches = facts.join(dim, facts("user_id") === dim("user_id") &&
        col("p") >= col("valid_from_us") && col("p") < col("valid_to_us"))
      .groupBy(facts("user_id"), col("event_id")).count().collect()
    assert(matches.forall(_.getLong(2) == 1L),
      "SCD2 intervals partition time — no probe double-matches")
  }

  test("q331 equi-depth: buckets contiguous and balanced, bounds nest, masses recount") {
    val hist = Relational.equiDepthHist(spark, sf).collect()
    assert(hist.map(_.getInt(0)).toSeq == (1 to hist.length), "buckets contiguous from 1")
    val n = Tables.lineitem(spark, sf).count()
    assert(hist.map(_.getLong(3)).sum == n, "bucket masses partition the table")
    // equi-depth: sizes differ by at most 1, remainder buckets first
    val sizes = hist.map(_.getLong(3))
    assert(sizes.max - sizes.min <= 1L, "depths within 1 of each other")
    assert(sizes.zip(sizes.tail).forall { case (a, b) => a >= b },
      "ceil-sized remainder buckets come first (standard-SQL ntile)")
    // bounds: non-decreasing across buckets, lo <= hi within
    for (r <- hist) assert(r.getLong(1) <= r.getLong(2))
    for (Array(a, b) <- hist.sliding(2).map(_.toArray))
      assert(a.getLong(2) <= b.getLong(1) ||
        (a.getLong(2) == b.getLong(1)), "bucket ranges ordered (ties may touch)")
    for (Array(a, b) <- hist.sliding(2).map(_.toArray))
      assert(a.getLong(2) <= b.getLong(2) && a.getLong(1) <= b.getLong(1))
    for (r <- hist)
      assert(r.getLong(4) >= 1L && r.getLong(4) <= r.getLong(3),
        "distinct bounded by rows")
  }

  test("q332 snapshot diff: classes recount from the hash buckets, mass conserved") {
    val rows = Dedup.snapshotDiff(spark, sf).collect()
    def md5hv60(t: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.map(b => f"$b%02x").mkString.substring(0, 15), 16)
    }
    val ids = Tables.documents(spark, sf).select("doc_id").collect().map(_.getLong(0))
    val buckets = ids.groupBy(id => md5hv60(s"snap:$id") % 50L match {
      case 0L => "removed"
      case 1L => "changed"
      case 2L => "cloned"
      case _ => "unchanged"
    }).view.mapValues(_.length.toLong).toMap
    val byClass = rows.groupBy(_.getString(1)).view
      .mapValues(_.map(_.getLong(2)).sum).toMap
    assert(byClass("removed") == buckets.getOrElse("removed", 0L))
    assert(byClass("changed") == buckets.getOrElse("changed", 0L))
    assert(byClass("added") == buckets.getOrElse("cloned", 0L),
      "every cloned doc surfaces as added under the shifted key")
    assert(byClass("unchanged") ==
      buckets.getOrElse("unchanged", 0L) + buckets.getOrElse("cloned", 0L),
      "clones' originals stay unchanged")
    assert(rows.map(_.getLong(2)).sum ==
      ids.length + buckets.getOrElse("cloned", 0L),
      "diff mass = |A ∪ B| keys")
  }

  test("q333 hll merge: theorem holds on every register, merged table equals q323's registers") {
    val rows = graft.operators.PipelineAudits.hllMerge(spark, sf).collect()
    assert(rows.length == 64)
    assert(rows.forall(_.getInt(4) == 1),
      "max-merge equals the direct sketch on every register (associativity)")
    assert(rows.forall(r => r.getLong(1) == r.getLong(2)))
    // the merged registers ARE q323's registers
    val direct = graft.operators.PipelineAudits.hllReplay(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (r <- rows)
      assert(direct(r.getLong(0)) == r.getLong(1), "matches the q323 register table")
    val nSources = Tables.documents(spark, sf).select("source").distinct().count()
    assert(rows.forall(r => r.getLong(3) >= 0L && r.getLong(3) <= nSources))
    // a silent register is silent in every source
    for (r <- rows if r.getLong(1) == 0L)
      assert(r.getLong(3) == 0L, "empty register means no source touched it")
  }
}
