package graft

import graft.operators.{Dedup, EventOps, Multimodal, PipelineAudits, Similarity}
import org.apache.spark.sql.functions._

/** Batch 20 (q316-q320): semantic invariants checked against direct
  * recounts — label-propagation communities over the LSH dup graph,
  * perceptual-hash payload dedup, the Fisher-ratio dimension audit,
  * the replayable Laplace DP release, and PrefixSpan-style sequence
  * mining.
  */
class Batch18Spec extends SparkSuite {

  test("q316 label prop: ranks contiguous, sizes non-increasing, members bounded by graph nodes") {
    val rows = Dedup.labelProp(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getInt(0)).toSeq == (1 to rows.length), "ranks contiguous")
    val sizes = rows.map(_.getLong(2))
    assert(sizes.zip(sizes.tail).forall { case (a, b) => a >= b }, "sizes non-increasing")
    assert(sizes.forall(_ >= 1L))
    assert(rows.map(_.getLong(1)).distinct.length == rows.length, "communities distinct")
    for (r <- rows)
      assert(r.getLong(3) <= r.getLong(4), "min_doc <= max_doc")
    // communities partition a subset of the LSH graph's node set
    val pairs = Dedup.minhashLsh(spark, sf)
    val nNodes = pairs.select(col("doc_a").as("v"))
      .unionAll(pairs.select(col("doc_b").as("v"))).distinct().count()
    assert(sizes.sum <= nNodes, "top-K member mass bounded by node count")
    // a singleton community's label is its own (only) member
    for (r <- rows if r.getLong(2) == 1L)
      assert(r.getLong(3) == r.getLong(4), "singleton bounds collapse")
  }

  test("q317 phash dedup: global dup recount, redundancy bounded, cross-pair mass even") {
    val rows = Multimodal.phashDedup(spark, sf).collect()
    assert(rows.nonEmpty)
    val hashed = Multimodal.payloads(spark, sf)
      .filter(length(col("payload")) >= 33)
    val nHashed = hashed.count()
    assert(rows.map(_.getLong(1)).sum == nHashed,
      "per-source payload counts partition the hashed payloads")
    for (r <- rows) {
      assert(r.getLong(2) <= r.getLong(1), "distinct phash bounded by payloads")
      assert(r.getLong(3) <= r.getLong(1), "dup count bounded by payloads")
      assert(r.getLong(5) >= 0L && r.getLong(6) >= 0L)
    }
    // rn>1 rows are exactly payloads minus GLOBAL distinct hashes
    val distinctGlobal = rows.map(_.getLong(2)).sum // upper bound only (per-source)
    assert(rows.map(_.getLong(3)).sum <= nHashed - 1L)
    assert(distinctGlobal >= nHashed - rows.map(_.getLong(3)).sum,
      "per-source distinct sum bounds the global survivor count")
    // each cross pair contributes one unit to BOTH endpoint sources
    assert(rows.map(_.getLong(6)).sum % 2 == 0, "cross-pair mass even")
  }

  test("q318 fisher dims: per-label top-5 contiguous, F non-negative non-increasing, n_l recounts") {
    val rows = Similarity.fisherDims(spark, sf).collect()
    assert(rows.nonEmpty)
    val byLabel = rows.groupBy(_.getInt(0))
    val nPerLabel = Tables.embeddings(spark, sf).groupBy("label").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val dimCount = Tables.embeddings(spark, sf)
      .select(size(col("embedding"))).first().getInt(0)
    for ((label, rs) <- byLabel) {
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to sorted.length), "ranks contiguous")
      val fs = sorted.map(_.getDouble(4))
      assert(fs.forall(_ >= 0.0), "Fisher ratio non-negative")
      assert(fs.zip(fs.tail).forall { case (a, b) => a >= b }, "F non-increasing")
      for (r <- sorted) {
        assert(r.getLong(3) == nPerLabel(label), "n_l is the label's vector count")
        assert(r.getInt(2) >= 0 && r.getInt(2) < dimCount, "dim in range")
      }
      assert(sorted.map(_.getInt(2)).distinct.length == sorted.length,
        "top dims distinct within a label")
    }
  }

  test("q319 dp laplace: released replays, 95-band flag consistent, noise deterministic") {
    val rows = PipelineAudits.dpLaplace(spark, sf).collect()
    val trueCounts = Tables.documents(spark, sf).groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.length == trueCounts.size * 3, "three epsilons per source")
    for (r <- rows) {
      val eps = r.getDouble(1)
      assert(Seq(0.1, 1.0, 10.0).contains(eps))
      assert(r.getLong(2) == trueCounts(r.getString(0)), "true count recounts")
      assert(r.getDouble(4) == r.getLong(2).toDouble + r.getDouble(3),
        "released = true + noise exactly")
      val band = math.log(20.0) / eps
      assert((r.getInt(5) == 1) == (math.abs(r.getDouble(3)) <= band),
        "within_95 flag consistent with the Laplace band")
    }
    // keyed-PRF noise: bit-identical on a second run
    val again = PipelineAudits.dpLaplace(spark, sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq,
      "DP release replayable")
  }

  test("q320 seq patterns: ranks contiguous per length, support bounded, top pair recounts") {
    val rows = EventOps.seqPatterns(spark, sf).collect()
    val nUsers = Tables.events(spark, sf).select("user_id").distinct().count()
    for ((len, rs) <- rows.groupBy(_.getInt(0))) {
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to sorted.length), s"len-$len ranks contiguous")
      val supp = sorted.map(_.getLong(3))
      assert(supp.zip(supp.tail).forall { case (a, b) => a >= b }, "support non-increasing")
      assert(supp.forall(s => s >= 1L && s <= nUsers), "support bounded by users")
      for (r <- sorted)
        assert(r.getDouble(4) == r.getLong(3).toDouble / nUsers.toDouble,
          "support_rate replays")
    }
    // recount the top pair directly: a>b holds iff first(a) < last(b)
    val top = rows.filter(_.getInt(0) == 2).minBy(_.getInt(1))
    val Array(a, b) = top.getString(2).split(">")
    val ev = Tables.events(spark, sf).select(col("user_id"), col("event_type"),
      (unix_millis(col("ts")) * lit(1048576L) + col("event_id")).as("k"))
    val recount = ev.filter(col("event_type") === a)
      .groupBy("user_id").agg(min(col("k")).as("f"))
      .join(ev.filter(col("event_type") === b)
        .groupBy("user_id").agg(max(col("k")).as("l")), "user_id")
      .filter(col("f") < col("l")).count()
    assert(recount == top.getLong(3), "top pair support recounts")
    // every triple's support is bounded by both embedded pair supports
    val pairSupp = rows.filter(_.getInt(0) == 2)
      .map(r => r.getString(2) -> r.getLong(3)).toMap
    for (r <- rows.filter(_.getInt(0) == 3)) {
      val Array(x, y, z) = r.getString(2).split(">")
      pairSupp.get(s"$x>$y").foreach(s => assert(r.getLong(3) <= s, "abc <= ab"))
      pairSupp.get(s"$y>$z").foreach(s => assert(r.getLong(3) <= s, "abc <= bc"))
    }
  }
}
