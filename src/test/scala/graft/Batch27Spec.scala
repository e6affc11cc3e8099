package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Batch 34 (q351, q352): the ExactSubstr CUT and coverage rollup
  * COMPOSED with the q334 df-capped anchor frame — fixture-identical
  * where the cap is slack, token-superset/cut-subset where it binds,
  * and accounting that survives even a corpus where the cap removes
  * every span (the zero-span-safe path).
  */
class Batch27Spec extends SparkSuite {

  private val hot = "the quick brown fox jumps over the lazy dog again and again today"
  private val rare = "zeta eta theta iota kappa lambda mu nu xi omicron pi rho sigma tau"

  /** 6 verbatim copies of the hot line (every 5-gram df=6 > cap 4)
    * plus two docs sharing a rare 14-token span (df=2, survives).
    */
  private def craftedDocs = {
    import spark.implicits._
    ((1 to 6).map(i => (i.toLong, hot)) ++
      Seq((100L, s"prefix one two three $rare"),
          (101L, s"$rare suffix four five six")))
      .toDF("doc_id", "text")
      .withColumn("source", concat(lit("s"), pmod(col("doc_id"), lit(2L))))
  }

  test("q351 capped cut == q337 cut on the fixture (cap slack), accounting zero") {
    val capped = Dedup.exactSubstrCutCapped(spark, sf).collect()
    assert(capped.forall(r => r.getLong(5) == 0L && r.getLong(6) == 0L),
      "no grams capped on the fixture (measured max 5-gram df is 4)")
    val cappedVals = capped.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toSet
    val uncapped = Dedup.exactSubstrCut(spark, sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))).toSet
    assert(cappedVals == uncapped, "capped cut identical where the cap is slack")
    assert(capped.exists(_.getLong(3) > 0L), "fixture has cut mass")
  }

  test("q352 capped coverage == q301 coverage on the fixture, accounting zero") {
    val capped = Dedup.dupCoverageCapped(spark, sf).collect()
    assert(capped.forall(r => r.getLong(5) == 0L && r.getLong(6) == 0L))
    val cappedVals = capped.map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSet
    val uncapped = Dedup.dupCoverage(spark, sf).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSet
    assert(cappedVals == uncapped, "capped coverage identical where the cap is slack")
  }

  test("crafted hot gram: capped cut keeps a SUPERSET of tokens (cuts less, never more)") {
    val docs = craftedDocs
    val grams = Dedup.positionalGramsFrom(docs, 5)
    val uncapped = Dedup.exactSubstrCutFrom(docs,
        Dedup.exactSubstrSpansFrom(grams, 5, 12)).collect()
      .map(r => r.getLong(0) -> r).toMap
    val (kept, acc) = Dedup.cappedGramsAndAccounting(grams, 4)
    val capped = Dedup.exactSubstrCutFrom(docs,
        Dedup.exactSubstrSpansFrom(kept, 5, 12))
      .crossJoin(broadcast(acc)).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(capped.keySet == uncapped.keySet, "one row per document on both paths")
    // superset of tokens: the cap can only break/shorten runs, so the
    // capped cut's kept count dominates per document
    assert(capped.forall { case (id, r) => r.getLong(2) >= uncapped(id).getLong(2) },
      "capped n_kept >= uncapped n_kept for every document")
    // hot-line docs 2..6: uncapped cuts all 13 tokens; capped cuts none
    for (id <- 2L to 6L) {
      assert(uncapped(id).getLong(3) == 13L, s"uncapped cuts doc $id entirely")
      assert(capped(id).getLong(3) == 0L && capped(id).getString(4) == hot,
        s"capped leaves hot-only doc $id verbatim (grams never reach the join)")
    }
    // the rare span's anchors are df=2 <= cap: doc 101 cut identically
    assert(capped(101L).getLong(3) == 14L &&
      capped(101L).getString(4) == uncapped(101L).getString(4) &&
      capped(101L).getString(4) == "suffix four five six",
      "rare cross-doc span still cut, survivor side intact")
    // accounting on EVERY row: 9 hot grams, 6 occurrences each
    assert(capped.values.forall(r => r.getLong(5) == 9L && r.getLong(6) == 54L),
      "grams_capped=9, anchors_dropped=54 ride every output row")
    // token conservation holds on both paths
    assert(capped.values.forall(r => r.getLong(2) + r.getLong(3) == r.getLong(1)))
  }

  test("zero-span corpus: accounting SURVIVES the cap removing every span") {
    import spark.implicits._
    // hot line only: the cap drops every anchor, the span frame is
    // EMPTY — the q334 span-row path would lose the accounting here
    // (documented edge case); the cut path must not
    val docs = (1 to 6).map(i => (i.toLong, hot)).toDF("doc_id", "text")
      .withColumn("source", lit("s0"))
    val grams = Dedup.positionalGramsFrom(docs, 5)
    val (kept, acc) = Dedup.cappedGramsAndAccounting(grams, 4)
    assert(Dedup.exactSubstrSpansFrom(kept, 5, 12).isEmpty,
      "every span died under the cap")
    val cut = Dedup.exactSubstrCutFrom(docs,
        Dedup.exactSubstrSpansFrom(kept, 5, 12))
      .crossJoin(broadcast(acc)).collect()
    assert(cut.length == 6, "one row per document regardless")
    assert(cut.forall(r => r.getLong(3) == 0L && r.getString(4) == hot),
      "nothing cut, text verbatim")
    assert(cut.forall(r => r.getLong(5) == 9L && r.getLong(6) == 54L),
      "drop accounting reported on every row despite zero spans")
    val cov = Dedup.dupCoverageFrom(docs,
        Dedup.exactSubstrSpansFrom(kept, 5, 12))
      .crossJoin(broadcast(acc)).collect()
    assert(cov.length == 1 && cov.head.getLong(3) == 0L &&
      cov.head.getLong(5) == 9L && cov.head.getLong(6) == 54L,
      "coverage rollup carries the accounting through zero spans too")
  }

  test("q353 yield v2: monotone non-increasing through the cut stage; stage 5 prices the cut") {
    val rows = graft.operators.PipelineAudits.yieldV2(spark, sf).collect()
    assert(rows.length == 6, "six gates: raw through substr_cut")
    assert(rows.map(_.getInt(0)).toSeq == (0 to 5), "stages contiguous")
    assert(rows.last.getString(1) == "substr_cut")
    val docs = rows.map(_.getLong(2))
    val toks = rows.map(_.getLong(3))
    assert(docs.zip(docs.tail).forall { case (a, b) => b <= a },
      "doc counts monotone non-increasing through every gate")
    assert(toks.zip(toks.tail).forall { case (a, b) => b <= a },
      "token mass monotone non-increasing through every gate")
    assert(toks.last > 0L, "the cut leaves a corpus")
    // the first five gates are exactly q349's report
    val v1 = graft.operators.PipelineAudits.pipelineYield(spark, sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.take(5).map(r =>
      (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq == v1.toSeq,
      "v2 extends q349 without disturbing it")
  }

  test("q354 stats IVM: merged partials == full recompute; delta accounting real") {
    val rows = graft.operators.Relational.statsIvm(spark, sf).collect()
    assert(rows.length == 5, "count/min/max/sum/ndv")
    assert(rows.forall(_.getInt(3) == 1),
      "every mergeable stat matches the direct recompute")
    assert(rows.forall(r => r.getLong(1) == r.getLong(2)),
      "merged_value == direct_value (the flag is honest)")
    val r0 = rows.head
    assert(r0.getLong(4) > 0L && r0.getLong(5) > 0L,
      "both prior and delta day ranges are non-empty")
    val total = rows.find(_.getString(0) == "count").get.getLong(2)
    assert(r0.getLong(6) > 0L && r0.getLong(6) < total,
      "the incremental refresh scans strictly fewer rows than a full recompute")
  }

  test("crafted hot gram: capped coverage covers a SUBSET of positions") {
    val docs = craftedDocs
    val grams = Dedup.positionalGramsFrom(docs, 5)
    def bySource(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      df.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val uncapped = bySource(Dedup.dupCoverageFrom(docs,
      Dedup.exactSubstrSpansFrom(grams, 5, 12)))
    val (kept, _) = Dedup.cappedGramsAndAccounting(grams, 4)
    val capped = bySource(Dedup.dupCoverageFrom(docs,
      Dedup.exactSubstrSpansFrom(kept, 5, 12)))
    assert(capped.keySet == uncapped.keySet)
    assert(capped.forall { case (s, n) => n <= uncapped(s) },
      "capped covered positions per source never exceed the uncapped truth")
    assert(capped.values.sum < uncapped.values.sum,
      "the cap actually bound (hot-line coverage gone)")
    assert(capped.values.sum > 0L, "the rare span's coverage remains")
  }
}
