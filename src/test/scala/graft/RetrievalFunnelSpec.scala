package graft

import graft.operators.{EventOps, Relational, TextAnalysis}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Unit coverage for the round-11 batch-2 surface: BM25 retrieval
  * (q88), per-source KL drift (q89), the ordered conversion funnel
  * (q90) and retention cohorts (q91) — each against a hand-computed
  * tiny fixture written as real parquet so the operators read it
  * through the same Tables loaders as production.  The DuckDB oracle
  * gate is the cross-engine parity check; these tests pin the
  * SEMANTICS (ordering rules, strict-after funnel stages, cohort
  * arithmetic, KL edge cases) on inputs small enough to verify by
  * hand.
  */
class RetrievalFunnelSpec extends SparkSuite {
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    val dir = Files.createTempDirectory("graft-rfspec").toString
    rows.map { case (id, text, src) => (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def writeEvents(rows: Seq[(Long, Long, Long, String)]): String = {
    val dir = Files.createTempDirectory("graft-rfspec").toString
    rows.toDF("event_id", "ms", "user_id", "event_type")
      .select(col("event_id"), timestamp_millis(col("ms")).as("ts"),
        col("user_id"), col("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  // ---- BM25 retrieval (q88) ----------------------------------------

  test("bm25Search: hand-computed Okapi scores, negative-idf ordering, doc_id tie-break") {
    // corpus: doc1 "x", doc2 "x x y", doc3 "y z"; probe = doc1 (the
    // only doc_id < 2), whose sole top-tfidf term is "x".
    val dir = writeDocs(Seq(
      1L -> "x" -> "s", 2L -> "x x y" -> "s", 3L -> "y z" -> "s")
      .map { case ((id, t), s) => (id, t, s) })
    val got = TextAnalysis.bm25Search(spark, dir, nProbes = 2, topK = 5)
      .orderBy("probe_id", "rank")
      .as[(Long, Int, Long, Long, Double)].collect()
    // N=3, df(x)=2, avgdl=(1+3+2)/3=2.0 exactly
    val idf = math.log((3.0 - 2.0 + 0.5) / (2.0 + 0.5))
    def s(tf: Double, dl: Double) =
      idf * ((tf * (1.2 + 1.0)) / (tf + 1.2 * ((1.0 - 0.75) + 0.75 * (dl / 2.0))))
    // idf < 0 here (df > N/2): the doc with the SMALLER normalized tf
    // factor scores higher — doc2 beats doc1.
    assert(got.toSeq == Seq(
      (1L, 1, 2L, 1L, s(2.0, 3.0)),
      (1L, 2, 1L, 1L, s(1.0, 1.0))))
  }

  test("bm25Search: all 10 probes return dense ranks with non-increasing scores") {
    val got = TextAnalysis.bm25Search(spark, sf, nProbes = 10, topK = 5).collect()
    val byProbe = got.groupBy(_.getLong(0))
    assert(byProbe.keySet == (0L until 10L).toSet)
    byProbe.values.foreach { rows =>
      val sorted = rows.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to sorted.length))
      val scores = sorted.map(_.getDouble(4))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  // ---- Per-source KL drift (q89) -----------------------------------

  test("sourceDrift: identical per-source distributions give KL exactly 0.0") {
    val dir = writeDocs(Seq(
      (1L, "a b", "srcA"), (2L, "a b", "srcB")))
    val got = TextAnalysis.sourceDrift(spark, dir)
      .as[(String, Long, Long, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      ("srcA", 2L, 2L, 0.0), ("srcB", 2L, 2L, 0.0)))
  }

  test("sourceDrift: fully disjoint sources score KL = ln 2, counts exact") {
    val dir = writeDocs(Seq(
      (1L, "a a", "srcA"), (2L, "b b", "srcB")))
    val got = TextAnalysis.sourceDrift(spark, dir)
      .as[(String, Long, Long, Double)].collect().sortBy(_._1)
    // each source: one term, p=1.0, q=0.5 → KL = 1.0 * ln(1.0/0.5)
    val ln2 = math.log(1.0 / 0.5)
    assert(got.toSeq == Seq(
      ("srcA", 1L, 2L, ln2), ("srcB", 1L, 2L, ln2)))
  }

  test("sourceDrift: KL is non-negative on the real corpus (Gibbs' inequality)") {
    val got = TextAnalysis.sourceDrift(spark, sf).as[(String, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (src, nTerms, nTok, kl) =>
      assert(kl >= 0.0, s"KL($src) = $kl")
      assert(nTerms > 0 && nTok >= nTerms)
    }
  }

  // ---- Sparse TF-IDF cosine pairs (q101) -----------------------------

  test("sparseCosinePairs: hand-computed cosines; corpus-wide tokens carry zero mass") {
    // docs 1,2 = "a b" (identical); doc 3 = "a c".  df(a)=3=N so w(a)=0:
    // pair (1,2) shares {a,b} -> cos ~ 1; pairs with doc 3 share only
    // "a" -> dot exactly 0.0.
    val dir = writeDocs(Seq((1L, "a b", "s"), (2L, "a b", "s"), (3L, "a c", "s")))
    val got = TextAnalysis.sparseCosinePairs(spark, dir)
      .as[(Long, Long, Long, Double)].collect().toSeq
    val wb = math.log(3.0 / 2.0)
    val nrm12 = math.sqrt(0.0 + 0.0 * 0.0 + wb * wb)
    val cos12 = (0.0 + 0.0 * 0.0 + wb * wb) / (nrm12 * nrm12)
    assert(got == Seq(
      (1L, 2L, 2L, cos12), (1L, 3L, 1L, 0.0), (2L, 3L, 1L, 0.0)))
  }

  test("sparseCosinePairs: the df cap prunes hot tokens from the PAIR join only") {
    // maxDf=2 drops "a" (df 3) from the index: doc-3 pairs disappear,
    // the (1,2) pair survives through "b", and norms still use "a"
    val dir = writeDocs(Seq((1L, "a b", "s"), (2L, "a b", "s"), (3L, "a c", "s")))
    val got = TextAnalysis.sparseCosinePairs(spark, dir, maxDf = 2L)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._3)) == Seq((1L, 2L, 1L)))
  }

  // ---- Conversion funnel (q90) -------------------------------------

  test("funnel: stages are strictly ordered; same-ms and out-of-order events don't convert") {
    val dir = writeEvents(Seq(
      // user 1: full funnel in order
      (1L, 1000L, 1L, "view"), (2L, 2000L, 1L, "click"), (3L, 3000L, 1L, "purchase"),
      // user 2: click BEFORE first view → stage 1 only
      (4L, 5000L, 2L, "view"), (5L, 4000L, 2L, "click"),
      // user 3: no view → never enters the funnel
      (6L, 1000L, 3L, "click"), (7L, 2000L, 3L, "purchase"),
      // user 4: click at exactly the view's ms → strict > rejects it
      (8L, 7000L, 4L, "view"), (9L, 7000L, 4L, "click")))
    val got = EventOps.funnel(spark, dir)
      .as[(Int, String, Long, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      (1, "view", 3L, 1.0),
      (2, "click", 1L, 1.0 / 3.0),
      (3, "purchase", 1L, 1.0 / 3.0)))
  }

  test("funnel: purchase after click after view, each strictly after the PREVIOUS stage") {
    // purchase exists after the view but BEFORE the first valid click
    // → user must not count as stage 3 (ordered funnel, not set-of-types)
    val dir = writeEvents(Seq(
      (1L, 1000L, 1L, "view"), (2L, 5000L, 1L, "click"), (3L, 3000L, 1L, "purchase")))
    val got = EventOps.funnel(spark, dir)
      .as[(Int, String, Long, Double)].collect().sortBy(_._1)
    assert(got.map(r => (r._1, r._3)).toSeq == Seq((1, 1L), (2, 1L), (3, 0L)))
  }

  // ---- Retention cohorts (q91) -------------------------------------

  test("retentionCohorts: hand-computed cohort grid with exact ratios") {
    val wk = 604800000L
    val dir = writeEvents(Seq(
      // user 1: weeks 0 and 1;  user 2: week 0 only → cohort 0 size 2
      (1L, 10L, 1L, "view"), (2L, wk + 10L, 1L, "click"), (3L, 20L, 2L, "view"),
      // user 3: first seen week 1, active weeks 1 and 3 → cohort 1 size 1
      (4L, wk + 5L, 3L, "view"), (5L, 3 * wk + 5L, 3L, "purchase"),
      // duplicate events in one week count once
      (6L, 30L, 2L, "click")))
    val got = EventOps.retentionCohorts(spark, dir)
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == Seq(
      (0L, 0L, 2L, 2L, 1.0),
      (0L, 1L, 1L, 2L, 0.5),
      (1L, 0L, 1L, 1L, 1.0),
      (1L, 2L, 1L, 1L, 1.0)))
  }

  // ---- Rolling 24h window (q99) -------------------------------------

  test("rolling24h: RANGE frame includes the 24h-minus-1ms boundary and same-ms peers") {
    val day = 86400000L
    val dir = writeEvents(Seq(
      // user 1: the third event's frame [1, day] drops the ms=0 event
      (1L, 0L, 1L, "view"), (2L, 1000L, 1L, "view"), (3L, day, 1L, "view"),
      // user 2: same-ms peers — each sees BOTH (RANGE, not ROWS)
      (4L, 500L, 2L, "view"), (5L, 500L, 2L, "view")))
    val got = EventOps.rolling24h(spark, dir)
      .as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._4, r._5)).toMap
    assert(got(1L) == ((1L, 1.0)))
    assert(got(2L) == ((2L, 2.0)))
    assert(got(3L) == ((2L, 2.0)), "frame [1, day] holds events 2 and 3, not 1")
    assert(got(4L) == ((2L, 2.0)) && got(5L) == ((2L, 2.0)), "peers see each other")
  }

  // ---- TPC-H Q5 (q100) -----------------------------------------------

  test("localSupplierVolume: one row per region nation, revenue-descending, local-only") {
    val got = Relational.localSupplierVolume(spark, sf)
      .as[(String, Double, Long)].collect()
    assert(got.nonEmpty && got.length <= 25)
    assert(got.map(_._1).distinct.length == got.length)
    val revs = got.map(_._2)
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b }, "ORDER BY revenue DESC")
    got.foreach { case (_, rev, n) => assert(n > 0 && rev > 0.0) }
  }

  test("retentionCohorts: offset-0 cell equals cohort size (first week is always active)") {
    val got = EventOps.retentionCohorts(spark, sf)
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    got.filter(_._2 == 0L).foreach { case (cw, _, nActive, size, ret) =>
      assert(nActive == size && ret == 1.0, s"cohort $cw")
    }
    got.foreach { case (_, off, nActive, size, _) =>
      assert(off >= 0L && nActive <= size)
    }
  }
}
