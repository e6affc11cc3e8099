package graft

import graft.operators.{EventOps, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Unit coverage for the round-11 batch-3 surface: PQ-ANN (q92), the
  * MAD outlier gate (q93) and session paths (q94) — hand-computed
  * fixtures through the real Tables loaders; the DuckDB oracle gate
  * supplies cross-engine parity, these pin the semantics.
  */
class PqMadPathsSpec extends SparkSuite {
  import spark.implicits._

  private def writeEmbeddings(rows: Seq[(Long, Seq[Float])]): String = {
    val dir = Files.createTempDirectory("graft-pmp").toString
    rows.map { case (id, v) => (id, v, 0) }
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    val dir = Files.createTempDirectory("graft-pmp").toString
    rows.map { case (id, text, src) => (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def writeEvents(rows: Seq[(Long, Long, Long, String)]): String = {
    val dir = Files.createTempDirectory("graft-pmp").toString
    rows.toDF("event_id", "us", "user_id", "event_type")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("user_id"), col("event_type"),
        lit(1.0).as("value"), lit("{}").as("props"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  // ---- PQ ANN (q92) --------------------------------------------------

  test("pqAnn: identical vectors tie on ADC and rank by neighbor_id; codes stay in [0,k)") {
    // 12 copies of one vector: every subspace codebook collapses to the
    // init centroids, every code is cid 0 (argmax ties -> lowest), all
    // ADC scores are equal, so ranking is pure neighbor_id order.
    val v = (0 until 64).map(i => (0.1f * ((i % 7) + 1)))
    val dir = writeEmbeddings((0L until 12L).map(id => id -> v))
    val got = Similarity.pqAnn(spark, dir, nProbes = 3, topK = 4)
      .orderBy("probe_id", "rank")
      .as[(Long, Int, Long, Double)].collect()
    val expectNeighbors = Map(
      0L -> Seq(1L, 2L, 3L, 4L), 1L -> Seq(0L, 2L, 3L, 4L), 2L -> Seq(0L, 1L, 3L, 4L))
    assert(got.length == 12)
    expectNeighbors.foreach { case (p, ns) =>
      val rows = got.filter(_._1 == p).sortBy(_._2)
      assert(rows.map(_._3).toSeq == ns, s"probe $p")
      assert(rows.map(_._4).distinct.length == 1, "all ADC scores equal")
    }
  }

  test("pqAnn: real corpus — dense ranks per probe, ADC finite, self never retrieved") {
    val got = Similarity.pqAnn(spark, sf).collect()
    val byProbe = got.groupBy(_.getLong(0))
    assert(byProbe.keySet == (0L until 10L).toSet)
    byProbe.foreach { case (p, rows) =>
      assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to rows.length))
      rows.foreach { r =>
        assert(r.getLong(2) != p, "probe must not retrieve itself")
        assert(!r.getDouble(3).isNaN && !r.getDouble(3).isInfinite)
      }
    }
  }

  // ---- IVF-PQ ANN (q95) ------------------------------------------------

  test("ivfPqAnn: identical vectors land in one cell; ADC ties rank by neighbor_id") {
    val v = (0 until 64).map(i => (0.1f * ((i % 7) + 1)))
    val dir = writeEmbeddings((0L until 12L).map(id => id -> v))
    val got = Similarity.ivfPqAnn(spark, dir, nProbes = 2, topK = 3)
      .orderBy("probe_id", "rank")
      .as[(Long, Int, Long, Double)].collect()
    assert(got.map(r => (r._1, r._2, r._3)).toSeq == Seq(
      (0L, 1, 1L), (0L, 2, 2L), (0L, 3, 3L),
      (1L, 1, 0L), (1L, 2, 2L), (1L, 3, 3L)))
    assert(got.map(_._4).distinct.length == 1, "all ADC scores equal")
  }

  test("ivfPqAnn: real corpus — cell pruning returns a subset of pqAnn's candidate scores") {
    // same codebooks, so any (probe, neighbor) pair ivfPq returns must
    // carry pqAnn's exact ADC value for that pair (cell filter only
    // drops candidates, never changes scores)
    val pq = Similarity.pqAnn(spark, sf, topK = 1000)
      .as[(Long, Int, Long, Double)].collect()
      .map(r => (r._1, r._3) -> r._4).toMap
    val ivf = Similarity.ivfPqAnn(spark, sf).as[(Long, Int, Long, Double)].collect()
    assert(ivf.nonEmpty)
    ivf.foreach { case (p, _, nb, adc) =>
      assert(pq((p, nb)) == adc, s"ADC mismatch for ($p, $nb)")
    }
  }

  // ---- Source overlap (q96) ---------------------------------------------

  test("sourceOverlap: hand-computed trigram Jaccard; disjoint pairs absent") {
    val dir = writeDocs(Seq(
      (1L, "a b c d", "srcA"),   // trigrams {a b c, b c d}
      (2L, "a b c x", "srcB"),   // trigrams {a b c, b c x}
      (3L, "p q r", "srcC")))    // trigrams {p q r} — overlaps nothing
    val got = graft.operators.Dedup.sourceOverlap(spark, dir)
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(("srcA", "srcB", 2L, 2L, 1L, 1.0 / 3.0)))
  }

  // ---- PMI collocations (q97) ---------------------------------------------

  test("pmiCollocations: hand-computed PMI with the min-count floor") {
    // "x y" ×6 docs + "p q" ×2 docs: cb(x y)=6 ≥ 5, cb(p q)=2 < 5
    // (filtered); cu(x)=cu(y)=6; B=8 bigrams, T=16 tokens
    val dir = writeDocs(
      (1L to 6L).map(i => (i, "x y", "s")) ++ Seq((7L, "p q", "s"), (8L, "p q", "s")))
    val got = TextAnalysis.pmiCollocations(spark, dir)
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    val pmi = math.log((6.0 / 8.0) / ((6.0 / 16.0) * (6.0 / 16.0)))
    assert(got == Seq(("x y", 6L, 6L, 6L, pmi)))
  }

  // ---- Fixed-count sample (q98) ---------------------------------------------

  test("fixedSample: exactly perSource rows per stratum, dense ranks, priority-ordered") {
    val got = TextAnalysis.fixedSample(spark, sf)
      .as[(String, Int, Long, Int)].collect()
    val bySrc = got.groupBy(_._1)
    assert(bySrc.nonEmpty)
    bySrc.foreach { case (src, rows) =>
      assert(rows.length == 10, s"$src must contribute exactly 10 docs")
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to 10))
      val keys = sorted.map(r => (r._4, r._3))
      assert(keys.zip(keys.tail).forall { case (a, b) =>
        a._1 < b._1 || (a._1 == b._1 && a._2 < b._2) },
        s"$src ranks must follow (priority, doc_id) order")
    }
  }

  // ---- MAD outlier gate (q93) ----------------------------------------

  test("madOutliers: lower medians, zero-MAD degeneracy, exact outlier counts") {
    // srcA lengths (10, 10, 100): med = 10 (rn 2 of 3), devs (0, 0, 90)
    // -> MAD = 0, so the 90-dev doc is the one outlier (90 > 3·0).
    // srcB lengths (5, 7, 9, 11): med = 7 (rn 2 of 4), devs sorted
    // (0, 2, 2, 4) -> MAD = 2; no dev exceeds 6.
    val dir = writeDocs(Seq(
      (1L, "a" * 10, "srcA"), (2L, "b" * 10, "srcA"), (3L, "c" * 100, "srcA"),
      (4L, "d" * 5, "srcB"), (5L, "e" * 7, "srcB"),
      (6L, "f" * 9, "srcB"), (7L, "g" * 11, "srcB")))
    val got = TextAnalysis.madOutliers(spark, dir)
      .as[(String, Long, Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      ("srcA", 3L, 10L, 0L, 1L, 1.0 / 3.0),
      ("srcB", 4L, 7L, 2L, 0L, 0.0)))
  }

  // ---- Session paths (q94) --------------------------------------------

  test("sessionPaths: trigrams within sessions only; short sessions contribute nothing") {
    val m = 60L * 1000000L // one minute in micros
    val dir = writeEvents(Seq(
      // user 1: one 4-event session -> two trigrams
      (1L, 1 * m, 1L, "view"), (2L, 2 * m, 1L, "click"),
      (3L, 3 * m, 1L, "purchase"), (4L, 4 * m, 1L, "error"),
      // user 2: two 2-event sessions (40-min gap) -> no trigrams
      (5L, 1 * m, 2L, "view"), (6L, 2 * m, 2L, "click"),
      (7L, 42 * m, 2L, "view"), (8L, 43 * m, 2L, "click")))
    val got = EventOps.sessionPaths(spark, dir)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(
      ("click->purchase->error", 1L), ("view->click->purchase", 1L)))
  }

  test("sessionPaths: a gap of EXACTLY 30 min merges (strict >), one micro over splits") {
    val gap = 1800000000L
    val dir = writeEvents(Seq(
      // user 1: consecutive gaps of exactly `gap` -> ONE session of 3
      (1L, 0L, 1L, "view"), (2L, gap, 1L, "click"), (3L, 2 * gap, 1L, "purchase"),
      // user 2: second gap one micro over -> sessions of 2 and 1
      (4L, 0L, 2L, "view"), (5L, gap, 2L, "click"), (6L, 2 * gap + 1L, 2L, "purchase")))
    val got = EventOps.sessionPaths(spark, dir).as[(String, Long)].collect().toSeq
    assert(got == Seq(("view->click->purchase", 1L)))
  }
}
