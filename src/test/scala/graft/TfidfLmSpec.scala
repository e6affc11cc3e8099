package graft

import graft.operators.TextAnalysis
import graft.plans.GraftLn
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import java.nio.file.Files

/** Unit coverage for the round-10 surface (VERDICT r10 #5): the
  * GraftLn native expression and the two operators built on it,
  * TF-IDF salient terms (q82) and bigram-LM fluency (q83) — each
  * against a hand-computed tiny corpus written as a real
  * documents.parquet so the operators read it through the same
  * Tables loader as production.
  */
class TfidfLmSpec extends SparkSuite {
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val dir = Files.createTempDirectory("graft-tfidflm").toString
    rows.map { case (id, text) => (id, text, "en", "src", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  // ---- GraftLn -----------------------------------------------------

  test("GraftLn: NULL in → NULL, non-positive → NULL, positives == Math.log") {
    val rows = Seq[java.lang.Double](0.5, 1.0, 2.0, 123.456, null, 0.0, -3.0)
      .toDF("x")
      .select(col("x"), graft.functions.MathFunctions.ln(col("x")).as("y"))
      .collect()
    rows.foreach { r =>
      val x = if (r.isNullAt(0)) null else Double.box(r.getDouble(0))
      val y = if (r.isNullAt(1)) null else Double.box(r.getDouble(1))
      if (x == null || x <= 0.0) assert(y == null, s"ln($x) must be NULL")
      else assert(y == java.lang.Math.log(x), s"ln($x)")
    }
  }

  test("GraftLn: Math.log parity on a deterministic value sweep (codegen path)") {
    val got = spark.range(1, 2001)
      .select((col("id").cast("double") / lit(7.0)).as("x"))
      .select(col("x"), graft.functions.MathFunctions.ln(col("x")).as("y"))
      .as[(Double, Double)].collect()
    assert(got.length == 2000)
    got.foreach { case (x, y) => assert(y == java.lang.Math.log(x), s"ln($x)") }
  }

  test("GraftLn: interpreted eval matches codegen semantics") {
    assert(GraftLn(Literal(0.4)).eval(null) == java.lang.Math.log(0.4))
    assert(GraftLn(Literal(1.0)).eval(null) == 0.0)
    assert(GraftLn(Literal(0.0)).eval(null) == null)
    assert(GraftLn(Literal(-1.0)).eval(null) == null)
    assert(GraftLn(Literal(null, DoubleType)).eval(null) == null)
  }

  test("GraftLn: whole-stage codegen off gives identical values") {
    val k = "spark.sql.codegen.wholeStage"
    val old = spark.conf.get(k)
    spark.conf.set(k, "false")
    try {
      val got = Seq(0.4, 2.5, 9.0).toDF("x")
        .select(graft.functions.MathFunctions.ln(col("x"))).as[Double].collect()
      assert(got.sameElements(Array(0.4, 2.5, 9.0).map(java.lang.Math.log)))
    } finally spark.conf.set(k, old)
  }

  // ---- TF-IDF salient terms (q82) -----------------------------------

  test("tfidfTerms: hand-computed top-k with token tie-break and k cutoff") {
    // N=3; df: a=2, b=1, c=2, d=1, e=1, f=1
    val dir = writeDocs(Seq(
      1L -> "a a b",
      2L -> "a c",
      3L -> "c c c d e f"))
    val ln = java.lang.Math.log(_: Double)
    val got = TextAnalysis.tfidfTerms(spark, dir)
      .as[(Long, Int, String, Long, Long, Double)].collect().toSet
    val expected = Set(
      // doc 1: b = 1·ln(3/1) = 1.0986 beats a = 2·ln(3/2) = 0.8109
      (1L, 1, "b", 1L, 1L, 1.0 * ln(3.0 / 1.0)),
      (1L, 2, "a", 2L, 2L, 2.0 * ln(3.0 / 2.0)),
      // doc 2: a and c tie at 1·ln(3/2) — token ASC breaks it
      (2L, 1, "a", 1L, 2L, 1.0 * ln(3.0 / 2.0)),
      (2L, 2, "c", 1L, 2L, 1.0 * ln(3.0 / 2.0)),
      // doc 3: c = 3·ln(3/2) = 1.216 first, then the d/e/f tie at
      // ln(3) — token ASC keeps d, e and CUTS f at k=3
      (3L, 1, "c", 3L, 2L, 3.0 * ln(3.0 / 2.0)),
      (3L, 2, "d", 1L, 1L, 1.0 * ln(3.0 / 1.0)),
      (3L, 3, "e", 1L, 1L, 1.0 * ln(3.0 / 1.0)))
    assert(got == expected)
  }

  // ---- Bigram-LM fluency (q83) --------------------------------------

  test("bigramFluency: hand-computed add-one smoothing incl. the unseen +1/V floor") {
    // md5 buckets: doc_id 1, 2, 3 → train (< 80); 8, 14, 25 → test (>= 90)
    val dir = writeDocs(Seq(
      1L -> "a b a", // train: bigrams "a b", "b a"; unigrams a,b,a
      2L -> "b c",   // train: bigram "b c"; unigrams b,c
      3L -> "c",     // train: no bigram, but c enters the unigram counts
      8L -> "a b d", // test: one seen bigram, one unseen with seen w1
      14L -> "x y",  // test: unseen bigram AND unseen w1 → +1/(0+V) floor
      25L -> "z"))   // test: single token → excluded from scoring
    // cu: a=2, b=2, c=2 → V=3;  cb: "a b"=1, "b a"=1, "b c"=1
    val ln = java.lang.Math.log(_: Double)
    val logpAB = ln((1.0 + 1.0) / (2.0 + 3.0)) // seen bigram
    val logpBD = ln((0.0 + 1.0) / (2.0 + 3.0)) // unseen bigram, seen w1
    val logpXY = ln((0.0 + 1.0) / (0.0 + 3.0)) // fully unseen: 1/V floor
    val got = TextAnalysis.bigramFluency(spark, dir)
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.keySet == Set(8L, 14L), "single-token test doc must be excluded")
    val t8 = (0.0 + logpAB) + logpBD // the fold's exact IEEE sequence
    assert(got(8L) == ((2L, t8, t8 / 2.0)))
    val t14 = 0.0 + logpXY
    assert(got(14L) == ((1L, t14, t14 / 1.0)))
  }

  test("bigramFluency on real data: every score is negative and finite") {
    val rows = TextAnalysis.bigramFluency(spark, sf)
      .as[(Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, total, avg) =>
      assert(n >= 1 && total < 0 && avg < 0 && !total.isNaN && !avg.isNaN)
      ()
    }
  }
}
