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

  // ---- Corpus-unigram surprisal (q84) --------------------------------

  test("tokenSurprisal: hand-computed nats against the corpus unigram LM") {
    // counts: a=3, b=1, T=4
    val dir = writeDocs(Seq(1L -> "a b", 2L -> "a a"))
    val ln = java.lang.Math.log(_: Double)
    val pa = ln(3.0 / 4.0)
    val pb = ln(1.0 / 4.0)
    val got = TextAnalysis.tokenSurprisal(spark, dir)
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val t1 = (0.0 + pa) + pb
    val t2 = (0.0 + pa) + pa
    assert(got(1L) == ((2L, t1, -(t1 / 2.0))))
    assert(got(2L) == ((2L, t2, -(t2 / 2.0))))
  }

  test("tokenSurprisal on real data: rarer-token docs score higher than common-token docs") {
    val rows = TextAnalysis.tokenSurprisal(spark, sf)
      .as[(Long, Long, Double, Double)].collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach { case (_, n, _, s) =>
      assert(n >= 1 && s > 0 && s.isFinite, "surprisal in nats must be positive and finite")
      ()
    }
  }

  // ---- Zipf rank-frequency fit (q85) ---------------------------------

  private def writeSourcedDocs(rows: Seq[(Long, String, String)]): String = {
    val dir = Files.createTempDirectory("graft-zipf").toString
    rows.map { case (id, src, text) => (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("zipfSlope: hand-computed least-squares fit, freq-tie broken by token") {
    // s1 freqs: a=4, b=2, c=1 → ranks a:1 b:2 c:3
    // s2 freqs: a=2, b=2, c=1 → tie a/b broken by token ASC → a:1 b:2 c:3
    val dir = writeSourcedDocs(Seq(
      (1L, "s1", "a a a a b b c"),
      (2L, "s2", "a a b b c")))
    val ln = java.lang.Math.log(_: Double)
    def expected(freqs: Seq[Long]): (Double, Double) = {
      val n = freqs.length.toDouble
      val xs = freqs.indices.map(i => ln((i + 1).toDouble))
      val ys = freqs.map(f => ln(f.toDouble))
      def fold(vs: Seq[Double]) = vs.foldLeft(0.0)(_ + _)
      val (sx, sy) = (fold(xs), fold(ys))
      val sxy = fold(xs.zip(ys).map { case (x, y) => x * y })
      val sxx = fold(xs.map(x => x * x))
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      (slope, (sy - slope * sx) / n)
    }
    val got = TextAnalysis.zipfSlope(spark, dir)
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val (m1, b1) = expected(Seq(4L, 2L, 1L))
    val (m2, b2) = expected(Seq(2L, 2L, 1L))
    assert(got("s1") == ((3L, m1, b1)))
    assert(got("s2") == ((3L, m2, b2)))
    assert(m1 < 0, "natural rank-frequency decay must fit a negative slope")
  }

  test("zipfSlope: top-M heap bounds the fit set (m smaller than vocab)") {
    val dir = writeSourcedDocs(Seq((1L, "s1", "a a a a b b b c c d")))
    // m=2 keeps only a (4) and b (3): slope = (ln3-ln4)/ln2 exactly
    val got = TextAnalysis.zipfSlope(spark, dir, m = 2)
      .as[(String, Long, Double, Double)].collect().head
    assert(got._2 == 2L)
    val ln = java.lang.Math.log(_: Double)
    // two points: slope = (y2-y1)/(x2-x1) — but via the same
    // least-squares folds the operator runs
    val n = 2.0
    val (x1, x2) = (ln(1.0), ln(2.0))
    val (y1, y2) = (ln(4.0), ln(3.0))
    val sx = 0.0 + x1 + x2; val sy = 0.0 + y1 + y2
    val sxy = 0.0 + x1 * y1 + x2 * y2; val sxx = 0.0 + x1 * x1 + x2 * x2
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(got._3 == slope)
  }

  test("bigramFluency topM cap: a cap above the vocab is exact; a tight cap only lowers scores") {
    val loose = TextAnalysis.bigramFluency(spark, sf, topMBigrams = 1000000)
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    val exact = TextAnalysis.bigramFluency(spark, sf)
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(loose.sameElements(exact), "a non-binding cap must not change a single bit")
    val tight = TextAnalysis.bigramFluency(spark, sf, topMBigrams = 5)
      .as[(Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    exact.foreach { case (id, _, total, _) =>
      assert(tight(id) <= total + 1e-12,
        "dropping bigrams to the unseen floor can only lower a document's log-likelihood")
      ()
    }
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
