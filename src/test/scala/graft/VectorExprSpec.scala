package graft

import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

/** The codegen'd DotProduct/VecNorm expressions must be bit-identical
  * to the builtin zip_with/aggregate formulation (same IEEE op
  * sequence) — that equivalence is what keeps the DuckDB oracle valid
  * after the hot-path promotion.
  */
class VectorExprSpec extends SparkSuite {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf).select(col("embedding")).limit(200)

  test("native dot == builtin dot, bitwise, on real embeddings") {
    val pairs = emb.withColumnRenamed("embedding", "a")
      .crossJoin(emb.withColumnRenamed("embedding", "b")).limit(5000)
    val diff = pairs.select(
      VectorFunctions.dot(col("a"), col("b")).as("fast"),
      VectorFunctions.dotBuiltin(col("a"), col("b")).as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(diff.count() == 0)
  }

  test("native norm == builtin norm, bitwise") {
    val diff = emb.select(
      VectorFunctions.norm(col("embedding")).as("fast"),
      VectorFunctions.normBuiltin(col("embedding")).as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(diff.count() == 0)
  }

  test("expressions survive interpreted eval too (codegen fallback path)") {
    withCodegenOff {
      val one = emb.limit(3).select(VectorFunctions.norm(col("embedding")).as("n"))
        .as[Double].collect()
      assert(one.forall(n => n > 0 && n.isFinite))
    }
  }

  /** Naive reference of the winnowing contract: recompute every k-gram
    * hash from scratch (no rolling update), brute-force window minima.
    */
  private def naiveWinnow(s: String, k: Int, w: Int): Seq[Long] = {
    val m = s.length - k + 1
    if (m < w) return Seq.empty
    val hs = (0 until m).map { i =>
      s.substring(i, i + k).foldLeft(0L)((a, c) => (a * 31 + c) & 0xFFFFFFFFL)
    }
    (0 to m - w).map(j => hs.slice(j, j + w).min).distinct.sorted
  }

  test("winnow expression == naive recompute reference on real documents") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").limit(50)
      .as[(Long, String)].collect()
    val viaExpr = Tables.documents(spark, sf).limit(50)
      .select(col("doc_id"),
        graft.functions.TextFunctions.winnowFingerprints(col("text"), 8, 4).as("fp"))
      .as[(Long, Seq[Long])].collect().toMap
    docs.foreach { case (id, text) =>
      assert(viaExpr(id) == naiveWinnow(text, 8, 4), s"doc $id")
    }
  }

  /** Definitional minhash reference: per seed, the multiplicative
    * scramble (A_seed · h₀(shingle) + seed) mod 2^32 computed from
    * scratch — must agree with the expression's fused loop bit for bit.
    */
  private def naiveMinhash(s: String, n: Int, k: Int): Seq[Long] = {
    val tokens = s.split(" ", -1)
    if (tokens.length < n) return Seq.empty
    val shingles = tokens.sliding(n).map(_.mkString(" ")).toSeq
    (0 until k).map { seed =>
      val a = ((2654435761L * (seed + 1)) & 0xFFFFFFFFL) | 1L
      shingles.map { sh =>
        val f = sh.foldLeft(0L)((acc, c) => (acc * 31 + c) & 0xFFFFFFFFL)
        (a * f + seed) & 0xFFFFFFFFL
      }.min
    }
  }

  test("minhash expression == definitional seeded-fold reference on real documents") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").limit(50)
      .as[(Long, String)].collect()
    val viaExpr = Tables.documents(spark, sf).limit(50)
      .select(col("doc_id"),
        graft.functions.TextFunctions.minHashes(col("text"), 3, 8).as("m"))
      .as[(Long, Seq[Long])].collect().toMap
    docs.foreach { case (id, text) =>
      assert(viaExpr(id) == naiveMinhash(text, 3, 8), s"doc $id")
    }
  }

  test("shingle-set expression == builtin array_distinct(transform(...)) formulation") {
    import graft.functions.TextFunctions
    val docs = Tables.documents(spark, sf).limit(50)
      .filter(size(split(col("text"), " ")) >= 3)
    val diff = docs.select(
        TextFunctions.shingleSet(col("text"), 3).as("fast"),
        array_distinct(TextFunctions.shingles(col("text"), 3)).as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(diff.count() == 0)
  }

  test("repetition expression == exploded groupBy formulation on real documents") {
    val native = graft.operators.TextAnalysis.repetitionMetrics(spark, sf)
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    val exploded = graft.operators.TextAnalysis.repetitionMetricsExploded(spark, sf)
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(native.toSeq == exploded.toSeq) // bit-identical, doubles included
  }

  test("repetition expression: degenerate inputs and exact counts") {
    import graft.functions.TextFunctions
    val weird = Seq("", "solo", "a a a a", "a b a b x", " ", "a  b").toDF("text")
    val r = weird.select(TextFunctions.repetitionStats(col("text")).as("r"))
      .as[Seq[Long]].collect()
    assert(r(0) == Seq(0L, 0L, 0L)) // "" → 1 token → no bigrams
    assert(r(1) == Seq(0L, 0L, 0L)) // single token
    assert(r(2) == Seq(3L, 1L, 3L)) // "a a" ×3
    assert(r(3) == Seq(4L, 3L, 2L)) // "a b"×2, "b a", "b x"
    assert(r(4) == Seq(1L, 1L, 1L)) // two empty tokens → bigram " "
    assert(r(5) == Seq(2L, 2L, 1L)) // "a ", " b" (middle empty token)
  }

  test("text expressions: degenerate inputs (empty, multi-space, single token)") {
    import graft.functions.TextFunctions
    val weird = Seq("", " ", "a  b", "solo", "a b c").toDF("text")
    val r = weird.select(
        TextFunctions.shingleSet(col("text"), 3).as("sh"),
        TextFunctions.minHashes(col("text"), 3, 4).as("mh"))
      .as[(Seq[String], Seq[Long])].collect()
    // "" → 1 token, " " → 2 empty tokens, "a  b" → 3 tokens (middle empty)
    assert(r(0)._1.isEmpty && r(0)._2.isEmpty)
    assert(r(1)._1.isEmpty && r(1)._2.isEmpty)
    assert(r(2)._1 == Seq("a  b") && r(2)._2.length == 4)
    assert(r(3)._1.isEmpty && r(3)._2.isEmpty)
    assert(r(4)._1 == Seq("a b c"))
  }

  test("winnow expression: short inputs yield empty, not errors") {
    val tiny = Seq("", "abcdefg", "abcdefgh", "abcdefghij").toDF("text")
    val r = tiny.select(
        graft.functions.TextFunctions.winnowFingerprints(col("text"), 8, 4).as("fp"))
      .as[Seq[Long]].collect()
    // needs ≥ k+w-1 = 11 chars for one full window
    assert(r(0).isEmpty && r(1).isEmpty && r(2).isEmpty && r(3).isEmpty)
    val just = Seq("abcdefghijk").toDF("text").select(
        graft.functions.TextFunctions.winnowFingerprints(col("text"), 8, 4).as("fp"))
      .as[Seq[Long]].collect()
    assert(just(0).nonEmpty)
  }

  private def withCodegenOff[T](body: => T): T = {
    val k = "spark.sql.codegen.wholeStage"
    val old = spark.conf.get(k)
    spark.conf.set(k, "false")
    try body finally spark.conf.set(k, old)
  }
}
