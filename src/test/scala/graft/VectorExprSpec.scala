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

  private def withCodegenOff[T](body: => T): T = {
    val k = "spark.sql.codegen.wholeStage"
    val old = spark.conf.get(k)
    spark.conf.set(k, "false")
    try body finally spark.conf.set(k, old)
  }
}
