package graft

import graft.plans.TokenCount
import org.apache.spark.sql.functions._

/** The native token counter and its injected optimizer rule — the
  * engine's first Rule[LogicalPlan] extension (GraftExtensions).
  */
class TokenCountSpec extends SparkSuite {

  private def plansTokenCount(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.optimizedPlan.expressions.exists(_.exists {
      case _: TokenCount => true
      case _ => false
    })

  test("token_count == size(split(x, ' ', -1)) on edges, unicode, and 2000 fuzzed strings") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val alphabet = "ab é世  😀x-"
    val fuzz = (1 to 2000).map(_ =>
      (1 to rnd.nextInt(30)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    val cases = Seq("", " ", "a", "a b", "a  b", "  ", "世 界",
      "tab\tnot split", "trailing ", " leading") ++ fuzz
    val got = cases.toDF("s")
      .select(col("s"), expr("graft_token_count(s)").as("tc")).collect()
    for (r <- got)
      assert(r.getInt(1) == r.getString(0).split(" ", -1).length,
        s"mismatch on ${r.getString(0)}")
  }

  test("rewrite rule fires: size(split(text, ' ')) plans as token_count, values match a local recount") {
    val df = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"), size(split(col("text"), " ")).as("n"))
    assert(plansTokenCount(df), "injected optimizer rule rewrites size(split(x, ' ', -1))")
    assert(!df.queryExecution.optimizedPlan.expressions.exists(_.exists {
      case _: org.apache.spark.sql.catalyst.expressions.StringSplit => true
      case _ => false
    }), "the split itself is gone from the plan")
    for (r <- df.collect())
      assert(r.getInt(2) == r.getString(1).split(" ", -1).length)
  }

  test("null semantics preserved under BOTH sizeOfNull modes") {
    import spark.implicits._
    // (no plan assertion here: ConvertToLocalRelation collapses a
    // local Seq before user rules run — the parquet-backed test above
    // already proves the nullable-column rewrite, text being nullable
    // in the parquet schema; this pins only the null-value semantics)
    def run(): Seq[Option[Int]] = Seq(Some("a b"), None, Some("")).toDF("s")
      .select(size(split(col("s"), " ")).as("n")).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getInt(0))).toSeq.sortBy(_.getOrElse(-99))
    // Spark 4: size(NULL) is NULL — TokenCount's null-safe path agrees
    assert(run() == Seq(None, Some(1), Some(2)))
    // ...and the legacy sizeOfNull conf is INERT in Spark 4 (probed:
    // size(split(NULL)) stays NULL with it set) — pin that, so if a
    // future version revives -1 the rule's IF(ISNULL, -1, …) wrap
    // (already implemented for Size(legacy = true)) gets re-exercised
    spark.conf.set("spark.sql.legacy.sizeOfNull", "true")
    try assert(run() == Seq(None, Some(1), Some(2)),
      "legacy conf inert on Spark 4 — revisit the If-wrap if this fails")
    finally spark.conf.set("spark.sql.legacy.sizeOfNull", "false")
  }

  test("rule leaves real regex splits alone") {
    val df = Tables.documents(spark, sf)
      .select(size(split(col("text"), "[ ]+")).as("n"))
    assert(!plansTokenCount(df), "only the literal single-space pattern is a token count")
    assert(df.collect().forall(_.getInt(0) >= 1))
  }
}
