package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** Registration helper for sessions that already exist (tests, REPLs —
  * `withExtensions` only applies at session construction).
  */
object RegisterFunctions {
  def apply(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", (args: Seq[Expression]) => DotProduct(args(0), args(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_norm", (args: Seq[Expression]) => VecNorm(args.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_winnow", (args: Seq[Expression]) =>
        WinnowFingerprints(args.head, GraftExtensions.intLit(args(1)), GraftExtensions.intLit(args(2))), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhashes", (args: Seq[Expression]) =>
        MinHashes(args.head, GraftExtensions.intLit(args(1)), GraftExtensions.intLit(args(2))), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_repetition", (args: Seq[Expression]) => {
        require(args.length == 1, "graft_repetition(text)")
        RepetitionStats(args.head)
      }, "built-in")
  }
}
