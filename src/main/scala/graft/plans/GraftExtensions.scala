package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook exposing the engine's native
  * expressions to SQL (`SELECT graft_dot(a.embedding, b.embedding)`),
  * so spark.sql users get the codegen'd hot path without touching the
  * Scala API:
  *
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions)...
  *   // or: --conf spark.sql.extensions=graft.plans.GraftExtensions
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_dot(arrayFloat, arrayFloat)")
        DotProduct(args(0), args(1))
      }))
    e.injectFunction((
      FunctionIdentifier("graft_norm"),
      new ExpressionInfo(classOf[VecNorm].getName, "graft_norm"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_norm(arrayFloat)")
        VecNorm(args.head)
      }))
  }
}
