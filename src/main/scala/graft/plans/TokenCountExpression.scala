package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, If, IsNull, Literal, Size, StringSplit, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whitespace token count as a native codegen'd expression: the
  * engine's own `tokenCount` (and every inline `size(split(x, ' '))`)
  * semantically counts spaces + 1 — but the split form MATERIALIZES
  * the token array per row (one UTF8String per token plus the array
  * shell) only to take its length.  This expression scans the UTF-8
  * bytes once, allocation-free: 0x20 can only be the space character
  * itself in UTF-8 (continuation bytes are ≥ 0x80), so a byte count
  * is exact for any input, not just ASCII.
  *
  * Agrees with `size(split(x, " ", -1))` on every string: Spark's
  * split keeps trailing empty tokens at limit −1, so the array length
  * is exactly occurrences(' ') + 1 (empty string → 1, "a  b" → 3) —
  * fuzz-pinned in PlansSpec.
  */
case class TokenCount(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${child.dataType.catalogString}")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_token_count"

  override def nullSafeEval(v: Any): Any =
    TokenCount.count(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.TokenCount.count($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenCount {
  def count(s: UTF8String): Int = {
    val n = s.numBytes
    var i = 0
    var c = 1
    while (i < n) {
      if (s.getByte(i) == 0x20) c += 1
      i += 1
    }
    c
  }
}

/** Optimizer rule: rewrite `size(split(x, " ", -1))` to the
  * allocation-free [[TokenCount]] — the engine's first injected
  * `Rule[LogicalPlan]` (GraftExtensions), demonstrating the Catalyst
  * extension point beyond scalar functions.  Null semantics are
  * preserved exactly: with legacy sizeOfNull (`size(NULL) = -1`) a
  * nullable child is wrapped in `IF(ISNULL(x), -1, token_count(x))`;
  * otherwise the null-safe expression already matches.  Only the
  * literal single-space pattern at limit −1 is rewritten — any other
  * pattern is a real regex and keeps the split.
  */
object RewriteTokenCount extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(StringSplit(x, Literal(p: UTF8String, StringType),
          Literal(-1, IntegerType)), legacy)
          if p != null && p.toString == " " =>
        if (legacy && x.nullable)
          If(IsNull(x), Literal(-1), TokenCount(x))
        else TokenCount(x)
    }
}
