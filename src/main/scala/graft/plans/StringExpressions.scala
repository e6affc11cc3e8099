package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity as a native codegen'd expression — the
  * fuzzy-matching scalar Spark lacks (it ships `levenshtein` but no
  * Jaro family), implemented to be BIT-IDENTICAL to DuckDB's
  * `jaro_winkler_similarity` so fuzzy-join results can be
  * hash-compared across engines.
  *
  * Contract (fuzzed 3000 random string pairs against DuckDB — zero
  * mismatches; see StringExprSpec):
  *   - match window  max(|a|,|b|)/2 − 1 (floored at 0)
  *   - Jaro = (m/|a| + m/|b| + (m−t)/m) / 3, left-associated adds,
  *     transpositions t = half the out-of-order matches
  *   - Winkler boost only when jaro > 0.7: jw = j + ℓ·0.1·(1−j) with
  *     ℓ = common prefix length capped at 4
  *   - either side empty (or zero matches) → 0.0; NULL in → NULL out
  * Every arithmetic step above is written in exactly that order —
  * `(m/la + m/lb + (m−t)/m) / 3.0` then `j + l*0.1*(1.0−j)` — which
  * is the order DuckDB evaluates, so IEEE rounding agrees on every
  * input, not just typical ones.
  *
  * The corpus here is ASCII (TPC-H names); positions are UTF-16 chars,
  * which equal code points and DuckDB character positions for ASCII —
  * the same restriction MinHashes documents.
  *
  * Scale: O(|a|·window) per pair with two small bitsets, zero
  * allocation beyond them, inside whole-stage codegen — the per-row
  * cost that makes a blocked fuzzy join CPU-bound on comparisons, not
  * GC.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (STRING, STRING), got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jw"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.JaroWinkler.similarity($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Callable from generated Java (static forwarder on the object). */
  def similarity(ua: UTF8String, ub: UTF8String): Double = {
    val a = ua.toString
    val b = ub.toString
    val la = a.length
    val lb = b.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val ma = new Array[Boolean](la)
    val mb = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!mb(j) && a.charAt(i) == b.charAt(j)) {
          ma(i) = true; mb(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (ma(i)) {
        while (!mb(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val j = (m / la.toDouble + m / lb.toDouble + (m - t) / m.toDouble) / 3.0
    if (j > 0.7) {
      var l = 0
      val cap = math.min(4, math.min(la, lb))
      while (l < cap && a.charAt(l) == b.charAt(l)) l += 1
      j + l * 0.1 * (1.0 - j)
    } else j
  }
}
