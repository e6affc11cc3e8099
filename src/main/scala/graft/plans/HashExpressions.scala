package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** The repo-wide 60-bit content hash as ONE native codegen'd
  * expression: bit-identical to
  * `conv(substring(md5(c), 1, 15), 16, 10).cast("long")` — the first
  * 15 hex digits of an md5 are exactly the top 60 bits of the
  * big-endian digest, so the value is the first 8 digest bytes as an
  * unsigned big-endian long shifted right by 4 (dropping the 16th
  * nibble).  Non-negative by construction (range [0, 2⁶⁰)).
  *
  * Why native: the conv formulation materializes the 32-char hex
  * UTF8String, slices it, and re-parses 15 hex chars through Conv's
  * generic radix loop — three allocations and a parse per row on the
  * hottest streams in the engine (every exploded token/k-gram in
  * q21/q72/q241/q254/q262/q272-q275/q296/q301 flows through hv60).
  * This expression goes digest → long with zero string traffic.  The
  * md5 itself (DigestUtils, same provider Spark's Md5 uses) is
  * unchanged, so DuckDB's positional base-16 fold mirror
  * (OracleHelpers.hv60Sql) is untouched.
  *
  * Equivalence is triple-pinned in StringExprSpec: against the conv
  * formulation on random + adversarial inputs, codegen vs interpreted
  * parity, and NULL propagation.
  */
case class Hv60(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hv60"

  override def nullSafeEval(a: Any): Any =
    Hv60.hash(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Hv60.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Hv60 {
  /** First 60 bits of md5(utf8 bytes) as an unsigned long. */
  def hash(s: UTF8String): Long = {
    val d = org.apache.commons.codec.digest.DigestUtils.md5(s.getBytes)
    (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) | ((d(2) & 0xffL) << 40) |
      ((d(3) & 0xffL) << 32) | ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
  }
}
