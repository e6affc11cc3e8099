package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

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
    // the engine's first injected OPTIMIZER RULE (not just functions):
    // size(split(x, " ", -1)) → allocation-free token_count(x), null
    // semantics preserved (see RewriteTokenCount)
    e.injectOptimizerRule(_ => RewriteTokenCount)
    // the stats-feedback rule: a registered bloom bitmap (built from
    // the dim side's keys, the q339 decision) becomes a pre-shuffle
    // might_contain Filter on the probe side of the matching join
    e.injectOptimizerRule(_ => InjectBloomPrefilter)
    // the join-order decision (q348's containment estimate) enforced:
    // a registered marker condition pulls its join innermost
    e.injectOptimizerRule(_ => ReorderJoinByStats)
    // the materialized-view rewrite: a registered aggregate over the
    // base table is answered from the rename-published MV artifact
    // (plan substitution with exprId-preserving aliases)
    e.injectOptimizerRule(_ => RewriteToMv)
    e.injectFunction((
      FunctionIdentifier("graft_token_count"),
      new ExpressionInfo(classOf[TokenCount].getName, "graft_token_count"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_token_count(string)")
        TokenCount(args.head)
      }))
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
    e.injectFunction((
      FunctionIdentifier("graft_winnow"),
      new ExpressionInfo(classOf[WinnowFingerprints].getName, "graft_winnow"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "graft_winnow(text, k, w)")
        WinnowFingerprints(args.head, GraftExtensions.intLit(args(1)), GraftExtensions.intLit(args(2)))
      }))
    e.injectFunction((
      FunctionIdentifier("graft_minhashes"),
      new ExpressionInfo(classOf[MinHashes].getName, "graft_minhashes"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "graft_minhashes(text, shingleN, numHashes)")
        MinHashes(args.head, GraftExtensions.intLit(args(1)), GraftExtensions.intLit(args(2)))
      }))
    e.injectFunction((
      FunctionIdentifier("graft_ln"),
      new ExpressionInfo(classOf[GraftLn].getName, "graft_ln"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_ln(double)")
        GraftLn(args.head)
      }))
    e.injectFunction((
      FunctionIdentifier("graft_repetition"),
      new ExpressionInfo(classOf[RepetitionStats].getName, "graft_repetition"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "graft_repetition(text)")
        RepetitionStats(args.head)
      }))
    e.injectFunction((
      FunctionIdentifier("graft_jw"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "graft_jw"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_jw(string, string)")
        JaroWinkler(args.head, args(1))
      }))
    // Spark ships a distributed bloom-filter aggregate + membership
    // probe for its own runtime join filters but leaves them out of the
    // public registry; exposing them gives SQL the classic at-scale
    // prefilter (build once over the small side, broadcast the bitmap
    // via a scalar subquery, drop definite-misses before any join).
    e.injectFunction((
      FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(classOf[BloomFilterAggregate].getName, "graft_bloom_agg"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "graft_bloom_agg(longCol, estItems, numBits)")
        new BloomFilterAggregate(args.head,
          Literal(GraftExtensions.longLit(args(1))), Literal(GraftExtensions.longLit(args(2))))
      }))
    e.injectFunction((
      FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(classOf[BloomFilterMightContain].getName, "graft_might_contain"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_might_contain(bloomBinary, longCol)")
        BloomFilterMightContain(args.head, args(1))
      }))
  }
}

object GraftExtensions {
  /** Resolve a literal int argument at registration time (k/w/n are
    * plan-shaping constants, not data).
    */
  private[plans] def intLit(e: Expression): Int = {
    require(e.foldable, s"expected a literal int, got $e")
    e.eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case o => throw new IllegalArgumentException(s"expected int literal, got $o")
    }
  }

  /** Same, but kept as Long (bloom sizing arguments) so the re-wrapped
    * literal always reaches BloomFilterAggregate's type check as
    * LongType regardless of how the SQL parser typed the number.
    */
  private[plans] def longLit(e: Expression): Long = {
    require(e.foldable, s"expected a literal long, got $e")
    e.eval() match {
      case i: Int => i.toLong
      case l: Long => l
      case o => throw new IllegalArgumentException(s"expected long literal, got $o")
    }
  }
}
