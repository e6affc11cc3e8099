package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing fingerprints (MOSS scheme) in one pass per row.
  *
  * The builtin formulation — `transform(sequence(...), i ->
  * md5(substr(text,i,k)))` + per-window `array_min(slice(...))` —
  * dominates the q44 bench: Catalyst interprets the higher-order
  * lambdas element by element and md5 allocates a digest per position
  * (~1k per document).  This expression computes a rolling polynomial
  * hash over code points and a monotonic-deque sliding minimum: O(n)
  * per document, zero allocation in the hot loop, inside whole-stage
  * codegen.
  *
  * Hash contract (oracle-critical, mirrored in the DuckDB SQL):
  *   h(i) = fold over the k code points c of text[i..i+k):
  *          acc ← (acc · 31 + c) mod 2^32,  acc₀ = 0
  * — exactly DuckDB's
  *   list_reduce(list_transform(range(i, i+k), j -> ascii(substr(text,j,1))),
  *               (a, b) -> (a * 31 + b) % 4294967296).
  * The corpus is printable ASCII, so Java chars == code points ==
  * DuckDB character positions.  Any hash collisions are shared by both
  * engines, so parity is unconditional.
  *
  * Output: the DISTINCT window minima, sorted ascending — the per-doc
  * `DISTINCT` that the SQL pipeline applied after explode is folded
  * into the expression, removing one whole shuffle from the operator.
  * Texts too short for a single window yield an empty array.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  // analysis-time type check (AbstractDataType/ExpectsInputTypes are
  // private[sql], so the generic mixin is unavailable out-of-package)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  override def nullSafeEval(a: Any): Any =
    WinnowFingerprints.compute(a.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.WinnowFingerprints.compute($a, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** All `numHashes` seeded min-hashes of a document's word-`n`-gram
  * shingle set, in one narrow pass — no shingle explode, no distinct,
  * no aggregation shuffle.  Valid because min() is idempotent over
  * duplicate shingles: the min over the multiset equals the min over
  * the set, so the per-row computation is exactly the groupBy-min the
  * SQL formulation used.
  *
  * Seeded hash family (oracle contract): one base polynomial hash per
  * shingle, h₀(s) = fold of `acc ← (acc·31 + codepoint) mod 2^32`,
  * then per seed a MULTIPLICATIVE scramble
  *   h_seed(s) = (A_seed · h₀(s) + seed) mod 2^32,
  *   A_seed    = (2654435761 · (seed+1) mod 2^32) | 1  (odd ⇒ bijective).
  * Distinct odd multipliers give genuinely different orderings of the
  * shingle space — an ADDITIVE seed (seed·31^len + h₀, the earlier
  * formulation) makes every seed a constant offset of one ordering for
  * same-length shingles, i.e. k correlated rotations, and the banded
  * 1-(1-s^r)^b recall estimate silently fails.  The DuckDB oracle
  * computes the identical scramble (HUGEINT product, then mod).
  * Shingles are the `n` tokens joined with a single space, tokens from
  * splitting on every single space (Spark split semantics, empties
  * kept).
  *
  * Output: array of `numHashes` minima (seed order), or an empty array
  * when the document has fewer than `n` tokens.
  */
case class MinHashes(child: Expression, n: Int, numHashes: Int)
    extends UnaryExpression {

  // analysis-time type check (AbstractDataType/ExpectsInputTypes are
  // private[sql], so the generic mixin is unavailable out-of-package)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhashes"

  override def nullSafeEval(a: Any): Any =
    MinHashes.compute(a.asInstanceOf[UTF8String], n, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.MinHashes.compute($a, $n, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashes {

  private val Mask = 0xFFFFFFFFL

  /** Per-seed odd multiplier (Knuth multiplicative constant family). */
  def multiplier(seed: Int): Long = ((2654435761L * (seed + 1)) & Mask) | 1L

  def compute(text: UTF8String, n: Int, numHashes: Int): ArrayData = {
    val s = text.toString
    val tokens = s.split(" ", -1)
    val m = tokens.length - n + 1 // number of shingles
    if (m < 1) return new GenericArrayData(Array.empty[Long])

    val as = Array.tabulate(numHashes)(multiplier)
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < m) {
      // base hash f = fold(0, chars), one pass over the shingle's
      // characters (tokens joined by single spaces)
      var f = 0L
      var t = 0
      while (t < n) {
        if (t > 0) f = (f * 31L + ' ') & Mask
        val tok = tokens(i + t)
        var c = 0
        while (c < tok.length) {
          f = (f * 31L + tok.charAt(c)) & Mask
          c += 1
        }
        t += 1
      }
      var seed = 0
      while (seed < numHashes) {
        // as(seed)*f < 2^64 wraps in the long, & Mask = mod 2^32 —
        // wraparound commutes with the final mod, so values match the
        // oracle's HUGEINT product exactly
        val h = (as(seed) * f + seed) & Mask
        if (h < mins(seed)) mins(seed) = h
        seed += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** Distinct word-`n`-gram shingles in one pass (array<string>,
  * first-occurrence order) — semantically identical to
  * `array_distinct(transform(sequence(...), i -> concat_ws(' ',
  * slice(tokens, i, n))))` but without per-element lambda
  * interpretation or the O(m²) array_distinct scan.  Tokenization is
  * Spark split-on-single-space (empties kept), matching DuckDB
  * string_split — the oracle's shingle CTE needs no change.
  */
case class ShingleSet(child: Expression, n: Int)
    extends UnaryExpression {

  // analysis-time type check (AbstractDataType/ExpectsInputTypes are
  // private[sql], so the generic mixin is unavailable out-of-package)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(a: Any): Any =
    ShingleSet.compute(a.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.ShingleSet.compute($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleSet {
  def compute(text: UTF8String, n: Int): ArrayData = {
    val tokens = text.toString.split(" ", -1)
    val m = tokens.length - n + 1
    if (m < 1) return new GenericArrayData(Array.empty[AnyRef])
    val seen = new java.util.LinkedHashSet[String](m * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var t = 0
      while (t < n) {
        if (t > 0) sb.append(' ')
        sb.append(tokens(i + t))
        t += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }
}

object WinnowFingerprints {

  private val Mask = 0xFFFFFFFFL // mod 2^32

  /** One-pass rolling hash + sliding-window minima + dedup.  Static so
    * generated code calls straight into compiled Scala.
    */
  def compute(text: UTF8String, k: Int, w: Int): ArrayData = {
    val s = text.toString
    val n = s.length
    val m = n - k + 1 // number of k-grams
    if (m < w) return new GenericArrayData(Array.empty[Long])

    // B^(k-1) mod 2^32, for removing the outgoing code point
    var bk1 = 1L
    var j = 0
    while (j < k - 1) { bk1 = (bk1 * 31L) & Mask; j += 1 }

    val hashes = new Array[Long](m)
    var h = 0L
    j = 0
    while (j < k) { h = (h * 31L + s.charAt(j)) & Mask; j += 1 }
    hashes(0) = h
    var i = 1
    while (i < m) {
      h = ((h - (s.charAt(i - 1) * bk1 & Mask) & Mask) * 31L + s.charAt(i + k - 1)) & Mask
      hashes(i) = h
      i += 1
    }

    // sliding min over windows of w via monotonic deque (indices)
    val deque = new Array[Int](m)
    var head = 0
    var tail = 0 // [head, tail)
    val mins = new java.util.TreeSet[java.lang.Long]()
    i = 0
    while (i < m) {
      while (tail > head && hashes(deque(tail - 1)) >= hashes(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) { mins.add(hashes(deque(head))); () }
      i += 1
    }

    val out = new Array[Long](mins.size)
    val it = mins.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }
}

/** Per-document bigram repetition statistics in one narrow pass:
  * `[n_bigrams, n_distinct, top_count]` over the word 2-grams of the
  * text — the inputs of the Gopher-style repetition quality filters.
  *
  * The builtin formulation (explode word 2-grams → groupBy(doc,
  * bigram) → groupBy(doc)) shuffles the full bigram stream TWICE on
  * doc-keyed hashes; this expression folds both aggregations into a
  * per-row hash map, so the whole q68 pipeline becomes a shuffle-free
  * projection.  Counting is over exact bigram strings (a per-document
  * java HashMap), so the result is identical to the exploded
  * count — no hashing approximation anywhere.
  *
  * Tokenization contract: split on every single space, empties kept
  * (Spark `split(text, " ")` semantics, mirrored by the oracle's
  * string_split).  Documents with fewer than two tokens yield
  * `[0, 0, 0]` — callers filter them exactly as the exploded
  * formulation's `len >= 2` did.
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_repetition"

  override def nullSafeEval(a: Any): Any =
    RepetitionStats.compute(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.RepetitionStats.compute($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepetitionStats {
  def compute(text: UTF8String): ArrayData = {
    val tokens = text.toString.split(" ", -1)
    val m = tokens.length - 1
    if (m < 1) return new GenericArrayData(Array(0L, 0L, 0L))
    val counts = new java.util.HashMap[String, Long](m * 2)
    val sb = new java.lang.StringBuilder(48)
    var top = 0L
    var i = 0
    while (i < m) {
      sb.setLength(0)
      sb.append(tokens(i)).append(' ').append(tokens(i + 1))
      val c = counts.merge(sb.toString, 1L, (a, b) => a + b)
      if (c > top) top = c
      i += 1
    }
    new GenericArrayData(Array(m.toLong, counts.size.toLong, top))
  }
}
