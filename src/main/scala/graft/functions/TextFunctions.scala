package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.functions._

/** Text-analysis column builders for the LLM-data-pipeline tier.
  *
  * Everything here is composed from `org.apache.spark.sql.functions`
  * (whole-stage-codegen'd, no UDFs) so the expressions stay inside
  * Tungsten codegen on the 100 TB path, and every one has an exact
  * ANSI-SQL equivalent the DuckDB oracle can run.
  */
object TextFunctions {

  /** Whitespace tokens of a space-joined text column. */
  def tokens(text: Column): Column = split(text, " ")

  /** Token count (whitespace tokenization). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count: occurrences of runs of 1-4 LOWERCASE
    * alphanumerics — the fixture corpus is lowercase token soup, so the
    * narrow class is deliberate (uppercase/underscore never occur; a
    * general corpus would widen the class).  A real BPE needs a merges
    * table; the regex gives a deterministic, engine-portable proxy with
    * the same cost shape (linear scan).
    */
  def subwordCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-z0-9]{1,4}"), lit(0)))

  /** Word n-gram shingles (array<string>), built narrowly with
    * sequence+transform+slice — no explode, no shuffle, stays inside
    * codegen.  Callers must filter `size(tokens) >= n` first (sequence
    * with stop < start would run descending in Spark).
    */
  def shingles(text: Column, n: Int): Column = {
    val w = tokens(text)
    transform(
      sequence(lit(1), size(w) - lit(n - 1)),
      i => concat_ws(" ", slice(w, i, lit(n))))
  }

  /** Canonical document fingerprint: md5 over the sorted distinct token
    * set.  Detects bag-of-words duplicates (word-order shuffles) that
    * exact-hash dedup misses; groupBy(fingerprint) is an exact-shuffle
    * dedup at any scale.
    */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))))

  /** Distinct word-n-gram shingles via the native one-pass expression
    * (graft.plans.ShingleSet) — same contents as
    * `array_distinct(shingles(text, n))`, none of the interpreted
    * lambda cost.
    */
  def shingleSet(text: Column, n: Int): Column =
    ColumnBridge.column(graft.plans.ShingleSet(
      ColumnBridge.expression(text), n))

  /** Jaro–Winkler similarity via the native codegen'd expression
    * (graft.plans.JaroWinkler) — bit-identical to DuckDB's
    * `jaro_winkler_similarity`; the fuzzy-match scalar Spark lacks.
    */
  def jaroWinkler(a: Column, b: Column): Column =
    ColumnBridge.column(graft.plans.JaroWinkler(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Per-doc bigram repetition stats `[n_bigrams, n_distinct,
    * top_count]` in one pass (graft.plans.RepetitionStats) — folds the
    * explode + two doc-keyed aggregations of the definitional
    * formulation into a shuffle-free projection.
    */
  def repetitionStats(text: Column): Column =
    ColumnBridge.column(graft.plans.RepetitionStats(
      ColumnBridge.expression(text)))

  /** All k seeded minhashes in one narrow pass (array<long>, seed
    * order) via the native expression — see graft.plans.MinHashes for
    * the seeded-hash contract mirrored by the DuckDB oracle.
    */
  def minHashes(text: Column, n: Int, numHashes: Int): Column =
    ColumnBridge.column(graft.plans.MinHashes(
      ColumnBridge.expression(text), n, numHashes))

  /** Winnowing fingerprint set (array<long>, distinct, ascending) via
    * the native one-pass expression — see graft.plans.WinnowFingerprints
    * for the hash contract mirrored by the DuckDB oracle.
    */
  def winnowFingerprints(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(graft.plans.WinnowFingerprints(
      ColumnBridge.expression(text), k, w))

  /** Heuristic language id from marker-token hits.  The fixture's text
    * is synthetic token soup, so the markers are deliberately simple
    * common-word probes; the point is the *shape* (a codegen'd CASE
    * over cheap string scans — the standard fastText-less fallback).
    */
  def langIdHeuristic(text: Column): Column = {
    val padded = concat(lit(" "), text, lit(" "))
    def has(tok: String): Column = locate(s" $tok ", padded) > 0
    when(has("the") || has("a"), "en")
      .when(has("el") || has("una"), "es")
      .when(has("le") || has("une"), "fr")
      .when(has("der") || has("und"), "de")
      .otherwise("und")
  }

  /** Quality score in [0,1]: blend of type-token ratio and mean word
    * length scaled into [0,1].  Deterministic integer arithmetic until
    * the final division so the oracle matches bit-for-bit.
    */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val nDistinct = size(array_distinct(tokens(text))).cast("double")
    val avgWordLen = (length(text) - tokenCount(text) + lit(1)).cast("double") / nTok
    val ttr = nDistinct / nTok
    // raw doubles, no rounding: the oracle reproduces the exact same
    // IEEE operation sequence, so the bits match without a round()
    ttr * lit(0.5) + least(avgWordLen / lit(10.0), lit(1.0)) * lit(0.5)
  }
}
