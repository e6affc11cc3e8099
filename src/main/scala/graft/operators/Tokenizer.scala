package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tokenizer TRAINING over the corpus — the one LLM-pipeline primitive
  * the fertility audit (q221) assumes but nothing previously learned:
  * byte-pair-encoding merge rounds (Sennrich, Haddow & Birch, ACL 2016,
  * "Neural Machine Translation of Rare Words with Subword Units").
  * q221 measures how an *assumed* tokenizer splits the corpus; this
  * operator runs the training loop that produces such a tokenizer's
  * merge table.
  *
  * Algorithm (the classic corpus-level BPE): represent every distinct
  * word as its character sequence weighted by corpus frequency; each
  * round counts adjacent symbol pairs (occurrence-weighted), picks the
  * argmax pair deterministically (count desc, left asc, right asc),
  * and rewrites every word by merging that pair left-to-right
  * non-overlapping.  Five rounds yield the first five merges — the
  * head of the merge table a production train would extend to 30-50k.
  *
  * Spark-first shape (the q264 set-cover superstep discipline): the
  * word table is ONE keyed aggregate of the corpus scan (vocab-sized,
  * stays distributed); each round is one explode + partial+final keyed
  * count, a 1-row TakeOrdered argmax, and an expression-only
  * projection applying the merge (a higher-order `aggregate` fold over
  * each word's symbol array — per-word work, embarrassingly parallel).
  * The driver holds only the ≤`rounds` picked merges; no vocab-sized
  * window, no collect of the vocabulary, no cartesian anywhere
  * (OperatorSpec pins the plan).  Per-round frames are lazily pinned
  * (localCheckpoint — sequential main-thread consumers, the CC
  * superstep rule in SCALING.md) so round k never recomputes rounds
  * 1..k-1.
  *
  * 100 TB: the corpus scan happens once (word histogram); every round
  * then works on the vocab table — orders of magnitude smaller than
  * the corpus, but still distributed, so a 10⁹-type vocabulary would
  * spread over executors where a driver-side trainer dies.  The merge
  * fold is O(word length) per word.  This is the superstep layout a
  * real 50k-merge train would run (with merge batching); five rounds
  * certify the machinery.
  *
  * Determinism: pair counts are exact integers; the argmax tiebreak is
  * total (count desc, left asc, right asc — binary string order on
  * both engines); the merge fold is replayed structurally by the
  * DuckDB oracle (identical left-to-right non-overlapping semantics),
  * so all five rounds match value-exact.
  */
object Tokenizer {

  /** The weighted word table: one corpus scan, one keyed aggregate. */
  def wordHistogram(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Initial symbol sequences: each word exploded to its character
    * array (substring transform, not split-on-empty — Spark's split
    * keeps a trailing empty token under limit -1).
    */
  def initialSymbols(spark: SparkSession, dir: String): DataFrame =
    wordHistogram(spark, dir).select(col("freq"),
      transform(sequence(lit(1), length(col("word"))),
        i => col("word").substr(i, lit(1))).as("syms"))

  /** One round's pair histogram — exposed unexecuted for the plan pin:
    * explode to (left, right, freq) rows, partial+final keyed count.
    * Words of one symbol contribute nothing (empty transform range).
    */
  def pairCounts(syms: DataFrame): DataFrame =
    syms.select(col("freq"), explode(
      when(size(col("syms")) >= 2,
        transform(sequence(lit(1), size(col("syms")) - 1),
          i => struct(
            element_at(col("syms"), i).as("l"),
            element_at(col("syms"), i + 1).as("r"))))
        .otherwise(array().cast("array<struct<l:string,r:string>>"))).as("p"))
      .select(col("p.l").as("l"), col("p.r").as("r"), col("freq"))
      .groupBy("l", "r").agg(sum(col("freq")).as("c"))

  /** Left-to-right non-overlapping merge of (l, r) in a symbol array —
    * an expression-only fold (no UDF): seed an empty accumulator,
    * append each symbol unless it completes the pair with the
    * accumulator's last element, in which case replace that element
    * with the merged token.  "aaaa" under (a,a) becomes [aa, aa] —
    * the Sennrich greedy, NOT string-replace (whose resume-after-
    * replacement scan would give [aa, a, a]).
    */
  def mergeFold(syms: Column, l: String, r: String): Column =
    aggregate(
      transform(syms, s => array(s)),
      typedLit(Array.empty[String]),
      (acc, e) => when(size(acc) > 0
          && element_at(acc, -1) === lit(l) && element_at(e, 1) === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, e)))

  /** The training loop shared by q295 (the merge table itself) and
    * q300 (applying it): run `rounds` supersteps, returning the picked
    * merges with their pair counts and post-merge symbol totals —
    * the ONLY driver-held state.
    */
  def trainMerges(spark: SparkSession, dir: String, rounds: Int)
      : Vector[(Int, String, String, Long, Long)] = {
    var syms = initialSymbols(spark, dir).localCheckpoint(false)
    var picked = Vector.empty[(Int, String, String, Long, Long)]
    var k = 1
    var exhausted = false
    while (k <= rounds && !exhausted) {
      val top = pairCounts(syms)
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        syms = syms.select(col("freq"), mergeFold(col("syms"), l, r).as("syms"))
          .localCheckpoint(false)
        val nAfter = syms.agg(sum(col("freq") * size(col("syms"))).as("n"))
          .collect()(0).getLong(0)
        picked :+= ((k, l, r, c, nAfter))
        k += 1
      }
    }
    picked
  }

  /** q295: the first `rounds` BPE merges with their pair counts and
    * the post-merge corpus symbol total.  Output is assembled
    * driver-side from the ≤`rounds` collected argmax rows (the q264
    * bounded-greedy pattern); everything corpus/vocab-sized stays
    * distributed.
    */
  def bpeMerges(spark: SparkSession, dir: String, rounds: Int = 5): DataFrame = {
    import spark.implicits._
    trainMerges(spark, dir, rounds)
      .map { case (k, l, r, c, n) => (k, l, r, l + r, c, n) }
      .toDF("merge_round", "pair_left", "pair_right", "merged",
        "pair_count", "n_symbols_after")
      .orderBy("merge_round")
  }

  /** Apply an ordered merge list to a symbol-array column — the ENCODE
    * half of BPE: merges replay in learned priority order, each as the
    * same left-to-right fold used in training.  Expression-only; the
    * whole application is one projection, no shuffle.
    */
  def applyMerges(syms: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(syms) { case (c, (l, r)) => mergeFold(c, l, r) }

  /** q300: tokenizer evaluation with the LEARNED merges — the apply
    * half q221's fertility audit assumes: train the q295 merge table,
    * segment every (source, word) occurrence with it, and report per
    * source the corpus word/char/symbol mass, fertility (symbols per
    * word) and compression (chars per symbol).  The interesting reading
    * is cross-source: a source whose text matches the corpus-dominant
    * patterns compresses harder under the shared merge table — the
    * domain-mismatch signal tokenizer teams watch when adding a new
    * source to the mix.
    *
    * 100 TB shape: training as q295; application is a pure projection
    * over the (source, word) histogram (vocab-sized, distributed) —
    * the corpus is never re-scanned at doc grain after the two keyed
    * histograms.  Only exact integers cross engines; the two ratios
    * are single terminal divides.
    */
  def bpeApply(spark: SparkSession, dir: String, rounds: Int = 5): DataFrame = {
    val merges = trainMerges(spark, dir, rounds).map { case (_, l, r, _, _) => (l, r) }
    val sw = Tables.documents(spark, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("source", "word").agg(count(lit(1)).as("freq"))
      .select(col("source"), col("freq"), length(col("word")).cast("long").as("n_chars"),
        transform(sequence(lit(1), length(col("word"))),
          i => col("word").substr(i, lit(1))).as("syms"))
    sw.select(col("source"), col("freq"), col("n_chars"),
        size(applyMerges(col("syms"), merges)).cast("long").as("n_syms"))
      .groupBy("source")
      .agg(sum(col("freq")).as("n_words"),
        sum(col("freq") * col("n_chars")).as("n_chars"),
        sum(col("freq") * col("n_syms")).as("n_symbols"))
      .select(col("source"), col("n_words"), col("n_chars"), col("n_symbols"),
        (col("n_symbols").cast("double") / col("n_words").cast("double"))
          .as("fertility"),
        (col("n_chars").cast("double") / col("n_symbols").cast("double"))
          .as("compression"))
      .orderBy("source")
  }

  /** q302: the learned vocabulary's coverage curve — explode the
    * applied symbol stream (occurrence-weighted), rank symbols by
    * corpus frequency (count desc, symbol asc — total order), and
    * report the top `topN` with cumulative coverage of the symbol
    * mass.  The head of this curve is where the q295 merges live: a
    * merge only earns its vocab slot by absorbing mass from its
    * parts.  The rank window runs over a bounded frame (top-N after a
    * keyed aggregate), the q37 top-k discipline.
    */
  def vocabCoverage(spark: SparkSession, dir: String,
      rounds: Int = 5, topN: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val merges = trainMerges(spark, dir, rounds).map { case (_, l, r, _, _) => (l, r) }
    val symCounts = initialSymbols(spark, dir)
      .select(col("freq"), explode(applyMerges(col("syms"), merges)).as("symbol"))
      .groupBy("symbol").agg(sum(col("freq")).as("n_occ"))
    val total = symCounts.agg(sum(col("n_occ")).as("n_total"))
    val top = symCounts
      .orderBy(col("n_occ").desc, col("symbol").asc).limit(topN)
    val w = Window.orderBy(col("n_occ").desc, col("symbol").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    top.crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n_occ").desc, col("symbol").asc)))
      .withColumn("cum_occ", sum(col("n_occ")).over(w))
      .select(col("rank"), col("symbol"), col("n_occ"), col("cum_occ"),
        (col("cum_occ").cast("double") / col("n_total").cast("double"))
          .as("cum_coverage"))
      .orderBy("rank")
  }
}
