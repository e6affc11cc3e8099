package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Materialized-view rewrite (q368): the fourth injected optimizer
  * rule, and the first one that substitutes a PLAN rather than an
  * expression or a child — a registered aggregate query over the base
  * table is answered from a rename-published MV artifact instead, so
  * the physical plan carries ZERO base-table scans.
  *
  * Division of labor (the same split real MV systems use):
  *   - the REGISTRATION helper ([[MvStore.registerRollup]]) performs
  *     the derivability reasoning — the consumer's monthly rollup
  *     decomposes over the MV's daily partial sums because SUM and
  *     COUNT are self-decomposable (sum of partial sums, sum of
  *     partial counts) and month is a coarsening of day.  It builds
  *     the compensation plan (re-aggregation over the MV scan) and
  *     registers it under the consumer's marker;
  *   - the RULE ([[RewriteToMv]]) only enforces a registered
  *     substitution: it matches the Aggregate whose child exposes the
  *     per-call-unique marker column, checks the replacement's output
  *     arity/types positionally (refusing any mismatch — the
  *     soundness guard), and splices the compensation plan in with
  *     exprId-preserving aliases so every parent operator resolves
  *     unchanged.
  *
  * Scoping follows [[BloomRegistry]]: the marker is a per-call-unique
  * column name on the consumer's scan-side projection, so the rule is
  * inert for every other plan; the registry is bounded and consumers
  * unregister in `finally`.  Value identity is oracle-gated (q368's
  * DuckDB oracle recomputes from the base table) and the plan swap is
  * pinned by Batch29Spec (no lineitem scan in the rewritten plan, a
  * lineitem scan in the unregistered control).
  *
  * 100 TB shape: the MV build is ONE base-table scan into a keyed
  * aggregate (map-side combined, day×flag-sized output), paid once and
  * rename-published like every other engine artifact; each rewritten
  * consumer reads the KB..MB-sized MV instead of the 100 TB fact — the
  * canonical precomputation lever for repeated rollup dashboards.
  */
object MvRegistry {
  /** Bounded insertion-ordered store (the [[BloomRegistry]] rule);
    * entries are logical plans (larger than bitmaps), so the bound is
    * tighter.  Evicting a registration only forfeits the rewrite —
    * the base-table aggregate is equally correct.
    */
  private val maxEntries = 16
  private val entries = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[String, LogicalPlan]() {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, LogicalPlan]): Boolean =
        size() > maxEntries
    })

  def register(markerAttrName: String, replacement: LogicalPlan): Unit = {
    entries.put(markerAttrName, replacement); ()
  }

  def unregister(markerAttrName: String): Unit = {
    entries.remove(markerAttrName); ()
  }

  def lookup(markerAttrName: String): Option[LogicalPlan] =
    Option(entries.get(markerAttrName))

  def isEmpty: Boolean = entries.isEmpty

  def clear(): Unit = entries.clear()
}

/** Optimizer rule: an Aggregate whose child output carries a column
  * registered in [[MvRegistry]] is replaced by the registered
  * compensation plan, wrapped in a Project that re-aliases the
  * replacement's output to the Aggregate's original names AND exprIds
  * (positionally), so parents above — the consumer's Sort, any later
  * operator — resolve without re-analysis.
  *
  * Guards:
  *   - positional arity + dataType equality between the matched
  *     Aggregate's output and the replacement's output — a
  *     registration whose shape drifted from its consumer is REFUSED
  *     (the plan runs un-rewritten, still correct);
  *   - nullability may only narrow (replacement non-nullable where the
  *     original was nullable is fine; the reverse is refused — a
  *     parent compiled against a non-nullable attribute must never
  *     see nulls).
  *
  * Idempotent: the substituted subtree reads the MV relation and
  * exposes no marker-named column, so the fixed-point batch cannot
  * match it again; the rule descends into the spliced plan harmlessly.
  */
object RewriteToMv extends Rule[LogicalPlan] {

  private def replacementFor(agg: Aggregate): Option[LogicalPlan] =
    agg.child.output.collectFirst {
      case a if MvRegistry.lookup(a.name).isDefined =>
        MvRegistry.lookup(a.name).get
    }

  private def shapesMatch(agg: Aggregate, rep: LogicalPlan): Boolean =
    rep.output.length == agg.output.length &&
      rep.output.zip(agg.output).forall { case (r, o) =>
        r.dataType == o.dataType && (o.nullable || !r.nullable)
      }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (MvRegistry.isEmpty) plan
    else plan.transform {
      case agg: Aggregate =>
        replacementFor(agg) match {
          case Some(rep) if shapesMatch(agg, rep) =>
            Project(agg.output.zip(rep.output).map { case (o, r) =>
              Alias(r, o.name)(exprId = o.exprId)
            }, rep)
          case _ => agg
        }
    }
}

/** The MV artifact lifecycle: build + rename-publish (the
  * [[StatsStore]] discipline applied to precomputed data instead of
  * optimizer statistics), the derivability-reasoned registration, and
  * the consumer builders q368/Batch29Spec share.
  */
object MvStore {

  private def dec4(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 4))

  /** The MV definition: daily revenue partials per returnflag — per-row
    * revenue quantized to DECIMAL(18,4) (exact, order-independent
    * accumulation; the q01 money rule), summed per (day, flag) with the
    * partial row count.  SUM/COUNT are self-decomposable, which is what
    * makes every coarser rollup answerable from this frame.
    */
  def mvFrame(spark: SparkSession, sfDir: String): DataFrame =
    graft.Tables.lineitem(spark, sfDir)
      .select(col("l_shipdate").as("day"), col("l_returnflag").as("flag"),
        dec4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      .groupBy("day", "flag")
      .agg(sum(col("rev")).as("rev_partial"), count(lit(1)).as("n_partial"))

  /** Build and rename-publish the MV artifact (none-or-all; a crashed
    * publish leaves the previous artifact readable).
    */
  def publish(spark: SparkSession, sfDir: String, storeDir: String): Unit =
    StatsStore.publishNamed(mvFrame(spark, sfDir), storeDir, "mv_daily_rev")

  /** The daily partials of ONE micro-batch — the per-epoch unit the
    * streaming maintainer (q372) publishes.  Same per-row DECIMAL
    * quantization as [[mvFrame]], so epoch partials merge to the
    * batch MV exactly.
    */
  def epochPartials(batch: DataFrame): DataFrame =
    batch.select(col("day"), col("flag"),
      dec4(col("price") * (lit(1.0) - col("disc"))).as("rev"))
      .groupBy("day", "flag")
      .agg(sum(col("rev")).as("rev_partial"), count(lit(1)).as("n_partial"))

  /** Rename-publish one epoch's partials under its deterministic batch
    * id.  Idempotent under micro-batch REPLAY: a restarted batch N
    * re-publishes epoch-N over itself (one rename), never appends —
    * which is exactly why SUM-maintenance needs per-epoch artifacts
    * where the HLL maintainer (q336) could get away with idempotent
    * max-merge.
    */
  def publishEpoch(df: DataFrame, storeDir: String, batchId: Long): Unit =
    StatsStore.publishNamed(df, storeDir, f"epoch-$batchId%03d")

  /** The compensation plan: the consumer's monthly rollup re-derived
    * over the MV — month coarsens day, total revenue = sum of daily
    * DECIMAL partials (exact), line count = sum of daily counts
    * (coalesced to keep the count column non-nullable, matching the
    * consumer's `count(1)`).  Output is POSITIONALLY aligned with
    * [[baseConsumer]]'s aggregate: (month, flag, revenue DOUBLE,
    * count LONG).
    */
  def rollupFromMv(spark: SparkSession, storeDir: String): DataFrame =
    spark.read.parquet(s"$storeDir/mv_daily_rev")
      .groupBy(substring(col("day").cast("string"), 1, 7).as("mv_month"),
        col("flag"))
      .agg(sum(col("rev_partial")).cast("double").as("mv_rev"),
        coalesce(sum(col("n_partial")), lit(0L)).as("mv_n"))

  /** Register the compensation plan for `marker` (the consumer's
    * scan-side revenue column name).  The analyzed plan is captured
    * here; [[RewriteToMv]] splices it verbatim.
    */
  def registerRollup(spark: SparkSession, storeDir: String,
      marker: String): Unit =
    MvRegistry.register(marker, rollupFromMv(spark, storeDir)
      .queryExecution.analyzed)

  /** The consumer query AS WRITTEN BY A USER — monthly revenue per
    * returnflag straight off the base table.  The per-call-unique
    * `marker` names the scan-side revenue column; when a registration
    * exists the optimizer answers this from the MV, otherwise it runs
    * as written (the Batch29Spec control).
    */
  def baseConsumer(spark: SparkSession, sfDir: String,
      marker: String): DataFrame =
    graft.Tables.lineitem(spark, sfDir)
      .select(substring(col("l_shipdate").cast("string"), 1, 7).as("ship_month"),
        col("l_returnflag"),
        dec4(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as(marker))
      .groupBy("ship_month", "l_returnflag")
      .agg(sum(col(marker)).cast("double").as("mv_revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("ship_month", "l_returnflag")
}
