package graft.plans

import org.apache.spark.sql.catalyst.expressions.{AttributeReference, BloomFilterMightContain, EqualTo, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BinaryType, LongType}

/** The stats-feedback registry: a CBO decision (here: the q339 bloom
  * prune, measured and certified zero-false-negative) ENFORCED inside
  * a Catalyst plan instead of reported as an audit row.  A build step
  * aggregates the dim side's join keys into a bloom bitmap
  * (`graft_bloom_agg`, Spark's own distributed BloomFilterAggregate)
  * and registers it under the probe column's name; the injected
  * optimizer rule [[InjectBloomPrefilter]] then splices
  * `might_contain(bloom, key)` as a Filter UNDER the probe side of
  * any inner equi-join on that column — before the shuffle, where the
  * pruning pays.
  *
  * Scoping: consumers register the bloom under a per-call UNIQUE
  * column name (the probe column is renamed internally), so the rule
  * can never fire on an unrelated query's join — the registry is
  * inert for every plan that doesn't carry a registered name.
  *
  * This is the registry flavor of Spark's own InjectRuntimeFilter
  * (which splices the build as a scalar subquery at optimization
  * time); the registry flavor matches the engine's ANALYZE lifecycle
  * — stats are built once (q331/q338/q339), persisted, and consumed
  * by later plans (q335/q348, and now this rule) — and lets the SAME
  * bitmap serve many queries without rebuilding per plan.
  */
object BloomRegistry {
  private val entries =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()

  def register(probeAttrName: String, bloom: Array[Byte]): Unit =
    entries.put(probeAttrName, bloom)

  def lookup(probeAttrName: String): Option[Array[Byte]] =
    Option(entries.get(probeAttrName))

  def isEmpty: Boolean = entries.isEmpty

  def clear(): Unit = entries.clear()
}

/** Optimizer rule: for an inner equi-join whose probe-side key column
  * is registered in [[BloomRegistry]], insert
  * `BloomFilterMightContain(bloomLiteral, key)` as a Filter on that
  * side — the join's result is unchanged (a bloom has NO false
  * negatives: every true match passes, the q339-certified property),
  * but definite-miss rows die before the exchange.  Idempotent (the
  * fixed-point batch requirement): a side already carrying a
  * might_contain on the same attribute is left alone.  Only LongType
  * keys are eligible (BloomFilterAggregate's input contract).
  */
object InjectBloomPrefilter extends Rule[LogicalPlan] {

  private def alreadyFiltered(side: LogicalPlan, name: String): Boolean =
    side.collectFirst { case f: Filter if f.condition.exists {
      case BloomFilterMightContain(_, a: AttributeReference) => a.name == name
      case _ => false
    } => f }.nonEmpty

  private def prefilter(side: LogicalPlan, attr: AttributeReference,
      bloom: Array[Byte]): LogicalPlan =
    Filter(BloomFilterMightContain(Literal(bloom, BinaryType), attr), side)

  private def equiAttrs(cond: Expression): Seq[AttributeReference] =
    cond.collect { case EqualTo(a: AttributeReference, b: AttributeReference) =>
      Seq(a, b) }.flatten

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (BloomRegistry.isEmpty) plan
    else plan.transform {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        val candidates = equiAttrs(cond).filter(a =>
          a.dataType == LongType && BloomRegistry.lookup(a.name).isDefined)
        candidates.foldLeft(j) { (join, attr) =>
          val bloom = BloomRegistry.lookup(attr.name).get
          if (join.left.outputSet.contains(attr) &&
              !alreadyFiltered(join.left, attr.name))
            join.copy(left = prefilter(join.left, attr, bloom))
          else if (join.right.outputSet.contains(attr) &&
              !alreadyFiltered(join.right, attr.name))
            join.copy(right = prefilter(join.right, attr, bloom))
          else join
        }
    }
}
