package graft.operators

import graft.Tables
import graft.functions.ArgotFlatten
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Window / event-time operators over the `events` table (SURVEY.md
  * §2.B window functions; the reference's "latest txn wins" analog).
  *
  * All window specs carry `event_id` as a unique tiebreaker after `ts`
  * so row numbering is total-ordered and engine-portable.  Time deltas
  * are computed in integer epoch-milliseconds (exact in both engines).
  *
  * Scale: every window here partitions by `user_id` — one shuffle on a
  * high-cardinality key, then per-partition sorted evaluation; no
  * global sort, no skew beyond per-user event counts (AQE skew-join
  * handling covers pathological users).
  */
object EventOps {

  private def byUser = Window.partitionBy("user_id")

  /** Latest event per user — row_number over (ts DESC, event_id DESC).
    * This is the dedup-keep-latest pattern (reference resume semantics:
    * the max-id probe in README.md:84-88 is the 1-key special case).
    */
  def latestPerUser(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("rn", row_number().over(byUser.orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("rn") === 1)
      .select("user_id", "event_id", "event_type", "value")

  /** Inter-event gap stats per user via lag(): average time between
    * consecutive events in ms.  Integer-millis sums stay exact under
    * any aggregation order.
    */
  def userGapStats(spark: SparkSession, dir: String): DataFrame = {
    val w = byUser.orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(spark, dir)
      .withColumn("prev_ms", lag(unix_millis(col("ts")), 1).over(w))
      .withColumn("gap_ms", unix_millis(col("ts")) - col("prev_ms"))
      .filter(col("gap_ms").isNotNull)
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_gaps"),
        (sum(col("gap_ms")).cast("double") / count(lit(1))).as("avg_gap_ms"),
        max(col("gap_ms")).as("max_gap_ms"))
  }

  /** Sessionization: a new session starts when the gap to the previous
    * event exceeds `gapMs` (default 30 min).  session index = running
    * sum of new-session flags — the classic two-window formulation,
    * one shuffle on user_id.
    */
  def sessionize(spark: SparkSession, dir: String, gapMs: Long = 30 * 60 * 1000L): DataFrame = {
    val w = byUser.orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(spark, dir)
      .withColumn("prev_ms", lag(unix_millis(col("ts")), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ms").isNull || unix_millis(col("ts")) - col("prev_ms") > gapMs, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("new_session")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_idx")
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("session_value"))
  }

  /** Per-user running total (cumulative frame) — the running-aggregate
    * window shape.  The accumulating sum goes through DECIMAL so every
    * prefix is exact and engine-portable (a double running sum would
    * depend on the engine's window-aggregation tree: Spark accumulates
    * sequentially, DuckDB uses segment trees).
    */
  def runningTotals(spark: SparkSession, dir: String): DataFrame = {
    val w = byUser.orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, dir)
      .withColumn("running_value",
        sum(col("value").cast(DecimalType(18, 2))).over(w).cast("double"))
      .select("user_id", "event_id", "running_value")
  }

  /** JSON extraction from the `props` payload column with
    * get_json_object, then aggregate over the extracted key — the
    * engine's `events.props` exercise (SURVEY.md §2.B scalar/JSON row).
    */
  def propsKeyStats(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy("event_type")
      .agg(
        count(col("k")).as("n_with_k"),
        sum(col("k")).as("sum_k"),
        max(col("k")).as("max_k"))

  /** Tumbling 1-hour event-time buckets (batch form of the streaming
    * windowed agg; the string bucket key keeps the compare portable).
    */
  def hourlyBuckets(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH").as("hour_bucket"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("bucket_value"))

  /** The flatten transform applied to a real JSON column: flatten
    * `props` to the multi-valued map and explode to (event_id, key,
    * value) rows — the engine-side shape of the reference's
    * flatten+suffix stage (O7) over the fixture's JSON payloads.
    */
  def flattenedProps(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"), explode(ArgotFlatten.flattenArgot(col("props"))).as(Seq("key", "values")))
      .select(col("event_id"), col("key"), explode(col("values")).as("value"))
}
