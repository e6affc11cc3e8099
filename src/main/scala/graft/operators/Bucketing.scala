package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed co-located joins: pre-shuffle both fact tables into the
  * same bucket layout on the join key, then join with ZERO exchanges —
  * the standard way to amortize the dominant fact⋈fact shuffle across
  * every downstream query at 100 TB (pay the shuffle once at write
  * time, never again).
  *
  * Spark specifics: `bucketBy` is a managed-table write
  * (`saveAsTable`); both sides must agree on bucket count and key,
  * and `spark.sql.sources.bucketing.enabled` (default true) lets the
  * planner replace Exchange+Sort with the bucket layout.
  */
object Bucketing {

  /** Write `df` as a bucketed managed table (overwrites; also clears a
    * leftover table location from a previous JVM — the in-memory
    * catalog forgets tables across sessions but the warehouse dir
    * survives, and saveAsTable refuses to reuse the path).
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val warehouse = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    val loc = new java.io.File(warehouse, table)
    if (loc.exists()) {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(loc)
    }
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Bucket lineitem and orders on the join key and return the
    * co-located join — `explain` shows no Exchange on either side.
    */
  def colocatedOrderJoin(spark: SparkSession, dir: String, buckets: Int = 8): DataFrame = {
    writeBucketed(
      graft.Tables.lineitem(spark, dir).select("l_orderkey", "l_quantity", "l_extendedprice"),
      "graft_li_bucketed", "l_orderkey", buckets)
    writeBucketed(
      graft.Tables.orders(spark, dir).select("o_orderkey", "o_totalprice"),
      "graft_ord_bucketed", "o_orderkey", buckets)
    val li = spark.table("graft_li_bucketed")
    val o = spark.table("graft_ord_bucketed")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy("o_orderkey")
      .agg(count(lit(1)).as("n_lines"), sum("l_quantity").as("total_qty"))
  }
}
