package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (FIXTURES.md §B —
  * the 8 star-schema/event tables are also listed in TESTDATA.md;
  * `documents`/`embeddings` appear only in FIXTURES.md §B.3).
  * One parquet file per table under `$dir/`.
  *
  * These are plain `spark.read.parquet` scans: Catalyst handles column
  * pruning and predicate pushdown into the parquet reader, which is the
  * scan architecture that scales to 100 TB (splittable files, pruned
  * row groups) — nothing custom is needed or wanted here.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    normalizeNtz(spark.read.parquet(s"$dir/$name.parquet"))

  /** Parquet written by pyarrow (isAdjustedToUTC=false) loads as
    * TIMESTAMP_NTZ under Spark 4's NTZ inference, but the epoch-math
    * functions the operators use (`unix_millis` & co.) require the
    * instant-typed TimestampType.  The session time zone is pinned to
    * UTC (GraftSession), so casting NTZ→LTZ relabels the same wall
    * clock as the same instant — bit-identical to DuckDB's
    * naive-timestamp `epoch_ms` arithmetic on the same files.
    */
  private def normalizeNtz(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val ntz = df.schema.fields.filter(_.dataType == TimestampNTZType)
    // fail fast at the cast site (ADVICE r12): the NTZ→LTZ relabel is
    // only an identity under a UTC session — a session built without
    // the pin would silently shift every timestamp by the local offset
    if (ntz.nonEmpty) {
      val tz = df.sparkSession.conf.get("spark.sql.session.timeZone", "")
      require(tz == "UTC",
        s"normalizeNtz requires spark.sql.session.timeZone=UTC (got '$tz'): " +
          "the NTZ cast relabels wall-clock values as instants and is only " +
          "lossless when the session clock is UTC (GraftSession pins it)")
    }
    ntz.foldLeft(df) {
      (d, f) => d.withColumn(f.name, col(f.name).cast(TimestampType))
    }
  }

  def region(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = apply(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = apply(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = apply(spark, dir, "lineitem")
  /** `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark 4
    * refuses to map to its microsecond TimestampType by default.  Read
    * the raw nanos as a long (legacy conf) and truncate to micros —
    * the same ns→µs truncation DuckDB applies, so event-time values
    * stay oracle-identical.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = apply(spark, dir, "events")
    if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
    else df
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")

  /** Register every table as a temp view for `spark.sql` use.  `events`
    * goes through its normalizing loader — a plain read would throw on
    * the TIMESTAMP(NANOS) column whenever no earlier query happened to
    * set the legacy conf (query execution order is map-order, so that
    * is a latent ordering dependency, not a safe assumption).
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, dir) else apply(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
}
