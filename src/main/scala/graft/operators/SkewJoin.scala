package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys (the explicit fallback when AQE's
  * runtime skew-join splitting isn't available — e.g. non-AQE builds,
  * or skew concentrated in one key beyond what split thresholds catch).
  *
  * Shape: the fact side gets a uniform random salt in [0, salt); the
  * dim side is replicated `salt`× with every salt value; the join key
  * becomes (key, salt), spreading one hot key over `salt` reducers.
  * Replication cost is |dim|·salt, so this fits fact⋈dim joins where
  * the dim is small-ish but too big (or too skew-sensitive) to
  * broadcast.
  *
  * The salt column uses a deterministic hash of the fact row's columns
  * PLUS its position (`monotonically_increasing_id`) when
  * `deterministic = true` — the position term is what spreads
  * byte-identical hot-key rows (a pure row-content hash would give
  * every duplicate the same salt and re-concentrate the key on one
  * reducer, exactly the skew the salt exists to break).  Deterministic
  * here means reproducible for a fixed input partitioning, which is
  * what tests need; `rand()` otherwise.
  */
object SkewJoin {

  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 salt: Int = 8, deterministic: Boolean = true): DataFrame = {
    val saltCol: Column =
      if (deterministic)
        pmod(hash(fact.columns.map(col) :+ monotonically_increasing_id(): _*), lit(salt))
      else (rand() * salt).cast("int")
    val saltedFact = fact.withColumn("__salt", saltCol)
    val saltedDim = dim
      .withColumn("__salt", explode(sequence(lit(0), lit(salt - 1))))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }

  /** q263's closed-form salt for an arbitrary keyed fact frame, as a
    * 1-ROW FRAME (not a driver value): max(1, ⌈max_key_rows·parts /
    * n_rows⌉) — how many reducers the heaviest key needs so its shard
    * stays within the balanced per-reducer load of a `parts`-reducer
    * shuffle.  Exact integer arithmetic throughout.
    */
  def advisedSalt(fact: DataFrame, key: String, parts: Int = 32): DataFrame =
    fact.groupBy(col(key)).agg(count(lit(1)).as("c"))
      .agg(sum(col("c")).as("n_rows"), max(col("c")).as("max_key_rows"))
      .select(greatest(lit(1L),
        expr(s"(max_key_rows * $parts + n_rows - 1) div n_rows"))
        .as("__salt_n"))

  /** saltedJoin with the salt DRIVEN BY THE DATA: the q263 closed form
    * computed over the fact's own key histogram rides a broadcast
    * 1-row frame into both sides — fact rows salt `pmod(hash, salt_n)`,
    * the dim replicates `salt_n`×, and no driver-side collect ever
    * happens (the r15 verdict's q263→q48 loop closure).  The advice
    * aggregate is one extra partial+final pass over the fact — the
    * price of AQE-less shuffle planning; at 100 TB the same number
    * comes from table statistics or a sketch, amortized across every
    * join on the key.  ReindexJobSpec pins the advised salt against a
    * recounted closed form, the dim-side replication factor, and
    * result equality with the unsalted plan.
    */
  def advisedSaltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                        parts: Int = 32): DataFrame = {
    val advice = broadcast(advisedSalt(fact, key, parts))
    val saltedFact = fact.crossJoin(advice)
      .withColumn("__salt",
        pmod(hash(fact.columns.map(col) :+ monotonically_increasing_id(): _*)
          .cast("long"), col("__salt_n")))
      .drop("__salt_n")
    val saltedDim = dim.crossJoin(advice)
      .withColumn("__salt", explode(sequence(lit(0L), col("__salt_n") - 1)))
      .drop("__salt_n")
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }

  /** q263: join-key skew audit + salt advisor — the measurement that
    * decides WHETHER `saltedJoin` (q48) is needed and what `salt` to
    * pass.  Per event_type over the events fact: row/key counts, the
    * heaviest key's row count, skew factor (max/mean key size), the
    * coefficient of variation of key sizes, and the recommended salt
    * factor for a `parts`-reducer shuffle:
    *
    *   salt = max(1, ceil(max_key_rows / (n_rows / parts)))
    *        = max(1, ceil(max_key_rows * parts / n_rows))
    *
    * i.e. how many reducers the single heaviest key needs so its
    * shard is no larger than the balanced per-reducer load.  All
    * columns derive from integer counts by exact integer arithmetic
    * (the ceil is `(a*parts + n - 1) div n`) or one correctly-rounded
    * double divide/sqrt, so the audit is bit-identical cross-engine.
    *
    * 100 TB shape: one partial+final keyed aggregate over (type, key),
    * then a type-grain rollup — no joins, no windows; the frequency
    * moments (n, max, Σc²) are exactly the statistics a 1000-executor
    * AQE-less planner needs before committing a shuffle strategy.
    */
  def skewAudit(spark: SparkSession, dir: String, parts: Int = 32): DataFrame = {
    val kc = graft.Tables.events(spark, dir)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("c"))
    kc.groupBy("event_type")
      .agg(sum(col("c")).as("n_rows"),
        count(lit(1)).as("n_keys"),
        max(col("c")).as("max_key_rows"),
        sum(col("c") * col("c")).as("sum_c2"))
      .select(col("event_type"), col("n_rows"), col("n_keys"),
        col("max_key_rows"),
        ((col("max_key_rows") * col("n_keys")).cast("double")
          / col("n_rows").cast("double")).as("skew_factor"),
        (sqrt(greatest(lit(0L),
          col("n_keys") * col("sum_c2") - col("n_rows") * col("n_rows"))
          .cast("double"))
          / col("n_rows").cast("double")).as("key_cv"),
        greatest(lit(1L),
          expr(s"(max_key_rows * $parts + n_rows - 1) div n_rows"))
          .as("salt_factor"))
      .orderBy("event_type")
  }
}
