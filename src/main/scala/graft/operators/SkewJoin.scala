package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
}
