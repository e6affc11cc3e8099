package graft

import graft.plans.JaroWinkler
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** Contract tests for the native Jaro–Winkler expression: known
  * DuckDB-produced values (bit-exact), codegen/interpreted parity,
  * and the metric's algebraic properties on the real catalog.
  */
class StringExprSpec extends SparkSuite {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinkler.similarity(UTF8String.fromString(a), UTF8String.fromString(b))

  test("jw: bit-exact against DuckDB jaro_winkler_similarity on probed values") {
    // values captured from DuckDB (the oracle engine) — full doubles
    assert(jw("martha", "marhta") == 0.9611111111111111)
    assert(jw("dixon", "dicksonx") == 0.8133333333333332)
    assert(jw("jellyfish", "smellyfish") == 0.8962962962962964)
    assert(jw("dwayne", "duane") == 0.8400000000000001)
    assert(jw("crate", "trace") == 0.7333333333333334)
    assert(jw("customer#000001", "customer#001") == 0.96)
    assert(jw("abc", "abc") == 1.0)
    // DuckDB's empty-string convention: 0, not 1
    assert(jw("", "") == 0.0)
    assert(jw("", "abc") == 0.0)
    assert(jw("a", "b") == 0.0)
    assert(jw("ab", "ba") == 0.0)
  }

  test("jw: boost applies only above 0.7 and only on the true prefix (cap 4)") {
    // crate/trace: jaro > 0.7 but zero common prefix — no boost
    assert(jw("crate", "trace") == jwJaroOnly("crate", "trace"))
    // prefix cap: identical 10-char prefix still boosts with l=4
    val j = jwJaroOnly("abcdefghij", "abcdefghix")
    assert(jw("abcdefghij", "abcdefghix") == j + 4 * 0.1 * (1.0 - j))
  }

  private def jwJaroOnly(a: String, b: String): Double = {
    // independent reference for the plain Jaro part
    val (la, lb) = (a.length, b.length)
    val w = math.max(0, math.max(la, lb) / 2 - 1)
    val mb = Array.fill(lb)(false)
    val ma = Array.fill(la)(false)
    var m = 0
    for (i <- 0 until la) {
      val lo = math.max(0, i - w); val hi = math.min(lb - 1, i + w)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!mb(j) && a(i) == b(j)) { ma(i) = true; mb(j) = true; m += 1; done = true }
        j += 1
      }
    }
    if (m == 0) return 0.0
    var t = 0; var k = 0
    for (i <- 0 until la if ma(i)) {
      while (!mb(k)) k += 1
      if (a(i) != b(k)) t += 1
      k += 1
    }
    t /= 2
    (m / la.toDouble + m / lb.toDouble + (m - t) / m.toDouble) / 3.0
  }

  test("jw: codegen and interpreted paths agree; SQL registration works; NULL in, NULL out") {
    val df = Seq(("martha", "marhta"), ("dixon", "dicksonx"), ("", "x"))
      .toDF("a", "b")
    graft.plans.RegisterFunctions(spark)
    val viaSql = df.selectExpr("graft_jw(a, b) AS jw").as[Double].collect()
    val viaCol = df.select(
      graft.functions.TextFunctions.jaroWinkler(col("a"), col("b"))).as[Double].collect()
    assert(viaSql.toSeq == viaCol.toSeq)
    assert(viaSql.toSeq == Seq(0.9611111111111111, 0.8133333333333332, 0.0))
    val withNull = Seq((Some("x"), None: Option[String])).toDF("a", "b")
      .selectExpr("graft_jw(a, b)").collect()
    assert(withNull.head.isNullAt(0))
  }

  test("jw: symmetry and identity on the real part-name vocabulary") {
    val names = Tables.part(spark, sf).select("p_name").distinct()
      .as[String].collect()
    assert(names.nonEmpty)
    for (a <- names; b <- names) {
      val s = jw(a, b)
      assert(s == jw(b, a), s"asymmetric: $a / $b")
      assert(s >= 0.0 && s <= 1.0)
      if (a == b) assert(s == 1.0)
    }
  }

  test("q181 reconcile: winner replayed by hand with the same total order") {
    val names = Tables.part(spark, sf).select("p_name")
      .as[String].collect().groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = Dedup181.run(spark, sf)
    val bests = got.map(r => r._1 -> r).toMap
    assert(bests.keySet == names.keySet)
    names.keys.foreach { a =>
      // replay with the explicit (jw desc, name asc) total order
      val sorted = names.keys.filter(_ != a).toSeq
        .sortBy(b => (-jw(a, b), b))
      val (_, na, bb, nb, s) = bests(a)
      assert(bb == sorted.head, s"$a: $bb vs ${sorted.head}")
      assert(s == jw(a, sorted.head))
      assert(na == names(a) && nb == names(sorted.head))
    }
  }

  test("q182 weekday index: calendar replay; indices average to 1 weighted by days") {
    val days = Tables.events(spark, sf)
      .select(expr("unix_millis(ts) div 86400000").as("day")).as[Long].collect()
    val byDay = days.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val cal = (days.min to days.max).map(d => ((d + 3) % 7, byDay.getOrElse(d, 0L)))
    val got = EventOps182.run(spark, sf)
    val byDow = got.map(r => r._1 -> r).toMap
    val calByDow = cal.groupBy(_._1)
    assert(byDow.keySet == calByDow.keySet)
    val (nAll, sAll) = (cal.size.toDouble, cal.map(_._2).sum.toDouble)
    calByDow.foreach { case (dow, ds) =>
      val (_, nd, ne, mean, idx) = byDow(dow)
      assert(nd == ds.size && ne == ds.map(_._2).sum)
      assert(mean == ne.toDouble / nd)
      assert(idx == (ne.toDouble / nd) / (sAll / nAll))
    }
    // day-weighted mean of indices is exactly 1
    val weighted = got.map(r => r._2 * r._5).sum / cal.size
    assert(math.abs(weighted - 1.0) < 1e-12)
  }
}

// thin accessors keeping the spec readable
private object Dedup181 {
  def run(spark: org.apache.spark.sql.SparkSession, sf: String) = {
    import spark.implicits._
    graft.operators.Dedup.nameReconcile(spark, sf)
      .select("name_a", "n_a", "best_match", "n_best", "jw")
      .as[(String, Long, String, Long, Double)].collect()
  }
}
private object EventOps182 {
  def run(spark: org.apache.spark.sql.SparkSession, sf: String) = {
    import spark.implicits._
    graft.operators.EventOps.weekdaySeasonality(spark, sf)
      .select("dow", "n_days", "n_events", "mean_count", "seasonal_index")
      .as[(Long, Long, Long, Double, Double)].collect()
  }
}
