package graft

import org.apache.spark.sql.functions._

/** Throwaway probe: is Spark's ln() bit-identical to DuckDB's libm ln
  * on the rational inputs q82/q83 will feed it? Deleted after use.
  */
object TmpLnParity {
  def main(args: Array[String]): Unit = {
    val s = GraftSession.get("4")
    val rows = scala.io.Source.fromFile("/tmp/ln_jvm.csv").getLines()
      .map(_.split(","))
      .map(a => (a(0).toLong, a(1).toLong, a(2).toLong, a(3).toLong)).toSeq
    val df = s.createDataFrame(rows).toDF("num", "den", "strict_bits", "math_bits")
    val out = df.select(
      expr("ln(CAST(num AS DOUBLE)/CAST(den AS DOUBLE))").as("v"),
      col("strict_bits"), col("math_bits")).collect()
    var ms = 0
    var mm = 0
    out.foreach { r =>
      val bits = java.lang.Double.doubleToRawLongBits(r.getDouble(0))
      if (bits != r.getLong(1)) ms += 1
      if (bits != r.getLong(2)) mm += 1
    }
    println(s"SPARK_VS_STRICT=$ms SPARK_VS_MATH=$mm N=${out.length}")
    s.stop()
  }
}
