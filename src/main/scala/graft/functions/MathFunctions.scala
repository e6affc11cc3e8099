package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Scalar math helpers whose builtin counterparts are not
  * cross-engine bit-reproducible — see graft.plans.GraftLn.
  */
object MathFunctions {

  /** Natural log, bit-identical to libm/DuckDB `ln` (the builtin
    * Spark `ln` goes through StrictMath and differs in the last ulp
    * on ~4% of inputs).  Input must already be a DOUBLE column.
    */
  def ln(c: Column): Column =
    ColumnBridge.column(graft.plans.GraftLn(ColumnBridge.expression(c)))
}
