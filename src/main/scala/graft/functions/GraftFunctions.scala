package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.classic.{GraftInterop => ExpressionUtils}

/** Column-API and SQL-registry surface for graft's native expressions. */
object GraftFunctions {

  /** `"M:SS.mmm"` → milliseconds (null on malformed). Codegen'd. */
  def race_time_ms(c: Column): Column =
    ExpressionUtils.column(RaceTimeMillis(ExpressionUtils.expression(c)))

  /** Register every graft function for SQL use (`SELECT race_time_ms(x)`). */
  def registerAll(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction(
      "race_time_ms", exprs => RaceTimeMillis(exprs.head), "built-in")
  }
}
