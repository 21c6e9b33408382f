package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Parse a race lap/sector time string `"M:SS.mmm"` into milliseconds.
  *
  * Re-expresses the reference's `convert_time_to_ms`
  * (/root/reference/loaders/base_loader.py:213-221): split on `:`,
  * `(minutes * 60 + seconds) * 1000`, truncated to integer; malformed or
  * empty input → null. Implemented as a native Catalyst expression with
  * `doGenCode` so it stays inside whole-stage codegen on the fact-table
  * hot path (a Scala UDF here would break the codegen span and cost
  * serialization on every row at 100 TB scale).
  */
case class RaceTimeMillis(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"race_time_ms expects STRING, got ${child.dataType.catalogString}")

  override def nullSafeEval(input: Any): Any = {
    val parsed = RaceTimeMillis.parse(input.asInstanceOf[UTF8String].toString)
    if (parsed == java.lang.Long.MIN_VALUE) null else java.lang.Long.valueOf(parsed)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = RaceTimeMillis.getClass.getName.stripSuffix("$")
    val parsed = ctx.freshName("graftParsed")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |long $parsed = $cls$$.MODULE$$.parse($c.toString());
         |if ($parsed == Long.MIN_VALUE) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $parsed;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): RaceTimeMillis = copy(child = newChild)
  override def prettyName: String = "race_time_ms"
}

object RaceTimeMillis {
  /** Long.MinValue sentinel = unparseable (expression maps it to null). */
  def parse(s: String): Long = {
    if (s == null || s.isEmpty) return Long.MinValue
    val colon = s.indexOf(':')
    if (colon <= 0 || colon == s.length - 1) return Long.MinValue
    try {
      val minutes = java.lang.Long.parseLong(s.substring(0, colon))
      val seconds = java.lang.Double.parseDouble(s.substring(colon + 1))
      ((minutes * 60L + seconds) * 1000.0).toLong
    } catch {
      case _: NumberFormatException => Long.MinValue
    }
  }
}
