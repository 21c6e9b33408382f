package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

object RepetitionKernel {
  /** Within-document repetition stats in ONE pass over the token array:
    * (n_tokens, distinct_tokens, top_token_count, n_shingles,
    * distinct_shingles, token_entropy) — five counters plus the Shannon
    * entropy of the token histogram. These feed the Gopher-style repetition filters
    * (duplicate-token fraction, top-token dominance, duplicate-n-gram
    * fraction) — inherently per-document map-side work, so the operator
    * built on this never shuffles tokens: only the 5 small counters leave
    * the scan stage. Shingle distinctness runs on the chained-FNV hash
    * domain (same domain d4/dc1 block on).
    */
  def stats(tokens: ArrayData, k: Int): InternalRow = {
    val n = tokens.numElements()
    val counts = new java.util.HashMap[UTF8String, Int](n * 2)
    var top = 0
    var i = 0
    while (i < n) {
      val tok = if (tokens.isNullAt(i)) UTF8String.EMPTY_UTF8 else tokens.getUTF8String(i)
      val c = counts.merge(tok, 1, (a, b) => a + b)
      if (c > top) top = c
      i += 1
    }
    val sh = GraftHash.shingleHashes(tokens, k)
    val m = sh.numElements()
    val hs = new Array[Long](m)
    var j = 0
    while (j < m) { hs(j) = sh.getLong(j); j += 1 }
    java.util.Arrays.sort(hs)
    var distinctSh = 0
    j = 0
    while (j < m) {
      if (j == 0 || hs(j) != hs(j - 1)) distinctSh += 1
      j += 1
    }
    // Shannon entropy over the token distribution, from the count map
    // already built above — the same single pass feeds t7's fractions,
    // dc6's gate and t10's entropy panel
    var h = 0.0
    if (n > 0) {
      val it = counts.values().iterator()
      while (it.hasNext) {
        val p = it.next().toDouble / n
        h -= p * math.log(p)
      }
    }
    InternalRow(n, counts.size(), top, m, distinctSh, h)
  }
}

/** repetition_stats(tokens, k) → struct of the five repetition counters
  * plus the token-entropy double (t10's signal, same single pass).
  */
case class RepetitionStats(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("distinct_tokens", IntegerType, nullable = false),
    StructField("top_token_count", IntegerType, nullable = false),
    StructField("n_shingles", IntegerType, nullable = false),
    StructField("distinct_shingles", IntegerType, nullable = false),
    StructField("token_entropy", DoubleType, nullable = false)))
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    RepetitionKernel.stats(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = RepetitionKernel.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls$$.MODULE$$.stats($c, $k);")
  }
  override protected def withNewChildInternal(newChild: Expression): RepetitionStats = copy(child = newChild)
  override def prettyName: String = "repetition_stats"
}
