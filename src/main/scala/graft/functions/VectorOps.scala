package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Dense-vector kernels over array<float> embedding columns. Static
  * methods callable from generated code — the ANN operators' hot loops
  * stay inside whole-stage codegen.
  */
object GraftVec {
  /** Cosine similarity, accumulated in double for stability. 0.0 when
    * either norm is zero; requires equal lengths.
    */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** Random-hyperplane sign sketch: `nbits` pseudo-random projections
    * (deterministic from `seed` via splitmix64), sign bit per projection.
    * Hamming distance on the sketch approximates angular distance — the
    * LSH prefilter for embedding near-dup at scale.
    */
  def signSketch(v: ArrayData, nbits: Int, seed: Long): Long = {
    val n = v.numElements()
    var out = 0L
    var b = 0
    while (b < nbits) {
      var acc = 0.0
      var d = 0
      while (d < n) {
        // deterministic pseudo-random weight in [-1, 1)
        val h = GraftHash.splitmix64(seed + b.toLong * 131071L + d)
        val w = (h >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
        acc += w * v.getFloat(d)
        d += 1
      }
      if (acc >= 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** cosine(array<float>, array<float>) → double, codegen'd. */
case class CosineSimilarity(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Double.valueOf(GraftVec.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = GraftVec.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $cls$$.MODULE$$.cosine($a, $b);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
  override def prettyName: String = "cosine_sim"
}

/** sign_sketch(array<float>) → 64-bit LSH sketch, codegen'd. */
case class SignSketch(child: Expression, nbits: Int, seed: Long) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(GraftVec.signSketch(v.asInstanceOf[ArrayData], nbits, seed))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = GraftVec.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls$$.MODULE$$.signSketch($c, $nbits, ${seed}L);")
  }
  override protected def withNewChildInternal(newChild: Expression): SignSketch = copy(child = newChild)
  override def prettyName: String = "sign_sketch"
}
