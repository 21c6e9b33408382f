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
  def cosine(a: ArrayData, b: ArrayData): Double = cosine2(a, b, aFloat = true, bFloat = true)

  /** Element-type-aware cosine: each side is array<float> or
    * array<double> (`aFloat`/`bFloat` resolved from the static schema).
    * The accumulation loop is strictly in index order, so a replica that
    * reduces the same element sequence with the same IEEE ops (DuckDB
    * `list_reduce`) reproduces the value bit-for-bit.
    */
  def cosine2(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** Quantize array<float> to scaled longs: floor(x·scale + 0.5). Every
    * step (float→double widen, multiply by a power-of-two scale, +0.5,
    * floor, integral truncate) is an exact or exactly-rounded IEEE op, so
    * any engine computing the same formula over the same floats yields
    * identical integers — the foundation for cross-engine-deterministic
    * centroid arithmetic (integer sums are associative; float means are
    * not).
    */
  def quantize(v: ArrayData, scale: Double): ArrayData = {
    val n = v.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = math.floor(v.getFloat(i).toDouble * scale + 0.5).toLong
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
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

/** cosine(array<float|double>, array<float|double>) → double, codegen'd. */
case class CosineSimilarity(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _)  => true
    case ArrayType(DoubleType, _) => false
    case other => throw new IllegalArgumentException(
      s"cosine_sim expects array<float> or array<double>, got $other")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    java.lang.Double.valueOf(GraftVec.cosine2(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], isFloat(left), isFloat(right)))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = GraftVec.getClass.getName.stripSuffix("$")
    val (af, bf) = (isFloat(left), isFloat(right))
    nullSafeCodeGen(ctx, ev, (a, b) => s"${ev.value} = $cls$$.MODULE$$.cosine2($a, $b, $af, $bf);")
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

/** quantize_vec(array<float>) → array<long> of floor(x·scale + 0.5),
  * codegen'd. See [[GraftVec.quantize]] for the determinism argument.
  */
case class QuantizeVec(child: Expression, scale: Double) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(v: Any): Any =
    GraftVec.quantize(v.asInstanceOf[ArrayData], scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = GraftVec.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $cls$$.MODULE$$.quantize($c, $scale);")
  }
  override protected def withNewChildInternal(newChild: Expression): QuantizeVec = copy(child = newChild)
  override def prettyName: String = "quantize_vec"
}
