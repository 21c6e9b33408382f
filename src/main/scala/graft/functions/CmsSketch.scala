package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count-Min Sketch point-frequency estimator (Cormode & Muthukrishnan
  * 2005) with DETERMINISTIC, cross-engine replayable arithmetic — the
  * fourth sketch of the family (HLL = distinct, SpaceSaving = top-k,
  * Bloom = membership, CMS = per-key frequency). Row j's bucket for key
  * x is splitmix64(base(x) + j) masked to w (a power of two), so the
  * DuckDB oracle replays every counter with the splitmix HUGEINT
  * replica. Estimates are the classic min over rows — always ≥ the true
  * count, never under.
  *
  * The 100 TB shape: each partial is d·w longs (d=4, w=512 → 16 KiB)
  * regardless of input size, merges are elementwise sums (associative,
  * commutative), so corpus-wide token frequencies for ANY later probe
  * key cost one map-side pass + a 16 KiB-per-partition reduce — the
  * token domain itself never shuffles. The reference's audit counts
  * (/root/reference/metadata.py:44-115) at sketch scale, keyed.
  */
object CmsSketch {
  /** Row-j hash base: strings fold through FNV-1a 64; integral keys are
    * used directly (splitmix64 decorrelates per row below).
    */
  def baseOf(v: Any, isString: Boolean): Long =
    if (isString) GraftHash.fnv64(v.asInstanceOf[UTF8String])
    else v.asInstanceOf[Number].longValue()

  def bucket(base: Long, j: Int, w: Int): Int =
    (GraftHash.splitmix64(base + j) & (w - 1)).toInt
}

/** The mergeable counter plane: d rows × w counters, row-major. */
final class CmsCounters(val d: Int, val w: Int) {
  val counts = new Array[Long](d * w)

  def addBase(base: Long): Unit = {
    var j = 0
    while (j < d) {
      counts(j * w + CmsSketch.bucket(base, j, w)) += 1L
      j += 1
    }
  }

  def merge(other: CmsCounters): Unit = {
    var i = 0
    while (i < counts.length) { counts(i) += other.counts(i); i += 1 }
  }

  def estimateBase(base: Long): Long = {
    var best = Long.MaxValue
    var j = 0
    while (j < d) {
      val c = counts(j * w + CmsSketch.bucket(base, j, w))
      if (c < best) best = c
      j += 1
    }
    best
  }
}

/** Wire format: [d: 1 byte][log2(w): 1 byte][d·w big-endian longs] —
  * the same bytes serve agg-buffer shuffle and first-class stored
  * sketch values (the HllWire convention).
  */
object CmsWire {
  def toBytes(buf: CmsCounters): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(2 + 8 * buf.counts.length)
    bb.put(buf.d.toByte)
    bb.put(java.lang.Integer.numberOfTrailingZeros(buf.w).toByte)
    buf.counts.foreach(bb.putLong)
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): CmsCounters = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val d = bb.get().toInt
    val w = 1 << bb.get().toInt
    val out = new CmsCounters(d, w)
    var i = 0
    while (i < out.counts.length) { out.counts(i) = bb.getLong(); i += 1 }
    out
  }

  /** Static estimate entrypoints for generated code. */
  def estimateString(bytes: Array[Byte], key: UTF8String): Long =
    fromBytes(bytes).estimateBase(GraftHash.fnv64(key))

  def estimateLong(bytes: Array[Byte], key: Long): Long =
    fromBytes(bytes).estimateBase(key)
}

/** cms_sketch(col, d, w) → binary counter plane. */
case class CmsSketchAgg(
    child: Expression,
    d: Int,
    w: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CmsCounters] {

  require(d >= 1 && d <= 16, s"cms_sketch depth $d outside [1,16]")
  require(w >= 2 && (w & (w - 1)) == 0, s"cms_sketch width $w must be a power of two")

  @transient private lazy val isString = child.dataType == StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType | StringType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs an integral or STRING input, got ${other.catalogString} " +
        "(fractional values would silently truncate; cast explicitly if intended)")
  }

  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def children: Seq[Expression] = Seq(child)
  override def createAggregationBuffer(): CmsCounters = new CmsCounters(d, w)

  override def update(buf: CmsCounters, input: InternalRow): CmsCounters = {
    val v = child.eval(input)
    if (v != null) buf.addBase(CmsSketch.baseOf(v, isString))
    buf
  }

  override def merge(buf: CmsCounters, other: CmsCounters): CmsCounters = {
    buf.merge(other); buf
  }

  override def eval(buf: CmsCounters): Any = CmsWire.toBytes(buf)
  override def serialize(buf: CmsCounters): Array[Byte] = CmsWire.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): CmsCounters = CmsWire.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CmsSketchAgg =
    copy(child = newChildren.head)
}

/** cms_estimate(sketch, key) → estimated count of key (≥ true count). */
case class CmsEstimate(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  @transient private lazy val isString = right.dataType == StringType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (BinaryType, LongType | IntegerType | ShortType | ByteType | StringType) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (BINARY sketch, integral-or-STRING key), got (${l.catalogString}, ${r.catalogString})")
  }

  override def nullSafeEval(sketch: Any, key: Any): Any =
    java.lang.Long.valueOf(
      CmsWire.fromBytes(sketch.asInstanceOf[Array[Byte]])
        .estimateBase(CmsSketch.baseOf(key, isString)))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = CmsWire.getClass.getName.stripSuffix("$")
    val call = if (isString) "estimateString" else "estimateLong"
    nullSafeCodeGen(ctx, ev, (s, k) =>
      s"${ev.value} = $cls$$.MODULE$$.$call($s, $k);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}
