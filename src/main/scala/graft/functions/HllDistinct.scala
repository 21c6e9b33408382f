package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog distinct-count sketch with DETERMINISTIC, cross-engine
  * replayable arithmetic (Flajolet et al. 2007). The sketch itself is the
  * standard one — m = 2^p byte registers, register j keeps the max
  * leading-zero rank of hashes landing in bucket j — but the estimator is
  * computed through an EXACT integer register sum (Σ 2^(K-M[j]) as a
  * BigInt) followed by a single double division, so the result is
  * independent of register visit order and reproducible by any engine
  * with 128-bit integers (the DuckDB oracle replays it in HUGEINT).
  *
  * The 100 TB shape: each partial is m bytes regardless of input size,
  * merges are elementwise max (associative, commutative), so a
  * billions-of-rows COUNT(DISTINCT) becomes a map-side sketch + one
  * m-byte-per-partition reduce — no shuffle of the key domain at all.
  * Contrast Spark's built-in approx_count_distinct, which is also HLL++
  * but whose bias-corrected estimate is not readily replayable in SQL;
  * this one is, which is what lets the driver's DuckDB gate verify it.
  *
  * Re-expresses the reference's audit statistics at sketch scale
  * (/root/reference/metadata.py:44-115 counts distinct entities per sync;
  * at corpus scale those become sketches).
  */
object HllDistinct {
  /** max rank: hash has 64-p usable bits, +1 for the all-zero word. */
  def maxRank(p: Int): Int = 64 - p + 1

  /** Standard HLL alpha constant per register count. */
  def alpha(m: Int): Double = m match {
    case 16 => 0.673
    case 32 => 0.697
    case 64 => 0.709
    case _ => 0.7213 / (1.0 + 1.079 / m)
  }

  /** The estimator numerator alpha·m²·2^K as ONE double constant — both
    * the Scala eval and the generated DuckDB replica divide this same
    * literal by the exact integer register sum, so the two engines agree
    * bit-for-bit (Double.toString round-trips).
    */
  def numerator(p: Int): Double = {
    val m = 1 << p
    alpha(m) * m.toDouble * m.toDouble * math.pow(2.0, maxRank(p).toDouble)
  }

  /** Rank of a hash for bucket width p: leading zeros of (h << p) + 1,
    * capped at K (the all-zero-suffix case).
    */
  def rank(h: Long, p: Int): Int = {
    val w = h << p
    math.min(java.lang.Long.numberOfLeadingZeros(w) + 1, maxRank(p))
  }

  /** Estimate from a register array: exact integer sum, one division.
    * Small-range linear counting (est ≤ 2.5m with empty registers) uses
    * m·ln(m/V) — deterministic given (m, V), and the replica emits the
    * same branch.
    */
  def estimate(regs: Array[Byte], p: Int): Double = {
    val m = regs.length
    val k = maxRank(p)
    var sum = BigInt(0)
    var zeros = 0
    var j = 0
    while (j < m) {
      val r = regs(j) & 0xff
      if (r == 0) zeros += 1
      sum += BigInt(1) << (k - r)
      j += 1
    }
    val raw = numerator(p) / sum.toDouble
    if (raw <= 2.5 * m && zeros > 0) m.toDouble * math.log(m.toDouble / zeros)
    else raw
  }
}

/** The mergeable register state. */
final class HllRegisters(val p: Int) {
  val regs = new Array[Byte](1 << p)

  def addHash(h: Long): Unit = {
    val idx = (h >>> (64 - p)).toInt
    val r = HllDistinct.rank(h, p)
    if (r > (regs(idx) & 0xff)) regs(idx) = r.toByte
  }

  def merge(other: HllRegisters): Unit = {
    var j = 0
    while (j < regs.length) {
      if ((other.regs(j) & 0xff) > (regs(j) & 0xff)) regs(j) = other.regs(j)
      j += 1
    }
  }

  def estimate: Double = HllDistinct.estimate(regs, p)
}

/** hll_distinct(col, p) → double estimated distinct count. Long inputs
  * hash through splitmix64; string inputs through FNV-1a 64 then
  * splitmix64 (finalizer decorrelates FNV's low-entropy high bits before
  * the bucket split).
  */
/** Shared plumbing of the HLL aggregates: register-state buffer with the
  * (p + registers) byte wire format the sketches travel in.
  */
sealed trait HllAggBase extends TypedImperativeAggregate[HllRegisters] {
  def p: Int

  override def nullable: Boolean = false
  override def createAggregationBuffer(): HllRegisters = new HllRegisters(p)

  override def merge(buf: HllRegisters, other: HllRegisters): HllRegisters = {
    buf.merge(other); buf
  }

  override def serialize(buf: HllRegisters): Array[Byte] = HllWire.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): HllRegisters = HllWire.fromBytes(bytes)
}

/** The sketch wire format: 1 byte precision + 2^p register bytes. The
  * SAME encoding serves agg-buffer shuffle bytes and first-class binary
  * sketch VALUES (hll_sketch output / hll_merge input), so sketches can
  * be stored in tables and re-aggregated later — the 100 TB pattern of
  * per-day sketches rolled up to any grain without rescanning.
  */
object HllWire {
  def toBytes(buf: HllRegisters): Array[Byte] = {
    val out = new Array[Byte](1 + buf.regs.length)
    out(0) = buf.p.toByte
    System.arraycopy(buf.regs, 0, out, 1, buf.regs.length)
    out
  }

  def fromBytes(bytes: Array[Byte]): HllRegisters = {
    val sketch = new HllRegisters(bytes(0).toInt)
    System.arraycopy(bytes, 1, sketch.regs, 0, sketch.regs.length)
    sketch
  }

  def estimateBytes(bytes: Array[Byte]): Double =
    HllDistinct.estimate(java.util.Arrays.copyOfRange(bytes, 1, bytes.length), bytes(0).toInt)
}

/** Adds one raw value into the registers (shared by the two row-input
  * aggregates): longs hash through splitmix64, strings through FNV-1a 64
  * then splitmix64 (the finalizer decorrelates FNV's biased high bits
  * before the bucket split).
  */
sealed trait HllRowInput extends HllAggBase {
  def child: Expression

  // lazy: the child is unresolved when the Column wrapper constructs this
  @transient private lazy val isString = child.dataType == StringType

  // integral or string keys only: a DOUBLE/DECIMAL child would silently
  // truncate through Number.longValue (1.2 and 1.9 collapse to the same
  // register update — an undetectable undercount). Reject at analysis
  // time, same contract as BloomBuildAgg; cast explicitly if truncation
  // is actually intended.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType | ShortType | ByteType | StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName needs an integral or STRING input, got ${other.catalogString} " +
            "(fractional values would silently truncate; cast explicitly if intended)")
    }

  override def children: Seq[Expression] = Seq(child)

  override def update(buf: HllRegisters, input: InternalRow): HllRegisters = {
    val v = child.eval(input)
    if (v != null) {
      val base =
        if (isString) GraftHash.fnv64(v.asInstanceOf[UTF8String])
        else v.asInstanceOf[Number].longValue()
      buf.addHash(GraftHash.splitmix64(base))
    }
    buf
  }
}

/** hll_distinct(col, p) → double estimated distinct count. */
case class HllDistinctAgg(
    child: Expression,
    p: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends HllRowInput {

  require(p >= 4 && p <= 16, s"hll_distinct precision $p outside [4,16]")

  override def dataType: DataType = DoubleType
  override def eval(buf: HllRegisters): Any = java.lang.Double.valueOf(buf.estimate)

  override def withNewMutableAggBufferOffset(offset: Int): HllDistinctAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HllDistinctAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): HllDistinctAgg =
    copy(child = c.head)
  override def prettyName: String = "hll_distinct"
}

/** hll_sketch(col, p) → binary sketch VALUE — store it, ship it, merge it
  * later with [[HllMergeAgg]]; read it with [[HllEstimate]].
  */
case class HllSketchAgg(
    child: Expression,
    p: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends HllRowInput {

  require(p >= 4 && p <= 16, s"hll_sketch precision $p outside [4,16]")

  override def dataType: DataType = BinaryType
  override def eval(buf: HllRegisters): Any = HllWire.toBytes(buf)

  override def withNewMutableAggBufferOffset(offset: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HllSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): HllSketchAgg =
    copy(child = c.head)
  override def prettyName: String = "hll_sketch"
}

/** hll_merge(sketch_col, p) → binary — unions already-built sketches
  * (elementwise register max), enabling rollups over stored sketches
  * without touching the raw keys again.
  */
case class HllMergeAgg(
    child: Expression,
    p: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends HllAggBase {

  require(p >= 4 && p <= 16, s"hll_merge precision $p outside [4,16]")

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = BinaryType

  override def update(buf: HllRegisters, input: InternalRow): HllRegisters = {
    val v = child.eval(input)
    if (v != null) {
      val bytes = v.asInstanceOf[Array[Byte]]
      // sketches of different precisions have incompatible bucket maps —
      // merging them would crash (larger into smaller) or silently emit
      // a structurally-valid garbage union (smaller into larger)
      require(bytes.nonEmpty && bytes(0).toInt == p,
        s"hll_merge(p=$p) got a sketch with precision ${if (bytes.isEmpty) "<empty>" else bytes(0)}; " +
          "rebuild one side or merge at the sketch's own precision")
      buf.merge(HllWire.fromBytes(bytes))
    }
    buf
  }

  override def eval(buf: HllRegisters): Any = HllWire.toBytes(buf)

  override def withNewMutableAggBufferOffset(offset: Int): HllMergeAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HllMergeAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): HllMergeAgg =
    copy(child = c.head)
  override def prettyName: String = "hll_merge"
}

/** hll_estimate(sketch) → double — scalar read of a binary sketch. */
case class HllEstimate(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    java.lang.Double.valueOf(HllWire.estimateBytes(input.asInstanceOf[Array[Byte]]))

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val cls = HllWire.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $cls$$.MODULE$$.estimateBytes($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): HllEstimate = copy(child = newChild)
  override def prettyName: String = "hll_estimate"
}
