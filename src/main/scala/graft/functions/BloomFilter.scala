package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Deterministic Bloom filter over 64-bit keys — the membership sketch
  * completing graft's sketch family (HLL = cardinality, SpaceSaving =
  * heavy hitters, histogram = quantiles, Bloom = membership). Fixed
  * `nbits` bit array, `k` probes by double hashing (Kirsch–Mitzenmacher:
  * pos_i = h1 + i·h2, both from splitmix64), merge = bitwise OR —
  * associative, commutative, layout-independent, so it partial-aggregates
  * like every other graft sketch. No false negatives EVER (the property
  * the prefilter use-case depends on); false-positive rate is the
  * standard (1 - e^(-kn/m))^k.
  */
object GraftBloom {
  /** Second hash stream offset (any odd constant decorrelates). */
  private val H2Salt = 0x9e3779b97f4a7c15L

  def probe(words: Array[Long], nbits: Int, k: Int, key: Long): Boolean = {
    val h1 = GraftHash.splitmix64(key)
    val h2 = GraftHash.splitmix64(key ^ H2Salt) | 1L
    var i = 0
    while (i < k) {
      val pos = ((h1 + i * h2) & Long.MaxValue) % nbits
      if ((words((pos / 64).toInt) & (1L << (pos % 64))) == 0L) return false
      i += 1
    }
    true
  }

  def set(words: Array[Long], nbits: Int, k: Int, key: Long): Unit = {
    val h1 = GraftHash.splitmix64(key)
    val h2 = GraftHash.splitmix64(key ^ H2Salt) | 1L
    var i = 0
    while (i < k) {
      val pos = ((h1 + i * h2) & Long.MaxValue) % nbits
      words((pos / 64).toInt) |= (1L << (pos % 64))
      i += 1
    }
  }

  /** Count of array elements the filter (possibly) contains — the
    * map-side prefilter kernel (no false negatives: every true member
    * counts; false positives only ever INCREASE the count, so a
    * `hits >= threshold` gate never drops a true match). Takes the
    * DECODED word array: the caller decodes the wire bytes ONCE per
    * task, not per row (a per-row fromBytes would copy the whole filter
    * for every document — more work than the k probes themselves).
    */
  def hits(values: ArrayData, words: Array[Long], nbits: Int, k: Int): Int = {
    var n = 0
    var i = 0
    val m = values.numElements()
    while (i < m) {
      if (probe(words, nbits, k, values.getLong(i))) n += 1
      i += 1
    }
    n
  }

  /** Wire format: 4-byte nbits, 1-byte k, packed words. */
  def toBytes(nbits: Int, k: Int, words: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(5 + words.length * 8)
    bb.putInt(nbits).put(k.toByte)
    words.foreach(bb.putLong)
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): (Int, Int, Array[Long]) = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val nbits = bb.getInt
    val k = bb.get.toInt
    val words = new Array[Long](nbits / 64)
    var i = 0
    while (i < words.length) { words(i) = bb.getLong; i += 1 }
    (nbits, k, words)
  }
}

/** Mutable aggregation state. */
final class BloomState(val nbits: Int, val k: Int) {
  val words = new Array[Long](nbits / 64)
  def or(other: BloomState): Unit = {
    var i = 0
    while (i < words.length) { words(i) |= other.words(i); i += 1 }
  }
}

/** bloom_build(longCol, nbits, k) → binary filter value. Input rows may
  * be single longs or array<long> (each element added).
  */
case class BloomBuildAgg(
    child: Expression,
    nbits: Int,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BloomState] {

  require(nbits >= 64 && nbits % 64 == 0, s"nbits=$nbits must be a positive multiple of 64")
  require(k >= 1 && k <= 16, s"k=$k probes outside [1,16]")

  // long keys only: ArrayData.getLong over any other element width reads
  // garbage bits, silently breaking the no-false-negatives contract —
  // reject at analysis time instead
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType | ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_build needs BIGINT, INT or ARRAY<BIGINT> input, got ${other.catalogString}")
    }

  @transient private lazy val isArray = child.dataType.isInstanceOf[ArrayType]

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): BloomState = new BloomState(nbits, k)

  override def update(buf: BloomState, input: InternalRow): BloomState = {
    val v = child.eval(input)
    if (v != null) {
      if (isArray) {
        val arr = v.asInstanceOf[ArrayData]
        var i = 0
        while (i < arr.numElements()) {
          GraftBloom.set(buf.words, nbits, k, arr.getLong(i)); i += 1
        }
      } else GraftBloom.set(buf.words, nbits, k, v.asInstanceOf[Number].longValue())
    }
    buf
  }

  override def merge(buf: BloomState, other: BloomState): BloomState = { buf.or(other); buf }

  override def eval(buf: BloomState): Any = GraftBloom.toBytes(nbits, k, buf.words)

  override def serialize(buf: BloomState): Array[Byte] = GraftBloom.toBytes(nbits, k, buf.words)

  override def deserialize(bytes: Array[Byte]): BloomState = {
    val (nb, kk, words) = GraftBloom.fromBytes(bytes)
    val s = new BloomState(nb, kk)
    System.arraycopy(words, 0, s.words, 0, words.length)
    s
  }

  override def withNewMutableAggBufferOffset(offset: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BloomBuildAgg =
    copy(child = c.head)
  override def prettyName: String = "bloom_build"
}

/** bloom_hits(array<long>, filterBytes) → int count of (possible)
  * members. The DECODED filter ships once per task as a reference
  * object — fixed size regardless of the set it summarizes (vs
  * LongSetHits' literal array, which grows with the set).
  */
case class BloomHits(child: Expression, filter: Seq[Byte]) extends UnaryExpression {
  // filter is a Seq, not Array: case-class equality stays STRUCTURAL, so
  // plans built from equal filters compare equal (sameResult / plan
  // cache / ReuseExchange; same rule as LongSetHits). Decoded ONCE here,
  // not per row.

  // wire-header validation at construction: a truncated or foreign blob
  // would otherwise decode into a garbage bit array and probe nonsense —
  // voiding the no-false-negatives contract with no error anywhere
  locally {
    require(filter.length >= 5,
      s"bloom_hits: filter blob is ${filter.length} bytes, shorter than the 5-byte header")
    val bb = java.nio.ByteBuffer.wrap(filter.toArray, 0, 5)
    val nbits = bb.getInt
    val k = bb.get.toInt
    require(nbits >= 64 && nbits % 64 == 0,
      s"bloom_hits: decoded nbits=$nbits is not a positive multiple of 64 — not a bloom_build blob")
    require(k >= 1 && k <= 16, s"bloom_hits: decoded k=$k probes outside [1,16]")
    require(filter.length == 5 + nbits / 8,
      s"bloom_hits: blob is ${filter.length} bytes but nbits=$nbits implies ${5 + nbits / 8}")
  }

  // ARRAY<BIGINT> only: getLong over any other element width reads
  // garbage bits, silently voiding the no-false-negatives contract the
  // build-side check protects — mirror BloomBuildAgg and reject at
  // analysis time
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_hits needs ARRAY<BIGINT> input, got ${other.catalogString}")
    }

  @transient private lazy val decoded: (Int, Int, Array[Long]) =
    GraftBloom.fromBytes(filter.toArray)

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any = {
    val (nbits, k, words) = decoded
    java.lang.Integer.valueOf(GraftBloom.hits(input.asInstanceOf[ArrayData], words, nbits, k))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = GraftBloom.getClass.getName.stripSuffix("$")
    val (nbits, k, words) = decoded
    val ref = ctx.addReferenceObj("bloomWords", words, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $cls$$.MODULE$$.hits($c, (long[]) $ref, $nbits, $k);")
  }
  override protected def withNewChildInternal(newChild: Expression): BloomHits = copy(child = newChild)
  override def prettyName: String = "bloom_hits"
}
