package graft.functions

import java.util.{TreeSet => JTreeSet}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** KMV (k-minimum-values, "bottom-k") distinct sketch — the fifth kernel
  * in graft's sketch family (HLL = cardinality, SpaceSaving = heavy
  * hitters, Bloom = membership, CMS = point frequency, KMV = cardinality
  * PLUS a mergeable uniform sample of the distinct keys). The state is
  * the k smallest distinct splitmix64 hashes in UNSIGNED order; merge is
  * set-union-then-trim — associative, commutative, order- and
  * partitioning-independent, so results are bit-deterministic and
  * exactly replayable by a SQL oracle (ORDER BY unsigned hash LIMIT k).
  *
  * Estimator: with h_k the k-th smallest of n distinct uniform hashes,
  * E[h_k / 2^64] ≈ k / (n + 1), so n̂ = (k − 1)·2^64 / h_k (the
  * standard unbiased KMV form, Bar-Yossef et al. 2002). Fewer than k
  * distinct hashes seen ⇒ the sketch holds ALL of them ⇒ exact count.
  * Relative error ~ 1/√(k−2): k = 256 ⇒ ~6%.
  *
  * Versus HLL (q22): 8·k bytes vs 2^p registers for similar error, but
  * the retained hashes are reusable — intersect two groups' sketches
  * and you get a Jaccard/overlap estimate (the join-size-estimation
  * use), which registers cannot give.
  */
object GraftKmv {
  /** Unsigned Long order. */
  val UnsignedOrder: java.util.Comparator[java.lang.Long] =
    (a: java.lang.Long, b: java.lang.Long) => java.lang.Long.compareUnsigned(a, b)

  /** The exact integer estimate both engines compute: if `nHeld` < k the
    * sketch is exhaustive (exact count); else (k−1)·2^64 / h_k in
    * arbitrary precision, clamped to Long.MaxValue.
    */
  def estimate(k: Int, nHeld: Int, hk: Long): Long =
    if (nHeld < k) nHeld.toLong
    else {
      val est = java.math.BigInteger.valueOf(k - 1L).shiftLeft(64)
        .divide(new java.math.BigInteger(java.lang.Long.toUnsignedString(hk)))
      if (est.bitLength() > 63) Long.MaxValue else est.longValueExact()
    }
}

final class KmvState(val k: Int) {
  val hashes = new JTreeSet[java.lang.Long](GraftKmv.UnsignedOrder)
  def add(h: Long): Unit = {
    if (hashes.size < k) { hashes.add(h); () }
    else if (java.lang.Long.compareUnsigned(h, hashes.last()) < 0) {
      if (hashes.add(h)) hashes.remove(hashes.last())
    }
  }
}

/** kmv_distinct(longCol, k) → BIGINT distinct estimate per group. */
case class KmvDistinctAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvState] {

  require(k >= 2 && k <= (1 << 16), s"k=$k outside [2, 65536]")

  // long keys only (the GraftBloom rule): any other input would hash
  // garbage bits and silently skew the estimate
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kmv_distinct needs BIGINT or INT input, got ${other.catalogString}")
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): KmvState = new KmvState(k)

  override def update(buf: KmvState, input: InternalRow): KmvState = {
    val v = child.eval(input)
    if (v != null) buf.add(GraftHash.splitmix64(v.asInstanceOf[Number].longValue()))
    buf
  }

  override def merge(buf: KmvState, other: KmvState): KmvState = {
    val it = other.hashes.iterator()
    while (it.hasNext) buf.add(it.next())
    buf
  }

  override def eval(buf: KmvState): Any =
    GraftKmv.estimate(k, buf.hashes.size,
      if (buf.hashes.isEmpty) 0L else buf.hashes.last())

  override def serialize(buf: KmvState): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + buf.hashes.size * 8)
    bb.putInt(k).putInt(buf.hashes.size)
    val it = buf.hashes.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvState = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val kk = bb.getInt
    val n = bb.getInt
    val s = new KmvState(kk)
    var i = 0
    while (i < n) { s.hashes.add(bb.getLong); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(offset: Int): KmvDistinctAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvDistinctAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KmvDistinctAgg =
    copy(child = c.head)
  override def prettyName: String = "kmv_distinct"
}

/** kmv_sketch(longCol, k) → binary sketch VALUE (the sorted bottom-k
  * hash set itself — store it, merge it, or intersect two of them with
  * [[KmvOverlap]]). Wire: int k, int n, n ascending-unsigned longs.
  */
case class KmvSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvState] {

  require(k >= 2 && k <= (1 << 16), s"k=$k outside [2, 65536]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kmv_sketch needs BIGINT or INT input, got ${other.catalogString}")
  }

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): KmvState = new KmvState(k)

  override def update(buf: KmvState, input: InternalRow): KmvState = {
    val v = child.eval(input)
    if (v != null) buf.add(GraftHash.splitmix64(v.asInstanceOf[Number].longValue()))
    buf
  }

  override def merge(buf: KmvState, other: KmvState): KmvState = {
    val it = other.hashes.iterator()
    while (it.hasNext) buf.add(it.next())
    buf
  }

  override def eval(buf: KmvState): Any = serialize(buf)

  override def serialize(buf: KmvState): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 + buf.hashes.size * 8)
    bb.putInt(k).putInt(buf.hashes.size)
    val it = buf.hashes.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvState = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val kk = bb.getInt
    val n = bb.getInt
    val s = new KmvState(kk)
    var i = 0
    while (i < n) { s.hashes.add(bb.getLong); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(offset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KmvSketchAgg =
    copy(child = c.head)
  override def prettyName: String = "kmv_sketch"
}

/** kmv_overlap(sketchA, sketchB) → STRUCT(inter_k INT, est_union BIGINT,
  * est_shared DOUBLE): the KMV set-intersection estimator (Beyer et al.
  * 2007). U = bottom-k of A∪B (computable exactly from the two sketches:
  * every member of bottom-k(A∪B) is in bottom-k(A) ∪ bottom-k(B));
  * ρ = |U ∩ SA ∩ SB| / |U|; |A∩B|̂ = ρ · n̂(A∪B). All inputs to the one
  * double expression are exact integers (inter·est ≪ 2^53), so the
  * result is IEEE-identical cross-engine with the fixed op order
  * (inter · est_union) / held. Interpreted eval only —
  * this runs on group-count-sized rows (pairs of groups), never per
  * input row.
  */
case class KmvOverlap(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"kmv_overlap needs two BINARY kmv_sketch values, got $other")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("inter_k", IntegerType, nullable = false),
    StructField("est_union", LongType, nullable = false),
    StructField("est_shared", DoubleType, nullable = false)))
  override def nullable: Boolean = left.nullable || right.nullable

  private def decode(bytes: Array[Byte]): (Int, Array[Long]) = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val kk = bb.getInt
    val n = bb.getInt
    val a = new Array[Long](n)
    var i = 0
    while (i < n) { a(i) = bb.getLong; i += 1 }
    (kk, a)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (ka, sa) = decode(a.asInstanceOf[Array[Byte]])
    val (kb, sb) = decode(b.asInstanceOf[Array[Byte]])
    require(ka == kb, s"kmv_overlap: sketches built with different k ($ka vs $kb)")
    val k = ka
    // merge-walk the two ascending-unsigned arrays: bottom-k of the
    // union, counting members present in BOTH
    var i = 0; var j = 0; var held = 0; var inter = 0; var hk = 0L
    while (held < k && (i < sa.length || j < sb.length)) {
      val cmp =
        if (i >= sa.length) 1
        else if (j >= sb.length) -1
        else java.lang.Long.compareUnsigned(sa(i), sb(j))
      val h = if (cmp <= 0) sa(i) else sb(j)
      if (cmp <= 0) i += 1
      if (cmp >= 0) j += 1
      if (cmp == 0) inter += 1
      held += 1
      hk = h
    }
    val estUnion = GraftKmv.estimate(k, held, hk)
    // raw quotient of exact-integer-valued doubles (inter·est ≪ 2^53) —
    // callers round for presentation (q30 rounds to 4, like every other
    // float-emitting query), keeping the round convention in one place
    val estShared =
      if (held == 0) 0.0
      else (inter.toDouble * estUnion.toDouble) / held
    org.apache.spark.sql.catalyst.InternalRow(inter, estUnion, estShared)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): KmvOverlap =
    copy(left = l, right = r)
  override def prettyName: String = "kmv_overlap"
}
