package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitters state: at most `capacity` counters; evicting
  * the min counter transfers its count as the newcomer's error bound.
  * Counts are overestimates by at most `error`; with capacity ≫ k the
  * top-k by estimated count matches the exact top-k on skewed data.
  */
final class SpaceSavingSketch(val capacity: Int) {
  val counts = mutable.HashMap.empty[String, (Long, Long)] // token -> (count, error)

  def add(token: String, inc: Long = 1L): Unit = {
    counts.get(token) match {
      case Some((c, e)) => counts.update(token, (c + inc, e))
      case None if counts.size < capacity => counts.update(token, (inc, 0L))
      case None =>
        val (minTok, (minC, _)) = counts.minBy { case (t, (c, _)) => (c, t) }
        counts.remove(minTok)
        counts.update(token, (minC + inc, minC))
    }
  }

  /** Min count of a FULL sketch — the upper bound on any evicted token's
    * true count; 0 while under capacity (nothing was ever evicted).
    */
  private def evictionBound: Long =
    if (counts.size < capacity) 0L else counts.valuesIterator.map(_._1).min

  /** Standard mergeable-SpaceSaving combine (Agarwal et al.): a token
    * absent from one side may have been evicted there with count up to
    * that side's min counter, so the absent side contributes its
    * eviction bound to both count and error — keeping every retained
    * count an overestimate. The post-merge truncation to capacity drops
    * only the smallest merged counters (the same guarantee as eviction).
    */
  def merge(other: SpaceSavingSketch): Unit = {
    val mSelf = evictionBound
    val mOther = other.evictionBound
    val keys = counts.keySet ++ other.counts.keySet
    val merged = keys.iterator.map { t =>
      val (c1, e1) = counts.getOrElse(t, (mSelf, mSelf))
      val (c2, e2) = other.counts.getOrElse(t, (mOther, mOther))
      t -> (c1 + c2, e1 + e2)
    }.toSeq
    counts.clear()
    merged.sortBy { case (t, (c, _)) => (-c, t) }.take(capacity)
      .foreach { case (t, ce) => counts.update(t, ce) }
  }

  def topK(k: Int): Seq[(String, Long)] =
    counts.toSeq.map { case (t, (c, _)) => (t, c) }.sortBy { case (t, c) => (-c, t) }.take(k)
}

/** approx_top_k(tokens array<string>) → array<struct<token,cnt>> — a
  * `TypedImperativeAggregate` (the Catalyst form for sketch buffers).
  * One pass, fixed memory per partial, mergeable — the 100 TB shape for
  * vocabulary / heavy-hitter statistics where an exact explode+groupBy
  * would shuffle billions of (token, 1) rows.
  */
case class ApproxTopKTokens(
    child: Expression,
    k: Int,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("token", StringType), StructField("cnt", LongType))), containsNull = false)

  override def createAggregationBuffer(): SpaceSavingSketch = new SpaceSavingSketch(capacity)

  override def update(buf: SpaceSavingSketch, input: InternalRow): SpaceSavingSketch = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      while (i < arr.numElements()) {
        if (!arr.isNullAt(i)) {
          val s = arr.getUTF8String(i).toString
          if (s.nonEmpty) buf.add(s)
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: SpaceSavingSketch, other: SpaceSavingSketch): SpaceSavingSketch = {
    buf.merge(other); buf
  }

  override def eval(buf: SpaceSavingSketch): Any = {
    val rows = buf.topK(k).map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c)
    }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: SpaceSavingSketch): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.capacity)
    out.writeInt(buf.counts.size)
    buf.counts.foreach { case (t, (c, e)) =>
      val bytes = t.getBytes("UTF-8")
      out.writeInt(bytes.length); out.write(bytes); out.writeLong(c); out.writeLong(e)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingSketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val sketch = new SpaceSavingSketch(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val arr = new Array[Byte](len)
      in.readFully(arr)
      sketch.counts.update(new String(arr, "UTF-8"), (in.readLong(), in.readLong()))
      i += 1
    }
    sketch
  }

  override def withNewMutableAggBufferOffset(offset: Int): ApproxTopKTokens =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ApproxTopKTokens =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): ApproxTopKTokens =
    copy(child = c.head)
  override def prettyName: String = "approx_top_k_tokens"
}
