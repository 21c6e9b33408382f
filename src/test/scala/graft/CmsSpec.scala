package graft

import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{CmsCounters, CmsWire, GraftHash}
import graft.functions.GraftFunctions._
import graft.operators.TextAnalysis
import graft.sources.Tables

/** t15 Count-Min sketch: exactness without collisions, the ≥-truth
  * guarantee, partition-order invariance of the counter plane, and the
  * probe query's shape on the real corpus.
  */
class CmsSpec extends SparkSpecBase {

  test("cms is exact on a small key set and never undercounts") {
    import spark.implicits._
    val occs = Seq.fill(5)("x") ++ Seq.fill(3)("y") ++ Seq("z")
    val sk = occs.toDF("tok")
      .agg(cms_sketch(org.apache.spark.sql.functions.col("tok"), 4, 512))
      .collect()(0).getAs[Array[Byte]](0)
    assert(sk.length == 2 + 8 * 4 * 512)
    val exact = Map("x" -> 5L, "y" -> 3L, "z" -> 1L)
    exact.foreach { case (k, n) =>
      val est = CmsWire.estimateString(sk, UTF8String.fromString(k))
      assert(est >= n, s"undercount for $k")
      assert(est == n, s"3 keys in 4×512 counters should not collide: $k est $est")
    }
    // an absent key estimates ≥ 0 (0 unless it collides with everything)
    assert(CmsWire.estimateString(sk, UTF8String.fromString("absent")) >= 0L)
  }

  test("the counter plane is partition-order invariant (merge = elementwise sum)") {
    import spark.implicits._
    val toks = (1 to 500).map(i => s"tok${i % 37}")
    def bytesWith(parts: Int): Array[Byte] =
      toks.toDF("tok").repartition(parts)
        .agg(cms_sketch(org.apache.spark.sql.functions.col("tok"), 4, 256))
        .collect()(0).getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(bytesWith(1), bytesWith(7)))
  }

  test("driver-side plane equals the aggregate's bytes") {
    import spark.implicits._
    val toks = Seq("a", "b", "a", "c", "a", "b")
    val plane = new CmsCounters(4, 256)
    toks.foreach(t => plane.addBase(GraftHash.fnv64(UTF8String.fromString(t))))
    val viaAgg = toks.toDF("tok")
      .agg(cms_sketch(org.apache.spark.sql.functions.col("tok"), 4, 256))
      .collect()(0).getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(CmsWire.toBytes(plane), viaAgg))
  }

  test("t15 on the real corpus: 10 probe rows, est ≥ exact, stopwords mostly present") {
    val rows = TextAnalysis.cmsTokenFreq(Tables(spark, sfDir)).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val (est, exact) = (r.getLong(1), r.getLong(2))
      assert(est >= exact, s"${r.getString(0)}: CMS undercounted $est < $exact")
    }
    // nine real corpus words present; the deliberate absent probe is not
    assert(rows.count(_.getLong(2) > 0) >= 9)
    assert(rows.find(_.getString(0) == "neverseenword").get.getLong(2) == 0L)
  }
}
