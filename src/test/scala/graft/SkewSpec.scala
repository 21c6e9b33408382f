package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew
import graft.sources.Tables

class SkewSpec extends SparkSpecBase {

  test("salted join returns exactly the plain join's rows on a skewed key") {
    import spark.implicits._
    // skew: 90% of rows share key 1
    val large = (1 to 2000).map(i => (if (i % 10 == 0) i % 7 + 2 else 1L, i.toLong)).toDF("k", "row_id")
    val small = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (4L, "c")).toDF("k", "v")

    val plain = large.join(small, Seq("k")).select("k", "row_id", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    val salted = Skew.saltedJoin(large, small, "k", "row_id").select("k", "row_id", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    assert(salted.sameElements(plain))
  }

  test("salted join spreads a hot key across shuffle partitions") {
    val t = Tables(spark, sfDir)
    val li = t.lineitem
    val sup = t.supplier
    val result = Skew.saltedJoin(li, sup.withColumnRenamed("s_suppkey", "l_suppkey"),
      "l_suppkey", "l_orderkey", factor = 4)
    assert(result.count() == li.join(sup, li("l_suppkey") === sup("s_suppkey")).count())
    // the salt column must not leak into the output
    assert(!result.columns.contains("__salt"))
  }
}
