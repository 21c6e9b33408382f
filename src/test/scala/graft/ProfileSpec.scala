package graft

import org.apache.spark.sql.Row

import graft.operators.Profile
import graft.sources.Tables

/** q27 column profiling: hand-computed metrics on a crafted frame with
  * nulls, and the scale contract — the exact path pays one Expand for
  * COUNT(DISTINCT), the HLL path must not.
  */
class ProfileSpec extends SparkSpecBase {

  test("q27 metrics match hand-computed values on a crafted frame with nulls") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)](
      (1L, "b"), (3L, null), (3L, "a"), (null, "b"), (7L, "c"))
      .toDF("k", "s")
    val rows = Profile.profile(df).collect().map(r => r.getString(0) -> r).toMap
    val k = rows("k")
    assert(k.getLong(1) == 5L)         // n_rows
    assert(k.getLong(2) == 1L)         // n_nulls
    assert(k.getLong(3) == 3L)         // n_distinct (1, 3, 7)
    assert(k.getDouble(4) == 1.0 && k.getDouble(5) == 7.0)
    assert(k.isNullAt(6) && k.isNullAt(7))
    val s = rows("s")
    assert(s.getLong(2) == 1L && s.getLong(3) == 3L)
    assert(s.isNullAt(4) && s.isNullAt(5))
    assert(s.getString(6) == "a" && s.getString(7) == "c")
  }

  test("q27 on lineitem: no Expand in either path, sketch estimates sanely") {
    val t = Tables(spark, sfDir)
    val exact = Profile.lineitemProfile(t)
    val sketch = Profile.profile(t.lineitem, exactDistinct = false)
    // per-column single-distinct aggs plan without the multi-distinct
    // Expand (the shape that made the one-wide-agg form 13.7× slower)
    assert(!exact.queryExecution.executedPlan.toString.contains("Expand"))
    assert(!sketch.queryExecution.executedPlan.toString.contains("Expand"))
    assert(exact.queryExecution.executedPlan.toString.contains("count(distinct"))
    assert(!sketch.queryExecution.executedPlan.toString.contains("count(distinct"),
      "the HLL profile path must not pay any distinct aggregation")
    assert(exact.columns.toSeq == sketch.columns.toSeq)
    val ex = exact.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val sk = sketch.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    // HLL at p=6 is a coarse estimate; just pin the order of magnitude
    ex.foreach { case (c, n) =>
      val est = sk(c)
      assert(est > 0 && est < 8 * (n + 1), s"column $c: exact $n vs sketch $est")
    }
    // timestamps profile as exact epoch-micros doubles
    val ship = exact.collect().find(_.getString(0) == "l_shipdate").get
    assert(ship.getDouble(4) > 0 && ship.getDouble(5) >= ship.getDouble(4))
  }
}
