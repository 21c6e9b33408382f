package graft

import org.apache.spark.sql.functions._

/** Guards the session against Spark 4.x's `unionOutputPartitioning`
  * optimization, which this library must run WITHOUT: with it on, a
  * keyed aggregate over a COLUMNAR union of same-bucketed scans skips
  * its exchange while the partitions merely concatenate — per-child
  * partials surface as final rows (reproduced on 4.1.2). Every
  * segmented-store fold and probe unions co-bucketed generation
  * tables, so this is load-bearing for the whole store family
  * (GraftSession pins the conf false; this spec fails if that pin is
  * ever lost or the session stops applying it).
  */
class UnionPartitioningSpec extends SparkSpecBase {
  import spark.implicits._

  test("keyed aggregation over a columnar union of co-bucketed tables collapses across children") {
    assert(spark.conf.get("spark.sql.unionOutputPartitioning") == "false",
      "GraftSession must pin spark.sql.unionOutputPartitioning=false " +
        "(columnar zip-union miscompilation — see GraftSession)")
    graft.sources.Warehouse.drop(spark, "up_a")
    graft.sources.Warehouse.drop(spark, "up_b")
    graft.sources.Warehouse.writeBucketed(
      Seq((1L, 1L), (2L, 1L)).toDF("h", "df"), "up_a", "h", 4)
    graft.sources.Warehouse.writeBucketed(
      Seq((1L, 2L), (3L, 1L)).toDF("h", "df"), "up_b", "h", 4)
    // the exact miscompiling shape: projected (columnar) scans, no
    // per-child row operator, groupBy on the shared bucket key
    val folded = Seq("up_a", "up_b")
      .map(n => spark.table(n).select(col("h"), col("df")))
      .reduce(_ unionAll _)
      .groupBy(col("h")).agg(sum(col("df")).as("df"))
    val got = folded.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 3L), (2L, 1L), (3L, 1L)),
      s"union+groupBy must collapse across children, got $got")
    Seq("up_a", "up_b").foreach(graft.sources.Warehouse.drop(spark, _))
  }
}
