package graft

import org.apache.spark.sql.functions._

import graft.sources.{Tables, Warehouse}

class WarehouseSpec extends SparkSpecBase {

  test("co-bucketed tables join without any shuffle exchange") {
    val t = Tables(spark, sfDir)
    // clean any leftover catalog entries AND their on-disk locations from
    // a previous JVM (the in-memory catalog forgets, the dir persists)
    Seq("wh_orders", "wh_lineitem").foreach { name =>
      spark.sql(s"DROP TABLE IF EXISTS $name")
      val loc = new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:"), name)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    Warehouse.writeBucketed(t.orders, "wh_orders", "o_orderkey", 8)
    Warehouse.writeBucketed(
      t.lineitem.select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice")),
      "wh_lineitem", "l_orderkey", 8)

    val joined = Warehouse.table(spark, "wh_lineitem")
      .join(Warehouse.table(spark, "wh_orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"))

    val physical = joined.queryExecution.executedPlan.toString
    // the join itself must be exchange-free; only the final aggregation
    // may shuffle (different key)
    val joinPart = physical.split("HashAggregate").last
    assert(!joinPart.contains("Exchange hashpartitioning(l_orderkey") &&
      !joinPart.contains("Exchange hashpartitioning(o_orderkey"),
      s"bucketed join must not shuffle its inputs:\n$physical")

    // and results equal the plain-parquet join
    val expected = t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    val got = joined.collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(got == expected)
  }
}
