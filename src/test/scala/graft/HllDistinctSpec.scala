package graft

import org.apache.spark.sql.functions._

import graft.functions.{GraftFunctions, GraftHash, HllDistinct, HllRegisters}

class HllDistinctSpec extends SparkSpecBase {

  private def exactAndEstimate(p: Int, n: Int): (Long, Double) = {
    import spark.implicits._
    val df = (1 to n).map(i => (i.toLong % (n / 2), i.toLong)).toDF("grp_ignore", "key")
      .repartition(8)
    val est = df.agg(GraftFunctions.hll_distinct(col("key"), p).as("e"))
      .collect()(0).getDouble(0)
    (df.select(col("key")).distinct().count(), est)
  }

  test("estimate tracks the true distinct count within HLL's expected error") {
    // stderr ≈ 1.04/sqrt(m); allow 4 sigma
    for (p <- Seq(6, 10)) {
      val m = 1 << p
      val (exact, est) = exactAndEstimate(p, 20000)
      val rel = math.abs(est - exact) / exact
      assert(rel < 4 * 1.04 / math.sqrt(m.toDouble),
        s"p=$p exact=$exact est=$est rel=$rel")
    }
  }

  test("sketch is merge-invariant: partition layout cannot change the estimate") {
    import spark.implicits._
    val keys = (1 to 5000).map(_.toLong * 7919)
    val onePart = keys.toDF("key").repartition(1)
      .agg(GraftFunctions.hll_distinct(col("key"), 8)).collect()(0).getDouble(0)
    val manyParts = keys.toDF("key").repartition(32)
      .agg(GraftFunctions.hll_distinct(col("key"), 8)).collect()(0).getDouble(0)
    assert(onePart == manyParts, "elementwise-max merge must be order/layout independent")
  }

  test("register merge is elementwise max and estimate matches a direct build") {
    val a = new HllRegisters(6)
    val b = new HllRegisters(6)
    val whole = new HllRegisters(6)
    (1 to 1000).foreach { i =>
      val h = GraftHash.splitmix64(i.toLong)
      (if (i % 2 == 0) a else b).addHash(h)
      whole.addHash(h)
    }
    a.merge(b)
    assert(a.regs.sameElements(whole.regs))
    assert(a.estimate == whole.estimate)
  }

  test("string inputs hash deterministically and count plausibly") {
    import spark.implicits._
    val est = (1 to 3000).map(i => s"token_$i").toDF("s").repartition(8)
      .agg(GraftFunctions.hll_distinct(col("s"), 8)).collect()(0).getDouble(0)
    assert(math.abs(est - 3000) / 3000.0 < 4 * 1.04 / 16.0, s"est=$est")
  }

  test("sketch algebra: merging stored sketches equals building from rows") {
    import spark.implicits._
    val df = (1 to 8000).map(i => (s"g${i % 4}", i.toLong % 1500)).toDF("g", "key")
      .repartition(8).localCheckpoint(true)
    // finest grain -> binary sketch values
    val base = df.groupBy(col("g"))
      .agg(GraftFunctions.hll_sketch(col("key"), 8).as("sk"))
    // merge-up across all groups
    val merged = base.agg(GraftFunctions.hll_merge(col("sk"), 8).as("sk"))
      .select(GraftFunctions.hll_estimate(col("sk")))
      .collect()(0).getDouble(0)
    // direct build over the same rows
    val direct = df.agg(GraftFunctions.hll_distinct(col("key"), 8))
      .collect()(0).getDouble(0)
    assert(merged == direct, s"merge-up $merged must equal direct build $direct exactly")
    // per-group estimate from the binary value matches hll_distinct per group
    val viaSketch = base.select(col("g"), GraftFunctions.hll_estimate(col("sk")).as("e"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val viaAgg = df.groupBy(col("g")).agg(GraftFunctions.hll_distinct(col("key"), 8).as("e"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(viaSketch == viaAgg)
  }

  test("SQL surface: registered functions match the Column API, honor the precision arg") {
    import spark.implicits._
    (1L to 500L).toDF("k").createOrReplaceTempView("hll_sql_in")
    val viaSql = spark.sql("SELECT graft_hll_distinct(k, 8) AS e FROM hll_sql_in")
      .collect()(0).getDouble(0)
    val viaApi = (1L to 500L).toDF("k")
      .agg(GraftFunctions.hll_distinct(col("k"), 8)).collect()(0).getDouble(0)
    assert(viaSql == viaApi, "SQL and Column registration share one builder")
    val viaDefault = spark.sql("SELECT graft_hll_distinct(k) AS e FROM hll_sql_in")
      .collect()(0).getDouble(0)
    assert(viaDefault != viaSql, "p=8 vs default p=6 must differ on 500 keys")
    val rep = spark.sql(
      "SELECT graft_repetition_stats(array('a','b','a'), 2).distinct_tokens AS d")
      .collect()(0).getInt(0)
    assert(rep == 2)
  }

  test("estimator constants: numerator literal round-trips and rank caps at K") {
    assert(HllDistinct.numerator(6) == 0.709 * 4096.0 * math.pow(2.0, 59.0))
    assert(HllDistinct.rank(0L, 6) == HllDistinct.maxRank(6))
    assert(HllDistinct.rank(1L << 57, 6) == 1) // top usable bit set
  }
}
