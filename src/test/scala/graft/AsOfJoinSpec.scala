package graft

import java.sql.Timestamp

import graft.plans.AsOfJoinPlans

class AsOfJoinSpec extends SparkSpecBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of join picks the latest right row at-or-before each left time") {
    import spark.implicits._
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 11:00:00"), 110.0),
      (1L, ts("2024-01-01 12:00:00"), 120.0),
      (2L, ts("2024-01-01 10:30:00"), 55.0)).toDF("key", "t", "px")
    val trades = Seq(
      (1L, ts("2024-01-01 10:30:00")),
      (1L, ts("2024-01-01 11:00:00")),
      (1L, ts("2024-01-01 09:00:00")),
      (2L, ts("2024-01-01 23:00:00")),
      (3L, ts("2024-01-01 10:00:00"))).toDF("key", "t")

    val out = AsOfJoinPlans.asofJoin(trades, quotes, Seq("key"), "t")
      .select("key", "t", "r_px").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, if (r.isNullAt(2)) null else r.getDouble(2)))
      .sortBy(x => (x._1, x._2))

    assert(out.toSeq == Seq(
      (1L, "2024-01-01 09:00:00.0", null),        // before any quote
      (1L, "2024-01-01 10:30:00.0", 100.0),       // 10:00 quote
      (1L, "2024-01-01 11:00:00.0", 110.0),       // exact match, non-strict
      (2L, "2024-01-01 23:00:00.0", 55.0),
      (3L, "2024-01-01 10:00:00.0", null)))       // key with no right rows
  }

  test("strict mode excludes equal timestamps") {
    import spark.implicits._
    val right = Seq((1L, 10L, "a"), (1L, 20L, "b")).toDF("key", "t", "v")
    val left = Seq((1L, 10L), (1L, 20L), (1L, 25L)).toDF("key", "t")
    val out = AsOfJoinPlans.asofJoin(left, right, Seq("key"), "t", strict = true)
      .select("t", "r_v").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getString(1))).sortBy(_._1)
    assert(out.toSeq == Seq((10L, null), (20L, "a"), (25L, "b")))
  }

  test("null keys and null times never match") {
    import spark.implicits._
    val right = Seq((Some(1L), Some(10L), "a")).toDF("key", "t", "v")
    val left = Seq(
      (Option.empty[Long], Some(20L)),
      (Some(1L), Option.empty[Long]),
      (Some(1L), Some(20L))).toDF("key", "t")
    val out = AsOfJoinPlans.asofJoin(left, right, Seq("key"), "t")
      .select("r_v").collect().map(r => if (r.isNullAt(0)) null else r.getString(0))
    assert(out.count(_ == "a") == 1)
    assert(out.count(_ == null) == 2)
  }

  test("key filters push through the as-of join to both scans") {
    val t = graft.sources.Tables(spark, sfDir)
    val joined = graft.operators.Relational.q15AsofJoin(t)
      .filter(org.apache.spark.sql.functions.col("o_custkey") === 7)
    val rows = joined.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("o_custkey") == 7))
    // the optimized plan must contain a filter on BOTH children of the
    // as-of join (pushed below it), i.e. the join no longer sees a
    // parent Filter on the key
    val optimized = joined.queryExecution.optimizedPlan
    val asofNodes = optimized.collect { case j: graft.plans.AsOfJoinPlans.AsOfJoin => j }
    assert(asofNodes.nonEmpty, optimized.toString)
    val j = asofNodes.head
    def hasKeyFilter(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean =
      p.collect { case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f }
        .exists(_.condition.references.exists(a => a.name == "o_custkey" || a.name == "prev_o_custkey"))
    assert(hasKeyFilter(j.left), "left side must receive the key predicate")
    assert(hasKeyFilter(j.right), "right side must receive the key predicate")
  }

  test("extensions class wires strategy and rule into a fresh session") {
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    try {
      import s2.implicits._
      val l = Seq((1L, 5L)).toDF("k", "t")
      val r = Seq((1L, 3L, "x")).toDF("k", "t", "v")
      val out = AsOfJoinPlans.asofJoin(l, r, Seq("k"), "t").collect()
      assert(out.length == 1 && out.head.getAs[String]("r_v") == "x")
    } finally {
      // leave the shared session intact for other suites; s2 is the same
      // underlying context in local mode, so only clear the newSession state
    }
  }

  test("physical plan gets exchanges and sorts from EnsureRequirements") {
    import spark.implicits._
    val a = Seq((1L, 1L)).toDF("key", "t")
    val b = Seq((1L, 1L, "x")).toDF("key", "t", "v")
    val plan = AsOfJoinPlans.asofJoin(a, b, Seq("key"), "t")
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoinExec") || plan.contains("AsOfJoin"), plan)
    assert(plan.contains("Sort"), "children must be sorted")
    assert(plan.contains("Exchange") || plan.contains("ShuffleQueryStage"), "children must be clustered")
  }
}
