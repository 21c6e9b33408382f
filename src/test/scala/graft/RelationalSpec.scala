package graft

import org.apache.spark.sql.functions._

import graft.functions.RaceTimeMillis
import graft.operators.Relational
import graft.sources.Tables

class RelationalSpec extends SparkSpecBase {
  private lazy val t = Tables(spark, sfDir)

  test("SparkEntry.entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
    // every query key has either an oracle or is a documented rows-only op
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("q1 aggregates the full flag/status matrix") {
    val rows = Relational.q1Agg(t).collect()
    assert(rows.nonEmpty && rows.length <= 6)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    assert(total > 0 && total <= 6000)
  }

  test("q2 revenue per nation covers joined dims only") {
    val df = Relational.q2LookupJoin(t)
    val rows = df.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Double]("revenue") > 0))
  }

  test("q3 keeps at most 3 rows per group, ranked") {
    val rows = Relational.q3TopkPerGroup(t).collect()
    val byGroup = rows.groupBy(_.getAs[String]("o_orderpriority"))
    assert(byGroup.values.forall(_.length <= 3))
    byGroup.values.foreach { g =>
      val prices = g.sortBy(_.getAs[Int]("rn")).map(_.getAs[Double]("o_totalprice"))
      assert(prices.sameElements(prices.sortBy(-(_: Double))))
    }
  }

  test("q4 upsert leaves one row per business key, the latest") {
    val df = Relational.q4Upsert(t)
    val n = df.count()
    val nKeys = t.events.select(col("user_id"), col("event_type")).distinct().count()
    assert(n == nKeys)
  }

  test("q5 anti-insert excludes every customer having a recent order") {
    val result = Relational.q5AntiInsert(t)
    val recentCusts = t.orders
      .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
      .select(col("o_custkey")).distinct()
    assert(result.join(recentCusts, col("c_custkey") === col("o_custkey")).count() == 0)
  }

  test("q6 standings positions are a 1..n permutation") {
    val pos = Relational.q6Standings(t).collect().map(_.getAs[Int]("position")).sorted
    assert(pos.sameElements(1 to pos.length))
  }

  test("q7 running total tops out at the customer's full spend") {
    val maxRunning = Relational.q7RunningTotal(t)
      .groupBy(col("o_custkey")).agg(max(col("running_total")).as("m"))
    val fullSpend = t.orders.groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("s"))
    val joined = maxRunning.join(fullSpend, Seq("o_custkey")).collect()
    assert(joined.nonEmpty)
    joined.foreach(r => assert(math.abs(r.getAs[Double]("m") - r.getAs[Double]("s")) < 1e-6))
  }

  test("q8 time parse matches the reference formula") {
    val rows = Relational.q8TimeParse(t).limit(100).collect()
    rows.foreach { r =>
      val s = r.getAs[String]("time_str")
      val Array(m, sec) = s.split(":")
      val expected = ((m.toLong * 60 + sec.toDouble) * 1000).toLong
      assert(r.getAs[Long]("time_ms") == expected, s"for $s")
    }
  }

  test("RaceTimeMillis handles malformed input as null (reference semantics)") {
    assert(RaceTimeMillis.parse("1:30.500") == 90500L)
    assert(RaceTimeMillis.parse("0:05.001") == 5001L)
    assert(RaceTimeMillis.parse("") == Long.MinValue)
    assert(RaceTimeMillis.parse("abc") == Long.MinValue)
    assert(RaceTimeMillis.parse("1:xx") == Long.MinValue)
    assert(RaceTimeMillis.parse(":30") == Long.MinValue)
    // expression-level null propagation
    import spark.implicits._
    val df = Seq("2:01.250", "nope", null).toDF("s")
      .select(graft.functions.GraftFunctions.race_time_ms(col("s")).as("ms"))
    val got = df.collect().map(r => if (r.isNullAt(0)) null else r.getLong(0))
    assert(got.sameElements(Array[Any](121250L, null, null)))
  }

  test("q9 incremental only returns users known before the watermark") {
    val wm = lit("2024-01-15 00:00:00").cast("timestamp")
    val known = t.events.filter(col("ts") <= wm).select(col("user_id")).distinct()
    val result = Relational.q9Incremental(t)
    assert(result.join(known, Seq("user_id"), "left_anti").count() == 0)
  }

  test("q10 sanitize clamps to [5, 20]") {
    val rows = Relational.q10Sanitize(t).collect()
    assert(rows.forall { r =>
      val v = r.getAs[Int]("size_clamped"); v >= 5 && v <= 20
    })
  }

  test("q11 shares sum to ~1") {
    val shares = Relational.q11SyncStats(t).collect().map(_.getAs[Double]("share"))
    assert(math.abs(shares.sum - 1.0) < 1e-4)
  }

  test("q12 pivot counts per user sum to the user's event count") {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val rows = Relational.q12Pivot(t, types).collect()
    val totalPivot = rows.map(r => types.map(c => r.getAs[Long](c)).sum).sum
    assert(totalPivot == t.events.count())
  }

  test("q13 returns top-10 by revenue, descending") {
    val revs = Relational.q13OrderRevenue(t).collect().map(_.getAs[Double]("revenue"))
    assert(revs.length <= 10)
    assert(revs.sameElements(revs.sortBy(-(_: Double))))
  }

  test("q20 funnel stages are monotonically non-increasing and bounded by user count") {
    val rows = Relational.q20Funnel(t).collect()
      .map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_users")).toMap
    assert(rows.keySet == Set("1_view", "2_click", "3_purchase"))
    assert(rows("1_view") >= rows("2_click") && rows("2_click") >= rows("3_purchase"),
      s"funnel must narrow: $rows")
    assert(rows("1_view") > 0)
    val nUsers = t.events.select(col("user_id")).distinct().count()
    assert(rows("1_view") <= nUsers)
  }

  test("q21 binned range join equals the brute-force non-equi join") {
    val binned = graft.operators.RangeJoin.purchasesInSignupWindows(t).collect()(0)
    val ev = t.events.select(col("user_id"), col("event_id"), col("event_type"),
      unix_timestamp(col("ts")).as("es"))
    val s = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("event_id").as("sid"), col("es").as("ses"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("event_id").as("pid"), col("es").as("pes"))
    val brute = s.join(p, col("user_id") === col("pu") &&
        col("pes") >= col("ses") && col("pes") < col("ses") + 3600)
      .select(col("sid"), col("pid")).distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(binned.getAs[Long]("n_pairs") == brute.length)
    assert(binned.getAs[Long]("n_purchases_matched") == brute.map(_._2).distinct.length)
    assert(binned.getAs[Long]("n_signups_matched") == brute.map(_._1).distinct.length)
    assert(brute.nonEmpty, "testdata must produce at least one attribution pair")
  }

  test("q24 histogram quantiles stay within one bin width of q16's exact percentiles") {
    val t = graft.sources.Tables(spark, sfDir)
    val exact = graft.operators.Relational.q16Quantiles(t).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Double]("p50"), r.getAs[Double]("p95"))).toMap
    val approx = graft.operators.Relational.q24HistQuantiles(t).collect()
    assert(approx.nonEmpty)
    // position error is bounded by one bin, but the uniform-within-bin
    // interpolation can add up to another bin on sparse data — two bin
    // widths is the honest bound
    val tol = 2 * 5.0
    approx.foreach { r =>
      val (p50, p95) = exact(r.getAs[String]("event_type"))
      assert(math.abs(r.getAs[Double]("p50_est") - p50) <= tol,
        s"p50 outside bound: est=${r.getAs[Double]("p50_est")} exact=$p50")
      assert(math.abs(r.getAs[Double]("p95_est") - p95) <= tol,
        s"p95 outside bound: est=${r.getAs[Double]("p95_est")} exact=$p95")
    }
  }

  test("q22 HLL estimate tracks the exact distinct count per group") {
    val t = graft.sources.Tables(spark, sfDir)
    import org.apache.spark.sql.functions.{col, countDistinct}
    val exact = t.lineitem.groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("d")).collect()
      .map(r => r.getAs[String]("l_returnflag") -> r.getAs[Long]("d")).toMap
    graft.operators.Relational.q22HllDistinct(t).collect().foreach { r =>
      val truth = exact(r.getAs[String]("l_returnflag"))
      val rel = math.abs(r.getAs[Double]("est_distinct") - truth) / truth
      // stderr ~ 1.04/sqrt(64) = 13%; allow 3 sigma
      assert(rel < 0.4, s"estimate ${r.getAs[Double]("est_distinct")} vs $truth (rel=$rel)")
    }
  }

  test("q36 cube: all four grains present and every grain reconciles to the grand total") {
    val rows = Relational.q36GroupingSets(t).collect()
    val byGid = rows.groupBy(_.getAs[Long]("gid"))
    assert(byGid.keySet == Set(0L, 1L, 2L, 3L), "CUBE over 2 columns = exactly 4 grouping-set grains")
    val grand = byGid(3L) // both columns grouped away
    assert(grand.length == 1)
    val grandN = grand.head.getAs[Long]("n_items")
    val grandRev = grand.head.getAs[Double]("revenue")
    // each grain's counts and revenues sum to the identical grand total
    Seq(0L, 1L, 2L).foreach { gid =>
      assert(byGid(gid).map(_.getAs[Long]("n_items")).sum == grandN, s"gid=$gid counts reconcile")
      assert(math.abs(byGid(gid).map(_.getAs[Double]("revenue")).sum - grandRev) < 1e-6,
        s"gid=$gid decimal-exact revenue reconciles")
    }
    // the cross grain ROLLUP cannot express: linestatus alone (gid=2, returnflag nulled)
    assert(byGid(2L).forall(r => r.isNullAt(r.fieldIndex("l_returnflag")) &&
      !r.isNullAt(r.fieldIndex("l_linestatus"))))
  }

  test("q38 deciles: balanced tiles, ordered ranges, totals reconcile per group") {
    val rows = Relational.q38Deciles(t).collect()
    val byGroup = rows.groupBy(_.getAs[String]("o_orderpriority"))
    val orders = t.orders.select(col("o_orderpriority"), col("o_totalprice")).collect()
      .map(r => (r.getString(0), r.getDouble(1))).groupBy(_._1)
    byGroup.foreach { case (prio, tiles) =>
      assert(tiles.map(_.getAs[Int]("decile")).sorted.sameElements(1 to tiles.length))
      // NTILE balance: tile sizes differ by at most one
      val sizes = tiles.map(_.getAs[Long]("n"))
      assert(sizes.max - sizes.min <= 1, s"$prio tile sizes $sizes")
      assert(sizes.sum == orders(prio).length, s"$prio tiles cover the group")
      // value ranges are ordered: each tile's hi <= next tile's lo is not
      // guaranteed at ties, but lo must be non-decreasing across tiles
      val los = tiles.sortBy(_.getAs[Int]("decile")).map(_.getAs[Double]("lo"))
      assert(los.sameElements(los.sorted), s"$prio decile lower bounds ordered")
    }
  }

  test("q37 outliers: fence counts match a brute-force recomputation per type") {
    val rows = Relational.q37Outliers(t).collect()
    assert(rows.nonEmpty)
    val vals = t.events.select(col("event_type"), col("value")).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Double]("value")))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    rows.foreach { r =>
      val et = r.getAs[String]("event_type")
      val vs = vals(et)
      assert(r.getAs[Long]("n") == vs.length)
      val lo = r.getAs[Double]("lo_fence")
      val hi = r.getAs[Double]("hi_fence")
      assert(lo < hi)
      assert(r.getAs[Long]("n_out_low") == vs.count(_ < lo))
      assert(r.getAs[Long]("n_out_high") == vs.count(_ > hi))
      // fences derive from the exact interpolated quartiles: recompute them
      val sorted = vs.sorted
      def pct(p: Double): Double = {
        val rank = p * (sorted.length - 1)
        val lo_i = rank.toInt
        val frac = rank - lo_i
        if (lo_i + 1 < sorted.length) sorted(lo_i) * (1 - frac) + sorted(lo_i + 1) * frac
        else sorted(lo_i)
      }
      val q1 = BigDecimal(pct(0.25)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val q3 = BigDecimal(pct(0.75)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val expLo = BigDecimal(q1 - 1.5 * (q3 - q1)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(lo - expLo) < 2e-6, s"$et lo fence from exact quartiles")
    }
  }

  test("q35 unpivot: the pivot round-trip recovers the plain (user, type) aggregation") {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val melted = graft.operators.Relational.q35Unpivot(t, types).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"), r.getAs[Long]("n")))
    assert(melted.nonEmpty)
    val direct = t.events.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"), r.getAs[Long]("n")))
    assert(melted.toSet == direct.toSet, "unpivot(pivot(x)) == x with zero cells dropped")
  }

  test("q34 attribution: every purchase gets its strictly-latest prior click, or nulls") {
    def micros2(x: Any): Long = x match {
      case ts: java.sql.Timestamp =>
        ts.getTime / 1000 * 1000000L + ts.getNanos / 1000L
      case d: java.time.LocalDateTime =>
        d.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + d.getNano / 1000L
      case other => fail(s"unexpected timestamp type: $other")
    }
    val rows = graft.operators.Relational.q34Attribution(t).collect()
      .map(r => r.getAs[Long]("event_id") ->
        ((Option(r.getAs[Any]("click_id")).map(_.asInstanceOf[Long]),
          Option(r.getAs[Any]("gap_us")).map(_.asInstanceOf[Long])))).toMap
    assert(rows.nonEmpty)
    val events = t.events.select("event_id", "user_id", "ts", "event_type").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("user_id"),
        micros2(r.getAs[Any]("ts")), r.getAs[String]("event_type")))
    val clicksByUser = events.filter(_._4 == "click").groupBy(_._2)
    val purchases = events.filter(_._4 == "purchase")
    assert(rows.keySet == purchases.map(_._1).toSet, "one output row per purchase")
    purchases.foreach { case (pid, u, pts, _) =>
      val prior = clicksByUser.getOrElse(u, Array.empty).filter(_._3 < pts)
      val (gotClick, gotGap) = rows(pid)
      if (prior.isEmpty) assert(gotClick.isEmpty && gotGap.isEmpty, s"purchase $pid: no prior click")
      else {
        // latest ts wins; ties at the same ts resolve to the max event_id
        val best = prior.maxBy(c => (c._3, c._1))
        assert(gotClick.contains(best._1), s"purchase $pid: wrong click")
        assert(gotGap.contains(pts - best._3), s"purchase $pid: wrong gap")
      }
    }
    assert(rows.values.exists(_._1.isEmpty) && rows.values.exists(_._1.nonEmpty),
      "the corpus exercises both the matched and unmatched paths")
  }

  test("q33 scd2: intervals chain gaplessly and match brute-force run collapsing") {
    // ts surfaces as Timestamp or LocalDateTime depending on the parquet
    // logical type — handle both (the round-9 testdata drift lesson)
    def millis(x: Any): Long = x match {
      case t: java.sql.Timestamp => t.getTime
      case d: java.time.LocalDateTime => d.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
      case other => fail(s"unexpected timestamp type: $other")
    }
    val rows = graft.operators.Relational.scd2(t).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("seq"),
        r.getAs[String]("event_type"), r.getAs[Any]("valid_from"),
        r.getAs[Any]("valid_to")))
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_._1)
    byUser.foreach { case (u, ivs) =>
      val sorted = ivs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq, s"user $u: seq is 1..n")
      sorted.sliding(2).filter(_.length == 2).foreach { pair =>
        val (a, b) = (pair(0), pair(1))
        assert(a._5 == b._4, s"user $u: valid_to chains to the next valid_from")
        assert(a._3 != b._3, s"user $u: consecutive runs never share a state")
      }
      assert(sorted.last._5 == null, s"user $u: current state is open-ended")
    }
    // brute force from raw events: collapse runs ordered by (ts, event_id)
    val events = t.events.select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Any]("ts"),
        r.getAs[Long]("event_id"), r.getAs[String]("event_type")))
    val expected = events.groupBy(_._1).flatMap { case (u, es) =>
      val ordered = es.sortBy(e => (millis(e._2), e._3))
      val runs = ordered.foldLeft(Vector.empty[(String, Any)]) {
        case (acc, (_, ts, _, ty)) =>
          if (acc.nonEmpty && acc.last._1 == ty) acc else acc :+ (ty, ts)
      }
      runs.zipWithIndex.map { case ((ty, from), i) =>
        (u, (i + 1).toLong, ty, from,
          if (i + 1 < runs.length) runs(i + 1)._2 else null)
      }
    }.toSet
    assert(rows.toSet == expected, "scd2 must equal brute-force run collapsing")
  }

  test("q32 moving window: trailing frame matches brute-force day-distance recomputation") {
    val rows = graft.operators.Relational.movingWindow(t).collect()
      .map(r => ((r.getAs[String]("event_type"), r.getAs[java.sql.Date]("day").toString),
        (r.getAs[Long]("win_events"), r.getAs[Double]("win_value"))))
    assert(rows.nonEmpty)
    // brute force from the daily grain: the frame is day DISTANCE ≤ 6,
    // not "previous 7 rows" — on sparse series the two differ
    val daily = t.events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("dn"), sum(col("value").cast("decimal(18,2)")).as("dsum"))
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[java.sql.Date]("day").toLocalDate,
        r.getAs[Long]("dn"), r.getAs[java.math.BigDecimal]("dsum")))
    val expected = daily.map { case (ty, d, _, _) =>
      val in = daily.filter { case (ty2, d2, _, _) =>
        ty2 == ty && !d2.isAfter(d) && java.time.temporal.ChronoUnit.DAYS.between(d2, d) <= 6
      }
      val s = in.map(p => BigDecimal(p._4)).sum // exact decimal accumulation
      ((ty, d.toString), (in.map(_._3).sum, s.toDouble))
    }.toMap
    assert(rows.toMap == expected, "range-frame trailing window must equal brute force")
    // the window never falls back to a global single partition
    val explain = graft.operators.Relational.movingWindow(t).queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!explain.contains("SinglePartition") || !explain.contains("Window"),
      s"window must be partitioned by event_type:\n$explain")
  }

  test("q26 retention: offsets are non-negative and offset 0 holds the full cohort") {
    val rows = graft.operators.Relational.q26RetentionCohorts(t).collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getAs[Long]("cohort_week"))
    byCohort.foreach { case (cw, rs) =>
      val byOffset = rs.map(r => r.getAs[Long]("week_offset") -> r.getAs[Long]("n_users")).toMap
      assert(byOffset.keySet.forall(_ >= 0), s"negative offset in cohort $cw")
      // every cohort member is active in their own first week by
      // definition, so offset 0 is the cohort's size — an upper bound
      // for every later offset
      assert(byOffset.contains(0L), s"cohort $cw missing its own week")
      assert(byOffset.forall { case (_, n) => n <= byOffset(0L) },
        s"cohort $cw has an offset larger than the cohort itself")
    }
    // total cohort sizes cover every user exactly once
    val users = t.events.select("user_id").distinct().count()
    assert(byCohort.values.map(_.find(_.getAs[Long]("week_offset") == 0L)
      .get.getAs[Long]("n_users")).sum == users)
    // column pruning reaches the scan: the matrix reads (ts, user_id),
    // never the payload columns
    val explain = graft.operators.Relational.q26RetentionCohorts(t)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val readSchemas = explain.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(readSchemas.nonEmpty)
    readSchemas.foreach { l =>
      assert(!l.contains("props") && !l.contains("value") && !l.contains("event_type"),
        s"payload columns must be pruned from the events scan: $l")
    }
  }

  test("globalRowNumber matches an unpartitioned ranking window across many partitions") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = (1 to 5000).map(i => (i.toLong, (i * 2654435761L) % 97))
      .toDF("id", "score").repartition(16)
    val viaWindow = df.withColumn("position",
        row_number().over(Window.orderBy(col("score").desc, col("id"))).cast("int"))
      .collect().map(r => (r.getLong(0), r.getAs[Int]("position"))).toMap
    val viaRanking = graft.operators.Ranking
      .globalRowNumber(df, Seq(col("score").desc, col("id")), "position", numPartitions = Some(7))
      .collect().map(r => (r.getLong(0), r.getAs[Int]("position"))).toMap
    assert(viaRanking == viaWindow)
    // the data path must stay distributed (the checkpoint hides the
    // range exchange from the visible plan, so assert distribution via
    // the result's partitioning) with NO ranking window over data rows
    val out = graft.operators.Ranking
      .globalRowNumber(df, Seq(col("score").desc, col("id")), "position", numPartitions = Some(7))
    assert(out.rdd.getNumPartitions > 1, "must not collapse to one partition")
    val plan = out.queryExecution.executedPlan.toString.toLowerCase
    assert(!plan.contains("window [row_number"), "data rows must not pass through a ranking window")
  }

  test("q39 MoM revenue matches a driver-side decimal recompute; first month has no prior") {
    import org.apache.spark.sql.functions.col
    val t = graft.sources.Tables(spark, sfDir)
    val orders = t.orders.select(col("o_orderdate"), col("o_totalprice")).collect()
      .map { r =>
        val d = r.get(0) match {
          case ts: java.sql.Timestamp => ts.toLocalDateTime.toLocalDate
          case ldt: java.time.LocalDateTime => ldt.toLocalDate
        }
        ((d.getYear, d.getMonthValue),
          BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP))
      }
    val monthly = orders.groupBy(_._1).map { case (ym, rs) =>
      ym -> ((rs.map(_._2).sum, rs.size.toLong))
    }.toSeq.sortBy(_._1)
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = monthly.zipWithIndex.map { case (((yr, mo), (rev, n)), i) =>
      val prev = if (i == 0) None else Some(monthly(i - 1)._2._1)
      (yr, mo, rev.toDouble, n, prev.map(_.toDouble),
        prev.map(p => r4((rev - p).toDouble / p.toDouble * 100)))
    }
    val got = graft.operators.Relational.momRevenue(t).collect().map { r =>
      (r.getInt(0), r.getInt(1), r.getDouble(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)),
        if (r.isNullAt(5)) None else Some(r.getDouble(5)))
    }
    assert(got.toSeq == want, "month-over-month chain must match the decimal recompute")
    assert(got.head._5.isEmpty && got.tail.forall(_._5.isDefined),
      "exactly the first month lacks a prior")
  }
}
