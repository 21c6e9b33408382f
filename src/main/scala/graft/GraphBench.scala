package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Graph benchmark main: measures the two §2.9 scale claims on a
  * synthetic HUB graph (one node adjacent to every rim node — the
  * degree shape that breaks naive triangle plans):
  *
  *  1. g2/g3's degree-ordered wedge closing vs the naive symmetric
  *     wedge join. Naive, the hub emits deg²/2 wedges INTO ONE TASK
  *     (wedge generation is a per-center cross product, and one center
  *     = one shuffle key); ordered low→high, the hub is last in the
  *     order, so its out-degree is 0 and it emits none. Both paths
  *     must agree on the total triangle count.
  *
  *  2. g1's static ranks-broadcast pin vs the un-hinted plan: the
  *     checkpointed loop inputs carry no stats, so without the pin
  *     every round sort-merge-joins (shuffle-writing the EDGE side
  *     per round) even though AQE later converts — the write is what
  *     the pin avoids.
  *
  * Prints ONE JSON line; GRAPHBENCH.md records a quiet run.
  */
object GraphBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nRim = sys.env.getOrElse("SPARK_GRAFT_GRAPH_RIM", "10000").toLong
    val nChords = sys.env.getOrElse("SPARK_GRAFT_GRAPH_CHORDS", "200000").toLong
    val spark = GraftSession.builder(s"local[$cpus]", shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // hub 0 adjacent to every rim node; rim ring; random chords — one
    // row per unordered pair, src < dst
    val hub = spark.range(1, nRim + 1).select(lit(0L).as("src"), col("id").as("dst"))
    val ring = spark.range(1, nRim).select(col("id").as("src"), (col("id") + 1).as("dst"))
    val chords = spark.range(0, nChords).select(
        (pmod(xxhash64(col("id")), lit(nRim - 1)) + 1).as("a"),
        (pmod(xxhash64(col("id") + nChords), lit(nRim - 1)) + 1).as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("src"), greatest(col("a"), col("b")).as("dst"))
    val und = hub.unionAll(ring).unionAll(chords).distinct().localCheckpoint(true)
    val nEdges = und.count()

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // naive: symmetric adjacency, wedges at EVERY center (the hub's
    // deg²/2 pairs land in its one shuffle partition), close with the
    // canonical edge; each triangle closes at all 3 centers → /3
    val sym = und.union(und.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(true)
    val naiveWedges = sym.select(col("src").as("u"), col("dst").as("v"))
      .join(sym.select(col("src").as("u"), col("dst").as("w")), Seq("u"))
      .filter(col("v") < col("w"))
    val (naiveWedgeRows, _) = timed(naiveWedges.count())
    val (naiveTris, naiveSec) = timed {
      naiveWedges.join(und.select(col("src").as("v"), col("dst").as("w")), Seq("v", "w")).count() / 3
    }

    // ordered (the shipped g2 plan): per-node counts sum to 3T
    val (orderedTris, orderedSec) = timed {
      Graph.triangleCountsFromEdges(und).agg(sum(col("n_tri"))).collect()(0).getLong(0) / 3
    }
    require(naiveTris == orderedTris,
      s"triangle totals must agree: naive=$naiveTris ordered=$orderedTris")
    // ordered wedge volume, for the rows contrast (same expression g2 uses)
    val deg = sym.groupBy("src").agg(count(lit(1)).as("deg")).select(col("src").as("n"), col("deg"))
    val srcFirst = col("dsrc") < col("ddst") ||
      (col("dsrc") === col("ddst") && col("src") < col("dst"))
    val ordered = und
      .join(deg.withColumnRenamed("n", "src").withColumnRenamed("deg", "dsrc"), "src")
      .join(deg.withColumnRenamed("n", "dst").withColumnRenamed("deg", "ddst"), "dst")
      .select(when(srcFirst, col("src")).otherwise(col("dst")).as("lo"),
        when(srcFirst, col("dst")).otherwise(col("src")).as("hi"))
      .localCheckpoint(true)
    val orderedWedgeRows = ordered.select(col("lo").as("u"), col("hi").as("v"))
      .join(ordered.select(col("lo").as("u"), col("hi").as("w")), Seq("u"))
      .filter(col("v") < col("w")).count()

    // g1: 3 rounds, ranks broadcast pinned vs un-hinted
    def pagerankRounds(broadcastRanks: Boolean): Double = {
      val edges = sym
      val dg = edges.groupBy("src").agg(count(lit(1)).as("deg")).localCheckpoint(true)
      val edgesDeg = edges.join(dg, "src").localCheckpoint(true)
      var ranks = dg.select(col("src").as("node"), lit(Graph.Rank0).as("rank"))
      val t0 = System.nanoTime()
      (1 to 3).foreach { _ =>
        ranks = Graph.pagerankRound(ranks, edgesDeg, broadcastRanks).localCheckpoint(true)
      }
      (System.nanoTime() - t0) / 1e9
    }
    val pinnedSec = pagerankRounds(broadcastRanks = true)
    val unpinnedSec = pagerankRounds(broadcastRanks = false)

    // the BUCKETED-STORE path (the billion-node deployment shape): edges
    // persisted bucketed by src, ranks shuffle-joined into the layout —
    // measured against the broadcast pin on the same graph
    def storeRounds(store: String, und0: DataFrame): Double = {
      graft.sources.Warehouse.dropStore(spark, store, Seq("edges", "wedges"))
      val w = und0.select(col("src"), col("dst"), lit(1L).as("w"))
      Graph.buildEdgeStoreOf(und0, w, store, cpus.toInt)
      val edgesDeg = Graph.storeTable(spark, store, "edges")
      var ranks = edgesDeg.groupBy(col("src")).agg(min(col("deg")).as("deg"))
        .select(col("src").as("node"), lit(Graph.Rank0).as("rank"))
      val t0 = System.nanoTime()
      (1 to 3).foreach { _ =>
        ranks = Graph.pagerankRound(ranks, edgesDeg, broadcastRanks = false)
          .localCheckpoint(true)
      }
      (System.nanoTime() - t0) / 1e9
    }
    val storeSec = storeRounds("gbstore", und)

    // optional: the same pinned-vs-unpinned loop on the REAL co-purchase
    // graph (SPARK_GRAFT_SF_DIR), where the g1 baseline was measured
    val real = sys.env.get("SPARK_GRAFT_SF_DIR").map { dir =>
      val und2 = Graph.copurchaseEdges(graft.sources.Tables(spark, dir)).localCheckpoint(true)
      val sym2 = und2.union(und2.select(col("dst").as("src"), col("src").as("dst")))
        .localCheckpoint(true)
      def rounds(b: Boolean): Double = {
        val dg = sym2.groupBy("src").agg(count(lit(1)).as("deg")).localCheckpoint(true)
        val edgesDeg = sym2.join(dg, "src").localCheckpoint(true)
        var ranks = dg.select(col("src").as("node"), lit(Graph.Rank0).as("rank"))
        val t0 = System.nanoTime()
        (1 to 5).foreach { _ =>
          ranks = Graph.pagerankRound(ranks, edgesDeg, b).localCheckpoint(true)
        }
        (System.nanoTime() - t0) / 1e9
      }
      def storeRounds5(): Double = {
        graft.sources.Warehouse.dropStore(spark, "gbstorereal", Seq("edges", "wedges"))
        Graph.buildEdgeStoreOf(und2,
          und2.select(col("src"), col("dst"), lit(1L).as("w")), "gbstorereal", cpus.toInt)
        val edgesDeg = Graph.storeTable(spark, "gbstorereal", "edges")
        var ranks = edgesDeg.groupBy(col("src")).agg(min(col("deg")).as("deg"))
          .select(col("src").as("node"), lit(Graph.Rank0).as("rank"))
        val t0 = System.nanoTime()
        (1 to 5).foreach { _ =>
          ranks = Graph.pagerankRound(ranks, edgesDeg, broadcastRanks = false)
            .localCheckpoint(true)
        }
        (System.nanoTime() - t0) / 1e9
      }
      // g2 vs g10 WEDGE-STAGE isolation on the same pre-built edges:
      // the per-key bench conflates the (linear, shared) edge build with
      // the wedge term — this is the term g10 exists to flatten, so it
      // is measured alone (exact count vs p=1/4 sampled estimate)
      val (exactTris, exactSec) = timed {
        // coalesce: a triangle-free graph sums to NULL, not 0
        Graph.triangleCountsFromEdges(und2)
          .agg(coalesce(sum(col("n_tri")), lit(0L))).collect()(0).getLong(0) / 3
      }
      val (estRow, sampleSec) = timed {
        Graph.triangleSampleFromEdges(und2).collect()(0)
      }
      (rounds(true), rounds(false), storeRounds5(),
        exactTris, exactSec, estRow.getLong(3), sampleSec)
    }
    val realJson = real.map { case (p, u, s, xt, xs, et, es) =>
      s""","real_pagerank5_pinned_sec":$p,"real_pagerank5_unpinned_sec":$u,""" +
        s""""real_pagerank5_store_sec":$s,"real_tri_exact":$xt,""" +
        s""""real_tri_exact_sec":$xs,"real_tri_sample_est":$et,""" +
        s""""real_tri_sample_sec":$es"""
    }.getOrElse("")

    println(s"""{"metric":"graph_ordered_vs_naive","rim":$nRim,"edges":$nEdges,""" +
      s""""triangles":$orderedTris,"naive_wedge_rows":$naiveWedgeRows,""" +
      s""""ordered_wedge_rows":$orderedWedgeRows,"naive_sec":$naiveSec,""" +
      s""""ordered_sec":$orderedSec,"pagerank3_pinned_sec":$pinnedSec,""" +
      s""""pagerank3_unpinned_sec":$unpinnedSec,""" +
      s""""pagerank3_store_sec":$storeSec$realJson,"cpus":$cpus}""")
    spark.stop()
  }
}
