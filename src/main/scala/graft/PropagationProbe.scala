package graft

import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup, Graph}
import graft.sources.Tables

/** Diagnostic for the min-label propagation engine
  * ([[graft.operators.Dedup.propagationRound]]): prints, for each gate
  * pair-graph source, the productive round count vs the oracle replay
  * budget ([[OracleReplicas.PointerJumpIters]]) — the loud-failure
  * margin — plus, with `plan` as the second arg, ONE round's physical
  * plan (the per-round shape the bench pays `rounds` times, which the
  * query-level EXPLAIN can never show because the loop runs at plan
  * construction time behind checkpoints).
  *
  * `runMain graft.PropagationProbe <sfDir> [plan]`
  */
object PropagationProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val showPlan = args.length > 1 && args(1) == "plan"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", shufflePartitions = cpus.toInt).getOrCreate()
    functions.GraftFunctions.registerAll(spark)
    spark.sparkContext.setLogLevel("WARN")
    val t = Tables(spark, dir)

    val sources: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "d6_lsh_pairs" -> (() =>
        Dedup.minhashLsh(t).select(col("doc_a"), col("doc_b"))),
      "dc8_cosine_pairs" -> (() =>
        Dedup.embeddingPairs(t, 0.3)
          .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"))),
      "g4_copurchase" -> (() =>
        Graph.copurchaseEdges(t)
          .select(col("src").as("doc_a"), col("dst").as("doc_b"))),
      "path_99_hops" -> (() => {
        import spark.implicits._
        (0L until 99L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
      }))

    // per-job attribution (SPARK_GRAFT_PROBE_JOBS=1): each propagation
    // round is one count() job — print its wall, stage count and task
    // count so the per-round fixed cost is decomposable
    if (sys.env.get("SPARK_GRAFT_PROBE_JOBS").contains("1"))
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          private val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
          private val stages = new java.util.concurrent.ConcurrentHashMap[Int, (Int, Int)]()
          override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            starts.put(js.jobId, js.time)
            stages.put(js.jobId,
              (js.stageInfos.size, js.stageInfos.map(_.numTasks).sum))
          }
          override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val w = je.time - starts.getOrDefault(je.jobId, je.time)
            val (ns, nt) = stages.getOrDefault(je.jobId, (0, 0))
            println(f"  [job] id=${je.jobId}%4d wall=${w}ms stages=$ns tasks=$nt")
          }
        })

    sources.foreach { case (name, mk) =>
      val t0 = System.nanoTime()
      val pg = mk().localCheckpoint(true)
      val t1 = System.nanoTime()
      val (labels, rounds, converged) = Dedup.clustersOfPairsCounted(pg)
      val t2 = System.nanoTime()
      val n = labels.count()
      println(f"[propagation] $name%-18s productive=${rounds - 1}%3d " +
        f"(budget=${OracleReplicas.PointerJumpIters}) converged=$converged " +
        f"labels=$n pairs_wall=${(t1 - t0) / 1e9}%.2fs loop_wall=${(t2 - t1) / 1e9}%.2fs")
    }

    if (showPlan) {
      // one representative round over the d6 pair graph, setup and
      // checkpoint discipline exactly as the loop runs it: edge list
      // pre-partitioned + sorted on the neighbor-join key (preserved
      // through the checkpoint, so the round plans NO exchange and NO
      // sort on the 2|E| side), static planning as in the
      // latency-bound regime
      val pairs = Dedup.minhashLsh(t).select(col("doc_a"), col("doc_b"))
        .localCheckpoint(true)
      val aqeWas = spark.conf.get("spark.sql.adaptive.enabled")
      val widthWas = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.shuffle.partitions", "2")
      try {
        val edges = pairs
          .unionByName(pairs.select(col("doc_b").as("doc_a"), col("doc_a").as("doc_b")))
          .repartition(2, col("doc_b"))
          .sortWithinPartitions("doc_b")
          .localCheckpoint(true)
        val labels = edges.select(col("doc_a").as("doc_id"))
          .distinct().withColumn("label", col("doc_id")).localCheckpoint(true)
        println("===== one propagation round (physical plan) =====")
        Dedup.propagationRound(edges, labels).explain("formatted")
      } finally {
        spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
        spark.conf.set("spark.sql.shuffle.partitions", widthWas)
      }
    }
    spark.stop()
  }
}
