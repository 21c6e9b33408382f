package graft

/** Plan-audit tool: `runMain graft.Explain <sfDir> <queryName> [fmt]` —
  * prints the formatted physical plan and wall time for one query, so
  * shuffle/broadcast/pushdown regressions are visible per operator.
  * `fmt` = `audit` prints [[graft.sources.PlanAudit]]'s row form
  * instead of EXPLAIN text (post-execution, so AQE's final exchanges
  * and codegen spans are included).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args(1).split(",").toSeq else SparkEntry.queries.keys.toSeq.sorted
    val mode = if (args.length > 2) args(2) else "formatted"
    val spark = GraftSession.getOrCreate(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
        if (ms > 200)
          println(f"  stage ${si.stageId}%3d tasks=${si.numTasks}%3d wall=${ms}ms")
      }
    })
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(s"\n===== $name =====")
      if (mode != "none" && mode != "audit") df.explain(mode)
      val t0 = System.nanoTime()
      // audit mode executes THIS df's plan (toRdd finalizes AQE without
      // materializing rows on the driver) so the audit sees the final
      // exchanges and codegen spans; other modes keep the count shortcut
      val n = if (mode == "audit") df.queryExecution.toRdd.count() else df.count()
      println(f"[$name] rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
      if (mode == "audit")
        graft.sources.PlanAudit.planAudit(df).show(200, truncate = false)
    }
    spark.stop()
  }
}
