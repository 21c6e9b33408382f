package graft

import java.nio.file.{Files, Paths}

/** Per-round plan-shape artifact: run every `SparkEntry.queries` key
  * post-execution (AQE finalized) and dump one JSON object per key with
  * the plan facts a regression would move — exchange counts, scan
  * pushdowns, bucket selections, codegen spans. Committed as
  * `PLANAUDIT_r{N}.json` each round so a lost pushdown or a new
  * exchange diffs as visibly as a correctness regression.
  *
  * `runMain graft.PlanAuditDump [sfDir] [outFile] [keys]`
  */
object PlanAuditDump {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.01"
    val out = if (args.length > 1) args(1) else "PLANAUDIT.json"
    val names =
      if (args.length > 2) args(2).split(",").toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.getOrCreate(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
    spark.sparkContext.setLogLevel("WARN")

    def esc(s: String): String =
      s.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", " ")

    val lines = names.map { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      // execute THIS plan (toRdd finalizes AQE without materializing rows
      // on the driver) so the audit sees final exchanges + codegen spans
      df.queryExecution.toRdd.count()
      val rows = graft.sources.PlanAudit.planAudit(df).collect()
      def n(op: String) = rows.count(_.getString(0) == op)
      val scans = rows.filter(_.getString(0) == "scan")
      val pushed = scans.count(r => r.getString(3).nonEmpty && r.getString(3) != "[]")
      val pruned = scans.count(r => r.getString(4).nonEmpty && r.getString(4) != "[]")
      val buckets = scans.map(_.getString(5)).filter(_.nonEmpty).sorted
      val spans = rows.filter(_.getString(0) == "codegen")
      val maxFused = spans.map(_.getString(6).stripPrefix("fused=").toInt)
        .foldLeft(0)(math.max)
      System.err.println(s"[planaudit] $name shuffles=${n("shuffle")} " +
        s"broadcasts=${n("broadcast")} scans=${scans.length}")
      s"""  "$name": {"shuffles": ${n("shuffle")}, "broadcasts": ${n("broadcast")},""" +
        s""" "reused_exchanges": ${n("reused_exchange")}, "scans": ${scans.length},""" +
        s""" "scans_with_pushdown": $pushed, "scans_with_partition_filter": $pruned,""" +
        s""" "selected_buckets": [${buckets.map(b => "\"" + esc(b) + "\"").mkString(", ")}],""" +
        s""" "codegen_spans": ${spans.length}, "max_fused": $maxFused}"""
    }
    Files.write(Paths.get(out),
      ("{\n" + lines.mkString(",\n") + "\n}\n").getBytes("UTF-8"))
    println(s"[planaudit] wrote ${names.size} keys to $out")
    spark.stop()
  }
}
