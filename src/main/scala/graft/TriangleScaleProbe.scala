package graft

import graft.operators.Graph
import graft.sources.Tables

/** SCALECHECK probe for the r18 adjacency-intersection triangle core:
  * times g2/g3/g8 at a given scale with the default broadcast adjacency
  * attaches AND with `broadcastClosing = false` — the at-scale escape
  * shape (single-key shuffle attaches, no broadcast envelope) the
  * family must fall back to when the adjacency table outgrows the
  * broadcast cap. Prints one JSON line; run against the ScaleData sf1
  * replica to confirm the escape shape scales (verdict r18 item 9).
  *
  * `runMain graft.TriangleScaleProbe <sfDir>`
  */
object TriangleScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/tmp/graft_sf1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", shufflePartitions = cpus.toInt).getOrCreate()
    functions.GraftFunctions.registerAll(spark)
    spark.sparkContext.setLogLevel("WARN")
    val t = Tables(spark, dir)

    def timed(name: String, mk: => org.apache.spark.sql.DataFrame): Double = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      mk.write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      spark.sparkContext.setJobDescription(null)
      s
    }
    def d2(v: Double): String = String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val entries = for {
      bc <- Seq(true, false)
      (key, mk) <- Seq[(String, () => org.apache.spark.sql.DataFrame)](
        "g2" -> (() => Graph.triangleCounts(t, broadcastClosing = bc)),
        "g3" -> (() => Graph.edgeEmbeddedness(t, broadcastClosing = bc)),
        "g8" -> (() => Graph.clusteringCoeff(t, broadcastClosing = bc)))
    } yield s""""${key}_bc$bc":${d2(timed(s"$key broadcastClosing=$bc", mk()))}"""
    println(s"""{"metric":"triangle_scale","dir":"$dir","cpus":$cpus,${entries.mkString(",")}}""")
    spark.stop()
  }
}
