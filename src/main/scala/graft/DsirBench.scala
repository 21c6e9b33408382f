package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.bucket_weight_sum
import graft.operators.TextAnalysis
import graft.sources.Tables

/** Scoring-path benchmark main: measures t11's map-side DSIR scoring
  * kernel ([[graft.functions.BucketWeightSum]] — one codegen pass, zero
  * shuffle) against the equivalent explode + per-bucket-count +
  * λ-table-join + aggregate plan, on a synthetic corpus large enough
  * that the per-feature rows dominate. This is the claim the kernel
  * exists for: selection scoring should cost one SCAN, not a
  * feature-count-sized exchange. The λ model build (one bounded
  * aggregation + ≤1024-row collect) is timed separately — it is paid
  * once per target/corpus generation. Prints ONE JSON line;
  * DSIRBENCH.md records quiet runs.
  */
object DsirBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_DSIR_DOCS", "1000000").toLong
    val spark = GraftSession.builder(s"local[$cpus]", shufflePartitions = cpus.toInt).getOrCreate()
    functions.GraftFunctions.registerAll(spark)
    spark.sparkContext.setLogLevel("WARN")

    // deterministic ~30-token docs over a 5000-word vocabulary (the
    // StoreBench generator); the first 1% is the "target" slice
    val split = math.max(1L, nDocs / 100)
    def words(seed: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      concat_ws(" ", (0 until 30).map(i =>
        concat(lit("w"), pmod(xxhash64(seed * 31 + lit(i)), lit(5000)))): _*)
    val dir = java.nio.file.Files.createTempDirectory("dsirbench").toString
    spark.range(0, nDocs)
      .select(col("id").as("doc_id"), words(col("id")).as("text"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val t = Tables(spark, dir)
    val raw = t.documents.filter(col("doc_id") >= split)

    val tl0 = System.nanoTime()
    val lam = TextAnalysis.dsirLambda(t.documents, benchSplit = split, buckets = 1024)
    val lamSec = (System.nanoTime() - tl0) / 1e9

    def timedNoop(mk: => DataFrame): Double = {
      def run(): Double = {
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run() // untimed warmup: JIT + page cache
      math.min(run(), run())
    }

    // map-side kernel: one scan, one codegen projection, no exchange
    val kernelSec = timedNoop(raw.select(col("doc_id"),
      size(TextAnalysis.dsirFeats(col("text"))).cast("long").as("n_feats"),
      round(bucket_weight_sum(TextAnalysis.dsirFeats(col("text")), lam.toSeq), 6)
        .as("log_weight")))

    // the plan the kernel replaces: per-feature explode, a (doc_id,
    // bucket) count exchange, a λ-table join, a per-doc aggregate
    import spark.implicits._
    val lamDf = lam.zipWithIndex.map { case (w, b) => (b.toLong, w) }.toSeq.toDF("b", "w")
    val joinSec = timedNoop(raw
      .select(col("doc_id"), explode(TextAnalysis.dsirFeats(col("text"))).as("h"))
      .select(col("doc_id"), pmod(col("h"), lit(1024L)).as("b"))
      .groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("c"))
      .join(lamDf, Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_feats"), round(sum(col("c") * col("w")), 6).as("log_weight")))

    println(s"""{"metric":"dsir_kernel_vs_join","docs":$nDocs,"target_docs":$split,""" +
      s""""lambda_build_sec":$lamSec,"kernel_sec":$kernelSec,"join_sec":$joinSec,""" +
      s""""cpus":$cpus}""")
    spark.stop()
  }
}
