package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.Tables

/** Substring-dedup scale benchmark: measures what d9/d10's `maxDf` cap
  * buys on a corpus with a deliberately HOT shingle — the
  * corpus-boilerplate shape (license headers, nav chrome, templated
  * disclaimers) that makes an uncapped positional self-join quadratic.
  *
  * Synthetic corpus, all sizes from one generator:
  *  - every doc: ~34 tokens, mostly unique per doc (df = 1 shingles —
  *    the realistic no-match background),
  *  - 0.5% of docs share ONE 8-token boilerplate block → one shingle
  *    with df = N/200; uncapped, that single hash streams df² rows
  *    through the self-join (9× the rows for 3× the docs),
  *  - 0.2% of docs form pairs sharing a 20-token block (df = 2) — the
  *    GENUINE long duplicates the operator exists to find.
  *
  * The boilerplate span is 8 tokens < minSpanTokens = 16, so capped and
  * uncapped runs return the SAME spans (asserted) — the cap drops only
  * work that could never produce a reportable span. Measured per corpus
  * size: wall seconds capped (maxDf = 64) vs uncapped, plus the exact
  * join-row counts Σ df² vs Σ min(df, cap)² that drive them. One JSON
  * line per size; SUBSTRBENCH.md records a quiet run.
  *
  * (The persisted-store twin, `buildSubstringStore`, applies the same
  * cap at build time and refuses to PUBLISH a generation whose index
  * violates it — its cost model is this benchmark's capped column.)
  */
object SubstrBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sizes = sys.env.getOrElse("SPARK_GRAFT_SUBSTR_ROWS", "1000000,3000000")
      .split(",").map(_.trim.toLong).toSeq
    val cap = sys.env.getOrElse("SPARK_GRAFT_SUBSTR_MAXDF", "64").toLong
    val k = 8
    val spark = GraftSession.builder(s"local[$cpus]", shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def corpus(n: Long): DataFrame = {
      def uniq(tag: String, m: Int) =
        transform(sequence(lit(0), lit(m - 1)),
          i => concat(lit("u"), col("id"), lit(tag), i))
      val boiler = array((0 until k).map(i => lit(s"bp$i")): _*)
      val shared = transform(sequence(lit(0), lit(19)),
        i => concat(lit("d"), floor(col("id") / 1000), lit("t"), i))
      spark.range(0, n).select(
        col("id").as("doc_id"),
        concat_ws(" ",
          concat(
            uniq("f", 4),
            when(col("id") % 200 === 0, boiler).otherwise(uniq("g", k)),
            when(col("id") % 1000 === 1 || col("id") % 1000 === 2, shared)
              .otherwise(uniq("h", 20)),
            uniq("t", 2))).as("text"))
    }

    sizes.foreach { n =>
      val dir = s"/tmp/graft_substrbench_$n"
      org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(dir), true)
      corpus(n).write.parquet(s"$dir/documents.parquet")
      val t = Tables(spark, dir)

      // the cost driver, exact: rows the positional self-join streams
      // per shingle hash is df² (uncapped) vs min(df, cap)²
      val df2 = t.documents
        .select(col("doc_id"), graft.functions.GraftFunctions.ws_tokens(col("text")).as("toks"))
        .select(explode(graft.functions.GraftFunctions.shingle_hashes(col("toks"), k)).as("h"))
        .groupBy(col("h")).agg(count(lit(1)).as("df"))
        .agg(
          sum(col("df") * col("df")).as("uncapped"),
          sum(least(col("df"), lit(cap)) * least(col("df"), lit(cap))).as("capped"),
          max(col("df")).as("max_df"))
        .collect()(0)

      // collect, don't count: the spans are ~N/1000 rows (driver-tiny)
      // and the SAME-SPANS claim below must compare the actual answer
      // sets — equal counts could hide a split-island +1 canceling a
      // lost-span -1
      def timed(run: => DataFrame): (Double, Set[String]) = {
        val t0 = System.nanoTime()
        val rows = run.collect().map(_.toString).toSet
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      val (cappedSec, cappedSpans) = timed(Dedup.substringSpans(t, maxDf = Some(cap)))
      val (uncappedSec, uncappedSpans) = timed(Dedup.substringSpans(t, maxDf = None))
      // the cap must be semantics-free here: boilerplate spans are
      // sub-threshold, so both runs find exactly the planted duplicates
      require(cappedSpans == uncappedSpans,
        s"capped run changed the answer: ${cappedSpans.size} vs ${uncappedSpans.size} spans, " +
          s"diff ${(cappedSpans diff uncappedSpans).take(3)} / ${(uncappedSpans diff cappedSpans).take(3)}")
      val cappedRows = cappedSpans.size

      println(s"""{"metric":"substr_maxdf","docs":$n,"cap":$cap,""" +
        s""""capped_sec":$cappedSec,"uncapped_sec":$uncappedSec,""" +
        s""""join_rows_capped":${df2.getAs[Long]("capped")},""" +
        s""""join_rows_uncapped":${df2.getAs[Long]("uncapped")},""" +
        s""""max_df":${df2.getAs[Long]("max_df")},"spans":$cappedRows,"cpus":$cpus}""")
    }
    spark.stop()
  }
}
