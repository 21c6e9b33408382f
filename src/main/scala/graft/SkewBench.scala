package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Skew benchmark main: measures `Skew.saltedJoin` against the plain
  * shuffle join on a synthetic with ONE genuinely hot key holding ~50%
  * of the large side — the one-hot-entity shape of the reference's
  * per-driver/per-team fact loads
  * (/root/reference/loaders/__init__.py:248-640), at a scale where the
  * hot reducer dominates wall time.
  *
  * Three measured configs, each best-of-2 to a noop sink:
  *  - plain shuffle join, AQE skew mitigation OFF (the raw bottleneck)
  *  - salted join, AQE skew mitigation OFF (what salting alone buys)
  *  - plain shuffle join, AQE skew mitigation ON (the runtime
  *    alternative, for honesty — at 100 TB AQE skew-split covers
  *    sort-merge joins; explicit salting is the plan-level tool when
  *    AQE cannot see or split the skew)
  *
  * Also reports the measured max-reducer share for the unsalted vs
  * salted shuffle layouts. Prints ONE JSON line; SKEWBENCH.md records a
  * quiet run.
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = sys.env.getOrElse("SPARK_GRAFT_SKEW_ROWS", "20000000").toLong
    val nKeys = 10000L
    val factor = 16
    val spark = GraftSession.builder(s"local[$cpus]", shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // large side: every even row hits key 0 (50% hot), odd rows spread
    // uniformly; a 60-byte payload makes shuffle bytes (the thing the hot
    // reducer chokes on) realistic rather than 16-byte rows
    def large: DataFrame = spark.range(0, n)
      .select(
        when(col("id") % 2 === 0, lit(0L)).otherwise(pmod(col("id"), lit(nKeys))).as("k"),
        col("id").as("row_id"),
        concat(lit("payload-" * 7), col("id")).as("payload"))
    def small: DataFrame = spark.range(0, nKeys)
      .select(col("id").as("k"), concat(lit("dim_"), col("id")).as("v"))

    def timed(mk: => DataFrame): Double = {
      val reps = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      reps.min
    }
    def withSkewJoin[A](on: Boolean)(f: => A): A = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", on.toString)
      try f finally spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    }

    // shuffle_hash hint on the SMALL side: the join under test is the
    // shuffled one (un-hinted, the small side would broadcast and dodge
    // the skew entirely — at 100 TB the small side of a genuinely skewed
    // join often does NOT fit, which is exactly when salting matters),
    // and the hinted side is the BUILD side, so the 10k-row dim builds
    // the hash relation while the skewed fact streams through it
    def plainJoin = large.join(small.hint("shuffle_hash"), Seq("k"))
    def saltedJoin = Skew.saltedJoin(large, small, "k", "row_id", factor,
      smallHint = Some("shuffle_hash"))

    // strategy sanity: both joins must be ShuffledHashJoin (a silent
    // sort-merge fallback would measure the sort, not the salt)
    Seq("plain" -> plainJoin, "salted" -> saltedJoin).foreach { case (n, df) =>
      val joins = df.queryExecution.sparkPlan.toString.linesIterator
        .filter(_.contains("Join")).map(_.trim.takeWhile(_ != '[')).mkString("; ")
      System.err.println(s"[skewbench] $n join operators: $joins")
    }

    val plainSec = withSkewJoin(false)(timed(plainJoin))
    val saltedSec = withSkewJoin(false)(timed(saltedJoin))
    val plainAqeSec = withSkewJoin(true)(timed(plainJoin))

    // reducer layout: share of rows landing in the largest of `cpus`
    // hash partitions, unsalted (k) vs salted (k, salt) keys
    def maxShare(keys: Seq[org.apache.spark.sql.Column]): Double = {
      val counts = large.repartition(cpus.toInt, keys: _*)
        .groupBy(spark_partition_id().as("pid")).count()
        .collect().map(_.getAs[Long]("count"))
      counts.max.toDouble / counts.sum
    }
    val plainShare = maxShare(Seq(col("k")))
    val saltedShare = maxShare(Seq(col("k"), pmod(xxhash64(col("row_id")), lit(factor))))

    println(s"""{"metric":"skew_salted_vs_plain","rows":$n,"hot_key_share":0.5,"factor":$factor,""" +
      s""""plain_sec":$plainSec,"salted_sec":$saltedSec,"plain_aqe_skew_sec":$plainAqeSec,""" +
      s""""max_reducer_share_plain":$plainShare,"max_reducer_share_salted":$saltedShare,"cpus":$cpus}""")
    spark.stop()
  }
}
