package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.{bloom_build, bloom_hits}

/** Runtime-filter benchmark main: measures q28's Bloom semi-join
  * prefilter against the plain shuffle join on a synthetic where the
  * build side selects ~2% of the fact's keys but is itself too large to
  * broadcast at cluster scale (modeled by disabling auto-broadcast, the
  * honest at-scale condition — when the build side DOES fit, broadcast
  * wins and the bloom is redundant; that config is measured too).
  *
  * Three measured configs, each best-of-2 to a noop sink:
  *  - plain shuffle join, broadcast off (the at-scale bottleneck)
  *  - bloom-prefiltered shuffle join, broadcast off (what the 128 KiB
  *    filter buys: only ~2% of fact rows enter the exchange)
  *  - plain join, broadcast on (the small-build-side alternative)
  *
  * Also reports fact rows entering the join exchange, plain vs
  * prefiltered, and the filter's measured false-positive admission.
  * Prints ONE JSON line; RFJOINBENCH.md records a quiet run.
  */
object RfBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = sys.env.getOrElse("SPARK_GRAFT_RF_ROWS", "20000000").toLong
    val nKeys = 2000000L
    val sel = 50L // build side keeps every 50th key → 2%
    val nbits = 1 << 20
    val kProbes = 4
    val spark = GraftSession.builder(s"local[$cpus]", shufflePartitions = cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // fact: uniform keys, 60-byte payload so exchange bytes are realistic
    def fact: DataFrame = spark.range(0, n)
      .select(pmod(col("id"), lit(nKeys)).as("k"),
        concat(lit("payload-" * 7), col("id")).as("payload"))
    // build side MATERIALIZED to parquet and read back: an inline
    // `range.filter(id % 50 = 0)` leaks its selectivity through
    // InferFiltersFromConstraints (the predicate transfers across the
    // join key and prefilters the fact for free — found by this bench's
    // own shuffle accounting); a table scan models the real case, where
    // the selection (e.g. "customers of one nation") is not derivable
    // from the fact's key
    val buildPath = s"/tmp/graft_rfbench_build_$nKeys"
    spark.range(0, nKeys).filter(col("id") % sel === 0)
      .select(col("id").as("k"), concat(lit("dim_"), col("id")).as("v"))
      .write.mode("overwrite").parquet(buildPath)
    def build: DataFrame = spark.read.parquet(buildPath)

    // shuffle accounting: the currency that matters on a real network.
    // Local shuffle here is page-cached and CPU-cheap, so wall times
    // understate the prefilter's value — bytes/records written to the
    // exchange are the honest at-scale measure and are exact.
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    val shuffleRecords = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shuffleRecords.addAndGet(m.shuffleWriteMetrics.recordsWritten)
        }
      }
    })
    def measured(mk: => DataFrame): (Double, Long, Long) = {
      val secs = (1 to 2).map { i =>
        if (i == 2) { shuffleBytes.set(0); shuffleRecords.set(0) }
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      Thread.sleep(500) // listener events post async; let the bus drain
      (secs.min, shuffleBytes.get, shuffleRecords.get)
    }
    def withBroadcast[A](on: Boolean)(f: => A): A = {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold",
        if (on) (64L * 1024 * 1024).toString else "-1")
      try f finally
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
    }

    val filterBytes = build.agg(bloom_build(col("k"), nbits, kProbes).as("f"))
      .collect()(0).getAs[Array[Byte]](0)
    def pre = fact.filter(bloom_hits(array(col("k")), filterBytes.toSeq) === 1)

    // both strategies a big-big join actually plans: sort-merge (the
    // default for two large sides — pays a SORT of every surviving fact
    // row, so prefiltering cuts its dominant term) and shuffled-hash
    // (pays shuffle bytes only)
    def plainSmj = fact.join(build.hint("merge"), Seq("k"))
    def rfSmj = pre.join(build.hint("merge"), Seq("k"))
    def plainShj = fact.join(build.hint("shuffle_hash"), Seq("k"))
    def rfShj = pre.join(build.hint("shuffle_hash"), Seq("k"))

    // strategy sanity: both joins must plan the hinted strategy (a
    // silent broadcast conversion would measure nothing)
    withBroadcast(false)(Seq("plain_smj" -> plainSmj, "rf_smj" -> rfSmj,
      "plain_shj" -> plainShj, "rf_shj" -> rfShj).foreach { case (n, df) =>
      val joins = df.queryExecution.sparkPlan.toString.linesIterator
        .filter(_.contains("Join")).map(_.trim.takeWhile(_ != '[')).mkString("; ")
      System.err.println(s"[rfbench] $n join operators: $joins")
    })

    val (plainSmjSec, plainSmjBytes, plainSmjRecs) = withBroadcast(false)(measured(plainSmj))
    val (rfSmjSec, rfSmjBytes, rfSmjRecs) = withBroadcast(false)(measured(rfSmj))
    val (plainShjSec, _, _) = withBroadcast(false)(measured(plainShj))
    val (rfShjSec, _, _) = withBroadcast(false)(measured(rfShj))
    val (bcastSec, _, _) = withBroadcast(true)(measured(fact.join(build, Seq("k"))))

    val factRows = n
    val admitted = pre.count()
    val trueMatches = n / sel // every 50th key, uniform fact
    println(s"""{"metric":"rf_join_vs_plain","rows":$n,"build_keys":${nKeys / sel},""" +
      s""""selectivity":${1.0 / sel},"nbits":$nbits,"k":$kProbes,""" +
      s""""plain_smj_sec":$plainSmjSec,"rf_smj_sec":$rfSmjSec,""" +
      s""""plain_shj_sec":$plainShjSec,"rf_shj_sec":$rfShjSec,"broadcast_sec":$bcastSec,""" +
      s""""plain_smj_shuffle_bytes":$plainSmjBytes,"rf_smj_shuffle_bytes":$rfSmjBytes,""" +
      s""""plain_smj_shuffle_records":$plainSmjRecs,"rf_smj_shuffle_records":$rfSmjRecs,""" +
      s""""fact_rows":$factRows,"admitted_rows":$admitted,"true_match_rows":$trueMatches,""" +
      s""""false_positive_rate":${(admitted - trueMatches).toDouble / (factRows - trueMatches)},""" +
      s""""cpus":$cpus}""")
    spark.stop()
  }
}
