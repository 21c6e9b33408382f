package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Local testing runs `local[32]` in one JVM; the configs below are the
  * ones that carry to a real cluster: AQE (runtime re-planning + skew-join
  * handling), a broadcast threshold sized for dimension tables, and UTC
  * session time so event-time semantics are stable across executors.
  */
object GraftSession {
  /** `shufflePartitions` is the AQE coalesce FLOOR (and the static plan
    * width when AQE can't apply); `initialPartitions` is where every
    * shuffle STARTS before AQE coalesces — sized well above the core
    * count so a heavy partial aggregation (the declared Σdf² ground-truth
    * ops at sf1+) spreads its spill across many small sorters instead of
    * starving at 32 fixed partitions, while small inputs coalesce
    * straight back down to the floor. On a real cluster, scale
    * `initialPartitions` with input splits (rule of thumb: total input
    * bytes / 128 MB, min 2× total cores) — it is the one knob here that
    * must grow with data volume.
    */
  def builder(master: String = "local[32]", shufflePartitions: Int = 32,
      initialPartitions: Int =
        sys.env.getOrElse("SPARK_GRAFT_INIT_PARTITIONS", "256").toInt): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        math.max(initialPartitions, shufflePartitions).toString)
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // OFF for correctness: when ON (the 4.x default), UnionExec
      // reports its children's common partitioning, and a keyed
      // aggregate over a union of SAME-BUCKETED scans skips its
      // exchange. The claim is honored on the row path (same-index
      // partitions zip) but NOT on the COLUMNAR path (partitions
      // concatenate while still claiming clustering) — a columnar
      // union of two co-bucketed tables + groupBy on the bucket key
      // returns per-child partials as final rows (reproduced on
      // 4.1.2: two 4-bucket tables sharing key h=1 → groupBy(h) emits
      // h=1 twice). Every segmented-store fold/probe unions
      // co-bucketed generations, so this library cannot run with the
      // optimization on; the exchanges it legitimately saved (dfT over
      // filtered postings unions) return, priced into the audited
      // plans.
      .config("spark.sql.unionOutputPartitioning", "false")
      .config("spark.ui.enabled", "false")

  /** Create (or reuse) a session and register graft SQL functions. */
  def getOrCreate(master: String = "local[32]"): SparkSession = {
    val spark = builder(master).getOrCreate()
    functions.GraftFunctions.registerAll(spark)
    spark
  }
}
