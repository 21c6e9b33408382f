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
  def builder(master: String = "local[32]", shufflePartitions: Int = 32): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  /** Create (or reuse) a session and register graft SQL functions. */
  def getOrCreate(master: String = "local[32]"): SparkSession = {
    val spark = builder(master).getOrCreate()
    functions.GraftFunctions.registerAll(spark)
    spark
  }
}
