package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet readers for the testdata star schema.
  *
  * Each accessor is a plain `spark.read.parquet` so Catalyst owns column
  * pruning and predicate pushdown — callers `.select`/`.filter` and the
  * scan reads only what the plan needs (verify via `PushedFilters` /
  * `ReadSchema` in `.explain("formatted")`).
  *
  * At 100 TB the fact tables (`lineitem`, `events`) would be
  * date-partitioned directories; the same `read.parquet(dir)` picks up
  * partition pruning for free. The small dimensions are broadcast-sized
  * by design (mirrors the reference's in-memory FK lookup maps,
  * `/root/reference/loaders/base_loader.py:176-211`, distributed-safe).
  */
final class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame = t("region")
  def nation: DataFrame = t("nation")
  def customer: DataFrame = t("customer")
  def supplier: DataFrame = t("supplier")
  def part: DataFrame = t("part")
  def orders: DataFrame = t("orders")
  def lineitem: DataFrame = t("lineitem")
  /** events with `ts` exactly as stored — microsecond timestamp in
    * current testdata; raw INT64 nanoseconds (LongType, via
    * `spark.sql.legacy.parquet.nanosAsLong=true`) in legacy drops. For
    * operators that need parquet filter pushdown on event time: the
    * predicate must be written in the stored domain (a comparison through
    * a conversion expression cannot push to the scan).
    */
  def eventsRaw: DataFrame = t("events")

  def events: DataFrame = {
    val raw = t("events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integer DIV, not `/`: float division of ~2^60 ns values loses
        // the low bits (double ulp at that magnitude is 256 ns) and can
        // shift boundary-aligned timestamps by 1us
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            org.apache.spark.sql.functions.expr("ts DIV 1000")))
      case _ => raw
    }
  }
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {
  def apply(spark: SparkSession, dir: String): Tables = new Tables(spark, dir)
}
