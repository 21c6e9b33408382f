package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed warehouse tables — the co-located-join layout. Writing both
  * sides of a frequently-joined pair `bucketBy(n, key)` pins an
  * identical hash partitioning on disk, so every subsequent join reads
  * co-bucketed files and skips the shuffle entirely (plan shows no
  * Exchange on either side). At 100 TB this converts the nightly
  * fact⋈fact join from a full-network shuffle into a local merge.
  *
  * Bucketed tables live in the session catalog (`saveAsTable`); the
  * bucket count should match `spark.sql.shuffle.partitions` at write
  * time so downstream aggregations can also reuse the clustering.
  */
object Warehouse {

  /** Write `df` as a bucketed+sorted catalog table. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
