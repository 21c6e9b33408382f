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

  /** Drop a table AND its on-disk location: the in-memory catalog
    * forgets across JVMs but the warehouse dir persists, and
    * `saveAsTable` refuses to overwrite an orphaned location. The
    * location is resolved from the catalog while the table still
    * exists (covers external/custom-location tables); the fallback for
    * already-orphaned dirs uses the warehouse-dir convention with the
    * LOWERCASED name (the catalog lowercases managed-table dirs).
    */
  def drop(spark: SparkSession, name: String): Unit = {
    val catalogLoc: Option[java.io.File] =
      if (spark.catalog.tableExists(name))
        scala.util.Try(new java.net.URI(
          spark.sql(s"DESCRIBE EXTENDED $name")
            .filter(org.apache.spark.sql.functions.col("col_name") === "Location")
            .collect()(0).getString(1))).toOption
          .filter(u => u.getScheme == null || u.getScheme == "file")
          .map(u => new java.io.File(u.getPath))
      else None
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val loc = catalogLoc.getOrElse(new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
      name.toLowerCase(java.util.Locale.ROOT)))
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    if (loc.exists()) rm(loc)
  }
}
