package graft.etl

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ETL orchestration — the Spark-first re-expression of the reference's
  * pipeline surface (/root/reference/main.py, metadata.py,
  * loaders/base_loader.py): dependency-ordered table loads in two modes
  * (pre-season bulk / post-race incremental), watermark-based skip
  * logic, idempotent merge into the warehouse, and a sync audit log.
  *
  * Differences from the reference are deliberate Spark-isms: the
  * warehouse is parquet directories (not Postgres rows), the merge is a
  * window dedup (not per-row ON CONFLICT), and the metadata store is
  * itself a small parquet table — everything scales by partitioning, and
  * nothing iterates rows on the driver.
  */
object Pipeline {

  sealed trait Strategy
  case object PreSeason extends Strategy
  case object PostRace extends Strategy

  /** Table configuration (reference: config.py TableConfig). */
  final case class TableSpec(
      name: String,
      strategy: Strategy,
      dependencies: Seq[String],
      keyColumns: Seq[String],
      versionColumn: Option[String] = None)

  /** A loader produces the fresh extract for its entity; the runner owns
    * transform-order, merge and metadata (reference: BaseLoader.run).
    */
  type Extract = (SparkSession, Option[Long]) => DataFrame

  /** Resolve a dependency-respecting load order (reference: main.py's
    * manual ordering; here an explicit deterministic topo sort).
    */
  def loadOrder(specs: Seq[TableSpec]): Seq[String] = {
    val byName = specs.map(s => s.name -> s).toMap
    val visiting = scala.collection.mutable.LinkedHashSet.empty[String]
    val done = scala.collection.mutable.LinkedHashSet.empty[String]
    def visit(n: String): Unit = {
      if (done.contains(n)) return
      require(!visiting.contains(n), s"dependency cycle at $n")
      visiting += n
      byName.get(n).toSeq.flatMap(_.dependencies).sorted.foreach(visit)
      visiting -= n
      done += n
    }
    specs.map(_.name).sorted.foreach(visit)
    done.toSeq.filter(byName.contains)
  }

  /** Idempotent merge: last-write-wins per business key — the distributed
    * form of `INSERT ... ON CONFLICT (key) DO UPDATE`
    * (/root/reference/loaders/__init__.py:253-276). One shuffle on the
    * key; existing rows only for the touched keys move. At warehouse
    * scale the target would be partitioned and only affected partitions
    * rewritten (dynamic partition overwrite).
    */
  def merge(existing: Option[DataFrame], fresh: DataFrame, keys: Seq[String],
      version: Option[String]): DataFrame = {
    val unioned = existing match {
      case Some(e) =>
        // old rows rank behind fresh rows at equal version
        e.withColumn("__gen", lit(0)).unionByName(fresh.withColumn("__gen", lit(1)), allowMissingColumns = true)
      case None => fresh.withColumn("__gen", lit(1))
    }
    val ordering = (version.map(col(_).desc_nulls_last).toSeq :+ col("__gen").desc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering: _*)
    unioned
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__gen")
  }
}

/** Parquet-backed sync metadata (reference: metadata.py sync_status +
  * sync_log). Tiny table, rewritten whole — the audit log is append-only
  * in spirit and kept bounded by the runner.
  */
final class MetadataStore(spark: SparkSession, root: String) {
  import spark.implicits._

  private val logPath = s"$root/sync_log"

  private def readLog(): DataFrame =
    if (Files.exists(Paths.get(logPath))) spark.read.parquet(logPath)
    else spark.emptyDataset[MetadataStore.LogRow].toDF()

  def appendLog(entity: String, status: String, records: Long, watermark: Option[Long]): Unit = {
    val prior = readLog().as[MetadataStore.LogRow].collect().toSeq
    val nextId = if (prior.isEmpty) 1L else prior.map(_.id).max + 1
    val row = MetadataStore.LogRow(nextId, entity, status, records, watermark)
    // append-only: a crash mid-write can at worst lose THIS entry; an
    // overwrite of the whole log would destroy every watermark if it died
    // between delete and commit
    Seq(row).toDS().toDF().repartition(1)
      .write.mode(SaveMode.Append).parquet(logPath)
  }

  /** Latest successful watermark per entity (reference: get_watermark). */
  def watermark(entity: String): Option[Long] = {
    val rows = readLog().as[MetadataStore.LogRow]
      .filter(r => r.entity == entity && r.status == "success")
      .collect()
    rows.sortBy(_.id).lastOption.flatMap(_.watermark)
  }

  def history(entity: String): Seq[MetadataStore.LogRow] =
    readLog().as[MetadataStore.LogRow].collect().toSeq.filter(_.entity == entity).sortBy(_.id)
}

object MetadataStore {
  final case class LogRow(id: Long, entity: String, status: String, records: Long, watermark: Option[Long])
}

/** The orchestrator (reference: main.py run loop). Warehouse tables are
  * parquet dirs under `warehouseRoot`; each run is
  * extract → merge → write → metadata, in dependency order.
  */
final class PipelineRunner(
    spark: SparkSession,
    warehouseRoot: String,
    metadata: MetadataStore,
    specs: Seq[Pipeline.TableSpec],
    extracts: Map[String, Pipeline.Extract]) {

  private def targetPath(name: String) = s"$warehouseRoot/$name"

  private def readTarget(name: String): Option[DataFrame] =
    if (Files.exists(Paths.get(targetPath(name)))) Some(spark.read.parquet(targetPath(name))) else None

  def table(name: String): DataFrame = spark.read.parquet(targetPath(name))

  /** Atomic publish: write the merged result to a staging dir, then swap
    * it into place with filesystem renames. A crash mid-write leaves the
    * old table intact (the staging dir is garbage, not the target) —
    * single-writer atomicity without a table format; multi-writer ACID
    * is a Delta/Iceberg-class concern, out of scope.
    */
  private def atomicPublish(df: DataFrame, name: String): Unit = {
    val target = Paths.get(targetPath(name))
    val staging = Paths.get(s"${targetPath(name)}.staging-${System.nanoTime()}")
    df.write.mode(SaveMode.Overwrite).parquet(staging.toString)
    val retired = Paths.get(s"${targetPath(name)}.retired-${System.nanoTime()}")
    if (Files.exists(target)) Files.move(target, retired, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    Files.move(staging, target, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    // old generation removed only after the swap succeeded
    if (Files.exists(retired)) {
      def rm(f: java.io.File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete() }
      rm(retired.toFile)
    }
  }

  /** Run one mode (reference: --mode pre_season|post_race). `force`
    * bypasses the watermark skip (reference: --force). Returns per-table
    * merged record counts.
    */
  def run(strategy: Pipeline.Strategy, force: Boolean = false,
      newWatermark: Option[Long] = None): Map[String, Long] = {
    val selected = specs.filter(_.strategy == strategy).map(_.name).toSet
    val ordered = Pipeline.loadOrder(specs).filter(selected.contains)
    ordered.map { name =>
      val spec = specs.find(_.name == name).get
      val since = if (force) None else metadata.watermark(name)
      try {
        val fresh = extracts(name)(spark, since)
        val merged = Pipeline.merge(readTarget(name), fresh, spec.keyColumns, spec.versionColumn)
          .localCheckpoint(eager = true) // sever lineage from the file being replaced
        atomicPublish(merged, name)
        val n = merged.count()
        metadata.appendLog(name, "success", n, newWatermark.orElse(since))
        name -> n
      } catch {
        case e: Exception =>
          metadata.appendLog(name, "failed", 0L, since)
          throw e
      }
    }.toMap
  }
}
