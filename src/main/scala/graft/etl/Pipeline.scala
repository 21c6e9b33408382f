package graft.etl

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

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

  /** Table configuration (reference: config.py TableConfig).
    * `partitionColumn` opts the table into partitioned storage +
    * partition-scoped merges; a row's partition value must be stable
    * under upsert (derive it from the business key or an immutable
    * event time, or the "old" row survives in its old partition).
    */
  final case class TableSpec(
      name: String,
      strategy: Strategy,
      dependencies: Seq[String],
      keyColumns: Seq[String],
      versionColumn: Option[String] = None,
      partitionColumn: Option[String] = None)

  /** A loader produces the fresh extract for its entity; the runner owns
    * transform-order, merge and metadata (reference: BaseLoader.run).
    */
  type Extract = (SparkSession, Option[Long]) => DataFrame

  /** A period-scoped loader for targeted backfills (reference:
    * api_client.py takes `(year, round)` everywhere): given period
    * bindings like `Map("year" -> 2024, "round" -> 5)`, fetch ONLY that
    * slice of the entity — the point of the repair workflow is not
    * re-extracting the whole history to fix one round.
    */
  type ScopedExtract = (SparkSession, Map[String, Any]) => DataFrame

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

  /** Incremental merge into a PARTITIONED parquet target, rewriting only
    * the partitions `fresh` touches (dynamic partition overwrite). The
    * whole-table merge + staging swap reads and rewrites every byte of
    * the target per run — fatal once the table is 1000× the increment.
    * Here: existing rows are read ONLY from touched partitions (partition
    * pruning at the scan), merged last-write-wins with the increment, and
    * written back in overwrite-dynamic mode, which replaces exactly the
    * partition directories present in the output. Untouched partitions'
    * files are never read or rewritten. Returns the merged row count of
    * the touched partitions.
    *
    * Atomicity tradeoff vs the unpartitioned staging-swap path: dynamic
    * overwrite replaces each touched partition directory at commit, so a
    * crash mid-commit can leave a touched partition between generations
    * (untouched partitions are never at risk). Closing that window needs
    * a table format with transactional commits (Delta/Iceberg-class) —
    * the same boundary `atomicPublish` documents for multi-writer ACID.
    * The merge itself is idempotent, so rerunning the increment repairs
    * an interrupted commit.
    */
  def mergeIntoPartitioned(spark: SparkSession, targetPath: String, fresh: DataFrame,
      keys: Seq[String], version: Option[String], partitionCol: String,
      checkPartitionStability: Boolean = false): Long = {
    // touched partition values: driver-sized by construction (an
    // increment spans few coarse partitions — days, not keys)
    val touched = fresh.select(col(partitionCol)).distinct().collect().map(_.get(0))
    val exists = Files.exists(Paths.get(targetPath))
    // debug guard for the TableSpec partition-stability contract: an
    // upsert that MOVES a key to a new partition value would leave the
    // stale row alive in its old (untouched) partition — a duplicate-key
    // table. Opt-in because it scans the target's key+partition columns.
    if (checkPartitionStability && exists) {
      val moved = spark.read.parquet(targetPath)
        .select(col(partitionCol).as("__old_part") +: keys.map(col): _*)
        .join(fresh.select(col(partitionCol).as("__new_part") +: keys.map(col): _*), keys)
        .filter(col("__old_part") =!= col("__new_part"))
        .limit(1).count()
      require(moved == 0L,
        s"mergeIntoPartitioned: fresh rows change $partitionCol for existing keys; " +
          "the stale rows would survive in their old partitions (partition values " +
          "must be stable under upsert — derive them from the business key or an " +
          "immutable event time)")
    }
    val existing =
      if (exists)
        Some(spark.read.parquet(targetPath)
          .filter(col(partitionCol).isin(touched.toSeq: _*)))
      else None
    val merged = merge(existing, fresh, keys, version)
      .localCheckpoint(eager = true) // sever lineage from files being replaced
    merged.write
      .mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol)
      .parquet(targetPath)
    merged.count()
  }

  /** Thrown by extracts for non-retryable failures — the analog of the
    * reference's 4xx client errors, which its retry loop surfaces
    * immediately (/root/reference/api_client.py:71-73).
    */
  final case class FatalExtractException(message: String, cause: Throwable = null)
      extends RuntimeException(message, cause)

  /** Retry combinator for extracts (reference: api_client.py:33-84's
    * request loop): transient failures retry with exponential backoff,
    * [[FatalExtractException]] (client-error analog) does not retry.
    * `sleep` is injectable so specs run without wall-clock delays.
    */
  def withRetry(extract: Extract, maxAttempts: Int = 3,
      backoffMs: Int => Long = a => 100L << a,
      sleep: Long => Unit = Thread.sleep): Extract = (spark, since) => {
    var attempt = 0
    var out: Option[DataFrame] = None
    var lastErr: Throwable = null
    while (out.isEmpty && attempt < maxAttempts) {
      try out = Some(extract(spark, since))
      catch {
        case e: FatalExtractException => throw e
        case e: Throwable =>
          lastErr = e
          attempt += 1
          if (attempt < maxAttempts) sleep(backoffMs(attempt))
      }
    }
    out.getOrElse(throw lastErr)
  }

  /** The merge-publish seam (reference: `loaders/__init__.py:253-276`'s
    * `ON CONFLICT (key) DO UPDATE` — the loader's write side is a
    * pluggable destination, not always a parquet directory). The runner's
    * built-in paths (partitioned dynamic-overwrite, snapshot-manifest
    * commit, whole-table atomic swap) stay the default; a warehouse-bound
    * user plugs a sink that pushes the upsert down to their store (a JDBC
    * sink issues the actual ON CONFLICT statement — which is why the
    * interface hands over the FRESH increment and the spec, not a
    * pre-merged table: conflict resolution belongs to the destination).
    * Implementations own idempotence (re-publishing the same increment
    * must not duplicate) and the atomicity of their publish. Returns the
    * merged row count recorded in the sync log.
    */
  trait MergeSink {
    def publish(spec: TableSpec, fresh: DataFrame): Long
  }

  /** One table's outcome in an execution summary (reference:
    * main.py:191-237 `_process_table`'s per-table result record).
    */
  final case class TableRun(table: String, status: String, records: Long,
      durationSec: Long, error: Option[String] = None)

  /** The reference's execution summary (main.py:239-280 `_print_summary`)
    * as a RETURNED structure instead of console side effects: mode, run
    * duration, the succeeded/failed/skipped counts and the per-table
    * records/duration/error details. [[toDF]] exposes the details as one
    * frame; [[render]] reproduces the report text for CLI use.
    */
  final case class RunSummary(mode: String, durationSec: Long, details: Seq[TableRun]) {
    def processed: Int = details.size
    def succeeded: Int = details.count(_.status == "success")
    def failed: Int = details.count(_.status == "failed")
    def skipped: Int = details.count(_.status == "skipped")

    def toDF(spark: SparkSession): DataFrame = {
      import spark.implicits._
      details.map(d => (d.table, d.status, d.records, d.durationSec, d.error))
        .toDF("table", "status", "records", "duration_sec", "error")
    }

    def render: String = {
      val header = Seq(
        s"Mode: $mode",
        s"Duration: ${durationSec}s",
        s"Tables Processed: $processed",
        s"  Succeeded: $succeeded",
        s"  Failed: $failed",
        s"  Skipped: $skipped")
      val lines = details.flatMap { d =>
        Seq(f"  [${d.status}%-7s] ${d.table}%-25s | ${d.records}%6d records | ${d.durationSec}%3ds") ++
          d.error.map(e => s"     Error: $e")
      }
      val verdict = if (failed == 0) "Pipeline completed successfully"
        else "Pipeline completed with failures"
      (header ++ lines :+ verdict).mkString("\n")
    }
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

/** Freshness gating — the reference's "smart loading" decisions
  * (metadata.py:196-316 should_load + the race-since-last-sync buffer
  * check), generalized: PreSeason entities load once per period (year),
  * PostRace entities load only when an event old enough to be final
  * (bufferSec, the reference's penalty window) postdates the last sync.
  * Pure functions — the runner supplies the calendar and the clock.
  */
object Freshness {
  private def yearOf(epochSec: Long): Int =
    java.time.Instant.ofEpochSecond(epochSec).atZone(java.time.ZoneOffset.UTC).getYear

  /** Should `strategy` load now? `eventTimes` is the event calendar
    * (epoch seconds); `graceSec` re-examines events slightly older than
    * the last sync, mirroring the reference's 1-day lookback.
    */
  def shouldLoad(strategy: Pipeline.Strategy, lastSuccessAt: Option[Long], nowSec: Long,
      eventTimes: => Seq[Long], bufferSec: Long = 2 * 86400L, graceSec: Long = 86400L): Boolean =
    lastSuccessAt match {
      case None => true // never loaded
      case Some(last) => strategy match {
        case Pipeline.PreSeason => yearOf(last) < yearOf(nowSec)
        case Pipeline.PostRace =>
          val settled = eventTimes.filter(_ <= nowSec - bufferSec)
          settled.nonEmpty && settled.max > last - graceSec
      }
    }
}

/** Parquet-backed sync metadata (reference: metadata.py sync_status +
  * sync_log). Two-phase: [[startSync]] appends a `running` row before
  * work begins, [[completeSync]] appends the terminal row referencing
  * it — so a hung or crashed run is VISIBLE as a trailing `running`
  * entry instead of silently absent (reference: start_sync/complete_sync,
  * metadata.py:11-113). Tiny table; append-only. `clock` is injectable
  * for deterministic specs.
  */
final class MetadataStore(spark: SparkSession, root: String,
    clock: () => Long = () => System.currentTimeMillis() / 1000,
    io: graft.sources.StoreIO = graft.sources.PosixStoreIO) {
  import spark.implicits._

  private val logPath = s"$root/sync_log"
  private val idDir = s"$root/sync_log_ids"

  def nowSec: Long = clock()

  private def readLog(): DataFrame =
    if (Files.exists(Paths.get(logPath))) {
      // tolerate logs written before the two-phase columns existed:
      // absent columns read as null / epoch 0 instead of failing the
      // typed resolve (mergeSchema so mixed-generation files coexist)
      val raw = spark.read.option("mergeSchema", "true").parquet(logPath)
      val withRef =
        if (raw.columns.contains("refId")) raw
        else raw.withColumn("refId", lit(null).cast("long"))
      val withErr =
        if (withRef.columns.contains("error")) withRef
        else withRef.withColumn("error", lit(null).cast("string"))
      val withTs =
        if (withErr.columns.contains("syncedAt"))
          withErr.withColumn("syncedAt", coalesce(col("syncedAt"), lit(0L)))
        else withErr.withColumn("syncedAt", lit(0L))
      // full-row dedup: ONLY [[compactLog]]'s fold-then-delete overlap
      // window produces duplicates, and those are bit-identical rows —
      // distinct entries always differ in id BY CONSTRUCTION
      // ([[appendLog]] allocates ids through the StoreIO
      // create-new-or-fail primitive, so two concurrent appenders can
      // never mint the same id), so nothing real collapses
      withTs.dropDuplicates()
    } else spark.emptyDataset[MetadataStore.LogRow].toDF()

  def appendLog(entity: String, status: String, records: Long, watermark: Option[Long],
      refId: Option[Long] = None, error: Option[String] = None): Long = {
    // floor via a distributed max — never materialize the log on the
    // driver (a years-long deployment's log is one row per table-load;
    // metadata-sized, but a full driver collect per append is a wart)
    val logMax = readLog().agg(coalesce(max(col("id")), lit(0L))).as[Long].head()
    val nextId = reserveId(logMax)
    val row = MetadataStore.LogRow(nextId, entity, status, records, watermark, refId, error, clock())
    // append-only: a crash mid-write can at worst lose THIS entry; an
    // overwrite of the whole log would destroy every watermark if it died
    // between delete and commit
    Seq(row).toDS().toDF().repartition(1)
      .write.mode(SaveMode.Append).parquet(logPath)
    nextId
  }

  /** Reserve the next log id through the StoreIO create-new-or-fail
    * primitive: a bare read-max-increment lets two concurrent appenders
    * mint the same id and (when the rest of the row also matches — same
    * entity, same clock second) write bit-identical rows that
    * [[readLog]]'s dedup silently collapses to one. Racing reservations
    * lose and probe upward, so ids are unique by construction; a marker
    * whose append then crashed just burns a number. Markers at or below
    * the folded log's max are swept, age-gated, by [[compactLog]].
    * `floor` is the log's current max id (the distributed-max read).
    */
  private[graft] def reserveId(floor: Long): Long = {
    val markerMax = io.list(idDir)
      .filter(_.startsWith("id-")).map(_.stripPrefix("id-").toLong)
      .maxOption.getOrElse(0L)
    var nextId = math.max(floor, markerMax) + 1L
    while (!io.putIfAbsent(s"$idDir/id-$nextId", Array.emptyByteArray)) nextId += 1L
    nextId
  }

  /** Phase 1: record the run as in-flight; returns the log id to close. */
  def startSync(entity: String): Long =
    appendLog(entity, "running", 0L, None)

  /** Phase 2: close the in-flight row with the terminal outcome. */
  def completeSync(entity: String, logId: Long, success: Boolean, records: Long,
      watermark: Option[Long], error: Option[String] = None): Unit = {
    appendLog(entity, if (success) "success" else "failed", records, watermark, Some(logId), error)
    ()
  }

  /** Latest successful watermark per entity (reference: get_watermark). */
  def watermark(entity: String): Option[Long] =
    readLog()
      .filter(col("entity") === entity && col("status") === "success")
      .orderBy(col("id").desc).limit(1)
      .as[MetadataStore.LogRow].collect()
      .headOption.flatMap(_.watermark)

  /** Wall-clock of the last successful sync (freshness-gate input). */
  def lastSuccessAt(entity: String): Option[Long] =
    history(entity).filter(_.status == "success").lastOption.map(_.syncedAt)

  /** The entity's current state = its latest log row. A hung run shows
    * as `running` here until its terminal row lands.
    */
  def currentStatus(entity: String): Option[String] =
    history(entity).lastOption.map(_.status)

  def history(entity: String): Seq[MetadataStore.LogRow] =
    // filtered BEFORE the collect: only this entity's rows reach the
    // driver (the log itself can span every entity's full history)
    readLog().filter(col("entity") === entity)
      .as[MetadataStore.LogRow].collect().toSeq.sortBy(_.id)

  /** Fold the append-only log pile into one parquet file. Every
    * [[appendLog]] writes its own small file, so a years-long deployment
    * accumulates one file per table-load — correct but increasingly slow
    * to list and read. The fold preserves the log verbatim (same rows,
    * same ids — watermarks, history and two-phase chains unchanged) and
    * is crash-safe at every step:
    *
    *  1. stale staging dirs from crashed compactions are swept;
    *  2. the CURRENT data files are snapshotted first — appends landing
    *     during the fold write new files not in the snapshot and survive;
    *  3. the fold is written to a SIBLING staging dir (invisible to
    *     readers of the log path), then moved in under a distinct name —
    *     from that instant the log briefly holds duplicates, which
    *     readers drop ([[readLog]]'s full-row dedup), so a crash between
    *     the move and the deletes loses nothing and corrupts nothing;
    *  4. exactly the snapshotted files are deleted.
    */
  def compactLog(): Unit = {
    val dir = Paths.get(logPath)
    if (!Files.exists(dir)) return
    val parent = dir.getParent
    // stale-staging sweep: RECURSIVE (a compaction that died mid-parquet
    // -write leaves nested _temporary/attempt dirs a flat delete would
    // refuse, breaking every later compaction) and AGE-GATED on the
    // NEWEST mtime found anywhere under the staging dir — the top-level
    // dir's mtime freezes once _temporary subdirs exist, so a live
    // compaction whose parquet write stalls past the floor would read
    // as stale by the top-level stat alone and be deleted mid-write
    val cutoff = System.currentTimeMillis() - 3600_000L
    listFiles(parent)
      .filter(_.getFileName.toString.startsWith(s"${dir.getFileName}.compacting-"))
      .filter(p => newestMtime(p) <= cutoff)
      .foreach(deleteRecursively)
    val old = listFiles(dir).filter { p =>
      val n = p.getFileName.toString
      !n.startsWith("_") && !n.startsWith(".")
    }
    if (old.size <= 1) return
    val staging = parent.resolve(s"${dir.getFileName}.compacting-${System.nanoTime()}")
    val folded = readLog().localCheckpoint(true)
    folded.repartition(1).write.mode(SaveMode.Overwrite).parquet(staging.toString)
    listFiles(staging)
      .filter(_.getFileName.toString.startsWith("part-"))
      .foreach(f => Files.move(f, dir.resolve(s"compact-${System.nanoTime()}-${f.getFileName}")))
    old.foreach(Files.deleteIfExists(_))
    deleteRecursively(staging)
    // id-reservation markers at or below the folded log's max id are
    // spent (their rows are durably in the log); an age gate protects a
    // marker whose append is still in flight between reserve and write.
    // `.exists`, not `.forall`: an unreadable mtime means KEEP — a
    // transient stat failure must not age a live marker to infinity
    val maxId = folded.agg(coalesce(max(col("id")), lit(0L))).as[Long].head()
    io.list(idDir)
      .filter(_.startsWith("id-")).filter(_.stripPrefix("id-").toLong <= maxId)
      .filter(n => io.mtime(s"$idDir/$n").exists(_ <= cutoff))
      .foreach(n => io.delete(s"$idDir/$n"))
    // orphaned `.tmp-*` siblings from a StoreIO publish that crashed
    // between the temp write and its cleanup — never visible to any
    // reader, so the age floor is the only rule
    io.list(idDir).filter(_.startsWith(".tmp-"))
      .filter(n => io.mtime(s"$idDir/$n").exists(_ <= cutoff))
      .foreach(n => io.delete(s"$idDir/$n"))
  }

  /** Newest mtime anywhere under `p` (the path's own when childless).
    * An UNREADABLE stat reads as infinitely YOUNG (Long.MaxValue), so
    * the staging sweep keeps what it cannot stat — the same
    * keep-on-unknown rule every deletion age gate follows; a transient
    * failure (or a child vanishing under a live compaction) must never
    * age a directory to zero and get it swept mid-write.
    */
  private def newestMtime(p: Path): Long = {
    val own = scala.util.Try(Files.getLastModifiedTime(p).toMillis)
      .toOption.getOrElse(Long.MaxValue)
    (own +: listFiles(p).map(newestMtime)).max
  }

  private def listFiles(dir: Path): Seq[Path] =
    if (!Files.isDirectory(dir)) Seq.empty
    else {
      val s = Files.list(dir)
      try s.iterator().asScala.toSeq finally s.close()
    }

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) listFiles(p).foreach(deleteRecursively)
    Files.deleteIfExists(p)
    ()
  }

  /** The reference's `get_next_round_to_load` (metadata.py:150-190),
    * generalized to graft's Long period keys: the first calendar period
    * no successful sync has covered yet. A never-loaded entity starts at
    * the calendar's first period (the reference's "start from round 1" —
    * which also covers its season-rollover branch, since a new season's
    * absolute period keys all sort after the old watermark); a
    * mid-calendar watermark resolves to the smallest period AFTER it;
    * a watermark at or past the calendar's end returns None — the
    * scheduler loop's "all loaded, stop" signal.
    */
  def nextPeriod(entity: String, calendar: Seq[Long]): Option[Long] = {
    val sorted = calendar.distinct.sorted
    watermark(entity) match {
      case None => sorted.headOption
      case Some(w) => sorted.find(_ > w)
    }
  }
}

object MetadataStore {
  final case class LogRow(id: Long, entity: String, status: String, records: Long,
      watermark: Option[Long], refId: Option[Long] = None, error: Option[String] = None,
      syncedAt: Long = 0L)
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
    extracts: Map[String, Pipeline.Extract],
    // event calendar for freshness gating (reference: the round table);
    // None = no gating, every run loads (the pre-gating behavior)
    calendar: Option[SparkSession => Seq[Long]] = None,
    // publish unpartitioned tables through [[SnapshotTable]] manifests
    // instead of the staging-dir swap: adds multi-writer safety (two
    // runners racing the same table cannot clobber each other), version
    // history, and snapshot-isolated readers. Partitioned tables keep
    // the dynamic-partition-overwrite path either way.
    useSnapshotTables: Boolean = false,
    // period-scoped loaders for [[backfill]]; tables without one fall
    // back to the full extract filtered to the period (correct, but
    // re-fetches history — provide a scoped extract where the source
    // supports period queries, as the reference API does)
    scopedExtracts: Map[String, Pipeline.ScopedExtract] = Map.empty,
    // destination override (reference: the Postgres ON CONFLICT loaders)
    // — when set, EVERY publish (mode runs, targeted runs, backfills)
    // routes through it instead of the built-in parquet/snapshot paths;
    // extract ordering, freshness gating, watermarks and the sync log
    // are unchanged, so a migrating user keeps the orchestration and
    // swaps only the warehouse
    mergeSink: Option[Pipeline.MergeSink] = None) {

  private def targetPath(name: String) = s"$warehouseRoot/$name"

  private def snapshotTable(name: String) = new SnapshotTable(spark, targetPath(name))

  /** Does `name` publish through [[SnapshotTable]] manifests? Partitioned
    * tables never do — they merge in place via dynamic partition
    * overwrite ([[Pipeline.mergeIntoPartitioned]]) and are stored as
    * plain partitioned parquet, so their reads must not demand a
    * manifest. A table with no committed manifest yet (e.g. a legacy
    * plain-parquet table adopted into snapshot mode) also reads the
    * parquet path until its first snapshot commit.
    */
  private def readsViaSnapshot(name: String): Boolean =
    useSnapshotTables &&
      specs.find(_.name == name).forall(_.partitionColumn.isEmpty) &&
      snapshotTable(name).currentVersion.isDefined

  /** Does the table's root use the [[SnapshotTable]] on-disk layout
    * (immutable dirs under `data/`, manifests under `_manifests/`)?
    * Such a root must NEVER be read as plain recursive parquet: a
    * first commit in flight (or crashed after writeData) has staged
    * `data/d-*` dirs but no manifest, and a recursive read would pick
    * the uncommitted files up as committed state (`_manifests` is
    * underscore-filtered by the parquet reader; `data/` is not).
    */
  private def hasSnapshotLayout(name: String): Boolean = {
    val root = Paths.get(targetPath(name))
    Files.isDirectory(root.resolve("data")) ||
      Files.isDirectory(root.resolve("_manifests"))
  }

  private def readTarget(name: String): Option[DataFrame] =
    if (readsViaSnapshot(name)) Some(snapshotTable(name).read())
    else if (hasSnapshotLayout(name)) {
      // snapshot-layout root outside the snapshot read path (snapshot
      // mode off, or no committed version yet): read through the
      // manifest if one exists; a manifest-less root has no committed
      // state — staged data dirs are garbage, not a table.
      snapshotTable(name).currentVersion.map(_ => snapshotTable(name).read())
    }
    else if (Files.exists(Paths.get(targetPath(name)))) {
      Some(spark.read.parquet(targetPath(name)))
    } else None

  def table(name: String): DataFrame =
    if (readsViaSnapshot(name)) snapshotTable(name).read()
    else if (hasSnapshotLayout(name))
      snapshotTable(name).currentVersion match {
        case Some(_) => snapshotTable(name).read()
        case None => throw new IllegalStateException(
          s"table $name has a snapshot layout but no committed version — " +
            "staged (uncommitted) data is not readable table state")
      }
    else spark.read.parquet(targetPath(name))

  /** Time travel (snapshot mode only): the table as of `version`.
    * Partitioned tables merge in place (no manifest chain), so they have
    * no version history to travel to — rejected up front.
    */
  def tableAt(name: String, version: Long): DataFrame = {
    require(useSnapshotTables, "tableAt needs useSnapshotTables = true")
    require(specs.find(_.name == name).forall(_.partitionColumn.isEmpty),
      s"$name is partitioned: partitioned tables merge in place and keep no version history")
    snapshotTable(name).read(Some(version))
  }

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
    * bypasses both the watermark skip and the freshness gate (reference:
    * --force). Tables the freshness gate skips get a `skipped` audit row
    * and are absent from the returned counts. Returns per-table merged
    * record counts.
    */
  def run(strategy: Pipeline.Strategy, force: Boolean = false,
      newWatermark: Option[Long] = None): Map[String, Long] =
    orderedSpecs(strategy).flatMap(runOne(_, force, newWatermark)).toMap

  /** The mode's table specs in dependency load order — the single
    * definition [[run]] and [[runSummarized]] share.
    */
  private def orderedSpecs(strategy: Pipeline.Strategy): Seq[Pipeline.TableSpec] = {
    val selected = specs.filter(_.strategy == strategy).map(_.name).toSet
    Pipeline.loadOrder(specs).filter(selected.contains)
      .map(name => specs.find(_.name == name).get)
  }

  /** [[run]] plus the reference's execution summary (main.py:239-280):
    * per-table status/records/duration/error as a returned
    * [[Pipeline.RunSummary]]. Errors are caught PER TABLE and recorded
    * (`status = failed`) while the run CONTINUES to the next table —
    * `_process_table`'s contract (main.py:229-237) — where [[run]]
    * itself stays fail-fast. Durations come from the metadata clock, so
    * specs with an injected clock get deterministic summaries.
    */
  def runSummarized(strategy: Pipeline.Strategy, force: Boolean = false,
      newWatermark: Option[Long] = None): Pipeline.RunSummary = {
    val t0 = metadata.nowSec
    val mode = strategy match {
      case Pipeline.PreSeason => "pre_season"
      case Pipeline.PostRace => "post_race"
    }
    val details = orderedSpecs(strategy).map { spec =>
      val s0 = metadata.nowSec
      try {
        runOne(spec, force, newWatermark) match {
          case Some((_, n)) => Pipeline.TableRun(spec.name, "success", n, metadata.nowSec - s0)
          case None => Pipeline.TableRun(spec.name, "skipped", 0L, metadata.nowSec - s0)
        }
      } catch {
        case e: Exception =>
          Pipeline.TableRun(spec.name, "failed", 0L, metadata.nowSec - s0,
            Option(e.getMessage).orElse(Some(e.getClass.getName)))
      }
    }
    Pipeline.RunSummary(mode, metadata.nowSec - t0, details)
  }

  /** Targeted single-table run (reference: main.py run_table / --table):
    * same extract→merge→publish→metadata path, one entity, no mode
    * filter. Returns the merged count, or None if the freshness gate
    * skipped it.
    */
  def runTable(name: String, force: Boolean = false,
      newWatermark: Option[Long] = None): Option[Long] = {
    val spec = specs.find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(s"unknown table $name"))
    runOne(spec, force, newWatermark).map(_._2)
  }

  /** Year/round-scoped targeted backfill (reference: main.py's
    * `run_table(table_name, year, round_num)` repair workflow): re-sync
    * ONE period slice of one table, leaving every other row AND the
    * watermark untouched. `period` binds period columns to values, e.g.
    * `Map("year" -> 2024, "round" -> 5)`.
    *
    * The scoped extract (or, failing that, the full extract filtered to
    * the period) produces the slice; rows OUTSIDE the period are dropped
    * defensively before the merge, so a buggy scoped extract can never
    * clobber history it was not asked to repair. The merge itself is the
    * normal last-write-wins upsert on the business key — same semantics
    * as the reference's ON CONFLICT DO UPDATE re-load of a round. The
    * sync log records the run; the watermark is left unchanged (a repair
    * is not forward progress). "Unchanged" is read at COMPLETION time,
    * not captured up front: a concurrent incremental run may legitimately
    * advance the watermark while the backfill merges, and re-asserting a
    * pre-backfill snapshot would silently roll that advance back (benign
    * only because merges are idempotent — but it forces the next
    * incremental to re-extract the increment).
    */
  def backfill(name: String, period: Map[String, Any]): Long =
    runSlice(name, period, advanceTo = None)

  /** One scheduler step over a period calendar (the reference's
    * `get_next_round_to_load` docstring loop, metadata.py:159-163:
    * resolve the next round, fetch exactly that round, repeat): the
    * first `periods` entry past the watermark is extracted as a
    * `periodColumn`-bound slice (scoped extract when one exists, the
    * backfill path), merged, and — unlike [[backfill]], which repairs
    * history without touching sync state — the watermark ADVANCES to
    * the loaded period, so the next call resolves the period after it.
    * Returns (period, mergedCount); None = calendar exhausted, the
    * loop's stop signal:
    * {{{
    * var step = runner.runNextPeriod("fact_results", rounds, "round")
    * while (step.isDefined) step = runner.runNextPeriod("fact_results", rounds, "round")
    * }}}
    */
  def runNextPeriod(name: String, periods: Seq[Long],
      periodColumn: String): Option[(Long, Long)] =
    metadata.nextPeriod(name, periods).map { p =>
      p -> runSlice(name, Map(periodColumn -> p), advanceTo = Some(p))
    }

  /** Shared body of [[backfill]] and [[runNextPeriod]]: extract one
    * period slice, merge-publish it, close the sync-log entry.
    * `advanceTo` distinguishes the two callers' watermark semantics —
    * a repair leaves the watermark untouched, a scheduler step moves it.
    */
  private def runSlice(name: String, period: Map[String, Any],
      advanceTo: Option[Long]): Long = {
    val spec = specs.find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(s"unknown table $name"))
    require(period.nonEmpty, "a period slice needs at least one binding")
    val logId = metadata.startSync(name)
    try {
      val slice = period.map { case (c, v) => col(c) === lit(v) }.reduce(_ && _)
      val extracted = scopedExtracts.get(name) match {
        case Some(scoped) => scoped(spark, period)
        case None => extracts(name)(spark, None)
      }
      val fresh = extracted.filter(slice)
      val n = mergeAndPublish(spec, fresh)
      metadata.completeSync(name, logId, success = true, n,
        advanceTo.orElse(metadata.watermark(name)))
      n
    } catch {
      case e: Exception =>
        metadata.completeSync(name, logId, success = false, 0L, metadata.watermark(name),
          Option(e.getMessage))
        throw e
    }
  }

  /** The shared merge→publish tail of [[runOne]] and [[backfill]]:
    * partitioned tables merge in place per touched partition; snapshot
    * tables commit a read-modify-write version; plain tables merge whole
    * and swap atomically. Returns the merged row count (touched
    * partitions for partitioned tables, full table otherwise).
    */
  private def mergeAndPublish(spec: Pipeline.TableSpec, fresh: DataFrame): Long =
    mergeSink match {
      case Some(sink) => sink.publish(spec, fresh)
      case None => builtinPublish(spec, fresh)
    }

  private def builtinPublish(spec: Pipeline.TableSpec, fresh: DataFrame): Long =
    spec.partitionColumn match {
      case Some(pc) =>
        Pipeline.mergeIntoPartitioned(spark, targetPath(spec.name), fresh,
          spec.keyColumns, spec.versionColumn, pc)
      case None =>
        if (useSnapshotTables) {
          // read-modify-write: on a version conflict with a racing
          // runner, the merge re-derives against the winner's fresh
          // snapshot — neither runner's increment is lost
          val (_, published) = snapshotTable(spec.name).overwriteWith(existing =>
            Pipeline.merge(existing, fresh, spec.keyColumns, spec.versionColumn))
          published.count()
        } else {
          val merged = Pipeline.merge(readTarget(spec.name), fresh, spec.keyColumns, spec.versionColumn)
            .localCheckpoint(eager = true) // sever lineage from the file being replaced
          atomicPublish(merged, spec.name)
          merged.count()
        }
    }

  private def runOne(spec: Pipeline.TableSpec, force: Boolean,
      newWatermark: Option[Long]): Option[(String, Long)] = {
    val name = spec.name
    val since = if (force) None else metadata.watermark(name)
    val fresh0 = calendar match {
      case Some(cal) if !force =>
        Freshness.shouldLoad(spec.strategy, metadata.lastSuccessAt(name), metadata.nowSec, cal(spark))
      case _ => true
    }
    if (!fresh0) {
      metadata.appendLog(name, "skipped", 0L, since)
      None
    } else {
      val logId = metadata.startSync(name)
      try {
        val fresh = extracts(name)(spark, since)
        val n = mergeAndPublish(spec, fresh)
        metadata.completeSync(name, logId, success = true, n, newWatermark.orElse(since))
        Some(name -> n)
      } catch {
        case e: Exception =>
          metadata.completeSync(name, logId, success = false, 0L, since,
            Option(e.getMessage))
          throw e
      }
    }
  }
}
