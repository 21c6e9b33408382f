package graft.etl

import java.nio.file.{Files, Path, Paths, StandardOpenOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Version-conflict signal for optimistic commits: the table advanced
  * between snapshot resolution and manifest publication. Callers re-read
  * the fresh snapshot and retry (what [[SnapshotTable.commitRetry]] does).
  */
final case class VersionConflictException(expected: Long)
  extends RuntimeException(s"snapshot version $expected was superseded by a concurrent commit")

/** A minimal snapshot-isolated table format — the multi-writer upgrade of
  * [[PipelineRunner]]'s single-writer staging swap, re-expressing at file
  * level what Delta/Iceberg-class formats do with transaction logs:
  *
  *  - data files are IMMUTABLE parquet directories under `root/data/`;
  *    a write never mutates an existing file
  *  - table state is a chain of manifests `root/_manifests/v{N}`; each
  *    lists exactly the data directories visible at that version
  *  - a commit is an ATOMIC create-new of manifest N+1 (hard-link
  *    publish: `link(2)` fails with EEXIST if the version was taken) —
  *    so of two racing writers exactly ONE wins; the loser sees
  *    [[VersionConflictException]], re-reads the new snapshot and
  *    reapplies its change (optimistic concurrency, no locks)
  *  - readers resolve a manifest once and then read only immutable
  *    files: every query sees one consistent snapshot regardless of
  *    concurrent commits (snapshot isolation); older versions stay
  *    readable (time travel) until explicitly vacuumed
  *
  * The scheme needs only atomic create-new and immutable files, both of
  * which object stores provide (conditional PUT), so the layout ports to
  * S3/GCS-class storage unchanged. Reference analog: the sync metadata +
  * idempotent loads of /root/reference/metadata.py, hardened for
  * concurrent writers.
  */
final class SnapshotTable(spark: SparkSession, root: String) {

  final case class Snapshot(version: Long, dirs: Seq[String])

  private val manifestDir = Paths.get(root, "_manifests")
  private val dataDir = Paths.get(root, "data")

  private def manifestPath(v: Long): Path = manifestDir.resolve(f"v$v%012d")

  private def listVersions(): Seq[Long] =
    if (!Files.isDirectory(manifestDir)) Seq.empty
    else Files.list(manifestDir).iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.startsWith("v"))
      .map(_.drop(1).toLong)
      .toSeq.sorted

  def currentVersion: Option[Long] = listVersions().lastOption

  /** Resolve one immutable snapshot (latest, or a pinned older version). */
  def snapshot(version: Option[Long] = None): Option[Snapshot] = {
    val v = version.orElse(currentVersion)
    v.map { ver =>
      val lines = Files.readAllLines(manifestPath(ver)).asScala.toSeq
      Snapshot(ver, lines.filter(_.nonEmpty))
    }
  }

  /** Read the table at a snapshot. Every file in the manifest is
    * immutable, so the returned DataFrame is stable under concurrent
    * commits — snapshot isolation without any read lock.
    */
  def read(version: Option[Long] = None): DataFrame = {
    val snap = snapshot(version)
      .getOrElse(throw new IllegalStateException(s"no committed version at $root"))
    if (snap.dirs.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(snap.dirs.map(d => dataDir.resolve(d).toString): _*)
  }

  /** Write `df` as a new immutable data directory; returns its name.
    * Not yet visible — only a committed manifest publishes it.
    */
  private def writeData(df: DataFrame): String = {
    val name = s"d-${java.util.UUID.randomUUID().toString.take(18)}"
    df.write.parquet(dataDir.resolve(name).toString)
    name
  }

  /** Publish `dirs` as version `expected + 1` (expected = -1 for the
    * first commit). Atomic: the manifest is fully written to a temp file
    * first, then hard-linked into its versioned name — `link` is
    * create-new-or-EEXIST, so a concurrent commit of the same version
    * loses deterministically and no reader ever sees a partial manifest.
    */
  def tryCommit(expected: Long, dirs: Seq[String]): Long = {
    Files.createDirectories(manifestDir)
    val tmp = manifestDir.resolve(s".tmp-${java.util.UUID.randomUUID()}")
    Files.write(tmp, dirs.mkString("\n").getBytes("UTF-8"),
      StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
    val target = manifestPath(expected + 1)
    try {
      Files.createLink(target, tmp)
      expected + 1
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw VersionConflictException(expected)
    } finally {
      Files.deleteIfExists(tmp)
    }
  }

  /** Optimistic-retry commit: `change` maps the current dir list to the
    * new one; on conflict the FRESH snapshot is re-read and the change
    * reapplied — writers compose instead of clobbering. Data files are
    * written once and reused across attempts (they are invisible until a
    * manifest names them, so a lost race leaks nothing into readers).
    */
  private def commitRetry(dataDirName: String, change: (Seq[String], String) => Seq[String],
      maxAttempts: Int = 10): Long = {
    var attempt = 0
    while (true) {
      val snap = snapshot()
      val expected = snap.map(_.version).getOrElse(-1L)
      val dirs = change(snap.map(_.dirs).getOrElse(Seq.empty), dataDirName)
      try return tryCommit(expected, dirs)
      catch {
        case VersionConflictException(_) =>
          attempt += 1
          if (attempt >= maxAttempts)
            throw new IllegalStateException(s"commit lost $maxAttempts races at $root")
      }
    }
    -1L // unreachable
  }

  /** Append `df` as a new data directory (existing data untouched). */
  def append(df: DataFrame): Long = commitRetry(writeData(df), (old, d) => old :+ d)

  /** Replace the table contents with `df` at the next version. */
  def overwrite(df: DataFrame): Long = commitRetry(writeData(df), (_, d) => Seq(d))

  /** Drop data directories no committed manifest references and
    * manifests older than `keepVersions` — the maintenance step that
    * bounds storage. Never touches dirs reachable from a kept manifest,
    * so concurrent readers of kept versions are safe.
    */
  def vacuum(keepVersions: Int = 2): Unit = {
    val versions = listVersions()
    val drop = versions.dropRight(keepVersions)
    val keep = versions.takeRight(keepVersions)
    val live = keep.flatMap(v => snapshot(Some(v)).map(_.dirs).getOrElse(Seq.empty)).toSet
    drop.foreach(v => Files.deleteIfExists(manifestPath(v)))
    if (Files.isDirectory(dataDir)) {
      Files.list(dataDir).iterator().asScala
        .filter(p => !live.contains(p.getFileName.toString))
        .foreach { p =>
          def rm(f: java.io.File): Unit = { if (f.isDirectory) f.listFiles().foreach(rm); f.delete() }
          rm(p.toFile)
        }
    }
  }
}
