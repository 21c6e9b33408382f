package graft.sources

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

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

  /** The bucket count a table was written with, from catalog metadata
    * (None for unbucketed/unknown) — appenders derive the base build's
    * layout from this instead of trusting a caller-repeated parameter.
    */
  def bucketCount(spark: SparkSession, name: String): Option[Int] =
    scala.util.Try(
      spark.sql(s"DESCRIBE EXTENDED $name")
        .filter(org.apache.spark.sql.functions.col("col_name") === "Num Buckets")
        .head().getString(1).trim.toInt).toOption

  // ---------------------------------------------------------------------
  // Store generations — atomic publish for multi-table bucketed stores.
  //
  // A persisted dedup store is a SET of bucketed tables rebuilt together
  // once per corpus generation. Rebuild-in-place (SaveMode.Overwrite +
  // drop) would let an ingest probe racing the rebuild read a dropped or
  // half-written table. Instead each build writes to fresh
  // generation-suffixed tables (`<store>__g<N>_<suffix>`) and then
  // publishes N via an atomic marker-file create — the same
  // create-new-or-fail primitive SnapshotTable's manifest commit uses —
  // so probes resolve a generation ONCE at plan construction and read
  // its immutable tables regardless of concurrent rebuilds. Old
  // generations stay readable until explicitly vacuumed.
  //
  // Marker layout (under the warehouse dir, beside the tables):
  //   _generations/<store>/claim-N  — a builder owns generation N
  //                                   (exclusive create; racing builders
  //                                   get distinct numbers)
  //   _generations/<store>/ready-N  — generation N's tables are complete
  //                                   and visible to probes
  // currentGeneration = max ready N. A build that fails (or trips a
  // guard) leaves a burned claim with no ready marker — invisible to
  // probes, cleaned by vacuum.
  // ---------------------------------------------------------------------

  private def warehousePath(spark: SparkSession): String =
    spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")

  private def genDir(spark: SparkSession, store: String): Path =
    Paths.get(warehousePath(spark), "_generations", store.toLowerCase(java.util.Locale.ROOT))

  private def listGens(dir: Path, prefix: String): Seq[Long] =
    if (!Files.isDirectory(dir)) Seq.empty
    else {
      val s = Files.list(dir)
      try s.iterator().asScala.toSeq.map(_.getFileName.toString)
        .filter(_.startsWith(prefix)).map(_.stripPrefix(prefix).toLong).sorted
      finally s.close()
    }

  /** The generation-suffixed concrete table name. */
  def storeTableName(store: String, gen: Long, suffix: String): String =
    s"${store}__g${gen}_$suffix"

  /** Claim the next free generation number for `store` (atomic
    * create-new of the claim marker: of two racing builders each gets
    * its own number). The claimed generation is invisible to probes
    * until [[publishGeneration]].
    */
  def claimGeneration(spark: SparkSession, store: String): Long =
    claimIn(genDir(spark, store))

  private def claimIn(dir: Path): Long = {
    Files.createDirectories(dir)
    var n = (listGens(dir, "claim-") ++ listGens(dir, "ready-")).foldLeft(0L)(math.max) + 1
    while (true) {
      try { Files.createFile(dir.resolve(s"claim-$n")); return n }
      catch { case _: java.nio.file.FileAlreadyExistsException => n += 1 }
    }
    -1L // unreachable
  }

  /** Publish a claimed generation: after this, new probes resolve to it.
    * Probes constructed before the publish keep reading their own
    * (still-on-disk) generation — snapshot semantics per probe plan.
    */
  def publishGeneration(spark: SparkSession, store: String, gen: Long): Unit =
    Files.createFile(genDir(spark, store).resolve(s"ready-$gen"))

  /** The latest PUBLISHED generation, if any. */
  def currentGeneration(spark: SparkSession, store: String): Option[Long] =
    listGens(genDir(spark, store), "ready-").lastOption

  // --- segment markers (shared by table stores and path stores) --------
  // A `segof-<gen>` marker beside the claim/ready markers names the base
  // a segment generation belongs to (the Lucene-style incremental-ingest
  // model): the generation holds only an increment routed/scored against
  // that base build, and segment-aware probes read base ∪ its segments
  // instead of the latest generation alone. Written BEFORE publish, so a
  // published segment is never mistaken for a full build; burned with the
  // claim on failure, so a re-issued generation number can never be
  // misclassified as a segment of a long-gone base.

  // The marker's first token is the base generation; an optional second
  // token is the appender's idempotence TAG (e.g. "<streamId>:<batchId>"
  // from a streaming ingest) — since the marker is written before
  // publish and burned with a failed claim, a tag is durable exactly
  // when its segment is published, which makes the publish the atomic
  // exactly-once commit point for at-least-once callers (foreachBatch
  // replays a micro-batch after crash recovery; the replay sees its tag
  // on a published segment and skips).
  private def markSegmentIn(dir: Path, gen: Long, base: Long, tag: Option[String]): Unit = {
    // the marker is space-delimited and the tag becomes a confirmation
    // marker FILENAME — whitespace or path characters would silently
    // break replay detection (a 3-token marker parses as untagged)
    tag.foreach(t => require(t.nonEmpty && t.matches("[A-Za-z0-9._:-]+"),
      s"dedupe tag '$t' must match [A-Za-z0-9._:-]+"))
    Files.writeString(dir.resolve(s"segof-$gen"),
      base.toString + tag.fold("")(t => s" $t"))
  }

  private def segmentBaseIn(dir: Path, gen: Long): Option[Long] = {
    val m = dir.resolve(s"segof-$gen")
    if (Files.exists(m))
      Some(Files.readString(m).trim.split("\\s+")(0).toLong)
    else None
  }

  private def segmentTagIn(dir: Path, gen: Long): Option[String] = {
    val m = dir.resolve(s"segof-$gen")
    if (!Files.exists(m)) None
    else Files.readString(m).trim.split("\\s+") match {
      case Array(_, tag) => Some(tag)
      case _ => None
    }
  }

  /** The durable committed-tag manifest — vacuum folds `tagdone-` marker
    * files into this single file so a long-lived streaming ingest store
    * does not accumulate one marker per micro-batch forever.
    */
  private def tagLog(dir: Path): Path = dir.resolve("tagdone.log")

  private def manifestTags(dir: Path): Set[String] =
    if (Files.exists(tagLog(dir)))
      Files.readAllLines(tagLog(dir)).asScala.iterator.map(_.trim).filter(_.nonEmpty).toSet
    else Set.empty

  private def listTagMarkers(dir: Path): Seq[String] =
    if (!Files.isDirectory(dir)) Seq.empty
    else {
      val s = Files.list(dir)
      try s.iterator().asScala.toSeq.map(_.getFileName.toString)
        .filter(_.startsWith("tagdone-")).map(_.stripPrefix("tagdone-"))
      finally s.close()
    }

  /** Fold `tagdone-` marker files into the manifest (atomic temp+move;
    * union-with-existing, so a crash between the move and the marker
    * deletes loses nothing — both sources are consulted by
    * [[tagPublishedIn]]). The read-union-write is guarded by a
    * create-new lock so two racing vacuums cannot clobber each other's
    * fold (the loser skips — markers stay, the next vacuum folds them);
    * a crash-stale lock past `lockTtlMs` is broken, and orphaned tmp
    * files are swept under the lock.
    */
  private def compactTagMarkers(dir: Path, lockTtlMs: Long = 3600_000L): Unit = {
    if (listTagMarkers(dir).isEmpty) return
    val lock = dir.resolve("tagdone.log.lock")
    scala.util.Try(Files.getLastModifiedTime(lock).toMillis).toOption
      .filter(_ < System.currentTimeMillis() - lockTtlMs)
      .foreach(_ => Files.deleteIfExists(lock))
    val locked = try { Files.createFile(lock); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    if (!locked) return
    try {
      // markers snapshotted UNDER the lock — a pre-lock snapshot could
      // resurrect a tag [[unconfirmTagIn]] withdrew between the snapshot
      // and the fold (unconfirm also serializes on this lock, so after
      // it deletes a marker no folder can still see it)
      val markers = listTagMarkers(dir)
      val union = (manifestTags(dir) ++ markers).toSeq.sorted
      val tmp = dir.resolve(s"tagdone.log.tmp-${System.nanoTime()}")
      Files.write(tmp, union.asJava)
      Files.move(tmp, tagLog(dir),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      markers.foreach(t => Files.deleteIfExists(dir.resolve(s"tagdone-$t")))
      // sweep tmp files a crashed predecessor leaked
      val s = Files.list(dir)
      try s.iterator().asScala.toSeq
        .filter(_.getFileName.toString.startsWith("tagdone.log.tmp-"))
        .foreach(p => Files.deleteIfExists(p))
      finally s.close()
    } finally Files.deleteIfExists(lock)
  }

  /** Record that `tag`'s batch is COMMITTED — its segment is published
    * and, per the appender's post-publish re-check, a member of the live
    * group. This durable marker (folded into the manifest by vacuum) is
    * the ONLY thing that keeps the tag honored after a later rebuild
    * supersedes the segment; commitment is never inferred from
    * generation numbers (claim order is not publish order, so interval
    * heuristics misclassify a crashed appender's orphan as committed —
    * silent data loss).
    */
  private def confirmTagIn(dir: Path, tag: String): Unit =
    scala.util.Try(Files.createFile(dir.resolve(s"tagdone-$tag"))): Unit

  /** True iff `tag` COMMITTED:
    *
    *   - an appender-confirmed `tagdone-` marker or its folded manifest
    *     entry — the durable record, written only after the post-publish
    *     re-check proved the segment joined the live group; or
    *   - the tag rides a published segment of the CURRENT live group —
    *     covers the instant between publish and confirmation for
    *     concurrent readers (such a segment's rows ARE in the live read
    *     set).
    *
    * A tag on a published segment naming a SUPERSEDED base with no
    * confirmation counts as NOT committed: that is a crashed appender's
    * orphan, its rows are in no live index, and its replay must
    * re-append. At-least-once duplicates beat silent loss.
    */
  private def tagPublishedIn(dir: Path, tag: String): Boolean =
    Files.exists(dir.resolve(s"tagdone-$tag")) ||
      manifestTags(dir).contains(tag) || {
        val ready = listGens(dir, "ready-")
        ready.reverse.find(g => segmentBaseIn(dir, g).isEmpty).exists { live =>
          ready.exists(g => segmentTagIn(dir, g).contains(tag) &&
            segmentBaseIn(dir, g).contains(live))
        }
      }

  private def resolveSegmentedIn(dir: Path, what: String): (Long, Seq[Long]) = {
    val pubs = listGens(dir, "ready-")
    val base = pubs.reverse.find(g => segmentBaseIn(dir, g).isEmpty)
      .getOrElse(throw new IllegalStateException(
        s"$what has no published full build — run its build first"))
    (base, pubs.filter(g => segmentBaseIn(dir, g).contains(base)))
  }

  /** Mark a claimed table-store generation as an APPEND SEGMENT of
    * `base` — see the segment-marker notes above. `tag` is the optional
    * appender idempotence key checked by [[segmentTagPublished]].
    */
  def markSegment(spark: SparkSession, store: String, gen: Long, base: Long,
      tag: Option[String] = None): Unit =
    markSegmentIn(genDir(spark, store), gen, base, tag)

  /** True iff any published generation of the table store carries the
    * appender tag — the at-least-once replay check.
    */
  def segmentTagPublished(spark: SparkSession, store: String, tag: String): Boolean =
    tagPublishedIn(genDir(spark, store), tag)

  /** Durably confirm a table-store segment tag as committed — called by
    * the appender AFTER its post-publish re-check proved the segment
    * joined the live group (see [[segmentTagPublished]]'s commit rules).
    */
  def confirmSegmentTag(spark: SparkSession, store: String, tag: String): Unit =
    confirmTagIn(genDir(spark, store), tag)

  /** The base generation `gen` is a segment of, or None for full
    * builds.
    */
  def segmentBase(spark: SparkSession, store: String, gen: Long): Option[Long] =
    segmentBaseIn(genDir(spark, store), gen)

  /** The live read set of a segment-aware table store: the latest
    * published FULL build plus every published segment that names it
    * (a racing appender's segment of a superseded base never leaks
    * in). Fails with the build hint when nothing full is published.
    */
  def resolveSegmented(spark: SparkSession, store: String): (Long, Seq[Long]) =
    resolveSegmentedIn(genDir(spark, store), s"store '$store'")

  /** Resolve the latest published generation or fail with a build hint. */
  def resolveGeneration(spark: SparkSession, store: String): Long =
    currentGeneration(spark, store).getOrElse(throw new IllegalStateException(
      s"store '$store' has no published generation — run its build first"))

  /** Drop ALL generations of a store (tables + markers) plus any legacy
    * unversioned `<store>_<suffix>` tables — test/bench hygiene.
    */
  def dropStore(spark: SparkSession, store: String, suffixes: Seq[String]): Unit = {
    val dir = genDir(spark, store)
    val gens = (listGens(dir, "claim-") ++ listGens(dir, "ready-")).distinct
    for (g <- gens; s <- suffixes) drop(spark, storeTableName(store, g, s))
    suffixes.foreach(s => drop(spark, s"${store}_$s"))
    if (Files.exists(dir)) rmTree(dir.toFile)
  }

  /** Delete a claimed-but-unpublished generation's claim marker AND any
    * segment mark it wrote (after its tables are dropped) — the
    * guard-trip/build-failure cleanup, so a refused build doesn't
    * permanently burn its generation number and a re-issued number
    * never inherits a dead append's segment mark.
    */
  def burnClaim(spark: SparkSession, store: String, gen: Long): Unit = {
    Files.deleteIfExists(genDir(spark, store).resolve(s"segof-$gen"))
    Files.deleteIfExists(genDir(spark, store).resolve(s"claim-$gen"))
  }

  /** Retract a just-published ORPHANED segment — the appender's post-
    * publish re-check found a rebuild won the race, so this segment
    * names a superseded base. Only the ready and segof MARKERS go; the
    * claim marker and the segment's DATA stay. The segment was briefly
    * live: a probe that resolved in the window between this appender's
    * publish and the rebuild's publish legitimately planned against it
    * and may still be scanning its files — deleting the data here would
    * fail that reader mid-query, the exact race the vacuum age gate
    * protects against everywhere else. The surviving claim-without-ready
    * is precisely the shape [[vacuumStoreGenerations]]' burned-claim
    * sweep reclaims, age-gated, once no probe can still hold it. The
    * caller re-appends against the winning base; the orphan's tag never
    * counts as committed ([[segmentTagPublished]]).
    */
  def retractSegment(spark: SparkSession, store: String, gen: Long): Unit =
    retractKeepDataIn(genDir(spark, store), gen)

  /** [[retractSegment]] for path stores — same grace-period contract:
    * the data directory survives for racing probes and is reclaimed by
    * the age-gated burned-claim sweep of [[vacuumPathSegmented]].
    */
  def retractPathSegment(root: String, gen: Long): Unit =
    retractKeepDataIn(pathGenDir(root), gen)

  private def retractKeepDataIn(dir: Path, gen: Long): Unit = {
    // ONLY the ready marker goes. Deleting segof here would open a
    // misclassification window: a resolver that listed ready markers
    // just before this delete and reads segof just after would see the
    // orphan as a FULL BUILD (ready, no segof) and resolve it as the
    // live base — a silently tiny corpus. With segof intact the orphan
    // is, at every instant, either a superseded-base segment (correctly
    // ignored) or unpublished. claim-<gen> and segof-<gen> deliberately
    // stay: the claim keeps the generation number un-reissuable and
    // makes the leftover data visible to the age-gated burned-claim
    // sweep, which reclaims all three together.
    Files.deleteIfExists(dir.resolve(s"ready-$gen"))
  }

  /** Withdraw a [[confirmSegmentTag]] confirmation — the appender's
    * SECOND liveness observation found a rebuild published between the
    * first re-check and the confirm, so the tag is durably committed
    * while its rows live only in a superseded segment; left standing, a
    * replay would skip and the rows would be silently lost. Removes the
    * marker file AND (if a racing vacuum already folded it) the manifest
    * entry, so the subsequent re-append/replay is not suppressed.
    */
  def unconfirmSegmentTag(spark: SparkSession, store: String, tag: String): Unit =
    unconfirmTagIn(genDir(spark, store), tag)

  /** [[unconfirmSegmentTag]] for path stores. */
  def unconfirmPathSegmentTag(root: String, tag: String): Unit =
    unconfirmTagIn(pathGenDir(root), tag)

  private def unconfirmTagIn(dir: Path, tag: String): Unit = {
    // the ENTIRE withdrawal serializes on the compaction lock: marker
    // delete and manifest rewrite both happen under it, and
    // [[compactTagMarkers]] snapshots its marker list under the same
    // lock — so a racing vacuum either folds the marker BEFORE this
    // (we remove the manifest entry below) or lists AFTER (the marker
    // is gone). An unlocked withdrawal could race a vacuum's pre-lock
    // snapshot and have the tag resurrected into the manifest — a
    // durable false commitment, i.e. silent loss on replay. Spin
    // briefly for the lock; failing LOUDLY beats that.
    val lock = dir.resolve("tagdone.log.lock")
    val deadline = System.currentTimeMillis() + 10_000L
    var locked = false
    while (!locked && System.currentTimeMillis() < deadline) {
      locked = try { Files.createFile(lock); true }
        catch { case _: java.nio.file.FileAlreadyExistsException =>
          Thread.sleep(50L); false }
    }
    require(locked, s"unconfirmTag('$tag'): could not acquire the manifest " +
      "lock — the tag may still read as committed; retry before replaying")
    try {
      Files.deleteIfExists(dir.resolve(s"tagdone-$tag"))
      if (manifestTags(dir).contains(tag)) {
        val rest = (manifestTags(dir) - tag).toSeq.sorted
        val tmp = dir.resolve(s"tagdone.log.tmp-${System.nanoTime()}")
        Files.write(tmp, rest.asJava)
        Files.move(tmp, tagLog(dir),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      }
    } finally Files.deleteIfExists(lock)
  }

  /** Drop published generations older than the newest `keep`, and
    * burned claims (a failed build's leftovers) that are provably dead.
    * Never touches the kept generations, so probes resolved against
    * them are safe. Safety rules against racing builders/probes:
    *
    *  - `minAgeMs` age-gates every reclaimed marker (same contract as
    *    [[graft.etl.SnapshotTable.vacuum]]): only generations/claims
    *    whose marker is older than the floor (default 1 h, far beyond
    *    any build or probe window) are eligible. Pass 0 only when no
    *    builder can be active and no probe is pinned to an old
    *    generation.
    *  - claims are swept only when at least one generation is
    *    PUBLISHED — before the first publish, every claim may belong to
    *    an in-flight first build whose tables must not be deleted from
    *    under it.
    *  - the highest-numbered claim is never swept even past the age
    *    gate: it is the one marker an in-flight build (however slow)
    *    could still publish. Claims below it with no ready marker are
    *    dead — a later build claimed past them, so theirs either failed
    *    or published-and-was-vacuumed.
    */
  def vacuumStoreGenerations(spark: SparkSession, store: String,
      suffixes: Seq[String], keep: Int = 1, minAgeMs: Long = 3600_000L): Unit =
    vacuumIn(genDir(spark, store), keep, minAgeMs) { g =>
      suffixes.foreach(s => drop(spark, storeTableName(store, g, s)))
    }

  /** Vacuum a SEGMENT-AWARE table store: every published generation
    * STRICTLY OLDER than the live full build goes (superseded bases and
    * their segments); the live base, its published segments, and
    * in-flight claims survive (the [[vacuumStoreGenerations]] safety
    * rules apply underneath). The live base is passed to the core as a
    * FIXED FLOOR, not a keep-count — a segment published between this
    * resolve and the core's fresh listing (the streaming ingest shape)
    * widens the kept set but can never shift the live base into the
    * dropped window. Orphan segments newer than the live base — a
    * racing appender that lost to a rebuild — are kept until a further
    * rebuild passes them.
    */
  def vacuumSegmentedStore(spark: SparkSession, store: String,
      suffixes: Seq[String], minAgeMs: Long = 3600_000L): Unit = {
    val dir = genDir(spark, store)
    listGens(dir, "ready-").reverse.find(g => segmentBaseIn(dir, g).isEmpty)
      .foreach { base =>
        vacuumCore(dir, _.filter(_ < base), minAgeMs) { g =>
          suffixes.foreach(s => drop(spark, storeTableName(store, g, s)))
        }
      }
  }

  /** The shared vacuum core (table stores and path stores differ only
    * in `deleteGen`, the per-generation data delete action — the safety
    * rules documented on [[vacuumStoreGenerations]] live HERE, once).
    * `dropSelect` picks the reclaimable subset from the FRESH ascending
    * ready list: keep-count callers drop all but the newest N; segmented
    * callers drop below a fixed base floor (count-based selection is
    * race-prone there — see [[vacuumSegmentedStore]]).
    */
  private def vacuumIn(dir: Path, keep: Int, minAgeMs: Long)(deleteGen: Long => Unit): Unit =
    vacuumCore(dir, _.dropRight(keep), minAgeMs)(deleteGen)

  private def vacuumCore(dir: Path, dropSelect: Seq[Long] => Seq[Long],
      minAgeMs: Long)(deleteGen: Long => Unit): Unit = {
    val cutoff = System.currentTimeMillis() - minAgeMs
    def oldEnough(marker: String): Boolean =
      scala.util.Try(Files.getLastModifiedTime(dir.resolve(marker)).toMillis)
        .toOption.forall(_ <= cutoff)
    val ready = listGens(dir, "ready-")
    val selected = dropSelect(ready).filter(g => oldEnough(s"ready-$g"))
    // segment-aware protection for EVERY vacuum flavor: the LIVE GROUP
    // (the latest full build plus every published segment naming it)
    // survives regardless of the caller's window — a keep=1 vacuum of
    // [base 1, seg 2, seg 3] must drop NONE of them (keeping only gen 3
    // would delete live index data out from under the resolver)
    val liveGroup: Set[Long] =
      ready.reverse.find(g => segmentBaseIn(dir, g).isEmpty) match {
        case Some(b) => ready.filter(g => segmentBaseIn(dir, g).contains(b)).toSet + b
        case None => Set.empty
      }
    val dropGens = selected.filterNot(liveGroup.contains)
    dropGens.foreach(deleteGen)
    dropGens.foreach { g =>
      // no tag echo here: commitment is the APPENDER's durable
      // `tagdone-` record ([[confirmTagIn]], written on confirmed-live
      // publish), never inferred at sweep time — generation numbers
      // cannot distinguish a committed segment from a crashed appender's
      // orphan (claim order is not publish order), and echoing an
      // orphan's tag would turn its replay's re-append into silent loss
      Files.deleteIfExists(dir.resolve(s"ready-$g"))
      Files.deleteIfExists(dir.resolve(s"claim-$g"))
      Files.deleteIfExists(dir.resolve(s"segof-$g"))
    }
    // burned claims (no ready marker) BELOW the newest published
    // generation; their segof markers go too — a re-issued generation
    // number must never inherit a dead append's segment mark. Every
    // claim ABOVE the newest ready marker is protected regardless of
    // age: each one may be an in-flight build or append (two concurrent
    // appenders hold two such claims — protecting only the maximum
    // would fail the lower append mid-write under a minAgeMs=0 vacuum).
    val readyLeft = listGens(dir, "ready-")
    if (readyLeft.nonEmpty) {
      val newestReady = readyLeft.max
      listGens(dir, "claim-")
        .filter(g => g < newestReady && !readyLeft.contains(g) && oldEnough(s"claim-$g"))
        .foreach { g =>
          deleteGen(g)
          Files.deleteIfExists(dir.resolve(s"claim-$g"))
          Files.deleteIfExists(dir.resolve(s"segof-$g"))
        }
    }
    // fold tagdone marker files into the single manifest so a streaming
    // ingest store does not grow one marker file per micro-batch forever
    compactTagMarkers(dir)
  }

  // ---------------------------------------------------------------------
  // PATH-based generation stores: the same claim/ready protocol for
  // indexes that live as plain (partitioned) parquet DIRECTORIES rather
  // than warehouse tables — e.g. the IVF index, whose load-bearing scale
  // property is directory-level partition pruning on cid. Generation g's
  // data lives at `<root>/g<g>`; markers live at `<root>/_generations`
  // (underscore-prefixed: invisible to any parquet reader of the root).
  // Without this, racing rebuilds clobber one shared directory mid-probe.
  // ---------------------------------------------------------------------

  private def pathGenDir(root: String): Path =
    Paths.get(root.stripPrefix("file:"), "_generations")

  /** Data directory of generation `gen` under a path store's root. */
  def pathGenData(root: String, gen: Long): String =
    s"${root.stripPrefix("file:")}/g$gen"

  /** Claim the next free generation of a directory store (atomic marker
    * create; racing builders get distinct numbers). Invisible to probes
    * until [[publishPathGeneration]].
    */
  def claimPathGeneration(root: String): Long = claimIn(pathGenDir(root))

  /** Publish a claimed directory-store generation. */
  def publishPathGeneration(root: String, gen: Long): Unit =
    Files.createFile(pathGenDir(root).resolve(s"ready-$gen"))

  /** Latest PUBLISHED generation of a directory store, if any. */
  def currentPathGeneration(root: String): Option[Long] =
    listGens(pathGenDir(root), "ready-").lastOption

  /** Resolve the latest published generation or fail with a build hint. */
  def resolvePathGeneration(root: String): Long =
    currentPathGeneration(root).getOrElse(throw new IllegalStateException(
      s"path store '$root' has no published generation — run its build first"))

  /** Mark a claimed directory-store generation as an APPEND SEGMENT of
    * `base` — the table-store [[markSegment]] semantics on the path
    * protocol (one marker medium for both store kinds, so the resolve
    * and vacuum rules live once). `tag` is the optional appender
    * idempotence key checked by [[pathSegmentTagPublished]].
    */
  def markPathSegment(root: String, gen: Long, base: Long,
      tag: Option[String] = None): Unit =
    markSegmentIn(pathGenDir(root), gen, base, tag)

  /** True iff any published generation of the directory store carries
    * the appender tag — the at-least-once replay check.
    */
  def pathSegmentTagPublished(root: String, tag: String): Boolean =
    tagPublishedIn(pathGenDir(root), tag)

  /** [[confirmSegmentTag]] for path stores. */
  def confirmPathSegmentTag(root: String, tag: String): Unit =
    confirmTagIn(pathGenDir(root), tag)

  /** The base generation a directory-store segment names, or None for
    * full builds.
    */
  def pathSegmentBase(root: String, gen: Long): Option[Long] =
    segmentBaseIn(pathGenDir(root), gen)

  /** The live read set of a segment-aware directory store — the
    * [[resolveSegmented]] rules on the path protocol.
    */
  def resolvePathSegmented(root: String): (Long, Seq[Long]) =
    resolveSegmentedIn(pathGenDir(root), s"path store '$root'")

  /** Vacuum a SEGMENT-AWARE directory store — [[vacuumSegmentedStore]]'s
    * fixed-floor rules (a racing segment publish can never shift the
    * live base into the dropped window), deleting data directories.
    */
  def vacuumPathSegmented(root: String, minAgeMs: Long = 3600_000L): Unit = {
    val dir = pathGenDir(root)
    listGens(dir, "ready-").reverse.find(g => segmentBaseIn(dir, g).isEmpty)
      .foreach { base =>
        vacuumCore(dir, _.filter(_ < base), minAgeMs)(g => deletePathGenData(root, g))
      }
  }

  /** Delete a claimed-but-unpublished directory generation's claim
    * marker (after its data dir is removed via [[deletePathGenData]]) —
    * build-failure cleanup.
    */
  def burnPathClaim(root: String, gen: Long): Unit = {
    Files.deleteIfExists(pathGenDir(root).resolve(s"segof-$gen"))
    Files.deleteIfExists(pathGenDir(root).resolve(s"claim-$gen"))
  }

  /** Delete a directory generation's data dir (recursive). Builders call
    * this on failure BEFORE [[burnPathClaim]]: a marker-less partial dir
    * would be invisible to vacuum and could poison a re-issued
    * generation number under dynamic partition overwrite.
    */
  def deletePathGenData(root: String, gen: Long): Unit =
    rmTree(new java.io.File(pathGenData(root, gen)))

  private def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmTree))
    f.delete()
  }

  /** Vacuum a directory store: same safety rules as
    * [[vacuumStoreGenerations]] (age gate, keep floor, claims swept only
    * once something is published, highest claim never swept — shared
    * [[vacuumIn]] core), deleting `g<gen>` data directories instead of
    * tables.
    */
  def vacuumPathGenerations(root: String, keep: Int = 1,
      minAgeMs: Long = 3600_000L): Unit =
    vacuumIn(pathGenDir(root), keep, minAgeMs)(g => deletePathGenData(root, g))

  /** Drop a table AND its on-disk location: the in-memory catalog
    * forgets across JVMs but the warehouse dir persists, and
    * `saveAsTable` refuses to overwrite an orphaned location. The
    * location is resolved from the catalog while the table still
    * exists (covers external/custom-location tables); the fallback for
    * already-orphaned dirs uses the warehouse-dir convention with the
    * LOWERCASED name (the catalog lowercases managed-table dirs). A
    * resolvable catalog location with a NON-file scheme means the data
    * lives somewhere this JVM's filesystem cannot (and must not) touch:
    * DROP TABLE removes the catalog entry and no local rm runs — the
    * warehouse-dir convention path would be an unrelated directory.
    */
  def drop(spark: SparkSession, name: String): Unit = {
    val catalogLoc: Option[Either[Unit, java.io.File]] =
      if (spark.catalog.tableExists(name))
        scala.util.Try(new java.net.URI(
          spark.sql(s"DESCRIBE EXTENDED $name")
            .filter(org.apache.spark.sql.functions.col("col_name") === "Location")
            .collect()(0).getString(1))).toOption
          .map { u =>
            if (u.getScheme == null || u.getScheme == "file")
              Right(new java.io.File(u.getPath))
            else Left(()) // remote location: catalog drop only, no local rm
          }
      else None
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val loc: Option[java.io.File] = catalogLoc match {
      case Some(Left(()))  => None
      case Some(Right(f))  => Some(f)
      case None            => Some(new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
        name.toLowerCase(java.util.Locale.ROOT)))
    }
    loc.filter(_.exists()).foreach(rmTree)
  }
}
