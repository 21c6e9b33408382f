package graft.sources

import java.util.EnumSet

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{CreateFlag, FileContext, Options, Path => HPath}

/** The data plane's filesystem dispatch: every lifecycle DELETE (vacuum
  * reclaim, failure cleanup, staging sweeps) resolves the path's scheme
  * and deletes through `org.apache.hadoop.fs.FileSystem` — the same
  * connector layer Spark writes the parquet through — so an object-store
  * deployment can actually reclaim a superseded generation's data. A
  * `java.io.File` walk would silently no-op on `s3a://`/`abfs://`
  * paths, which breaks the store layer's own leak-beats-loss contract
  * (leaks are only acceptable because the age-gated sweep reclaims
  * them; a sweep that cannot delete reclaims nothing, forever).
  */
private[graft] object HadoopFs {

  /** The active session's Hadoop conf when there is one (it carries the
    * deployment's object-store credentials/endpoints); a bare default
    * otherwise (tests, pre-session tooling — local scheme only).
    */
  def conf(): Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  /** Recursive delete via the path's own filesystem. Idempotent: false
    * when nothing existed.
    */
  def deleteRecursive(path: String): Boolean = {
    val p = new HPath(path)
    p.getFileSystem(conf()).delete(p, true)
  }

  /** Child names directly under `dir` (empty when absent). */
  def listNames(dir: String): Seq[String] = {
    val p = new HPath(dir)
    val fs = p.getFileSystem(conf())
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(_.getPath.getName)
  }
}

/** [[StoreIO]] over `org.apache.hadoop.fs` — the implementation an
  * HDFS / ABFS / viewfs deployment uses for the metadata plane, and the
  * conformance proof that the seam holds against the API family real
  * clusters deploy (PosixStoreIO's `link(2)` does not exist up here).
  *
  * The create-new-or-fail primitive is rename-without-overwrite:
  * content is fully written to a hidden `.tmp-*` sibling, then
  * `FileContext.rename` (no `Rename.OVERWRITE`) moves it to its final
  * name — refusing with `FileAlreadyExistsException` when the name is
  * taken, so name and content commit together and no reader sees a
  * partial object. On HDFS the refusal is one atomic namenode op
  * (`dfs.rename` with `Options.Rename.NONE`); the RAW LOCAL scheme's
  * rename is a client-side check-then-act, so cross-PROCESS writers on
  * plain `file://` should use [[PosixStoreIO]] instead (in-process
  * racers are serialized by the publish lock below — which is how the
  * shared conformance sweep can prove the semantics on `file://`
  * without pretending local rename is atomic). True S3 conditional-PUT
  * (`If-None-Match: *`) remains a fourth impl an S3-native deployment
  * writes against the SDK; s3a's rename is copy-then-delete and does
  * NOT provide this primitive.
  */
final class HadoopFsStoreIO(hadoopConf: () => Configuration = () => HadoopFs.conf())
    extends StoreIO {

  private def fc(p: HPath): FileContext =
    Option(p.toUri.getScheme) match {
      case Some(_) => FileContext.getFileContext(p.toUri, hadoopConf())
      case None => FileContext.getFileContext(hadoopConf())
    }

  private def writeTmp(target: HPath, bytes: Array[Byte]): HPath = {
    val tmp = new HPath(target.getParent, s".tmp-${java.util.UUID.randomUUID()}")
    val ctx = fc(target)
    val out = ctx.create(tmp, EnumSet.of(CreateFlag.CREATE),
      Options.CreateOpts.createParent())
    try out.write(bytes) finally out.close()
    tmp
  }

  override def putIfAbsent(path: String, bytes: Array[Byte]): Boolean = {
    val target = new HPath(path)
    val tmp = writeTmp(target, bytes)
    val ctx = fc(target)
    try {
      // serialize in-process publishers: the default (non-HDFS)
      // FileContext rename checks the destination then renames — two
      // steps a same-JVM racer could interleave; HDFS's override is
      // atomic server-side and needs no help
      HadoopFsStoreIO.publishLock.synchronized { ctx.rename(tmp, target) }
      true
    } catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
      case _: java.nio.file.FileAlreadyExistsException => false
    } finally {
      scala.util.Try(ctx.delete(tmp, false)): Unit
    }
  }

  override def put(path: String, bytes: Array[Byte]): Unit = {
    val target = new HPath(path)
    val tmp = writeTmp(target, bytes)
    val ctx = fc(target)
    try ctx.rename(tmp, target, Options.Rename.OVERWRITE)
    finally scala.util.Try(ctx.delete(tmp, false)): Unit // gone on success; a failed rename must not leak it
  }

  override def get(path: String): Option[Array[Byte]] = {
    val p = new HPath(path)
    val ctx = fc(p)
    try {
      val in = ctx.open(p)
      try {
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        Some(out.toByteArray)
      } finally in.close()
    } catch { case _: java.io.FileNotFoundException => None }
  }

  override def list(dir: String): Seq[String] = {
    val p = new HPath(dir)
    try {
      val it = fc(p).listStatus(p)
      val names = Seq.newBuilder[String]
      while (it.hasNext) names += it.next().getPath.getName
      names.result()
    } catch { case _: java.io.FileNotFoundException => Seq.empty }
  }

  override def delete(path: String): Boolean = {
    val p = new HPath(path)
    try fc(p).delete(p, false)
    catch { case _: java.io.FileNotFoundException => false }
  }

  override def mtime(path: String): Option[Long] = {
    val p = new HPath(path)
    try Some(fc(p).getFileStatus(p).getModificationTime)
    catch { case _: java.io.FileNotFoundException => None }
  }
}

object HadoopFsStoreIO {
  private val publishLock = new Object
}
