package graft.streaming

import java.io.{FileNotFoundException, IOException}
import java.net.URI
import java.nio.file.Files
import java.nio.file.attribute.BasicFileAttributes

import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** A local Hadoop `FileSystem` that never forks a subprocess.
  *
  * Stock `RawLocalFileSystem` (and the checksummed `LocalFileSystem`
  * wrapping it) shells out when native IO is unavailable: `ls -ld` to
  * lazy-load permissions in `DeprecatedRawLocalFileStatus`, `chmod` in
  * `setPermission` (hit by every `create`/`mkdirs` that carries an
  * `FsPermission`), `readlink` for link resolution. In a container
  * where `fork` is expensive, a streaming checkpoint — hundreds of tiny
  * state/schema/metadata files per micro-batch — turns into a fork
  * storm (measured: >7 min for the FIRST transformWithState micro-batch
  * at one shuffle partition).
  *
  * This subclass answers everything from `java.nio.file` metadata and
  * treats POSIX permissions as a fiction (fixed 644/755 — checkpoint
  * directories are single-user by construction), so no codepath ever
  * reaches `Shell.execCommand`:
  *  - [[getFileStatus]]/[[listStatus]] build eagerly-populated
  *    `FileStatus` rows (no lazy permission load);
  *  - [[setPermission]]/[[setOwner]] are no-ops (kills the `chmod`/
  *    `chown` behind permissioned `create`/`mkdirs`);
  *  - [[mkdirs]] uses `Files.createDirectories` directly.
  *
  * Registered under its OWN scheme — `nofork:///path` — via
  * `fs.nofork.impl`, so ordinary `file:` reads (parquet tables, etc.)
  * keep stock semantics and only checkpoint locations that opt in are
  * affected. There is deliberately no `AbstractFileSystem` binding:
  * Spark's `CheckpointFileManager` then falls back from the
  * `FileContext`-based manager to the `FileSystem`-based one, which
  * routes every metadata op through this class. Rename-based commits
  * stay atomic-enough for a single-JVM checkpoint (same guarantee stock
  * local FS gives).
  */
class NoForkFileSystem extends RawLocalFileSystem {

  override def getUri: URI = NoForkFileSystem.Uri

  override def getScheme: String = NoForkFileSystem.Scheme

  override def setPermission(p: Path, permission: FsPermission): Unit = ()

  override def setOwner(p: Path, username: String, groupname: String): Unit = ()

  override def getFileStatus(f: Path): FileStatus = {
    val nio = pathToFile(f).toPath
    val attrs =
      try Files.readAttributes(nio, classOf[BasicFileAttributes])
      catch {
        case _: java.nio.file.NoSuchFileException =>
          throw new FileNotFoundException(s"File $f does not exist")
      }
    new FileStatus(attrs.size(), attrs.isDirectory, 1, getDefaultBlockSize(f),
      attrs.lastModifiedTime().toMillis, attrs.lastAccessTime().toMillis,
      if (attrs.isDirectory) NoForkFileSystem.DirPerm else NoForkFileSystem.FilePerm,
      NoForkFileSystem.User, NoForkFileSystem.User, null,
      f.makeQualified(getUri, getWorkingDirectory))
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    val file = pathToFile(f)
    if (file.isFile) return Array(getFileStatus(f))
    val names = file.list()
    if (names == null) throw new FileNotFoundException(s"File $f does not exist")
    names.sorted.map(n => getFileStatus(new Path(f, n)))
  }

  override def mkdirs(f: Path): Boolean = mkdirs(f, null)

  override def mkdirs(f: Path, permission: FsPermission): Boolean = {
    Files.createDirectories(pathToFile(f).toPath)
    true
  }
}

object NoForkFileSystem {
  val Scheme = "nofork"
  val Uri: URI = URI.create("nofork:///")
  private val DirPerm = new FsPermission("755")
  private val FilePerm = new FsPermission("644")
  private val User = System.getProperty("user.name", "spark")

  /** Register the scheme on a session's Hadoop configuration; returns a
    * checkpoint-location URI under it for `dir`.
    */
  def install(spark: org.apache.spark.sql.SparkSession, dir: String): String = {
    spark.sparkContext.hadoopConfiguration
      .set(s"fs.$Scheme.impl", classOf[NoForkFileSystem].getName)
    s"$Scheme://$dir"
  }
}
