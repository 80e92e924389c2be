package graft.sources

import java.net.URI
import java.nio.file.{Files, LinkOption}
import java.nio.file.attribute.PosixFilePermission
import java.util.EnumSet

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{DelegateToFileSystem, FileStatus, LocalFileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Fork-free local-filesystem adapters (r18 optimization round).
  *
  * Without the Hadoop native library (absent here, and on most
  * laptop/CI/sandbox boxes), `RawLocalFileSystem` falls back to FORKING
  * A PROCESS for permission and symlink work: `setPermission` execs
  * `chmod` (hit on every output-stream/directory create that carries a
  * permission — every parquet part file, every streaming-checkpoint
  * delta), and the FileContext rename path execs `readlink` per call
  * (`AbstractFileSystem.rename` → `getFileLinkStatus` →
  * `FileUtil.readLink` — hit on every atomic checkpoint commit).
  * Measured: 24k process forks in a three-query bench subset; 32
  * micro-batch tasks sitting at seconds of wall for ~100 ms of CPU,
  * parked under `ProcessImpl.forkAndExec` (jstack witness, r18).
  *
  * These subclasses do the same operations in-JVM through NIO — no
  * semantic change: chmod sets the identical POSIX bits; the link-status
  * fast path only short-circuits the no-symlink case (a real symlink
  * still routes to the stock implementation). A cluster deployment on
  * HDFS/S3 never touches this class; it is the LOCAL adapter only,
  * wired via `fs.file.impl` / `fs.AbstractFileSystem.file.impl` in
  * [[graft.GraftSession]].
  */
class FastRawLocalFileSystem extends RawLocalFileSystem {

  private def posixPerms(p: FsPermission): java.util.Set[PosixFilePermission] = {
    val bits = p.toShort
    val out = EnumSet.noneOf(classOf[PosixFilePermission])
    val order = Seq(
      PosixFilePermission.OWNER_READ, PosixFilePermission.OWNER_WRITE,
      PosixFilePermission.OWNER_EXECUTE,
      PosixFilePermission.GROUP_READ, PosixFilePermission.GROUP_WRITE,
      PosixFilePermission.GROUP_EXECUTE,
      PosixFilePermission.OTHERS_READ, PosixFilePermission.OTHERS_WRITE,
      PosixFilePermission.OTHERS_EXECUTE)
    order.zipWithIndex.foreach { case (perm, i) =>
      if ((bits & (1 << (8 - i))) != 0) out.add(perm)
    }
    out
  }

  /** In-JVM chmod. Sticky/setuid bits (unused by Spark's local writes)
    * and non-POSIX stores fall back to the stock (forking) path. */
  override def setPermission(p: Path, permission: FsPermission): Unit = {
    if (permission == null) return
    if ((permission.toShort & 0xE00) != 0) { super.setPermission(p, permission); return }
    try Files.setPosixFilePermissions(pathToFile(p).toPath, posixPerms(permission))
    catch {
      case _: UnsupportedOperationException => super.setPermission(p, permission)
      case e: java.nio.file.NoSuchFileException =>
        throw new java.io.FileNotFoundException(e.getMessage)
    }
  }

  /** mkdir + in-JVM chmod (the stock form shells `chmod` when a mode is
    * requested and the native lib is absent). */
  override def mkOneDirWithMode(p: Path, dir: java.io.File,
      permission: FsPermission): Boolean = {
    if (permission == null) dir.mkdir()
    else {
      val created = dir.mkdir()
      if (created) setPermission(p, permission)
      created
    }
  }

  /** No-symlink fast path: the stock implementation forks `readlink`
    * unconditionally; here a plain file/dir (the only thing Spark's
    * local checkpoints and staging dirs ever hold) resolves with one
    * NIO metadata read. Real symlinks keep stock semantics. */
  override def getFileLinkStatus(f: Path): FileStatus = {
    val nio = pathToFile(f).toPath
    if (Files.isSymbolicLink(nio)) super.getFileLinkStatus(f)
    else {
      // getFileStatus throws FileNotFoundException for a missing path,
      // matching the stock link-status contract for callers that probe
      // rename destinations
      getFileStatus(f)
    }
  }
}

/** `fs.file.impl` replacement: the stock checksummed local FS over the
  * fork-free raw layer. */
class FastLocalFileSystem extends LocalFileSystem(new FastRawLocalFileSystem)

/** `fs.AbstractFileSystem.file.impl` replacement (the FileContext side —
  * streaming checkpoint managers go through this): the stock
  * RawLocalFs shape over the fork-free raw layer. */
class FastLocalFs(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(uri, new FastRawLocalFileSystem, conf, "file", false)
