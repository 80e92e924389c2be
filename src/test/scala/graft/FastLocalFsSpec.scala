package graft

import java.nio.file.{Files, Paths}
import java.nio.file.attribute.PosixFilePermissions

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.fs.permission.FsPermission
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.FastRawLocalFileSystem

/** The fork-free local-FS adapter must be behavior-identical to the
  * stock RawLocalFileSystem on the operations it overrides: chmod sets
  * the same POSIX bits, permissioned mkdirs applies the mode, and the
  * link-status fast path keeps the FileNotFoundException contract the
  * FileContext rename path probes with. */
class FastLocalFsSpec extends AnyFunSuite {

  private def freshFs(): FastRawLocalFileSystem = {
    val fs = new FastRawLocalFileSystem
    fs.initialize(java.net.URI.create("file:///"), new Configuration())
    fs
  }

  private def tmpDir(): java.io.File = {
    val d = Files.createTempDirectory("fastfs").toFile
    d.deleteOnExit()
    d
  }

  test("setPermission sets the identical POSIX bits in-JVM") {
    val fs = freshFs()
    val d = tmpDir()
    val f = new java.io.File(d, "x.txt")
    assert(f.createNewFile())
    for (mode <- Seq("644", "755", "600", "444")) {
      fs.setPermission(new Path(f.getAbsolutePath),
        new FsPermission(Integer.parseInt(mode, 8).toShort))
      val got = PosixFilePermissions.toString(
        Files.getPosixFilePermissions(Paths.get(f.getAbsolutePath)))
      val expect = new FsPermission(Integer.parseInt(mode, 8).toShort)
      assert(got === expect.toString, s"mode $mode")
    }
  }

  test("mkdirs with permission applies the mode") {
    val fs = freshFs()
    val d = tmpDir()
    val p = new Path(new java.io.File(d, "a/b/c").getAbsolutePath)
    assert(fs.mkdirs(p, new FsPermission(Integer.parseInt("755", 8).toShort)))
    assert(Files.isDirectory(Paths.get(new java.io.File(d, "a/b/c").toURI)))
  }

  test("getFileLinkStatus: plain file resolves, missing path throws FileNotFound") {
    val fs = freshFs()
    val d = tmpDir()
    val f = new java.io.File(d, "y.txt")
    Files.writeString(f.toPath, "hi")
    val st = fs.getFileLinkStatus(new Path(f.getAbsolutePath))
    assert(!st.isSymlink && st.getLen === 2L)
    intercept[java.io.FileNotFoundException] {
      fs.getFileLinkStatus(new Path(new java.io.File(d, "nope").getAbsolutePath))
    }
  }

  test("getFileLinkStatus: a real symlink routes to stock semantics") {
    val fs = freshFs()
    val d = tmpDir()
    val tgt = new java.io.File(d, "t.txt"); Files.writeString(tgt.toPath, "x")
    val lnk = Paths.get(d.getAbsolutePath, "l.txt")
    Files.createSymbolicLink(lnk, tgt.toPath)
    val st = fs.getFileLinkStatus(new Path(lnk.toString))
    assert(st.isSymlink)
  }

  test("FileContext rename through the fork-free AbstractFileSystem") {
    val conf = new Configuration()
    conf.set("fs.AbstractFileSystem.file.impl", "graft.sources.FastLocalFs")
    conf.set("fs.file.impl", "graft.sources.FastLocalFileSystem")
    val d = tmpDir()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      java.net.URI.create("file:///"), conf)
    val src = new Path(new java.io.File(d, "src.txt").getAbsolutePath)
    val dst = new Path(new java.io.File(d, "dst.txt").getAbsolutePath)
    val out = fc.create(src,
      java.util.EnumSet.of(org.apache.hadoop.fs.CreateFlag.CREATE))
    out.write("payload".getBytes); out.close()
    fc.rename(src, dst)
    assert(fc.getFileStatus(dst).getLen === 7L)
    assert(!Files.exists(Paths.get(new java.io.File(d, "src.txt").toURI)))
  }
}
