package graft.tools

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

import java.io.{IOException, OutputStream}
import java.net.URI

/** Budget for [[FaultyFileSystem]]'s injected crashes. `arm(n)` lets
  * the next `n` MUTATING operations (file create/rename/delete/mkdir)
  * succeed and fails every one after — modeling a hard crash at the
  * (n+1)th write, after which the process is gone and nothing else
  * lands on disk. Reads are never faulted (a rebooted reader sees
  * whatever survived). `used` counts mutating ops since the last
  * arm/disarm, so a fault-free dry run measures a sweep's upper
  * bound. */
object FaultyFs {
  @volatile private var remaining: Long = Long.MaxValue
  @volatile var used: Long = 0L

  def arm(n: Long): Unit = synchronized { remaining = n; used = 0L }
  def disarm(): Unit = synchronized { remaining = Long.MaxValue; used = 0L }

  private[tools] def tick(op: String, p: Path): Unit = synchronized {
    if (remaining <= 0)
      throw new IOException(s"injected crash: $op $p")
    remaining -= 1
    used += 1
  }
}

/** `faulty:///path` — a local filesystem whose mutating operations
  * fail permanently once the [[FaultyFs]] budget runs out. The hooks
  * sit on RawLocalFileSystem's true primitives (every `create*`
  * convenience overload funnels into `createOutputStreamWithMode`;
  * the two `mkdirs` overloads do NOT chain and are hooked
  * separately), so parquet task writes, committer renames, and
  * pointer swaps are all injection points. Registered per-suite via
  * `fs.faulty.impl`; the scheme is deliberately NOT "file", so
  * [[graft.operators.Versioned]] takes its non-local (HDFS-style)
  * code paths, including the FileContext-unsupported
  * delete-then-rename fallback — the widest crash window the storage
  * contracts have to survive. */
class FaultyFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "faulty"
  override def getUri: URI = URI.create("faulty:///")

  override protected def createOutputStreamWithMode(
      f: Path, append: Boolean, permission: FsPermission): OutputStream = {
    FaultyFs.tick("create", f)
    super.createOutputStreamWithMode(f, append, permission)
  }

  override def rename(src: Path, dst: Path): Boolean = {
    FaultyFs.tick("rename", src)
    super.rename(src, dst)
  }

  override def delete(p: Path, recursive: Boolean): Boolean = {
    FaultyFs.tick("delete", p)
    super.delete(p, recursive)
  }

  override def mkdirs(p: Path): Boolean = {
    FaultyFs.tick("mkdirs", p)
    super.mkdirs(p)
  }

  override def mkdirs(p: Path, permission: FsPermission): Boolean = {
    FaultyFs.tick("mkdirs", p)
    super.mkdirs(p, permission)
  }
}
