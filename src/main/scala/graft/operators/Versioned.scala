package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Poor-man's table format: versioned parquet snapshots under one
  * root with an atomically-swapped pointer — the storage contract the
  * engine's build-once artifacts (signature catalogs, winnow
  * fingerprint catalogs, IVF indexes, NB models) need for safe
  * concurrent refresh: readers NEVER observe a half-written version,
  * and a stream joining against `latestPath` picks up a publish at
  * its next micro-batch (the catalog-swap pattern
  * [[graft.streaming.StreamingNearDup]] documents).
  *
  * Layout:
  * {{{
  *   root/v00000001/…parquet     immutable version directories
  *   root/v00000002/…parquet
  *   root/_latest                one line: the current version number
  * }}}
  *
  * The pointer swap is rename-based (`_latest.tmp` → `_latest`), the
  * same atomic-visibility primitive [[Incremental]] uses for its
  * watermark. Concurrent writers each claim a distinct version via an
  * atomic create-no-overwrite claim file (`vNNNNNNNN._claim`) before
  * writing data, and the pointer swap is monotonic (a slower writer
  * finishing an OLDER version never moves the pointer backwards) —
  * this is a publish pointer, not a transaction log. Old versions stay
  * readable until [[vacuum]].
  */
object Versioned {

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def versionDir(root: String, v: Long) =
    new Path(root, f"v$v%08d")

  private def claimPath(root: String, v: Long) =
    new Path(root, f"v$v%08d._claim")

  /** Current version number, 0 when never published. */
  def latestVersion(spark: SparkSession, root: String): Long = {
    val f = fs(spark, root)
    val ptr = new Path(root, "_latest")
    if (!f.exists(ptr)) 0L
    else {
      val in = f.open(ptr)
      try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim.toLong
      finally in.close()
    }
  }

  /** Write `df` as the next version and swap the pointer to it.
    * The data lands fully under the new version directory BEFORE the
    * pointer moves, so a crash mid-write leaves the previous version
    * live and the half-written directory unreferenced. Returns the
    * published version number. */
  /** True when `p` names a local (file:) path — the scheme whose
    * Hadoop create/rename primitives are check-then-act and need the
    * java.nio atomic equivalents under concurrency. */
  private[operators] def isLocal(f: org.apache.hadoop.fs.FileSystem): Boolean =
    f.getScheme == "file"

  private def nio(p: Path): java.nio.file.Path =
    java.nio.file.Paths.get(p.toUri.getPath)

  /** Atomic create-no-overwrite: O_EXCL via nio on local disk (Hadoop
    * RawLocalFileSystem.create(false) is exists-then-create, NOT
    * atomic); HDFS-style filesystems enforce it server-side. */
  private def atomicClaim(f: org.apache.hadoop.fs.FileSystem,
                          p: Path): Boolean =
    if (isLocal(f))
      try { java.nio.file.Files.createFile(nio(p)); true }
      catch { case _: java.io.IOException => false }
    else
      try { f.create(p, false).close(); true }
      catch { case _: java.io.IOException => false }

  /** Atomic rename-over: rename(2) via nio on local disk (FileContext
    * OVERWRITE is delete-then-rename locally — a crash or a racing
    * writer in that window loses the pointer); FileContext on
    * HDFS-style schemes where the overwrite rename IS atomic. */
  private[operators] def atomicRename(spark: SparkSession,
                           f: org.apache.hadoop.fs.FileSystem,
                           src: Path, dst: Path): Unit =
    if (isLocal(f))
      java.nio.file.Files.move(nio(src), nio(dst),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    else
      try {
        val fc = org.apache.hadoop.fs.FileContext.getFileContext(
          dst.toUri, spark.sparkContext.hadoopConfiguration)
        fc.rename(src, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      } catch {
        case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
          // no FileContext for this scheme: accept the tiny window
          // rather than failing the publish
          if (f.exists(dst)) f.delete(dst, false)
          require(f.rename(src, dst), s"pointer swap $src -> $dst failed")
      }

  /** Write `value` into the pointer via a uniquely-named tmp file +
    * atomic rename — ONE implementation for publish's settle loop and
    * vacuum's repair path (they had drifted: repair's bare
    * `_latest.tmp` escaped vacuum's own `_latest.tmp.` cleanup
    * prefix). On local disk the nio move bypasses Hadoop's
    * ChecksumFileSystem, which leaves a `.<tmp>.crc` sidecar behind —
    * reaped here so publishes don't leak one file each. */
  private def writePointer(spark: SparkSession,
                           f: org.apache.hadoop.fs.FileSystem,
                           root: String, value: Long,
                           tag: String): Unit = {
    val tmp = new Path(root, s"_latest.tmp.$tag")
    val out = f.create(tmp, true)
    try out.write(value.toString.getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    atomicRename(spark, f, tmp, new Path(root, "_latest"))
    if (isLocal(f))
      f.delete(new Path(root, s"._latest.tmp.$tag.crc"), false)
  }

  /** Newest version whose directory carries the `_SUCCESS` marker —
    * the "complete" set the pointer is allowed to land on. */
  private def maxComplete(spark: SparkSession, root: String): Long = {
    val f = fs(spark, root)
    versions(spark, root).reverse
      .find(v => f.exists(new Path(versionDir(root, v), "_SUCCESS")))
      .getOrElse(0L)
  }

  def publish(df: DataFrame, root: String): Long = {
    val spark = df.sparkSession
    val f = fs(spark, root)
    f.mkdirs(new Path(root))
    // claim a version number ATOMICALLY: a bare errorifexists parquet
    // write has a check-then-write window in which two concurrent
    // publishers both claim the same directory and silently merge
    // their files. Start above BOTH the pointer and anything on disk
    // (a crashed publish leaves an orphaned higher dir that must
    // never block the next publish).
    var v = math.max(latestVersion(spark, root),
      versions(spark, root).lastOption.getOrElse(0L))
    var claimed = false
    var attempts = 0
    while (!claimed) {
      require(attempts < 10000, s"cannot claim a version under $root")
      attempts += 1
      v += 1
      if (!f.exists(claimPath(root, v)) && !f.exists(versionDir(root, v)))
        claimed = atomicClaim(f, claimPath(root, v))
    }
    // overwrite is safe INSIDE the claim (and makes a retried job
    // re-runnable); the claim guarantees no other writer shares the dir
    df.write.mode("overwrite").parquet(versionDir(root, v).toString)
    // monotonic pointer: converge on max(own, newest COMPLETE version)
    // rather than swap-and-exit — a slower writer finishing an older
    // version would otherwise land its swap AFTER a newer one and
    // regress the pointer past completed data
    val ptr = new Path(root, "_latest")
    var settled = false
    var tries = 0
    while (!settled) {
      require(tries < 1000, s"pointer did not settle under $root")
      tries += 1
      val target = math.max(v, maxComplete(spark, root))
      if (latestVersion(spark, root) >= target) settled = true
      else try {
        // tmp is keyed by OUR claimed version (unique per writer):
        // converging writers must never share a tmp file, or one's
        // atomic move yanks it from under the other's write
        writePointer(spark, f, root, target, f"w$v%08d")
      } catch { // lost a concurrent swap: re-check and retry
        case scala.util.control.NonFatal(_) => Thread.sleep(5L)
      }
    }
    v
  }

  /** Path of the current version (for streaming static-side joins
    * that re-resolve per micro-batch). */
  def latestPath(spark: SparkSession, root: String): String = {
    val v = latestVersion(spark, root)
    require(v > 0, s"no published version under $root")
    versionDir(root, v).toString
  }

  /** Read the current version. */
  def readLatest(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(latestPath(spark, root))

  /** Read a specific version (time travel). */
  def readVersion(spark: SparkSession, root: String, v: Long): DataFrame = {
    val dir = versionDir(root, v)
    require(fs(spark, root).exists(dir), s"version $v not found under $root")
    spark.read.parquet(dir.toString)
  }

  /** All version numbers present on disk, ascending. */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val f = fs(spark, root)
    val rootPath = new Path(root)
    if (!f.exists(rootPath)) Seq.empty
    else f.listStatus(rootPath).toSeq
      .map(_.getPath.getName)
      .filter(_.matches("v\\d{8}"))
      .map(_.drop(1).toLong)
      .sorted
  }

  /** Drop versions beyond the newest `keep` (never the current
    * pointer target) plus orphaned directories ABOVE the pointer —
    * but an orphan only counts as a CRASHED publish once it is older
    * than `orphanMinAgeMs`: a directory above the pointer that is
    * younger than that is an IN-FLIGHT publish whose pointer swap
    * hasn't happened yet, and deleting it would race the writer
    * (Delta's retention-window idea, sized for a publish, not a
    * query). Bounded storage for daily publishes. */
  def vacuum(spark: SparkSession, root: String, keep: Int = 2,
             orphanMinAgeMs: Long = 6L * 3600 * 1000): Unit = {
    require(keep >= 1, s"keep must be >= 1, got $keep")
    val f = fs(spark, root)
    val current = latestVersion(spark, root)
    val onDisk = versions(spark, root)
    // pointer lost but versions exist (crash in the non-FileContext
    // delete-then-rename fallback window): every version would look
    // like an orphan and an aged vacuum would delete them ALL. Repair
    // the pointer to the max published version instead of vacuuming.
    if (current == 0L && onDisk.nonEmpty) {
      // repair to the newest COMPLETE version (_SUCCESS present) — the
      // max dir may itself be the half-written crashed publish
      val repaired = maxComplete(spark, root)
      if (repaired > 0L) writePointer(spark, f, root, repaired, "r0")
      return // never vacuum on a lost pointer — repair (above) or abort
    }
    // a writer that crashed right after LOSING the convergence race
    // (its rename regressed the pointer, its recheck never ran) leaves
    // the pointer below a newer COMPLETE version. That data must never
    // be classified an aged orphan and deleted — heal the pointer
    // forward to the same monotonic target publish converges on, THEN
    // classify. Healing requires the version's CLAIM file alongside
    // _SUCCESS: every sanctioned publish leaves one, while a stray
    // directory parked above the pointer by something else carries no
    // claim and stays an orphan.
    val healed = versions(spark, root).reverse.find(v =>
      v > current && f.exists(claimPath(root, v)) &&
        f.exists(new Path(versionDir(root, v), "_SUCCESS")))
    val cur = healed match {
      case Some(h) => writePointer(spark, f, root, h, "r1"); h
      case None => current
    }
    val now = System.currentTimeMillis()
    val (above, published) = onDisk.partition(_ > cur)
    val orphans = above.filter { v =>
      val dir = versionDir(root, v)
      now - f.getFileStatus(dir).getModificationTime >= orphanMinAgeMs
    }
    val old = published.filter(_ != cur)
      .dropRight(math.max(0, keep - 1))
    (orphans ++ old).foreach { v =>
      f.delete(versionDir(root, v), true)
      f.delete(claimPath(root, v), false)
    }
    // aged claim files with no data directory (a crash between claim
    // and write) and aged pointer tmp files (a lost swap race):
    // reclaimable like any orphan
    f.listStatus(new Path(root)).toSeq
      .filter(s => now - s.getModificationTime >= orphanMinAgeMs)
      .map(_.getPath)
      .filter(p =>
        (p.getName.matches("v\\d{8}\\._claim") &&
          !f.exists(new Path(root, p.getName.stripSuffix("._claim")))) ||
        p.getName.startsWith("_latest.tmp."))
      .foreach(p => f.delete(p, false))
  }
}
