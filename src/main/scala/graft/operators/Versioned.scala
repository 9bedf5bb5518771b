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
  * watermark. Writers: one at a time (last pointer swap wins — this
  * is a publish pointer, not a transaction log). Old versions stay
  * readable until [[vacuum]].
  */
object Versioned {

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def versionDir(root: String, v: Long) =
    new Path(root, f"v$v%08d")

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
  def publish(df: DataFrame, root: String): Long = {
    val spark = df.sparkSession
    val f = fs(spark, root)
    // next = above BOTH the pointer and any on-disk directory: a crash
    // after the data write but before the pointer swap leaves an
    // orphaned higher directory, which must never block the next
    // publish (errorifexists) — it gets skipped and later vacuumed
    val v = math.max(latestVersion(spark, root),
      versions(spark, root).lastOption.getOrElse(0L)) + 1
    df.write.mode("errorifexists")
      .parquet(versionDir(root, v).toString)
    val tmp = new Path(root, "_latest.tmp")
    val out = f.create(tmp, true)
    try out.write(v.toString.getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val ptr = new Path(root, "_latest")
    // rename OVER the old pointer in one step (the Incremental
    // watermark's primitive): delete-then-rename would open a window
    // where a crash loses the pointer entirely — after which
    // latestVersion()=0 and a vacuum would treat EVERY published
    // version as an orphan
    try {
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(
        ptr.toUri, spark.sparkContext.hadoopConfiguration)
      fc.rename(tmp, ptr, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch {
      case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
        // no FileContext for this scheme: accept the tiny window
        // rather than failing the publish
        if (f.exists(ptr)) f.delete(ptr, false)
        require(f.rename(tmp, ptr), s"pointer swap failed for $root v$v")
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
      onDisk.reverse.find(v =>
          f.exists(new Path(versionDir(root, v), "_SUCCESS")))
        .foreach { repaired =>
          val tmp = new Path(root, "_latest.tmp")
          val out = f.create(tmp, true)
          try out.write(repaired.toString.getBytes(
            java.nio.charset.StandardCharsets.UTF_8))
          finally out.close()
          val ptr = new Path(root, "_latest")
          require(f.rename(tmp, ptr),
            s"pointer repair failed for $root v$repaired")
        }
      return // never vacuum on a lost pointer — repair (above) or abort
    }
    val now = System.currentTimeMillis()
    val (above, published) = onDisk.partition(_ > current)
    val orphans = above.filter { v =>
      val dir = versionDir(root, v)
      now - f.getFileStatus(dir).getModificationTime >= orphanMinAgeMs
    }
    val old = published.filter(_ != current)
      .dropRight(math.max(0, keep - 1))
    (orphans ++ old).foreach(v => f.delete(versionDir(root, v), true))
  }
}
