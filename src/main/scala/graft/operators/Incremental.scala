package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets

/** Checkpointed high-watermark incremental processing for BATCH jobs.
  *
  * Structured Streaming owns the file-arrival case (see
  * `streaming/Publication`); this is the complementary table-side
  * primitive: "process only rows with ts beyond what the last
  * successful run processed", with the watermark persisted durably so
  * re-runs are incremental and crash-safe.
  *
  * Contract:
  *  - [[newRows]] filters `tsCol > watermark` (a pushed-down range
  *    predicate — on a ts-partitioned or z-ordered table the scan
  *    prunes to the new tail, so cost tracks the DELTA, not the table);
  *  - [[commit]] advances the watermark via write-temp-then-rename, so
  *    a crash between process and commit replays the same batch (at-
  *    least-once; pair with idempotent sinks like [[Publish]]);
  *  - rows arriving later with `ts <= watermark` are skipped by
  *    design — callers needing lateness tolerance subtract a fixed
  *    `allowedLateness` and deduplicate downstream.
  */
object Incremental {

  /** Current watermark, or None before the first commit. */
  def watermark(spark: SparkSession, checkpoint: String): Option[Long] = {
    val p = new Path(checkpoint)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(in.readAllBytes(), StandardCharsets.UTF_8)
        .trim.toLong)
      finally in.close()
    }
  }

  /** Rows strictly beyond the checkpointed watermark. `tsCol` must be
    * LONG (callers convert timestamps to epoch micros — exact, no
    * zone ambiguity in the checkpoint file). */
  def newRows(df: DataFrame, tsCol: String, checkpoint: String,
              allowedLateness: Long = 0L): DataFrame =
    watermark(df.sparkSession, checkpoint) match {
      case Some(wm) => df.filter(col(tsCol) > lit(wm - allowedLateness))
      case None     => df
    }

  /** Advance the watermark to the max `tsCol` in `processed` (no-op on
    * an empty batch). Atomic: temp file + rename. Call AFTER the
    * batch's sink has committed. */
  def commit(processed: DataFrame, tsCol: String, checkpoint: String): Option[Long] = {
    val maxTs = processed.agg(max(col(tsCol))).head()
    if (maxTs.isNullAt(0)) watermark(processed.sparkSession, checkpoint)
    else {
      val wm = maxTs.getLong(0)
      val prev = watermark(processed.sparkSession, checkpoint)
      val next = math.max(wm, prev.getOrElse(Long.MinValue))
      val hconf = processed.sparkSession.sparkContext.hadoopConfiguration
      val p = new Path(checkpoint)
      val fs = p.getFileSystem(hconf)
      val tmp = new Path(checkpoint + ".tmp")
      val out = fs.create(tmp, true)
      try out.write(next.toString.getBytes(StandardCharsets.UTF_8))
      finally out.close()
      // Rename OVER the old file atomically (Versioned.atomicRename:
      // rename(2) via java.nio on local disk, where FileContext
      // OVERWRITE is itself delete-then-rename — the exact crash
      // window that would lose the watermark and reprocess the whole
      // table; FileContext on HDFS-style schemes where the overwrite
      // rename IS atomic).
      Versioned.atomicRename(processed.sparkSession, fs, tmp, p)
      Some(next)
    }
  }
}
