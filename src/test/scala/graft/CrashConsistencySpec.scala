package graft

import graft.operators.{CatalogOps, Incremental, Versioned}
import graft.tools.{FaultyFileSystem, FaultyFs}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Randomized-free, EXHAUSTIVE crash-consistency property sweep for
  * the storage contracts (r12 found three crash-window bugs by
  * reading; this systematizes the search): every mutating FS
  * operation of publish / vacuum / watermark-commit /
  * partition-replace is an injection point — the `faulty://` wrapper
  * ([[graft.tools.FaultyFileSystem]]) lets the first N ops land and
  * fails every later one, modeling a hard crash at op N+1. After each
  * simulated crash the on-disk state is checked against the
  * contracts' invariants through a FRESH (fault-free) view, then the
  * documented recovery path must restore full health:
  *
  *  - publish: a completed version is never lost; the pointer only
  *    ever names a version with `_SUCCESS` (or is absent); vacuum +
  *    re-publish always recovers.
  *  - vacuum: the current version survives any partial vacuum; a
  *    re-run converges.
  *  - Incremental.commit: the watermark file is never truncated —
  *    a reader sees the old value, the new value, or (only inside the
  *    FileContext-unsupported delete-then-rename fallback window that
  *    real HDFS-style schemes don't take) no file at all, which
  *    merely replays the batch (the documented at-least-once);
  *    re-commit converges.
  *  - CatalogOps partition replace: untouched collections keep every
  *    row at every N; an affected collection is observed whole-old,
  *    whole-new, or absent-with-its-replacement-STAGED (never a
  *    partial mix), and the staged copy completes recovery.
  *
  * The sweep bound is measured, not guessed: a fault-free dry run
  * counts the op budget, and the sweep covers 0..budget inclusive
  * (the last iteration crashes nothing and doubles as the green
  * path). */
class CrashConsistencySpec extends SparkSuite {
  import spark.implicits._

  spark.sparkContext.hadoopConfiguration
    .set("fs.faulty.impl", classOf[FaultyFileSystem].getName)

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def faulty(path: String): String = "faulty://" + path

  /** One-partition two-row frame tagged by `gen` so reads identify
    * which publish the data came from. */
  private def frame(gen: Int): DataFrame =
    spark.range(2).select(col("id"), lit(gen).as("gen")).coalesce(1)

  private def gens(path: String): Set[Int] =
    spark.read.parquet(path).select("gen").distinct()
      .collect().map(_.getInt(0)).toSet

  test("publish: every crash point leaves a complete pointer target " +
    "and vacuum+republish recovers") {
    // measure the op budget of one full publish
    val probe = tmp("crash_pub_probe")
    FaultyFs.disarm()
    Versioned.publish(frame(0), faulty(probe))
    val budget = FaultyFs.used
    assert(budget > 5, s"suspiciously few mutating ops ($budget)")
    for (n <- 0L to budget) {
      val root = tmp(s"crash_pub_$n")
      try {
        Versioned.publish(frame(1), faulty(root)) // baseline v1, no faults
        FaultyFs.arm(n)
        val crashed =
          try { Versioned.publish(frame(2), faulty(root)); false }
          catch { case _: Throwable => true }
        FaultyFs.disarm()
        // invariants through a fault-free view
        val ptr = Versioned.latestVersion(spark, root)
        val f = new Path(root).getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        if (ptr == 0L) {
          // pointer ABSENT: allowed only in the FileContext-unsupported
          // delete-then-rename fallback window (absent, never partial —
          // and vacuum's repair path below must bring it back)
          assert(crashed, s"n=$n: publish succeeded but pointer lost")
        } else {
          assert(f.exists(new Path(f"$root/v$ptr%08d/_SUCCESS")),
            s"n=$n: pointer $ptr names an incomplete version")
          val seen = gens(f"$root/v$ptr%08d")
          assert(seen == Set(1) || seen == Set(2),
            s"n=$n: partial swap visible: $seen")
          if (!crashed) assert(seen == Set(2), s"n=$n: publish returned " +
            "success but the pointer target is stale")
        }
        assert(gens(f"$root/v${1L}%08d") == Set(1),
          s"n=$n: completed v1 data damaged by a crashed v2 publish")
        // recovery: the documented path — vacuum (heal + reap), publish
        Versioned.vacuum(spark, root, keep = 1, orphanMinAgeMs = 0L)
        Versioned.publish(frame(3), faulty(root))
        assert(gens(Versioned.latestPath(spark, root)) == Set(3),
          s"n=$n: recovery publish not visible")
      } finally FaultyFs.disarm()
    }
  }

  test("vacuum: every crash point preserves the current version; " +
    "a re-run converges") {
    val probeRoot = tmp("crash_vac_probe")
    FaultyFs.disarm()
    (1 to 3).foreach(g => Versioned.publish(frame(g), faulty(probeRoot)))
    FaultyFs.disarm()
    Versioned.vacuum(spark, faulty(probeRoot), keep = 1, orphanMinAgeMs = 0L)
    val budget = FaultyFs.used
    assert(budget >= 1, s"vacuum performed no mutating ops ($budget)")
    for (n <- 0L to budget) {
      val root = tmp(s"crash_vac_$n")
      try {
        (1 to 3).foreach(g => Versioned.publish(frame(g), faulty(root)))
        FaultyFs.arm(n)
        try Versioned.vacuum(spark, faulty(root), keep = 1,
          orphanMinAgeMs = 0L)
        catch { case _: Throwable => () }
        FaultyFs.disarm()
        val ptr = Versioned.latestVersion(spark, root)
        assert(ptr == 3L, s"n=$n: vacuum moved/lost the pointer: $ptr")
        assert(gens(f"$root/v$ptr%08d") == Set(3),
          s"n=$n: current version damaged by a crashed vacuum")
        Versioned.vacuum(spark, root, keep = 1, orphanMinAgeMs = 0L)
        assert(Versioned.versions(spark, root) == Seq(3L),
          s"n=$n: vacuum re-run did not converge")
      } finally FaultyFs.disarm()
    }
  }

  test("Incremental.commit: the watermark is never truncated and " +
    "re-commit converges at every crash point") {
    val batch = spark.range(1).select(lit(200L).as("ts"))
    val probe = tmp("crash_wm_probe") + "/wm"
    FaultyFs.disarm()
    Incremental.commit(batch, "ts", faulty(probe))
    Incremental.commit(batch, "ts", faulty(probe)) // overwrite path too
    val budget = FaultyFs.used
    for (n <- 0L to budget) {
      val ckpt = tmp(s"crash_wm_$n") + "/wm"
      try {
        val first = spark.range(1).select(lit(100L).as("ts"))
        Incremental.commit(first, "ts", faulty(ckpt)) // baseline wm=100
        FaultyFs.arm(n)
        try Incremental.commit(batch, "ts", faulty(ckpt))
        catch { case _: Throwable => () }
        FaultyFs.disarm()
        // never truncated: parses to old, new, or (fallback window
        // only) absent — anything else is corruption
        val wm = Incremental.watermark(spark, ckpt)
        assert(wm.isEmpty || wm.contains(100L) || wm.contains(200L),
          s"n=$n: watermark corrupted: $wm")
        Incremental.commit(batch, "ts", faulty(ckpt))
        assert(Incremental.watermark(spark, ckpt).contains(200L),
          s"n=$n: re-commit did not converge")
      } finally FaultyFs.disarm()
    }
  }

  private def catalogItems(): DataFrame = Seq(
    ("a", "a1"), ("a", "a2"), ("a", "a3"),
    ("b", "b1"), ("b", "b2"),
    ("c", "c1")) // c: untouched bystander collection
    .toDF("collection", "id").coalesce(1)

  test("CatalogOps partition replace: bystanders intact, affected " +
    "collections whole-old / whole-new / staged, at every crash point") {
    val delIds = Seq("a1", "b2") // touches collections a AND b
    def setup(dir: String): String = {
      val path = s"$dir/cat"
      catalogItems().write.partitionBy("collection")
        .parquet(faulty(path))
      path
    }
    val probe = setup(tmp("crash_cat_probe"))
    FaultyFs.disarm()
    CatalogOps.delete(spark, faulty(probe), delIds)
    val budget = FaultyFs.used
    assert(budget > 5, s"suspiciously few mutating ops ($budget)")
    for (n <- 0L to budget) {
      val path = setup(tmp(s"crash_cat_$n"))
      try {
        FaultyFs.arm(n)
        try CatalogOps.delete(spark, faulty(path), delIds)
        catch { case _: Throwable => () }
        FaultyFs.disarm()
        val f = new Path(path).getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        def idsIn(p: String): Set[String] =
          if (!f.exists(new Path(p))) Set.empty
          else spark.read.parquet(p).select("id")
            .collect().map(_.getString(0)).toSet
        // bystander collection: every row, at every N
        assert(idsIn(s"$path/collection=c") == Set("c1"),
          s"n=$n: bystander collection lost rows")
        // staged replacement dir (if any): the one this call created
        val staged = f.listStatus(new Path(path).getParent)
          .map(_.getPath).filter(_.getName.startsWith(".cat_staging_"))
        for (col2 <- Seq("a", "b")) {
          val old = if (col2 == "a") Set("a1", "a2", "a3") else Set("b1", "b2")
          val nw = old -- delIds
          val got = idsIn(s"$path/collection=$col2")
          if (got == old || got == nw) () // whole-old or whole-new
          else if (got.isEmpty) {
            // absent: its replacement must be STAGED and complete
            val inStaging = staged.map(s =>
              idsIn(s"$s/collection=$col2")).find(_ == nw)
            assert(inStaging.isDefined,
              s"n=$n: collection $col2 missing and no complete staged " +
                s"copy (staging: ${staged.mkString(",")})")
            // recovery: the documented manual move
            val src = staged.find(s =>
              idsIn(s"$s/collection=$col2") == nw).get
            assert(f.rename(new Path(src, s"collection=$col2"),
              new Path(path, s"collection=$col2")),
              s"n=$n: staged recovery rename failed")
          } else fail(s"n=$n: collection $col2 in PARTIAL state: $got " +
            s"(old=$old new=$nw)")
        }
        // after any needed staged moves, a fault-free delete re-run
        // (no-op when already applied) must land the final state
        CatalogOps.delete(spark, faulty(path), delIds)
        val finalIds = spark.read.parquet(path).select("id")
          .collect().map(_.getString(0)).toSet
        assert(finalIds == Set("a2", "a3", "b1", "c1"),
          s"n=$n: recovery did not converge: $finalIds")
      } finally FaultyFs.disarm()
    }
  }
}
