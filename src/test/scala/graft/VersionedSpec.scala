package graft

import graft.operators.Versioned
import java.nio.file.Files

/** Versioned table pointers ([[graft.operators.Versioned]]). */
class VersionedSpec extends SparkSuite {
  import spark.implicits._

  private def root(): String =
    Files.createTempDirectory("versioned").toString + "/tbl"

  test("publish increments versions; readLatest follows the pointer") {
    val r = root()
    assert(Versioned.latestVersion(spark, r) == 0L)
    assert(Versioned.publish(Seq(1, 2).toDF("x"), r) == 1L)
    assert(Versioned.publish(Seq(3).toDF("x"), r) == 2L)
    assert(Versioned.readLatest(spark, r)
      .collect().map(_.getInt(0)).toSet == Set(3))
    assert(Versioned.versions(spark, r) == Seq(1L, 2L))
  }

  test("time travel reads any retained version") {
    val r = root()
    Versioned.publish(Seq(1).toDF("x"), r)
    Versioned.publish(Seq(2).toDF("x"), r)
    assert(Versioned.readVersion(spark, r, 1L)
      .collect().map(_.getInt(0)).toSet == Set(1))
    intercept[IllegalArgumentException](Versioned.readVersion(spark, r, 9L))
  }

  test("an orphaned directory above the pointer never blocks publish") {
    val r = root()
    Versioned.publish(Seq(1).toDF("x"), r)
    // simulate a crashed publish: v2 data landed, pointer never swapped
    Seq(99).toDF("x").write.parquet(r + "/v00000002")
    assert(Versioned.latestVersion(spark, r) == 1L)
    val v = Versioned.publish(Seq(2).toDF("x"), r)
    assert(v == 3L)
    assert(Versioned.readLatest(spark, r)
      .collect().map(_.getInt(0)).toSet == Set(2))
  }

  test("vacuum keeps the newest versions and removes aged orphans") {
    val r = root()
    (1 to 4).foreach(i => Versioned.publish(Seq(i).toDF("x"), r))
    // orphan above the pointer
    Seq(99).toDF("x").write.parquet(r + "/v00000009")
    // a FRESH orphan is an in-flight publish: default vacuum keeps it
    Versioned.vacuum(spark, r, keep = 2)
    assert(Versioned.versions(spark, r) == Seq(3L, 4L, 9L))
    // aged out (threshold 0 for the test): the crashed publish goes
    Versioned.vacuum(spark, r, keep = 2, orphanMinAgeMs = 0L)
    assert(Versioned.versions(spark, r) == Seq(3L, 4L))
    assert(Versioned.readLatest(spark, r)
      .collect().map(_.getInt(0)).toSet == Set(4))
    // current version always survives even with keep = 1
    Versioned.vacuum(spark, r, keep = 1)
    assert(Versioned.versions(spark, r) == Seq(4L))
  }

  test("readers of the previous version survive a concurrent publish") {
    val r = root()
    Versioned.publish(Seq(1).toDF("x"), r)
    val v1 = Versioned.readVersion(spark, r, 1L) // plan bound to v1 dir
    Versioned.publish(Seq(2).toDF("x"), r)
    assert(v1.collect().map(_.getInt(0)).toSet == Set(1))
  }

  test("two writers racing publish: distinct versions, pointer lands on one") {
    val r = root()
    Versioned.publish(Seq(0).toDF("x"), r)
    // race N concurrent publishers; each must land a COMPLETE distinct
    // version (errorifexists serializes the data-dir claim; the loop
    // retries the claimed-number collision like a real concurrent job)
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val n = 4
    val pool = Executors.newFixedThreadPool(n)
    val start = new CountDownLatch(1)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    (1 to n).foreach { i =>
      pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          // the claim protocol makes a single call race-safe: no
          // application-side retry loop should be needed
          try results.add(Versioned.publish(Seq(i * 100).toDF("x"), r))
          catch { case scala.util.control.NonFatal(e) => errors.add(e) }
        }
      })
    }
    start.countDown()
    pool.shutdown()
    assert(pool.awaitTermination(120, TimeUnit.SECONDS))
    import scala.jdk.CollectionConverters._
    assert(errors.isEmpty, errors.asScala.mkString(","))
    val landed = results.asScala.toSeq.sorted
    // all four landed distinct versions above the seed
    assert(landed.size == n && landed.distinct.size == n)
    assert(landed.forall(_ > 1L))
    // the pointer is MONOTONIC: it ends on the highest landed version
    // even when a lower-numbered writer finished last
    val cur = Versioned.latestVersion(spark, r)
    assert(cur == landed.max)
    assert(Versioned.readLatest(spark, r).count() == 1)
    // every landed version is complete and time-travel readable
    landed.foreach(v =>
      assert(Versioned.readVersion(spark, r, v).count() == 1))
  }

  test("vacuum with a lost pointer repairs to the newest complete version") {
    val r = root()
    (1 to 3).foreach(i => Versioned.publish(Seq(i).toDF("x"), r))
    // crash window of the delete-then-rename fallback: pointer gone
    val f = new org.apache.hadoop.fs.Path(r, "_latest")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(r, "_latest"), false)
    // plus a half-written publish above (no _SUCCESS): must NOT become
    // the repaired pointer target
    val half = new org.apache.hadoop.fs.Path(r, "v00000007")
    f.mkdirs(half)
    f.create(new org.apache.hadoop.fs.Path(half, "part-00000.parquet"))
      .close()
    assert(Versioned.latestVersion(spark, r) == 0L)
    // an aged vacuum in this state previously classified EVERY version
    // as an orphan; now it repairs the pointer and deletes nothing
    Versioned.vacuum(spark, r, keep = 1, orphanMinAgeMs = 0L)
    assert(Versioned.versions(spark, r) == Seq(1L, 2L, 3L, 7L))
    assert(Versioned.latestVersion(spark, r) == 3L)
    assert(Versioned.readLatest(spark, r)
      .collect().map(_.getInt(0)).toSet == Set(3))
    // a SECOND vacuum (pointer healthy again) applies normal retention
    Versioned.vacuum(spark, r, keep = 1, orphanMinAgeMs = 0L)
    assert(Versioned.versions(spark, r) == Seq(3L))
  }

  test("vacuum during an active reader: retained versions keep serving") {
    val r = root()
    (1 to 3).foreach(i => Versioned.publish(Seq(i).toDF("x"), r))
    val oldReader = Versioned.readVersion(spark, r, 2L)
    // keep=2 retains v2: the reader's version survives the vacuum
    Versioned.vacuum(spark, r, keep = 2)
    assert(oldReader.collect().map(_.getInt(0)).toSet == Set(2))
    // keep=1 drops v2 — the documented retention tradeoff (a reader
    // outside the retention window loses its files, like Delta vacuum)
    Versioned.vacuum(spark, r, keep = 1)
    assert(Versioned.versions(spark, r) == Seq(3L))
    intercept[Exception] {
      Versioned.readVersion(spark, r, 2L).collect()
    }
    // the current version is untouched throughout
    assert(Versioned.readLatest(spark, r)
      .collect().map(_.getInt(0)).toSet == Set(3))
  }

  test("publish is the swap primitive behind stream-vs-catalog dedup") {
    // a static frame re-resolved through latestPath picks up a swap
    val r = root()
    Versioned.publish(Seq(("a", 1L)).toDF("k", "v"), r)
    val before = Versioned.readLatest(spark, r).count()
    Versioned.publish(Seq(("a", 1L), ("b", 2L)).toDF("k", "v"), r)
    val after = Versioned.readLatest(spark, r).count()
    assert(before == 1L && after == 2L)
  }

  test("vacuum heals a regressed pointer instead of deleting the " +
    "newer complete version as an orphan") {
    val r = root()
    Versioned.publish(Seq(1).toDF("x"), r)
    Versioned.publish(Seq(2).toDF("x"), r)
    // simulate the crashed convergence race: a slow writer's rename
    // regressed the pointer to 1 and the writer died before its
    // recheck could fix it
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(r, "_latest"), "1")
    assert(Versioned.latestVersion(spark, r) == 1L)
    // an aged vacuum must NOT classify complete v2 (claim + _SUCCESS)
    // as an orphan — it heals the pointer forward and keeps the data
    Versioned.vacuum(spark, r, keep = 2, orphanMinAgeMs = 0L)
    assert(Versioned.latestVersion(spark, r) == 2L)
    assert(Versioned.versions(spark, r).contains(2L))
    assert(Versioned.readLatest(spark, r)
      .collect().map(_.getInt(0)).toSet == Set(2))
  }
}
