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

  test("publish is the swap primitive behind stream-vs-catalog dedup") {
    // a static frame re-resolved through latestPath picks up a swap
    val r = root()
    Versioned.publish(Seq(("a", 1L)).toDF("k", "v"), r)
    val before = Versioned.readLatest(spark, r).count()
    Versioned.publish(Seq(("a", 1L), ("b", 2L)).toDF("k", "v"), r)
    val after = Versioned.readLatest(spark, r).count()
    assert(before == 1L && after == 2L)
  }
}
