package graft

import graft.operators.Incremental
import org.apache.spark.sql.functions._
import java.nio.file.Files

class IncrementalSpec extends SparkSuite {
  import spark.implicits._

  private def ckpt() =
    Files.createTempDirectory("inc").resolve("wm").toString

  test("first run sees everything; second run sees only the delta") {
    val cp = ckpt()
    val batch1 = Seq((1L, 100L), (2L, 200L), (3L, 300L)).toDF("id", "ts")

    val run1 = Incremental.newRows(batch1, "ts", cp)
    assert(run1.count() === 3)
    assert(Incremental.commit(run1, "ts", cp) === Some(300L))
    assert(Incremental.watermark(spark, cp) === Some(300L))

    // new arrivals + one replayed old row (skipped)
    val batch2 = batch1.union(
      Seq((4L, 400L), (5L, 250L)).toDF("id", "ts"))
    val run2 = Incremental.newRows(batch2, "ts", cp)
    assert(run2.select("id").as[Long].collect().toSet === Set(4L))
    Incremental.commit(run2, "ts", cp)
    assert(Incremental.watermark(spark, cp) === Some(400L))
  }

  test("allowedLateness re-admits a bounded window") {
    val cp = ckpt()
    val b1 = Seq((1L, 1000L)).toDF("id", "ts")
    Incremental.commit(b1, "ts", cp)
    val b2 = Seq((2L, 950L), (3L, 800L)).toDF("id", "ts")
    val got = Incremental.newRows(b2, "ts", cp, allowedLateness = 100L)
      .select("id").as[Long].collect().toSet
    assert(got === Set(2L))
  }

  test("empty batch commit keeps the old watermark") {
    val cp = ckpt()
    val b1 = Seq((1L, 10L)).toDF("id", "ts")
    Incremental.commit(b1, "ts", cp)
    val empty = b1.filter(lit(false))
    assert(Incremental.commit(empty, "ts", cp) === Some(10L))
    assert(Incremental.watermark(spark, cp) === Some(10L))
  }

  test("commit never moves the watermark backwards") {
    val cp = ckpt()
    Incremental.commit(Seq((1L, 500L)).toDF("id", "ts"), "ts", cp)
    Incremental.commit(Seq((2L, 400L)).toDF("id", "ts"), "ts", cp)
    assert(Incremental.watermark(spark, cp) === Some(500L))
  }

  test("the watermark filter pushes down to the scan") {
    val cp = ckpt()
    val dir = Files.createTempDirectory("inc-data").toString
    val df = (1L to 100L).map(i => (i, i * 10L)).toDF("id", "ts")
    df.write.mode("overwrite").parquet(dir)
    Incremental.commit(df, "ts", cp)

    val plan = Incremental.newRows(spark.read.parquet(dir), "ts", cp)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThan(ts,1000)"), s"no pushdown in:\n$plan")
  }
}
