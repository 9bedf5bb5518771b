package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for the connected-components driver union-find fast
  * path (`Dedup.connectedComponentsStars` at or below
  * `driverMaxEdges`): builds a synthetic near-dup-shaped edge set at
  * the 4M-edge threshold, runs the driver path, and prints wall time
  * + driver heap before/after — the measured basis for
  * `Dedup.DefaultDriverMaxEdges`'s documented envelope.
  * `sbt "Test/runMain graft.tools.CcScaleProbe [nEdges]"`. */
object CcScaleProbe {
  def main(args: Array[String]): Unit = {
    val nEdges = args.headOption.map(_.toLong).getOrElse(4000000L)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def heapMb(): Long = {
      val rt = Runtime.getRuntime
      System.gc(); Thread.sleep(200); System.gc()
      (rt.totalMemory - rt.freeMemory) / (1024 * 1024)
    }
    // near-dup shape: many small chains + a few big components, long
    // string ids (the expensive case for driver heap)
    val pairs = spark.range(nEdges).select(
      concat(lit("doc-"), lpad((col("id") / 3).cast("string"), 12, "0"))
        .as("id_a"),
      concat(lit("doc-"), lpad(((col("id") / 3) + (col("id") % 3) + 1)
        .cast("string"), 12, "0")).as("id_b"))
    val before = heapMb()
    val t0 = System.nanoTime()
    val comps = graft.llm.Dedup.connectedComponentsStars(
      pairs, driverMaxEdges = math.max(nEdges, 1L))
    val n = comps.count()
    val secs = (System.nanoTime() - t0) / 1e9
    val after = heapMb()
    println(f"edges=$nEdges nodes=$n time=$secs%.1fs " +
      f"driverHeap=${before}MB->${after}MB " +
      f"maxHeap=${Runtime.getRuntime.maxMemory / (1024 * 1024)}MB")
    spark.stop()
  }
}
