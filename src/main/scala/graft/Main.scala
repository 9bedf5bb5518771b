package graft

import graft.pipeline.{EventJson, Runner}
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** CLI entrypoint: run a reference-style pipeline event JSON through
  * the whole engine into a catalog directory.
  *
  * {{{
  * sbt "runMain graft.Main <event.json> <catalogDir> [quarantineDir]"
  * }}}
  */
object Main {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: graft.Main <event.json> <catalogDir> [quarantineDir]")
    val eventJson = Files.readString(Paths.get(args(0)))
    val catalogDir = args(1)
    val quarantineDir =
      if (args.length > 2) args(2) else catalogDir + "_quarantine"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(Runtime.getRuntime.availableProcessors, 32).toString)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try EventJson.parseAll(eventJson).foreach { ev =>
      Runner.runToCatalog(spark, ev, catalogDir, quarantineDir)
      println(s"[graft] ${ev.collection}: catalog=$catalogDir")
    } finally spark.stop()
  }
}
