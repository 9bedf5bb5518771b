package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout maintenance: small-file compaction, multi-dimensional
  * (z-order) clustering, and a min/max file-skipping index.
  *
  * At 100 TB the dominant cost of many pipelines is the scan, and the
  * scan is shaped by layout: thousands of KB-sized files destroy task
  * scheduling and S3 listing; rows scattered randomly across files
  * defeat parquet min/max pruning. These operators are the maintenance
  * passes a long-lived catalog needs:
  *
  *  - [[compact]] rewrites a directory into ~target-sized files with
  *    ZERO shuffle: it lets the file scan itself bin-pack small files
  *    into target-sized partitions (`spark.sql.files.maxPartitionBytes`
  *    + `openCostInBytes`) and writes each partition straight out.
  *  - [[zorderWrite]] interleaves the quantile-bucket bits of several
  *    columns into a Morton code, range-partitions on it, and writes —
  *    so a filter on ANY of the clustered dimensions touches a small
  *    band of files. Quantile cutpoints come from `approxQuantile` (one
  *    sampled pass, driver gets only the cut arrays), so skewed columns
  *    still fill all buckets.
  *  - [[buildSkipIndex]] / [[prunedFiles]] persist per-file min/max
  *    stats next to the data (`_skip_index`, underscore-hidden from
  *    readers) and answer "which files can contain x in [lo, hi]"
  *    without opening any footer — the same contract as Delta's file
  *    statistics, sized at one row per file.
  */
object Layout {

  case class CompactStats(inFiles: Int, inBytes: Long, outFiles: Int)

  private def dataFiles(spark: SparkSession, dir: String) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
  }

  /** Deterministic shuffle-and-shard — the training-output stage:
    * assign every row a shard by key hash and a pseudorandom-but-
    * reproducible position WITHIN its shard (md5 order), so "shuffle
    * the corpus and write N shards" produces identical shard contents
    * on every engine, run, and cluster size — no RNG, no seed state.
    * The determinism contract requires `key` to be UNIQUE per row (a
    * doc id): the sort key is (shard, md5(key), key), so duplicate
    * keys leave their relative order to Spark's unstable sort. Under
    * corpus growth the RELATIVE order of existing rows within a shard
    * is preserved (a row's shard and sort key never depend on other
    * rows) — new rows interleave at their md5 positions, so this is
    * order stability, not byte-level file append stability.
    *
    * Scale shape: one hash repartition on the shard id (each task
    * owns whole shards) + an in-partition sort — no global sort, no
    * driver state. Write with
    * `.write.partitionBy("shard")` for one directory per shard. */
  def shuffledShards(df: DataFrame, key: Column, nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    require(!df.columns.contains("shard") && !df.columns.contains("__h"),
      "shuffledShards adds 'shard' (and a temp '__h') — rename the " +
        "input's conflicting column first instead of losing it silently")
    val h = md5(key.cast("string"))
    val shard = pmod(conv(substring(h, 1, 8), 16, 10).cast("long"),
      lit(nShards.toLong)).cast("int")
    df.withColumn("shard", shard)
      .withColumn("__h", h)
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("__h"), key.cast("string"))
      .drop("__h")
  }

  /** Rewrite `inDir` (parquet) into `outDir` targeting `targetBytes`
    * per file. No shuffle: the scan packs small files into
    * target-sized partitions and each partition writes one file. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
              targetBytes: Long): CompactStats = {
    require(targetBytes > 0)
    val in = dataFiles(spark, inDir)
    // A cloned session shares the SparkContext but has its own SQLConf,
    // so the scan-packing knobs never leak into (or race with) queries
    // planned concurrently on the caller's session. The caller's
    // runtime conf (compression codec, timezone, ...) is carried over —
    // newSession() alone would silently reset it to builder defaults.
    val s2 = spark.newSession()
    spark.conf.getAll.foreach { case (k, v) =>
      try s2.conf.set(k, v)
      catch { case _: org.apache.spark.sql.AnalysisException => () }
    }
    s2.conf.set("spark.sql.files.maxPartitionBytes", targetBytes.toString)
    // openCost=0: pack purely by real bytes, so many tiny files
    // coalesce into one partition instead of 4 MB-each phantom cost
    s2.conf.set("spark.sql.files.openCostInBytes", "0")
    s2.read.parquet(inDir).write.mode("overwrite").parquet(outDir)
    CompactStats(in.size, in.map(_.getLen).sum,
      dataFiles(spark, outDir).count(_.getPath.getName.endsWith(".parquet")))
  }

  /** Quantile-bucket id (0 until 2^bits) of `c` given ascending cut
    * points — a fold over a broadcast literal array, fully codegen'd. */
  private[graft] def bucketOf(c: Column, cuts: Seq[Double]): Column =
    aggregate(typedlit(cuts), lit(0),
      (acc, cut) => acc + when(c.cast("double") >= cut, 1).otherwise(0))

  /** Morton (z-order) interleave of per-dimension bucket ids: bit j of
    * dimension i lands at position j*nDims + i. Pure long bit ops. */
  private[graft] def interleaveBits(buckets: Seq[Column],
                                        bits: Int): Column = {
    val n = buckets.size
    // bit 63 is the sign: letting any bit land there (or wrap mod 64)
    // would corrupt the range-partition ordering silently
    require(n * bits <= 63,
      s"z-order width ${n}x$bits exceeds 63 bits; lower bitsPerDim")
    var z = lit(0L)
    for (j <- 0 until bits; i <- 0 until n) {
      val bit = shiftright(buckets(i).cast("long"), j).bitwiseAND(lit(1L))
      z = z.bitwiseOR(shiftleft(bit, j * n + i))
    }
    z
  }

  /** Z-order clustered write: bucket each column by its quantile cuts
    * (2^bitsPerDim buckets), interleave to a Morton code, range
    * partition into `numFiles` and write. One sampled quantile pass +
    * one range exchange — the same cost as a plain global sort. */
  def zorderWrite(df: DataFrame, cols: Seq[String], outDir: String,
                  numFiles: Int, bitsPerDim: Int = 8): Unit = {
    require(cols.nonEmpty && numFiles > 0 && bitsPerDim > 0 && bitsPerDim <= 16)
    val nBuckets = 1 << bitsPerDim
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    val cuts = df.stat.approxQuantile(cols.toArray, probs, 0.001)
    val buckets = cols.zip(cuts).map { case (c, cut) =>
      bucketOf(col(c), cut.toSeq)
    }
    df.withColumn("_z", interleaveBits(buckets, bitsPerDim))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(outDir)
  }

  /** One row per data file: `file`, and min/max per stat column. Stored
    * under `outDir/_skip_index` (underscore → invisible to readers). */
  def buildSkipIndex(spark: SparkSession, dir: String,
                     cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c => Seq(
      min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))
    val idx = spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
    idx.coalesce(1).write.mode("overwrite").parquet(s"$dir/_skip_index")
    idx
  }

  /** Files that can contain rows with `column` in [lo, hi], per the
    * persisted skip index. Driver-side result: one row per file. */
  def prunedFiles(spark: SparkSession, dir: String, column: String,
                  lo: Any, hi: Any): Seq[String] = {
    spark.read.parquet(s"$dir/_skip_index")
      .filter(col(s"${column}_max") >= lit(lo) &&
        col(s"${column}_min") <= lit(hi))
      .select("file").collect().map(_.getString(0)).toSeq
  }

  /** Read only the files that can satisfy `column` in [lo, hi]; the
    * caller still applies the row-level filter. When the index prunes
    * every file, returns an empty frame with the dataset's schema. */
  def prunedRead(spark: SparkSession, dir: String, column: String,
                 lo: Any, hi: Any): DataFrame = {
    val files = prunedFiles(spark, dir, column, lo, hi)
    if (files.isEmpty)
      spark.read.parquet(dir).limit(0)
    else spark.read.parquet(files: _*)
  }
}
