package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-independent sampling and dataset splits —
  * the reproducibility primitive a training-data pipeline needs:
  * the SAME row lands in the SAME split on every run, every engine,
  * every cluster size, with no seed state to thread through.
  *
  * Mechanism: bucket each row by leading hex nibbles of `md5(key)` —
  * a pure column computation (codegen'd, no shuffle, no RNG), stable
  * across Spark/DuckDB/anything with md5. Rates are expressed in
  * 1/256ths (two nibbles) — fine enough for real split ratios while
  * staying exactly representable.
  *
  * This deliberately differs from `df.sample`/`sampleBy` (seeded
  * per-partition RNG: deterministic only for a fixed partitioning,
  * and not reproducible outside Spark). Hash-bucket sampling is the
  * standard technique for dataset versioning and train/test splits
  * (e.g. every web-scale corpus pipeline splits by URL hash).
  */
object Sampling {

  /** Bucket 0..255 from the first two hex digits of md5(key). */
  def bucket256(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 2), 16, 10).cast("int")

  /** Keep ~`num`/256 of rows, deterministically by key. */
  def deterministicSample(df: DataFrame, key: Column, num: Int): DataFrame = {
    require(num >= 0 && num <= 256, s"num/256 rate out of range: $num")
    df.filter(bucket256(key) < num)
  }

  /** Assign 'train' / 'val' / 'test' by key hash: buckets
    * [0, trainUpTo) → train, [trainUpTo, valUpTo) → val, rest test.
    * Disjoint, exhaustive, reproducible — and stable under corpus
    * growth (a row's split never depends on other rows). */
  def split(key: Column, trainUpTo: Int = 230, valUpTo: Int = 243): Column = {
    require(0 < trainUpTo && trainUpTo <= valUpTo && valUpTo <= 256,
      s"bad split bounds ($trainUpTo, $valUpTo)")
    when(bucket256(key) < trainUpTo, "train")
      .when(bucket256(key) < valUpTo, "val")
      .otherwise("test")
  }
}
