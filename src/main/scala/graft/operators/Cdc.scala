package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture application: fold a keyed changelog of
  * upserts/deletes onto a base snapshot to produce the current table
  * version — the nightly-compaction primitive behind any incrementally
  * maintained 100 TB table (the batch analog of a Delta/Hudi MERGE).
  *
  * Scale shape: base and changelog are unioned and aggregated with ONE
  * keyed shuffle — `max_by(payload, version)` picks the latest row per
  * key with map-side partial aggregation, so a key with a million
  * changelog entries reduces inside each input partition before
  * anything moves. Never a per-version self-join (version-count
  * shuffles) and never a global window sort. Deletes survive to the
  * aggregate (a delete must be able to beat an earlier upsert) and are
  * dropped after it.
  */
object Cdc {

  /** Latest-wins fold of `changelog` over `base`.
    *
    * @param base      current snapshot; one row per key (not enforced —
    *                  duplicate base keys share version (-inf) and fold
    *                  deterministically by greatest payload struct
    *                  order, the final tie-break below)
    * @param changelog change rows carrying the same value columns as
    *                  `base` plus `opCol` ∈ {upsert, delete} (delete
    *                  rows may carry null values), `tsCol` the change
    *                  time, and `seqCol` a within-timestamp tie-break
    *                  (e.g. a log offset). Later (ts, seq) wins.
    * @param keyCols   join key column names (present in both inputs)
    * @param tsCol     change-time column in `changelog`
    * @param seqCol    deterministic tie-break column in `changelog`
    * @param opCol     operation column in `changelog`
    * @return one row per surviving key with `base`'s columns
    */
  def applyChangelog(
      base: DataFrame,
      changelog: DataFrame,
      keyCols: Seq[String],
      tsCol: String = "ts",
      seqCol: String = "seq",
      opCol: String = "op"): DataFrame = {
    require(keyCols.nonEmpty, "applyChangelog needs at least one key column")
    // key containment honors the session's column-resolution case
    // sensitivity (the Merge.mergeInto contract): a case-insensitive
    // session resolves 'O_ORDERKEY' against o_orderkey, so the
    // value-column split must too — otherwise the key leaks into the
    // payload and the output carries two colliding columns
    val caseSensitive =
      base.sparkSession.conf.get("spark.sql.caseSensitive", "false")
        .toBoolean
    def isKey(c: String): Boolean =
      if (caseSensitive) keyCols.contains(c)
      else keyCols.exists(_.equalsIgnoreCase(c))
    val valueCols = base.columns.filterNot(isKey).toSeq
    val key = keyCols.map(col)

    // Base rows are version (-inf): any changelog entry beats them.
    // Encoding: version = struct(ts, seq) with base ts = null sorts
    // FIRST under Spark's null-first struct ordering, so max_by never
    // prefers a base row over a change. Payload carries op + values.
    def payload(op: Column, vals: Seq[Column]): Column =
      struct(op.as("op") +: vals.zip(valueCols).map { case (c, n) => c.as(n) }: _*)

    val baseRows = base.select(
      key :+
        lit(null).cast(changelog.schema(tsCol).dataType).as("_ver_ts") :+
        lit(0L).as("_ver_seq") :+
        payload(lit("upsert"), valueCols.map(col)).as("_payload"): _*)
    val changeRows = changelog.select(
      key :+
        col(tsCol).as("_ver_ts") :+
        col(seqCol).cast("long").as("_ver_seq") :+
        payload(col(opCol), valueCols.map(col)).as("_payload"): _*)

    // the payload itself is the final tie-break component, so rows
    // sharing (ts, seq) — e.g. duplicate base keys — still resolve
    // deterministically on any partitioning
    baseRows
      .unionByName(changeRows)
      .groupBy(key: _*)
      .agg(max_by(col("_payload"),
        struct(col("_ver_ts"), col("_ver_seq"), col("_payload")))
        .as("_latest"))
      .where(col("_latest.op") =!= lit("delete"))
      .select(key ++ valueCols.map(n => col(s"_latest.$n").as(n)): _*)
  }

  /** Slowly-changing-dimension type-2 history from a changelog: one
    * validity interval per surviving version — `valid_from` = the
    * change time, `valid_to` = the NEXT change time for the key (any
    * op — a delete closes the previous version without opening one),
    * null `valid_to` = current, plus an `is_current` flag.
    *
    * Scale shape: ONE key-partitioned window (lead over (ts, seq))
    * on the changelog — no self-join, no per-version shuffle; the
    * window's sort is within key partitions only. The warehouse-table
    * builder that pairs with [[applyChangelog]] (which materializes
    * only the head).
    */
  def scd2History(
      changelog: DataFrame,
      keyCols: Seq[String],
      tsCol: String = "ts",
      seqCol: String = "seq",
      opCol: String = "op"): DataFrame = {
    require(keyCols.nonEmpty, "scd2History needs at least one key column")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col(seqCol))
    changelog
      .withColumn("_next_ts", lead(col(tsCol), 1).over(w))
      .where(col(opCol) =!= lit("delete"))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", col("_next_ts"))
      .withColumn("is_current", col("_next_ts").isNull)
      .drop("_next_ts", tsCol, seqCol, opCol)
  }
}
