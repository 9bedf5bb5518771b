package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative MERGE INTO (the Delta/Hudi/Iceberg upsert verb) as a
  * plain DataFrame transform: reconcile a target snapshot with a
  * source batch in ONE full-outer join —
  *
  *   matched + deleteWhen        → row removed
  *   matched otherwise           → source values win (UPDATE)
  *   source-only                 → row inserted (unless deleteWhen —
  *                                 a delete for an absent key is a
  *                                 no-op, like SQL MERGE)
  *   target-only                 → row kept unchanged
  *
  * Scale shape: exactly one keyed shuffle (the join); both sides ride
  * as single struct columns so the reconciliation is a per-row
  * when/otherwise — no second pass, no window, no driver logic. This
  * is [[Cdc.applyChangelog]]'s table-vs-table sibling: CDC folds a
  * VERSIONED changelog (later timestamps win); merge reconciles an
  * unversioned batch where the source row is authoritative.
  */
object Merge {

  /** @param target     current table
    * @param source     batch carrying the same columns as `target`
    *                   (extra source-only columns — e.g. an op flag
    *                   consumed by `deleteWhen` — are dropped from the
    *                   output)
    * @param keys       merge key columns (non-null; one row per key
    *                   per side for deterministic results)
    * @param deleteWhen optional predicate over SOURCE columns marking
    *                   delete rows
    * @return the merged table with `target`'s schema
    */
  def mergeInto(
      target: DataFrame,
      source: DataFrame,
      keys: Seq[String],
      deleteWhen: Option[Column] = None): DataFrame = {
    require(keys.nonEmpty, "mergeInto needs at least one key column")
    val outCols = target.columns.toSeq
    // containment check honors the session's column-resolution case
    // sensitivity — a case-insensitive session resolves 'Price'
    // against 'price', so the guard must too
    val caseSensitive =
      target.sparkSession.conf.get("spark.sql.caseSensitive", "false")
        .toBoolean
    def has(c: String): Boolean =
      if (caseSensitive) source.columns.contains(c)
      else source.columns.exists(_.equalsIgnoreCase(c))
    require(outCols.forall(has),
      s"source is missing target columns: " +
        outCols.filterNot(has).mkString(","))

    val t = target.select(keys.map(col) :+
      struct(outCols.map(col): _*).as("_t"): _*)
    val s = source.select(keys.map(col) :+
      struct(outCols.map(col): _*).as("_s") :+
      deleteWhen.getOrElse(lit(false)).as("_del"): _*)

    t.join(s, keys, "full_outer")
      // delete requested: drop matched rows, no-op for absent keys
      .where(!coalesce(col("_del"), lit(false)))
      .select(outCols.map { c =>
        // source wins when present (update/insert), else keep target
        when(col("_s").isNotNull, col(s"_s.$c"))
          .otherwise(col(s"_t.$c")).as(c)
      }: _*)
  }
}
