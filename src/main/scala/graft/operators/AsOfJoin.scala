package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** As-of (nearest-event) join — an operator Spark has no built-in for.
  *
  * For every left row, attach the single right row with the same key
  * whose time is the latest at-or-before the left time (`backward`),
  * or the earliest at-or-after it (`forward`), optionally within a
  * tolerance. The classic uses: point-in-time feature lookup, "most
  * recent click before each purchase", sensor alignment.
  *
  * Scale shape (the reason this is an operator and not a SQL idiom):
  * the naive formulations are a non-equi join (O(|L|x|R|) pairs per
  * key before ranking) or a per-left-row LATERAL top-1 — both explode
  * at 100 TB. This implementation is one keyed shuffle per side, an
  * in-partition sort, and a single sequential merge pass:
  *
  *   union(left tagged 1, right tagged 0)
  *     .repartition(key)                          // the only shuffle
  *     .sortWithinPartitions(key, time, side, …)  // no global sort
  *     .mapPartitions(last-seen carry per key)    // O(n) streaming
  *
  * — i.e. exactly the exchange+sort a sort-merge join would pay, with
  * a zero-memory merge instead of a buffered range probe. A skewed key
  * degrades to a linear scan of that key's rows, never a product.
  *
  * Determinism: rows tied on (key, time) on the right side are broken
  * by the right row's full struct order — the greatest struct wins
  * backward, the least forward (last overwrite under that direction's
  * sort) — so repeated runs hash-identically, as the driver's oracle
  * gate requires. Structs containing unorderable fields (maps) skip
  * that tiebreak.
  */
object AsOfJoin {

  private def orderable(dt: DataType): Boolean = dt match {
    case _: MapType => false
    case s: StructType => s.fields.forall(f => orderable(f.dataType))
    case a: ArrayType => orderable(a.elementType)
    case _ => true
  }

  /** Single-key form of [[join]] — carries the defaults (Scala allows
    * default arguments on only one overload of a name). */
  def join(left: DataFrame, right: DataFrame, key: String,
           leftTime: String, rightTime: String,
           direction: String = "backward",
           toleranceMicros: Option[Long] = None): DataFrame =
    join(left, right, Seq(key), leftTime, rightTime, direction,
      toleranceMicros)

  /** @param left       probe side; every row is kept (left join)
    * @param right      build side providing the carried columns
    * @param keys       equality columns, present on BOTH frames (the
    *                   pandas merge_asof `by` list); the right copies
    *                   are dropped from the output. A null in ANY key
    *                   component never matches (SQL join semantics).
    * @param leftTime   timestamp column on `left`
    * @param rightTime  timestamp column on `right` (micros precision)
    * @param direction  "backward" (right.time <= left.time, latest
    *                   wins — the pandas merge_asof default) or
    *                   "forward" (right.time >= left.time, earliest)
    * @param toleranceMicros max |left.time - right.time|; None = any
    */
  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTime: String, rightTime: String,
           direction: String,
           toleranceMicros: Option[Long]): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got '$direction'")
    require(keys.nonEmpty, "at least one key column")
    val rightOut = right.columns.filterNot(keys.contains)
    val collisions = left.columns.toSet.intersect(rightOut.toSet)
    require(collisions.isEmpty,
      s"rename right columns colliding with left: ${collisions.mkString(",")}")

    val lStruct = StructType(left.schema.fields)
    val rStruct = StructType(right.schema.fields.map(_.copy(nullable = true)))
    // composite keys ride as one struct column: equality, hashing and
    // the in-partition sort all treat it atomically. _kok marks rows
    // whose key has no null component — null keys group and sort
    // together but must never MATCH, per SQL equality.
    val kCol = struct(keys.map(col): _*)
    val kOk = keys.map(col(_).isNotNull).reduce(_ && _)
    val l2 = left.select(
      kCol.as("_k"),
      kOk.as("_kok"),
      // cast is identity for TIMESTAMP; maps TIMESTAMP_NTZ through the
      // (UTC-pinned) session timezone so both types join consistently
      unix_micros(col(leftTime).cast("timestamp")).as("_t"),
      lit(1).as("_side"),
      struct(left.columns.map(col): _*).as("_l"),
      lit(null).cast(rStruct).as("_r"))
    // a null right time or null-component right key can never match —
    // drop here (keeping them would NPE the merge or shadow a real
    // candidate in the carry)
    val r2 = right
      .filter(col(rightTime).isNotNull && kOk)
      .select(
        kCol.as("_k"),
        lit(true).as("_kok"),
        unix_micros(col(rightTime).cast("timestamp")).as("_t"),
        lit(0).as("_side"),
        lit(null).cast(lStruct).as("_l"),
        struct(right.columns.map(col): _*).as("_r"))

    val backward = direction == "backward"
    // right rows sort before left rows at equal time in BOTH directions
    // so an exactly-equal timestamp is visible to the left row (the
    // <= / >= in the contract); the struct tiebreak pins which of
    // several equal-time right rows is carried deterministically (the
    // greatest struct backward, the least forward — last overwrite
    // under the direction's sort order wins).
    val sortCols = {
      val base =
        if (backward) Seq(col("_k"), col("_t").asc, col("_side").asc)
        else Seq(col("_k"), col("_t").desc, col("_side").asc)
      if (orderable(rStruct))
        base :+ (if (backward) col("_r").asc else col("_r").desc)
      else base
    }
    val sorted = l2.unionByName(r2)
      .repartition(col("_k"))
      .sortWithinPartitions(sortCols: _*)

    val outSchema = StructType(Seq(
      StructField("_l", lStruct, nullable = false),
      StructField("_r", rStruct, nullable = true)))
    val enc = Encoders.row(outSchema)
    val merged = sorted.mapPartitions { it =>
      // rows arrive grouped by key and time-ordered; carry the most
      // recent right row and emit once per left row — O(1) state
      var curKey: Any = null
      var haveKey = false
      var carried: Row = null
      var carriedT = 0L
      it.flatMap { row =>
        val k = row.get(0)
        if (!haveKey || k != curKey) {
          curKey = k; haveKey = true; carried = null
        }
        if (row.getInt(3) == 0) {
          carried = row.getStruct(5)
          carriedT = row.getLong(2)
          Iterator.empty
        } else {
          // null left time or null-component key: the row is kept
          // (left join) but no comparison/equality with it can be
          // true — never matches
          val ok = carried != null && row.getBoolean(1) &&
            !row.isNullAt(2) &&
            toleranceMicros.forall(tol =>
              math.abs(row.getLong(2) - carriedT) <= tol)
          Iterator.single(Row(row.getStruct(4), if (ok) carried else null))
        }
      }
    }(enc)

    merged.select(
      lStruct.fieldNames.map(n => col(s"_l.$n").as(n)) ++
        rightOut.map(n => col(s"_r.$n").as(n)): _*)
  }
}
