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
    // -0.0 folds to 0.0 BEFORE keying: SQL join semantics equate
    // them, but the raw bits would hash to different partitions and
    // Row equality (boxed Double.equals) would split the group
    val kCol = struct(keys.map { k =>
      val c = col(k)
      (left.schema(k).dataType match {
        case DoubleType => when(c === lit(0.0d), lit(0.0d)).otherwise(c)
        case FloatType => when(c === lit(0.0f), lit(0.0f)).otherwise(c)
        case _ => c
      }).as(k)
    }: _*)
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
      lStruct.fieldNames.map(n => col(s"_l.${bq(n)}").as(n)) ++
        rightOut.map(n => col(s"_r.${bq(n)}").as(n)): _*)
  }

  /** Broadcast as-of join for a SMALL right side: the reference rows
    * collect to the driver once, group into per-key time-sorted
    * arrays, broadcast, and each left partition binary-searches them —
    * the left (fact) side is NEVER shuffled or sorted. This is the
    * 100 TB shape for "enrich every event with the dimension value in
    * effect at its time": [[join]]'s keyed repartition of the fact
    * table is the dominant cost there, and a KB–MB dimension history
    * doesn't warrant it. Semantics (direction, tolerance, null keys /
    * times, equal-time tie-breaks) match [[join]] exactly — spec-pinned
    * against it.
    *
    * @param maxRightRows hard cap on collected reference rows (the
    *                     driver-memory guard); exceeding it throws
    *                     rather than silently OOMing — use [[join]]
    *                     for big reference sides.
    */
  def broadcastJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                    leftTime: String, rightTime: String,
                    direction: String = "backward",
                    toleranceMicros: Option[Long] = None,
                    maxRightRows: Int = 1000000): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got '$direction'")
    require(keys.nonEmpty, "at least one key column")
    val rightOut = right.columns.filterNot(keys.contains)
    val collisions = left.columns.toSet.intersect(rightOut.toSet)
    require(collisions.isEmpty,
      s"rename right columns colliding with left: ${collisions.mkString(",")}")
    val backward = direction == "backward"

    // NOTE: the right side collects EAGERLY, at construction time —
    // building this DataFrame runs a Spark job (like the engine's
    // other materialize-then-broadcast operators); the broadcast is
    // reaped by the driver's periodic GC once the result frame dies.
    val kOkR = keys.map(col(_).isNotNull).reduce(_ && _)
    val cap = math.min(maxRightRows, Int.MaxValue - 1) // +1 must not wrap
    val collected = right
      .filter(col(rightTime).isNotNull && kOkR)
      .select((keys.map(col) :+
        unix_micros(col(rightTime).cast("timestamp")).as("_t")) ++
        rightOut.map(col): _*)
      .limit(cap + 1)
      .collect()
    require(collected.length <= cap,
      s"broadcastJoin: right side exceeds maxRightRows=$maxRightRows — " +
        "use AsOfJoin.join for large reference sides")

    val nk = keys.length
    // per key: (time, payload) sorted by (time asc, payload asc) — the
    // LAST entry at-or-before wins backward (greatest struct at equal
    // time), the FIRST at-or-after wins forward (least struct): the
    // same equal-time winners as join()'s merge-sort carry. Binary key
    // components wrap to value-equality Seqs (a raw Array[Byte] map
    // key would compare by reference and silently never match).
    val grouped: Map[List[Any], Array[(Long, Array[Any])]] = collected
      .groupBy(r => List.tabulate(nk)(i => normKey(r.get(i))))
      .map { case (k, rows) =>
        k -> rows.map { r =>
          (r.getLong(nk), Array.tabulate(rightOut.length)(i => r.get(nk + 1 + i)))
        }.sortWith((a, b) =>
          a._1 < b._1 || (a._1 == b._1 && cmpVals(a._2, b._2) < 0)).toArray
      }
    val bc = left.sparkSession.sparkContext.broadcast(grouped)

    val lStruct = StructType(left.schema.fields)
    val outSchema = StructType(lStruct.fields ++
      right.schema.fields.filter(f => rightOut.contains(f.name))
        .map(_.copy(nullable = true)))
    val enc = Encoders.row(outSchema)
    val kOkL = keys.map(col(_).isNotNull).reduce(_ && _)
    val prepped = left.select(
      struct(left.columns.map(col): _*).as("_l"),
      unix_micros(col(leftTime).cast("timestamp")).as("_t"),
      kOkL.as("_kok"),
      struct(keys.map(col): _*).as("_k"))

    prepped.mapPartitions { it =>
      val m = bc.value
      val nulls = Seq.fill(rightOut.length)(null)
      it.map { row =>
        val l = row.getStruct(0)
        val matched: Seq[Any] =
          if (row.isNullAt(1) || !row.getBoolean(2)) nulls
          else {
            val k = List.tabulate(nk)(i => normKey(row.getStruct(3).get(i)))
            m.get(k) match {
              case None => nulls
              case Some(arr) =>
                val t = row.getLong(1)
                val idx = search(arr, t, backward)
                if (idx < 0) nulls
                else {
                  val (rt, payload) = arr(idx)
                  if (toleranceMicros.forall(tol => math.abs(t - rt) <= tol))
                    payload.toSeq
                  else nulls
                }
            }
          }
        Row.fromSeq(l.toSeq ++ matched)
      }
    }(enc)
  }

  /** Greatest index with t ≤ target (backward) / least with t ≥ target
    * (forward); -1 when none qualifies. */
  private def search(arr: Array[(Long, Array[Any])], target: Long,
                     backward: Boolean): Int = {
    var lo = 0; var hi = arr.length - 1
    if (backward) {
      var ans = -1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (arr(mid)._1 <= target) { ans = mid; lo = mid + 1 }
        else hi = mid - 1
      }
      ans
    } else {
      var ans = -1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (arr(mid)._1 >= target) { ans = mid; hi = mid - 1 }
        else lo = mid + 1
      }
      ans
    }
  }

  /** Backtick-quoted struct-field access: a column named `a.b` must
    * address ONE field, not a nested path. */
  private def bq(n: String): String = "`" + n.replace("`", "``") + "`"

  /** Map keys must compare by VALUE at ANY nesting depth: binary
    * components wrap to Seq[Byte] (Array[Byte] equals/hashCode are
    * reference-based — a raw array key would hash-miss every probe,
    * and so would one nested inside a struct- or array-typed key,
    * because Row.hashCode mixes element hashes without the byte-array
    * special case Row.equals has); rows and collections normalize
    * recursively; -0.0 folds to 0.0 (equal under SQL join semantics,
    * distinct to boxed equals/hashCode). */
  private def normKey(v: Any): Any = v match {
    case b: Array[Byte] => b.toSeq
    case r: Row => r.toSeq.map(normKey)
    case s: scala.collection.Seq[_] => s.map(normKey)
    case d: Double => if (d == 0.0) 0.0 else d
    case f: Float => if (f == 0.0f) 0.0f else f
    case x => x
  }

  /** Field-by-field compare of external-type payload rows mirroring
    * Catalyst's struct ordering, so equal-time tie winners match
    * [[join]]'s merge path exactly: nulls first; strings by UTF-8
    * byte order (Java's compareTo is UTF-16 code-unit order, which
    * disagrees on supplementary characters); binary unsigned
    * lexicographic; arrays elementwise then by length; nested structs
    * recursively; maps (Catalyst-unorderable) compare equal — the
    * merge path skips its struct tiebreak for those too. */
  private def cmpVals(a: Array[Any], b: Array[Any]): Int = {
    var i = 0
    while (i < a.length) {
      val c = cmpVal(a(i), b(i))
      if (c != 0) return c
      i += 1
    }
    0
  }

  private def cmpVal(x0: Any, y0: Any): Int = (x0, y0) match {
    case (null, null) => 0
    case (null, _) => -1
    case (_, null) => 1
    case (x: String, y: String) =>
      java.util.Arrays.compareUnsigned(
        x.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        y.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    case (x: Array[Byte], y: Array[Byte]) =>
      java.util.Arrays.compareUnsigned(x, y)
    case (x: scala.collection.Seq[_], y: scala.collection.Seq[_]) =>
      val it = x.iterator.zip(y.iterator)
      while (it.hasNext) {
        val (xe, ye) = it.next()
        val c = cmpVal(xe, ye)
        if (c != 0) return c
      }
      java.lang.Integer.compare(x.length, y.length)
    case (x: Row, y: Row) =>
      cmpVals(Array.tabulate(x.length)(x.get), Array.tabulate(y.length)(y.get))
    case (x: Comparable[_], y) =>
      try x.asInstanceOf[Comparable[Any]].compareTo(y)
      catch { case _: ClassCastException => 0 }
    case _ => 0
  }
}
