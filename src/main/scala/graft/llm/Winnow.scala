package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints — Schleimer, Wilkerson & Aiken,
  * "Winnowing: Local Algorithms for Document Fingerprinting" (SIGMOD
  * 2003), the MOSS algorithm. Selects, from the position-ordered
  * sequence of word k-gram hashes, the minimum hash of every window of
  * `w` consecutive grams (rightmost position on ties — the robust
  * variant), guaranteeing that any shared run of `w + k - 1` words
  * between two documents shares at least one selected fingerprint.
  * The dedup granularity between exact-hash (whole doc) and
  * minhash (set-level): detects partial overlap / local copying.
  *
  * Scale shape: fingerprint selection is one shuffle keyed by doc id
  * (the gram explosion is projected down to `(id, pos, encoded)` —
  * 24 bytes a row — before the exchange; the two window functions
  * share the partitioning). Fingerprint density is ~2/(w+1), so the
  * output is a small fraction of the gram count. The pair join is
  * keyed by fingerprint hash with a broadcast hot-hash blocklist
  * (doc-frequency cap), so boilerplate shared by thousands of docs
  * can never create a quadratic bucket.
  */
object Winnow {

  /** Positions are packed with the hash into one BIGINT
    * (`hash * PosCap + (PosCap - 1 - pos)`), so a single `min` window
    * aggregate selects (min hash, rightmost pos). Caps grams per doc
    * at 2^20; hash is 32 bits, so the encoding stays under 2^52 —
    * exact in BIGINT and in any engine's DOUBLE fallback. */
  val PosCap: Long = 1L << 20

  /** Per-doc winnowed fingerprints: one row per selected
    * `(fp_pos, fp_hash)` — `fp_hash` the 32-bit (md5-prefix) hash of
    * the word k-gram at 0-based gram position `fp_pos`. Documents
    * shorter than `k` words contribute their whole text as a single
    * gram at position 0. */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
                   k: Int = 3, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, s"winnow needs k >= 1 and w >= 1, got k=$k w=$w")
    // Grams via lead() windows over exploded words, NOT a transform()
    // HOF: slice-of-outer-array inside a lambda re-evaluates the split
    // per element (O(words²) per doc, and interpreted), while lead()
    // shares the one doc-keyed exchange with the min-selection window.
    // concat_ws skips the null leads past the end, so a doc shorter
    // than k words yields its whole text as the single pos-0 gram —
    // the same fallback as [[fingerprintsHof]].
    val exploded = docs.select(col(idCol),
      posexplode(Text.words(Text.normalize(col(textCol))))
        .as(Seq("pos", "word")))
    val byDoc = Window.partitionBy(col(idCol))
    val ordered = byDoc.orderBy(col("pos"))
    val gram = concat_ws(" ",
      col("word") +: (1 until k).map(j => lead(col("word"), j).over(ordered)): _*)
    val hash32 = conv(substring(md5(col("gram")), 1, 8), 16, 10).cast("long")
    val g = exploded
      .select(col(idCol), col("pos"), gram.as("gram"),
        greatest(count(lit(1)).over(byDoc) - (k - 1), lit(1)).as("mg"))
      .filter(col("pos") < col("mg"))
      .select(col(idCol), col("pos"), col("mg"),
        (hash32 * PosCap + (lit(PosCap - 1) - col("pos"))).as("enc"))
    val frame = ordered.rowsBetween(Window.currentRow, w - 1)
    g
      .withColumn("sel", min(col("enc")).over(frame))
      // window STARTS only; when mg < w the single pos-0 window truncates
      .filter(col("pos") <= greatest(col("mg") - w, lit(0)))
      .select(col(idCol),
        (lit(PosCap - 1) - pmod(col("sel"), lit(PosCap))).as("fp_pos"),
        floor(col("sel") / PosCap).cast("long").as("fp_hash"))
      .distinct()
  }

  /** Declarative HOF twin of [[fingerprints]] (spec reference only):
    * grams as array_join(slice(words)) over a sequence transform. */
  private[graft] def fingerprintsHof(docs: DataFrame, idCol: String,
                                     textCol: String,
                                     k: Int = 3, w: Int = 4): DataFrame = {
    val ws = Text.words(Text.normalize(col(textCol)))
    val grams = when(size(ws) >= k,
        transform(sequence(lit(0), size(ws) - k),
          i => array_join(slice(ws, i + 1, lit(k)), " ")))
      .otherwise(array(array_join(ws, " ")))
    val hash32 = conv(substring(md5(col("gram")), 1, 8), 16, 10).cast("long")
    val enc = docs
      .select(col(idCol), posexplode(grams).as(Seq("pos", "gram")))
      .select(col(idCol), col("pos"),
        (hash32 * PosCap + (lit(PosCap - 1) - col("pos"))).as("enc"))
    val byDoc = Window.partitionBy(col(idCol))
    val frame = byDoc.orderBy(col("pos"))
      .rowsBetween(Window.currentRow, w - 1)
    enc
      .withColumn("m", count(lit(1)).over(byDoc))
      .withColumn("sel", min(col("enc")).over(frame))
      .filter(col("pos") <= greatest(col("m") - w, lit(0)))
      .select(col(idCol),
        (lit(PosCap - 1) - pmod(col("sel"), lit(PosCap))).as("fp_pos"),
        floor(col("sel") / PosCap).cast("long").as("fp_hash"))
      .distinct()
  }

  /** Document pairs sharing at least `minShared` distinct winnowed
    * fingerprint hashes — the MOSS match report. Fingerprints present
    * in more than `maxDocFreq` documents (boilerplate) are dropped via
    * a broadcast blocklist before the pair join, which bounds every
    * join bucket at `maxDocFreq` rows. */
  def sharedFingerprintPairs(docs: DataFrame, idCol: String, textCol: String,
                             k: Int = 3, w: Int = 4, minShared: Int = 2,
                             maxDocFreq: Int = 100): DataFrame = {
    val fp = fingerprints(docs, idCol, textCol, k, w)
      .select(col(idCol).as("fid"), col("fp_hash")).distinct()
      .localCheckpoint(true)
    val hot = fp.groupBy("fp_hash")
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDocFreq)
      .select("fp_hash")
    val kept = fp.join(broadcast(hot), Seq("fp_hash"), "left_anti")
    kept.select(col("fp_hash"), col("fid").as("id_a"))
      .join(kept.select(col("fp_hash"), col("fid").as("id_b")), "fp_hash")
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).cast("bigint").as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
