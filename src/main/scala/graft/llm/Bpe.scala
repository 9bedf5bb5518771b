package graft.llm

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructType}

/** Byte-pair-encoding tokenizer: merge-table learning and encoding.
  *
  * [[Text.bpeTokenCount]] approximates subword counts with a regex; this
  * is the real thing, for when packing budgets and per-token costs must
  * match an actual tokenizer.
  *
  * Scale split, the same one every BPE trainer uses:
  *  - the WORD FREQUENCY table is computed distributed (one groupBy over
  *    the corpus — this is the part proportional to data size);
  *  - the merge-learning loop runs on the driver over the top-`maxVocab`
  *    words (vocabulary is bounded and tiny next to the corpus — for
  *    100 TB of text the capped frequency table is still a few MB);
  *  - encoding broadcasts the merge ranks and streams partitions with a
  *    per-partition word memo, so each DISTINCT word per partition is
  *    encoded once regardless of how often it repeats.
  *
  * Determinism: ties in pair frequency break lexicographically, so the
  * learned merge list is identical across runs and cluster sizes.
  */
object Bpe {

  /** End-of-word marker, kept distinct from any real character. */
  val EndOfWord = "</w>"

  type Merges = Seq[(String, String)]

  private[graft] def wordSymbols(w: String): Vector[String] =
    w.map(_.toString).toVector :+ EndOfWord

  /** Learn `numMerges` BPE merges from the corpus' word frequencies.
    * `maxVocab` caps the distinct words considered (most frequent win;
    * ties break lexicographically for determinism). */
  def learnMerges(docs: DataFrame, textCol: String, numMerges: Int,
                  maxVocab: Int = 50000): Merges = {
    require(numMerges >= 0 && maxVocab > 0)
    val freqs: Array[(String, Long)] = docs
      .select(explode(split(lower(trim(col(textCol))), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(desc("c"), asc("w"))
      .limit(maxVocab)
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))

    var words: Array[(Vector[String], Long)] =
      freqs.map { case (w, c) => wordSymbols(w) -> c }
    val merges = Vector.newBuilder[(String, String)]

    var i = 0
    var done = false
    while (i < numMerges && !done) {
      val pairCounts = new scala.collection.mutable.HashMap[(String, String), Long]()
      words.foreach { case (syms, c) =>
        var j = 0
        while (j < syms.length - 1) {
          val p = (syms(j), syms(j + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + c)
          j += 1
        }
      }
      if (pairCounts.isEmpty) done = true
      else {
        val best = pairCounts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        val joined = best._1 + best._2
        words = words.map { case (syms, c) =>
          val out = Vector.newBuilder[String]
          var j = 0
          while (j < syms.length) {
            if (j < syms.length - 1 &&
                syms(j) == best._1 && syms(j + 1) == best._2) {
              out += joined; j += 2
            } else { out += syms(j); j += 1 }
          }
          out.result() -> c
        }
        i += 1
      }
    }
    merges.result()
  }

  /** Encode one word with the given merge ranks (lowest rank first —
    * standard BPE apply). */
  private[graft] def encodeWord(w: String,
                              ranks: Map[(String, String), Int]): Vector[String] = {
    var syms = wordSymbols(w)
    var continue = syms.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var j = 0
      while (j < syms.length - 1) {
        val r = ranks.getOrElse((syms(j), syms(j + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestIdx = j }
        j += 1
      }
      if (bestIdx < 0 || bestRank == Int.MaxValue) continue = false
      else {
        syms = (syms.take(bestIdx) :+
          (syms(bestIdx) + syms(bestIdx + 1))) ++ syms.drop(bestIdx + 2)
        continue = syms.length > 1
      }
    }
    syms
  }

  /** Append an exact BPE token count per row (`outCol`, int). The merge
    * ranks ride along as a broadcast; each partition memoizes encoded
    * word lengths, so repeated words cost a map lookup. */
  def tokenCount(docs: DataFrame, textCol: String, merges: Merges,
                 outCol: String = "n_bpe_exact"): DataFrame = {
    val spark = docs.sparkSession
    val ranks = merges.zipWithIndex.toMap
    val bc = spark.sparkContext.broadcast(ranks)
    val tIdx = docs.schema.fieldIndex(textCol)
    val outSchema = StructType(docs.schema.fields)
      .add(outCol, IntegerType, nullable = false)
    implicit val enc: Encoder[Row] = Encoders.row(outSchema)
    docs.mapPartitions { it =>
      val r = bc.value
      val memo = new scala.collection.mutable.HashMap[String, Int]()
      it.map { row =>
        val text = row.getString(tIdx)
        val n =
          if (text == null) 0
          else text.toLowerCase.trim.split("\\s+").iterator
            .filter(_.nonEmpty)
            .map(w => memo.getOrElseUpdate(w, encodeWord(w, r).length))
            .sum
        Row.fromSeq(row.toSeq :+ n)
      }
    }
  }
}
