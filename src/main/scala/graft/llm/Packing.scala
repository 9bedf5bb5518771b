package graft.llm

import graft.operators.Prefix
import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** Sequence chunking and packing for LLM training-data prep.
  *
  * Pretraining pipelines rarely feed raw documents to the trainer; they
  * (a) split long documents into overlapping token windows and (b) pack
  * short documents into fixed-capacity sequences so no batch slot is
  * wasted. Both are implemented here as pure DataFrame transforms:
  *
  *  - [[chunkWindows]] is per-row work (split + explode + slice), stays
  *    in WholeStageCodegen, no shuffle at all;
  *  - [[packConcat]] (GPT-style concat-and-split) needs one global
  *    running sum, done with [[graft.operators.Prefix]]'s two-phase
  *    scan, never a single-partition window;
  *  - [[packGreedy]] (first-fit, no document splitting) is inherently
  *    sequential per group — each bin boundary depends on the whole
  *    prefix — so it streams sorted partitions through O(1) state
  *    (one hash exchange + in-partition sort); parallelism comes from
  *    the grouping key, and no group is ever materialized in memory.
  */
object Packing {

  /** Sliding token windows of `window` tokens every `stride` tokens
    * (whitespace tokenization, consistent with [[Text.tokenCount]]).
    * Emits one row per (doc, window start): `chunk_id`,
    * `n_chunk_tokens` (last chunk may be short), `chunk_text`.
    * Whitespace-only documents produce no chunks. */
  def chunkWindows(docs: DataFrame, idCol: String, textCol: String,
                   window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0, "window and stride must be positive")
    docs
      .filter(length(trim(col(textCol))) > 0)
      .select(col(idCol), Text.words(col(textCol)).as("_words"))
      .withColumn("_n", size(col("_words")))
      .withColumn("_start",
        explode(sequence(lit(0), col("_n") - 1, lit(stride))))
      .select(col(idCol),
        (col("_start") / stride).cast("int").as("chunk_id"),
        least(lit(window), col("_n") - col("_start")).cast("int")
          .as("n_chunk_tokens"),
        array_join(slice(col("_words"), col("_start") + 1, lit(window)), " ")
          .as("chunk_text"))
  }

  /** GPT-style packing: concatenate all documents in ascending `idCol`
    * order into one virtual token stream and cut it every `capacity`
    * tokens. Adds `seq_id` (the sequence the document STARTS in) and
    * `spans_boundary` (true when the document crosses a sequence cut).
    * The global running sum comes from [[Prefix.runningSum]] — no
    * single-partition window, scales to any corpus size. */
  def packConcat(docs: DataFrame, idCol: String, tokensCol: String,
                 capacity: Int): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val cum = Prefix.runningSum(docs, idCol, tokensCol, "_cum")
    cum
      .withColumn("_before", col("_cum") - col(tokensCol))
      // integer `div`, not floor(double /): exact at any magnitude
      .withColumn("seq_id", expr(s"_before div $capacity"))
      .withColumn("spans_boundary",
        col(tokensCol) > 0 &&
          expr(s"(_cum - 1) div $capacity") > col("seq_id"))
      .drop("_cum", "_before")
  }

  /** First-fit greedy packing WITHOUT document splitting: within each
    * `groupCol` group, walk documents in ascending `idCol` order and
    * append to the current bin while it fits in `capacity`, else open a
    * new bin. Documents larger than `capacity` get a bin of their own.
    * Returns all input columns plus `bin` (numbering restarts at 0 per
    * group); `idCol` may be any orderable type, `tokensCol` any numeric
    * (nulls pack as 0). Null and binary group values are handled by
    * value equality — no key stringification. */
  def packGreedy(docs: DataFrame, groupCol: String, idCol: String,
                 tokensCol: String, capacity: Long): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val outSchema = StructType(docs.schema.fields)
      .add("bin", LongType, nullable = false)
    val gIdx = docs.schema.fieldIndex(groupCol)
    val tIdx = docs.schema.fieldIndex(tokensCol)
    implicit val rowEnc: Encoder[Row] = Encoders.row(outSchema)
    // One hash exchange on the group column + in-partition sort, then a
    // single streaming walk detecting group changes by VALUE equality
    // (deepEquals: nulls and binary keys stay distinct groups — no
    // stringified-key collisions). O(1) state, groups never collected.
    docs
      .repartition(col(groupCol))
      .sortWithinPartitions(col(groupCol), col(idCol))
      .mapPartitions { it =>
        var curGroup: Any = null
        var haveGroup = false
        var bin = -1L
        var fill = 0L
        it.map { r =>
          val g = r.get(gIdx)
          val n = r.get(tIdx) match {
            case null      => 0L
            case x: Number => x.longValue()
            case other => throw new IllegalArgumentException(
              s"$tokensCol must be numeric, got: ${other.getClass}")
          }
          val newGroup = !haveGroup ||
            !java.util.Objects.deepEquals(curGroup, g)
          if (newGroup) {
            curGroup = g; haveGroup = true
            bin = 0L; fill = n
          } else if (fill + n > capacity) {
            bin += 1L; fill = n
          } else fill += n
          Row.fromSeq(r.toSeq :+ bin)
        }
      }
  }
}
