package graft.llm

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end corpus curation — the composed recipe a training run
  * actually executes, built entirely from this engine's verified
  * stages: token-count quality gate → exact dedup (keep min id per
  * identical text) → Naive-Bayes quality classifier (train on the
  * surviving corpus, keep positive scores) → per-source token budget
  * (highest-scoring docs first, deterministic tie-break) →
  * hash-bucket train/val/test split. Everything is deterministic
  * integer/hash arithmetic — the same corpus comes out on every
  * engine, run, and cluster size, which is the property that makes a
  * training mix reproducible.
  *
  * Scale shape: exact dedup is a map-side-combinable min(id) per
  * 16-byte text hash + semi join (skew-immune — a mega-duplicated doc
  * partial-aggregates instead of serializing into one window task),
  * then the classifier's tf shuffle + vocab join, and one window
  * shuffle on source for the budget (sources are domains — numerous
  * and individually bounded; a pathological mega-source is a
  * [[Sampling.capPerGroup]]-style pre-cap away). The dedup survivors
  * are checkpointed once and feed classifier training, scoring, and
  * the final attribute join — the corpus text is never recomputed. */
object Curate {

  /** Returns the curated corpus: `(doc_id, source, n_tokens,
    * score_e6, split)` — one row per kept document.
    * `labelCol` is the boolean "high-quality reference" marker the
    * classifier trains on; `budgetPerSource` caps the running token
    * total per source, admitting docs in (score desc, id) order. */
  def pipeline(docs: DataFrame, idCol: String, textCol: String,
               sourceCol: String, labelCol: String,
               minTokens: Int = 5, maxTokens: Int = 1000000,
               budgetPerSource: Long = 300): DataFrame = {
    val nTok = Text.tokenCount(col(textCol)).cast("bigint")
    val q = docs.filter(nTok.between(minTokens, maxTokens))
    // exact dedup via min(id)-per-hash + semi join, NOT a row_number
    // window: a mega-duplicated doc is an unsplittable window
    // partition, while the aggregate partial-combines per partition
    val survivors = Dedup.dropExactDuplicates(q, idCol, textCol)
      .select(col(idCol), col(textCol), col(sourceCol), col(labelCol))
      .localCheckpoint(false) // lazy: first consumer populates (r10 §6)
    val scored = Classifier
      .nbTrainScore(survivors, idCol, textCol, labelCol)
      .filter(col("score_e6") > 0)
    val attrs = survivors.select(col(idCol).as("doc_id"),
      col(sourceCol).as("source"),
      Text.tokenCount(col(textCol)).cast("bigint").as("n_tokens"))
    val bySource = Window.partitionBy(col("source"))
      .orderBy(col("score_e6").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored.join(attrs, "doc_id")
      .withColumn("cum", sum(col("n_tokens")).over(bySource))
      .filter(col("cum") <= budgetPerSource)
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("score_e6"), Sampling.split(col("doc_id")).as("split"))
  }

  /** CCNet-style per-language perplexity tiers (Wenzek et al. 2020):
    * rank every scored document WITHIN its language by per-token
    * surprisal (lowest = most fluent first) and label the best third
    * `head`, the next `middle`, the rest `tail` — the quality tiers a
    * pretraining mix samples from at different rates. Input is a
    * language-model scoring frame `(idCol, langCol, n_terms,
    * sum_nll_e6)` (e.g. [[LangModel.unigramNll]] joined with the
    * document language); token-less documents never reach it.
    *
    * Determinism: tier boundaries are INTEGER rank arithmetic
    * (`r·3 ≤ n` → head, `r·3 ≤ 2n` → middle, else tail — exact
    * tertiles, no float thresholds); the sort key is one scalar IEEE
    * division of two integers (identical on any engine) with an id
    * tie-break, so the labeling replays bit-for-bit anywhere.
    *
    * Scale shape — the 2-pass distributed order statistic, NOT a
    * per-language window. Languages are few and web corpora are
    * hugely skewed toward one of them, so ranking inside a
    * `Window.partitionBy(lang)` would serialize the dominant language
    * onto one reducer. Instead: (1) histogram the corpus by
    * `(lang, floor(key / binWidth))` — a map-side-combinable
    * aggregation to a few-thousand-row table; tiny windows over THAT
    * find each bin's rank interval `(lo, hi]` and label every bin
    * whose interval falls wholly inside one tier; (2) the corpus
    * joins the broadcast histogram and only rows in the ≤2 boundary-
    * straddling bins per language need their exact global rank —
    * `lo + row_number` within the bin. The ranking shuffle is keyed
    * by `(lang, bin)`, so parallelism scales with occupied bins, not
    * languages, and each in-partition sort sees one bin, not one
    * language. Output is bit-identical to the single-window form
    * ([[perplexityBucketsWindowed]] — the spec-equivalence twin), at
    * any bin width: a degenerate corpus concentrating every key into
    * one bin just makes that bin the straddler and degrades to the
    * windowed cost, never to a wrong answer. */
  def perplexityBuckets(scored: DataFrame, idCol: String = "doc_id",
                        langCol: String = "lang"): DataFrame = {
    // micro-nats per token; 1e4-wide bins → ~thousands of occupied
    // bins across a realistic 0..40e6 surprisal range
    val key = col("sum_nll_e6").cast("double") / col("n_terms")
    val in = scored.select(col(idCol), col(langCol), col("n_terms"),
      col("sum_nll_e6"), key.as("__k"),
      floor(key / lit(1e4)).cast("long").as("__qb"))
    val overBins = Window.partitionBy(col(langCol)).orderBy(col("__qb"))
    val hist = in.groupBy(col(langCol), col("__qb"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__hi", sum(col("__cnt")).over(overBins))
      .withColumn("__lo", col("__hi") - col("__cnt"))
      .withColumn("__n",
        sum(col("__cnt")).over(Window.partitionBy(col(langCol))))
      // whole-bin label when ranks (lo, hi] sit inside one tier;
      // null marks a boundary-straddling bin
      .withColumn("__lbl",
        when(col("__hi") * 3 <= col("__n"), "head")
          .when((col("__lo") + 1) * 3 > col("__n") * 2, "tail")
          .when((col("__lo") + 1) * 3 > col("__n") &&
            col("__hi") * 3 <= col("__n") * 2, "middle"))
      .select(col(langCol), col("__qb"), col("__lo"), col("__n"),
        col("__lbl"))
    val inBin = Window.partitionBy(col(langCol), col("__qb"))
      .orderBy(col("__k"), col(idCol))
    val r = col("__lo") + row_number().over(inBin)
    in.join(broadcast(hist), Seq(langCol, "__qb"))
      .select(col(idCol), col(langCol), col("n_terms"),
        col("sum_nll_e6"),
        coalesce(col("__lbl"),
          when(r * 3 <= col("__n"), "head")
            .when(r * 3 <= col("__n") * 2, "middle")
            .otherwise("tail")).as("ppl_bucket"))
  }

  /** Single-window form of [[perplexityBuckets]] — the readable
    * specification the scalable path must match bit-for-bit
    * (CurateSpec equivalence; serializes per language, so the public
    * entry point is the histogram path). */
  private[graft] def perplexityBucketsWindowed(
      scored: DataFrame, idCol: String = "doc_id",
      langCol: String = "lang"): DataFrame = {
    val byLang = Window.partitionBy(col(langCol))
    val ranked = byLang.orderBy(
      (col("sum_nll_e6").cast("double") / col("n_terms")).asc, col(idCol))
    scored
      .withColumn("__r", row_number().over(ranked))
      .withColumn("__n", count(lit(1)).over(byLang))
      .select(col(idCol), col(langCol), col("n_terms"), col("sum_nll_e6"),
        when(col("__r") * 3 <= col("__n"), "head")
          .when(col("__r") * 3 <= col("__n") * 2, "middle")
          .otherwise("tail").as("ppl_bucket"))
  }
}
