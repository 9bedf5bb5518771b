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
  * Scale shape: one window shuffle on the 16-byte text hash (exact
  * dedup), the classifier's tf shuffle + vocab join, one window
  * shuffle on source for the budget (sources are domains — numerous
  * and individually bounded; a pathological mega-source is a
  * [[Sampling.capPerGroup]]-style pre-cap away). The dedup survivors
  * are checkpointed once and feed classifier training, scoring, and
  * the final attribute join — the corpus text is never recomputed
  * through the window. */
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
    val byText = Window.partitionBy(Dedup.exactKey(col(textCol)))
      .orderBy(col(idCol))
    val survivors = q
      .withColumn("__rn", row_number().over(byText))
      .filter(col("__rn") === 1)
      .select(col(idCol), col(textCol), col(sourceCol), col(labelCol))
      .localCheckpoint(true)
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
    * Scale shape: one shuffle on the language key feeding both window
    * frames (shared sort). Languages are few and web corpora are
    * hugely skewed toward one of them, so at extreme scale the
    * per-language sort serializes on the biggest language's reducer —
    * the standard fix is the 2-pass distributed order statistic
    * (per-language surprisal histogram → cumulative counts pick the
    * two threshold bins → second pass labels by comparison, resolving
    * only the straddling bins exactly), which trades one extra linear
    * pass for full parallelism. At the tested scales the single
    * window is both exact and fastest, so that escalation is
    * documented rather than built. */
  def perplexityBuckets(scored: DataFrame, idCol: String = "doc_id",
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
