package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Unigram language-model surprisal scoring — the CCNet-style
  * "perplexity filter" quality signal: documents whose tokens are
  * improbable under a corpus-wide unigram model score high (noise,
  * boilerplate, wrong-language text), fluent text scores low. A real
  * deployment swaps the in-corpus unigram table for a reference-corpus
  * n-gram table; the pipeline shape (train token stats → broadcast/join
  * → per-doc fold) is identical.
  *
  * Reproducibility: per-token negative log-likelihood is quantized to
  * integer micro-nats (`round(−ln(p)·1e6)`) BEFORE the per-document
  * sum, so aggregation is exact integer arithmetic — the same result
  * on any engine, partitioning, or summation order. A double sum would
  * be order-dependent in the last ulp and hash-unstable across
  * engines.
  *
  * Scale shape: tokenize → per-(doc, term) counts (one map-side-
  * combinable shuffle), corpus term table derived FROM that tf table
  * (vocab-sized, no second corpus scan — the tf table is checkpointed
  * so one tokenize pass feeds both branches), stats joined back on
  * term (AQE broadcasts when the vocab is small), one final per-doc
  * aggregation. No driver-side state, no UDFs.
  */
object LangModel {

  /** Lowercase alpha tokens — mirrors the tfidf/bm25 tokenizer (and
    * the ANSI-SQL `regexp_extract_all` twin). */
  def tokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+"), lit(0))

  /** Per-document unigram NLL: `n_terms` (token count) and
    * `sum_nll_e6` (total surprisal in micro-nats, exact BIGINT).
    * Average surprisal = sum_nll_e6 / n_terms / 1e6 nats/token;
    * perplexity = exp of that. Documents with zero alpha tokens
    * produce no row (nothing to score). MLE probabilities over the
    * scored corpus itself — every scored token is in-vocabulary by
    * construction, so no smoothing term. */
  def unigramNll(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = Dedup.spread(docs, col(idCol))
      .select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
      // one tokenize pass feeds BOTH the corpus-stats branch and the
      // scoring join (the bm25 tf-table lesson); at real scale this
      // materialization is a persisted stage, not a recompute
      .localCheckpoint(true)
    val stats = tf.groupBy("term").agg(sum(col("tf")).as("ctf"))
    val total = stats.agg(sum(col("ctf")).cast("double").as("n_total"))
    tf.join(stats, "term")
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("tf"),
        (col("tf") * round(-log(col("ctf").cast("double") / col("n_total"))
          * lit(1000000.0)).cast("bigint")).as("nll_e6"))
      .groupBy("doc_id")
      .agg(sum(col("tf")).cast("bigint").as("n_terms"),
        sum(col("nll_e6")).cast("bigint").as("sum_nll_e6"))
  }
}
