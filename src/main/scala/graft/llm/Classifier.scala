package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Materializer.MaterializeOps

/** Model-based quality filtering — the classifier stage of web-corpus
  * curation (GPT-3/CCNet-style: train a cheap linear classifier on a
  * small "high-quality" reference set, score the whole corpus, keep
  * what scores above a cut). The model is multinomial Naive Bayes in
  * log-odds form: per-term weight
  * `w(t) = ln P(t|pos) − ln P(t|neg)` with add-one smoothing, document
  * score `prior + Σ_tokens w(t)` — exactly a linear text classifier
  * whose weights happen to be trainable in two aggregations, with no
  * iterative solver, driver-side math, or RNG.
  *
  * Reproducibility: weights are quantized to integer micro-nats
  * (`round(ln-odds · 1e6)` as BIGINT) BEFORE any per-document sum, so
  * scoring is exact integer arithmetic — identical on any engine,
  * partitioning, or summation order (the [[LangModel]] lesson).
  *
  * Scale shape: ONE tokenize pass builds the (doc, term) tf table
  * (map-side-combinable keyed shuffle, checkpointed so the stats
  * branch and the scoring join share it); class-conditional term
  * stats reduce to a vocab-sized table that joins back by term (AQE
  * broadcasts it when small); the 1-row constants (priors, OOV
  * weight, smoothing denominators) ride a broadcast cross join. The
  * model is two plain DataFrames — persist them as parquet and score
  * tomorrow's corpus without retraining (OOV terms get the smoothed
  * unseen-term weight, so scoring a fresh corpus is well-defined).
  */
object Classifier {

  /** Same tokenizer as the tfidf/bm25/LM family. */
  def tokens(text: Column): Column = LangModel.tokens(text)

  /** Train: `(weights, consts)`.
    * `weights` = (term, w_e6) — one row per training-vocab term;
    * `consts`  = 1 row (prior_e6, oov_e6) — class-prior log odds and
    * the weight for terms unseen at training time.
    * `labelCol` must be a boolean column on `docs`; both classes must
    * be non-empty (a one-class "corpus" has no odds to learn).
    *
    * Add-one smoothing: `P(t|c) = (tf_c(t)+1) / (N_c+V)` with V =
    * training vocab size, so every weight is finite and OOV terms get
    * `ln(1/(N_pos+V)) − ln(1/(N_neg+V))`. */
  def nbTrain(docs: DataFrame, idCol: String, textCol: String,
              labelCol: String): (DataFrame, DataFrame) =
    trainFromTf(
      termFrequencies(docs, idCol, textCol, Some(labelCol),
        checkpoint = false),
      docs, labelCol)

  private def trainFromTf(tf: DataFrame, docs: DataFrame,
                          labelCol: String): (DataFrame, DataFrame) = {
    val (stats, docStats) = statsFromTf(tf, docs, labelCol)
    weightsFromStats(stats, docStats)
  }

  /** The ONE definition of the count aggregation — both the direct
    * and the mergeable training paths route through it, so they
    * cannot de-synchronize. */
  private def statsFromTf(tf: DataFrame, docs: DataFrame,
                          labelCol: String): (DataFrame, DataFrame) = {
    val stats = tf.groupBy("term").agg(
      sum(when(col("pos"), col("tf")).otherwise(0L)).as("tfp"),
      sum(when(!col("pos"), col("tf")).otherwise(0L)).as("tfn"))
    val docStats = docs.agg(
      sum(when(col(labelCol), 1L).otherwise(0L)).as("dp"),
      sum(when(!col(labelCol), 1L).otherwise(0L)).as("dn"))
    (stats, docStats)
  }

  /** Score every document under a trained (possibly parquet-read)
    * model: `(id, n_terms, score_e6, pred)`. Every input doc gets a
    * row — a token-less doc scores the bare prior (the classifier's
    * honest answer, not a dropped row). One keyed shuffle for tf, one
    * term join (vocab side broadcast-able), one per-doc aggregation. */
  def nbScore(docs: DataFrame, weights: DataFrame, consts: DataFrame,
              idCol: String, textCol: String): DataFrame =
    scoreFromTf(
      termFrequencies(docs, idCol, textCol, None, checkpoint = false),
      weights, consts, docs, idCol)

  private def scoreFromTf(tf: DataFrame, weights: DataFrame,
                          consts: DataFrame, docs: DataFrame,
                          idCol: String): DataFrame = {
    val perDoc = tf
      .join(weights, Seq("term"), "left")
      .crossJoin(broadcast(consts.select(col("oov_e6"))))
      .select(col("doc_id"), col("tf"),
        (col("tf") * coalesce(col("w_e6"), col("oov_e6"))).as("tw_e6"))
      .groupBy("doc_id")
      .agg(sum(col("tf")).cast("bigint").as("n_terms"),
        sum(col("tw_e6")).cast("bigint").as("sum_w_e6"))
    docs.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .crossJoin(broadcast(consts.select(col("prior_e6"))))
      .select(col("doc_id"),
        coalesce(col("n_terms"), lit(0L)).as("n_terms"),
        (coalesce(col("sum_w_e6"), lit(0L)) + col("prior_e6"))
          .as("score_e6"))
      .withColumn("pred", col("score_e6") > 0)
  }

  /** Train on `docs` and score the same corpus — the in-corpus
    * self-scoring shape (every scored term in-vocabulary). ONE
    * tokenize pass: the checkpointed tf table feeds both the stats
    * branch and the scoring join. */
  def nbTrainScore(docs: DataFrame, idCol: String, textCol: String,
                   labelCol: String): DataFrame = {
    val tf = termFrequencies(docs, idCol, textCol, Some(labelCol),
      checkpoint = true) // fans into the stats branch AND scoring join
    val (weights, consts) = trainFromTf(tf, docs, labelCol)
    // consts is 1 row but consumed TWICE by the scorer (oov weight in
    // the term join, prior in the final projection) — each consumption
    // replayed its whole docStats + totals lineage
    scoreFromTf(tf.drop("pos"), weights,
      consts.materialized("classifier_consts"), docs, idCol)
  }

  /** Count-form model: `(stats, docStats)` — per-term class counts
    * `(term, tfp, tfn)` plus a 1-row `(dp, dn)` doc-count table. The
    * MERGEABLE representation of the same classifier: counts are
    * sums, so shard-trained stats combine by addition
    * ([[mergeStats]]) into exactly the whole-corpus model — the
    * HLL/KLL/CMS persist-partials pattern applied to model training
    * (train today's increment, merge with yesterday's stats, never
    * re-tokenize the history). Derive scorable weights with
    * [[weightsFromStats]] (bit-identical to [[nbTrain]] on the same
    * corpus). */
  def nbTrainStats(docs: DataFrame, idCol: String, textCol: String,
                   labelCol: String): (DataFrame, DataFrame) =
    statsFromTf(termFrequencies(docs, idCol, textCol, Some(labelCol),
      checkpoint = false), docs, labelCol)

  /** Merge count-form models (any number of shards/increments): term
    * counts add per term, doc counts add. Commutative and
    * associative — merge order, sharding, and partitioning cannot
    * change the result. */
  def mergeStats(models: Seq[(DataFrame, DataFrame)])
      : (DataFrame, DataFrame) = {
    require(models.nonEmpty, "mergeStats needs at least one model")
    val stats = models.map(_._1).reduce(_ unionByName _)
      .groupBy("term").agg(sum(col("tfp")).as("tfp"),
        sum(col("tfn")).as("tfn"))
    val docStats = models.map(_._2).reduce(_ unionByName _)
      .agg(sum(col("dp")).as("dp"), sum(col("dn")).as("dn"))
    (stats, docStats)
  }

  /** Derive the scorable `(weights, consts)` pair from count-form
    * stats — the same smoothing/quantization algebra as [[nbTrain]],
    * so `weightsFromStats(nbTrainStats(docs))` ==
    * `nbTrain(docs)` bit for bit. */
  def weightsFromStats(stats: DataFrame, docStats: DataFrame)
      : (DataFrame, DataFrame) = {
    // vocab-sized, materialized once: stats feeds the weights
    // projection AND two tot aggregations (weights' and consts') —
    // without this the tf-table term aggregation replays per consumer
    // (the q_quality_classifier plan showed the whole tf→groupBy(term)
    // pipeline THREE times)
    val st = stats.materialized("classifier_term_stats")
    // 1-row, consumed by weights and consts — materialize so the
    // vocab aggregation itself also runs once
    val tot = st.agg(
      sum(col("tfp")).cast("bigint").as("np"),
      sum(col("tfn")).cast("bigint").as("nn"),
      count(lit(1)).cast("bigint").as("v"))
      .materialized("classifier_totals")
    val weights = st.crossJoin(broadcast(tot))
      .select(col("term"), microNats(
        log((col("tfp") + 1).cast("double") / (col("np") + col("v")).cast("double")) -
        log((col("tfn") + 1).cast("double") / (col("nn") + col("v")).cast("double")))
        .as("w_e6"))
    val consts = docStats.crossJoin(tot)
      .select(
        when(col("dp") > 0 && col("dn") > 0,
          microNats(log(col("dp").cast("double")) -
            log(col("dn").cast("double"))))
          .otherwise(raise_error(concat(
            lit("Classifier needs both classes non-empty, got "),
            col("dp"), lit(" positive / "), col("dn"), lit(" negative"))))
          .as("prior_e6"),
        microNats(
          log(lit(1.0) / (col("np") + col("v")).cast("double")) -
          log(lit(1.0) / (col("nn") + col("v")).cast("double"))).as("oov_e6"))
    (weights, consts)
  }

  /** round(x·1e6) as BIGINT — integer micro-nats. */
  private def microNats(x: Column): Column =
    round(x * lit(1000000.0)).cast("bigint")

  /** (doc_id[, pos], term, tf) — the one tokenize pass. `checkpoint`
    * only when the caller fans it into MULTIPLE consumers (the
    * train+score path): an eager materialization on a single-consumer
    * path would run a job at DataFrame-construction time and block
    * pushdown into the scan for nothing. */
  private def termFrequencies(docs: DataFrame, idCol: String,
                              textCol: String, labelCol: Option[String],
                              checkpoint: Boolean): DataFrame = {
    val base = Dedup.spread(docs, col(idCol))
    val cols = col(idCol).as("doc_id") +:
      labelCol.map(l => col(l).as("pos")).toSeq :+
      explode(tokens(col(textCol))).as("term")
    val keys = "doc_id" +: labelCol.map(_ => "pos").toSeq :+ "term"
    val tf = base.select(cols: _*)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("tf"))
    if (checkpoint) tf.materialized("classifier_tf") else tf // lazy (r10 §6)
  }
}
