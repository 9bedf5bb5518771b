package graft

import org.apache.spark.sql.SparkSession

/** Dumps formatted physical plans for the load-bearing queries so scan
  * pruning / join strategies / shuffle counts can be audited
  * (`sbt "runMain graft.PlanAudit" > plans.txt`). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val targets = Seq("q_j2_broadcast_dims", "q_j1_multi_asset",
      "q_minhash_near_dups", "q_stac_regex_items", "q_stac_cmr_items",
      "q_ann_top1", "q_ann_lsh", "q_p1_regex_filter",
      "q_a5_cumulative_cap", "q_g1_geometry", "q_simhash_near_dups",
      "q_clean_corpus", "q_decontaminate", "q_repeated_spans",
      "q_asof_join", "q_asof_fwd", "q_range_join", "q_interval_join",
      "q_sessionize", "q_percentiles", "q_rollup", "q_w_sliding",
      "q_chunk_windows", "q_pack_concat", "q_pack_greedy",
      "q_tfidf_terms", "q_bm25_topk", "q_mixture", "q_hll_users",
      "q_kll_quantiles", "q_cms_counts", "q_ann_ivf",
      "q_pivot_daily", "q_json_props", "q_funnel", "q_retention",
      "q_winnow_fp", "q_winnow_pairs", "q_edit_distance",
      "q_dataset_diff", "q_cap_per_source", "q_dedup_incremental",
      "q_winnow_incremental",
      "q_quality_classifier", "q_curate_pipeline", "q_semdedup",
      "q_crossdoc_spans", "q_weighted_sample", "q_ann_pq",
      "q_ann_ivfpq", "q_pagerank", "q_shard_plan", "q_corpus_card",
      "q_cdc_apply", "q_scd2", "q_merge_into", "q_dup_clusters",
      "q_validate", "q_resample_ffill", "q_rolling_dau",
      "q_outliers", "q_skew_salted_join", "q_html_extract",
      "q_spatial_join", "q_triangles", "q_pmi_bigrams",
      "q_inverted_index", "q_winsorize",
      "q_line_dedup", "q_mask_tokens", "q_url_domains",
      "q_rolling_wau_hll", "q_label_centroids", "q_cms_join_size",
      "q_scd2", "q_asof_broadcast")
    targets.foreach { name =>
      println(s"\n========== $name ==========")
      println(SparkEntry.queries(name)(spark, dir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
