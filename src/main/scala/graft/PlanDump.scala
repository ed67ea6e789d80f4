package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    val out = new StringBuilder
    for (q <- Seq("q_agg_q1", "q_join_star", "q_join_broadcast",
        "q_join_asof", "q_join_range", "q_sim_jaccard_pairs", "q_stream_tumbling",
        "q_sim_threshold_join", "q_dedup_ngram", "q_join_q5", "q_sim_knn_join",
        "q_stream_join", "q_sample_hash", "q_win_sessionize",
        "q_source_partitioned", "q_dedup_incremental",
        "q_graph_pagerank", "q_join_bucketed", "q_win_gapfill",
        "q_lake_merge", "q_agg_incremental", "q_ts_anomaly",
        "q_sim_cosine_sets", "q_dedup_simhash_exact", "q_sketch_hll",
        "q_graph_jaccard", "q_dedup_components",
        // round 6
        "q_ml_kmeans", "q_text_perplexity", "q_dedup_minhash_exact",
        "q_text_bpe", "q_ml_perceptron", "q_win_pattern",
        "q_dedup_substr",
        // round 7 batches 3-6
        "q_audit_expectations", "q_text_pii", "q_text_bm25",
        "q_vec_randproj", "q_lake_cdc", "q_win_distinct",
        "q_graph_closeness", "q_ts_holt", "q_sim_ann_pq",
        "q_text_bpe_encode", "q_mm_augment", "q_source_corrupt",
        "q_graph_scc",
        // round 7 batches 10-16
        "q_join_q3", "q_agg_q18", "q_graph_kcore", "q_text_chunking",
        "q_text_winnowing", "q_ml_stump", "q_profile_corr",
        // round 7 batches 17-19
        "q_fn_hash", "q_ml_linreg", "q_ts_theil_sen", "q_win_attrib",
        "q_text_stem", "q_join_q10", "q_agg_q14", "q_ts_transitions",
        // round 7 batch 20
        "q_sketch_kmv", "q_profile_iqr", "q_source_evolution",
        // round 7 batches 21-22
        "q_agg_q6", "q_graph_copurchase", "q_text_hashvec",
        "q_graph_adamic_adar", "q_mr_invidx",
        // round 7 batches 23-24
        "q_ml_knn", "q_ts_downsample", "q_source_json_multiline",
        "q_profile_benford", "q_graph_hits",
        // round 7 batch 26
        "q_agg_gini", "q_win_concurrency",
        // round 7 batch 27
        "q_lake_compact", "q_sample_balanced",
        // round 7 batch 28
        "q_join_null_safe", "q_ts_eval_wape", "q_mr_grep",
        // round 7 batch 30
        "q_join_q19", "q_graph_assortativity",
        // round 7 batch 31
        "q_win_latency", "q_source_binary",
        // round 7 batch 32
        "q_ts_period", "q_agg_hhi", "q_win_intervals",
        // round 7 batch 34
        "q_udaf_wavg", "q_graph_reciprocity", "q_text_lexicon",
        "q_text_divergence")) {
      val p = Registry.queries(q)(spark, d).queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      out.append(s"##### $q\n```\n")
      out.append(p.linesIterator.takeWhile(_.nonEmpty).mkString("\n"))
      out.append("\n```\n\n")
      // release both cache lifetimes between dumps (review r5): plan
      // compilation substitutes any registered cached subtree, so a
      // leaked persist would render later queries' plans as
      // InMemoryTableScan instead of their real cold shape. The ONE
      // deliberate exception is each query's OWN scoped cache
      // (q_graph_pagerank's edge relation) — registered during this
      // query's build, it is part of that query's real plan.
      Caches.releaseScoped()
      Caches.releaseShared()
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/tmp/plans_raw.md"), out.toString)
    spark.stop()
  }
}
