package graft

import org.apache.spark.sql.functions._

/** Empty-input robustness: at 100 TB an empty slice is an ordinary
  * event (a dataset filter matching nothing, a fresh ingest target, a
  * partition with no survivors). Every corpus-processing operator must
  * plan and return an empty, correctly-shaped result — not throw from
  * a driver-side `collect().head` or a degenerate quantizer.
  */
class EmptyInputSpec extends SparkSpecBase {

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty").toString
    Seq("documents", "embeddings").foreach { t =>
      Tables.load(spark, sf, t).limit(0).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    // events is TIMESTAMP(NANOS): replay the same physical schema by
    // writing the raw (nanos-as-long) frame back out, then the loader
    // path is identical to the testdata path.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sf/events.parquet").limit(0)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private val corpusOps: Seq[String] = Seq(
    "text_tokens", "text_quality", "text_repetition", "text_redact", "text_unigram_nll",
    "text_bigram_nll",
    "text_ngram_stats", "text_tfidf_keywords",
    "text_langid", "text_fingerprint",
    "text_chunk", "text_chunk_overlap", "text_chunk_paragraph",
    "dedup_exact", "dedup_tokenset", "dedup_ngram_jaccard",
    "dedup_minhash_lsh", "dedup_simhash",
    "curate_sample", "curate_sample_stratified", "curate_split",
    "curate_decontaminate", "curate_decontaminate_fuzzy", "curate_decontaminate_bloom",
    "curate_pack", "curate_mix",
    "curate_mix_temperature",
    "vec_knn", "vec_range_search", "vec_knn_ivf", "vec_knn_ivfpq", "vec_knn_lsh", "vec_knn_sq8", "vec_knn_trunc",
    "vec_dedup_cosine", "vec_centroids",
    "search_lexical_multiset", "search_lexical_bm25", "search_hybrid_rrf",
    "data_datasets", "search_history", "temporal_extract",
    "search_temporal", "search_temporal_open",
    "events_window_agg", "events_sessionize", "events_props_agg", "events_funnel",
    "events_transitions",
    "events_retention", "events_rfm", "events_dau_mau", "events_anomaly", "curate_budget",
    "search_rag_completion",
    "pipeline_cognify", "pipeline_prune", "pipeline_classify",
    "entity_extract_cascade", "code_summaries", "search_context_render",
    "store_vec_search", "store_doc_ingest",
    "eval_em_f1", "eval_context_coverage", "eval_histogram", "eval_report",
    "search_chunks_acl_role", "dedup_cluster", "curate_dedup_apply",
    "vec_kmeans", "vec_knn_graph", "curate_dsir", "curate_dedup_spans",
    "text_dup_fraction", "text_token_entropy", "pipeline_run_tasks",
    "curate_semdedup", "curate_overlap_sketch")

  test("corpus-processing operators return empty results on an empty corpus") {
    val failures = corpusOps.flatMap { name =>
      try {
        SparkEntry.queries(name)(spark, emptyDir).count()
        None
      } catch {
        case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName} ${String.valueOf(e.getMessage).take(80)}")
      }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
