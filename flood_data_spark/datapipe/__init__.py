from flood_data_spark.datapipe.text import (
    kneser_ney_scores,
    textrank_keywords,
    tfidf_topk,
    term_rows,
    with_token_count,
    with_bpe_token_count,
    with_quality_signals,
    with_lang_id,
    with_fingerprint,
    winnow_fingerprints,
    winnow_matches,
)
from flood_data_spark.datapipe.dedup import (
    dedup_against,
    dedup_keep_best,
    exact_dedup,
    soft_dedup_weights,
    ngram_containment,
    ngram_jaccard_join,
    ngram_jaccard_pairs,
    minhash_signatures,
    minhash_lsh_pairs,
    simhash,
    simhash_dup_pairs,
    dedup_clusters,
    jaccard_prefix_pairs,
    token_jaccard_pairs,
)
from flood_data_spark.datapipe.similarity import (
    cosine_topk_bruteforce,
    embedding_near_dup_pairs,
    ivf_append,
    ivf_build,
    ivf_drift_report,
    ivf_probe,
    ivf_topk,
    lsh_bucketed_topk,
    mine_bitext,
    ndcg_at_k,
)
from flood_data_spark.datapipe.curation import (
    assign_split,
    cap_per_key,
    chunk_documents,
    clean_lines,
    dedup_lines,
    hash_sample,
    impute_missing,
    neyman_allocation,
    pack_sequences,
    normalize_url,
    redact_pii,
    stratified_sample,
    url_host,
    with_shuffle_key,
    with_url_keys,
)
from flood_data_spark.datapipe.text import (repetition_signals,
                                            with_readability,
                                            zipf_fit)
from flood_data_spark.datapipe.fuzzy import (
    blocked_fuzzy_pairs,
    fs_linkage_weights,
    fs_score_pairs,
    fuzzy_match_against,
    snm_pairs,
    name_groups,
)
from flood_data_spark.datapipe.linalg import (
    covariance_matrix,
    dim_stats,
    gram_matrix,
    pca_topk,
    power_iteration_top,
    power_iteration_topk,
    project_components,
)
from flood_data_spark.datapipe.sketches import (
    cms_build,
    cms_estimate,
    cms_merge,
    kmv_distinct_estimate,
    kmv_jaccard,
    kmv_sketch,
)
from flood_data_spark.datapipe.graph import (
    adamic_adar,
    bfs_distances,
    hits,
    label_propagation,
    pagerank,
    triangle_counts,
)
from flood_data_spark.datapipe.bayes import (
    chi2_terms,
    mutual_information,
    naive_bayes_score,
    naive_bayes_train,
)
from flood_data_spark.datapipe.features import (
    apply_target_encoding,
    loo_encoding,
    oof_target_encoding,
    target_encoding,
    woe_encoding,
)
from flood_data_spark.datapipe.unigram import (
    em_reestimate,
    seed_vocabulary,
    viterbi_segment,
    word_table,
)
from flood_data_spark.datapipe.recommend import (
    item_cooccurrence,
    item_similarity,
    item_topk,
)
from flood_data_spark.datapipe.market import (
    association_rules,
    frequent_pairs,
)
from flood_data_spark.datapipe.text import (  # noqa: F401
    html_to_text,
    chrf,
    rouge_n,
    with_html_text,
)
from flood_data_spark.datapipe.rlhf import (
    best_of_n,
    dpo_pairs,
    group_advantages,
)
from flood_data_spark.datapipe.preference import (
    bradley_terry,
    pairwise_counts,
)
from flood_data_spark.datapipe.classifier import (
    best_split,
    split_candidates,
    evaluate_binary,
    evaluate_binary_by,
    platt_calibrate,
    roc_points,
    train_quality_classifier,
    with_classifier_score,
)

__all__ = [
    "target_encoding", "apply_target_encoding", "loo_encoding",
    "woe_encoding", "oof_target_encoding", "best_split",
    "split_candidates",
    "item_cooccurrence", "item_similarity", "item_topk", "mine_bitext",
    "kmv_sketch", "kmv_distinct_estimate", "kmv_jaccard", "ndcg_at_k",
    "textrank_keywords", "impute_missing",
    "word_table", "seed_vocabulary", "viterbi_segment", "em_reestimate",
    "with_token_count", "with_bpe_token_count", "with_quality_signals",
    "with_lang_id", "with_fingerprint",
    "dedup_against", "exact_dedup", "soft_dedup_weights",
    "dedup_keep_best",
    "ngram_containment",
    "ngram_jaccard_join", "ngram_jaccard_pairs",
    "minhash_signatures", "minhash_lsh_pairs", "simhash",
    "simhash_dup_pairs", "dedup_clusters", "tfidf_topk", "term_rows",
    "cosine_topk_bruteforce", "embedding_near_dup_pairs",
    "lsh_bucketed_topk", "ivf_topk", "ivf_build", "ivf_probe",
    "ivf_append", "ivf_drift_report",
    "hash_sample", "chunk_documents", "pack_sequences", "cap_per_key",
    "redact_pii", "repetition_signals", "clean_lines", "dedup_lines",
    "assign_split", "stratified_sample", "neyman_allocation", "fs_linkage_weights", "fs_score_pairs", "with_shuffle_key",
    "normalize_url", "url_host", "with_url_keys",
    "blocked_fuzzy_pairs", "fuzzy_match_against", "name_groups",
    "snm_pairs",
    "covariance_matrix", "dim_stats", "gram_matrix",
    "power_iteration_top", "power_iteration_topk", "project_components", "pca_topk",
    "cms_build", "cms_estimate", "cms_merge", "hits", "pagerank",
    "label_propagation", "triangle_counts", "adamic_adar",
    "bfs_distances", "naive_bayes_train", "naive_bayes_score",
    "chi2_terms", "mutual_information", "association_rules",
    "frequent_pairs",
    "winnow_fingerprints", "winnow_matches",
    "jaccard_prefix_pairs", "token_jaccard_pairs",
    "train_quality_classifier", "with_classifier_score",
    "platt_calibrate", "evaluate_binary", "evaluate_binary_by",
    "roc_points",
    "bradley_terry", "pairwise_counts", "kneser_ney_scores",
    "group_advantages", "best_of_n", "dpo_pairs", "rouge_n", "chrf",
    "html_to_text", "with_html_text",
]
