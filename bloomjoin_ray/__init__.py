"""bloomjoin_ray — a Ray-Data-native distributed sketch / approximate-
aggregation engine built from scratch around the ideas of gojiplus/bloomjoin
(Bloom-filter pre-filtered joins), generalized to a mergeable-UDAF family
(Bloom, HyperLogLog, count-min, t-digest, KLL, theta, Misra–Gries,
reservoir) plus the operators a large-scale training-data pipeline needs
(dedup, similarity search, text analysis, windows, as-of joins) over
Parquet tables streamed through ``ray.data.Dataset``.

Nothing in this package calls ``ray.init`` — sessions are owned by the
caller (tests' conftest fixture, ``bench.py``, ``jobs/``, or the driver).
"""

from .functions.keys import hash_keys32, hash_keys64
from .params import BloomParams, bloom_achieved_fpr, bloom_params, bloom_sizing
from .report import JoinReport
from .state.bloom import BloomSketch
from .state.cms import CountMinSketch
from .state.ddsketch import DDSketch
from .state.hll import HllSketch, SparseHll
from .state.kll import KllSketch
from .state.misra_gries import MisraGries
from .state.reservoir import ReservoirSample
from .state.tdigest import TDigest
from .state.theta import ThetaSketch

__all__ = [
    # kernels / params
    "hash_keys32", "hash_keys64",
    "BloomParams", "bloom_params", "bloom_sizing", "bloom_achieved_fpr",
    "JoinReport",
    # sketches
    "BloomSketch", "HllSketch", "SparseHll", "CountMinSketch", "TDigest",
    "KllSketch", "DDSketch", "ThetaSketch", "MisraGries", "ReservoirSample",
]


def __getattr__(name):
    """Lazy pipeline exports (they import ray.data, which is heavy):
    bloom_join, hash_join, asof_join, sketch/aggregation helpers,
    dedup/ANN/text/window pipelines."""
    from importlib import import_module

    lazy = {
        "bloom_join": "bloomjoin_ray.pipelines.join",
        "hash_join": "bloomjoin_ray.pipelines.join",
        "asof_join": "bloomjoin_ray.pipelines.asof",
        "range_join": "bloomjoin_ray.pipelines.range_join",
        "hll_distinct": "bloomjoin_ray.pipelines.aggregate",
        "approx_quantiles": "bloomjoin_ray.pipelines.aggregate",
        "grouped_quantile_exact": "bloomjoin_ray.pipelines.aggregate",
        "rollup_agg": "bloomjoin_ray.pipelines.aggregate",
        "cube_agg": "bloomjoin_ray.pipelines.aggregate",
        "grouping_sets_agg": "bloomjoin_ray.pipelines.aggregate",
        "grouped_moments": "bloomjoin_ray.pipelines.aggregate",
        "distinct_rows": "bloomjoin_ray.pipelines.setops",
        "union_distinct": "bloomjoin_ray.pipelines.setops",
        "intersect_distinct": "bloomjoin_ray.pipelines.setops",
        "except_distinct": "bloomjoin_ray.pipelines.setops",
        "explode_column": "bloomjoin_ray.pipelines.reshape",
        "unpivot": "bloomjoin_ray.pipelines.reshape",
        "pivot_counts": "bloomjoin_ray.pipelines.aggregate",
        "filter_by_quantile": "bloomjoin_ray.pipelines.aggregate",
        "bucketize_by_quantile": "bloomjoin_ray.pipelines.aggregate",
        "grouped_vector_mean": "bloomjoin_ray.pipelines.aggregate",
        "cms_heavy_hitters": "bloomjoin_ray.pipelines.aggregate",
        "estimate_join_size": "bloomjoin_ray.pipelines.aggregate",
        "ams_f2": "bloomjoin_ray.pipelines.aggregate",
        "AmsSketch": "bloomjoin_ray.state.ams",
        "mg_heavy_hitters": "bloomjoin_ray.pipelines.aggregate",
        "theta_sketch": "bloomjoin_ray.pipelines.aggregate",
        "theta_set_estimates": "bloomjoin_ray.pipelines.aggregate",
        "distinct_exact": "bloomjoin_ray.pipelines.aggregate",
        "topk_exact": "bloomjoin_ray.pipelines.aggregate",
        "topk_per_key": "bloomjoin_ray.pipelines.aggregate",
        "topk_rows_per_key": "bloomjoin_ray.pipelines.aggregate",
        "grouped_distinct_exact": "bloomjoin_ray.pipelines.aggregate",
        "collect_per_key": "bloomjoin_ray.pipelines.aggregate",
        "normalize_per_key": "bloomjoin_ray.pipelines.aggregate",
        "grouped_sums": "bloomjoin_ray.pipelines.aggregate",
        "reservoir_sample": "bloomjoin_ray.pipelines.aggregate",
        "sketch_aggregate_global": "bloomjoin_ray.pipelines.aggregate",
        "sketch_aggregate_grouped": "bloomjoin_ray.pipelines.aggregate",
        "exact_dedup": "bloomjoin_ray.pipelines.dedup",
        "dedup_lines": "bloomjoin_ray.pipelines.dedup",
        "split_by_hash": "bloomjoin_ray.pipelines.split",
        "stratified_sample": "bloomjoin_ray.pipelines.split",
        "mix_corpora": "bloomjoin_ray.pipelines.split",
        "minhash_dedup": "bloomjoin_ray.pipelines.dedup",
        "minhash_lsh_pairs": "bloomjoin_ray.pipelines.dedup",
        "simhash_dedup": "bloomjoin_ray.pipelines.dedup",
        "simhash_pairs": "bloomjoin_ray.pipelines.dedup",
        "ngram_jaccard_pairs": "bloomjoin_ray.pipelines.dedup",
        "ann_topk": "bloomjoin_ray.pipelines.ann",
        "lsh_ann_topk": "bloomjoin_ray.pipelines.ann",
        "ivf_ann_topk": "bloomjoin_ray.pipelines.ann",
        "embedding_dedup_pairs": "bloomjoin_ray.pipelines.ann",
        "kmeans_fit": "bloomjoin_ray.pipelines.ann",
        "assign_clusters": "bloomjoin_ray.pipelines.ann",
        "semdedup_pairs": "bloomjoin_ray.pipelines.ann",
        "semdedup": "bloomjoin_ray.pipelines.dedup",
        "text_stats": "bloomjoin_ray.pipelines.text",
        "language_id": "bloomjoin_ray.pipelines.text",
        "fingerprints": "bloomjoin_ray.pipelines.text",
        "filter_by_quality": "bloomjoin_ray.pipelines.text",
        "json_extract_scalar": "bloomjoin_ray.pipelines.text",
        "rank_per_key": "bloomjoin_ray.pipelines.windows",
        "first_last_per_key": "bloomjoin_ray.pipelines.windows",
        "histogram": "bloomjoin_ray.pipelines.aggregate",
        "regex_extract": "bloomjoin_ray.pipelines.text",
        "mode_per_key": "bloomjoin_ray.pipelines.aggregate",
        "canonicalize_text": "bloomjoin_ray.pipelines.text",
        "describe": "bloomjoin_ray.pipelines.aggregate",
        "cross_join": "bloomjoin_ray.pipelines.join",
        "dataset_checksum": "bloomjoin_ray.pipelines.aggregate",
        "ewma_per_key": "bloomjoin_ray.pipelines.windows",
        "fill_forward_per_key": "bloomjoin_ray.pipelines.windows",
        "split_to_rows": "bloomjoin_ray.pipelines.reshape",
        "interval_join": "bloomjoin_ray.pipelines.range_join",
        "add_time_parts": "bloomjoin_ray.pipelines.text",
        "share_per_key": "bloomjoin_ray.pipelines.windows",
        "tail_by_budget": "bloomjoin_ray.pipelines.windows",
        "truncate_context": "bloomjoin_ray.pipelines.windows",
        "grouped_jaccard_exact": "bloomjoin_ray.pipelines.aggregate",
        "entropy_per_key": "bloomjoin_ray.pipelines.aggregate",
        "approx_percentile_rank": "bloomjoin_ray.pipelines.aggregate",
        "write_partitioned_by": "bloomjoin_ray.pipelines.materialize",
        "scrub_text": "bloomjoin_ray.pipelines.text",
        "pack_documents": "bloomjoin_ray.pipelines.text",
        "chunk_documents": "bloomjoin_ray.pipelines.text",
        "token_counts": "bloomjoin_ray.pipelines.text",
        "count_tokens_bpe": "bloomjoin_ray.pipelines.text",
        "doc_frequency": "bloomjoin_ray.pipelines.text",
        "tfidf_topk": "bloomjoin_ray.pipelines.text",
        "bm25_topk": "bloomjoin_ray.pipelines.text",
        "hashed_doc_vectors": "bloomjoin_ray.pipelines.text",
        "ngram_perplexity": "bloomjoin_ray.pipelines.text",
        "train_ngram_counts": "bloomjoin_ray.pipelines.text",
        "repetition_stats": "bloomjoin_ray.pipelines.text",
        "filter_repetitive": "bloomjoin_ray.pipelines.text",
        "decontaminate": "bloomjoin_ray.pipelines.decontam",
        "contaminated_counts": "bloomjoin_ray.pipelines.decontam",
        "cross_doc_ngram_stats": "bloomjoin_ray.pipelines.decontam",
        "duplicate_spans": "bloomjoin_ray.pipelines.decontam",
        "scrub_duplicate_spans": "bloomjoin_ray.pipelines.decontam",
        "knn_join": "bloomjoin_ray.pipelines.ann",
        "pq_fit": "bloomjoin_ray.pipelines.ann",
        "pq_encode": "bloomjoin_ray.pipelines.ann",
        "pq_ann_topk": "bloomjoin_ray.pipelines.ann",
        "rerank_topk": "bloomjoin_ray.pipelines.ann",
        "ivfpq_encode": "bloomjoin_ray.pipelines.ann",
        "ivfpq_ann_topk": "bloomjoin_ray.pipelines.ann",
        "train_text_classifier": "bloomjoin_ray.pipelines.classify",
        "score_text_classifier": "bloomjoin_ray.pipelines.classify",
        "write_bucketed": "bloomjoin_ray.pipelines.bucketed",
        "bucketed_join": "bloomjoin_ray.pipelines.bucketed",
        "bucketed_map_groups": "bloomjoin_ray.pipelines.bucketed",
        "cogroup": "bloomjoin_ray.pipelines.cogroup",
        "dataset_diff": "bloomjoin_ray.pipelines.cogroup",
        "minhash_join": "bloomjoin_ray.pipelines.dedup",
        "edit_distance_join": "bloomjoin_ray.pipelines.fuzzy",
        "fuzzy_dedup": "bloomjoin_ray.pipelines.fuzzy",
        "init_corpus_index": "bloomjoin_ray.pipelines.incremental",
        "incremental_dedup": "bloomjoin_ray.pipelines.incremental",
        "rebuild_bloom": "bloomjoin_ray.pipelines.incremental",
        "compact_index": "bloomjoin_ray.pipelines.incremental",
        "read_index_spec": "bloomjoin_ray.pipelines.incremental",
        "init_neardup_index": "bloomjoin_ray.pipelines.incremental",
        "incremental_neardup_dedup": "bloomjoin_ray.pipelines.incremental",
        "rebuild_neardup_bloom": "bloomjoin_ray.pipelines.incremental",
        "compact_neardup_index": "bloomjoin_ray.pipelines.incremental",
        "levenshtein_batch": "bloomjoin_ray.functions.editdist",
        "read_bucket_spec": "bloomjoin_ray.pipelines.bucketed",
        "key_skew_summary": "bloomjoin_ray.pipelines.profile",
        "pipeline_stats": "bloomjoin_ray.pipelines.profile",
        "dataset_profile": "bloomjoin_ray.pipelines.profile",
        "heavy_keys": "bloomjoin_ray.pipelines.profile",
        "key_skew_sketch": "bloomjoin_ray.pipelines.profile",
        "tumbling_window": "bloomjoin_ray.pipelines.windows",
        "sliding_window": "bloomjoin_ray.pipelines.windows",
        "sessionize": "bloomjoin_ray.pipelines.windows",
        "shift_per_key": "bloomjoin_ray.pipelines.windows",
        "window_agg_per_key": "bloomjoin_ray.pipelines.windows",
        "ntile_per_key": "bloomjoin_ray.pipelines.windows",
        "checkpointed_sketch_aggregate": "bloomjoin_ray.pipelines.checkpoint",
        "resumable_write": "bloomjoin_ray.pipelines.materialize",
        "write_partitioned_by": "bloomjoin_ray.pipelines.materialize",
        "write_range_clustered": "bloomjoin_ray.pipelines.materialize",
        "read_range": "bloomjoin_ray.pipelines.materialize",
        "transcripts_dataset": "bloomjoin_ray.sources.transcripts",
        "write_transcripts": "bloomjoin_ray.sources.transcripts",
    }
    if name in lazy:
        return getattr(import_module(lazy[name]), name)
    raise AttributeError(f"module 'bloomjoin_ray' has no attribute {name!r}")
