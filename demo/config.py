"""Demo constants (reference demo/config.py:3-35)."""

AVAILABLE_MODELS = [
    "vidore/colpali-v1.3",
    "vidore/colSmol-500M",
    "vidore/colqwen2.5-v0.2",
]

BENCHMARK_DATASETS = [
    "esg_reports_v2",
    "biomedical_lectures_v2",
    "economics_reports_v2",
]

DATASET_STATS = {
    "esg_reports_v2": {"docs": 1538, "queries": 228},
    "biomedical_lectures_v2": {"docs": 1016, "queries": 640},
    "economics_reports_v2": {"docs": 452, "queries": 232},
}

RETRIEVAL_MODES = [
    "two_stage",
    "three_stage",
    "single_full",
    "single_tiles",
    "single_pooled",
    "single_global",
    "single_experimental_tokens",
    "single_experimental_pooled",
]

STAGE1_MODES = [
    "pooled_query_vs_standard_pooling",
    "tokens_vs_standard_pooling",
    "pooled_query_vs_experimental_pooling",
    "tokens_vs_experimental_pooling",
    "pooled_query_vs_global",
]

DEFAULT_INDEX_DIR = "index_data"
