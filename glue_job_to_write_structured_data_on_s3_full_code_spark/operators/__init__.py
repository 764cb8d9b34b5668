from .top1 import top1_per_group
from .surrogate import sequential_key, scalable_key
from .fallback_join import FallbackTier, fallback_join
from .incremental import anti_join_new_rows
from .reconcile import reconcile
from .dedup import (
    exact_dedup,
    jaccard_similar_pairs,
    minhash_lsh_candidates,
    simhash,
)
from .similarity import (
    build_ivf_index,
    cosine_neardup,
    cosine_topk,
    ivf_index_append,
    ivf_index_built,
    ivf_index_probe,
    ivf_index_repair,
    ivf_index_verify,
    ivf_topk,
    lsh_bucketed_topk,
    pq_topk,
)
from .index_store import (
    InMemoryPointerStore,
    LocalPointerStore,
    S3PointerStore,
    gen_index_append,
    gen_index_build,
    gen_index_cell_skew,
    gen_index_compact,
    gen_index_diff,
    gen_index_gc,
    gen_index_import_posix,
    gen_index_probe,
    gen_index_rebalance,
    gen_index_verify,
)
from .multimodal import extract_media_features
from .temporal import asof_join, time_range_pairs
from .salted import salted_join

__all__ = [
    "top1_per_group",
    "sequential_key",
    "scalable_key",
    "FallbackTier",
    "fallback_join",
    "anti_join_new_rows",
    "reconcile",
    "exact_dedup",
    "jaccard_similar_pairs",
    "minhash_lsh_candidates",
    "simhash",
    "build_ivf_index",
    "cosine_neardup",
    "cosine_topk",
    "ivf_index_append",
    "ivf_index_built",
    "ivf_index_probe",
    "ivf_index_repair",
    "ivf_index_verify",
    "ivf_topk",
    "InMemoryPointerStore",
    "LocalPointerStore",
    "S3PointerStore",
    "gen_index_append",
    "gen_index_build",
    "gen_index_cell_skew",
    "gen_index_compact",
    "gen_index_diff",
    "gen_index_gc",
    "gen_index_import_posix",
    "gen_index_probe",
    "gen_index_rebalance",
    "gen_index_verify",
    "lsh_bucketed_topk",
    "pq_topk",
    "extract_media_features",
    "asof_join",
    "time_range_pairs",
    "salted_join",
]
