from .dedup import dedup_keep_latest, exact_dedup_groups, minhash_lsh_candidates
from .merge import merge_upsert
from .quality import dq_summary
from .sessionize import gap_sessionize
from .temporal import asof_join, interval_join, scd2_from_history
from .util import ScaleGuardrailError
from .similarity import cosine_topk, label_centroid_norms
from .text import (
    add_text_features,
    bm25_scores,
    bm25_select,
    bm25_term_stats,
    doc_fingerprint,
    shingles,
    tfidf_scores,
    top_tfidf_term,
    winnow_containment_hits,
    winnow_fingerprints,
    winnow_fingerprints_col,
    winnow_fingerprints_vec,
)

__all__ = [
    "ScaleGuardrailError",
    "add_text_features",
    "asof_join",
    "bm25_scores",
    "bm25_select",
    "bm25_term_stats",
    "cosine_topk",
    "dedup_keep_latest",
    "doc_fingerprint",
    "dq_summary",
    "exact_dedup_groups",
    "gap_sessionize",
    "interval_join",
    "label_centroid_norms",
    "merge_upsert",
    "minhash_lsh_candidates",
    "scd2_from_history",
    "shingles",
    "tfidf_scores",
    "winnow_containment_hits",
    "winnow_fingerprints",
    "winnow_fingerprints_col",
    "winnow_fingerprints_vec",
    "top_tfidf_term",
]
