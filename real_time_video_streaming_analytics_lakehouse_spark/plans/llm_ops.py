"""Large-scale training-data-pipeline operators (BASELINE.json north
star): deduplication, text analysis, fingerprinting, and vector
similarity over the ``documents`` and ``embeddings`` tables.

All are oracle-checked except MinHash-LSH (hash-function-specific →
rows-only check; its exact companion ``ngram_jaccard_pairs`` IS
oracle-checked and validates the same semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import exact_dedup_groups, minhash_lsh_candidates
from ..operators.similarity import cosine_topk, label_centroid_norms
from ..operators.text import add_text_features, doc_fingerprint, ngram_jaccard_pairs
from ..sources.readers import load_table
from .catalog import QuerySpec


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


# --- exact dedup ----------------------------------------------------------

def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup_groups(_docs(spark, sf_dir), "text", "doc_id")


DEDUP_EXACT_DOCS_SQL = """
SELECT md5(text) AS text_hash, COUNT(*) AS dup_count,
       MIN(doc_id) AS canonical_doc_id
FROM documents GROUP BY 1
"""


# --- token statistics -----------------------------------------------------

def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    n_tokens = F.size(F.split(F.trim("text"), r"\s+"))
    return d.groupBy("lang").agg(
        F.count("*").alias("docs"),
        (F.sum(n_tokens) / F.count("*")).alias("avg_tokens"),
        F.max(n_tokens).alias("max_tokens"),
        (F.sum("n_chars") / F.count("*")).alias("avg_chars"),
    )


DOC_TOKEN_STATS_SQL = r"""
SELECT lang, COUNT(*) AS docs,
       SUM(len(string_split_regex(trim(text), '\s+'))) / COUNT(*) AS avg_tokens,
       CAST(MAX(len(string_split_regex(trim(text), '\s+'))) AS INTEGER) AS max_tokens,
       SUM(n_chars) / COUNT(*) AS avg_chars
FROM documents GROUP BY lang
"""


# --- per-doc quality features ----------------------------------------------

def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return add_text_features(_docs(spark, sf_dir))


TEXT_QUALITY_SQL = r"""
SELECT doc_id,
       CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER) AS n_tokens,
       CAST(length(text) AS INTEGER) AS n_chars_measured,
       length(regexp_replace(text, '\s+', '', 'g'))
             / len(string_split_regex(trim(text), '\s+')) AS avg_token_len,
       (length(text) - length(regexp_replace(text, '[aeiou]', '', 'g')))
             / CAST(length(text) AS DOUBLE) AS vowel_ratio,
       CASE WHEN len(string_split_regex(trim(text), '\s+')) >= 60
                 AND (length(text) - length(regexp_replace(text, '[aeiou]', '', 'g')))
                           / CAST(length(text) AS DOUBLE) > 0.25 THEN 'high'
            WHEN len(string_split_regex(trim(text), '\s+')) >= 30 THEN 'medium'
            ELSE 'low' END AS quality
FROM documents
"""


# --- content fingerprint ----------------------------------------------------

def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return doc_fingerprint(_docs(spark, sf_dir))


DOC_FINGERPRINTS_SQL = """
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct(
         list_transform(generate_series(1, greatest(length(text) - 2, 1)),
                        i -> substr(text, CAST(i AS INTEGER), 3)))), '')) AS fingerprint
FROM documents
"""


# --- rolling-hash fingerprints (order-sensitive, integer-exact) --------------

def rolling_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import rolling_fingerprint

    return rolling_fingerprint(_docs(spark, sf_dir))


ROLLING_FINGERPRINTS_SQL = """
SELECT doc_id,
       CASE WHEN text IS NULL THEN NULL
            WHEN length(text) > 0 THEN
         list_reduce(
           list_prepend(CAST(0 AS BIGINT),
             list_transform(generate_series(1, length(text)),
               i -> CAST(ascii(substr(text, CAST(i AS INTEGER), 1)) AS BIGINT))),
           (a, x) -> (a * 131 + x) % 1000000000000000)
       ELSE 0 END AS rhash
FROM documents
"""


# --- exact n-gram Jaccard near-dup pairs -------------------------------------

def ngram_jaccard_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(_docs(spark, sf_dir), top_n=50)


NGRAM_JACCARD_TOP_PAIRS_SQL = r"""
WITH words AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id, concat_ws(' ', w[i+1], w[i+2], w[i+3]) AS sh
  FROM (SELECT doc_id, w,
               unnest(generate_series(0, greatest(len(w) - 2, 1) - 1)) AS i
        FROM words)),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
pair_counts AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
scored AS (
  SELECT doc_a, doc_b, shared,
         sa.n_sh AS words_a, sb.n_sh AS words_b,
         ROUND(shared / CAST(sa.n_sh + sb.n_sh - shared AS DOUBLE), 6) AS jaccard
  FROM pair_counts
  JOIN sizes sa ON pair_counts.doc_a = sa.doc_id
  JOIN sizes sb ON pair_counts.doc_b = sb.doc_id)
SELECT doc_a, doc_b, shared, words_a, words_b, jaccard,
       CAST(rk AS INTEGER) AS rk
FROM (SELECT scored.*, ROW_NUMBER() OVER (
          ORDER BY jaccard DESC, doc_a, doc_b) AS rk FROM scored)
WHERE rk <= 50
"""


# --- MinHash + LSH (scale path; rows-only check) ------------------------------

def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_lsh_candidates(_docs(spark, sf_dir), min_est_jaccard=0.2)


def embedding_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH bucketed near-dup pairs over embeddings — the
    sub-quadratic approximate companion to ``embedding_cosine_pairs``
    (rows-only: bucket membership depends on the seeded hyperplanes, so
    the pair *set* is not SQL-expressible; every emitted cosine IS
    exact, which tests/test_similarity.py checks against the exact
    operator)."""
    from ..operators.similarity import lsh_cosine_pairs

    return lsh_cosine_pairs(_emb(spark, sf_dir), threshold=0.4, dim=64)


# --- vector similarity ---------------------------------------------------------

def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    return cosine_topk(emb, F.col("vec_id") < 5, k=5)


ANN_COSINE_TOPK_SQL = """
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
  FROM embeddings WHERE vec_id < 5),
c AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS ce
  FROM embeddings WHERE vec_id >= 5),
pairs AS (
  SELECT q.query_id, c.vec_id, c.label,
         list_sum(list_transform(range(1, 65), i -> qe[i] * ce[i])) AS dot,
         sqrt(list_sum(list_transform(range(1, 65), i -> qe[i] * qe[i]))) AS nq,
         sqrt(list_sum(list_transform(range(1, 65), i -> ce[i] * ce[i]))) AS nc
  FROM q CROSS JOIN c)
SELECT query_id, vec_id, label, cosine, CAST(rk AS INTEGER) AS rk FROM (
  SELECT query_id, vec_id, label,
         ROUND(dot / (nq * nc), 6) AS cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY ROUND(dot / (nq * nc), 6) DESC, vec_id) AS rk
  FROM pairs)
WHERE rk <= 5
"""


def embedding_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import cosine_pairs

    return cosine_pairs(_emb(spark, sf_dir), threshold=0.4)


EMBEDDING_COSINE_PAIRS_SQL = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(
         list_sum(list_transform(range(1, 65),
                  i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
         / (sqrt(list_sum(list_transform(range(1, 65),
                  i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE)))
            * sqrt(list_sum(list_transform(range(1, 65),
                  i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)))),
         6) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_sum(list_transform(range(1, 65),
               i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
      / (sqrt(list_sum(list_transform(range(1, 65),
               i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE)))
         * sqrt(list_sum(list_transform(range(1, 65),
               i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))))
      >= 0.4
"""


def ann_ivf_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import ann_ivf_topk

    return ann_ivf_topk(
        _emb(spark, sf_dir), F.col("vec_id") < 5, k=5, n_clusters=16, n_probe=4
    )


def embedding_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → duplicate clusters: connected components over
    the cosine>=0.4 pair graph (iterative min-label propagation; the
    oracle computes the same closure with a recursive CTE). Every
    vector appears once with its cluster's canonical (minimum) id."""
    from ..operators.graph import connected_components
    from ..operators.similarity import cosine_pairs

    emb = _emb(spark, sf_dir)
    pairs = cosine_pairs(emb, threshold=0.4)
    nodes = emb.select(F.col("vec_id").alias("id"))
    cc = connected_components(pairs, nodes, node_col="id")
    return cc.select(F.col("id").alias("vec_id"), "cluster_id")


EMBEDDING_DEDUP_CLUSTERS_SQL = """
WITH RECURSIVE pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_sum(list_transform(range(1, 65),
                 i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
        / (sqrt(list_sum(list_transform(range(1, 65),
                 i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE)))
           * sqrt(list_sum(list_transform(range(1, 65),
                 i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))))
        >= 0.4),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION SELECT id_b, id_a FROM pairs),
reach AS (
  SELECT vec_id AS src, vec_id AS dst FROM embeddings
  UNION
  SELECT r.src, e.v FROM reach r JOIN edges e ON r.dst = e.u)
SELECT src AS vec_id, MIN(dst) AS cluster_id
FROM reach GROUP BY 1
"""


def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    return label_centroid_norms(_emb(spark, sf_dir))


EMBEDDING_CENTROIDS_SQL = """
WITH flat AS (
  SELECT label, unnest(generate_series(1, 64)) AS dim,
         unnest(embedding::DOUBLE[]) AS v
  FROM embeddings),
cent AS (SELECT label, dim, AVG(v) AS c FROM flat GROUP BY 1, 2),
norms AS (SELECT label, ROUND(sqrt(SUM(c * c)), 6) AS centroid_norm
          FROM cent GROUP BY 1),
counts AS (SELECT label, COUNT(*) AS n_vectors FROM embeddings GROUP BY 1)
SELECT counts.label, counts.n_vectors, norms.centroid_norm
FROM counts JOIN norms ON counts.label = norms.label
"""


QUERIES: dict[str, QuerySpec] = {
    "dedup_exact_docs": QuerySpec(
        dedup_exact_docs, DEDUP_EXACT_DOCS_SQL, "exact dedup via hash-groupBy"
    ),
    "doc_token_stats": QuerySpec(
        doc_token_stats, DOC_TOKEN_STATS_SQL, "token counting per language"
    ),
    "text_quality": QuerySpec(
        text_quality, TEXT_QUALITY_SQL, "per-doc quality scoring"
    ),
    "doc_fingerprints": QuerySpec(
        doc_fingerprints, DOC_FINGERPRINTS_SQL, "shingle-set content fingerprint"
    ),
    "rolling_fingerprints": QuerySpec(
        rolling_fingerprints,
        ROLLING_FINGERPRINTS_SQL,
        "Rabin-Karp rolling-hash fingerprint (order-sensitive, "
        "integer-exact fold)",
    ),
    "ngram_jaccard_top_pairs": QuerySpec(
        ngram_jaccard_top_pairs,
        NGRAM_JACCARD_TOP_PAIRS_SQL,
        "exact word-3gram Jaccard near-dup pairs",
    ),
    "minhash_lsh_pairs": QuerySpec(
        minhash_lsh_pairs, None, "MinHash+LSH candidates (scale path; rows-only)"
    ),
    "ann_cosine_topk": QuerySpec(
        ann_cosine_topk, ANN_COSINE_TOPK_SQL, "brute-force cosine top-k"
    ),
    "embedding_cosine_pairs": QuerySpec(
        embedding_cosine_pairs,
        EMBEDDING_COSINE_PAIRS_SQL,
        "exact all-pairs cosine near-dup via distributed block-pair matmul",
    ),
    "embedding_lsh_pairs": QuerySpec(
        embedding_lsh_pairs,
        None,
        "hyperplane-LSH bucketed near-dup pairs (approximate scale "
        "path; rows-only — seeded hyperplanes are not SQL-expressible)",
    ),
    "ann_ivf_topk": QuerySpec(
        ann_ivf_topk_query,
        None,
        "IVF-bucketed approximate NN (scale path; rows-only — seeded "
        "k-means is not SQL-expressible; exactness vs brute force is "
        "covered by tests/test_similarity.py's full-probe invariant)",
    ),
    "embedding_centroids": QuerySpec(
        embedding_centroids, EMBEDDING_CENTROIDS_SQL, "per-label centroid norms"
    ),
    "embedding_dedup_clusters": QuerySpec(
        embedding_dedup_clusters,
        EMBEDDING_DEDUP_CLUSTERS_SQL,
        "near-dup clusters via iterative connected components",
    ),
}
