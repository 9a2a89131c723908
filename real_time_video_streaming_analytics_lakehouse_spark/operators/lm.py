"""Distributed n-gram language-model training + perplexity scoring.

The classic model-based quality signal for training-data curation
(CCNet/KenLM-style): train a count-based bigram LM on a reference
corpus, score every candidate document by average log-probability /
perplexity, and gate or re-weight on the score. The reference repo has
no LM surface; this extends the north-star LLM-pipeline additions
(quality ratios in ``text.py`` are lexical — this is the
distributional complement).

Everything is built-in DataFrame ops — counting IS aggregation:

* :func:`train_bigram_lm` — one corpus scan: explode adjacent token
  pairs, two map-side-combinable count aggregates (bigram + unigram
  tables). ``min_count`` prunes the long tail (standard LM pruning;
  at 100 TB the kept table is vocabulary-shaped, not corpus-shaped,
  and usually broadcastable).
* :func:`score_documents` — per document: explode its bigrams, join
  the count tables (AQE broadcasts them when pruned), and aggregate
  add-k-smoothed log-probabilities:
  ``P(w2|w1) = (c12 + k) / (c1 + k·V)``, OOV contexts fall back to the
  uniform ``k/(k·V) = 1/V`` floor. Output: per-doc bigram totals,
  hit/OOV counts, ``avg_logprob``, and ``ppl = exp(-avg_logprob)``.

Scale shape: one shuffle for each count table at train time; scoring
is a map-stage join (broadcast LM) + per-doc partial aggregation — no
wide stage grows with corpus size. The integer surfaces (hits, counts)
are exactly reproducible in any engine; the float score is pinned by
closed-form pytest (log/exp are not bit-portable across engines, so
the driver oracle checks the integer arms — see
``plans/llm_ops.py::text_quality``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .bpe import _pairs
from .text import tokens


def adjacent_token_pairs(
    df: DataFrame, text_col: str = "text", id_col: str | None = None,
    tokens_col: str | None = None,
) -> DataFrame:
    """(w1, w2) adjacency rows per document — the shared derivation for
    training and scoring, so the two sides can never disagree on
    tokenization. ``tokens_col`` accepts a pre-tokenized array column
    (e.g. BPE output) like :func:`..text.chunk_documents`."""
    unit = F.col(tokens_col) if tokens_col else tokens(text_col)
    cols = [F.col(id_col)] if id_col else []
    src = df.filter(
        F.col(tokens_col if tokens_col else text_col).isNotNull()
    )
    return src.select(
        *cols, F.explode(_pairs(unit)).alias("_p")
    ).select(*cols, F.col("_p.a").alias("w1"), F.col("_p.b").alias("w2"))


def train_bigram_lm(
    df: DataFrame,
    text_col: str = "text",
    tokens_col: str | None = None,
    min_count: int = 1,
) -> tuple[DataFrame, DataFrame]:
    """Count tables of a bigram LM: ``(unigrams(w1, c1),
    bigrams(w1, w2, c12))``. ``min_count`` drops bigrams rarer than
    the threshold (the unigram table is kept exact — it is the
    normalizer and is vocabulary-sized anyway)."""
    pairs = adjacent_token_pairs(df, text_col, tokens_col=tokens_col)
    bigrams = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    if min_count > 1:
        bigrams = bigrams.filter(F.col("c12") >= min_count)
    # unigram counts as bigram CONTEXTS (all w1 occurrences), the
    # denominator of P(w2|w1)
    unigrams = pairs.groupBy("w1").agg(F.count("*").alias("c1"))
    return unigrams, bigrams


def score_documents(
    df: DataFrame,
    unigrams: DataFrame,
    bigrams: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokens_col: str | None = None,
    k: float = 1.0,
    with_logprob: bool = True,
) -> DataFrame:
    """Per-document LM score against trained count tables.

    Output: ``id_col, n_bigrams, lm_hits`` (bigrams present in the
    table), ``lm_oov`` (absent), ``lm_hit_weight`` (sum of matched
    counts — the integer arm a SQL oracle can check exactly), and with
    ``with_logprob`` (default) ``avg_logprob`` (add-k smoothed, NULL
    for docs with no bigrams) and ``ppl = exp(-avg_logprob)``. Every
    input document emits a row.

    ``with_logprob=False`` emits only the integer surfaces and skips
    both the unigram join and the 1-row vocab-size cross join — the
    cheap gating mode (and the mode whose plan is pure broadcast hash
    joins; the vocab attachment is a bounded 1-row nested-loop
    broadcast, same shape as a 1x1 KPI cross join).
    """
    reserved = {"w1", "w2", "c1", "c12", "_p", "_v"} & set(df.columns)
    if reserved:
        raise ValueError(
            f"score_documents reserves column names {sorted(reserved)}; "
            "rename them on the input frame"
        )
    pairs = adjacent_token_pairs(df, text_col, id_col=id_col,
                                 tokens_col=tokens_col)
    joined = pairs.join(bigrams, ["w1", "w2"], "left_outer")
    aggs = [
        F.count("*").alias("n_bigrams"),
        F.count("c12").alias("lm_hits"),
        (F.count("*") - F.count("c12")).alias("lm_oov"),
        F.coalesce(F.sum("c12"), F.lit(0)).alias("lm_hit_weight"),
    ]
    if with_logprob:
        vocab = unigrams.agg(F.count("*").alias("_v"))
        joined = (
            joined.join(unigrams, ["w1"], "left_outer")
            .crossJoin(F.broadcast(vocab))
        )
        c12 = F.coalesce(F.col("c12"), F.lit(0)).cast("double")
        c1 = F.coalesce(F.col("c1"), F.lit(0)).cast("double")
        v = F.col("_v").cast("double")
        aggs.append(
            F.avg(F.log((c12 + F.lit(k)) / (c1 + F.lit(k) * v)))
            .alias("avg_logprob")
        )
    per_doc = joined.groupBy(id_col).agg(*aggs)
    base = df.select(id_col)
    out_cols = [
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        F.coalesce("lm_hits", F.lit(0)).alias("lm_hits"),
        F.coalesce("lm_oov", F.lit(0)).alias("lm_oov"),
        F.coalesce("lm_hit_weight", F.lit(0)).alias("lm_hit_weight"),
    ]
    if with_logprob:
        out_cols += [
            F.col("avg_logprob"),
            F.exp(-F.col("avg_logprob")).alias("ppl"),
        ]
    return base.join(per_doc, id_col, "left_outer").select(id_col, *out_cols)
