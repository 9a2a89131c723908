"""Distributed BPE tokenizer training (byte-pair-encoding merges).

The one canonical LLM-pipeline operator the repo lacked: learn a
subword vocabulary from the corpus itself (Sennrich et al. 2016 — the
algorithm behind GPT-2/RoBERTa tokenizers), as a Spark-first iterative
aggregation. The reference has no tokenizer surface at all; this
extends the north-star training-pipeline additions (chunking/packing in
``text.py`` consume the result via ``chunk_documents(tokens_col=...)``).

Algorithm and its scale shape:

1. ONE corpus scan builds the word-type frequency table
   (``explode(split) → groupBy(word).count``) — the only stage whose
   cost is proportional to corpus size. Every later iteration runs on
   word TYPES weighted by frequency; by Zipf's law that table is
   millions of rows at 100 TB, not trillions — the classic reason BPE
   training is feasible at all.
2. Each merge iteration: count adjacent symbol pairs (explode + one
   map-side-combinable sum agg), take the global argmax (``limit(1)``
   — a bounded ONE-ROW collect; the merge rule is driver state by
   construction, exactly like a Delta commit), and apply the merge to
   every word with a fold expression (``F.aggregate`` — JVM-side,
   whole-stage codegen; no UDF anywhere in training).
3. Lineage is cut with ``localCheckpoint`` every ``checkpoint_every``
   merges, so the plan stays O(checkpoint interval) deep instead of
   O(num_merges).

Determinism: ties on pair count break lexicographically (smallest
``(a, b)``), so training is a pure function of (corpus bag-of-words,
parameters) — partitioning/cluster-size invariant, pinned by test
against a sequential reference implementation.

Merging is greedy LEFT-TO-RIGHT and non-overlapping (``aaa`` under
rule ``a+a`` → ``[aa, a]``), matching the reference algorithm.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens


def _chars(col: Column) -> Column:
    # split-by-empty-pattern yields one element per character
    # (unicode-aware, no empty strings)
    return F.split(col, "")


def _pairs(syms: Column) -> Column:
    """Adjacent (a, b) symbol pairs of one word — empty for 1-symbol
    words (the ``when`` guard matters: ``sequence(1, 0)`` is the
    DESCENDING two-element sequence, not empty)."""
    n = F.size(syms)
    idx = F.sequence(F.lit(1), n - 1)
    mk = lambda i: F.struct(
        F.element_at(syms, i).alias("a"),
        F.element_at(syms, i + 1).alias("b"),
    )
    empty = F.array().cast("array<struct<a:string,b:string>>")
    return F.when(n >= 2, F.transform(idx, mk)).otherwise(empty)


def apply_merge(syms: Column, a: str, b: str) -> Column:
    """Replace every left-to-right non-overlapping ``a, b`` adjacency
    in a symbol array with the merged symbol ``a+b`` — one
    whole-stage-codegen fold (accumulator: emitted prefix + one pending
    symbol), linear per word, no UDF."""
    merged = a + b
    acc0 = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("pend"),
    )

    def step(acc: Column, x: Column) -> Column:
        out, pend = acc.getField("out"), acc.getField("pend")
        return (
            F.when(pend.isNull(), F.struct(out.alias("out"), x.alias("pend")))
            .when(
                (pend == a) & (x == b),
                F.struct(
                    F.concat(out, F.array(F.lit(merged))).alias("out"),
                    F.lit(None).cast("string").alias("pend"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(out, F.array(pend)).alias("out"),
                    x.alias("pend"),
                )
            )
        )

    def finish(acc: Column) -> Column:
        out, pend = acc.getField("out"), acc.getField("pend")
        return F.when(pend.isNull(), out).otherwise(
            F.concat(out, F.array(pend))
        )

    return F.aggregate(syms, acc0, step, finish)


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 100,
    min_frequency: int = 2,
    end_of_word: str | None = None,
    checkpoint_every: int = 10,
) -> list[tuple[str, str]]:
    """Learn up to ``num_merges`` BPE merge rules from the corpus;
    returns them in learned order (rule i was the most frequent
    adjacent pair after rules 0..i-1 were applied).

    Stops early when no pair reaches ``min_frequency`` (default 2 — a
    pair seen once carries no generalization; Sennrich's stopping
    rule). ``end_of_word`` optionally appends a marker symbol to each
    word (e.g. ``"</w>"``) so learned subwords distinguish suffixes
    from prefixes — the marker is appended AFTER character splitting
    and is never split itself.
    """
    words = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.explode(tokens(text_col)).alias("_w"))
        .filter(F.length("_w") > 0)
        .groupBy("_w")
        .agg(F.count("*").alias("cnt"))
        .select(_chars(F.col("_w")).alias("syms"), "cnt")
    )
    if end_of_word:
        words = words.select(
            F.concat(F.col("syms"), F.array(F.lit(end_of_word))).alias("syms"),
            "cnt",
        )
    # eager: the corpus is scanned exactly once, here
    words = words.localCheckpoint()

    merges: list[tuple[str, str]] = []
    for i in range(num_merges):
        top = (
            words.filter(F.size("syms") >= 2)
            .select(F.explode(_pairs(F.col("syms"))).alias("p"), "cnt")
            .groupBy("p")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(
                F.col("n").desc(), F.col("p.a").asc(), F.col("p.b").asc()
            )
            .limit(1)
            .collect()  # bounded: exactly one row — the merge rule
        )
        if not top or top[0]["n"] < min_frequency:
            break
        a, b = top[0]["p"]["a"], top[0]["p"]["b"]
        merges.append((a, b))
        words = words.select(
            apply_merge(F.col("syms"), a, b).alias("syms"), "cnt"
        )
        if (i + 1) % checkpoint_every == 0:
            words = words.localCheckpoint()
    return merges


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    end_of_word: str | None = None,
) -> DataFrame:
    """Tokenize ``text_col`` with a trained merge list: per word, the
    standard rank-greedy BPE encode (repeatedly merge the present pair
    with the LOWEST training rank until none applies — GPT-2's encoder
    loop), concatenated across words in order.

    Arrow-batched Pandas UDF, not a fold expression: encoding applies
    up to ``len(merges)`` data-dependent rules per word — as a Catalyst
    expression that is a ``num_merges``-deep chained plan (codegen
    blowup), while per-batch Python with a word-type cache (Zipf: a
    batch of documents repeats mostly the same words) does it in one
    pass. This is the sanctioned Python hot path: vectorized batches,
    linear work, no shuffle."""
    ranks = {tuple(m): r for r, m in enumerate(merges)}
    marker = end_of_word

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def enc(texts):
        import pandas as pd

        cache: dict[str, list[str]] = {}

        def enc_word(w: str) -> list[str]:
            got = cache.get(w)
            if got is not None:
                return got
            syms = list(w)
            if marker:
                syms.append(marker)
            while len(syms) >= 2:
                best_rank, best = None, None
                for p in zip(syms, syms[1:]):
                    r = ranks.get(p)
                    if r is not None and (best_rank is None or r < best_rank):
                        best_rank, best = r, p
                if best is None:
                    break
                a, b = best
                out, pend = [], None
                for x in syms:
                    if pend is None:
                        pend = x
                    elif pend == a and x == b:
                        out.append(a + b)
                        pend = None
                    else:
                        out.append(pend)
                        pend = x
                if pend is not None:
                    out.append(pend)
                syms = out
            cache[w] = syms
            return syms

        import re

        # ASCII \s+, NOT str.split(): Python's default split breaks on
        # unicode whitespace (U+00A0 etc.) that Spark's Java '\s+'
        # tokenizer — the one train_bpe used — does NOT treat as a
        # separator; diverging here would encode word boundaries the
        # trained vocabulary never saw.
        ws = re.compile(r"\s+", re.ASCII)

        def enc_text(t):
            if t is None:
                return None
            out: list[str] = []
            for w in ws.split(t):
                if w:
                    out.extend(enc_word(w))
            return out

        return pd.Series([enc_text(t) for t in texts])

    return df.withColumn(out_col, enc(F.col(text_col)))
