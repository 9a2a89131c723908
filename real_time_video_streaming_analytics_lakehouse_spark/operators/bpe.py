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

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens

#: ASCII \s+, NOT str.split(): Python's default split breaks on
#: unicode whitespace (U+00A0 etc.) that Spark's Java '\s+' tokenizer
#: — the one train_bpe uses — does NOT treat as a separator; diverging
#: here would encode word boundaries the trained vocabulary never saw.
_WS_ASCII = re.compile(r"\s+", re.ASCII)


def merge_word(syms: list, a: str, b: str) -> list:
    """Pure-Python left-to-right non-overlapping merge of one ``a, b``
    adjacency list — the SAME semantics as :func:`apply_merge`'s fold
    expression. ONE shared implementation (the graph module's
    ``_union_find_labels`` precedent) used by :func:`bpe_encode`'s
    UDF, :func:`train_bpe_bounded` and
    :func:`bpe_encode_sequential_bounded`, so the Python and Catalyst
    paths cannot drift."""
    out: list = []
    pend = None
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
    return out


def train_merges_py(
    word_counts,
    num_merges: int,
    min_frequency: int = 2,
    end_of_word: str | None = None,
) -> list[tuple[str, str]]:
    """The BPE merge loop as a pure function of the word bag —
    byte-identical semantics to :func:`train_bpe`'s distributed loop
    (argmax by count desc, ties lexicographic on (a, b); stop below
    ``min_frequency``), pinned equal in tests/test_bpe.py. Runs
    driver- or executor-side on a BOUNDED word-type table."""
    from collections import Counter

    words = []
    for w, cnt in word_counts:
        syms = list(w)
        if end_of_word:
            syms.append(end_of_word)
        words.append((syms, int(cnt)))
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pc: Counter = Counter()
        for syms, cnt in words:
            for p in zip(syms, syms[1:]):
                pc[p] += cnt
        if not pc:
            break
        (a, b), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_frequency:
            break
        merges.append((a, b))
        words = [(merge_word(s, a, b), c) for s, c in words]
    return merges


def encode_word_greedy(
    w: str,
    ranks: dict[tuple[str, str], int],
    end_of_word: str | None = None,
) -> list[str]:
    """Rank-greedy BPE encode of one word (GPT-2's encoder loop:
    repeatedly merge the present pair with the LOWEST training rank)."""
    syms = list(w)
    if end_of_word:
        syms.append(end_of_word)
    while len(syms) >= 2:
        best_rank, best = None, None
        for p in zip(syms, syms[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best = r, p
        if best is None:
            break
        syms = merge_word(syms, best[0], best[1])
    return syms


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
            if got is None:
                got = cache[w] = encode_word_greedy(w, ranks, marker)
            return got

        def enc_text(t):
            if t is None:
                return None
            out: list[str] = []
            for w in _WS_ASCII.split(t):
                if w:
                    out.extend(enc_word(w))
            return out

        return pd.Series([enc_text(t) for t in texts])

    return df.withColumn(out_col, enc(F.col(text_col)))


def train_bpe_bounded(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 100,
    min_frequency: int = 2,
    end_of_word: str | None = None,
    max_word_types: int = 200_000,
) -> DataFrame:
    """BPE training for a BOUNDED corpus as one LAZY plan — returns a
    DataFrame ``(rank INT, a STRING, b STRING)`` of the learned merge
    rules in order, launching ZERO Spark jobs at construction (the
    ``connected_components_bounded`` precedent).

    :func:`train_bpe` is the scale path: its per-merge global argmax
    is a bounded one-row collect per iteration — correct at 100 TB but
    ``num_merges`` driver round-trips at construction time. When the
    corpus is construction-bounded (an oracle anchor, a per-tenant
    vocabulary), the word-type table is small enough that the SAME
    merge loop (:func:`train_merges_py` — one shared implementation,
    equality with the distributed loop pinned in tests/test_bpe.py)
    runs in a single ``applyInPandas`` task executor-side.
    ``max_word_types`` makes the boundedness an enforced contract: the
    task raises loudly instead of grinding on an unbounded corpus."""
    words = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.explode(tokens(text_col)).alias("_w"))
        .filter(F.length("_w") > 0)
        .groupBy("_w")
        .agg(F.count("*").alias("cnt"))
    )

    def train(pdf):
        import pandas as pd

        if len(pdf) > max_word_types:
            raise ValueError(
                f"train_bpe_bounded: {len(pdf)} word types exceeds the "
                f"declared bound {max_word_types} — use the distributed "
                f"train_bpe for unbounded corpora"
            )
        merges = train_merges_py(
            zip(pdf["_w"], pdf["cnt"]), num_merges, min_frequency,
            end_of_word,
        )
        return pd.DataFrame(
            {
                "rank": range(len(merges)),
                "a": [m[0] for m in merges],
                "b": [m[1] for m in merges],
            }
        )

    return (
        words.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(train, "rank INT, a STRING, b STRING")
    )


def bpe_encode_sequential_bounded(
    df: DataFrame,
    merges_df: DataFrame,
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    end_of_word: str | None = None,
) -> DataFrame:
    """Encode with a merge TABLE (not a driver-side list), applying the
    rules SEQUENTIALLY in rank order — Sennrich et al. 2016's original
    encoder, each rule one full left-to-right pass via
    :func:`merge_word`. Fully lazy: the merge rows aggregate to one
    array that broadcast-joins onto the documents, so no collect at
    construction (unlike :func:`bpe_encode`, whose ``merges`` list is
    driver state).

    vs :func:`bpe_encode` (GPT-2's rank-greedy loop): on a merge list
    produced by BPE TRAINING the two orders agree wherever no later
    rule re-creates an earlier rule's constituent symbol string —
    equality on this corpus is pinned in tests/test_bpe.py. Sequential
    semantics is what a SQL oracle can mirror exactly (a chain of
    non-overlapping string replaces in rank order)."""
    from pyspark.sql.functions import pandas_udf

    marker = end_of_word
    marr = merges_df.agg(
        F.collect_list(F.struct("rank", "a", "b")).alias("_m")
    )

    @pandas_udf("array<string>")
    def enc(texts, mlists):
        import pandas as pd

        # the merge array comes from a 1-row broadcast cross join, so
        # it is identical on every row of a batch — build the rules
        # tuple ONCE per batch, not per row (per-row sorted() would be
        # O(rows × merges log merges) for a realistically sized table)
        rules: tuple = ()
        for ml in mlists:
            if ml is not None:
                rules = tuple(
                    (m["a"], m["b"])
                    for m in sorted(ml, key=lambda m: m["rank"])
                )
                break
        cache: dict[str, list[str]] = {}
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            toks: list[str] = []
            for w in _WS_ASCII.split(t):
                if not w:
                    continue
                got = cache.get(w)
                if got is None:
                    syms = list(w)
                    if marker:
                        syms.append(marker)
                    for a, b in rules:
                        syms = merge_word(syms, a, b)
                    got = cache[w] = syms
                toks.extend(got)
            out.append(toks)
        return pd.Series(out)

    return df.crossJoin(F.broadcast(marr)).withColumn(
        out_col, enc(F.col(text_col), F.col("_m"))
    ).drop("_m")
