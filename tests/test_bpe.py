"""Distributed BPE training vs a sequential reference implementation.

operators/bpe.py trains subword merges with one corpus scan + per-merge
pair-count aggregations; these tests pin exact equality with the
textbook sequential algorithm (Sennrich et al. 2016) on multiple
corpora, determinism under repartitioning, the tie-break rule, the
stopping rule, and that encode(trained merges) reproduces the training
run's final symbol sequences.
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from real_time_video_streaming_analytics_lakehouse_spark.operators.bpe import (
    apply_merge,
    bpe_encode,
    bpe_encode_sequential_bounded,
    train_bpe,
    train_bpe_bounded,
)
from real_time_video_streaming_analytics_lakehouse_spark.operators.text import (
    chunk_documents,
)


# -- sequential reference (the classic algorithm, verbatim) ----------------


def _ref_merge(syms, a, b):
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
    return out


def ref_train_bpe(texts, num_merges, min_frequency=2, end_of_word=None):
    words = Counter()
    for t in texts:
        if t is None:
            continue
        for w in t.split():
            if w:
                words[w] += 1
    table = {
        w: tuple(list(w) + ([end_of_word] if end_of_word else []))
        for w in words
    }
    merges = []
    for _ in range(num_merges):
        pair_counts = Counter()
        for w, syms in table.items():
            for p in zip(syms, syms[1:]):
                pair_counts[p] += words[w]
        if not pair_counts:
            break
        # max count, ties -> lexicographically smallest (a, b)
        best = min(pair_counts, key=lambda p: (-pair_counts[p], p))
        if pair_counts[best] < min_frequency:
            break
        merges.append(best)
        a, b = best
        table = {w: tuple(_ref_merge(s, a, b)) for w, s in table.items()}
    return merges, table


CORPUS_A = [
    "low low low low low",
    "lower lower newest newest newest newest newest newest",
    "widest widest widest",
]
CORPUS_B = [
    "the cat sat on the mat",
    "the cat ate the rat",
    "a cat and a rat and a mat",
    None,
    "",
]


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


@pytest.mark.parametrize("texts", [CORPUS_A, CORPUS_B], ids=["sennrich", "cat"])
def test_train_matches_sequential_reference(spark, texts):
    expected, _ = ref_train_bpe(texts, num_merges=20)
    got = train_bpe(_df(spark, texts), num_merges=20)
    assert got == expected
    assert len(got) > 3  # the corpus genuinely trains several merges


def test_train_matches_reference_with_end_of_word(spark):
    expected, _ = ref_train_bpe(CORPUS_A, num_merges=15, end_of_word="</w>")
    got = train_bpe(_df(spark, CORPUS_A), num_merges=15, end_of_word="</w>")
    assert got == expected
    assert any("</w>" in a + b for a, b in got)  # suffix merges learned


def test_train_partitioning_invariant(spark):
    df = _df(spark, CORPUS_B)
    one = train_bpe(df.coalesce(1), num_merges=12)
    many = train_bpe(df.repartition(7), num_merges=12)
    assert one == many


def test_tiebreak_is_lexicographic(spark):
    # every adjacent pair in "ab" / "cd" ties at count 3 -> the first
    # learned merge must be the lexicographically smallest pair (a, b)
    texts = ["ab cd", "ab cd", "ab cd"]
    got = train_bpe(_df(spark, texts), num_merges=1)
    assert got == [("a", "b")]


def test_min_frequency_stops_training(spark):
    # all words distinct singletons -> every pair count is 1 < 2
    texts = ["abc def ghi"]
    assert train_bpe(_df(spark, texts), num_merges=10) == []
    # min_frequency=1 lets it learn from singletons
    got = train_bpe(_df(spark, texts), num_merges=2, min_frequency=1)
    expected, _ = ref_train_bpe(texts, num_merges=2, min_frequency=1)
    assert got == expected


def test_apply_merge_nonoverlapping_left_to_right(spark):
    df = spark.createDataFrame(
        [(["a", "a", "a"],), (["a", "b", "a", "b"],), (["x"],), ([],)],
        "syms array<string>",
    )
    got = [
        r["m"]
        for r in df.select(
            apply_merge(F.col("syms"), "a", "a").alias("m")
        ).collect()
    ]
    assert got[0] == ["aa", "a"]
    assert got[1] == ["a", "b", "a", "b"]
    assert got[2] == ["x"]
    assert got[3] == []


def test_encode_reproduces_training_symbols(spark):
    merges, table = ref_train_bpe(CORPUS_A, num_merges=20)
    df = _df(spark, CORPUS_A)
    enc = bpe_encode(df, merges).collect()
    for r in enc:
        expected = []
        for w in r["text"].split():
            expected.extend(table[w])
        assert r["bpe_tokens"] == expected


def test_encode_null_text_and_unknown_words(spark):
    merges, _ = ref_train_bpe(CORPUS_A, num_merges=10)
    df = _df(spark, ["zzz qqq", None])
    rows = {r["doc_id"]: r["bpe_tokens"] for r in bpe_encode(df, merges).collect()}
    assert rows[0] == ["z", "z", "z", "q", "q", "q"]  # falls back to chars
    assert rows[1] is None


def test_chunking_accepts_bpe_tokens(spark):
    merges, table = ref_train_bpe(CORPUS_A, num_merges=20)
    df = bpe_encode(_df(spark, CORPUS_A), merges)
    chunks = chunk_documents(
        df, window=4, stride=2, tokens_col="bpe_tokens"
    ).collect()
    n_tokens = {
        r["doc_id"]: len(r["bpe_tokens"]) for r in df.collect()
    }
    by_doc: dict = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r["chunk_idx"])
        # stride-2 windows of the BPE token stream, exact cover
        assert rs[0]["chunk_tokens"] == min(4, n_tokens[doc_id])
        total = n_tokens[doc_id]
        last = rs[-1]
        assert last["chunk_idx"] * 2 + last["chunk_tokens"] == total


def test_encode_unicode_whitespace_matches_training_tokenizer(spark):
    """Java's '\\s+' (train side) does NOT split on unicode whitespace
    like U+00A0; encode must agree or it applies merges to word
    boundaries the vocabulary never saw."""
    text = "low\xa0low"  # NBSP: ONE training word under Java \s+
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    merges = train_bpe(df, num_merges=5, min_frequency=1)
    enc = bpe_encode(df, merges).collect()[0]["bpe_tokens"]
    # training saw the NBSP-joined string as ONE word; encode must
    # reproduce the trained symbol sequence EXACTLY (for a single-word
    # corpus, rank-greedy encode == applying merges in learned order)
    expected = list(text)
    for a, b in merges:
        expected = _ref_merge(expected, a, b)
    assert enc == expected
    assert any("\xa0" in tok for tok in enc)  # a merge crossed the NBSP
    # the two-word (ASCII space) variant encodes differently
    df2 = spark.createDataFrame([(0, "low low")], "doc_id long, text string")
    enc2 = bpe_encode(df2, merges).collect()[0]["bpe_tokens"]
    assert enc != enc2
def test_apply_merge_random_fuzz_one_job(spark):
    """300 random symbol arrays vs the sequential reference, in ONE
    Spark job (overlap chains like a,a,a under rule (a,a) included)."""
    import random

    rng = random.Random(11)
    cases = [
        [rng.choice("ab") for _ in range(rng.randint(0, 8))]
        for _ in range(300)
    ]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "i long, syms array<string>"
    )
    for rule in (("a", "b"), ("a", "a"), ("b", "a")):
        got = {
            r["i"]: r["m"]
            for r in df.select(
                "i", apply_merge(F.col("syms"), *rule).alias("m")
            ).collect()
        }
        for i, c in enumerate(cases):
            assert got[i] == _ref_merge(c, *rule), (i, c, rule)


# -- bounded-lazy paths (round 14, VERDICT r13 #2) --------------------------


def test_train_bpe_bounded_matches_distributed(spark):
    """train_bpe_bounded (one lazy executor task over the word-type
    table, shared train_merges_py loop) must learn exactly the merge
    sequence the distributed train_bpe learns — and both match the
    sequential reference."""
    texts = [
        "low lower lowest", "new newer newest", "low low new",
        "wide wider widest", None, "low newer",
    ]
    df = _df(spark, texts)
    want, _ = ref_train_bpe(texts, num_merges=12)
    assert train_bpe(df, num_merges=12) == want
    got = train_bpe_bounded(df, num_merges=12).collect()
    assert [(r["a"], r["b"]) for r in sorted(got, key=lambda r: r["rank"])] \
        == want
    assert [r["rank"] for r in sorted(got, key=lambda r: r["rank"])] \
        == list(range(len(want)))


def test_train_bpe_bounded_zero_construction_jobs(spark):
    """The bounded trainer is LAZY: constructing the merge DataFrame
    (and the sequential encode over it) launches no Spark jobs — the
    connected_components_bounded contract."""
    sc = spark.sparkContext
    sc.setJobGroup("bpe-construct-probe", "construction-only probe")
    try:
        df = _df(spark, ["low lower", "low low"])
        merges = train_bpe_bounded(df, num_merges=4)
        bpe_encode_sequential_bounded(df, merges)
    finally:
        sc.setJobGroup("", "")
    jobs = sc.statusTracker().getJobIdsForGroup("bpe-construct-probe")
    assert len(jobs) == 0, f"construction launched {len(jobs)} jobs"


def test_train_bpe_bounded_enforces_word_type_bound(spark):
    df = _df(spark, ["a b c d e f g h"])
    with pytest.raises(Exception, match="word types exceeds"):
        train_bpe_bounded(df, num_merges=2, max_word_types=3).collect()


def test_sequential_encode_matches_rank_greedy_on_corpus(spark):
    """The oracle arm encodes SEQUENTIALLY in rank order (Sennrich's
    original); bpe_encode is GPT-2's rank-greedy loop. On a trained
    merge list the two agree unless a later rule re-creates an earlier
    rule's constituent string — pin the equality on the actual
    mini-corpus the catalog arm uses, plus a synthetic corpus."""
    from real_time_video_streaming_analytics_lakehouse_spark.plans.llm_ops import (
        _BPE_MINI_MOD,
        _BPE_NUM_MERGES,
    )
    from real_time_video_streaming_analytics_lakehouse_spark.sources.readers import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    mini = docs.filter(
        (F.col("doc_id") % _BPE_MINI_MOD == 0) & F.col("text").isNotNull()
    ).select("doc_id", "text")
    for df, n in ((mini, _BPE_NUM_MERGES),
                  (_df(spark, ["low lower lowest", "low low newer"]), 6)):
        merges = train_bpe(df, num_merges=n)
        greedy = {
            r["doc_id"]: r["bpe_tokens"]
            for r in bpe_encode(df, merges).collect()
        }
        merges_df = train_bpe_bounded(df, num_merges=n)
        seq = {
            r["doc_id"]: r["bpe_tokens"]
            for r in bpe_encode_sequential_bounded(df, merges_df).collect()
        }
        assert greedy and greedy == seq


def test_doc_token_stats_distributed_trainer_matches_bounded(spark):
    """Round 15 (VERDICT r14 #5): the catalog arm can select the
    DISTRIBUTED trainer (train_bpe — the 100 TB path) instead of the
    bounded single-task one; both must produce row-identical results
    (shared train_merges_py loop), so flipping the flag lets the
    driver gate witness the distributed path end-to-end."""
    import pytest

    from real_time_video_streaming_analytics_lakehouse_spark.plans.llm_ops import (
        doc_token_stats,
    )

    sf = "/root/testdata/sf0.001"
    key = lambda r: tuple(str(x) for x in r)
    bounded = sorted(map(key, doc_token_stats(spark, sf).collect()))
    dist = sorted(
        map(key, doc_token_stats(spark, sf, trainer="distributed").collect())
    )
    assert bounded == dist
    with pytest.raises(ValueError, match="unknown BPE trainer"):
        doc_token_stats(spark, sf, trainer="bogus")
