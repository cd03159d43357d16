"""BPE vocabulary-training tests: golden merges on hand-built corpora,
exact parity with a pure-Python reference trainer (the Sennrich
algorithm re-implemented from the paper's description), determinism
across partitionings, and segmentation accounting."""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from gcp_food_delivery_data_pipeline_spark.operators.bpe import (
    EOW,
    apply_merge,
    bpe_segment,
    bpe_train,
    pair_counts,
    word_symbol_table,
)

# ---------------------------------------------------------------------------
# pure-Python reference model
# ---------------------------------------------------------------------------


def merge_seq(s: list[str], a: str, b: str) -> list[str]:
    out: list[str] = []
    for x in s:
        if out and out[-1] == a and x == b:
            out[-1] = a + b
        else:
            out.append(x)
    return out


def model_bpe(
    word_counts: dict[str, int], n_merges: int, min_count: int = 2
) -> list[tuple[str, str]]:
    syms = {w: list(w) + [EOW] for w in word_counts}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: Counter = Counter()
        for w, n in word_counts.items():
            s = syms[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += n
        if not counts:
            break
        best, cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if cnt < min_count:
            break
        merges.append(best)
        syms = {w: merge_seq(s, *best) for w, s in syms.items()}
    return merges


# ---------------------------------------------------------------------------
# building blocks
# ---------------------------------------------------------------------------


def test_word_symbol_table_counts_and_chars(spark):
    df = spark.createDataFrame(
        [(0, "low low lower"), (1, "low")], ["doc_id", "text"]
    )
    rows = {r.word: (r.n, r.syms) for r in word_symbol_table(df).collect()}
    assert rows["low"] == (3, ["l", "o", "w", EOW])
    assert rows["lower"] == (1, ["l", "o", "w", "e", "r", EOW])


def test_pair_counts_weighted_by_word_frequency(spark):
    df = spark.createDataFrame([(0, "ab ab ab cd")], ["doc_id", "text"])
    wt = word_symbol_table(df)
    got = {(r.left, r.right): r.cnt for r in pair_counts(wt).collect()}
    assert got[("a", "b")] == 3
    assert got[("b", EOW)] == 3
    assert got[("c", "d")] == 1


def test_apply_merge_golden_cases(spark):
    df = spark.createDataFrame(
        [
            (0, ["a", "b", "c"]),
            (1, ["a", "b", "a", "b"]),
            (2, ["a", "a", "a", "a"]),  # fused absorbs the NEXT raw 'a'
            (3, ["x"]),
            (4, []),
        ],
        ["i", "s"],
    )
    got = {
        r.i: r.m
        for r in df.select(
            "i", apply_merge("s", "a", "b").alias("m")
        ).collect()
    }
    assert got[0] == ["ab", "c"]
    assert got[1] == ["ab", "ab"]
    assert got[2] == ["a", "a", "a", "a"]  # pair (a,b) absent
    assert got[3] == ["x"]
    assert got[4] == []


def test_apply_merge_aa_chain(spark):
    df = spark.createDataFrame([(0, ["a", "a", "a", "a"])], ["i", "s"])
    got = df.select(apply_merge("s", "a", "a").alias("m")).collect()[0].m
    # left-to-right: [aa] + a -> merge? last == 'aa' != 'a' -> append;
    # then 'a','a' at the tail merges -> [aa, aa]
    assert got == ["aa", "aa"]


# ---------------------------------------------------------------------------
# trainer
# ---------------------------------------------------------------------------


def test_bpe_train_golden_sennrich_example(spark):
    """The classic low/lower/newest/widest-style corpus: frequent
    'es'/'est' family must merge before rarer pairs."""
    corpus = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    df = spark.createDataFrame([(0, corpus)], ["doc_id", "text"])
    got = bpe_train(df, n_merges=4)
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    assert got == model_bpe(wc, 4)
    # first merges concern the 9-frequency (e, s) family
    assert got[0] == ("e", "s")
    assert got[1] == ("es", "t")


def test_bpe_train_matches_model_on_real_docs(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(50)
    got = bpe_train(docs, n_merges=8)
    wc = Counter(
        w
        for r in docs.select("text").collect()
        for w in r.text.split()
        if w
    )
    assert got == model_bpe(dict(wc), 8)


def test_bpe_train_min_count_stops_early(spark):
    df = spark.createDataFrame([(0, "ab cd")], ["doc_id", "text"])
    # every pair occurs once -> min_count=2 learns nothing
    assert bpe_train(df, n_merges=5, min_count=2) == []
    # min_count=1 exhausts all pairs after 4 merges (each word is then
    # one fused symbol) and stops on the empty pair table
    assert bpe_train(df, n_merges=5, min_count=1) == [
        ("a", "b"),
        ("ab", EOW),
        ("c", "d"),
        ("cd", EOW),
    ]


def test_bpe_train_deterministic_across_partitionings(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = bpe_train(docs, n_merges=5)
    b = bpe_train(docs.repartition(13), n_merges=5)
    assert a == b


@settings(max_examples=6, deadline=None)
@given(
    words=st.lists(
        st.text(alphabet="abcx", min_size=1, max_size=5),
        min_size=1,
        max_size=10,
    )
)
def test_bpe_train_matches_model_property(spark_global, words):
    df = spark_global.createDataFrame(
        [(0, " ".join(words))], ["doc_id", "text"]
    )
    assert bpe_train(df, n_merges=5) == model_bpe(
        dict(Counter(words)), 5
    )


# ---------------------------------------------------------------------------
# segmentation
# ---------------------------------------------------------------------------


def test_bpe_segment_accounting(spark):
    df = spark.createDataFrame([(0, "low low"), (1, "")], ["doc_id", "text"])
    merges = [("l", "o"), ("lo", "w")]
    got = {
        r.doc_id: (r.n_tokens, r.n_subwords)
        for r in bpe_segment(df, merges).collect()
    }
    # 'low' -> [l,o,w,</w>] -> [lo,w,</w>] -> [low,</w>] = 2 subwords
    assert got[0] == (2, 4)
    assert got[1] == (0, 0)


def test_bpe_segment_no_merges_counts_chars(spark):
    df = spark.createDataFrame([(0, "ab c")], ["doc_id", "text"])
    got = bpe_segment(df, []).collect()[0]
    # 'ab' -> 3 symbols (a, b, </w>); 'c' -> 2
    assert (got.n_tokens, got.n_subwords) == (2, 5)


def test_bpe_end_to_end_compression_improves_with_merges(spark):
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).limit(80)
    merges = bpe_train(docs, n_merges=8)
    assert len(merges) == 8
    base = (
        bpe_segment(docs, [])
        .agg(F.sum("n_subwords").alias("s"))
        .collect()[0]
        .s
    )
    merged = (
        bpe_segment(docs, merges)
        .agg(F.sum("n_subwords").alias("s"))
        .collect()[0]
        .s
    )
    assert merged < base  # every applied merge strictly shrinks totals
