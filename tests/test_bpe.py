"""Golden tests for operators/bpe.py against hand-computed merges on
the classic Sennrich low/lower/newest/widest corpus."""

import pytest

from avro_sql_spark.operators.bpe import (
    pair_counts,
    train_bpe,
    word_freq_tokens,
)


@pytest.fixture(scope="module")
def corpus(spark):
    text = " ".join(["low"] * 3 + ["lower"] * 2 + ["newest"] * 5 + ["widest"] * 3)
    return spark.createDataFrame([(text,)], ["text"])


def test_word_freq_tokens(corpus):
    rows = {r["word"]: (r["freq"], r["toks"]) for r in word_freq_tokens(corpus).collect()}
    assert rows["low"] == (3, ["l", "o", "w", "</w>"])
    assert rows["newest"][0] == 5
    assert rows["newest"][1][-1] == "</w>"


def test_pair_counts_round1(corpus):
    pc = {(r["left"], r["right"]): r["n"] for r in pair_counts(word_freq_tokens(corpus)).collect()}
    # hand-computed: es/st/t</w> all 8; we = 2(lower) + 5(newest) = 7
    assert pc[("e", "s")] == 8 and pc[("s", "t")] == 8 and pc[("t", "</w>")] == 8
    assert pc[("w", "e")] == 7
    assert pc[("l", "o")] == 5 and pc[("o", "w")] == 5


def test_train_bpe_golden_sequence(corpus):
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["n"])
        for r in train_bpe(corpus, n_merges=4).orderBy("rank").collect()
    ]
    # ties at 8 break (count desc, left, right): e<s<t lexicographically
    assert got == [
        (0, "e", "s", "es", 8),
        (1, "es", "t", "est", 8),
        (2, "est", "</w>", "est</w>", 8),
        (3, "e", "w", "ew", 5),
    ]


def test_apply_merge_greedy_leftmost(spark):
    # aaa -> [aa, a]; aaaa -> [aa, aa] — the classic greedy edge cases
    from avro_sql_spark.operators.bpe import _apply_merge

    df = spark.createDataFrame(
        [("x", 1, ["a", "a", "a"]), ("y", 1, ["a", "a", "a", "a"])],
        ["word", "freq", "toks"],
    )
    got = {r["word"]: r["toks"] for r in _apply_merge(df, "a", "a").collect()}
    assert got == {"x": ["aa", "a"], "y": ["aa", "aa"]}
