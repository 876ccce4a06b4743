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


def test_bpe_fertility_hand_truth(spark):
    """With zero learnable merges beyond the dominant ones, fertility
    is exact: every word contributes len(word)+1 tokens before merges;
    after 2 merges of a 2-word corpus the counts follow the merge
    table."""
    from avro_sql_spark.operators.bpe import bpe_fertility, train_bpe

    df = spark.createDataFrame(
        [(1, "aa aa ab", "s1"), (2, "aa ab ab", "s2")],
        "doc_id long, text string, source string",
    )
    merges = [
        (r["left"], r["right"], r["n"]) for r in train_bpe(df, n_merges=2).collect()
    ]
    # hand trace: all round-1 pairs tie at n=3; (a,</w>) wins the
    # (left, right) tie-break ('<' < 'a'), then (a, a</w>) wins round 2
    assert merges == [("a", "</w>", 3), ("a", "a</w>", 3)]
    # final toks: "aa" -> [aa</w>] (1 token), "ab" -> [a, b, </w>] (3)
    out = {r["source"]: r for r in bpe_fertility(df, n_merges=2).collect()}
    # s1 = {aa x2, ab x1}: 2*1 + 1*3 = 5 tokens over 3 words, 6 chars
    assert (out["s1"]["n_words"], out["s1"]["n_tokens"]) == (3, 5)
    assert out["s1"]["fertility"] == round(5 / 3, 6)
    assert out["s1"]["chars_per_token"] == round(6 / 5, 6)
    # s2 = {aa x1, ab x2}: 1 + 6 = 7 tokens over 3 words, 6 chars
    assert (out["s2"]["n_words"], out["s2"]["n_tokens"]) == (3, 7)
    assert out["s2"]["fertility"] == round(7 / 3, 6)
    assert out["s2"]["chars_per_token"] == round(6 / 7, 6)
