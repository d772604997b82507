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
