"""Tokenizer parity tests against hand-derived goldens for the clip.cpp
algorithm (regex split -> whole-word </w> lookup -> greedy longest substring).
"""

import pytest

from clip_tpu.tokenizer import BOS_TOKEN_ID, EOS_TOKEN_ID, ClipTokenizer, _SPLIT_RE


def make_tok(extra=()):
    # ids are list positions; reserve real BOS/EOS ids by padding the list
    toks = list(extra)
    t = ClipTokenizer(toks, bos_id=100, eos_id=101)
    return t


def test_regex_split_matches_gpt2_style():
    assert _SPLIT_RE.findall("hello world") == ["hello", " world"]
    assert _SPLIT_RE.findall("it's 42 red-apples!") == [
        "it", "'s", " 42", " red", "-", "apples", "!",
    ]
    # trailing whitespace is its own match
    assert _SPLIT_RE.findall("a  b ") == ["a", " ", " b", " "]


def test_whole_word_fast_path():
    t = make_tok(["an</w>", "apple</w>"])
    assert t.encode("an apple") == [100, 0, 1, 101]


def test_greedy_fallback_longest_first():
    # no "apples</w>" -> falls back to greedy over " apples" (with space)
    t = make_tok(["an</w>", " apple", "s", " ", "apple"])
    ids = t.encode("an apples")
    # " apples" -> " apple" (longest prefix) + "s"
    assert ids == [100, 0, 1, 2, 101]


def test_greedy_without_leading_space_token():
    # vocab lacks " apple": space byte is unknown -> skipped, then "apple"
    t = make_tok(["an</w>", "apple", "s"])
    assert t.encode("an apples") == [100, 0, 1, 2, 101]


def test_unknown_bytes_skipped():
    t = make_tok(["a"])
    assert t.encode("aéa") == [100, 0, 0, 101]  # é (2 UTF-8 bytes) dropped


def test_no_lowercasing():
    # the reference does not lowercase; "Apple" != "apple"
    t = make_tok(["apple</w>", "pple", "A"])
    assert t.encode("Apple") == [100, 2, 1, 101]


def test_truncation_keeps_eos():
    t = make_tok(["a</w>"])
    ids = t.encode("a " * 100, max_len=10)
    assert len(ids) == 10
    assert ids[0] == 100 and ids[-1] == 101


def test_no_truncation_mode():
    t = make_tok(["a</w>"])
    ids = t.encode("a " * 100, max_len=None)
    assert len(ids) == 102


def test_pad():
    t = make_tok(["a</w>"])
    padded, n = t.pad([100, 0, 101], 8)
    assert n == 3
    assert padded == [100, 0, 101, 101, 101, 101, 101, 101]
    with pytest.raises(ValueError):
        t.pad(list(range(9)), 8)


def test_default_special_ids():
    t = ClipTokenizer(["x</w>"])
    assert t.encode("x") == [BOS_TOKEN_ID, 0, EOS_TOKEN_ID]


def test_fuzz_invariants():
    """Property fuzz: for arbitrary (incl. garbage) input the tokenizer must
    return in-range ids, start with BOS, end with EOS, and respect max_len."""
    import numpy as np

    from clip_tpu.tokenizer import ClipTokenizer

    vocab = ["<start>", "<end>", "a", "b", "ab</w>", "a</w>", "b</w>", "c</w>",
             " ", "!", "!</w>", "xyz</w>", "x", "y", "z</w>"]
    tok = ClipTokenizer(vocab, bos_id=0, eos_id=1)
    rng = np.random.default_rng(7)
    alphabet = list("abcxyz !?\t\né中") + ["\U0001F600"]
    for _ in range(300):
        n = int(rng.integers(0, 40))
        s = "".join(rng.choice(alphabet) for _ in range(n))
        ids = tok.encode(s, max_len=16)
        assert ids[0] == 0 and ids[-1] == 1, (s, ids)
        assert len(ids) <= 16, (s, ids)
        assert all(0 <= i < len(vocab) for i in ids), (s, ids)
        # determinism
        assert ids == tok.encode(s, max_len=16)
