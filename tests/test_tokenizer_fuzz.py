"""Adversarial tokenizer parity at real-vocab scale (round-5 VERDICT item 4).

``ClipTokenizer.encode`` is property-tested against ``tokenizer_oracle`` — a
dumb byte-level transliteration of the C++ loop — on 10k fuzzed strings over
a synthetic 49,408-entry vocabulary with the real OpenAI-CLIP BPE structure:
256 byte-level singles, the same 256 with ``</w>``, ~49k merged words
(with and without ``</w>``, heavy shared prefixes to exercise greedy ties,
multi-byte UTF-8 entries), duplicate strings (last id must win), and the
BOS/EOS specials at 49406/49407.
"""

import random
import string

import pytest

from tokenizer_oracle import oracle_tokenize
from clip_tpu.tokenizer import ClipTokenizer

N_VOCAB = 49408


def _build_vocab(rng: random.Random) -> list[str]:
    vocab: list[str] = []
    # 0-255: byte-level singles (real CLIP uses the GPT-2 bytes-to-unicode
    # table; raw latin-1 chars give the same *structural* coverage, including
    # multi-byte UTF-8 encodings for 0x80-0xFF)
    singles = [chr(b) for b in range(256)]
    vocab.extend(singles)
    # 256-511: the same with </w>
    vocab.extend(s + "</w>" for s in singles)

    # merged words: heavy shared-prefix families so the greedy fallback has
    # real longest-vs-shorter ties to resolve
    stems = ["".join(rng.choices(string.ascii_lowercase, k=rng.randint(2, 7)))
             for _ in range(400)]
    pool: list[str] = []
    for stem in stems:
        pool.append(stem)
        pool.append(stem + "</w>")
        for _ in range(rng.randint(10, 40)):
            ext = stem + "".join(rng.choices(string.ascii_lowercase, k=rng.randint(1, 6)))
            pool.append(ext if rng.random() < 0.5 else ext + "</w>")
    # leading-space merged entries (the fallback keeps the space; entries like
    # " the" are reachable only through the greedy loop)
    pool.extend(" " + s for s in stems[:100])
    # digits, punctuation clusters, apostrophe suffixes
    pool.extend(str(rng.randint(0, 99999)) + ("</w>" if rng.random() < 0.5 else "")
                for _ in range(500))
    pool.extend(p for p in ["'s</w>", "'t</w>", "'re</w>", "'ve</w>", "'m</w>",
                            "'ll</w>", "'d</w>", "...", "--", "!!</w>", "?!"])
    # multi-byte UTF-8 words (2- and 3-byte chars) with and without </w>
    utf8_chars = "éüßñøåπλж中日本語한글"
    for _ in range(300):
        w = "".join(rng.choices(utf8_chars, k=rng.randint(1, 4)))
        pool.append(w if rng.random() < 0.5 else w + "</w>")

    rng.shuffle(pool)
    vocab.extend(pool)
    # duplicates: re-insert existing entries at higher ids; the LAST id wins
    # (std::map operator[] — clip.cpp:482)
    while len(vocab) < N_VOCAB - 2:
        if rng.random() < 0.02:
            vocab.append(vocab[rng.randrange(512, len(vocab))])
        else:
            vocab.append("".join(rng.choices(string.ascii_lowercase, k=rng.randint(2, 10)))
                         + ("</w>" if rng.random() < 0.5 else ""))
    vocab = vocab[: N_VOCAB - 2]
    vocab.append("<|startoftext|>")
    vocab.append("<|endoftext|>")
    assert len(vocab) == N_VOCAB
    return vocab


def _fuzz_strings(rng: random.Random, n: int) -> list[str]:
    words = (
        list(string.ascii_lowercase) +
        ["hello", "world", "apple", "trees", "it's", "don't", "we're", "I'll",
         "1923", "3.14", "x86_64", "...", "??!", "--", "été", "naïve",
         "日本語テキスト", "διακριτικά", "русский", "emoji🙂mix", "🙂", "½", "Ω"]
    )
    ws = [" ", "  ", "\t", "\n", " \n ", " "]  # incl. non-ASCII NBSP
    out = []
    for _ in range(n):
        k = rng.randint(0, 12)
        parts = []
        for _ in range(k):
            parts.append(rng.choice(words) if rng.random() < 0.8 else rng.choice(ws))
        s = rng.choice(["", " "]).join(parts)
        # occasionally: leading/trailing whitespace, very long words, raw bytes
        r = rng.random()
        if r < 0.05:
            s = " " * rng.randint(1, 3) + s + "\n" * rng.randint(0, 2)
        elif r < 0.10:
            s += "".join(rng.choices(string.ascii_lowercase, k=rng.randint(30, 120)))
        elif r < 0.13:
            s += "".join(chr(rng.randint(0x80, 0x2FFF)) for _ in range(rng.randint(1, 8)))
        out.append(s)
    # deterministic edge cases
    out.extend([
        "", " ", "  ", "\n", "a", " a", "a ", "'s", "x's", "'", "''",
        "a" * 500,                      # forces a long greedy walk
        "Hello, World!", "HELLO WORLD", "MiXeD CaSe 123abc",
        "word" * 60,                    # >77 tokens before truncation
        "日本", "é", " é", "é ", " x", "🙂🙂🙂",
        "tab\tsep", "new\nline", "many   spaces   here",
    ])
    return out


@pytest.fixture(scope="module")
def fuzz_setup():
    rng = random.Random(0x5EED)
    vocab = _build_vocab(rng)
    tok = ClipTokenizer(vocab)
    return rng, vocab, tok


def test_fuzz_10k_matches_oracle(fuzz_setup):
    rng, vocab, tok = fuzz_setup
    strings = _fuzz_strings(random.Random(0xF00D), 10_000)
    for s in strings:
        got = tok.encode(s, max_len=None)
        want = oracle_tokenize(s, vocab)
        assert got == want, f"divergence on {s!r}: {got} != {want}"


def test_duplicate_vocab_entries_last_id_wins():
    vocab = [chr(b) for b in range(256)]
    base = len(vocab)
    vocab += ["cat</w>", "dog</w>", "cat</w>"]  # dup: ids base+0 and base+2
    tok = ClipTokenizer(vocab)
    ids = tok.encode("cat", max_len=None)
    assert ids == [49406, base + 2, 49407]
    assert ids == oracle_tokenize("cat", vocab)


def test_truncation_is_the_only_documented_delta(fuzz_setup):
    """With max_len, our output must be the oracle's first max_len-1 ids plus
    EOS — truncation is a *documented improvement* over the reference (which
    overflows the 77 positions, /root/reference/tests/README.md:16), not a
    behavioral drift."""
    _, vocab, tok = fuzz_setup
    s = "word " * 100
    full = oracle_tokenize(s, vocab)
    assert len(full) > 77
    got = tok.encode(s, max_len=77)
    assert len(got) == 77
    assert got[:76] == full[:76]
    assert got[-1] == 49407


def test_greedy_prefix_tie_resolution():
    """Longest substring wins from each start position, NOT a BPE merge."""
    vocab = [chr(b) for b in range(256)]
    b = len(vocab)
    vocab += ["ab", "abc", "abcd", "e</w>"]  # 'abcde' -> 'abcd' + 'e'
    tok = ClipTokenizer(vocab)
    ids = tok.encode("abcde", max_len=None)
    assert ids == oracle_tokenize("abcde", vocab)
    assert ids == [49406, b + 2, ord("e"), 49407]  # abcd, then single-byte e


def test_unknown_bytes_skipped_like_reference():
    # vocab with NO byte singles: unmatched bytes vanish (clip.cpp:663-666)
    vocab = ["hi</w>", "yo</w>"]
    tok = ClipTokenizer(vocab)
    assert tok.encode("hi \x01\x02 yo", max_len=None) == \
        oracle_tokenize("hi \x01\x02 yo", vocab) == [49406, 0, 1, 49407]
