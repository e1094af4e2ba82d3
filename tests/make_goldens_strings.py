"""The tokenizer quirk battery shared by scripts/make_goldens.py (generation)
and tests/test_goldens.py (verification).  Changing a string here requires
regenerating tests/fixtures/goldens.npz (an intentional re-baseline)."""

QUIRK_STRINGS = [
    # whole-word hits in the synthetic vocab (seeded words, tokenizer.py)
    "a photo of an apple",
    "the red cat",
    "A  PHOTO   OF\tTHE DOG",        # no case folding (reference parity)
    "apple.",                         # punctuation splits
    "applephoto",                     # no whole-word hit -> byte-greedy
    "café ☃",               # multi-byte UTF-8, unknown bytes skipped
    "",                               # empty -> BOS/EOS only
    "w0 s1 w2",                       # literal synthetic tokens
    "a" * 300,                        # long word, truncation interplay
    " ".join(["apple"] * 100),        # >77 tokens -> truncation
]
