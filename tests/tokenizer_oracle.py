"""Pure-Python transliteration of the reference tokenizer loop.

This is a line-for-line *behavioral* oracle of ``clip_tokenize``
(/root/reference/clip.cpp:598-679), kept deliberately dumb and C-shaped so it
can be audited against the C++ side by eye:

* the GPT-2-style split regex runs over the raw UTF-8 **bytes** with ASCII
  character classes, exactly like ``std::regex`` under the default "C"
  locale (clip.cpp:609) — libstdc++'s ``[[:alpha:]]``/``[[:digit:]]``/``\\s``
  match only ASCII there, and bytes >= 0x80 fall into the negated
  ``[^\\s[:alpha:][:digit:]]`` class byte-by-byte;
* the vocab map assigns ``token_to_id[token] = id`` in id order, so duplicate
  token strings resolve to the LAST id (std::map operator[], clip.cpp:482);
* whole-word fast path strips ONE leading space and appends ``</w>``
  (clip.cpp:640-653); fallback is greedy longest-substring over the raw word
  bytes, leading space kept, unknown single bytes skipped (clip.cpp:657-668);
* BOS 49406 / EOS 49407 are hardcoded (clip.cpp:637,671); NO truncation.

The ``special_tokens`` subpattern branch (clip.cpp:611-625) is dead code in
the reference — nothing ever populates ``vocab.special_tokens`` (the
``add_special_token`` declaration at clip.cpp:157 is commented out) — so the
oracle omits it.
"""

from __future__ import annotations

import re
from typing import Sequence

# clip.cpp:609, as a bytes pattern: \s in a Python bytes regex is exactly the
# "C"-locale [:space:] set ( \t\n\v\f\r), and the alpha/digit classes are
# spelled out as ASCII ranges.
_ORACLE_SPLIT = re.compile(
    rb"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+"
)

BOS, EOS = 49406, 49407


def oracle_tokenize(text: str, vocab: Sequence[str]) -> list[int]:
    token_to_id: dict[bytes, int] = {}
    for i, tok in enumerate(vocab):          # clip.cpp:479-483
        token_to_id[tok.encode("utf-8")] = i

    words = _ORACLE_SPLIT.findall(text.encode("utf-8"))  # clip.cpp:627-634

    v_tokens = [BOS]                          # clip.cpp:637
    for word in words:
        # whole-word fast path                clip.cpp:640-653
        full_word = word[1:] if word.startswith(b" ") else word
        wid = token_to_id.get(full_word + b"</w>")
        if wid is not None:
            v_tokens.append(wid)
            continue
        # greedy longest-substring fallback   clip.cpp:655-668
        i = 0
        while i < len(word):
            j = len(word) - 1
            while j >= i:
                tid = token_to_id.get(word[i : j + 1])
                if tid is not None:
                    v_tokens.append(tid)
                    i = j + 1
                    break
                if j == i:  # single byte unknown: warn + skip in the C++
                    i += 1
                    break
                j -= 1
    v_tokens.append(EOS)                      # clip.cpp:671
    return v_tokens
