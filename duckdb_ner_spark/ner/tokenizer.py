"""Whitespace + greedy-longest-match WordPiece tokenizer.

Behavioral port of ``ner_tokenize`` (/root/reference/src/ner_model.cpp:100-160).
Deliberately NOT a stock HuggingFace tokenizer — the reference's edge behavior
differs and is what its tests pin (SURVEY.md §7.4 #2):

- split on ASCII whitespace only; no lowercasing, no punctuation splitting
  (``Duck,DB`` is one word, :109-122);
- per word: greedy longest-prefix match against the FULL-WORD map for the
  first piece, then the SUBWORD map for every later piece (:135-151);
- matching runs over the word's UTF-8 BYTES, exactly like the reference's
  ``std::string`` arithmetic: an unmatched leading byte is skipped one BYTE
  at a time — no [UNK] token is emitted — and the word switches to the
  subword map (:152-155). Mid-UTF-8-sequence offsets are therefore reachable
  for non-ASCII input, and vocab tokens that coincide with continuation-byte
  sequences can match there, reproducing the reference byte-for-byte;
- output capped at ``n_max_tokens - 1`` before [SEP] is appended; the cap is
  checked before each word and before each piece (:128-138);
- [CLS] always first, [SEP] always last (even when truncated).

Perf: a word's piece stream is position-independent (the map resets to the
full-word map at each word start), so per-word results are memoized on the
vocab — real corpora repeat words heavily, and the cache turns the O(len²)
greedy scan into a dict hit for every repeat. The cache is bounded (cleared
past 2^20 entries) so a pathological corpus can't grow executor memory.
"""

from __future__ import annotations

import re

from .vocab import Vocab

# The reference splits on C isspace(), which is ASCII-only; Python's
# str.split()/isspace() match unicode spaces, so pin the ASCII set explicitly.
_WORD_RE = re.compile(r"[^ \t\n\r\v\f]+")

_WORD_CACHE_MAX = 1 << 20


def split_words(text: str) -> list[str]:
    return _WORD_RE.findall(text)


def _wordpiece_bytes(vocab: Vocab, wb: bytes) -> list[int]:
    """Greedy longest-prefix WordPiece over the word's UTF-8 bytes."""
    out: list[int] = []
    i, n = 0, len(wb)
    token_map = vocab.token_bytes_to_id
    while i < n:
        j = n
        found = False
        while j > i:
            tok_id = token_map.get(wb[i:j])
            if tok_id is not None:
                out.append(tok_id)
                i = j
                token_map = vocab.subword_bytes_to_id
                found = True
                break
            j -= 1
        if not found:
            token_map = vocab.subword_bytes_to_id
            i += 1  # skip one unknown BYTE (ner_model.cpp:152-155) — no [UNK]
    return out


def _tokenize_word(vocab: Vocab, word: str) -> list[int]:
    cache = vocab.word_cache
    ids = cache.get(word)
    if ids is None:
        ids = _wordpiece_bytes(vocab, word.encode("utf-8"))
        if len(cache) >= _WORD_CACHE_MAX:
            cache.clear()
        cache[word] = ids
    return ids


def tokenize(vocab: Vocab, text: str, n_max_tokens: int) -> list[int]:
    """Return token ids: [CLS] + wordpieces + [SEP], reference-truncated."""
    tokens: list[int] = [vocab.cls_id]
    cap = n_max_tokens - 1

    for word in split_words(text):
        if len(tokens) >= cap:
            break
        for tid in _tokenize_word(vocab, word):
            if len(tokens) >= cap:
                break
            tokens.append(tid)
    tokens.append(vocab.sep_id)
    return tokens
