"""Whitespace + greedy-longest-match WordPiece tokenizer.

Behavioral port of ``ner_tokenize`` (/root/reference/src/ner_model.cpp:100-160).
Deliberately NOT a stock HuggingFace tokenizer — the reference's edge behavior
differs and is what its tests pin (SURVEY.md §7.4 #2):

- split on ASCII whitespace only; no lowercasing, no punctuation splitting
  (``Duck,DB`` is one word, :109-122);
- per word: greedy longest-prefix match against the FULL-WORD map for the
  first piece, then the SUBWORD map for every later piece (:135-151);
- an unmatched leading byte is skipped one byte at a time — no [UNK] token is
  emitted — and the word switches to the subword map (:152-155);
- output capped at ``n_max_tokens - 1`` before [SEP] is appended; the cap is
  checked before each word and before each piece (:128-138);
- [CLS] always first, [SEP] always last (even when truncated).
"""

from __future__ import annotations

from .vocab import Vocab

# str.isspace() matches unicode spaces; C isspace() is ASCII-only. Keep the
# reference's ASCII semantics explicit.
_ASCII_SPACE = set(" \t\n\r\v\f")


def split_words(text: str) -> list[str]:
    words: list[str] = []
    word: list[str] = []
    for ch in text:
        if ch in _ASCII_SPACE:
            if word:
                words.append("".join(word))
                word.clear()
        else:
            word.append(ch)
    if word:
        words.append("".join(word))
    return words


def tokenize(vocab: Vocab, text: str, n_max_tokens: int) -> list[int]:
    """Return token ids: [CLS] + wordpieces + [SEP], reference-truncated."""
    tokens: list[int] = [vocab.cls_id]

    for word in split_words(text):
        if len(tokens) >= n_max_tokens - 1:
            break
        i, n = 0, len(word)
        token_map = vocab.token_to_id
        while i < n:
            if len(tokens) >= n_max_tokens - 1:
                break
            j = n
            found = False
            while j > i:
                tok_id = token_map.get(word[i:j])
                if tok_id is not None:
                    tokens.append(tok_id)
                    i = j
                    token_map = vocab.subword_token_to_id
                    found = True
                    break
                j -= 1
            if not found:
                token_map = vocab.subword_token_to_id
                i += 1  # skip unknown byte — no [UNK] emitted
    tokens.append(vocab.sep_id)
    return tokens
