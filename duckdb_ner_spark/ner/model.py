"""Model backend protocol + loaders with the reference's failure semantics.

The reference's loader (`ner_load_from_file`,
/root/reference/src/ner_model.cpp:292-298) returns nullptr on a missing or
bad file and NEVER raises; its bundled default model is a placeholder whose
magic check fails, so with no (valid) model configured every ``ner()`` call
returns ``[]`` for non-null rows (src/include/default_model.hpp:10-15,
src/ner_extension.cpp:68-76, test/sql/ner.test:21-51). We replicate exactly:
``load_model(path) -> Backend | None``, silent on every failure.

Backends:
- ``StubMapModel`` — a JSON file mapping token → label index; eval() emits
  one-hot logits per token. Hermetic + deterministic: the test vehicle, and
  the semantic analogue of the reference's convert-your-own-model flow.
- A real transformer backend would implement the same protocol with torch /
  ONNX weights (one instance per executor process; weights fetched from
  shared storage). Gated behind an import-try since heavy ML deps are not in
  this environment — the Spark-side plumbing (Arrow batches, per-executor
  singleton, conf snapshot) is identical and IS tested via the stub.
"""

from __future__ import annotations

import json
from typing import Protocol

import numpy as np

from .vocab import Vocab


class Backend(Protocol):
    vocab: Vocab
    n_max_tokens: int
    n_labels: int

    def eval_tokens(self, token_ids: list[int]) -> np.ndarray:
        """[n_tokens] ids → [n_tokens, n_labels] float32 logits."""
        ...


class StubMapModel:
    """Deterministic token→label model (FIXTURES.md §3 contract)."""

    def __init__(self, vocab: Vocab, labels_by_id: dict[int, int], n_max_tokens: int, n_labels: int):
        self.vocab = vocab
        self._labels_by_id = labels_by_id
        self.n_max_tokens = n_max_tokens
        self.n_labels = n_labels

    @classmethod
    def from_dict(cls, spec: dict) -> "StubMapModel":
        vocab = Vocab.from_tokens(spec["vocab"])
        n_labels = int(spec.get("n_labels", 9))
        n_max_tokens = int(spec.get("n_max_tokens", 512))
        labels_by_id = {}
        for tok, label in spec.get("labels_by_token", {}).items():
            ids = [i for i, t in enumerate(spec["vocab"]) if t == tok]
            for i in ids:
                labels_by_id[i] = int(label)
        return cls(vocab, labels_by_id, n_max_tokens, n_labels)

    def eval_tokens(self, token_ids: list[int]) -> np.ndarray:
        logits = np.zeros((len(token_ids), self.n_labels), dtype=np.float32)
        for t, tok in enumerate(token_ids):
            label = self._labels_by_id.get(tok, 0)
            logits[t, label] = 1.0
        return logits


def load_model_bytes(data: bytes):
    """Load a model from in-memory bytes (broadcast distribution path — for
    clusters where executors lack shared-FS access to the model file). Same
    silent-failure contract as load_model."""
    import os
    import tempfile

    try:
        if data[:4] == b"\x6c\x6d\x67\x67":
            from .bert_numpy import GgmlBertModel
            from .ggml_format import read_ggml

            fd, tmp = tempfile.mkstemp(suffix=".bin")
            try:
                with os.fdopen(fd, "wb") as f:
                    f.write(data)
                mf = read_ggml(tmp)
            finally:
                os.unlink(tmp)
            return GgmlBertModel(mf) if mf is not None else None
        spec = json.loads(data.decode("utf-8"))
        if spec.get("format") != "ner-stub-v1":
            return None
        return StubMapModel.from_dict(spec)
    except Exception:
        return None


def load_model(path: str | None):
    """Silent-failure loader: any problem → None (reference parity:
    test/sql/ner.test:39-51 expects SET to a bad path to succeed and the next
    ner() call to return []).

    Formats, sniffed by magic: the reference's GGML container
    (magic 0x67676d6c LE — a file that merely *spells* 'ggml' in ASCII fails
    the check, exactly like the reference's bundled placeholder) and the JSON
    stub format."""
    if not path:
        return None
    try:
        with open(path, "rb") as f:
            head = f.read(4)
        if head == b"\x6c\x6d\x67\x67":  # struct LE of 0x67676d6c
            from .bert_numpy import GgmlBertModel
            from .ggml_format import read_ggml

            mf = read_ggml(path)
            return GgmlBertModel(mf) if mf is not None else None
        with open(path) as f:
            spec = json.load(f)
        if spec.get("format") != "ner-stub-v1":
            return None
        return StubMapModel.from_dict(spec)
    except Exception:
        return None
