"""Model conversion tool — analogue of the reference's
scripts/convert_ner_to_ggml.py (A17): produce a GGML-container model this
engine (and the reference) can load.

Modes:
- ``--random``: a seeded random tiny model (n_embd/heads/layers from flags) —
  for tests and demos; vocab from a word list file or the built-in stub.
- ``--hf <model_id>``: convert a HuggingFace BertForTokenClassification
  checkpoint (same tensor-name mapping as the reference: strip the ``bert.``
  prefix, drop position_ids). Requires torch+transformers — NOT present in
  this environment; gated behind an import-try.

Usage: python tools/convert_model.py --random out.bin [--embd 32 --heads 4
       --layers 2 --labels 9]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, "/root/repo")

from duckdb_ner_spark.ner.ggml_format import HPARAM_NAMES, write_ggml  # noqa: E402

STUB_VOCAB = [
    "[CLS]", "[SEP]", "duck", "##db", "labs", "is", "in", "amsterdam",
    "new", "york", "sam", "spark", "customer", "row", "window", "table",
]


def random_model(vocab: list[str], n_embd: int, n_head: int, n_layer: int,
                 n_labels: int, n_max_tokens: int, seed: int = 7):
    rng = np.random.RandomState(seed)
    n_intermediate = n_embd * 4

    def w(*shape):
        return (rng.randn(*shape) * 0.05).astype(np.float32)

    t = {
        "embeddings.word_embeddings.weight": w(len(vocab), n_embd),
        "embeddings.token_type_embeddings.weight": w(2, n_embd),
        "embeddings.position_embeddings.weight": w(n_max_tokens, n_embd),
        "embeddings.LayerNorm.weight": np.ones(n_embd, np.float32),
        "embeddings.LayerNorm.bias": np.zeros(n_embd, np.float32),
        "classifier.weight": w(n_labels, n_embd),
        "classifier.bias": np.zeros(n_labels, np.float32),
    }
    for i in range(n_layer):
        base = f"encoder.layer.{i}."
        t[base + "attention.self.query.weight"] = w(n_embd, n_embd)
        t[base + "attention.self.query.bias"] = np.zeros(n_embd, np.float32)
        t[base + "attention.self.key.weight"] = w(n_embd, n_embd)
        t[base + "attention.self.key.bias"] = np.zeros(n_embd, np.float32)
        t[base + "attention.self.value.weight"] = w(n_embd, n_embd)
        t[base + "attention.self.value.bias"] = np.zeros(n_embd, np.float32)
        t[base + "attention.output.dense.weight"] = w(n_embd, n_embd)
        t[base + "attention.output.dense.bias"] = np.zeros(n_embd, np.float32)
        t[base + "attention.output.LayerNorm.weight"] = np.ones(n_embd, np.float32)
        t[base + "attention.output.LayerNorm.bias"] = np.zeros(n_embd, np.float32)
        t[base + "intermediate.dense.weight"] = w(n_intermediate, n_embd)
        t[base + "intermediate.dense.bias"] = np.zeros(n_intermediate, np.float32)
        t[base + "output.dense.weight"] = w(n_embd, n_intermediate)
        t[base + "output.dense.bias"] = np.zeros(n_embd, np.float32)
        t[base + "output.LayerNorm.weight"] = np.ones(n_embd, np.float32)
        t[base + "output.LayerNorm.bias"] = np.zeros(n_embd, np.float32)
    hp = dict(
        n_vocab=len(vocab), n_max_tokens=n_max_tokens, n_embd=n_embd,
        n_intermediate=n_intermediate, n_head=n_head, n_layer=n_layer,
        ftype=0, n_labels=n_labels,
    )
    return hp, t


def convert_hf(model_id: str, out: str, ftype: int) -> None:  # pragma: no cover
    try:
        import torch  # noqa: F401
        from transformers import AutoModelForTokenClassification, AutoTokenizer
    except ImportError:
        raise SystemExit("torch/transformers not available in this environment")
    tok = AutoTokenizer.from_pretrained(model_id)
    model = AutoModelForTokenClassification.from_pretrained(model_id)
    cfg = model.config.to_dict()
    hp = dict(
        n_vocab=cfg["vocab_size"], n_max_tokens=cfg["max_position_embeddings"],
        n_embd=cfg["hidden_size"], n_intermediate=cfg["intermediate_size"],
        n_head=cfg["num_attention_heads"], n_layer=cfg["num_hidden_layers"],
        ftype=ftype, n_labels=cfg["num_labels"],
    )
    vocab = [w for w, _ in sorted(tok.get_vocab().items(), key=lambda kv: kv[1])]
    tensors = {}
    for name, t in model.state_dict().items():
        clean = name[5:] if name.startswith("bert.") else name
        if clean == "embeddings.position_ids":
            continue
        tensors[clean] = t.squeeze().numpy()
    write_ggml(out, hp, vocab, tensors)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("out")
    p.add_argument("--random", action="store_true")
    p.add_argument("--hf")
    p.add_argument("--embd", type=int, default=32)
    p.add_argument("--heads", type=int, default=4)
    p.add_argument("--layers", type=int, default=2)
    p.add_argument("--labels", type=int, default=9)
    p.add_argument("--max-tokens", type=int, default=128)
    p.add_argument("--ftype", type=int, default=0)
    p.add_argument("--seed", type=int, default=7)
    a = p.parse_args()
    if a.hf:
        convert_hf(a.hf, a.out, a.ftype)
    else:
        hp, t = random_model(STUB_VOCAB, a.embd, a.heads, a.layers, a.labels, a.max_tokens, a.seed)
        hp["ftype"] = a.ftype
        write_ggml(a.out, hp, STUB_VOCAB, t)
    print(f"wrote {a.out}")


if __name__ == "__main__":
    main()
