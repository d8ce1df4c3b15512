"""NER throughput through the REAL converted-checkpoint path (VERDICT r5 #8).

Builds a reference-default-shape BertForTokenClassification checkpoint
directory (HF state_dict names in model.safetensors + config.json +
vocab.txt — the on-disk layout of a downloaded dslim/bert-base-NER snapshot,
reference TEST.md:32 / scripts/download_default_model.sh:9), converts it with
the torch-free ``tools/convert_model.py --checkpoint`` path, and measures
docs/s of the Spark NER UDF over the sf0.1 documents table (5000 docs) with
a warm per-executor model.

Reference default hparams (src/ner_model.cpp:18-27): n_vocab=30522,
n_max_tokens=512, n_embd=256, n_intermediate=1536, n_layer=6, n_labels=9.
The struct's n_head default is 12, which does not divide n_embd=256 — real
checkpoints override every hparam at load, so this harness uses n_head=8
(head_dim 32), the nearest valid attention shape.

Prints ONE JSON line: {"metric": "ner_throughput_docs_per_sec", ...}.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from tools.convert_model import (  # noqa: E402
    STUB_VOCAB,
    convert_checkpoint,
    random_model,
    write_safetensors,
)

N_DOCS_TARGET = 5000  # sf0.1 documents table size (r1/r3 measurement basis)


def build_checkpoint(ckpt_dir: str) -> None:
    vocab = list(STUB_VOCAB) + [f"tok{i}" for i in range(30522 - len(STUB_VOCAB))]
    hp, clean = random_model(
        vocab,
        n_embd=256,
        n_head=8,
        n_layer=6,
        n_labels=9,
        n_max_tokens=512,
        n_intermediate=1536,
        seed=11,
    )
    hf = {}
    for name, t in clean.items():
        hf[name if name.startswith("classifier.") else "bert." + name] = t
    hf["bert.embeddings.position_ids"] = np.arange(512, dtype=np.int64).reshape(1, 512)
    write_safetensors(os.path.join(ckpt_dir, "model.safetensors"), hf)
    with open(os.path.join(ckpt_dir, "vocab.txt"), "w") as f:
        f.write("\n".join(vocab) + "\n")
    with open(os.path.join(ckpt_dir, "config.json"), "w") as f:
        json.dump(
            {
                "vocab_size": len(vocab),
                "max_position_embeddings": 512,
                "hidden_size": 256,
                "intermediate_size": 1536,
                "num_attention_heads": 8,
                "num_hidden_layers": 6,
                "id2label": {str(i): lbl for i, lbl in enumerate(
                    ["O", "B-MISC", "I-MISC", "B-PER", "I-PER",
                     "B-ORG", "I-ORG", "B-LOC", "I-LOC"])},
            },
            f,
        )


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    # 0=f32, 1=f16, 2=q4_0 — the reference's three container dtypes
    # (ner_model.cpp:194; converter convert_ner_to_ggml.py:77-82)
    ap.add_argument("--ftype", type=int, default=0, choices=(0, 1, 2))
    args = ap.parse_args()
    dtype_name = {0: "f32", 1: "f16", 2: "q4_0"}[args.ftype]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    with tempfile.TemporaryDirectory(prefix="ner_ckpt_") as tmp:
        ckpt = os.path.join(tmp, "ckpt")
        os.makedirs(ckpt)
        t0 = time.time()
        build_checkpoint(ckpt)
        model_bin = os.path.join(tmp, f"model_{dtype_name}.bin")
        convert_checkpoint(ckpt, model_bin, ftype=args.ftype)
        convert_s = round(time.time() - t0, 2)
        model_mb = round(os.path.getsize(model_bin) / 1e6, 1)

        from duckdb_ner_spark.session import get_spark
        from duckdb_ner_spark.functions.ner_udf import ner
        from pyspark.sql import functions as F

        spark = get_spark(
            "ner-throughput", extra_conf={"spark.ner.modelPath": model_bin}
        )
        docs = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text")
            # single-file source arrives as 1 partition — spread across the
            # Python workers (the q_ner pattern)
            .repartition(spark.sparkContext.defaultParallelism)
            .persist()
        )
        n_docs = docs.count()
        scored = docs.select(F.size(ner(spark, F.col("text"))).alias("n_ents"))
        # warm pass: per-executor model load + tokenizer memo + codegen
        scored.agg(F.sum("n_ents")).collect()
        best = float("inf")
        total_ents = 0
        for _ in range(3):
            t1 = time.time()
            total_ents = scored.agg(F.sum("n_ents")).collect()[0][0]
            best = min(best, time.time() - t1)
        print(
            json.dumps(
                {
                    "metric": "ner_throughput_docs_per_sec",
                    "value": round(n_docs / best, 1),
                    "unit": "docs/s",
                    "n_docs": n_docs,
                    "elapsed_sec": round(best, 3),
                    "total_entities": int(total_ents or 0),
                    "model": f"converted-checkpoint {dtype_name} 6L/256/1536 8H 30522v",
                    "model_mb": model_mb,
                    "convert_sec": convert_s,
                    "sf_dir": sf_dir,
                }
            )
        )


if __name__ == "__main__":
    main()
