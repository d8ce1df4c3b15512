"""GGML container + NumPy BERT backend tests (A8/A10 parity)."""

import struct

import numpy as np
import pytest

from duckdb_ner_spark.ner.ggml_format import read_ggml, write_ggml
from duckdb_ner_spark.ner.model import load_model


@pytest.fixture(scope="module")
def tiny_model(tmp_path_factory):
    from tools.convert_model import STUB_VOCAB, random_model

    path = str(tmp_path_factory.mktemp("m") / "tiny.bin")
    hp, t = random_model(STUB_VOCAB, n_embd=32, n_head=4, n_layer=2, n_labels=9, n_max_tokens=64)
    write_ggml(path, hp, STUB_VOCAB, t)
    return path, hp, t


def test_roundtrip_f32(tiny_model):
    path, hp, t = tiny_model
    mf = read_ggml(path)
    assert mf is not None
    assert mf.hparams["n_embd"] == 32 and mf.hparams["n_labels"] == 9
    assert mf.vocab[0] == "[CLS]"
    for name, arr in t.items():
        np.testing.assert_array_equal(mf.tensors[name], arr.astype(np.float32))


def test_roundtrip_f16_lossy(tiny_model, tmp_path):
    path, hp, t = tiny_model
    p16 = str(tmp_path / "tiny16.bin")
    hp16 = dict(hp, ftype=1)
    write_ggml(p16, hp16, read_ggml(path).vocab, t)
    mf = read_ggml(p16)
    w = "encoder.layer.0.attention.self.query.weight"
    np.testing.assert_allclose(mf.tensors[w], t[w], atol=1e-3)
    # 1-D tensors stay f32 exactly (converter rule, convert_ner_to_ggml.py:77-82)
    np.testing.assert_array_equal(
        mf.tensors["embeddings.LayerNorm.weight"], t["embeddings.LayerNorm.weight"]
    )


def test_q4_0_dequant_modern():
    from duckdb_ner_spark.ner.ggml_format import _dequant_q4_0_modern

    # one block: f16 scale=2.0, 16 low nibbles then 16 high → (n-8)*2
    scale = np.float16(2.0).tobytes()
    nibbles = bytes((hi << 4) | lo for lo, hi in zip(range(16), range(16)))
    out = _dequant_q4_0_modern(scale + nibbles, 32)
    lows = [(n - 8) * 2.0 for n in range(16)]
    highs = [(n - 8) * 2.0 for n in range(16)]
    np.testing.assert_array_equal(out, np.array(lows + highs, dtype=np.float32))


def test_q4_0_dequant_legacy_interleaved():
    from duckdb_ner_spark.ner.ggml_format import _dequant_q4_0_legacy

    # bert.cpp-era block: f32 scale, pairwise interleave lo→y[2j], hi→y[2j+1]
    scale = np.float32(2.0).tobytes()
    nibbles = bytes((hi << 4) | lo for lo, hi in zip(range(16), range(16)))
    out = _dequant_q4_0_legacy(scale + nibbles, 32)
    expect = []
    for n in range(16):
        expect += [(n - 8) * 2.0, (n - 8) * 2.0]  # lo then hi of same byte
    np.testing.assert_array_equal(out, np.array(expect, dtype=np.float32))


def test_roundtrip_q4_0_both_layouts(tiny_model, tmp_path):
    """ftype=2 writes real q4_0 blocks (both historical layouts); read_ggml
    auto-detects each and dequantizes within one quantization step of the
    original weights (block step = scale; error bound step/2 + f16 scale
    rounding). 1-D tensors stay f32 exactly, as in every ggml converter."""
    path, hp, t = tiny_model
    vocab = read_ggml(path).vocab
    w = "encoder.layer.0.attention.self.query.weight"
    for legacy in (False, True):
        pq = str(tmp_path / f"tiny_q4_{legacy}.bin")
        write_ggml(pq, dict(hp, ftype=2), vocab, t, q4_legacy=legacy)
        mf = read_ggml(pq)
        assert mf is not None, f"auto-detect failed (legacy={legacy})"
        arr = t[w].astype(np.float32)
        step = np.abs(arr.reshape(-1, 32)).max(axis=1) / 7.0  # coarsest scale
        tol = float(step.max()) * 0.6 + 1e-3
        np.testing.assert_allclose(mf.tensors[w], arr, atol=tol)
        # quantized read is NOT bit-equal to f32 (the lossy branch really ran)
        assert not np.array_equal(mf.tensors[w], arr)
        np.testing.assert_array_equal(
            mf.tensors["embeddings.LayerNorm.weight"], t["embeddings.LayerNorm.weight"]
        )


def test_bad_magic_rejected(tmp_path):
    # the reference's bundled placeholder spells 'ggml' in ASCII — wrong
    # byte order for the LE magic check → must NOT load
    p = str(tmp_path / "placeholder.bin")
    with open(p, "wb") as f:
        f.write(b"ggml\x00\x00\x00\x00")
    assert read_ggml(p) is None
    assert load_model(p) is None
    # correct magic but truncated → loader returns None, never raises
    p2 = str(tmp_path / "trunc.bin")
    with open(p2, "wb") as f:
        f.write(struct.pack("<I", 0x67676D6C))
    assert load_model(p2) is None


def test_indivisible_heads_rejected(tmp_path):
    """n_embd % n_head != 0 would silently corrupt the multi-head reshape —
    the loader must map such a model to None (silent-failure contract)."""
    from tools.convert_model import STUB_VOCAB, random_model

    hp, t = random_model(STUB_VOCAB, n_embd=32, n_head=4, n_layer=1, n_labels=9, n_max_tokens=64)
    hp["n_head"] = 5  # 32 % 5 != 0
    p = str(tmp_path / "badheads.bin")
    write_ggml(p, hp, STUB_VOCAB, t)
    assert load_model(p) is None


def test_forward_pass_shapes_and_determinism(tiny_model):
    path, _, _ = tiny_model
    m = load_model(path)
    assert m is not None and m.n_max_tokens == 64
    ids = m.vocab.token_to_id
    toks = [ids["[CLS]"], ids["duck"], ids["labs"], ids["[SEP]"]]
    l1 = m.eval_tokens(toks)
    l2 = m.eval_tokens(toks)
    assert l1.shape == (4, 9)
    np.testing.assert_array_equal(l1, l2)
    # token identity matters: different tokens ⇒ different logit rows
    assert not np.allclose(l1[1], l1[2])


def test_position_matters(tiny_model):
    path, _, _ = tiny_model
    m = load_model(path)
    ids = m.vocab.token_to_id
    a = m.eval_tokens([ids["[CLS]"], ids["duck"], ids["labs"], ids["[SEP]"]])
    b = m.eval_tokens([ids["[CLS]"], ids["labs"], ids["duck"], ids["[SEP]"]])
    assert not np.allclose(a[1], b[2])  # position embeddings shift the result


def test_ggml_model_through_spark_udf(tiny_model, engine):
    """End-to-end: the reference's model format driving ner() on Spark."""
    path, _, _ = tiny_model
    engine.set_model_path(path)
    rows = engine.spark.sql(
        "SELECT ner('duck labs in amsterdam') AS e, ner('') AS empty"
    ).collect()
    # random weights ⇒ arbitrary (but valid) entities; the contract is
    # structural: list<struct<entity,label>> with labels from the BIO map
    from duckdb_ner_spark.ner.decode import LABEL_MAP

    for ent in rows[0].e:
        assert ent.label in LABEL_MAP
    assert rows[0].empty is not None
    engine.set_model_path(None)


def test_set_model_path_validate(tiny_model, engine, tmp_path):
    """validate=True eagerly loads at SET time (reference loads in the SET
    callback, src/ner_extension.cpp:183-186) and raises on an unloadable
    file; default stays silent like the reference."""
    path, _, _ = tiny_model
    engine.set_model_path(path, validate=True)  # loadable: no error
    bad = tmp_path / "bad.bin"
    bad.write_bytes(b"ggml1234")  # ASCII magic — never loads
    engine.set_model_path(str(bad))  # silent, reference default
    with pytest.raises(ValueError, match="failed to load"):
        engine.set_model_path(str(bad), validate=True)
    engine.set_model_path(None)


def test_q4_scale_overflow_raises_not_warns():
    """f32->f16 scale overflow must raise explicitly (VERDICT r11 #7) —
    previously it emitted a numpy RuntimeWarning and stored inf, which the
    dequant misframe guard rejected far from the cause."""
    import warnings

    import numpy as np
    import pytest

    from duckdb_ner_spark.ner import ggml_format as g

    big = (np.random.RandomState(0).randn(2, 64) * 1e38).astype(np.float32)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        with pytest.raises(ValueError, match="f16 range"):
            g._quant_q4_0_modern(big)
    assert not [w for w in rec if issubclass(w.category, RuntimeWarning)]
