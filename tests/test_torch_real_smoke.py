"""REAL-torch smoke test (VERDICT r5 ask #8): skipped cleanly wherever
torch/transformers aren't installed (this sandbox ships neither), it keeps
the README 'Exporting reference head weights' recipe honest the moment an
environment with torch appears — a randomly-initialized HF BERT checkpoint
plus a generated ``nary_heads.npz`` must load through
``TorchEncoderAdapter`` and drive ``ModelScorer`` end to end.

This is the ONLY test allowed to touch the genuine HF forward; everything
else about the adapter (square-mask plumbing, head matmul dims, lossless
6H stacking) is covered torch-free in tests/test_torch_adapter.py.
"""

import numpy as np
import pytest

torch = pytest.importorskip(
    "torch", reason="real-checkpoint smoke needs torch (not in sandbox)")
transformers = pytest.importorskip(
    "transformers", reason="real-checkpoint smoke needs transformers")

from text2nkg_spark.candidates import enumerate_triples  # noqa: E402
from text2nkg_spark.operators.model_scorer import (  # noqa: E402
    MULTI_HEAD_NAMES, ModelScorer, load_torch_encoder)


@pytest.fixture()
def tiny_checkpoint(tmp_path):
    """Randomly-initialized tiny BERT saved HF-style + every documented
    head family in the (6H, C)/(C,) npz layout the README prescribes."""
    cfg = transformers.BertConfig(
        vocab_size=30522,          # _token_ids emits crc32%28000+1000
        hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
        intermediate_size=64, max_position_embeddings=512)
    torch.manual_seed(7)
    model = transformers.BertModel(cfg)
    ckpt = tmp_path / "tiny-bert"
    model.save_pretrained(str(ckpt))
    h, c, c_ner = cfg.hidden_size, 7, 5
    rng = np.random.default_rng(11)
    heads = {}
    for fam in ("re", "qre") + MULTI_HEAD_NAMES:
        heads[f"w_{fam}"] = rng.standard_normal((6 * h, c))
        heads[f"b_{fam}"] = rng.standard_normal(c)
    heads["ner_w"] = rng.standard_normal((2 * h, c_ner))
    heads["ner_b"] = rng.standard_normal(c_ner)
    np.savez(str(ckpt / "nary_heads.npz"), **heads)
    return str(ckpt), h, c, c_ner


def test_adapter_loads_and_encodes_square_mask(tiny_checkpoint):
    ckpt, h, c, _ = tiny_checkpoint
    enc = load_torch_encoder(ckpt, num_classes=c)
    assert set(enc.pair_heads) == {"re", "qre"}
    assert set(enc.multi_heads) == set(MULTI_HEAD_NAMES)
    b, t = 2, 24
    rng = np.random.default_rng(3)
    ids = rng.integers(1000, 29000, size=(b, t), dtype=np.int64)
    att = np.tril(np.ones((t, t), dtype=np.int64))[None].repeat(b, axis=0)
    pos = np.arange(t, dtype=np.int64)[None].repeat(b, axis=0)
    out = enc.encode_batch(ids, att, pos)
    assert out.shape == (b, t, h) and np.isfinite(out).all()
    # the 3-D mask must be load-bearing: full visibility changes hiddens
    out_full = enc.encode_batch(ids, np.ones((b, t, t), np.int64), pos)
    assert not np.allclose(out, out_full)
    # determinism: eval() + no_grad, same inputs -> bit-identical hiddens
    assert np.array_equal(out, enc.encode_batch(ids, att, pos))


def test_scorer_end_to_end_on_real_checkpoint(tiny_checkpoint):
    """The fake-torch e2e twin (test_torch_adapter.py) through genuine HF
    weights: logits aligned with candidate enumeration order, finite,
    deterministic across calls."""
    ckpt, _, c, _ = tiny_checkpoint
    sc = ModelScorer(ckpt, max_seq_length=48, max_pair_length=8,
                     num_classes=c)
    tokens = "the ent1 saw ent2 near ent3 now".split()
    ents = np.array([[1, 1], [3, 3], [5, 5]])
    cand = enumerate_triples(ents, 48)
    rel, qul = sc.score_sentence(tokens, ents, cand)
    assert rel.shape == (27, c) and qul.shape == (27, c)
    assert np.isfinite(rel).all() and np.isfinite(qul).all()
    rel2, qul2 = sc.score_sentence(tokens, ents, cand)
    assert np.array_equal(rel, rel2) and np.array_equal(qul, qul2)


def test_ner_head_on_real_checkpoint(tiny_checkpoint):
    ckpt, h, c, c_ner = tiny_checkpoint
    enc = load_torch_encoder(ckpt, num_classes=c)
    h1 = np.ones((3, h)); h2 = np.full((3, h), 2.0)
    out = enc.span_logits(h1, h2, num_classes=c_ner)
    assert out.shape == (3, c_ner) and np.isfinite(out).all()
