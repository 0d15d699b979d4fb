"""TorchEncoderAdapter contract test WITHOUT torch: a fake torch/
transformers pair drives the adapter's tensor plumbing — square (B, T, T)
attention mask, position_ids overlay, head matmul dims — so the only code
that has never executed in this container is the HF forward itself."""

import os
import sys
import types

import numpy as np
import pytest

from text2nkg_spark.candidates import enumerate_triples
from text2nkg_spark.operators.model_scorer import ModelScorer


class _FakeHidden:
    def __init__(self, arr):
        self._arr = arr

    def cpu(self):
        return self

    def numpy(self):
        return self._arr


class _FakeModelOutput:
    def __init__(self, arr):
        self.last_hidden_state = _FakeHidden(arr)


class _FakeBertModel:
    """Records every forward's tensor shapes; emits deterministic hidden
    states that depend on ids, mask AND positions (so a wiring bug that
    drops or transposes an input changes the output)."""

    hidden = 8

    def __init__(self):
        self.calls = []

    def eval(self):
        return self

    def __call__(self, input_ids, attention_mask, position_ids):
        self.calls.append(
            (input_ids.shape, attention_mask.shape, position_ids.shape))
        b, t = input_ids.shape
        assert attention_mask.shape == (b, t, t), "mask must stay SQUARE"
        h = np.arange(self.hidden, dtype=np.float64)
        base = (input_ids[..., None] * 3.0 + position_ids[..., None] * 7.0
                + h) / 100.0
        # mix through the mask so visibility blocks are load-bearing
        mixed = base + attention_mask.astype(np.float64) @ base / t
        return _FakeModelOutput(mixed)


@pytest.fixture()
def fake_torch(monkeypatch, tmp_path):
    torch = types.ModuleType("torch")
    torch.as_tensor = lambda x: np.asarray(x)

    class _NoGrad:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    torch.no_grad = _NoGrad
    transformers = types.ModuleType("transformers")
    model = _FakeBertModel()

    class _AutoModel:
        @staticmethod
        def from_pretrained(path):
            assert os.path.isdir(path)
            return model

    transformers.AutoModel = _AutoModel
    monkeypatch.setitem(sys.modules, "torch", torch)
    monkeypatch.setitem(sys.modules, "transformers", transformers)
    ckpt = tmp_path / "ckpt"
    ckpt.mkdir()
    return str(ckpt), model


def test_missing_heads_is_hard_error(fake_torch):
    ckpt, _ = fake_torch
    from text2nkg_spark.operators.model_scorer import TorchEncoderAdapter

    with pytest.raises(NotImplementedError, match="nary_heads"):
        TorchEncoderAdapter(ckpt, num_classes=5)


def _save_pair_heads(ckpt, rng, c=5, h=None, **extra):
    """Write the REQUIRED hyperrelation head pair (w_re/b_re, w_qre/b_qre
    — the reference's re_classifier_* / q_re_classifier_* families) in the
    documented (6H, C) layout, plus any extra keys."""
    h = h if h is not None else _FakeBertModel.hidden
    heads = {
        "w_re": rng.standard_normal((6 * h, c)),
        "b_re": rng.standard_normal(c),
        "w_qre": rng.standard_normal((6 * h, c)),
        "b_qre": rng.standard_normal(c),
    }
    heads.update(extra)
    np.savez(os.path.join(ckpt, "nary_heads.npz"), **heads)
    return heads


def test_adapter_shapes_and_head_matmul(fake_torch):
    ckpt, model = fake_torch
    from text2nkg_spark.operators.model_scorer import TorchEncoderAdapter

    c, h = 5, _FakeBertModel.hidden
    rng = np.random.default_rng(11)
    heads = _save_pair_heads(ckpt, rng, c=c)

    adapter = TorchEncoderAdapter(ckpt, num_classes=c)
    ids = rng.integers(0, 30000, size=(3, 40)).astype(np.int64)
    att = (rng.random((3, 40, 40)) < 0.4).astype(np.int8)
    pos = rng.integers(0, 40, size=(3, 40)).astype(np.int64)
    out = adapter.encode_batch(ids, att, pos)
    assert out.shape == (3, 40, _FakeBertModel.hidden)
    assert model.calls[-1] == ((3, 40), (3, 40, 40), (3, 40))
    # single-example encode delegates through the same batched forward
    one = adapter.encode(ids[0], att[0], pos[0])
    assert one.shape == (40, _FakeBertModel.hidden)
    assert np.array_equal(one, out[0])  # deterministic fake: same inputs
    assert model.calls[-1] == ((1, 40), (1, 40, 40), (1, 40))

    # pair_logits = concat(h1, h2, hql, hqr, hsub_s, hsub_e) @ w + b,
    # broadcasting the two subject states; 're' and 'qre' select their
    # own weight family (separate classifiers in the reference)
    h1 = rng.standard_normal((7, h))
    h2 = rng.standard_normal((7, h))
    hql = rng.standard_normal((7, h))
    hqr = rng.standard_normal((7, h))
    hsub_s = rng.standard_normal(h)
    hsub_e = rng.standard_normal(h)
    feats = np.concatenate(
        [h1, h2, hql, hqr,
         np.broadcast_to(hsub_s, h1.shape),
         np.broadcast_to(hsub_e, h1.shape)], axis=-1)
    for fam in ("re", "qre"):
        got = adapter.pair_logits(h1, h2, hql, hqr, hsub_s, hsub_e, fam)
        want = feats @ heads[f"w_{fam}"] + heads[f"b_{fam}"]
        assert got.shape == (7, c)
        assert np.allclose(got, want)


def test_adapter_pair_head_families_lazy_required(fake_torch):
    """A file with only the relation family LOADS (a role/hypergraph-only
    export has no re_*/q_re_* heads and must still load for multi-schema
    scoring), but scoring through the absent qualifier family is a hard
    error at first use — the reference's q_re_classifier_* is a separate
    Linear triple and is never invented."""
    ckpt, _ = fake_torch
    from text2nkg_spark.operators.model_scorer import TorchEncoderAdapter

    h = _FakeBertModel.hidden
    rng = np.random.default_rng(23)
    np.savez(os.path.join(ckpt, "nary_heads.npz"),
             w_re=rng.standard_normal((6 * h, 5)),
             b_re=rng.standard_normal(5))
    adapter = TorchEncoderAdapter(ckpt, num_classes=5)
    h1, h2, hql, hqr = (rng.standard_normal((3, h)) for _ in range(4))
    hs, he = rng.standard_normal(h), rng.standard_normal(h)
    assert adapter.pair_logits(h1, h2, hql, hqr, hs, he,
                               "re").shape == (3, 5)
    with pytest.raises(NotImplementedError, match="w_qre"):
        adapter.pair_logits(h1, h2, hql, hqr, hs, he, "qre")


def test_adapter_ner_head(fake_torch):
    ckpt, _ = fake_torch
    from text2nkg_spark.operators.model_scorer import TorchEncoderAdapter

    c, cn, h = 5, 4, _FakeBertModel.hidden
    rng = np.random.default_rng(13)
    _save_pair_heads(ckpt, rng, c=c)
    adapter = TorchEncoderAdapter(ckpt, num_classes=c)
    h1 = rng.standard_normal((6, h))
    h2 = rng.standard_normal((6, h))
    with pytest.raises(NotImplementedError, match="ner_w"):
        adapter.span_logits(h1, h2, cn)
    _save_pair_heads(ckpt, rng, c=c,
                     ner_w=rng.standard_normal((2 * h, cn)),
                     ner_b=rng.standard_normal(cn))
    adapter2 = TorchEncoderAdapter(ckpt, num_classes=c)
    got = adapter2.span_logits(h1, h2, cn)
    assert got.shape == (6, cn)


def test_adapter_multi_schema_heads(fake_torch):
    """head_logits loads per-head w_{v,q,qb,qc} linears ((6H, C_head) over
    concat(h1, h2, hql, hqr, hsub_s, hsub_e)) and hard-errors on absent
    heads — the event/role q2/q3 classifiers' export contract."""
    ckpt, _ = fake_torch
    from text2nkg_spark.operators.model_scorer import TorchEncoderAdapter

    c, h = 5, _FakeBertModel.hidden
    rng = np.random.default_rng(17)
    heads = {}
    for name, cw in (("v", 4), ("q", 6), ("qb", 6), ("qc", 6)):
        heads[f"w_{name}"] = rng.standard_normal((6 * h, cw))
        heads[f"b_{name}"] = rng.standard_normal(cw)
    _save_pair_heads(ckpt, rng, c=c, **heads)
    adapter = TorchEncoderAdapter(ckpt, num_classes=c)
    h1 = rng.standard_normal((7, h))
    h2 = rng.standard_normal((7, h))
    hql = rng.standard_normal((7, h))
    hqr = rng.standard_normal((7, h))
    hsub_s = rng.standard_normal(h)
    hsub_e = rng.standard_normal(h)
    feats = np.concatenate(
        [h1, h2, hql, hqr,
         np.broadcast_to(hsub_s, h1.shape),
         np.broadcast_to(hsub_e, h1.shape)], axis=-1)
    for hi, (name, cw) in enumerate(
            (("v", 4), ("q", 6), ("qb", 6), ("qc", 6))):
        got = adapter.head_logits(h1, h2, hql, hqr, hsub_s, hsub_e, cw, hi)
        want = feats @ heads[f"w_{name}"] + heads[f"b_{name}"]
        assert got.shape == (7, cw) and np.allclose(got, want)

    # absent multi heads are a hard error (never invented)
    _save_pair_heads(ckpt, rng, c=c)
    bare = TorchEncoderAdapter(ckpt, num_classes=c)
    with pytest.raises(NotImplementedError, match="w_qb"):
        bare.head_logits(h1, h2, hql, hqr, hsub_s, hsub_e, 6, 2)


def test_documented_export_key_set_loads(fake_torch):
    """The EXACT key set the README's 'Exporting reference head weights'
    recipe produces (w_re/b_re, w_qre/b_qre, w_v..w_qc, ner_w/ner_b)
    loads with no remainder: every pair/multi/ner head is served from the
    documented keys, so the copy-paste export is the whole production
    story."""
    ckpt, _ = fake_torch
    from text2nkg_spark.operators.model_scorer import TorchEncoderAdapter

    c, cn, h = 5, 4, _FakeBertModel.hidden
    rng = np.random.default_rng(29)
    keys = {}
    for name in ("re", "qre", "v", "q", "qb", "qc"):
        keys[f"w_{name}"] = rng.standard_normal((6 * h, c))
        keys[f"b_{name}"] = rng.standard_normal(c)
    keys["ner_w"] = rng.standard_normal((2 * h, cn))
    keys["ner_b"] = rng.standard_normal(cn)
    np.savez(os.path.join(ckpt, "nary_heads.npz"), **keys)
    adapter = TorchEncoderAdapter(ckpt, num_classes=c)
    # every documented head family is live
    assert set(adapter.pair_heads) == {"re", "qre"}
    assert set(adapter.multi_heads) == {"v", "q", "qb", "qc"}
    assert adapter.ner_w is not None and adapter.ner_b is not None
    h1, h2, hql, hqr = (rng.standard_normal((3, h)) for _ in range(4))
    hs, he = rng.standard_normal(h), rng.standard_normal(h)
    for fam in ("re", "qre"):
        assert adapter.pair_logits(h1, h2, hql, hqr, hs, he,
                                   fam).shape == (3, c)
    for hi in range(4):
        assert adapter.head_logits(h1, h2, hql, hqr, hs, he, c,
                                   hi).shape == (3, c)
    assert adapter.span_logits(h1, h2, cn).shape == (3, cn)


def test_scorer_multi_on_fake_checkpoint(fake_torch):
    """score_sentence_multi drives the adapter's multi heads through the
    packed shapes end to end (a real-checkpoint event/role run)."""
    ckpt, _ = fake_torch
    h = _FakeBertModel.hidden
    rng = np.random.default_rng(19)
    heads = {}
    for name, cw in (("v", 4), ("q", 6), ("qb", 6), ("qc", 6)):
        heads[f"w_{name}"] = rng.standard_normal((6 * h, cw))
        heads[f"b_{name}"] = rng.standard_normal(cw)
    _save_pair_heads(ckpt, rng, c=4, **heads)
    sc = ModelScorer(ckpt, max_seq_length=48, max_pair_length=8,
                     num_classes=4)
    ents = np.array([[1, 1], [3, 3], [5, 5]])
    cand = enumerate_triples(ents, 48)
    outs = sc.score_sentence_multi(["w"] * 8, ents, cand, (4, 6, 6, 6))
    assert [o.shape for o in outs] == [(27, 4), (27, 6), (27, 6), (27, 6)]
    assert all(np.isfinite(o).all() for o in outs)
    outs2 = sc.score_sentence_multi(["w"] * 8, ents, cand, (4, 6, 6, 6))
    for a, b in zip(outs, outs2):
        assert np.array_equal(a, b)


def test_scorer_end_to_end_on_fake_checkpoint(fake_torch):
    """ModelScorer drives the adapter through the real packed shapes:
    square masks survive to the forward, marker position_ids carry the
    span ends, and the logits align with candidate enumeration order."""
    ckpt, model = fake_torch
    c = 7
    rng = np.random.default_rng(12)
    _save_pair_heads(ckpt, rng, c=c)

    sc = ModelScorer(ckpt, max_seq_length=48, max_pair_length=8,
                     num_classes=c)
    tokens = "the ent1 saw ent2 near ent3 now".split()
    ents = np.array([[1, 1], [3, 3], [5, 5]])
    cand = enumerate_triples(ents, 48)
    rel, qul = sc.score_sentence(tokens, ents, cand)
    assert rel.shape == (27, c) and qul.shape == (27, c)
    assert np.isfinite(rel).all() and np.isfinite(qul).all()
    # every forward saw the packed width T = S + 2P and a square mask
    t = 48 + 2 * 8
    assert all(s_ids[1] == t and s_att == (s_ids[0], t, t)
               for s_ids, s_att, _ in model.calls)
    rel2, qul2 = sc.score_sentence(tokens, ents, cand)
    assert np.array_equal(rel, rel2) and np.array_equal(qul, qul2)
