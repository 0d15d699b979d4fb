"""Vectorized hyperrelation decode — the Spark-side implementation of the
reference's eval decode (run_re.py:1293-1448), written tensor-first.

Where the reference walks an insertion-ordered dict and sums python lists six
times per triple, we build dense (E, E, E, C) score tensors per sentence and
compute the full 6-permutation ensemble with five transposes + two
fancy-index block swaps — the additions happen in the reference's exact
sequence, so the float64 sums (and therefore every argmax and NMS ordering)
are bit-identical to the oracle (text2nkg_spark/reference_oracle.py), which
tests assert.

Ensemble algebra (sym block = ['NIL'], swap(x) = x[:1]+x[num:]+x[1:num]):

    V[i,j,k]  = S[ijk] + swap(S[jik]) + Q[ikj] + Q[jki] + swap(Q[kij]) + S[kji]
    Qc[i,j,k] = Q[ijk] + Q[jik] + S[ikj] + swap(S[jki]) + S[kij] + swap(Q[kji])

(derived from run_re.py:1317-1386; S = rel logits, Q = qualifier logits).
"""

from __future__ import annotations

import numpy as np

from text2nkg_spark.labels import LabelSpace


class MissingOrderingError(ValueError):
    """A span triple lacks one of its 6 orderings (reference asserts:
    run_re.py:1328/1343/1358/1373/1386)."""


def ensemble_tensors(
    e: int,
    cand: np.ndarray,      # (N, 10) from candidates.enumerate_triples
    rel_lg: np.ndarray,    # (N, C) float64
    q_lg: np.ndarray,      # (N, C) float64
    space: LabelSpace,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (V, Qc, present) dense tensors over entity index triples."""
    c = space.num_classes
    s = np.zeros((e, e, e, c), dtype=np.float64)
    q = np.zeros((e, e, e, c), dtype=np.float64)
    present = np.zeros((e, e, e), dtype=bool)
    ii, jj, kk = cand[:, 1], cand[:, 2], cand[:, 3]
    s[ii, jj, kk] = rel_lg
    q[ii, jj, kk] = q_lg
    present[ii, jj, kk] = True

    sw = space.swap_index()

    def t(x: np.ndarray, perm: tuple[int, int, int]) -> np.ndarray:
        return np.transpose(x, perm + (3,))

    # addition sequence mirrors run_re.py:1317-1386 exactly (non-associative
    # float sums must run in the same order for bit parity)
    # np.transpose(x, p)[i0,i1,i2] = x[a] where a[p[m]] = i_m, so to read
    # X[i,j,k] = x[j,k,i] the axes are (2,0,1) and for x[k,i,j] they are
    # (1,2,0) — the 3-cycles use the INVERSE permutation.
    v = s.copy()
    v += t(s, (1, 0, 2))[..., sw]   # swap(S[j,i,k])
    v += t(q, (0, 2, 1))            # Q[i,k,j]
    v += t(q, (2, 0, 1))            # Q[j,k,i]
    v += t(q, (1, 2, 0))[..., sw]   # swap(Q[k,i,j])
    v += t(s, (2, 1, 0))            # S[k,j,i]

    qc = q.copy()
    qc += t(q, (1, 0, 2))           # Q[j,i,k]
    qc += t(s, (0, 2, 1))           # S[i,k,j]
    qc += t(s, (2, 0, 1))[..., sw]  # swap(S[j,k,i])
    qc += t(s, (1, 2, 0))           # S[k,i,j]
    qc += t(q, (2, 1, 0))[..., sw]  # swap(Q[k,j,i])
    return v, qc, present


def _nms(results: list[tuple], label_list: list[str]) -> list[tuple]:
    """Stable-sort + greedy NMS + projection (run_re.py:1422-1493 tail).

    r7: the kept-set span/label columns live in preallocated arrays
    compared on ``[:k]`` slices — the previous list->np.array rebuild per
    candidate was O(k) allocations each; the comparisons (and therefore
    the kept set) are unchanged."""
    if not results:
        return []
    n = len(results)
    scores = np.array([r[0] for r in results])
    order = np.argsort(-scores, kind="stable")

    ks = np.empty((8, n), dtype=np.int64)
    a1s, a1e, a2s, a2e, a3s, a3e, arel, aq = ks
    kept: list[tuple] = []
    k = 0
    for oi in order:
        item = results[int(oi)]
        m1, m2, m3 = item[1], item[2], item[5]
        if k:
            ov1 = ((a1s[:k] <= m1[0]) & (m1[0] <= a1e[:k])) | (
                (m1[0] <= a1s[:k]) & (a1s[:k] <= m1[1]))
            ov2 = ((a2s[:k] <= m2[0]) & (m2[0] <= a2e[:k])) | (
                (m2[0] <= a2s[:k]) & (a2s[:k] <= m2[1]))
            ov3 = ((a3s[:k] <= m3[0]) & (m3[0] <= a3e[:k])) | (
                (m3[0] <= a3s[:k]) & (a3s[:k] <= m3[1]))
            clash = (
                (arel[:k] == item[3]) & ov1 & ov2
                & (aq[:k] == item[6]) & ov3
            ).any()
            if clash:
                continue
        kept.append(item)
        a1s[k] = m1[0]; a1e[k] = m1[1]  # noqa: E702
        a2s[k] = m2[0]; a2e[k] = m2[1]  # noqa: E702
        a3s[k] = m3[0]; a3e[k] = m3[1]  # noqa: E702
        arel[k] = item[3]; aq[k] = item[6]  # noqa: E702
        k += 1

    out = []
    for score, m1, m2, pred, q_score, m3, q_pred in kept:
        out.append(
            (m1[0], m1[1], m2[0], m2[1], label_list[pred],
             m3[0], m3[1], label_list[q_pred], score, q_score))
    return out


# i<j<k anchor index triples per entity count, cached: the meshgrid +
# mask build was ~25% of a small sentence's decode and is a pure function
# of E (bounded by max mentions per sentence, so the cache stays tiny)
_ANCHOR_CACHE: dict[int, tuple] = {}


def _anchor_triples(e: int) -> tuple:
    got = _ANCHOR_CACHE.get(e)
    if got is None:
        idx = np.arange(e, dtype=np.int64)
        ii, jj, kk = np.meshgrid(idx, idx, idx, indexing="ij")
        sel = (ii < jj) & (jj < kk)
        got = _ANCHOR_CACHE[e] = (ii[sel], jj[sel], kk[sel])
    return got


def decode_sentence_fast(
    entities: np.ndarray,
    cand: np.ndarray,
    rel_lg: np.ndarray,
    q_lg: np.ndarray,
    space: LabelSpace,
    strict: bool = True,
) -> list[tuple]:
    """Vectorized decode for the full-grid case (cand covers all E^3
    orderings and entity spans are distinct).  Anchors are exactly the
    i<j<k index triples in lexicographic order (= first-encountered
    orientation under the reference's insertion-ordered dict walk); the
    direction normalization runs as numpy masks.  Bit-identical to
    :func:`decode_sentence_arrays` (tests assert)."""
    e = entities.shape[0]
    if e < 3 or cand.shape[0] != e * e * e:
        return decode_sentence_arrays(
            entities, cand, rel_lg, q_lg, space, same_entity=False,
            strict=strict)
    v, qc, _present = ensemble_tensors(e, cand, rel_lg, q_lg, space)

    ii, jj, kk = _anchor_triples(e)  # lexicographic anchor order

    pred = np.argmax(v[ii, jj, kk], axis=-1)
    q_pred = np.argmax(qc[ii, jj, kk], axis=-1)
    keep = (pred > 0) & (q_pred > 0)
    ii, jj, kk = ii[keep], jj[keep], kk[keep]
    pred, q_pred = pred[keep], q_pred[keep]
    if pred.size == 0:
        return []

    a1, a2, a3 = ii.copy(), jj.copy(), kk.copy()
    num_label = space.num_label
    is_k = space.is_k()
    is_r = space.is_r()

    m = pred >= num_label
    pred[m] = pred[m] - num_label + 1
    a1[m], a2[m] = a2[m], a1[m].copy()

    m = q_pred >= num_label
    t1, t2, t3 = a3[m], a1[m].copy(), a2[m].copy()
    a1[m], a2[m], a3[m] = t1, t2, t3
    tmp = pred[m].copy()
    pred[m] = q_pred[m] - num_label + 1
    q_pred[m] = tmp

    m = is_k[pred]
    drop = m & is_k[q_pred]
    m = m & ~drop
    a2[m], a3[m] = a3[m], a2[m].copy()
    tmp = pred[m].copy()
    pred[m] = q_pred[m]
    q_pred[m] = tmp

    drop = drop | (is_r[pred] & is_r[q_pred])
    ok = ~drop
    if not ok.any():
        return []

    sc = v[ii, jj, kk, pred]
    qsc = qc[ii, jj, kk, q_pred]

    spans = [tuple(int(x) for x in row) for row in entities]
    results = [
        (float(sc[t]), spans[a1[t]], spans[a2[t]], int(pred[t]),
         float(qsc[t]), spans[a3[t]], int(q_pred[t]))
        for t in np.nonzero(ok)[0]
    ]
    return _nms(results, space.label_list)


def decode_sentences_batch(
    items: list,           # [(entities, cand, lo, hi), ...] per sentence
    rel_all: np.ndarray,   # (sum N_i, C) logits, sentence-sliced by lo:hi
    q_all: np.ndarray,
    space: LabelSpace,
    same_entity: bool = False,
    strict: bool = True,
    unidirect: bool = False,
) -> list:
    """Batched twin of :func:`decode_sentence` over many sentences (r7).

    Sentences eligible for the vectorized fast path (full E^3 candidate
    grid, same_entity off) are grouped by entity count and decoded as
    ONE (B, E, E, E, C) tensor pipeline: in the full-grid case the
    candidate rows are exactly lexicographic (i, j, k) order, so the
    per-sentence scatter is a pure reshape, and every ensemble addition,
    argmax, direction-normalization mask and score gather is the same
    elementwise operation decode_sentence_fast performs — just across a
    leading batch axis, so the ~30 numpy dispatches per sentence
    amortize over the group.  np.nonzero flattens row-major, so within
    each sentence candidate order (and therefore NMS input order) is
    identical to the per-sentence path; outputs are bit-identical
    (tests/test_decode_parity.py::test_batched_decode_matches).
    Ineligible sentences fall back to the per-sentence decoders.
    Returns one preds list per input item, in input order.
    """
    out: list = [None] * len(items)
    if same_entity or unidirect:
        for ix, (ents, cand, lo, hi) in enumerate(items):
            out[ix] = decode_sentence(
                ents, cand, rel_all[lo:hi], q_all[lo:hi], space,
                same_entity, strict, unidirect)
        return out
    groups: dict[int, list[int]] = {}
    for ix, (ents, cand, lo, hi) in enumerate(items):
        e = ents.shape[0]
        if e >= 3 and cand.shape[0] == e * e * e:
            groups.setdefault(e, []).append(ix)
        else:
            out[ix] = decode_sentence_arrays(
                ents, cand, rel_all[lo:hi], q_all[lo:hi], space,
                same_entity=False, strict=strict)

    c = space.num_classes
    sw = space.swap_index()
    num_label = space.num_label
    is_k = space.is_k()
    is_r = space.is_r()
    label_list = space.label_list

    for e, idxs in groups.items():
        nb = len(idxs)
        e3 = e * e * e
        s = np.empty((nb, e3, c), dtype=np.float64)
        q = np.empty((nb, e3, c), dtype=np.float64)
        for b, ix in enumerate(idxs):
            _ents, _cand, lo, hi = items[ix]
            s[b] = rel_all[lo:hi]
            q[b] = q_all[lo:hi]
        s = s.reshape(nb, e, e, e, c)
        q = q.reshape(nb, e, e, e, c)

        def t(x: np.ndarray, perm: tuple[int, int, int]) -> np.ndarray:
            return np.transpose(
                x, (0,) + tuple(p + 1 for p in perm) + (4,))

        # identical term order to ensemble_tensors (bit parity)
        v = s.copy()
        v += t(s, (1, 0, 2))[..., sw]
        v += t(q, (0, 2, 1))
        v += t(q, (2, 0, 1))
        v += t(q, (1, 2, 0))[..., sw]
        v += t(s, (2, 1, 0))
        qc = q.copy()
        qc += t(q, (1, 0, 2))
        qc += t(s, (0, 2, 1))
        qc += t(s, (2, 0, 1))[..., sw]
        qc += t(s, (1, 2, 0))
        qc += t(q, (2, 1, 0))[..., sw]

        ii, jj, kk = _anchor_triples(e)
        pred = np.argmax(v[:, ii, jj, kk, :], axis=-1)
        q_pred = np.argmax(qc[:, ii, jj, kk, :], axis=-1)
        keep = (pred > 0) & (q_pred > 0)
        bs, asel = np.nonzero(keep)  # row-major: per-sentence order kept
        if bs.size == 0:
            for ix in idxs:
                out[ix] = []
            continue
        a1 = ii[asel].copy()
        a2 = jj[asel].copy()
        a3 = kk[asel].copy()
        pr = pred[bs, asel]
        qp = q_pred[bs, asel]

        m = pr >= num_label
        pr[m] = pr[m] - num_label + 1
        a1[m], a2[m] = a2[m], a1[m].copy()

        m = qp >= num_label
        t1, t2, t3 = a3[m], a1[m].copy(), a2[m].copy()
        a1[m], a2[m], a3[m] = t1, t2, t3
        tmp = pr[m].copy()
        pr[m] = qp[m] - num_label + 1
        qp[m] = tmp

        m = is_k[pr]
        drop = m & is_k[qp]
        m = m & ~drop
        a2[m], a3[m] = a3[m], a2[m].copy()
        tmp = pr[m].copy()
        pr[m] = qp[m]
        qp[m] = tmp

        drop = drop | (is_r[pr] & is_r[qp])
        okidx = np.nonzero(~drop)[0]

        iia, jja, kka = ii[asel], jj[asel], kk[asel]
        sc = v[bs, iia, jja, kka, pr]
        qsc = qc[bs, iia, jja, kka, qp]

        bs_ok = bs[okidx]
        for b, ix in enumerate(idxs):
            lo_b = np.searchsorted(bs_ok, b, side="left")
            hi_b = np.searchsorted(bs_ok, b, side="right")
            if lo_b == hi_b:
                out[ix] = []
                continue
            spans = [tuple(int(x) for x in row) for row in items[ix][0]]
            results = [
                (float(sc[w]), spans[a1[w]], spans[a2[w]], int(pr[w]),
                 float(qsc[w]), spans[a3[w]], int(qp[w]))
                for w in okidx[lo_b:hi_b]
            ]
            out[ix] = _nms(results, label_list)
    return out


def decode_sentence_arrays(
    entities: np.ndarray,  # (E, 2) int64 spans in sentence order
    cand: np.ndarray,      # (N, 10) int64, enumeration order
    rel_lg: np.ndarray,    # (N, C) float64
    q_lg: np.ndarray,      # (N, C) float64
    space: LabelSpace,
    same_entity: bool = False,
    strict: bool = True,
) -> list[tuple]:
    """Decode one sentence.  Returns output_preds rows in emission order:
    (m1s, m1e, m2s, m2e, rel_name, m3s, m3e, qual_name, rel_score, q_score).
    """
    e = entities.shape[0]
    if e == 0 or cand.shape[0] == 0:
        return []
    v, qc, present = ensemble_tensors(e, cand, rel_lg, q_lg, space)

    pv = np.argmax(v, axis=-1)
    pq = np.argmax(qc, axis=-1)

    label_list = space.label_list
    num_label = space.num_label
    n_sym = 1
    is_k = space.is_k()
    is_r = space.is_r()

    spans = [tuple(int(x) for x in row) for row in entities]
    visited = np.zeros((e, e, e), dtype=bool)
    results: list[tuple] = []  # (score, m1, m2, rel_id, q_score, m3, q_id)

    perms = ((1, 0, 2), (0, 2, 1), (1, 2, 0), (2, 0, 1), (2, 1, 0))
    for row in cand:
        i, j, k = int(row[1]), int(row[2]), int(row[3])
        if visited[i, j, k]:
            continue
        visited[i, j, k] = True
        m1, m2, m3 = spans[i], spans[j], spans[k]
        if not same_entity and (m1 == m2 or m2 == m3 or m3 == m1):
            continue
        idx = (i, j, k)
        ok = True
        for p in perms:
            a, b, c_ = idx[p[0]], idx[p[1]], idx[p[2]]
            if not present[a, b, c_]:
                ok = False
            visited[a, b, c_] = True
        if not ok:
            if strict:
                raise MissingOrderingError(
                    f"triple {m1},{m2},{m3} missing an ordering (pruned span)")
            continue

        pred = int(pv[i, j, k])
        q_pred = int(pq[i, j, k])
        if pred > 0 and q_pred > 0:
            if pred >= num_label:
                pred = pred - num_label + n_sym
                m1, m2 = m2, m1
            if q_pred >= num_label:
                m1, m2, m3 = m3, m1, m2
                pred, q_pred = q_pred - num_label + n_sym, pred
            if is_k[pred]:
                if is_k[q_pred]:
                    continue
                m2, m3 = m3, m2
                pred, q_pred = q_pred, pred
            if is_r[pred] and is_r[q_pred]:
                continue
            # run_re.py:1417-1418 — scores index the BASE-orientation ensemble
            # vectors at the direction-NORMALIZED labels, not at the argmax
            results.append(
                (float(v[i, j, k, pred]), m1, m2, pred,
                 float(qc[i, j, k, q_pred]), m3, q_pred))

    return _nms(results, label_list)


def decode_sentence_unidirect(
    entities: np.ndarray,
    cand: np.ndarray,
    rel_lg: np.ndarray,    # (N, C) float64
    q_lg: np.ndarray,      # (N, C) float64
    space: LabelSpace,
    same_entity: bool = False,
) -> list[tuple]:
    """No-ensemble decode for the ``--eval_unidirect`` flag — GRAFT-DEFINED
    semantics, not a reference-parity claim: in the reference the flag
    SKIPS the whole decode (the else-branch at run_re.py:2177-2266 is
    fully commented out; what survives is a pair-only decode with no
    qualifier or direction normalization), so the reference emits NO
    predictions under it.  This graft gives the flag the semantics its
    name advertises: every candidate ordering decodes its own raw logits
    independently (no 6-permutation ensemble, no visited-set collapse, so
    all 6 orderings of a triple are live candidates), with the same
    direction normalization and NMS as the ensembled path.  Parity-tested
    against this repo's own oracle transcription only.  Vectorized over
    the candidate rows in enumeration order (= the oracle dict's
    insertion order)."""
    e = entities.shape[0]
    n = cand.shape[0]
    if e == 0 or n == 0:
        return []
    ii, jj, kk = cand[:, 1], cand[:, 2], cand[:, 3]
    pred = np.argmax(rel_lg, axis=-1)
    q_pred = np.argmax(q_lg, axis=-1)

    spans = [tuple(int(x) for x in row) for row in entities]
    keep = (pred > 0) & (q_pred > 0)
    if not same_entity:
        sp = np.asarray(spans, dtype=np.int64)
        keep &= (
            (sp[ii] != sp[jj]).any(axis=1)
            & (sp[jj] != sp[kk]).any(axis=1)
            & (sp[kk] != sp[ii]).any(axis=1))
    rows = np.nonzero(keep)[0]
    if rows.size == 0:
        return []
    a1, a2, a3 = ii[rows].copy(), jj[rows].copy(), kk[rows].copy()
    pred, q_pred = pred[rows].copy(), q_pred[rows].copy()

    num_label = space.num_label
    is_k = space.is_k()
    is_r = space.is_r()

    m = pred >= num_label
    pred[m] = pred[m] - num_label + 1
    a1[m], a2[m] = a2[m], a1[m].copy()

    m = q_pred >= num_label
    t1, t2, t3 = a3[m], a1[m].copy(), a2[m].copy()
    a1[m], a2[m], a3[m] = t1, t2, t3
    tmp = pred[m].copy()
    pred[m] = q_pred[m] - num_label + 1
    q_pred[m] = tmp

    m = is_k[pred]
    drop = m & is_k[q_pred]
    m = m & ~drop
    a2[m], a3[m] = a3[m], a2[m].copy()
    tmp = pred[m].copy()
    pred[m] = q_pred[m]
    q_pred[m] = tmp

    drop = drop | (is_r[pred] & is_r[q_pred])
    ok = ~drop
    if not ok.any():
        return []

    sc = rel_lg[rows, pred]
    qsc = q_lg[rows, q_pred]
    results = [
        (float(sc[t]), spans[a1[t]], spans[a2[t]], int(pred[t]),
         float(qsc[t]), spans[a3[t]], int(q_pred[t]))
        for t in np.nonzero(ok)[0]
    ]
    return _nms(results, space.label_list)


def decode_sentence(
    entities: np.ndarray,
    cand: np.ndarray,
    rel_lg: np.ndarray,
    q_lg: np.ndarray,
    space: LabelSpace,
    same_entity: bool = False,
    strict: bool = True,
    unidirect: bool = False,
) -> list[tuple]:
    """Dispatcher: vectorized fast path when its preconditions hold
    (same_entity off + full candidate grid), reference loop otherwise;
    ``unidirect=True`` selects the no-ensemble ablation decode."""
    if unidirect:
        return decode_sentence_unidirect(
            entities, cand, rel_lg, q_lg, space, same_entity)
    if not same_entity:
        return decode_sentence_fast(entities, cand, rel_lg, q_lg, space, strict)
    return decode_sentence_arrays(
        entities, cand, rel_lg, q_lg, space, same_entity, strict)
