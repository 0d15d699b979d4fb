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

    if not results:
        return []

    # stable sort by -score; ties keep candidate enumeration order
    scores = np.array([r[0] for r in results])
    order = np.argsort(-scores, kind="stable")

    def is_overlap(a: tuple, b: tuple) -> bool:
        return (b[0] <= a[0] <= b[1]) or (a[0] <= b[0] <= a[1])

    kept: list[tuple] = []
    for oi in order:
        item = results[int(oi)]
        clash = False
        for x in kept:
            if (item[3] == x[3] and is_overlap(item[1], x[1])
                    and is_overlap(item[2], x[2]) and item[6] == x[6]
                    and is_overlap(item[5], x[5])):
                clash = True
                break
        if not clash:
            kept.append(item)

    out = []
    for score, m1, m2, pred, q_score, m3, q_pred in kept:
        out.append(
            (m1[0], m1[1], m2[0], m2[1], label_list[pred],
             m3[0], m3[1], label_list[q_pred], score, q_score))
    return out
