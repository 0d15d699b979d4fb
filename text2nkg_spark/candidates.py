"""Span-triple candidate enumeration (C3, run_re.py:464-557) — pure numpy.

The enumeration ORDER is semantically significant: the reference's decode
iterates the score dict in insertion order (run_re.py:1294-1297), so which of
the 6 orientations of an unordered span triple anchors the ensemble, and the
NMS stable-sort tie-break, both depend on it.  Order is
(subject, object, qualifier) nested loops over the sentence entity list
(run_re.py:466, 493, 521) — we materialize it as
``cand_idx = (i * E + j) * E + k`` over entity positions.

Pruning reproduces the reference's subword-window arithmetic under the
identity tokenizer (1 token == 1 subword, single-sentence window,
doc_offset == 0):

* subject dropped if ``sub_end + 3 >= max_seq_length - 1``
  (markers shift the subject end by 2: run_re.py:482-483, skip at 490).
* object/qualifier dropped if its marker-shifted right position
  ``>= max_seq_length - 1`` (run_re.py:516-517, 544-545); the shift adds 1
  for each of the subject's two markers the span end sits at/after
  (run_re.py:509-512, 537-540).
"""

from __future__ import annotations

import numpy as np


def shifted_right(end: np.ndarray, sub_s: int, sub_e: int) -> np.ndarray:
    """Marker-shifted right position of a span end (identity tokenizer)."""
    right = end + 1
    right = right + (end >= sub_s).astype(np.int64)
    right = right + (end > sub_e).astype(np.int64)
    return right


def enumerate_triples(
    entities: np.ndarray,  # (E, 2) int64 spans, sentence order
    max_seq_length: int,
) -> np.ndarray:
    """Returns (N, 9) int64 rows:
    [cand_idx, i, j, k, m1s, m1e, m2s, m2e, m3s, ...] — actually
    [cand_idx, i, j, k] + m1(2) + m2(2) + m3(2) → width 10.

    Rows appear in exact reference enumeration order with pruned
    subjects/objects/qualifiers removed.
    """
    e = entities.shape[0]
    if e == 0:
        return np.empty((0, 10), dtype=np.int64)
    starts = entities[:, 0]
    ends = entities[:, 1]

    keep_sub = (ends + 3) < (max_seq_length - 1)

    # fast path — nothing pruned (the overwhelmingly common case): the
    # full E^3 cross product in one vectorized shot, already in
    # (i, j, k)-lexicographic enumeration order
    if bool(keep_sub.all()) and bool(
        ((ends + 3) < (max_seq_length - 1)).all()
    ):
        idx = np.arange(e, dtype=np.int64)
        ii = np.repeat(idx, e * e)
        jj = np.tile(np.repeat(idx, e), e)
        kk = np.tile(idx, e * e)
        cand = (ii * e + jj) * e + kk
        return np.column_stack(
            [cand, ii, jj, kk,
             starts[ii], ends[ii], starts[jj], ends[jj], starts[kk], ends[kk]])

    rows: list[np.ndarray] = []
    for i in range(e):
        if not keep_sub[i]:
            continue
        right = shifted_right(ends, int(starts[i]), int(ends[i]))
        keep_oq = right < (max_seq_length - 1)
        js = np.nonzero(keep_oq)[0]
        if js.size == 0:
            continue
        # object x qualifier cross product, both restricted to keep_oq,
        # in entity-list order (run_re.py:493, 521)
        jj = np.repeat(js, js.size)
        kk = np.tile(js, js.size)
        ii = np.full(jj.size, i, dtype=np.int64)
        cand = (ii * e + jj) * e + kk
        block = np.column_stack(
            [cand, ii, jj, kk,
             starts[jj - jj + i], ends[jj - jj + i],  # m1 = subject span
             starts[jj], ends[jj],
             starts[kk], ends[kk]]
        )
        rows.append(block)
    if not rows:
        return np.empty((0, 10), dtype=np.int64)
    return np.concatenate(rows, axis=0)
