"""Label vocabulary and the bidirectional label-space algebra.

Reference semantics (/root/reference/run_re.py:121-131):

* hyperrelation: ``label_list = ['NIL'] + L + [x+'-1' for x in L]`` where
  ``L = stable_unique(rel_labels + qual_labels)``; the qualifier label list is
  identical.  ``num_label = (len(label_list) + len(sym_labels)) / 2`` with
  ``sym_labels = ['NIL']`` (run_re.py:1184-1185), i.e. ``d + 1`` for
  ``d = len(L)``.  Index ``i`` in ``[1, d]`` is the forward label ``L[i-1]``;
  index ``num_label + i - 1`` is its inverse ``L[i-1] + '-1'``.

* The 6-permutation ensemble swaps the forward/inverse halves of a logit
  vector: ``swap(v) = v[:1] + v[num_label:] + v[1:num_label]``
  (run_re.py:1322, 1352, 1366, 1380).  ``swap_index()`` returns the numpy
  fancy-index that performs this permutation vectorized.

Relation names carry a ``[r]`` prefix and qualifier names ``[k]`` in the
shipped reference data (label.json; decode tests these prefixes at
run_re.py:1406-1415).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


def stable_unique(xs: list[str]) -> list[str]:
    """Order-preserving dedup — reference ``sset`` (run_re.py:80-85)."""
    seen: set[str] = set()
    out: list[str] = []
    for x in xs:
        if x not in seen:
            seen.add(x)
            out.append(x)
    return out


@dataclass(frozen=True)
class LabelSpace:
    """Frozen bidirectional label space for the hyperrelation schema."""

    base_labels: tuple[str, ...]  # L — stable-unique union of rel + qual names

    @staticmethod
    def build(rel_labels: list[str], qual_labels: list[str]) -> "LabelSpace":
        return LabelSpace(tuple(stable_unique(list(rel_labels) + list(qual_labels))))

    @property
    def d(self) -> int:
        return len(self.base_labels)

    @property
    def label_list(self) -> list[str]:
        l = list(self.base_labels)
        return ["NIL"] + l + [x + "-1" for x in l]

    @property
    def num_classes(self) -> int:
        return 2 * self.d + 1

    @property
    def num_label(self) -> int:
        # (len(label_list) + len(sym_labels)) // 2 with sym_labels == ['NIL']
        return self.d + 1

    def label_map(self) -> dict[str, int]:
        return {lab: i for i, lab in enumerate(self.label_list)}

    def swap_index(self) -> np.ndarray:
        """Fancy-index implementing ``v[:1] + v[num:] + v[1:num]``."""
        n = self.num_label
        c = self.num_classes
        return np.concatenate(
            [np.arange(1, dtype=np.int64), np.arange(n, c, dtype=np.int64),
             np.arange(1, n, dtype=np.int64)]
        )

    def is_k(self) -> np.ndarray:
        """Boolean mask over class ids whose name starts with '[k]'."""
        return np.array([lab.startswith("[k]") for lab in self.label_list])

    def is_r(self) -> np.ndarray:
        return np.array([lab.startswith("[r]") for lab in self.label_list])


def make_synthetic_labels(n_rel: int, n_qual: int) -> tuple[list[str], list[str]]:
    """Small deterministic vocab mirroring the reference naming scheme."""
    rels = [f"[r]rel_{i}" for i in range(n_rel)]
    quals = [f"[k]qual_{i}" for i in range(n_qual)]
    return rels, quals
