"""Skew-mitigation join utilities.

AQE's skew-join split works on SHUFFLE joins whose skewed partitions it
can subdivide, but it cannot split a single hot KEY — every row of one
key hashes to one reducer.  ``salted_equi_join`` is the classic manual
remedy: fan the hot side's rows across ``n_salts`` sub-keys
(deterministically, from the row content) and replicate the other side
once per salt, turning one unsplittable reducer into ``n_salts``
schedulable ones.  Result rows are EXACTLY those of the plain equi-join —
the salt participates only in routing — which is what makes the operator
driver-oracle-checkable against the unsalted SQL join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_equi_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    n_salts: int = 8,
    salt_src: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``skewed`` with ``other`` on ``key``, salted ``n_salts``
    ways.

    The salt on the skewed side derives deterministically from
    ``salt_src`` — a REQUIRED column whose values spread within each key
    (a line number, an event id); there is no generic default because
    hashing "all columns" silently breaks when callers add one.  A NULL
    ``salt_src`` value salts to 0 (crc32 of NULL is NULL — without the
    coalesce such a row would silently vanish from an inner join even
    when its key matches; ADVICE r6).  ``other`` is replicated
    ``n_salts`` times via an inline explode.  Replication cost is
    |other| * n_salts — use for dimension-vs-fact skew, not for two huge
    skewed sides (there, pre-aggregate or isolate the hot keys first).

    ``how`` is restricted to inner/left: for right/full joins the
    unmatched ``other`` rows would surface once per salt replica
    (n_salts duplicates), violating the plain-join contract.
    """
    if salt_src is None:
        raise ValueError(
            "salt_src is required: a skewed-side column whose values "
            "spread within each key (e.g. a line number or event id)")
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_equi_join supports how='inner'/'left' only, got "
            f"{how!r}: right/full would emit unmatched replicated-side "
            "rows once per salt")
    s = skewed.withColumn(
        "_salt", (F.coalesce(F.crc32(F.col(salt_src).cast("string")),
                             F.lit(0))
                  % n_salts).cast("int"))
    o = other.withColumn(
        "_salt", F.explode(F.array(
            *[F.lit(i).cast("int") for i in range(n_salts)])))
    return s.join(o, [key, "_salt"], how).drop("_salt")
