"""Graph-analytics operators over the materialized NKG — the queries a
consumer runs AFTER extraction (SURVEY.md §2.7 output tables): entity
degree profiles and mention co-occurrence edges.

Both are pure declarative aggregations/joins (codegen'd, broadcast-free),
so Catalyst handles pushdown and AQE handles skew; the co-occurrence
self-join is bounded per conversation and capped explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def entity_degree(facts: DataFrame,
                  subj_col: str = "subj",
                  rel_col: str = "rel",
                  obj_col: str = "obj") -> DataFrame:
    """Per-subject degree profile over an extracted facts table:
    ``(subj, n_facts, n_rels, n_objs)``.

    One hash aggregate (map-side partials apply); distinct counts run as
    Spark's expand+two-phase agg — no driver collection, scale-safe.
    """
    return facts.groupBy(F.col(subj_col).alias("subj")).agg(
        F.count(F.lit(1)).cast("long").alias("n_facts"),
        F.countDistinct(rel_col).cast("long").alias("n_rels"),
        F.countDistinct(obj_col).cast("long").alias("n_objs"),
    )


def mention_cooccurrence(
    mentions: DataFrame,
    group_col: str = "conv_id",
    surface_col: str = "surface",
    max_group_width: int = 256,
) -> DataFrame:
    """Co-occurrence edges between mention surfaces appearing in the same
    ``group_col`` (conversation): ``(surface_a, surface_b, n_groups)``
    with ``surface_a < surface_b``.

    Shape: distinct (group, surface) first — the join input is one row per
    surface per group, NOT per mention — then an equi-self-join on the
    group key.  The per-group width is capped at ``max_group_width``
    (deterministically, by surface order) so one mega-conversation cannot
    schedule an O(W^2) block; the cap is the same guard every LSH pair
    generator here uses (operators/dedup.py ``cap_bucket_width``).
    """
    gs = (
        mentions.select(F.col(group_col).alias("g"),
                        F.col(surface_col).alias("s"))
        .distinct()
    )
    w = Window.partitionBy("g").orderBy("s")
    gs = gs.withColumn("_rn", F.row_number().over(w)).where(
        F.col("_rn") <= max_group_width).drop("_rn")
    a = gs.select(F.col("g"), F.col("s").alias("surface_a"))
    b = gs.select(F.col("g"), F.col("s").alias("surface_b"))
    return (
        a.join(b, "g")
        .where(F.col("surface_a") < F.col("surface_b"))
        .groupBy("surface_a", "surface_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_groups"))
    )


def cooccurrence_degree(edges: DataFrame) -> DataFrame:
    """Per-surface degree profile over the undirected co-occurrence edge
    list from ``mention_cooccurrence``: ``(surface, degree,
    n_cooccurrences)`` where degree counts distinct neighbors and
    n_cooccurrences sums the edge weights.  One union + one hash agg."""
    # explode, not unionAll: a union gives the (expensive) edges lineage
    # two consumers and Spark re-executes it per branch — one exploding
    # consumer keeps the mention fold + self-join single-pass
    und = edges.select(
        F.explode(F.array(
            F.struct(F.col("surface_a").alias("surface"),
                     F.col("n_groups").alias("n_groups")),
            F.struct(F.col("surface_b").alias("surface"),
                     F.col("n_groups").alias("n_groups")),
        )).alias("_e")
    ).select("_e.surface", "_e.n_groups")
    return und.groupBy("surface").agg(
        F.count(F.lit(1)).cast("long").alias("degree"),
        F.sum("n_groups").cast("long").alias("n_cooccurrences"),
    )
