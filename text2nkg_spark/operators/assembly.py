"""T3 — per-conversation document assembly over transcript turns.

The reference consumes pre-assembled JSONL documents (run_re.py:251-268); in
the transcript graft a "document" is a conversation and a "sentence" is a
turn.  Assembly is pure declarative SQL: ``collect_list(struct(...))`` per
``conv_id`` with an explicit ``sort_array`` for a stable turn order — never
rely on ``collect_list`` input order, which is partition-dependent.

Scale notes: one shuffle on ``conv_id`` (unavoidable for grouping);
map-side partial aggregation applies; AQE coalesces small post-shuffle
partitions.  Long conversations stay well under task memory (10^4 turns x
~1 KB each); truly pathological conversations would be length-capped
upstream, not here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def assemble_documents(turns: DataFrame) -> DataFrame:
    """turns(conv_id, turn_idx, role, text, tool, ts) -> one row per conv.

    Output: conv_id, n_turns, turns: array<struct<turn_idx,role,text,tool,ts>>
    sorted by (turn_idx), doc_text = turn texts joined in order.
    """
    assembled = (
        turns.groupBy("conv_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("turn_idx", "role", "text", "tool", "ts"))
            ).alias("turns")
        )
        .withColumn("n_turns", F.size("turns"))
        .withColumn(
            "doc_text",
            F.array_join(F.transform("turns", lambda t: t["text"]), " "),
        )
    )
    return assembled


def explode_documents(docs: DataFrame) -> DataFrame:
    """Inverse of assembly — used by the per-turn text-equality invariant."""
    return docs.select(
        "conv_id", F.explode("turns").alias("t")
    ).select(
        "conv_id",
        F.col("t.turn_idx").alias("turn_idx"),
        F.col("t.role").alias("role"),
        F.col("t.text").alias("text"),
        F.col("t.tool").alias("tool"),
        F.col("t.ts").alias("ts"),
    )


def turn_equality_violations(turns: DataFrame, docs: DataFrame) -> DataFrame:
    """Rows where round-tripped turn text differs from the source table.

    The BASELINE invariant: per-turn text equality under stable turn
    ordering.  Implemented as a full outer join on (conv_id, turn_idx) with
    a null-safe text comparison; empty result == invariant holds.
    """
    src = turns.select("conv_id", "turn_idx", F.col("text").alias("src_text"))
    rt = explode_documents(docs).select(
        "conv_id", "turn_idx", F.col("text").alias("rt_text")
    )
    joined = src.join(rt, ["conv_id", "turn_idx"], "full_outer")
    return joined.where(~F.col("src_text").eqNullSafe(F.col("rt_text")))
