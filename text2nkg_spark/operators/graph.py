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
    local_threshold: int = 20_000,
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

    Size-adaptive (r7): at or below ``local_threshold`` distinct
    (group, surface) rows the capped pair expansion + count runs
    driver-side from one bounded collect — identical sort/cap/pair/count
    semantics (parity-tested), where the distributed shape costs ~4
    exchanges of fixed overhead on toy groups.  The Python pair loop is
    bounded by ``local_threshold/max_group_width`` groups at
    ``max_group_width^2/2`` pairs each.  ``local_threshold=0`` forces
    the distributed path (EAGER probe otherwise — one bounded Spark job
    at call time, the connected_components contract).
    """
    gs = (
        mentions.select(F.col(group_col).alias("g"),
                        F.col(surface_col).alias("s"))
        .distinct()
    )
    if local_threshold > 0:
        head = gs.limit(local_threshold + 1).collect()
        if len(head) <= local_threshold:
            groups: dict = {}
            for r in head:
                groups.setdefault(r[0], []).append(r[1])
            counts: dict = {}
            for members in groups.values():
                # Spark's asc sort is nulls-first; a NULL surface never
                # passes surface_a < surface_b so it pairs with nothing
                members.sort(key=lambda x: (x is not None, x))
                kept = members[:max_group_width]
                for i, a in enumerate(kept):
                    if a is None:
                        continue
                    for b in kept[i + 1:]:
                        counts[(a, b)] = counts.get((a, b), 0) + 1
            s_type = dict(gs.dtypes)["s"]
            rows = [(a, b, n) for (a, b), n in counts.items()]
            return mentions.sparkSession.createDataFrame(
                rows or [],
                f"surface_a {s_type}, surface_b {s_type}, n_groups long")
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


# edge count at or below which the iterative operators run their exact
# driver-side twin from ONE bounded collect (the same size-adaptivity as
# canonicalize.connected_components): each distributed star/peel/power
# round costs several fixed-overhead Spark jobs — pagerank at 3 iters is
# ~19 jobs, kcore ~20 — which dwarfs graphs of a few thousand edges.
# 10k edges also keeps the local pagerank inside the distributed path's
# int64 envelope (in-sums <= N * scale; python ints never wrap, so the
# twin must only run where the distributed path wouldn't wrap either).
_LOCAL_EDGE_THRESHOLD = 10_000


def _collect_small_edges(edges: DataFrame, cols: list, threshold: int):
    """limit(threshold+1) probe: the rows when the graph is small, else
    None.  EAGER — runs one bounded Spark job at call time (the same
    call-time-execution contract as connected_components)."""
    if threshold <= 0:
        return None
    head = edges.select(*cols).limit(threshold + 1).collect()
    return head if len(head) <= threshold else None


def pagerank_iterations(
    edges: DataFrame,
    iters: int = 3,
    scale: int = 10**12,
    damp_num: int = 85,
    damp_den: int = 100,
    a_col: str = "surface_a",
    b_col: str = "surface_b",
    w_col: str = "n_groups",
    local_threshold: int = _LOCAL_EDGE_THRESHOLD,
) -> DataFrame:
    """Weighted PageRank power iterations over an undirected edge list,
    in ALL-INTEGER arithmetic so every rank is bit-identical across
    engines (the DuckDB oracle mirrors the recurrence with ``//``).

    Recurrence (graft-defined, exactly specified):

        r_0(v)     = scale
        out(u)     = sum of w over u's incident edges (strength)
        contrib    = (r_i(u) DIV out(u)) * w(u, v)     per directed edge
        r_{i+1}(v) = ((damp_den - damp_num) * scale) DIV damp_den
                     + (damp_num * sum_in(contrib)) DIV damp_den

    Integer division BEFORE the weight multiply keeps every per-edge
    contribution <= r_i(u), so contributions never overflow regardless of
    edge weight.  Per-node in-sums are bounded by the total rank mass
    N * scale, and the update multiplies the in-sum by ``damp_num``
    BEFORE dividing, so int64 safety requires
    ``scale <= 9.2e18 / (damp_num * N)`` — the default 1e12 with
    damp_num=85 is safe to ~108k nodes (ADVICE r6 corrected the earlier
    9-million-node claim); shrink ``scale`` for larger graphs — ranks
    only need enough integer headroom to separate, not absolute value.

    EAGER: the loop-invariant adjacency (edges + strengths) is
    localCheckpoint-ed once at call time — otherwise iteration i's plan
    re-executes the full upstream edge pipeline i times (the mention
    fold + self-join here is the expensive part, not the rank joins).
    Each iteration is one keyed equi-join + one hash aggregate —
    shuffle-partitioned by node id, no driver collection, scale-safe.

    Size-adaptive (like canonicalize.connected_components): at or below
    ``local_threshold`` edges the whole recurrence runs driver-side from
    one bounded collect — identical integer arithmetic, so ranks are
    bit-identical to the distributed path (parity-tested); each
    distributed iteration otherwise costs ~6 fixed-overhead Spark jobs.
    ``local_threshold=0`` forces the distributed path.
    """
    small = _collect_small_edges(
        edges, [a_col, b_col, w_col], local_threshold)
    if small is not None:
        node_type = dict(edges.dtypes)[a_col]
        strength: dict = {}
        adj: list[tuple] = []
        for r in small:
            a, b, w = r[0], r[1], int(r[2])
            adj.append((a, b, w))
            adj.append((b, a, w))
            strength[a] = strength.get(a, 0) + w
            strength[b] = strength.get(b, 0) + w
        base = ((damp_den - damp_num) * scale) // damp_den
        ranks = {n: scale for n in strength}
        for _ in range(iters):
            in_sum: dict = {}
            for src, dst, w in adj:
                c = (ranks[src] // strength[src]) * w
                in_sum[dst] = in_sum.get(dst, 0) + c
            ranks = {
                n: base + (damp_num * in_sum.get(n, 0)) // damp_den
                for n in ranks}
        return edges.sparkSession.createDataFrame(
            list(ranks.items()) or [], f"node {node_type}, rank long")
    und = edges.select(
        F.explode(F.array(
            F.struct(F.col(a_col).alias("src"), F.col(b_col).alias("dst"),
                     F.col(w_col).alias("w")),
            F.struct(F.col(b_col).alias("src"), F.col(a_col).alias("dst"),
                     F.col(w_col).alias("w")),
        )).alias("_e")
    ).select("_e.src", "_e.dst", F.col("_e.w").cast("long").alias("w"))
    strength = und.groupBy("src").agg(F.sum("w").cast("long").alias("out_w"))
    adj = und.join(strength, "src").localCheckpoint()
    nodes = adj.select(F.col("src").alias("node")).distinct()
    base = ((damp_den - damp_num) * scale) // damp_den
    ranks = nodes.select("node", F.lit(scale).cast("long").alias("rank"))
    for _ in range(iters):
        contrib = adj.join(
            ranks.withColumnRenamed("node", "src"), "src"
        ).select(
            F.col("dst"),
            (F.expr("rank div out_w") * F.col("w")).alias("c"))
        in_sum = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        ranks = nodes.join(
            in_sum.withColumnRenamed("dst", "node"), "node", "left"
        ).select(
            "node",
            (F.lit(base).cast("long")
             + F.expr(f"({damp_num} * coalesce(s, 0L)) div {damp_den}"))
            .cast("long").alias("rank"))
    return ranks


def triangle_counts(
    edges: DataFrame,
    a_col: str = "surface_a",
    b_col: str = "surface_b",
    local_threshold: int = _LOCAL_EDGE_THRESHOLD,
) -> DataFrame:
    """Per-node triangle participation counts over an undirected edge
    list (``a < b`` per row, no duplicates): ``(node, n_triangles)``.

    Degree-oriented ("compact-forward") enumeration: every edge is
    oriented from its lower-(degree, node) endpoint to the higher one,
    so each triangle {a,b,c} materializes exactly once — as the wedge at
    its lowest-ranked vertex closed by the third oriented edge.  The
    wedge join fans out as sum(out-degree^2), and degree orientation
    bounds out-degree by O(sqrt(|E|)) — the standard trick that keeps a
    skewed hub (degree ~ millions) from scheduling a degree^2 block at
    100 TB.  Two equi-joins + one explode + one hash agg; no driver
    collection.  The rank is total (degree ties break on the node id),
    so the DuckDB oracle mirrors it exactly.

    EAGER: the input edge list is localCheckpoint-ed at call time — it
    feeds the degree aggregate AND the ranked join above the
    orientation, so the upstream edge pipeline (mention fold +
    self-join when fed from mention_cooccurrence) would otherwise
    re-execute 2-3x (ReusedExchange does not fire for this shape —
    same measurement as simhash_pairs / canonicalize).  The oriented
    list is checkpointed again because it feeds three join legs below.

    Size-adaptive: at or below ``local_threshold`` edges the identical
    compact-forward enumeration runs driver-side from one bounded
    collect (parity-tested vs the distributed path; the two-checkpoint
    three-join chain otherwise costs ~17 fixed-overhead Spark jobs on a
    toy graph).  ``local_threshold=0`` forces the distributed path.
    """
    small = _collect_small_edges(edges, [a_col, b_col], local_threshold)
    if small is not None:
        node_type = dict(edges.dtypes)[a_col]
        pairs = [(r[0], r[1]) for r in small]
        deg: dict = {}
        for a, b in pairs:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        oriented = []
        for a, b in pairs:
            da, db = deg[a], deg[b]
            if da < db or (da == db and a < b):
                oriented.append((a, b, db))
            else:
                oriented.append((b, a, da))
        # closer is a MULTISET (the distributed join would multiply
        # duplicate oriented rows), matched exactly
        closer: dict = {}
        for s, d, _dd in oriented:
            closer[(s, d)] = closer.get((s, d), 0) + 1
        nbrs: dict = {}
        for s, d, dd in oriented:
            nbrs.setdefault(s, []).append((d, dd))
        counts: dict = {}
        for s, lst in nbrs.items():
            for m, md in lst:
                for n, nd in lst:
                    if md < nd or (md == nd and m < n):
                        c = closer.get((m, n), 0)
                        if c:
                            for v in (s, m, n):
                                counts[v] = counts.get(v, 0) + c
        out_rows = list(counts.items())
        return edges.sparkSession.createDataFrame(
            out_rows or [], f"node {node_type}, n_triangles long")
    e = edges.select(
        F.col(a_col).alias("a"), F.col(b_col).alias("b")).localCheckpoint()
    deg = (
        e.select(F.explode(F.array("a", "b")).alias("node"))
        .groupBy("node").agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    ranked = (
        e.join(deg.withColumnRenamed("node", "a")
                  .withColumnRenamed("d", "da"), "a")
        .join(deg.withColumnRenamed("node", "b")
                 .withColumnRenamed("d", "db"), "b")
    )
    fwd = F.col("da") < F.col("db")
    tie = (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    oriented = ranked.select(
        F.when(fwd | tie, F.col("a")).otherwise(F.col("b")).alias("src"),
        F.when(fwd | tie, F.col("b")).otherwise(F.col("a")).alias("dst"),
        F.when(fwd | tie, F.col("db")).otherwise(F.col("da")).alias("dd"),
    ).localCheckpoint()
    e1 = oriented.select(F.col("src"), F.col("dst").alias("m"),
                         F.col("dd").alias("md"))
    e2 = oriented.select(F.col("src"), F.col("dst").alias("n"),
                         F.col("dd").alias("nd"))
    wedges = e1.join(e2, "src").where(
        (F.col("md") < F.col("nd"))
        | ((F.col("md") == F.col("nd")) & (F.col("m") < F.col("n"))))
    closer = oriented.select(F.col("src").alias("m"),
                             F.col("dst").alias("n"))
    tri = wedges.join(closer, ["m", "n"])
    return (
        tri.select(F.explode(F.array("src", "m", "n")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("n_triangles"))
    )


def kcore_nodes(
    edges: DataFrame,
    k: int = 2,
    iterations: int = 3,
    a_col: str = "surface_a",
    b_col: str = "surface_b",
    local_threshold: int = _LOCAL_EDGE_THRESHOLD,
) -> DataFrame:
    """Bounded k-core peeling over an undirected edge list (``a < b``
    per row): ``iterations`` rounds of "drop every node with degree < k,
    then drop edges with a dropped endpoint", returning the surviving
    nodes with their degree inside the surviving subgraph —
    ``(node, core_degree)``.  The community-skeleton filter KG pipelines
    use to separate persistent entities from one-off co-mentions.

    A FIXED iteration count (not run-to-fixpoint) keeps the operator a
    deterministic, oracle-expressible dataflow — the DuckDB twin is the
    identical chain of per-round CTEs; convergence at small k is fast
    (most peeling happens in round 1) and callers pick ``iterations``
    for their graph's depth.  Each round is one explode + hash agg
    (degrees) and two semi-joins (edge filter) — all keyed shuffles, no
    driver collection, linear in surviving |E| per round.

    EAGER: the input edges are localCheckpoint-ed at call time (they
    feed the degree agg and both semi-join legs of round 1 — the
    upstream mention pipeline would re-execute otherwise), and each
    round's surviving edge list is checkpointed again: round i+1 reads
    round i THREE times, and without the cut the plan tree triples per
    round.

    Size-adaptive: at or below ``local_threshold`` edges the identical
    peeling runs driver-side from one bounded collect (parity-tested;
    the per-round checkpoint chain otherwise costs ~20 fixed-overhead
    Spark jobs on a toy graph).  ``local_threshold=0`` forces the
    distributed path.
    """
    small = _collect_small_edges(edges, [a_col, b_col], local_threshold)
    if small is not None:
        node_type = dict(edges.dtypes)[a_col]
        es = [(r[0], r[1]) for r in small]
        for _ in range(int(iterations)):
            deg: dict = {}
            for a, b in es:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
            es = [(a, b) for a, b in es
                  if deg[a] >= int(k) and deg[b] >= int(k)]
        deg = {}
        for a, b in es:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        return edges.sparkSession.createDataFrame(
            list(deg.items()) or [], f"node {node_type}, core_degree long")
    e = edges.select(
        F.col(a_col).alias("a"), F.col(b_col).alias("b")).localCheckpoint()
    for _ in range(int(iterations)):
        deg = (
            e.select(F.explode(F.array("a", "b")).alias("node"))
            .groupBy("node").agg(F.count(F.lit(1)).cast("long").alias("d"))
        )
        keep = deg.where(F.col("d") >= int(k)).select("node")
        e = (
            e.join(keep.withColumnRenamed("node", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("node", "b"), "b", "left_semi")
            .localCheckpoint()
        )
    return (
        e.select(F.explode(F.array("a", "b")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("core_degree"))
    )
