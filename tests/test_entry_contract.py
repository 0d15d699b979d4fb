"""Driver-contract harness: every queries() entry runs; every oracle_sql()
entry matches the Spark result (row count + columns + order-insensitive
values), mimicking the driver's DuckDB comparison."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

# sf0.001 by default (fast CI); set SPARK_GRAFT_CONTRACT_SF=/root/testdata/
# sf0.01 to re-run the whole harness at the driver's scale
SF = os.environ.get("SPARK_GRAFT_CONTRACT_SF", "/root/testdata/sf0.001")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm_cell(v):
    # Floats compare EXACTLY (the driver's own check hashes raw values, so
    # a last-ulp cross-engine divergence would fail there too — every
    # oracle here is designed bit-exact; rounding would mask drift).  Only
    # NaN needs normalizing (NaN != NaN would break the multiset compare).
    if isinstance(v, float) and math.isnan(v):
        return "nan"
    return v


def _rows_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_norm_cell(r[i]) for i in order) for r in rows
    )


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_runs(spark, name):
    q = entry_mod.queries()[name]
    df = q(spark, SF)
    rows = df.collect()
    assert rows is not None
    assert len(df.columns) > 0


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql().keys()))
def test_oracle_matches(spark, name):
    q = entry_mod.queries()[name]
    df = q(spark, SF)
    spark_rows = [tuple(r) for r in df.collect()]
    spark_cols = list(df.columns)

    con = _duck(SF)
    res = con.execute(entry_mod.oracle_sql()[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (spark_cols, duck_cols)
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: {len(spark_rows)} vs {len(duck_rows)}")
    a = _rows_multiset(spark_cols, spark_rows)
    b = _rows_multiset(duck_cols, duck_rows)
    mism = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:5]
    assert a == b, f"{name}: first mismatches {[(a[i], b[i]) for i in mism]}"


def test_rows_only_entries_deterministic(spark):
    """Entries WITHOUT a SQL oracle get only a row-count driver check, so
    nondeterminism would silently wobble that count between rounds — run
    each twice and require identical multisets."""
    no_oracle = sorted(set(entry_mod.queries()) - set(entry_mod.oracle_sql()))
    assert "nkg_model_event_extract" in no_oracle
    base = spark.conf.get("spark.sql.shuffle.partitions")
    for name in no_oracle:
        q = entry_mod.queries()[name]
        a = sorted(tuple(r) for r in q(spark, SF).collect())
        # second run under a DIFFERENT shuffle layout: same-session
        # same-config reruns can't catch partition-order dependence, which
        # is exactly what would wobble the driver's cross-round row counts
        spark.conf.set("spark.sql.shuffle.partitions", str(int(base) * 2 + 1))
        try:
            b = sorted(tuple(r) for r in q(spark, SF).collect())
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", base)
        assert a == b and len(a) > 0, name


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert "rel" in df.columns and "subj" in df.columns


# VERDICT r5 #6: rows-only entries get only a row-count driver check, so a
# future semantic drift would change the count SILENTLY between rounds.
# Pin the exact current counts per scale factor; update a value HERE, with
# a comment explaining the semantic change, whenever one is intended
# (r4->r5 precedent: the model-scored counts legitimately moved when the
# encoder head contract was widened to the reference's 6H feature set).
_ROWS_ONLY_GOLDEN = {
    "sf0.001": {
        "nkg_extract_facts": 15232,
        "nkg_model_extract": 15039,
        "nkg_model_event_extract": 321,
        "nkg_model_role_extract": 320,
        "nkg_model_hypergraph_extract": 392,
        "nkg_compacted": 10045,
        "nkg_event_extract": 1253,
        "nkg_role_extract": 1253,
        "nkg_hypergraph_extract": 1253,
    },
    "sf0.01": {
        "nkg_extract_facts": 14884,
        "nkg_model_extract": 14889,
        "nkg_model_event_extract": 321,
        "nkg_model_role_extract": 320,
        "nkg_model_hypergraph_extract": 392,
        "nkg_compacted": 9993,
        "nkg_event_extract": 1253,
        "nkg_role_extract": 1253,
        "nkg_hypergraph_extract": 1253,
    },
}


@pytest.mark.parametrize(
    "name", sorted(set(entry_mod.queries()) - set(entry_mod.oracle_sql())))
def test_rows_only_counts_pinned(spark, name):
    sf_key = os.path.basename(SF.rstrip("/"))
    if sf_key not in _ROWS_ONLY_GOLDEN:
        pytest.skip(f"no golden counts recorded for {sf_key}")
    golden = _ROWS_ONLY_GOLDEN[sf_key]
    assert set(golden) == set(entry_mod.queries()) - set(entry_mod.oracle_sql()), \
        "rows-only entry set changed — record golden counts for the new entries"
    got = entry_mod.queries()[name](spark, SF).count()
    assert got == golden[name], (
        f"{name}@{sf_key}: {got} rows vs pinned {golden[name]} — if this "
        "change is intended, update _ROWS_ONLY_GOLDEN with a comment")
