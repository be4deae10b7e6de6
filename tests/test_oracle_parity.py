"""Replicates the driver's correctness gate: every queries() entry vs its
oracle_sql() DuckDB result at sf0.01 — row count, column names, and values
(order-insensitive)."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                if math.isnan(v):
                    v = None
                else:
                    v = round(v, 6)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return out


QUERY_NAMES = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)
    sdf = q(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    if sql is None:
        # oracle-less (approximate) query: driver records rows-only
        assert len(srows) > 0, f"{name}: rows-only query returned no rows"
        return
    res = duck.execute(sql)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert sorted(scols) == sorted(ocols), f"{name}: column mismatch {scols} vs {ocols}"
    assert len(srows) == len(orows), f"{name}: row count {len(srows)} vs {len(orows)}"
    a = _canon(srows, scols)
    b = _canon(orows, ocols)
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "mean" in df.columns


# --- sf0.1 sweep for recall-sensitive queries ------------------------------
# The driver gate runs at sf0.01 where LSH recall gaps may not materialize
# (round-2 lesson: dedup_groups' oracle diverged only at sf0.1). Keep the
# queries whose semantics depend on candidate recall honest at 10x rows.

SCALE_SF_DIR = "/root/testdata/sf0.1"
SCALE_NAMES = [
    "dedup_groups",
    "minhash_lsh",
    "embedding_near_dups",
    # r6 (verdict ask #7): the remaining recall-dependent queries, gated
    # only at sf0.01 until now
    "simhash_near",
    "canonical_docs",
    "semdedup",
]


@pytest.fixture(scope="module")
def duck_sf01():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SCALE_SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


@pytest.mark.parametrize("name", SCALE_NAMES)
def test_recall_sensitive_queries_match_oracle_at_sf01(spark, duck_sf01, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    sdf = q(spark, SCALE_SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    orel = duck_sf01.execute(sql)
    ocols = [d[0] for d in orel.description]
    orows = orel.fetchall()
    assert sorted(scols) == sorted(ocols), name
    assert _canon(srows, scols) == _canon(orows, ocols), name
