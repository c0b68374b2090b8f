"""Mirror of the driver's correctness gate: run every queries() entry in
Spark and its oracle_sql() twin in DuckDB on the same parquet, compare
row multisets EXACTLY (the driver hashes values, so approximate equality
is not enough).  Runs at sf0.001 for speed; the driver runs sf0.01."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, bool):
        return int(v)
    return v


def _sort_key(row):
    # rollup/grouping-set rows contain None group keys -> not orderable
    return tuple((v is None, str(type(v)), str(v)) for v in row)


def _spark_rows(df, cols):
    return sorted(
        (tuple(_norm(r[c]) for c in cols) for r in df.collect()), key=_sort_key
    )


def _duck_rows(con, sql, cols):
    res = con.execute(sql)
    names = [d[0] for d in res.description]
    idx = [names.index(c) for c in cols]
    return sorted(
        (tuple(_norm(row[i]) for i in idx) for row in res.fetchall()), key=_sort_key
    )


ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()
CHECKED = sorted(ORACLES.keys())
ROWS_ONLY = sorted(set(QUERIES.keys()) - set(ORACLES.keys()))


def test_every_oracle_has_a_query():
    assert set(ORACLES.keys()) <= set(QUERIES.keys())


def test_every_query_has_an_oracle_twin():
    """VERDICT r3 next-round #9: the scoreboard reached 78/78 full
    rows+schema+hash checks in round 3 — this pins it.  Any queries()
    entry WITHOUT an oracle_sql() twin would silently downgrade to the
    driver's weaker rows-only check; adding one now fails here until its
    oracle lands."""
    assert ROWS_ONLY == [], f"queries without oracle twins: {ROWS_ONLY}"


# canonical type classes: Spark dtype string / DuckDB type string -> class.
# Anything NOT in the map (HUGEINT, DECIMAL, ...) maps to itself and fails
# the comparison — that is the point: DuckDB widening integer SUM to
# HUGEINT made 5 r1 queries hash-fail in the driver even though python
# ``==`` saw equal values.
# int widths are one class: CORRECTNESS_r01 shows the driver hash
# forgives i32-vs-i64 (doc_token_stats was green) but NOT int-vs-float
# (HUGEINT -> pandas float64 made 5 queries hash-fail).
_TYPE_CANON = {
    "bigint": "int", "BIGINT": "int",
    "int": "int", "INTEGER": "int",
    "smallint": "int", "SMALLINT": "int",
    "tinyint": "int", "TINYINT": "int",
    "double": "f64", "DOUBLE": "f64", "FLOAT8": "f64",
    "float": "f32", "FLOAT": "f32", "REAL": "f32",
    "string": "str", "VARCHAR": "str",
    "boolean": "bool", "BOOLEAN": "bool",
    "date": "date", "DATE": "date",
    # both convert to pandas datetime64; str() forms match to the second
    # (the temporal queries carry whole-second warc_ts values)
    "timestamp": "ts", "TIMESTAMP": "ts", "TIMESTAMP_NS": "ts",
}


def _canon_types(pairs):
    out = {}
    for name, t in pairs:
        s = str(t)
        # the driver compares pandas-converted values: DuckDB DECIMAL and
        # HUGEINT both land as float64 — harmless vs a Spark double
        # (term_search_docs was green in r1) but a hash-fail vs a Spark
        # bigint (the five r1 failures)
        if s.startswith("DECIMAL") or s == "HUGEINT":
            out[name] = "f64"
        else:
            out[name] = _TYPE_CANON.get(s, s)
    return out


@pytest.mark.parametrize("name", CHECKED)
def test_query_matches_oracle(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    cols = sorted(df.columns)
    got = _spark_rows(df, cols)
    con = _duck(sf_dir)
    try:
        rel = con.sql(ORACLES[name])
        duck_types = _canon_types(zip(rel.columns, rel.types))
        want = _duck_rows(con, ORACLES[name], cols)
    finally:
        con.close()
    spark_types = _canon_types(df.dtypes)
    assert spark_types == duck_types, (
        f"{name}: declared type mismatch (driver hashes typed values): "
        f"spark={spark_types} duckdb={duck_types}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    mism = [(a, b) for a, b in zip(got, want) if a != b][:5]
    assert got == want, f"{name}: first diffs {mism}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    n = df.count()
    assert n >= 0
    df.schema  # stable schema materializes


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"subj_id", "pred", "obj_id", "chunk_id", "url"}
