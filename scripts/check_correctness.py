"""Driver-style correctness harness: run every queries() entry on Spark and
its oracle_sql() twin on DuckDB over the same sf parquet tables, compare
row count, schema (column names sorted), and a canonical value hash.

Mimics the round driver's CORRECTNESS_r{N}.json check so regressions are
caught locally before the round ends.

Usage: python scripts/check_correctness.py [sf_dir] [query ...]
"""
from __future__ import annotations

import hashlib
import json
import os
import sys
import time

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> str:
    """Canonical hash: sort columns by name, round floats, sort rows."""
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].apply(
                lambda v: json.dumps(v, default=str, sort_keys=True)
                if isinstance(v, (list, dict)) else v
            )
    rows = []
    for tup in df.itertuples(index=False):
        parts = []
        for v in tup:
            if isinstance(v, float):
                parts.append(f"{v:.6f}")
            elif v is None or (isinstance(v, float) and pd.isna(v)):
                parts.append("NULL")
            else:
                parts.append(str(v))
        rows.append("|".join(parts))
    rows.sort()
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from hybrid_graphrag_with_qdrant_neo4j_spark.session import get_spark

    spark = get_spark(app_name="correctness-check")
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    results = {}
    n_pass = n_hash = n_err = n_rows_only = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        row = {"rows_match": None, "schema_match": None, "hash_match": None,
               "spark_rows": None, "oracle_rows": None, "err": None}
        try:
            sdf = fn(spark, sf_dir)
            pdf_s = sdf.toPandas()
            row["spark_rows"] = len(pdf_s)
            sql = oracles.get(name)
            if sql is None:
                row["err"] = "no_oracle"
                n_rows_only += 1
            else:
                pdf_o = con.execute(sql).fetchdf()
                row["oracle_rows"] = len(pdf_o)
                row["rows_match"] = len(pdf_s) == len(pdf_o)
                row["schema_match"] = (
                    sorted(pdf_s.columns) == sorted(pdf_o.columns)
                )
                row["hash_match"] = canon(pdf_s) == canon(pdf_o)
                if row["rows_match"] and row["schema_match"] and row["hash_match"]:
                    n_pass += 1
                else:
                    n_hash += 1
        except Exception as e:  # noqa: BLE001
            row["err"] = f"{type(e).__name__}: {e}"[:300]
            n_err += 1
        row["sec"] = round(time.time() - t0, 2)
        results[name] = row
        status = ("PASS" if row["hash_match"]
                  else ("rows-only" if row["err"] == "no_oracle"
                        else ("ERR" if row["err"] else "FAIL")))
        print(f"{status:9s} {name:35s} spark={row['spark_rows']} "
              f"oracle={row['oracle_rows']} {row['sec']}s "
              f"{'' if not row['err'] or row['err']=='no_oracle' else row['err']}",
              flush=True)

    print(f"\n== {n_pass} pass / {n_hash} mismatch / {n_err} err / "
          f"{n_rows_only} rows-only (of {len(results)}) ==")
    board = os.path.join(REPO, "BENCH", "correctness_local.json")
    if only:
        # subset run: MERGE into the full scoreboard instead of
        # truncating it to the subset (r4 regression: a 7-query spot
        # check overwrote the 78-entry board)
        try:
            with open(board) as f:
                merged = json.load(f)
        except (OSError, json.JSONDecodeError):
            merged = {}
        merged.update(results)
        results = merged
    with open(board, "w") as f:
        json.dump(results, f, indent=1)
    spark.stop()
    return 1 if (n_hash or n_err) else 0


if __name__ == "__main__":
    raise SystemExit(main())
