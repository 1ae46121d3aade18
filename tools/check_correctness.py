#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate (dev-only; the
shipped library is pure Scala). Runs each oracle SQL in DuckDB over the
sf parquet tables and compares against the Spark outputs from graft.Verify:
columns sorted by name, rows sorted, values compared exactly.

Usage: python3 tools/check_correctness.py <sfdir> <verify_out_dir>
"""
import json
import math
import sys
from pathlib import Path

import duckdb


def canon(rows, cols, name=""):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            # The driver's pandas-based canonicalizer crashes on unhashable
            # cells (round-1 dedup_groups: array column -> numpy.ndarray in
            # sort_values). Refuse them locally so the gap is caught here.
            if isinstance(v, (list, dict, set)):
                raise TypeError(
                    f"{name}: column {cols[i]!r} holds {type(v).__name__} "
                    "cells — the driver comparator cannot hash these; "
                    "serialize (e.g. array_join) in both query and oracle")
            if isinstance(v, float):
                v = ("f", repr(v))
            elif v is None:
                v = ("null",)
            else:
                v = (type(v).__name__, str(v))
            vals.append(v)
        out.append(tuple(vals))
    out.sort()
    return [cols[i] for i in idx], out


def main(sfdir, outdir, json_out=None):
    report = {}
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

    oracle = json.loads(Path(f"{outdir}/oracle_sql.json").read_text())
    failures = 0
    for name in sorted(oracle):
        spark_dir = Path(outdir) / name
        if not spark_dir.exists():
            print(f"{name:22s} MISSING spark output")
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "spark_rows": 0,
                            "oracle_rows": 0, "err": "missing spark output"}
            failures += 1
            continue
        sq = con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'")
        try:
            scols, srows = canon(sq.fetchall(), sq.columns, name)
            oq = con.sql(oracle[name])
            ocols, orows = canon(oq.fetchall(), oq.columns, name)
        except TypeError as e:
            print(f"{name:22s} UNHASHABLE {e}")
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "spark_rows": 0,
                            "oracle_rows": 0, "err": f"unhashable: {e}"}
            failures += 1
            continue
        report[name] = {"rows_match": len(srows) == len(orows),
                        "schema_match": scols == ocols,
                        "hash_match": srows == orows,
                        "spark_rows": len(srows),
                        "oracle_rows": len(orows), "err": None}
        if scols != ocols:
            print(f"{name:22s} SCHEMA MISMATCH spark={scols} oracle={ocols}")
            failures += 1
        elif srows != orows:
            diff = sum(1 for a, b in zip(srows, orows) if a != b)
            print(f"{name:22s} ROW MISMATCH n_spark={len(srows)} "
                  f"n_oracle={len(orows)} first_diffs={diff}")
            for a, b in list(zip(srows, orows))[:200]:
                if a != b:
                    print(f"   spark : {a}\n   oracle: {b}")
                    break
            failures += 1
        else:
            print(f"{name:22s} OK rows={len(srows)}")
    # rows-only entries (no oracle)
    for d in sorted(Path(outdir).iterdir()):
        if d.is_dir() and d.name not in oracle:
            n = con.sql(f"SELECT count(*) FROM '{d}/*.parquet'").fetchone()[0]
            print(f"{d.name:22s} rows-only rows={n}" + (" (EMPTY!)" if n == 0 else ""))
    print("FAILURES:", failures)
    if json_out:
        Path(json_out).write_text(json.dumps(report, indent=2, sort_keys=True))
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2],
                       sys.argv[3] if len(sys.argv) > 3 else None) else 0)
