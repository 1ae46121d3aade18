#!/usr/bin/env python3
"""DuckDB single-node wall-time baseline per oracled query (driver-side
tooling; the shipped library is pure Scala).

The reference publishes no benchmark wall-times, so the "within 2x of
single-node" gate had no denominator. This runs every SparkEntry oracle
SQL in DuckDB over the SAME parquet tables the Spark bench reads and
records median/min-of-3 wall seconds per query into an artifact
(DUCKDB_BASELINE.json) that graft.Bench folds into its output as
`duckdb_sec`/ratio columns.

Caveats recorded in the artifact:
  - the SQL is the ORACLE formulation. For arithmetic oracles (q1_agg,
    source_minhash, z-order, ...) that is the same work; but for
    planted-structure oracles the SQL is an algebraic SHORTCUT — e.g.
    dedup_minhash's oracle is a text-equality self-join (it never builds
    signatures) and multimodal_image's is a generating formula (it never
    decodes PNGs) — so those DuckDB times are a LOWER BOUND on equivalent
    work, not an apples-to-apples engine comparison. Per-query ratios
    must be read with that asymmetry in mind; the honest aggregate story
    lives in the compute-equivalent subset.
  - rows-only queries (no oracle SQL) have no baseline;
  - DuckDB runs with its default thread count (all cores), same machine
    as the local[32] Spark session;
  - at sf0.1 the corpus is tens of MB: Spark's per-query floor
    (job scheduling, AQE stage materialization, codegen) dominates many
    entries — a constant overhead that amortizes at real scale, which is
    the scale this library is designed for.

Usage: duckdb_bench.py SF_DIR VERIFY_OUT_DIR [OUT_JSON] [--only=q1,q2,...]
  (VERIFY_OUT_DIR must contain oracle_sql.json from graft.Verify;
   --only restricts to the named queries — the 20x headline baseline)
"""
import json
import sys
import time
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sfdir, verify_out, out_json, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.loads(Path(f"{verify_out}/oracle_sql.json").read_text())
    queries = {}
    for name in sorted(oracle):
        if only and name not in only:
            continue
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(oracle[name]).fetchall()
            times.append(time.perf_counter() - t0)
        times.sort()
        queries[name] = {"median_sec": round(times[1], 4),
                         "min_sec": round(times[0], 4)}
        print(f"{name:24s} median {times[1]:8.3f}s  min {times[0]:8.3f}s",
              flush=True)
    total = round(sum(q["median_sec"] for q in queries.values()), 3)
    artifact = {
        "engine": f"duckdb {duckdb.__version__}",
        "sf_dir": sfdir,
        "note": "oracle-form SQL, default threads; planted-structure "
                "oracles (dedup_*, multimodal_*, embed_lsh/embed ann "
                "families) are algebraic shortcuts — their times lower-"
                "bound equivalent work rather than repeat it; rows-only "
                "queries have no oracle and are absent; at sf0.1 Spark's "
                "per-query job floor dominates small entries",
        "total_median_sec": total,
        "queries": queries,
    }
    Path(out_json).write_text(json.dumps(artifact, indent=1))
    print(f"wrote {out_json}: {len(queries)} queries, "
          f"total median {total}s")


if __name__ == "__main__":
    only = None
    args = [a for a in sys.argv[1:] if not a.startswith("--only=")]
    for a in sys.argv[1:]:
        if a.startswith("--only="):
            only = set(a[len("--only="):].split(","))
    main(args[0], args[1],
         args[2] if len(args) > 2 else "DUCKDB_BASELINE.json", only)
