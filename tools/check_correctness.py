#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate (dev-only; the
shipped library is pure Scala). Runs each oracle SQL in DuckDB over the
sf parquet tables and compares against the Spark outputs from graft.Verify:
columns sorted by name, rows sorted, values compared exactly.

Usage: python3 tools/check_correctness.py <sfdir> <verify_out_dir>
"""
import datetime
import json
import math
import sys
from pathlib import Path

import duckdb

# The ONLY cell types with a provably engine-stable canonical form. The
# driver's pandas-based comparator crashes on unhashable cells (round-1
# dedup_groups: array -> numpy.ndarray in sort_values) and silently
# diverges on Decimal (round-15 corpus_drift: DECIMAL(38,0) green here,
# red on the driver). Anything outside this set must be serialized (cast
# to string) in BOTH the query and the oracle.
CANONICAL_TYPES = (bool, int, float, str, bytes,
                   datetime.date, datetime.datetime, datetime.time)


def canon(rows, cols, name=""):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if v is not None and not isinstance(v, CANONICAL_TYPES):
                raise TypeError(
                    f"{name}: column {cols[i]!r} holds {type(v).__name__} "
                    "cells — outside the canonicalizable set "
                    "{int,float,str,bool,bytes,date,datetime,None}; the "
                    "driver comparator handles these inconsistently; "
                    "serialize (cast to string / array_join) in both "
                    "query and oracle")
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


def pack_oracle_rows(con):
    """Linear replay of the pack_sequences greedy fold (budget 90,
    shard = doc_id % 32, in-shard doc_id order, NULL/oversize -> bin -1).

    Semantically identical to the recursive-CTE oracle in
    SparkEntry.oracleSql, but O(rows): the CTE re-joins the tokenized
    corpus once per recursion depth, which is ~8 min in DuckDB at 100x —
    an oracle-side cost, so the 100x gate replays the 10-line fold here
    instead (--py-pack). The CTE stays the committed oracle at driver
    scales, where it doubles as an independent SQL formulation.
    Tokenization stays in DuckDB (the exact wsTokensSql expression)."""
    items = con.sql(r"""
        SELECT doc_id,
          CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                               x -> len(x) > 0)) AS BIGINT) AS tok,
          CAST(doc_id % 32 AS INT) AS shard
        FROM documents ORDER BY shard, doc_id""").fetchall()
    rows, fill, cbin, cur_shard = [], 0, 0, None
    for doc_id, tok, shard in items:
        if shard != cur_shard:
            cur_shard, fill, cbin = shard, 0, 0
        if tok is None or tok > 90:
            b = -1
        elif fill + tok <= 90:
            fill += tok
            b = cbin
        else:
            cbin += 1
            fill = tok
            b = cbin
        rows.append((doc_id, shard, b, tok))
    return ["doc_id", "shard", "bin", "n_tokens"], rows


def pack_stats_oracle_rows(con):
    """pack_stats = one aggregation over the same fold replay (r20,
    verdict #3 — this closes the query's 100x exclusion: its committed
    SQL oracle wraps the recursive-CTE replay, hours in DuckDB at 100x,
    while the fold itself is O(rows) in python). Aggregation is exact
    integer arithmetic; utilization reproduces Spark's round(x, 6)
    bit-for-bit via Decimal(repr(double)) + ROUND_HALF_UP — the same
    shortest-repr + setScale(HALF_UP) sequence Spark's round executes.
    The CTE-wrapping SQL stays the committed oracle at driver scales."""
    from decimal import Decimal, ROUND_HALF_UP
    _, rows = pack_oracle_rows(con)
    per_shard = {}
    for doc_id, shard, b, tok in rows:
        st = per_shard.setdefault(
            shard, {"max_bin": -1, "packed": 0, "quar": 0,
                    "ptok": 0, "otok": 0})
        if b >= 0:
            st["max_bin"] = max(st["max_bin"], b)
            st["packed"] += 1
            st["ptok"] += tok
        else:
            st["quar"] += 1
            st["otok"] += 0 if tok is None else tok
    out = []
    for shard in sorted(per_shard):
        st = per_shard[shard]
        n_bins = st["max_bin"] + 1
        if n_bins > 0:
            u = float(Decimal(repr(st["ptok"] / (n_bins * 90)))
                      .quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))
        else:
            u = 0.0
        out.append((shard, n_bins, st["packed"], st["quar"],
                    st["ptok"], st["otok"], u))
    return ["shard", "n_bins", "n_packed", "n_quarantined",
            "packed_tokens", "oversize_tokens", "utilization"], out


# DuckDB type → the python class canon() would have seen for that column;
# the hash-big path compares MAPPED classes (int vs str etc.), mirroring
# the python compare's type tuples, not raw DuckDB type names (INTEGER vs
# BIGINT both arrive as python int).
def _pyclass(duck_type):
    t = duck_type.upper()
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "HUGEINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t in ("FLOAT", "DOUBLE", "REAL"):
        return "float"
    if t == "BOOLEAN":
        return "bool"
    if t == "DATE":
        return "date"
    if t.startswith("TIMESTAMP"):
        return "datetime"
    if t == "BLOB":
        return "bytes"
    if t == "TIME":
        return "time"
    if t == "VARCHAR":
        return "str"
    return f"other:{t}"  # outside canon()'s set — mismatches loudly


def hash_compare(con, name, spark_glob, oracle_sql):
    """Order-insensitive exact compare for corpus-sized outputs, computed
    inside DuckDB: per-row digest = hash of the chr(30)-joined VARCHAR
    casts (NULL → chr(1) marker; concat_ws would silently skip NULLs),
    aggregated as (count, sum-of-hashes) — a multiset fingerprint, so
    duplicate rows count. Both sides are cast by the SAME DuckDB engine,
    and FLOAT/REAL columns are widened to DOUBLE *before* the VARCHAR
    cast: per-width shortest-roundtrip formatting would otherwise print
    0.1f and 0.1 identically even though their float64 bits differ,
    making the hash path more lenient than the python repr-compare it
    substitutes for (the python path widens float32→float64 on read, so
    widening-first reproduces exactly its comparison). With that widen,
    equal strings ⇒ equal float64 bits — the same bit-exactness the
    python path demands. Schema = sorted column names plus
    canon()-class-mapped types. Used only past --hash-big rows
    (builder-side tier runs); the driver-parity default path is
    untouched."""
    con.execute(f"CREATE OR REPLACE VIEW __spark AS SELECT * FROM '{spark_glob}'")
    con.execute(f"CREATE OR REPLACE VIEW __oracle AS {oracle_sql}")
    sd = [(r[0], r[1]) for r in con.sql("DESCRIBE __spark").fetchall()]
    od = [(r[0], r[1]) for r in con.sql("DESCRIBE __oracle").fetchall()]
    sschema = sorted((c, _pyclass(t)) for c, t in sd)
    oschema = sorted((c, _pyclass(t)) for c, t in od)

    def agg(view, cols):
        def cell(c, t):
            col = f'"{c}"'
            if t.upper() in ("FLOAT", "REAL"):
                col = f"CAST({col} AS DOUBLE)"
            return f"coalesce(CAST({col} AS VARCHAR), chr(1))"
        expr = ", ".join(cell(c, t) for c, t in cols)
        row = con.sql(
            f"SELECT count(*), coalesce(sum(hash(concat_ws(chr(30), {expr}))), 0) "
            f"FROM {view}").fetchone()
        return row[0], row[1]

    scount, shash = agg("__spark", sorted(sd))
    ocount, ohash = agg("__oracle", sorted(od))
    return {
        "rows_match": scount == ocount,
        "schema_match": sschema == oschema,
        "hash_match": scount == ocount and shash == ohash,
        "spark_rows": scount, "oracle_rows": ocount,
        "method": "duckdb-hash", "err": None,
    }, sschema, oschema


def fresh_con(sfdir):
    """One DuckDB connection PER QUERY. A shared connection lets one
    fatally-failing oracle (e.g. an INTERNAL binder error) invalidate the
    database and cascade 'database has been invalidated' into every later
    query — r14 turned 1 real failure into 72 reds this way. Views over
    parquet are free to recreate."""
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    return con


def main(sfdir, outdir, json_out=None, py_pack=False, hash_big=None):
    report = {}
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
        con = fresh_con(sfdir)
        if hash_big and not (name == "pack_sequences" and py_pack):
            n = con.sql(
                f"SELECT count(*) FROM '{spark_dir}/*.parquet'").fetchone()[0]
            if n > hash_big:
                try:
                    rep, ss, os_ = hash_compare(
                        con, name, f"{spark_dir}/*.parquet", oracle[name])
                except duckdb.Error as e:
                    print(f"{name:22s} ORACLE ERROR {type(e).__name__}: {e}")
                    report[name] = {"rows_match": None, "schema_match": None,
                                    "hash_match": None, "spark_rows": None,
                                    "oracle_rows": None,
                                    "err": f"{type(e).__name__}: {e}"}
                    failures += 1
                    con.close()
                    continue
                report[name] = rep
                if not rep["schema_match"]:
                    print(f"{name:22s} SCHEMA MISMATCH spark={ss} oracle={os_}")
                    failures += 1
                elif not rep["hash_match"]:
                    print(f"{name:22s} HASH MISMATCH n_spark={rep['spark_rows']}"
                          f" n_oracle={rep['oracle_rows']}")
                    failures += 1
                else:
                    print(f"{name:22s} OK rows={rep['spark_rows']} (hash)")
                con.close()
                continue
        try:
            sq = con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'")
            scols, srows = canon(sq.fetchall(), sq.columns, name)
            if name == "pack_sequences" and py_pack:
                pcols, prows = pack_oracle_rows(con)
                ocols, orows = canon(prows, pcols, name)
            elif name == "pack_stats" and py_pack:
                pcols, prows = pack_stats_oracle_rows(con)
                ocols, orows = canon(prows, pcols, name)
            else:
                oq = con.sql(oracle[name])
                ocols, orows = canon(oq.fetchall(), oq.columns, name)
        except TypeError as e:
            print(f"{name:22s} UNHASHABLE {e}")
            report[name] = {"rows_match": False, "schema_match": False,
                            "hash_match": False, "spark_rows": 0,
                            "oracle_rows": 0, "err": f"unhashable: {e}"}
            failures += 1
            con.close()
            continue
        except duckdb.Error as e:
            # a broken oracle is ONE red row, never an aborted run: record
            # the error and move on with a fresh connection next iteration
            print(f"{name:22s} ORACLE ERROR {type(e).__name__}: {e}")
            report[name] = {"rows_match": None, "schema_match": None,
                            "hash_match": None, "spark_rows": None,
                            "oracle_rows": None,
                            "err": f"{type(e).__name__}: {e}"}
            failures += 1
            con.close()
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
        con.close()
    # rows-only entries (no oracle)
    con = duckdb.connect()
    for d in sorted(Path(outdir).iterdir()):
        if d.is_dir() and d.name not in oracle:
            n = con.sql(f"SELECT count(*) FROM '{d}/*.parquet'").fetchone()[0]
            print(f"{d.name:22s} rows-only rows={n}" + (" (EMPTY!)" if n == 0 else ""))
    con.close()
    print("FAILURES:", failures)
    if json_out:
        Path(json_out).write_text(json.dumps(report, indent=2, sort_keys=True))
    return failures


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    hb = next((int(a.split("=", 1)[1]) for a in sys.argv[1:]
               if a.startswith("--hash-big=")), None)
    sys.exit(1 if main(args[0], args[1],
                       args[2] if len(args) > 2 else None,
                       py_pack="--py-pack" in sys.argv,
                       hash_big=hb) else 0)
