#!/usr/bin/env python3
"""Fold a tools/check_correctness.py transcript into the committed
robustness-artifact JSON shape (CORRECTNESS_sf20x.json /
CORRECTNESS_skew.json).

Usage: correctness_artifact.py CHECK_OUTPUT_TXT CORPUS_DESC GENERATOR_CMD OUT_JSON
"""
import json
import re
import sys


def main(txt, corpus, generator, out):
    queries = {}
    failures = None
    for line in open(txt):
        m = re.match(r"(\S+)\s+OK rows=(\d+)", line)
        if m:
            queries[m.group(1)] = {"match": True, "rows": int(m.group(2))}
            continue
        m = re.match(r"FAILURES:\s*(\d+)", line)
        if m:
            failures = int(m.group(1))
    if failures is None:
        raise SystemExit(f"no FAILURES line in {txt} — incomplete run?")
    doc = {
        "corpus": corpus,
        "generator": generator,
        "gate": "tools/check_correctness.py (DuckDB oracle, exact value compare)",
        "failures": failures,
        "n_oracled_green": len(queries),
        "queries": dict(sorted(queries.items())),
    }
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
        f.write("\n")
    print(f"wrote {out}: {len(queries)} green, failures={failures}")


if __name__ == "__main__":
    main(*sys.argv[1:5])
