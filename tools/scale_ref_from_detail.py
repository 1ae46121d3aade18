#!/usr/bin/env python3
"""Regenerate SCALE_REF.json from a pinned bench_detail.json run
(driver-side tooling; the shipped library is pure Scala).

Since r18 the reference carries the calib load factors measured right
after each scale section, so the next round's regression check compares
machine-normalized seconds: this box's effective CPU speed swings ~1.4x
between windows (measured calib 0.74-1.41 on identical code+corpus),
and raw-seconds comparisons read kernel-bound queries' proportional
moves as per-query regressions (the r17 driver-run false positives:
dedup_minhash/multimodal_image "2.4x" movers that reproduced at
0.90-1.28x on a quiet window).

Usage: scale_ref_from_detail.py BENCH_DETAIL_JSON ROUND_TAG [OUT]
"""
import json
import sys
from pathlib import Path


def main(detail_path, round_tag, out="SCALE_REF.json"):
    d = json.loads(Path(detail_path).read_text())
    ref = {"round": round_tag}
    calib = {}
    for section in ("big20x", "big100x"):
        sec = d.get(section, {})
        qs = sec.get("queries", {})
        ref[section] = {k: v["min_sec"] for k, v in sorted(qs.items())
                        if v.get("min_sec", -1) >= 0}
        if "calib_after" in sec:
            calib[section] = round(sec["calib_after"], 3)
    if calib:
        ref["calib"] = calib
    ref["notes"] = (
        "per-query scale-section MINIMUMS from the pinned quiet run; "
        "'calib' records the load factor measured immediately after each "
        "section (Bench.calibrate vs CALIB.json) - Bench.scaleRegressions "
        "normalizes by refCalib/curCalib (clamped [0.5,2]) so "
        "machine-speed windows do not read as per-query regressions.")
    Path(out).write_text(json.dumps(ref, indent=1) + "\n")
    print(f"wrote {out}: {len(ref.get('big20x', {}))} 20x rows, "
          f"{len(ref.get('big100x', {}))} 100x rows, calib={calib}")


if __name__ == "__main__":
    main(*sys.argv[1:])
