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

Usage: scale_ref_from_detail.py DETAIL_JSON[,DETAIL_JSON...] ROUND_TAG [OUT]

Multiple comma-separated detail files are min-merged element-wise (the
SCALE_REF protocol: per-query minimums ACROSS runs — a single run's
minimum still carries whatever burst hit every one of its reps); the
calib recorded is the one from the run contributing that section's
smallest total, i.e. the quietest window.
"""
import json
import sys
from pathlib import Path


def main(detail_path, round_tag, out="SCALE_REF.json"):
    runs = [json.loads(Path(p).read_text())
            for p in detail_path.split(",") if p]
    ref = {"round": round_tag}
    calib = {}
    cpu = {}
    for section in ("big20x", "big100x"):
        wall, sec_cpu = {}, {}
        calibs = []
        for d in runs:
            sec = d.get(section, {})
            qs = sec.get("queries", {})
            for k, v in qs.items():
                if v.get("min_sec", -1) >= 0:
                    wall[k] = min(wall.get(k, float("inf")), v["min_sec"])
                # r20 (verdict #1): executor-CPU floors recorded WITH the
                # wall floors, so the next round's regression check can
                # classify a flagged wall move by whether the work itself
                # grew (cpu_ratio) instead of arguing exogeny by
                # elimination
                if v.get("min_cpu_sec", -1) >= 0:
                    sec_cpu[k] = min(sec_cpu.get(k, float("inf")),
                                     v["min_cpu_sec"])
            if "calib_after" in sec and sec.get("spark_min_total") is not None:
                calibs.append(sec["calib_after"])
        ref[section] = dict(sorted(wall.items()))
        if sec_cpu:
            cpu[section] = dict(sorted(sec_cpu.items()))
        # MEDIAN calib across contributing runs (r20): the calib kernel's
        # single readings jitter +-30% on identical quiet runs of
        # identical code (measured 0.81/0.89/1.24 across three final-HEAD
        # runs), and anchoring on one run's outlier made the very next
        # quiet run's regression check inflate every row ~1.5x (false
        # flags with cpu-stable attribution). The median of the
        # contributing runs is the stable anchor; the per-run spread
        # stays visible in the committed bench_detail artifacts.
        if calibs:
            cs = sorted(calibs)
            mid = len(cs) // 2
            med = cs[mid] if len(cs) % 2 == 1 else (cs[mid - 1] + cs[mid]) / 2
            calib[section] = round(med, 3)
    if calib:
        ref["calib"] = calib
    if cpu:
        ref["cpu"] = cpu
    ref["notes"] = (
        "per-query scale-section MINIMUMS min-merged across the pinned "
        "runs; 'calib' is the MEDIAN of the per-run load factors measured "
        "immediately after each section "
        "(Bench.calibrate vs CALIB.json) - Bench.scaleRegressions "
        "normalizes by refCalib/curCalib (clamped [0.5,2]) so "
        "machine-speed windows do not read as per-query regressions; "
        "'cpu' records per-query executor-CPU-second floors (r20) - the "
        "load-invariant denominator bench_detail's regr_attrib uses to "
        "classify a flagged wall move as cpu-stable (exogenous) vs "
        "cpu-moved (real). MIXED-ANCHOR convention (r20 advice, "
        "deliberate): per-query wall floors are MIN-merged across runs "
        "while calib is the MEDIAN across the same runs, so the reference "
        "can read tighter than any single run achieved - regression "
        "triage should expect flagged ratios up to the per-run calib "
        "spread (~1.3x) to be window noise, and consult the cpu floors "
        "for the real/exogenous split.")
    Path(out).write_text(json.dumps(ref, indent=1) + "\n")
    print(f"wrote {out}: {len(ref.get('big20x', {}))} 20x rows, "
          f"{len(ref.get('big100x', {}))} 100x rows, calib={calib}, "
          f"cpu rows: { {k: len(v) for k, v in cpu.items()} }")


if __name__ == "__main__":
    main(*sys.argv[1:])
