#!/usr/bin/env python3
"""StreamBench component gate (round 20, VERDICT r19 item 2).

The batch bench has BASELINE.md two-cell rows + dev/bench_gate.py; the
streaming components (s1_s6_pipeline, gate_neardup_text, gate_nearvec)
had only an unpinned history series — after two methodology changes
(interleaved reps r18, rep-drop fix r19) a real throughput regression
was indistinguishable from harness drift. This gate pins them.

Baseline rows are EXACTLY two-cell lines `| sb:<component> | <float> |`
(rows/sec floor, current methodology: REPS>=3 interleaved passes,
min-of-N time -> max rows/sec, idle host). Later rows win, exactly the
batch-row convention. The `sb:` prefix keeps them invisible to
bench_gate.py's `q`-anchored parser and vice versa (pinned by
dev/test_baseline_parser.py).

Rule (mirrors the batch 2x rule, inverted for throughput): a component
is suspect only if its measured rows/sec falls below HALF its pinned
floor. Re-baselines append a fresh `sb:` row with a provenance note.

Usage:  python3 dev/stream_gate.py [streambench_json] [baseline_md]
        (defaults: last `"metric":"streaming"` line of
        bench_history.jsonl, BASELINE.md)

Exit codes: 0 = clean, 1 = component(s) below floor/2,
3 = input error (missing entry / no overlap).
"""
import json
import re
import sys


def parse_stream_baseline(src):
    """`| sb:<name> | <float> |` two-cell rows; later rows win."""
    rows = {}
    for m in re.finditer(
            r"(?m)^\|\s*sb:(\w+)\s*\|\s*(\d+(?:\.\d+)?)\s*\|\s*$", src):
        rows[m.group(1)] = float(m.group(2))
    return rows


def last_streaming_entry(history_path):
    last = None
    with open(history_path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                d = json.loads(line)
            except json.JSONDecodeError:
                continue
            if d.get("metric") == "streaming":
                last = d
    return last


def main():
    bench_path = sys.argv[1] if len(sys.argv) > 1 else None
    base_path = sys.argv[2] if len(sys.argv) > 2 else "BASELINE.md"

    if bench_path:
        with open(bench_path, encoding="utf-8") as f:
            entry = json.load(f)
    else:
        entry = last_streaming_entry("bench_history.jsonl")
    if not entry or "components" not in entry:
        print("FAIL: no StreamBench entry found "
              "(pass a JSON file or run graft.StreamBench first)")
        return 3

    with open(base_path, encoding="utf-8") as f:
        floors = parse_stream_baseline(f.read())
    comps = entry["components"]
    paired = {n: (v, floors[n]) for n, v in comps.items() if n in floors}
    if not paired:
        print("FAIL: no overlap between StreamBench components and "
              "BASELINE.md sb: rows")
        return 3
    unpinned = sorted(set(comps) - set(floors))

    bad = []
    for n, (v, floor) in sorted(paired.items()):
        ratio = v / floor if floor else float("inf")
        tag = "OK" if ratio >= 0.5 else "SLOW"
        print(f"{tag:4} {n}: {v:.1f} rows/s vs floor {floor:.1f} "
              f"({ratio:.2f}x of floor)")
        if ratio < 0.5:
            bad.append(n)
    if unpinned:
        print(f"WARN: components with no sb: baseline row: {unpinned}")
    if bad:
        print(f"FAIL: {len(bad)} component(s) below half their pinned "
              f"floor: {bad} — real regression or contended host; "
              "re-run idle to adjudicate")
        return 1
    print("clean: all components within 2x of their pinned floors")
    return 0


if __name__ == "__main__":
    sys.exit(main())
