#!/usr/bin/env python3
"""Pin the BASELINE.md parser against the r17 contamination class
(VERDICT r17 "What's wrong" item 1): a baseline row is EXACTLY a
two-cell `| qNNN | float |` line — adjudication/forensics tables,
whose first numeric column is a REPS floor or a full-suite reading,
must yield NO baseline rows.

Run: python3 dev/test_baseline_parser.py   (exit 0 = all pinned)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from bench_gate import parse_baseline  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# the round-15 adjudication table shape that contaminated the gate
# (BASELINE.md "Round 15 adjudication": first numeric cell is the r14
# FULL-SUITE reading, second the REPS=6 floor — neither is a baseline)
FORENSICS_TABLE = """
### Round 15 adjudication: the r14 1.2-1.5x band (REPS=6 subset floors)

| query | r14 full-suite | REPS=6 floor | vs baseline | verdict |
|---|---|---|---|---|
| q106_hard_negatives | 0.53 | 0.378 | 1.05x | noise |
| q192_lsh_rebucket | 3.20 | 3.465 | 1.35x | watch (+0.9 s abs) |

### Round 16: q175 forensics

| query | old row | new floor | note |
|---|---|---|---|
| q175_dup_pagerank | 5.15 | 2.97 | |
| q178_graph_manifest | 13.8 | 10.1 | VERDICT target <11 s met |
"""

BASELINE_TABLE = """
| query | sec (cold) |
|---|---|
| q01_pricing_agg | 0.29 |
| q91_numeric_profile | 0.62 |

re-baseline (later rows win):

| query | sec (cold) |
|---|---|
| q91_numeric_profile | 0.55 |
"""

# the 23 rows the unanchored parser corrupted (VERDICT r17 item 1),
# with their INTENDED values under strict two-cell parsing
RESTORED = {
    "q08_window_hop": 0.27, "q21_knn_brute": 0.35, "q25_rollup": 0.40,
    "q53_salted_agg": 0.19, "q57_token_budget_mix": 0.40,
    "q59_char_entropy": 0.09, "q60_ann_recall": 0.40,
    "q61_interdup_grams": 0.98, "q80_gram_novelty": 0.70,
    "q91_numeric_profile": 0.62, "q102_pipeline_manifest": 2.76,
    "q103_dsir_weights": 1.08, "q105_weighted_sample": 0.19,
    "q106_hard_negatives": 0.36, "q107_group_weighted_sample": 0.27,
    "q111_eval_contamination": 2.01, "q175_dup_pagerank": 2.97,
    "q176_dup_triangles": 0.80, "q177_dup_kcore": 1.84,
    "q187_lsh_bucket_stats": 0.38, "q192_lsh_rebucket": 2.57,
    "q193_lsh_reband": 2.59, "q216_stream_burst_window": 3.86,
}


STREAM_TABLE = """
| sb:s1_s6_pipeline | 10711.5 |
| sb:gate_neardup_text | 469.6 |

re-pin (later rows win):

| sb:gate_neardup_text | 495.9 |
"""


def main():
    from stream_gate import parse_stream_baseline

    rows = parse_baseline(FORENSICS_TABLE)
    assert rows == {}, (
        f"forensics/adjudication tables must yield NO baseline rows, got {rows}")

    # sb: rows (stream_gate.py) and q rows (bench_gate.py) are mutually
    # invisible: neither parser can consume the other's baselines
    assert parse_baseline(STREAM_TABLE) == {}, (
        "sb: rows must be invisible to the batch-query parser")
    srows = parse_stream_baseline(STREAM_TABLE)
    assert srows == {"s1_s6_pipeline": 10711.5,
                     "gate_neardup_text": 495.9}, (
        f"sb: rows must parse with later-rows-win, got {srows}")
    assert parse_stream_baseline(BASELINE_TABLE) == {}, (
        "query baseline rows must be invisible to the stream parser")
    assert parse_stream_baseline(FORENSICS_TABLE) == {}, (
        "forensics tables must yield no stream baselines")
    assert parse_stream_baseline("| sb:x | 1.5 | noise |") == {}

    rows = parse_baseline(BASELINE_TABLE)
    assert rows == {"q01_pricing_agg": 0.29, "q91_numeric_profile": 0.55}, (
        f"two-cell rows must parse with later-rows-win, got {rows}")

    # trailing-whitespace and padding variants still parse; extra cells do not
    assert parse_baseline("| q01_x | 1.5 |  ") == {"q01_x": 1.5}
    assert parse_baseline("|q01_x|1.5|") == {"q01_x": 1.5}
    assert parse_baseline("| q01_x | 1.5 | noise |") == {}
    assert parse_baseline("| q01_x | 1.5 s |") == {}

    with open(os.path.join(REPO, "BASELINE.md"), encoding="utf-8") as f:
        full = parse_baseline(f.read())
    bad = {q: (full.get(q), want) for q, want in RESTORED.items()
           if abs(full.get(q, -1) - want) > 1e-9}
    assert not bad, f"restored rows drifted from their intended values: {bad}"
    assert len(full) >= 246, (
        f"expected >= 246 baselined queries, got {len(full)}")
    print(f"OK: {len(full)} baseline rows, forensics tables yield none, "
          f"all {len(RESTORED)} r17-contaminated rows restored")
    return 0


if __name__ == "__main__":
    sys.exit(main())
