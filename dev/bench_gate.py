#!/usr/bin/env python3
"""Contention-aware bench gate — applies BASELINE.md's re-run rule mechanically.

Usage:  python3 dev/bench_gate.py [bench_json] [baseline_md]
        (defaults: bench_latest.json, BASELINE.md)

BASELINE.md's rule (recorded round 6, applied by hand by the judge in
rounds 7 and 8): a query is perf-suspect only if it exceeds 2x its
baseline row in a run whose suite-wide MEDIAN inflation is < 1.5x;
otherwise the host was contended and the artifact is not evidence —
re-run instead. Rounds 7 and 8 both shipped driver artifacts whose >2x
rows were contention spikes (clean re-measures made every one vanish),
so the rule now runs as code against the artifact itself.

Round 10: full-suite artifacts are SELF-adjudicating — Bench re-runs
each >2x row 4 more times in the same JVM after the main passes and
embeds the floors under "adjudicated"; this gate clears flags whose
floor is within 2x (suite-context noise) and confirms the rest, so no
manual subset re-measure is needed for adjudicated artifacts.

Exit codes: 0 = clean (no true flags, incl. all flags adjudicated
clean), 1 = real >2x flags (adjudication-confirmed, or isolated with
no embedded floor), 2 = contended or unadjudicated spike-consistent
flags (re-run needed), 3 = input error (missing/failed queries or no
baseline overlap).
"""
import json
import re
import statistics
import sys


def parse_baseline(src):
    """A baseline row is EXACTLY a two-cell line `| qNNN_name | 1.23 |`;
    later rows win (re-baselines append a fresh row with a provenance
    note). LINE-ANCHORED on purpose (VERDICT r17): the adjudication /
    forensics tables also lead with a query cell followed by a numeric
    column (a REPS floor or a full-suite reading — NOT a baseline), and
    the old unanchored prefix match consumed those as re-baselines,
    silently corrupting 23 of 246 gate rows in both directions. Extra
    cells make a row unparseable as a baseline. Keep in lockstep with
    graft.Bench.parseBaseline."""
    rows = {}
    for m in re.finditer(r"(?m)^\|\s*(q\w+)\s*\|\s*(\d+(?:\.\d+)?)\s*\|\s*$", src):
        rows[m.group(1)] = float(m.group(2))
    return rows


def load_baseline(path):
    with open(path, encoding="utf-8") as f:
        return parse_baseline(f.read())


def main():
    bench_path = sys.argv[1] if len(sys.argv) > 1 else "bench_latest.json"
    base_path = sys.argv[2] if len(sys.argv) > 2 else "BASELINE.md"
    with open(bench_path, encoding="utf-8") as f:
        bench = json.load(f)
    queries = bench.get("queries", {})
    samples = bench.get("samples", {})
    baseline = load_baseline(base_path)

    failed = sorted(n for n, v in queries.items() if v is None or v < 0)
    if failed:
        print(f"FAIL: {len(failed)} queries failed in the bench run: {failed}")
        return 3

    paired = {n: (v, baseline[n]) for n, v in queries.items() if n in baseline}
    if not paired:
        print("FAIL: no overlap between bench queries and BASELINE.md rows")
        return 3
    unbaselined = sorted(set(queries) - set(baseline))

    inflations = {n: v / b for n, (v, b) in paired.items()}
    median = statistics.median(inflations.values())
    over2x = sorted(
        ((n, infl) for n, infl in inflations.items() if infl > 2.0),
        key=lambda t: -t[1],
    )

    print(f"bench: {bench_path}  queries={len(queries)}  baselined={len(paired)}")
    print(f"suite median inflation vs baseline: {median:.2f}x")
    if unbaselined:
        print(f"note: {len(unbaselined)} queries have no baseline row yet: "
              f"{unbaselined}")

    if median >= 1.5:
        print(f"CONTENDED (median {median:.2f}x >= 1.5x) — this artifact is "
              f"not perf evidence; re-run on an idle host.")
        if over2x:
            print(f"  ({len(over2x)} queries read >2x, consistent with a "
                  f"host spike, not query cost)")
        return 2

    if not over2x:
        print("CLEAN: uncontended run, every baselined query within 2x.")
        return 0

    # Per-flag contention signature (the evidence the judge used to
    # adjudicate rounds 7 and 8 by hand): a host spike inflates whatever
    # ran during it, so a spike-flagged query's RUN-ORDER NEIGHBORS read
    # inflated too (r8 artifact: neighborhood medians 1.5-1.7x around
    # the 10 spike flags); a genuine code regression is operator-local,
    # leaving neighbors at ~1.1x (r8: q90 1.10, q37 1.11 — and q90 was
    # indeed the round's one real drift).
    order = sorted(n for n in queries if n in paired)
    idx = {n: i for i, n in enumerate(order)}

    def neighborhood_median(name):
        i = idx[name]
        nb = [order[j] for j in range(max(0, i - 3), min(len(order), i + 4))
              if j != i]
        return statistics.median(inflations[n] for n in nb) if nb else 0.0

    isolated, spiky = [], []
    for n, infl in over2x:
        (spiky if neighborhood_median(n) >= 1.4 else isolated).append((n, infl))

    # Self-adjudication (round 10): Bench re-runs each >2x row 4 more
    # times in the same JVM right after the main passes and embeds the
    # floor under "adjudicated". A floor within 2x of baseline clears
    # the flag without any second run; a floor still >2x CONFIRMS it.
    adjud = bench.get("adjudicated", {}) or {}

    def adjudicated_infl(name):
        f = adjud.get(name)
        b = paired[name][1]
        return (f / b) if f and f > 0 and b > 0 else None

    print(f"FLAG: uncontended median ({median:.2f}x) but "
          f"{len(over2x)} queries over 2x:")
    cleared, confirmed = [], []
    for n, infl in over2x:
        v, b = paired[n]
        reps = samples.get(n)
        spread = ""
        if reps and len([r for r in reps if r > 0]) >= 2:
            ok = [r for r in reps if r > 0]
            spread = f"  samples min={min(ok):.2f} max={max(ok):.2f}"
            if max(ok) / min(ok) > 3.0:
                spread += " (wide spread: min itself may be contended)"
        kind = "SPIKE-CONSISTENT" if (n, infl) in spiky else "ISOLATED"
        ai = adjudicated_infl(n)
        verdict = ""
        if ai is not None:
            if ai <= 2.0:
                cleared.append(n)
                verdict = (f"  ADJUDICATED-CLEAN: in-run REPS=4 floor "
                           f"{adjud[n]:.2f}s = {ai:.2f}x")
            elif (n, infl) in spiky:
                # the 4 adjudication reps run back-to-back in the same
                # JVM right after the flagged pass — a host spike
                # spanning both would "confirm" a noise flag. When the
                # flag is ALSO spike-consistent (inflated neighbors),
                # the floor is not independent evidence: re-measure.
                verdict = (f"  ADJUDICATED->2x BUT SPIKE-CONSISTENT: "
                           f"floor {adjud[n]:.2f}s = {ai:.2f}x was "
                           f"measured inside the suspected spike — "
                           f"re-measure on an idle host")
            else:
                confirmed.append(n)
                verdict = (f"  ADJUDICATED-REAL: in-run REPS=4 floor "
                           f"{adjud[n]:.2f}s = {ai:.2f}x still >2x")
        print(f"  {n}: {v:.2f}s vs baseline {b:.2f}s = {infl:.2f}x "
              f"[{kind}, neighborhood {neighborhood_median(n):.2f}x]"
              f"{spread}{verdict}")
    if cleared:
        print(f"{len(cleared)} flags cleared by the embedded adjudication "
              f"(suite-context noise): {', '.join(cleared)}")
    # spike-consistent flags not cleared by adjudication need an
    # independent re-measure — whether the embedded floor was missing
    # or itself read >2x (it ran inside the suspected spike)
    unadjudicated_spiky = [n for n, _ in spiky if n not in cleared]
    if unadjudicated_spiky:
        print(f"{len(unadjudicated_spiky)} flags are spike-consistent and "
              f"not cleared — re-measure before treating as real:")
        print("  SPARK_GRAFT_BENCH_ONLY="
              + ",".join(unadjudicated_spiky)
              + " SPARK_GRAFT_BENCH_REPS=4 sbt 'runMain graft.Bench'")
    real = confirmed + [n for n, _ in isolated
                        if n not in adjud and n not in confirmed]
    if real:
        print(f"{len(real)} REAL perf suspects (adjudication-confirmed or "
              f"isolated with no embedded floor); bisect or re-baseline: "
              + ", ".join(real))
        return 1
    if unadjudicated_spiky:
        return 2
    print("CLEAN: every >2x flag adjudicated as suite-context noise "
          "by the embedded in-run re-measure.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
