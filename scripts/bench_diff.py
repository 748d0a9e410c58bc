#!/usr/bin/env python3
"""Per-query bench regression diff (round-10 verdict #6).

Compares two BENCH_LOCAL-style JSON records (each one line with a
"queries" per-query seconds map) and flags regressions: queries whose
current min time exceeds 1.5x the previous min AND whose current time
is above a 0.3 s noise base (sub-0.3 s numbers on this machine swing
+-25-40 % with ambient load — BASELINE.md's drift protocol).

Usage: bench_diff.py <prev.json> <curr.json> [ratio] [base_s]
Exit 0 = no regressions; 1 = regressions listed on stdout.

Both files should be recorded at comparable machine state — each
record carries "load" (start;end loadavg) and "load_ok"; the diff
prints both so the reader can spot a contaminated comparison.
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def main(prev_path, curr_path, ratio=1.5, base=0.3):
    prev, curr = load(prev_path), load(curr_path)
    pq, cq = prev["queries"], curr["queries"]
    print(f"prev: total={prev.get('value')} load={prev.get('load')} "
          f"load_ok={prev.get('load_ok', '?')} n={len(pq)}")
    print(f"curr: total={curr.get('value')} load={curr.get('load')} "
          f"load_ok={curr.get('load_ok', '?')} n={len(cq)}")
    # Machine-state auto-flag (round-12 verdict #5): when both records
    # cover the SAME query surface but their totals diverge >1.2x, the
    # difference is machine state (or a broad regression), not noise —
    # either way the comparison must carry a loud marker, so a
    # contaminated run can't quietly become the round's number.
    try:
        pt, ct = float(prev.get("value")), float(curr.get("value"))
        if set(pq) == set(cq) and pt > 0 and ct > 0 \
                and max(pt / ct, ct / pt) > 1.2:
            print(f"MACHINE-STATE WARNING: equal {len(pq)}-query surface "
                  f"but totals diverge {max(pt / ct, ct / pt):.2f}x "
                  f"({pt:.2f}s vs {ct:.2f}s) — check load/load_ok before "
                  "trusting either record")
    except (TypeError, ValueError):
        pass
    for rec, tag in ((prev, "prev"), (curr, "curr")):
        if rec.get("load_ok") is False:
            print(f"MACHINE-STATE WARNING: {tag} record has load_ok=false "
                  "— it was measured on a busy machine")
    # Per-query machine-suspect marking (round-13 verdict #6): a query
    # whose pass-to-pass spread exceeds 2x inside ONE record was hit by a
    # transient load event, not a plan property — its min/mean are not
    # trustworthy comparison points. Needs query_passes (recorded since
    # round 14); older records simply have no suspects.
    def suspects(rec):
        out = {}
        for name, ts in (rec.get("query_passes") or {}).items():
            good = [t for t in ts if t > 0]
            if len(good) >= 2 and max(good) > 0.3 \
                    and max(good) / min(good) > 2.0:
                out[name] = (min(good), max(good))
        return out
    susp = {}
    for rec, tag in ((prev, "prev"), (curr, "curr")):
        for name, (lo, hi) in suspects(rec).items():
            susp.setdefault(name, []).append(tag)
            print(f"MACHINE-SUSPECT {name} ({tag}): pass spread "
                  f"{lo:.2f}s..{hi:.2f}s (> 2x) — transient load, "
                  "re-measure before trusting this query's number")
    regressions, improved, added, removed = [], [], [], []
    for name in sorted(set(pq) | set(cq)):
        p, c = pq.get(name), cq.get(name)
        if p is None:
            added.append(name)
            continue
        if c is None:
            removed.append(name)
            continue
        if p < 0 or c < 0:  # failed in one record: always report
            regressions.append((name, p, c, float("inf")))
            continue
        if c > base and p > 0 and c / p > ratio:
            regressions.append((name, p, c, c / p))
        elif p > base and c > 0 and p / c > ratio:
            improved.append((name, p, c, p / c))
    for name, p, c, r in sorted(regressions, key=lambda x: -x[3]):
        mark = f"  [machine-suspect: {','.join(susp[name])}]" \
            if name in susp else ""
        print(f"REGRESSION {name}: {p:.2f}s -> {c:.2f}s ({r:.2f}x){mark}")
    for name, p, c, r in sorted(improved, key=lambda x: -x[3]):
        print(f"improved   {name}: {p:.2f}s -> {c:.2f}s ({r:.2f}x faster)")
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    print(f"\n{len(regressions)} regressions "
          f"(>{ratio}x above a {base}s base), {len(improved)} improvements")
    return 1 if regressions else 0


if __name__ == "__main__":
    args = sys.argv[1:]
    ratio = float(args[2]) if len(args) > 2 else 1.5
    base = float(args[3]) if len(args) > 3 else 0.3
    sys.exit(main(args[0], args[1], ratio, base))
