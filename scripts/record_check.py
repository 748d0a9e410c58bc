#!/usr/bin/env python3
"""Turn a compare.py transcript into a committed JSON artifact.

Usage: record_check.py <compare_output.txt> <scale-label> <artifact.json>

The artifact records the sweep the round-9 verdict asked to
institutionalize (#1): per-query PASS/FAIL at an above-gate scale, plus
the summary counts, so scale-dependent divergence (the round-8 q128
class) has a committed place to show up.
"""
import json
import re
import sys
import subprocess


def main(txt_path, label, out_path):
    lines = open(txt_path).read().splitlines()
    queries = {}
    summary = ""
    for ln in lines:
        m = re.match(r"(PASS|FAIL) (\S+)\s*(.*)", ln)
        if m:
            status, name, detail = m.groups()
            queries[name] = "OK" if status == "PASS" else (detail or "FAIL")
        elif "oracle-checked queries pass" in ln:
            summary = ln.strip()
    n_ok = sum(1 for v in queries.values() if v == "OK")
    rec = {
        "scale": label,
        "git": subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                              capture_output=True, text=True,
                              cwd="/root/repo").stdout.strip(),
        "n_queries": len(queries),
        "n_ok": n_ok,
        "summary": summary,
        "failures": {k: v for k, v in sorted(queries.items()) if v != "OK"},
    }
    json.dump(rec, open(out_path, "w"), indent=1)
    print(f"[record] {out_path}: {n_ok}/{len(queries)} OK at {label}")
    return 0 if n_ok == len(queries) and queries else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3]))
