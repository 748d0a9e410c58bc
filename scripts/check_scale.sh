#!/bin/bash
# Above-gate-scale oracle sweep (round-9 verdict #1). The sf0.01 gate
# (check.sh) proved blind to scale-dependent divergence once (round-8
# q128: wrong only at sf0.1+); this script is the institutionalized
# counterpart:
#   phase 1  FULL oracle comparison at sf0.1        -> CHECK_SF01.json
#   phase 2  heavy subset at the generated real-sf1 -> CHECK_SF1.json
# Heavy subset = ScaleProbe's derivation (BENCH_LOCAL min > 1.5 s + the
# named watch set), restated here from the committed BENCH_LOCAL.json.
set -e
cd /root/repo

echo "== phase 1: full oracle sweep at sf0.1 =="
OUT01=/tmp/verify_sf01
rm -rf "$OUT01"
sbt -batch --error "runMain graft.Verify /root/testdata/sf0.1 $OUT01"
python3 scripts/compare.py /root/testdata/sf0.1 "$OUT01" | tee /tmp/check_sf01.txt
python3 scripts/record_check.py /tmp/check_sf01.txt sf0.1 CHECK_SF01.json

echo "== phase 2: full-surface oracle sweep at generated real-sf1 =="
# Round-11 broadening (round-10 verdict #2): phase 2 used to cover only
# the BENCH>1.5s heavies + a named watch set; the one correctness-escape
# class this codebase has had was scale-dependent (round-8 q128). With
# per-query oracle timeouts in compare.py the sweep is now safe to run
# over EVERYTHING except an explicit oracle-infeasible exclusion list.
SF1=/tmp/graft-sf1-real
sbt -batch --error "runMain graft.tools.ScaleProbe /root/testdata/sf0.1 real gen"
HEAVY=$(python3 - "$OUT01" <<'EOF'
import glob, os, sys
# Oracle-side-infeasible at the generated real-sf1 corpus (engine side
# covered by ScaleProbe + the sf0.01/sf0.1 hash gates in every case):
#   q256 — five chained NOT-IN anti-join rounds over the shingle frame
#          spill >37 GB (round-10 run OOM'd the whole sweep);
#   q290 — the 6 nested k-core peel rounds, each re-filtering edges
#          through IN-subqueries over the sf1 pair frame, exhaust the
#          40 GB DuckDB spill cap (OOM, round-11 retry at 1200 s);
#   q292 — the modularity oracle re-evaluates the pair miner per
#          partition arm and still runs past 1200 s (round-11 retry).
oracle_infeasible = {'q256', 'q290', 'q292'}
names = sorted(os.path.basename(d.rstrip('/'))
               for d in glob.glob(f'{sys.argv[1]}/*/'))
full = [n for n in names if n.split('_')[0] not in oracle_infeasible]
print(','.join(full))
EOF
)
echo "[check_scale] sf1 subset: $HEAVY"
OUT1=/tmp/verify_sf1
rm -rf "$OUT1"
sbt -batch --error "runMain graft.Verify $SF1 $OUT1 $HEAVY"
# 1200 s per-oracle budget at sf1: the slowest legitimate oracles
# (q41/q42/q43's pair miner, q309's unrolled matvec) finish in 5-15 min
# on this corpus; the default 180 s is phase 1's budget.
GRAFT_ORACLE_TIMEOUT_S=1200 \
python3 scripts/compare.py "$SF1" "$OUT1" | tee /tmp/check_sf1.txt
python3 scripts/record_check.py /tmp/check_sf1.txt sf1-real CHECK_SF1.json
