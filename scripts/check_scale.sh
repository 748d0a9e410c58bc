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
# The oracle-infeasible exclusion list is EMPTY since round 12: the
# last three entries (q256 >37 GB spill, q290 40 GB-cap OOM, q292
# >1200 s) were rescued by restructuring their oracles (MATERIALIZED
# per-round degree/edge/covered tables, ANTI JOIN peels, one
# materialized ej) — the full surface sweeps at real-sf1.
oracle_infeasible = set()
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
