#!/usr/bin/env bash
# Round-16 judge ask #1, the measurement half: does re-keying the
# PPJoin exact-duplicate collapse on a scalar (hash60-prefixed window
# instead of the r15 array-keyed membership SMJ) settle t52's 100x
# wall — the one directional cost the r15 blanket guard bought
# (~30 s r14-unguarded → ~64 s r15-guarded, inside an 18–102 s
# spill-variance band)?
#
# Protocol: 5 PAIRED solo runs at 100x uniform, INTERLEAVED
# new/control so both arms share every window's noise (the r15 bench
# lesson: this box swings ±40% Spark-only across windows; only
# same-window pairs are comparable). Control = the r15 judge commit
# (99fbbf1) packaged from its own worktree. Solo protocol as r14/r15:
# one JVM per run, artifact builds included in the wall (like-for-like
# across arms — the collapse under test runs inside the ppjoin build).
#
# Usage: dev/scale_experiment_r16/run_t52_paired.sh [sfDir] [pairs]
set -euo pipefail
cd "$(dirname "$0")/../.."
DIR="${1:-/tmp/scale100x}"
PAIRS="${2:-5}"
OUTDIR=dev/scale_experiment_r16
NEWJAR=$(ls target/scala-2.13/tingdataetlspark_*.jar | head -1)
CTLJAR=$(ls /tmp/r15head/target/scala-2.13/tingdataetlspark_*.jar | head -1)

run_one() {
  local jar="$1" out="$2"
  if [[ -s "$out" ]]; then echo "== $out exists, skipping"; return; fi
  echo "== $out ($(date +%H:%M:%S))"
  SPARK_GRAFT_SF_DIR="$DIR" SPARK_GRAFT_BENCH_OUT="$out" \
    /opt/spark/bin/spark-submit --class graft.Bench --master 'local[32]' \
      --driver-memory "${T52_MEM:-48g}" \
      --conf spark.ui.enabled=false \
      "$jar" t52_ppjoin_exact 2>&1 | grep -E '^\[bench\]' | tail -1
  python3 -c "import json; d=json.load(open('$out')); print('  ', round(d['value'],1), 's, builds', {k: round(v,1) for k,v in d['builds'].items()})"
}

for i in $(seq 1 "$PAIRS"); do
  run_one "$NEWJAR" "$OUTDIR/t52_100x_new_run$i.json"
  run_one "$CTLJAR" "$OUTDIR/t52_100x_r15ctl_run$i.json"
done
echo "== paired set done"
python3 - <<'EOF'
import json, glob, statistics
def walls(pat):
    return sorted(json.load(open(f))['value'] for f in glob.glob(pat))
new = walls('dev/scale_experiment_r16/t52_100x_new_run*.json')
ctl = walls('dev/scale_experiment_r16/t52_100x_r15ctl_run*.json')
print('new   :', [round(v,1) for v in new], 'median', round(statistics.median(new),1))
print('r15ctl:', [round(v,1) for v in ctl], 'median', round(statistics.median(ctl),1))
EOF
