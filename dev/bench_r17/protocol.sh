#!/usr/bin/env bash
# Round-17 bench protocol = the r13–r16 discipline PLUS the acceptance
# gate the r16 verdict demanded (#1): a committed bench.json/DuckDB
# pair is acceptable ONLY from a sentinel-certified idle window.
#
# The gate, as a protocol-level rule (not judge goodwill):
#   * PRE-FLIGHT — before every Spark run, a bare-JVM SentinelProbe
#     (graft.SentinelProbe: one HostSentinel leg, ~0.5 s, no Spark)
#     must sit in this box's idle band: st <= 140 ms AND mt <= 270 ms
#     (idle baseline measured r16: st 117-135, mt32 240-260; mt/st ~ 2
#     IS idle here — 32 scheduler CPUs over 16 physical cores).
#     Out of band -> sleep and re-probe (the r16 steal storms ran on a
#     ~20-min cadence; probing is free, a burned 250 s leg is not).
#   * POST-HOC — a full run is ACCEPTED only if its own artifact's
#     host_sentinel pre AND post legs are in the same band; otherwise
#     the slot is re-run (up to $MAX_ATTEMPTS) after re-idling.
#   * COMMIT — committed bench.json = the median ACCEPTED warm full
#     run; the script FAILS if fewer than 3 warm runs are accepted or
#     if median_accepted / duckdb_median >= 2.0 (BASELINE.md's bench
#     contract). Known failure mode this gate encodes: never open the
#     protocol right after heavy activity (r16's monotone 318.8->222.5
#     cooling) — the pre-flight loop enforces the idle start.
#
# Control = the r16 judge commit (b4e3eeb), packaged from its own
# worktree at /tmp/r16head, benched once in the SAME window.
# Attribution question this round is near-nil: the r17 diff is
# doc/knob/fixture-sharing + the per-entry sentinel sampling (which
# runs BETWEEN query walls and is excluded from `value` by
# construction), so new-vs-control should be window-flat.
set -uo pipefail
cd "$(dirname "$0")/../.."
OUT=dev/bench_r17
ORACLE_SQL=dev/scale_experiment_r14/oracle_sql.json
ST_MAX=140
MT_MAX=270
MAX_ATTEMPTS=3
JAR_GLOB="target/scala-2.13/tingdataetlspark_*.jar"

probe() { # one bare-JVM sentinel leg -> "st mt"
  java -cp "$(ls $JAR_GLOB | head -1):/opt/spark/jars/*" \
    graft.SentinelProbe 32 2>/dev/null |
    python3 -c "import json,sys; d=json.load(sys.stdin); print(d['st_ms'], d['mt_ms'])"
}

wait_idle() { # block until the box sits in the idle band (<= ~30 min)
  for i in $(seq 1 60); do
    read -r st mt <<< "$(probe)"
    if python3 -c "exit(0 if float('$st')<=$ST_MAX and float('$mt')<=$MT_MAX else 1)"; then
      echo "   [gate] idle: st=${st}ms mt=${mt}ms"; return 0
    fi
    echo "   [gate] hostile (st=${st} mt=${mt}), waiting 30s ($i/60)"
    sleep 30
  done
  echo "   [gate] WARNING: box never idled in 30 min — proceeding labeled"
  return 0
}

accepted() { # bench JSON sentinel pair in band?
  python3 - "$1" <<EOF
import json, sys
d = json.load(open(sys.argv[1]))
s = d.get("host_sentinel", {})
ok = all([s.get("pre_st_ms", 1e9) <= $ST_MAX, s.get("pre_mt_ms", 1e9) <= $MT_MAX,
          s.get("post_st_ms", 1e9) <= $ST_MAX, s.get("post_mt_ms", 1e9) <= $MT_MAX])
print("ACCEPT" if ok else "REJECT", s)
sys.exit(0 if ok else 1)
EOF
}

spark_run() { # gated full run: name dir -> writes $OUT/$name.json (+ _rejN copies)
  local name="$1" dir="${2:-.}"
  for att in $(seq 1 $MAX_ATTEMPTS); do
    wait_idle
    echo "== spark $name attempt $att ($(date +%H:%M:%S))"
    (cd "$dir" && SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
      SPARK_GRAFT_BENCH_OUT="/root/repo/$OUT/$name.json" \
      sbt -batch "runMain graft.Bench" 2>&1 | grep -E '^\[bench\]' | tail -4)
    python3 -c "import json; d=json.load(open('$OUT/$name.json')); print(' ', round(d['value'],1), 's,', len(d['queries']), 'queries, failed:', d['failed'])"
    if accepted "$OUT/$name.json"; then return 0; fi
    echo "   [gate] $name attempt $att REJECTED (sentinel out of band) — retrying"
    cp "$OUT/$name.json" "$OUT/${name}_rej${att}.json"
  done
  echo "   [gate] $name: no accepted run in $MAX_ATTEMPTS attempts (last kept, labeled)"
  return 0
}

duck_run() {
  local name="$1"
  echo "== duckdb $name ($(date +%H:%M:%S))"
  python3 dev/oracle_bench.py /root/testdata/sf0.1 "$ORACLE_SQL" > "$OUT/$name.json"
  python3 -c "import json; d=json.load(open('$OUT/$name.json')); print(' ', round(d['value'],1), 's,', d['n'], 'queries,', d['timeouts'])"
}

spark_run bench_run1        # cold (JIT/page cache) — never the committed run
duck_run duckdb_run1
spark_run bench_run2
duck_run duckdb_run2
spark_run bench_run3
duck_run duckdb_run3
spark_run bench_run4
spark_run bench_r16code_samewindow /tmp/r16head

# COMMIT GATE: median accepted warm run vs DuckDB median, must be < 2.0
python3 - <<'EOF'
import json, glob, statistics, shutil, sys
ST_MAX, MT_MAX = 140, 270
warm = []
for n in ["bench_run2", "bench_run3", "bench_run4"]:
    d = json.load(open(f"dev/bench_r17/{n}.json"))
    s = d["host_sentinel"]
    ok = (s["pre_st_ms"] <= ST_MAX and s["pre_mt_ms"] <= MT_MAX and
          s["post_st_ms"] <= ST_MAX and s["post_mt_ms"] <= MT_MAX)
    print(f"{n}: {d['value']:.1f}s sentinel pre {s['pre_st_ms']}/{s['pre_mt_ms']} "
          f"post {s['post_st_ms']}/{s['post_mt_ms']} -> {'ACCEPT' if ok else 'REJECT'}")
    if ok:
        warm.append((d["value"], n))
ducks = sorted(json.load(open(f))["value"] for f in glob.glob("dev/bench_r17/duckdb_run*.json"))
dmed = statistics.median(ducks)
if len(warm) < 3:
    print(f"GATE FAIL: only {len(warm)} accepted warm runs (need 3) — re-run rejected slots")
    sys.exit(1)
warm.sort()
med_val, med_name = warm[len(warm) // 2]
ratio = med_val / dmed
print(f"median accepted warm = {med_val:.1f}s ({med_name}); duckdb median = {dmed:.1f}s; ratio = {ratio:.3f}x")
if ratio >= 2.0:
    print("GATE FAIL: ratio >= 2.0 — do not commit this sitting's bench.json")
    sys.exit(1)
shutil.copy(f"dev/bench_r17/{med_name}.json", "bench.json")
print(f"ACCEPTED: {med_name} -> bench.json (ratio {ratio:.3f}x < 2.0)")
EOF
echo "== protocol done"
