#!/bin/bash
# Round-12 scale-tier soak (VERDICT r11 next-round item #1).
#
# Measures scaling exponents for the engine + query families by running
# graft.Bench at matched section compositions at two scales each:
#   queries : sf0.1 -> generated sf1            (10x rows)
#   refs    : SECTIONS=refs,pub 500k -> 5M refs (10x refs)
#   cube    : SECTIONS=cube 512^3 -> 1024^3     (8x volume)
# Matched composition matters: each pair runs the SAME entry set in the
# SAME order, so per-entry medians are comparable. Raw samples + calib
# brackets land in target/scale/raws_<tier>.json per tier.
#
# Usage: tools/scale_soak.sh [tier ...]   (default: all tiers)
set -u
cd "$(dirname "$0")/.."
OUT=target/scale
mkdir -p "$OUT"

run_bench() { # $1 = tier name; rest = env VAR=VAL pairs
  local name=$1; shift
  echo "[soak] === $name ($(date +%H:%M:%S)) ===" >&2
  env "$@" SPARK_GRAFT_BENCH_RAWS="$OUT/raws_$name.json" \
    sbt -batch "runMain graft.Bench" \
    > "$OUT/$name.out" 2> "$OUT/$name.err"
  grep '"metric"' "$OUT/$name.out" | tail -1 > "$OUT/$name.json"
  if [ ! -s "$OUT/$name.json" ]; then
    echo "[soak] $name FAILED — no JSON line; stderr tail:" >&2
    tail -20 "$OUT/$name.err" >&2
  else
    echo "[soak] $name done" >&2
  fi
  df -h / | tail -1 >&2
}

TIERS=${*:-gen q1x q10x e1x_refs e10x_refs e1x_cube e8x_cube report}

for t in $TIERS; do case $t in
  gen)
    echo "[soak] generating sf1 (10x sf0.1) ..." >&2
    sbt -batch "runMain graft.tools.ScaleData /root/testdata/sf0.1 target/scale/sf1 10" \
      > "$OUT/gen.out" 2> "$OUT/gen.err" || { echo "[soak] gen FAILED" >&2; tail -20 "$OUT/gen.err" >&2; exit 1; }
    du -sh "$OUT/sf1" >&2
    ;;
  q1x)
    run_bench q1x SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
      SPARK_GRAFT_BENCH_REPS=0 SPARK_GRAFT_QUERY_REPS=3 \
      SPARK_GRAFT_BENCH_WARM=0
    ;;
  q10x)
    run_bench q10x SPARK_GRAFT_SF_DIR="$PWD/$OUT/sf1" \
      SPARK_GRAFT_BENCH_REPS=0 SPARK_GRAFT_QUERY_REPS=3 \
      SPARK_GRAFT_BENCH_WARM=0 SPARK_DRIVER_MEM=24g
    ;;
  e1x_refs)
    run_bench e1x_refs SPARK_GRAFT_SKIP_QUERIES=1 \
      SPARK_GRAFT_BENCH_SECTIONS=refs,pub \
      SPARK_GRAFT_BENCH_REFS=500000 SPARK_GRAFT_BENCH_REPS=3
    ;;
  e10x_refs)
    run_bench e10x_refs SPARK_GRAFT_SKIP_QUERIES=1 \
      SPARK_GRAFT_BENCH_SECTIONS=refs,pub \
      SPARK_GRAFT_BENCH_REFS=5000000 SPARK_GRAFT_BENCH_REPS=3 \
      SPARK_DRIVER_MEM=24g
    ;;
  e1x_cube)
    run_bench e1x_cube SPARK_GRAFT_SKIP_QUERIES=1 \
      SPARK_GRAFT_BENCH_SECTIONS=cube \
      SPARK_GRAFT_BENCH_CUBE=512 SPARK_GRAFT_BENCH_REPS=3
    ;;
  e8x_cube)
    run_bench e8x_cube SPARK_GRAFT_SKIP_QUERIES=1 \
      SPARK_GRAFT_BENCH_SECTIONS=cube \
      SPARK_GRAFT_BENCH_CUBE=1024 SPARK_GRAFT_BENCH_REPS=3 \
      SPARK_DRIVER_MEM=48g
    ;;
  report)
    python3 tools/scale_report.py "$OUT" > "$OUT/SOAK.md" \
      && echo "[soak] report -> $OUT/SOAK.md" >&2
    ;;
  *) echo "[soak] unknown tier: $t" >&2; exit 2 ;;
esac; done
echo "[soak] all done ($(date +%H:%M:%S))" >&2
