#!/bin/sh
# Round-4 trimmed follow-up: the NEW fused paths at production B, the
# old paths only at B=256 (their take_along_axis weights pass is
# pathological at production B — the point of the redesign; the B=256
# wgo/mw isolations already document it).
cd "$(dirname "$0")/.."
OUT=benchmarks/r4_sweep3.jsonl
run() {
  MODE="$1"; BB="$2"; LEN="${3:-3500}"
  echo "=== mode=$MODE B=$BB len=$LEN ===" >&2
  SWEEP_ONE=1 K=8 B="$BB" MODE="$MODE" BENCH_READ_LEN="$LEN" \
    MARGINALIGN_STEP_BLOCK=8 \
    timeout 1800 python benchmarks/pipelined_sweep.py >> "$OUT" 2> \
    "benchmarks/r4_sweep3_$MODE$BB.err" || echo "mode $MODE FAILED" >&2
}
run cxsl 3072
run cxl 3072
run c2r 3072
run rnew 3072
run rold 256 512
run rnew 256 512
