#!/bin/sh
# Round-4 serving-mode sweep on the real chip: baseline em vs the
# stream-diet variants (sv, emw) and the fused caller/realign paths
# (cx*, mw*), one subprocess per mode (K binds at import; each distinct
# jit executable pays the axon remote-compile once per process).
# Appends one JSON line per mode to benchmarks/r4_sweep.jsonl.
cd "$(dirname "$0")/.."
OUT=benchmarks/r4_sweep.jsonl
B="${SWEEP_B:-3072}"
for MODE in em sv emw cxk cx cxg mwk mw mwold; do
  echo "=== mode=$MODE B=$B ===" >&2
  SWEEP_ONE=1 K=8 B="$B" MODE="$MODE" MARGINALIGN_STEP_BLOCK=8 \
    timeout 1800 python benchmarks/pipelined_sweep.py >> "$OUT" 2> \
    "benchmarks/r4_sweep_$MODE.err" || echo "mode $MODE FAILED" >&2
done
