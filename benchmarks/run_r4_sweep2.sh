#!/bin/sh
# Round-4 follow-up sweep: fused caller/realign modes after the sv-backward
# rebase, plus isolations (cxs scatter-only, wgo weights-gather-only, c2r
# circ->rel only) and the full realign device cost old vs new (rold/rnew).
cd "$(dirname "$0")/.."
OUT=benchmarks/r4_sweep2.jsonl
B="${SWEEP_B:-3072}"
for MODE in cxk cx cxs mwk mw mwold wgo c2r rold rnew; do
  echo "=== mode=$MODE B=$B ===" >&2
  SWEEP_ONE=1 K=8 B="$B" MODE="$MODE" MARGINALIGN_STEP_BLOCK=8 \
    timeout 1800 python benchmarks/pipelined_sweep.py >> "$OUT" 2> \
    "benchmarks/r4_sweep2_$MODE.err" || echo "mode $MODE FAILED" >&2
done
