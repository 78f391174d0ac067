"""Diagnostic: how much of the FB kernel wall is the conditional
roll/select mix?  Runs bench.py in three modes (one subprocess each —
the baked kernels differ per mode, so there is no compile-cache reuse to
lose):

  normal  — production kernels (conditional roll+select band motion)
  static  — every conditional roll_shift replaced by ONE unconditional
            roll (numerically wrong; ~the circular-band-layout op mix)
  none    — rolls removed entirely (wrong; absolute roll-cost ceiling)

Prints one JSON line per mode.
"""
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def main():
    reps = os.environ.get("BENCH_REPS", "2")
    for mode in ["normal", "static", "none"]:
        env = dict(os.environ)
        env["MARGINALIGN_ROLL_MODE"] = mode
        env["BENCH_REPS"] = reps
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, capture_output=True, text=True, timeout=1800,
        )
        line = ""
        for ln in out.stdout.splitlines():
            if ln.startswith("{"):
                line = ln
        if not line:
            print(json.dumps({"mode": mode, "error": out.stderr[-500:]}))
            continue
        rec = json.loads(line)
        rec["mode"] = mode
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
