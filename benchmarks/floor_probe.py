"""Separate the per-call dispatch floor from real kernel time.

The stream probe's punchline: every serving-shaped pallas_call lands at
26-33ms wall regardless of bytes moved (1.4-4.1GB), block size (K=2/8/32),
or a 32-deep dependent op chain in the body.  That is not a kernel
property — it is a per-synchronous-call floor (host dispatch + remote-PJRT
round trip on this environment).  This probe measures:

  t_trivial     — sync-per-call wall of an [8,128] add (pure floor)
  t_serving     — sync-per-call wall of the production circ serving FB
                  (what bench.py currently reports)
  t_pipelined   — N dispatches in flight, one sync at the end, wall/N:
                  steady-state serving throughput.  Outputs are reduced to
                  scalars ON DEVICE so queued calls don't hold multi-GB
                  posterior bands (the chip OOMs otherwise).

Prints one JSON line per measurement.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_batch
    from marginalign_trna_tpu.models.hmm import PairHmm
    from marginalign_trna_tpu.ops.fb import circ_device_batch, make_tables
    from marginalign_trna_tpu.ops.fb_pallas import (
        _posteriors_circ_static, static_tables,
    )
    from marginalign_trna_tpu.parallel.runtime import with_retries

    B = int(os.environ.get("PROBE_B", "2048"))
    read_len = int(os.environ.get("BENCH_READ_LEN", "3500"))
    reps = int(os.environ.get("PROBE_REPS", "6"))
    depth = int(os.environ.get("PROBE_DEPTH", "6"))

    print(json.dumps({"device": str(jax.devices()[0].device_kind),
                      "B": B, "reps": reps, "depth": depth}), flush=True)

    # --- trivial dispatch floor -------------------------------------------
    x = jnp.ones((8, 128), jnp.float32)

    @jax.jit
    def triv(v):
        return (v + 1.0).sum()

    with_retries(lambda: float(triv(x)), attempts=3)
    t0 = time.perf_counter()
    for _ in range(reps):
        float(triv(x))
    dt = (time.perf_counter() - t0) / reps
    print(json.dumps({"mode": "trivial_sync", "wall_ms": dt * 1e3}),
          flush=True)

    # --- serving call, outputs reduced on device --------------------------
    hmm = PairHmm.load(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "marginalign_trna_tpu", "models", "last_hmm_20.txt",
        )
    )
    st = static_tables(make_tables(hmm))
    batch = _example_batch(B, read_len, read_len, width=21, seed=1)
    cells = batch.dp_cells()
    cdev = circ_device_batch(batch)

    import functools

    @functools.partial(jax.jit, static_argnames=("s",))
    def serve_scalar(s, c):
        logZ, post = _posteriors_circ_static(s, c, mode="em")
        return logZ.sum() + post.sum()

    with_retries(lambda: float(serve_scalar(st, cdev)), attempts=3)

    # sync per call (bench.py methodology)
    t0 = time.perf_counter()
    for _ in range(reps):
        float(serve_scalar(st, cdev))
    dt = (time.perf_counter() - t0) / reps
    print(json.dumps({"mode": "serving_sync", "wall_ms": dt * 1e3,
                      "cells_per_sec": cells / dt}), flush=True)

    # pipelined: keep `depth` dispatches in flight, sync once
    t0 = time.perf_counter()
    outs = [serve_scalar(st, cdev) for _ in range(depth)]
    outs[-1].block_until_ready()
    dt = (time.perf_counter() - t0) / depth
    print(json.dumps({"mode": "serving_pipelined", "wall_ms": dt * 1e3,
                      "cells_per_sec": cells / dt}), flush=True)
    del outs


if __name__ == "__main__":
    main()
