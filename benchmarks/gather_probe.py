"""How expensive is a per-lane take_along_axis on this TPU, really?

The fused-assembly measurement (pipelined_sweep MODE=cxa) showed 8
[rg, B] gathers from [D1K, B] costing 1.1s — 25x the serving kernel
itself.  This probe times the candidate formulations so the assembly
(and the segment-sum consumers, which use the same primitive) can pick
a fast one:

  tala0    take_along_axis axis=0, per-lane indices  (the slow baseline)
  tala0s   take_along_axis axis=0, SHARED row indices broadcast to lanes
  tala1    transpose to [B, D] and gather along the minor axis
  onehot   block one-hot matmul (MXU): out = sum_blocks onehot @ fl_block
  pallas   per-lane sublane gather in a small Pallas kernel (dyn slices)

Each line: {"mode", "wall_ms"} pipelined (8 calls in flight, one sync).
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    D = int(os.environ.get("PROBE_D", "7008"))
    B = int(os.environ.get("PROBE_B", "3072"))
    rg = int(os.environ.get("PROBE_RG", "4096"))
    depth = 8

    rng = np.random.default_rng(0)
    fl = jnp.asarray(rng.random((D, B)), jnp.float32)
    # Monotone-ish per-lane indices like the real df tables.
    base = np.sort(rng.integers(0, D, size=(rg,)))
    jitter = rng.integers(0, 64, size=(rg, B))
    idx = jnp.asarray(
        np.minimum(base[:, None] + jitter, D - 1), jnp.int32
    )
    idx_shared = jnp.asarray(np.broadcast_to(base[:, None], (rg, B)),
                             jnp.int32)

    @jax.jit
    def tala0(a, i):
        return jnp.take_along_axis(a, i, axis=0).sum()

    @jax.jit
    def tala1(a, i):
        at = a.T  # [B, D]
        return jnp.take_along_axis(at, i.T, axis=1).sum()

    @jax.jit
    def onehot(a, i):
        # Blocked one-hot matmul: block the gathered dim so the one-hot
        # stays [rg_blk, D] and rides the MXU.  FLOPs = rg * D * B / ...
        # (too many at full size; probe a 512-row block and scale).
        blk = 512
        oh = (
            i[:blk, 0:1] == jnp.arange(D, dtype=jnp.int32)[None, :]
        ).astype(jnp.float32)  # [blk, D] shared-index variant
        return (oh @ a).sum()

    cases = [
        ("tala0", lambda: tala0(fl, idx)),
        ("tala0s", lambda: tala0(fl, idx_shared)),
        ("tala1", lambda: tala1(fl, idx)),
        ("onehot512s", lambda: onehot(fl, idx_shared)),
    ]
    from marginalign_trna_tpu.parallel.runtime import with_retries

    for name, fn in cases:
        try:
            with_retries(lambda f=fn: float(f()), attempts=2)

            def pipelined(f=fn):
                t0 = time.perf_counter()
                outs = [f() for _ in range(depth)]
                float(outs[-1])
                del outs
                return (time.perf_counter() - t0) / depth

            dt = min(pipelined() for _ in range(3))
            print(json.dumps({"mode": name, "wall_ms": dt * 1e3}),
                  flush=True)
        except Exception as exc:  # noqa: BLE001
            print(json.dumps({"mode": name, "error": str(exc)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()
