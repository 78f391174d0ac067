"""On-chip cost of the device traceback scans (ops/traceback_device.py).

The diagonal-lockstep scan runs ~D1 sequential steps of tiny [Wp, B]
work; per-step loop overhead on TPU could make it a meaningful share of
the post-pointer-pull guide/realign walls.  Measures, pipelined:

  nw-scan    nw_moves_device + pack_moves at guide shapes
  mea-scan   mea_moves_device + pack_moves at realign shapes
  pull       the packed move D2H pull

    python benchmarks/tb_probe.py            # B=1024 x 3.5kb, width 40/21
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

    from marginalign_trna_tpu.ops.traceback_device import (
        mea_moves_device, nw_moves_device, pack_moves,
    )
    from marginalign_trna_tpu.parallel.runtime import with_retries

    B = int(os.environ.get("TB_B", "1024"))
    D1 = int(os.environ.get("TB_D1", "7168"))
    depth = int(os.environ.get("TB_DEPTH", "8"))
    rng = np.random.default_rng(3)

    def bench(name, fn, *args):
        # Sync via a pulled SCALAR: block_until_ready does not actually
        # block through the axon tunnel (the round-5 tb probe measured
        # 0.015ms "scans" and a 31s "pull" that absorbed them).
        with_retries(lambda: float(fn(*args)), attempts=3)

        def timed():
            t0 = time.perf_counter()
            outs = [fn(*args) for _ in range(depth)]
            out = float(outs[-1])
            del outs, out
            return (time.perf_counter() - t0) / depth

        dt = min(with_retries(timed, attempts=3) for _ in range(3))
        print(json.dumps({"probe": name, "wall_ms": dt * 1e3}), flush=True)
        return dt

    for name, Wp, mover in (
        ("nw-scan", 40, "nw"), ("mea-scan", 24, "mea"),
    ):
        ptrs = jnp.asarray(
            rng.integers(0, 12, size=(D1, Wp, B)).astype(np.uint8)
        )
        lo = jnp.asarray(
            np.minimum(
                np.maximum(
                    np.arange(D1, dtype=np.int32)[:, None] // 2 - Wp // 2, 0
                ) + np.zeros((1, B), np.int32), D1 // 2,
            )
        )
        m = jnp.full((B,), D1 // 2 - 1, jnp.int32)
        n = jnp.full((B,), D1 // 2 - 1, jnp.int32)
        if mover == "nw":
            fs = jnp.zeros((B,), jnp.int32)
            fn = lambda p, l, mm, nn, f: pack_moves(
                nw_moves_device(p, l, mm, nn, f)
            ).astype(jnp.int32).sum()
            bench(name, jax.jit(fn), ptrs, lo, m, n, fs)
        else:
            fn = lambda p, l, mm, nn: pack_moves(
                mea_moves_device(p, l, mm, nn)
            ).astype(jnp.int32).sum()
            bench(name, jax.jit(fn), ptrs, lo, m, n)

    mv = pack_moves(
        mea_moves_device(
            jnp.asarray(rng.integers(0, 3, (D1, 24, B)).astype(np.uint8)),
            jnp.zeros((D1, B), jnp.int32),
            jnp.full((B,), D1 // 2, jnp.int32),
            jnp.full((B,), D1 // 2 - 1, jnp.int32),
        )
    )
    float(mv.astype(jnp.int32).sum())  # real sync (see bench note)
    t0 = time.perf_counter()
    _ = np.asarray(mv)
    print(json.dumps({
        "probe": "pull", "wall_ms": (time.perf_counter() - t0) * 1e3,
        "bytes": int(mv.size),
    }), flush=True)


if __name__ == "__main__":
    main()
