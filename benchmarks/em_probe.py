"""A/B the E-step kernels on hardware: stored-forward vs
checkpoint-recompute, single-problem (3.5 kb reads) and multi-problem
lanes (tRNA-scale), one process.  Prints one JSON line per measurement.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    from __graft_entry__ import _example_batch
    from marginalign_trna_tpu.models.hmm import PairHmm
    from marginalign_trna_tpu.ops import fb_pallas_counts as fpc
    from marginalign_trna_tpu.ops.fb import device_batch, make_tables
    from marginalign_trna_tpu.parallel.runtime import with_retries

    reps = int(os.environ.get("BENCH_REPS", "3"))
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    hmm = PairHmm.load(os.path.join(
        here, "marginalign_trna_tpu", "models", "last_hmm_20.txt"))
    tables = make_tables(hmm)

    depth = int(os.environ.get("PROBE_DEPTH", "8"))

    def bench(label, cells, fn, *args):
        def run():
            res = fn(*args)
            s = float(np.asarray(res.logZ).sum())
            del res
            return s

        def run_pipelined():
            # Steady state: counts outputs are tiny, so keep `depth`
            # E-step calls in flight and sync once (the ~25ms dispatch
            # floor otherwise dominates: benchmarks/floor_probe.py).
            t0 = time.perf_counter()
            outs = [fn(*args) for _ in range(depth)]
            s = float(np.asarray(outs[-1].logZ).sum())
            del outs, s
            return (time.perf_counter() - t0) / depth

        try:
            with_retries(run, attempts=3)
            t0 = time.perf_counter()
            for _ in range(reps):
                with_retries(run, attempts=3)
            dt = (time.perf_counter() - t0) / reps
            dt_p = min(with_retries(run_pipelined, attempts=3)
                       for _ in range(2))
            print(json.dumps({"mode": label, "wall_ms": dt * 1e3,
                              "cells_per_sec": cells / dt,
                              "pipelined_wall_ms": dt_p * 1e3,
                              "pipelined_cells_per_sec": cells / dt_p}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"mode": label,
                              "error": type(e).__name__ + ": " + str(e)[:200]}),
                  flush=True)

    # Single-problem E-step at the serving shape (B capped: the stored
    # path's f_all is 5x the posterior path's HBM).
    nb = int(os.environ.get("EM_READS", "512"))
    batch = _example_batch(nb, 3500, 3500, width=21, seed=1)
    cells = batch.dp_cells()
    dev = device_batch(batch)
    bench("em_stored_B%d" % nb, cells, fpc._counts_pallas_jit, tables, dev)
    bench("em_ckpt_B%d" % nb, cells, fpc._counts_ckpt_jit, tables, dev)
    del dev, batch

    # Multi-problem lanes at tRNA scale: many ~90bp problems packed.
    from marginalign_trna_tpu.ops.band import pack_multi_banded_batch
    from marginalign_trna_tpu.ops.fb_pallas import multi_device_batch

    rng = np.random.default_rng(2)
    reads, refs = [], []
    for _ in range(8192):
        n = int(rng.integers(70, 95))
        ref = rng.integers(0, 4, size=n).astype(np.int8)
        read = ref.copy()
        subs = rng.random(n) < 0.1
        read[subs] = rng.integers(0, 4, size=int(subs.sum()))
        reads.append(read)
        refs.append(ref)
    mb = pack_multi_banded_batch(reads, refs, width=21, pad_steps_to=1024)
    cells = mb.dp_cells()
    mdev = multi_device_batch(mb)
    bench("em_stored_multi", cells, fpc._counts_pallas_multi_jit,
          tables, mdev)
    bench("em_ckpt_multi", cells, fpc._counts_ckpt_multi_jit, tables, mdev)


if __name__ == "__main__":
    main()
