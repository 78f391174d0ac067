"""Decompose the FB serving-kernel wall into pipeline/DMA vs compute.

Measures, in ONE process on the real chip:
  - stream-only twins of the two serving kernels (identical grids, block
    specs and stream set; body = one add per stream) -> the Pallas
    pipeline + HBM floor;
  - the real serving path at B in {1024, 2048} -> lane scaling on the
    same code and the same day (cross-round comparisons are noisy).

Prints one JSON line per measurement.
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from __graft_entry__ import _example_batch
    from marginalign_trna_tpu.models.hmm import PairHmm
    from marginalign_trna_tpu.ops import fb_pallas as fp
    from marginalign_trna_tpu.ops.fb import device_batch, make_tables
    from marginalign_trna_tpu.parallel.runtime import with_retries

    read_len = int(os.environ.get("BENCH_READ_LEN", "3500"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    hmm = PairHmm.load(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "marginalign_trna_tpu", "models", "last_hmm_20.txt",
        )
    )
    tables = make_tables(hmm)

    def bench(fn, *args):
        def run():
            out = fn(*args)
            flat = jax.tree_util.tree_leaves(out)
            s = float(np.asarray(flat[0]).sum())
            del out, flat
            return s

        with_retries(run, attempts=3)
        t0 = time.perf_counter()
        for _ in range(reps):
            with_retries(run, attempts=3)
        return (time.perf_counter() - t0) / reps

    # ---- stream-only twins at B=2048 ------------------------------------
    batch = _example_batch(2048, read_len, read_len, width=21, seed=1)
    cells = batch.dp_cells()
    dev = device_batch(batch)
    D1, Wp, B = dev.xb.shape
    K = fp.STEP_BLOCK
    D1K = -(-D1 // K) * K
    G = D1K // K

    def fwdlike_kernel(em_ref, valid_ref, bm_ref, bls_ref, post_ref):
        for kb in range(K):
            post_ref[kb] = (
                em_ref[kb] + bm_ref[kb]
                + valid_ref[kb].astype(jnp.float32) + bls_ref[kb]
            )

    def bwdlike_kernel(em_ref, valid_ref, bm_out_ref, bls_out_ref):
        for kb in range(K):
            bm_out_ref[kb] = em_ref[kb] + valid_ref[kb].astype(jnp.float32)
            bls_out_ref[kb] = em_ref[kb][0:1]

    blk3 = pl.BlockSpec((K, Wp, B), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    blk2 = pl.BlockSpec((K, 1, B), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    rev3 = pl.BlockSpec((K, Wp, B), lambda i: (G - 1 - i, 0, 0),
                        memory_space=pltpu.VMEM)
    rev2 = pl.BlockSpec((K, 1, B), lambda i: (G - 1 - i, 0, 0),
                        memory_space=pltpu.VMEM)
    cp = {"compiler_params": fp._compiler_params()}

    @jax.jit
    def stream_only(em, valid, bls):
        bm, bls2 = pl.pallas_call(
            bwdlike_kernel,
            grid=(G,),
            in_specs=[rev3, rev3],
            out_specs=[rev3, rev2],
            out_shape=[
                jax.ShapeDtypeStruct((D1K, Wp, B), jnp.float32),
                jax.ShapeDtypeStruct((D1K, 1, B), jnp.float32),
            ],
            **cp,
        )(em, valid)
        post = pl.pallas_call(
            fwdlike_kernel,
            grid=(G,),
            in_specs=[blk3, blk3, blk3, blk2],
            out_specs=[blk3],
            out_shape=[jax.ShapeDtypeStruct((D1K, Wp, B), jnp.float32)],
            **cp,
        )(em, valid, bm, bls2)[0]
        return post[:1, :1]

    st = fp.static_tables(tables)
    xb = fp._pad_steps(dev.xb, D1K)
    yb = fp._pad_steps(dev.yb, D1K)
    valid = fp._pad_steps(dev.valid.astype(jnp.int8), D1K)
    em = jax.jit(
        lambda x, y, v: fp._precompute_ematch(st, x, y)
        * v.astype(jnp.float32)
    )(xb, yb, valid)
    bls = jnp.zeros((D1K, 1, B), jnp.float32)

    dt = bench(stream_only, em, valid, bls)
    print(json.dumps({"mode": "stream_only_B2048",
                      "wall_ms": dt * 1e3,
                      "cells_per_sec": cells / dt}), flush=True)
    del em, valid, xb, yb, bls

    # ---- real serving path, lane scaling ---------------------------------
    for nb in (2048, 1024):
        batch = _example_batch(nb, read_len, read_len, width=21, seed=1)
        cells = batch.dp_cells()
        dev = device_batch(batch)
        dt = bench(fp.posteriors_pallas_specialised, tables, dev)
        print(json.dumps({"mode": "serving_B%d" % nb,
                          "wall_ms": dt * 1e3,
                          "cells_per_sec": cells / dt}), flush=True)
        del dev


if __name__ == "__main__":
    main()
