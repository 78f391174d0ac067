"""Speed-of-light probe for the sv serving path (docs/KERNELS.md round-5).

Question (VERDICT r4 item 6): the sv serving kernels run ~50% of the HBM
byte roofline — is the remaining gap bytes (reducible) or the sequential
per-diagonal dependency chain (latency, irreducible without shortening
the chain)?

Method: run, PIPELINED (depth deep, one sync), three variants over the
identical streams, grids and block specs:

  real   es precompute + sv backward + sv posterior forward + sum
  twin   same pallas_call skeletons whose bodies are a single copy/add
         (identical HBM traffic, no dependency chain)
  body0  the real kernels with rescaling but K=8 unrolled bodies intact
         (i.e. the real thing again — sanity line)

twin wall ~= the pure stream/DMA time for the same bytes; real - twin =
the serialized body latency the DMA cannot hide.  If real ~= twin the
path is byte-bound and byte diets pay; if real >> twin it is
compute-latency-bound and only chain-shortening (or more lanes) pays.

    python benchmarks/sol_probe.py          # B=3072 x 3.5kb, band 21
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from __graft_entry__ import _example_batch
    from marginalign_trna_tpu.models.hmm import PairHmm
    from marginalign_trna_tpu.ops import fb_pallas as fp
    from marginalign_trna_tpu.ops.fb import circ_device_batch, make_tables
    from marginalign_trna_tpu.parallel.runtime import with_retries

    n_reads = int(os.environ.get("SOL_READS", "3072"))
    read_len = int(os.environ.get("SOL_READ_LEN", "3500"))
    depth = int(os.environ.get("SOL_DEPTH", "8"))
    reps = int(os.environ.get("SOL_REPS", "3"))

    batch = _example_batch(n_reads, read_len, read_len, width=21, seed=1)
    cells = batch.dp_cells()
    hmm = PairHmm.load(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "marginalign_trna_tpu", "models", "last_hmm_20.txt",
    ))
    tables = make_tables(hmm)
    cdev = circ_device_batch(batch)
    st = fp.static_tables(tables)

    D1, Wp, B = cdev.xb.shape
    K = fp.STEP_BLOCK
    D1K = -(-D1 // K) * K
    G = D1K // K

    # --- real sv serving, reduced on device --------------------------------
    @jax.jit
    def real(c):
        logZ, post = fp.posteriors_pallas_circ(tables, c, mode="sv")
        return logZ.sum() + post.sum()

    # --- stream twins: same specs/grid/shapes, bodies = copy/add -----------
    def twin_bwd_kernel(es_ref, fink_ref, find_ref,
                        bm_ref, bls_ref, zrow_ref):
        i = pl.program_id(0)
        for kb in range(K):
            bm_ref[kb] = es_ref[kb]
            bls_ref[kb] = es_ref[kb][0:1]

        @pl.when(i == pl.num_programs(0) - 1)
        def _z():
            zrow_ref[0] = es_ref[0][0:1]

    def twin_fwd_kernel(es_ref, bm_ref, bls_ref, logZ_ref, post_ref):
        for kb in range(K):
            post_ref[kb] = es_ref[kb] + bm_ref[kb]

    blk3 = pl.BlockSpec((K, Wp, B), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    blk2 = pl.BlockSpec((K, 1, B), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    rev3 = pl.BlockSpec((K, Wp, B), lambda i: (G - 1 - i, 0, 0),
                        memory_space=pltpu.VMEM)
    rev2 = pl.BlockSpec((K, 1, B), lambda i: (G - 1 - i, 0, 0),
                        memory_space=pltpu.VMEM)

    @jax.jit
    def twin(c):
        valid = fp._pad_steps(c.valid.astype(jnp.int8), D1K)
        xb = fp._pad_steps(c.xb, D1K)
        yb = fp._pad_steps(c.yb, D1K)
        vf = valid.astype(jnp.float32)
        es = fp._precompute_ematch(st, xb, yb) * vf - (1.0 - vf)
        fink = c.fink.astype(jnp.int32)[None, :]
        find = c.final_d.astype(jnp.int32)[None, :]
        bm, bls2, zrow = pl.pallas_call(
            twin_bwd_kernel,
            grid=(G,),
            in_specs=[rev3, full, full],
            out_specs=[rev3, rev2,
                       pl.BlockSpec((1, 1, B), lambda i: (0, 0, 0),
                                    memory_space=pltpu.VMEM)],
            out_shape=[
                jax.ShapeDtypeStruct((D1K, Wp, B), jnp.float32),
                jax.ShapeDtypeStruct((D1K, 1, B), jnp.float32),
                jax.ShapeDtypeStruct((1, 1, B), jnp.float32),
            ],
            interpret=fp._use_interpret(),
            compiler_params=fp._compiler_params(min_mb=64),
        )(es, fink, find)
        logZ = zrow[0, 0, :] + bls2[0, 0, :]
        post = pl.pallas_call(
            twin_fwd_kernel,
            grid=(G,),
            in_specs=[blk3, blk3, blk2, full],
            out_specs=blk3,
            out_shape=jax.ShapeDtypeStruct((D1K, Wp, B), jnp.float32),
            interpret=fp._use_interpret(),
            compiler_params=fp._compiler_params(min_mb=64),
        )(es, bm, bls2, logZ[None, :])
        return logZ.sum() + post.sum()

    results = {}
    for name, fn in (("real_sv", real), ("stream_twin", twin)):
        with_retries(lambda f=fn: float(f(cdev)), attempts=3)  # warm

        def run_pipelined(f=fn):
            t0 = time.perf_counter()
            outs = [f(cdev) for _ in range(depth)]
            _ = float(outs[-1])
            del outs
            return (time.perf_counter() - t0) / depth

        dt = min(with_retries(run_pipelined, attempts=3)
                 for _ in range(reps))
        results[name] = dt
        print(json.dumps({
            "variant": name, "wall_ms": round(dt * 1e3, 2),
            "cells_per_sec": cells / dt,
        }), flush=True)

    body = results["real_sv"] - results["stream_twin"]
    print(json.dumps({
        "verdict": "body-latency-bound" if body > results["stream_twin"]
        else "byte-bound",
        "body_serialized_ms": round(body * 1e3, 2),
        "stream_ms": round(results["stream_twin"] * 1e3, 2),
    }))


if __name__ == "__main__":
    main()
