"""Isolate why the multi-problem serving kernels run ~8x slower per cell
than the single-problem specialised kernels on identical [D1, Wp, B]
shapes (trna.py, steady-state).  Measures, per pass, the full kernel vs a
stripped-body twin with identical grid/specs, plus the single-problem
specialised kernel on the same shape as the reference point.
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_READS = int(os.environ.get("TRNA_READS", "16384"))
READ_LEN = 100
REF_LEN = 90
WIDTH = 21
DEPTH = int(os.environ.get("PROBE_DEPTH", "8"))


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from marginalign_trna_tpu.models.hmm import PairHmm
    from marginalign_trna_tpu.ops import fb_pallas as fp
    from marginalign_trna_tpu.ops.band import (
        pack_banded_batch, pack_multi_banded_batch,
    )
    from marginalign_trna_tpu.ops.fb import device_batch, make_tables
    from marginalign_trna_tpu.ops.fb_pallas import (
        STEP_BLOCK, multi_device_batch, static_tables,
    )
    from marginalign_trna_tpu.parallel.runtime import with_retries

    rng = np.random.default_rng(0)
    refs = [rng.integers(0, 4, size=REF_LEN).astype(np.int8)
            for _ in range(N_READS)]
    reads = []
    for r in refs:
        y = r.copy()
        subs = rng.random(REF_LEN) < 0.12
        y[subs] = (y[subs] + rng.integers(1, 4, subs.sum())) % 4
        ins = rng.integers(0, 4, size=READ_LEN - REF_LEN).astype(np.int8)
        pos = rng.integers(0, REF_LEN)
        reads.append(np.concatenate([y[:pos], ins, y[pos:]]))

    hmm = PairHmm.load(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "marginalign_trna_tpu", "models", "last_hmm_20.txt"))
    tables = make_tables(hmm)
    st = static_tables(tables)
    gc = fp._flat_gap_consts(st)

    mb = pack_multi_banded_batch(reads, refs, width=WIDTH)
    mdev = multi_device_batch(mb)
    D1, Wp, B = mdev.xb.shape
    print(json.dumps({"shape": [D1, Wp, B],
                      "chain": fp._gap_chain_consts(st, gc) is not None}),
          flush=True)

    def bench(label, fn):
        try:
            with_retries(lambda: float(fn()), attempts=3)

            def once():
                t0 = time.perf_counter()
                outs = [fn() for _ in range(DEPTH)]
                out = float(outs[-1])
                del outs, out
                return (time.perf_counter() - t0) / DEPTH

            dt = min(with_retries(once, attempts=3) for _ in range(2))
            print(json.dumps({"mode": label, "wall_ms": dt * 1e3}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"mode": label, "error":
                              type(e).__name__ + ": " + str(e)[:200]}),
                  flush=True)

    # 0) full multi posteriors
    @functools.partial(jax.jit, static_argnames=("s",))
    def full(s, d):
        logZ, post = fp._posteriors_multi_static(s, d)
        return logZ.sum() + post.sum()

    bench("multi_full", lambda: full(st, mdev))

    # 1) fwd pass only (same precompute + fwd pallas_call, skip bwd)
    K = STEP_BLOCK
    D1K = -(-D1 // K) * K
    G = D1K // K

    def build_fwd_inputs(md):
        valid = fp._pad_steps(md.valid, D1K)
        s1 = fp._pad_steps(md.s1, D1K)[:, None, :]
        start = fp._pad_steps(md.start, D1K)[:, None, :]
        fink = jnp.pad(md.fink, [(0, D1K - D1), (0, 0)],
                       constant_values=-1)[:, None, :]
        xb = fp._pad_steps(md.xb, D1K)
        yb = fp._pad_steps(md.yb, D1K)
        em = fp._precompute_ematch(st, xb, yb) * valid.astype(jnp.float32)
        return em, valid, s1, fink, start

    blk3 = pl.BlockSpec((K, Wp, B), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    blk2 = pl.BlockSpec((K, 1, B), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    scratch = (
        [pltpu.VMEM((Wp, B), jnp.float32) for _ in range(10)]
        + [pltpu.VMEM((1, B), jnp.float32), pltpu.VMEM((1, B), jnp.float32)]
    )
    fwd_scratch = scratch + [pltpu.VMEM((1, B), jnp.int32)]

    fwd_call = pl.pallas_call(
        fp._make_fwd_kernel_pre_multi(st, gc),
        grid=(G,),
        in_specs=[blk3, blk3, blk2, blk2, blk2],
        out_specs=[blk3, blk2, blk2],
        out_shape=[
            jax.ShapeDtypeStruct((D1K, Wp, B), jnp.float32),
            jax.ShapeDtypeStruct((D1K, 1, B), jnp.float32),
            jax.ShapeDtypeStruct((D1K, 1, B), jnp.float32),
        ],
        scratch_shapes=fwd_scratch,
        **({"compiler_params": fp._compiler_params()}
           if fp._compiler_params() else {}),
    )

    @jax.jit
    def fwd_only(md):
        em, valid, s1, fink, start = build_fwd_inputs(md)
        fm, lsf2, term2 = fwd_call(em, valid, s1, fink, start)
        return fm.sum() + lsf2.sum() + term2.sum()

    bench("multi_fwd_only", lambda: fwd_only(mdev))

    # 2) precompute only (no pallas): is the XLA prepad/emission pass slow?
    @jax.jit
    def precompute_only(md):
        em, valid, s1, fink, start = build_fwd_inputs(md)
        return (em.sum() + valid.astype(jnp.float32).sum() + s1.sum()
                + fink.sum() + start.sum())

    bench("multi_precompute_only", lambda: precompute_only(mdev))

    # 3) stripped twin of the fwd pass: same specs, body = copy/add.
    def twin_kernel(em_ref, valid_ref, s1_ref, fink_ref, start_ref,
                    fm_ref, lsf_ref, term_ref, *scr):
        acc = scr[0]
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            acc[:, :] = jnp.zeros_like(acc)

        a = acc[:, :]
        for kb in range(K):
            a = a * 0.5 + em_ref[kb] + valid_ref[kb].astype(jnp.float32)
            fm_ref[kb] = a
            lsf_ref[kb] = a[0:1]
            term_ref[kb] = a[0:1] + s1_ref[kb].astype(jnp.float32)
        acc[:, :] = a

    twin_call = pl.pallas_call(
        twin_kernel,
        grid=(G,),
        in_specs=[blk3, blk3, blk2, blk2, blk2],
        out_specs=[blk3, blk2, blk2],
        out_shape=[
            jax.ShapeDtypeStruct((D1K, Wp, B), jnp.float32),
            jax.ShapeDtypeStruct((D1K, 1, B), jnp.float32),
            jax.ShapeDtypeStruct((D1K, 1, B), jnp.float32),
        ],
        scratch_shapes=fwd_scratch,
        **({"compiler_params": fp._compiler_params()}
           if fp._compiler_params() else {}),
    )

    @jax.jit
    def fwd_twin(md):
        em, valid, s1, fink, start = build_fwd_inputs(md)
        fm, lsf2, term2 = twin_call(em, valid, s1, fink, start)
        return fm.sum() + lsf2.sum() + term2.sum()

    bench("multi_fwd_twin", lambda: fwd_twin(mdev))

    # 4) single-problem specialised kernel, same per-batch shape reference.
    sbatch = pack_banded_batch(reads[:4096], refs[:4096], width=WIDTH,
                               quantize=True, pad_batch_to=4096,
                               pad_steps_to=1024)
    sdev = device_batch(sbatch)

    @functools.partial(jax.jit, static_argnames=("s",))
    def single(s, d):
        logZ, post = fp._posteriors_pallas_static(s, d)
        return logZ.sum() + post.sum()

    bench("single_1024x4096", lambda: single(st, sdev))


if __name__ == "__main__":
    main()
