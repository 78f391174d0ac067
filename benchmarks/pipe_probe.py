"""Pipelined (steady-state) decomposition of the serving wall: DMA vs body.

Round-3's floor discovery invalidated every sync-per-call probe reading,
including round-2's stream-twin numbers (40ms — mostly the ~25ms dispatch
floor).  This probe re-runs the serving-shaped twins PIPELINED (depth calls
in flight, one sync), which finally splits the real 22.7ms serving wall
into its stream floor and its body:

  twin_bwd     reads em f32 + valid i8, writes bm f32   (9 B/cell), body=add
  twin_fwd     reads em + valid + bm, writes post      (13 B/cell), body=add
  twin_fwd_chainN  same streams + N-deep dependent op chain per diagonal
  ematch_pass  the XLA emission-precompute twin (3 i8 reads -> f32 write)
  serve        the production circ-em serving call (baseline)

If sum(twin walls) ~= serve wall, the kernels are DMA-bound and byte diets
pay; if the twins run far below serve, the wall is body, and byte diets
(valid-in-sign-bit, in-kernel emissions) are a dead end.  The chain twins
measure how much body hides under the same streams before the wall moves.

Each line: {"mode", "wall_ms", "gbps_eff"} (pipelined per-call wall).
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

    from marginalign_trna_tpu.parallel.runtime import with_retries

    D1 = 7008
    Wp = 24
    B = int(os.environ.get("PROBE_B", "2048"))
    reps = int(os.environ.get("PROBE_REPS", "2"))
    depth = int(os.environ.get("PROBE_DEPTH", "8"))

    print(json.dumps({"device": str(jax.devices()[0].device_kind),
                      "D1": D1, "Wp": Wp, "B": B, "depth": depth}),
          flush=True)

    def timed(run):
        """Pipelined per-call wall: depth dispatches, one sync, min of reps."""
        with_retries(lambda: float(run()), attempts=3)  # compile + warm

        def one():
            t0 = time.perf_counter()
            outs = [run() for _ in range(depth)]
            out = float(outs[-1])
            del outs, out
            return (time.perf_counter() - t0) / depth

        return min(with_retries(one, attempts=3) for _ in range(reps))

    def report(label, dt, nbytes):
        print(json.dumps({"mode": label, "wall_ms": dt * 1e3,
                          "gbps_eff": nbytes / dt / 1e9}), flush=True)

    K = 8
    G = D1 // K
    blk = pl.BlockSpec((K, Wp, B), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)

    def make_twin(n_f32_in, n_i8_in, chain=0):
        def kernel(*refs):
            ins_f32 = refs[:n_f32_in]
            ins_i8 = refs[n_f32_in:n_f32_in + n_i8_in]
            out = refs[n_f32_in + n_i8_in]
            acc_ref = refs[-1]
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _init():
                acc_ref[:, :] = jnp.zeros_like(acc_ref)

            acc = acc_ref[:, :]
            for kb in range(K):
                v = None
                for r in ins_f32:
                    t = r[kb]
                    v = t if v is None else v + t
                for r in ins_i8:
                    t = r[kb].astype(jnp.float32)
                    v = t if v is None else v + t
                for _ in range(chain):
                    acc = acc * 0.999 + v
                if chain == 0:
                    acc = acc + v
                out[kb] = acc
            acc_ref[:, :] = acc

        f = pl.pallas_call(
            kernel,
            grid=(G,),
            in_specs=[blk] * (n_f32_in + n_i8_in),
            out_specs=[blk],
            out_shape=[jax.ShapeDtypeStruct((D1, Wp, B), jnp.float32)],
            scratch_shapes=[pltpu.VMEM((Wp, B), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024),
        )
        ins = ([jnp.ones((D1, Wp, B), jnp.float32)] * n_f32_in
               + [jnp.ones((D1, Wp, B), jnp.int8)] * n_i8_in)
        nbytes = (n_f32_in + 1) * D1 * Wp * B * 4 + n_i8_in * D1 * Wp * B

        @jax.jit
        def run():
            return f(*ins)[0][-1, 0, :].sum()

        return run, nbytes

    def bench_twin(label, n_f32_in, n_i8_in, chain=0):
        try:
            run, nbytes = make_twin(n_f32_in, n_i8_in, chain)
            report(label, timed(run), nbytes)
        except Exception as e:
            print(json.dumps({"mode": label, "error":
                              type(e).__name__ + ": " + str(e)[:200]}),
                  flush=True)

    # The two serving passes as stream twins (body = one add).
    bench_twin("twin_bwd_r1f1i_w1", 1, 1)        # em + valid -> bm
    bench_twin("twin_fwd_r2f1i_w1", 2, 1)        # em + valid + bm -> post
    # Overlap: how much dependent body hides under the fwd streams.
    bench_twin("twin_fwd_chain12", 2, 1, chain=12)
    bench_twin("twin_fwd_chain28", 2, 1, chain=28)

    # The XLA emission-precompute twin: 2 int8 reads -> masked f32 write.
    xb = jnp.ones((D1, Wp, B), jnp.int8)
    yb = jnp.ones((D1, Wp, B), jnp.int8)
    vd = jnp.ones((D1, Wp, B), jnp.int8)
    tbl = np.linspace(0.1, 0.9, 25).reshape(5, 5)

    @jax.jit
    def ematch_run():
        xi = xb.astype(jnp.int32)
        yi = yb.astype(jnp.int32)
        out = jnp.zeros(xb.shape, jnp.float32)
        for a in range(5):
            row = None
            for c in range(5):
                term = jnp.where(yi == c, float(tbl[a][c]), 0.0)
                row = term if row is None else row + term
            out = out + jnp.where(xi == a, row, 0.0)
        out = out * vd.astype(jnp.float32)
        return out[-1, 0, :].sum()

    try:
        report("ematch_pass", timed(ematch_run), D1 * Wp * B * 7)
    except Exception as e:
        print(json.dumps({"mode": "ematch_pass", "error":
                          type(e).__name__ + ": " + str(e)[:200]}),
              flush=True)

    # Production serving baseline, same process / same chip state.
    try:
        from marginalign_trna_tpu.models.hmm import PairHmm
        from marginalign_trna_tpu.ops.dispatch import (
            fb_posteriors, make_fb_device_batch)
        from marginalign_trna_tpu.ops.fb import make_tables
        from __graft_entry__ import _example_batch

        batch = _example_batch(B, 3500, 3500, width=21, seed=1)
        hmm = PairHmm.load(os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "marginalign_trna_tpu", "models", "last_hmm_20.txt"))
        tables = make_tables(hmm)
        dev = make_fb_device_batch(batch)

        @jax.jit
        def serve():
            logZ, post = fb_posteriors(tables, dev)
            return logZ.sum() + post.sum()

        dt = timed(serve)
        cells = batch.dp_cells()
        print(json.dumps({"mode": "serve_circ_em", "wall_ms": dt * 1e3,
                          "cells_per_s": cells / dt}), flush=True)
    except Exception as e:
        print(json.dumps({"mode": "serve_circ_em", "error":
                          type(e).__name__ + ": " + str(e)[:200]}),
              flush=True)


if __name__ == "__main__":
    main()
