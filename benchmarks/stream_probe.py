"""Characterise the Pallas streaming floor the serving kernels sit on.

Round-2/3 probes established: the serving wall tracks neither VPU op count
(removing all band motion: ~2%) nor naive bytes/peak-BW (ckpt halves bytes
and LOSES 35%).  The working model is wall ~= streamed_bytes / BW_eff +
body, with BW_eff ~190 GB/s and poor DMA/compute overlap.  This probe
measures BW_eff directly as a function of: stream count, direction,
dtype/tiling (f32 vs int8), block K, and a synthetic dependent-op chain in
the body (overlap test).

Each measurement prints one JSON line {"mode", "wall_ms", "gbps_eff"}.
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

    from marginalign_trna_tpu.parallel.runtime import with_retries

    D1 = 7008
    Wp = 24
    B = int(os.environ.get("PROBE_B", "2048"))
    reps = int(os.environ.get("PROBE_REPS", "3"))

    print(json.dumps({"device": str(jax.devices()[0].device_kind),
                      "D1": D1, "Wp": Wp, "B": B}), flush=True)

    def make_probe(n_in_f32, n_in_i8, n_out_f32, K, chain=0):
        """Kernel streaming the given block counts per grid step, with an
        optional per-diagonal dependent-op chain (length `chain`) between
        a VMEM-carried frontier and itself, like the DP recurrence."""
        G = D1 // K

        def kernel(*refs):
            ins_f32 = refs[:n_in_f32]
            ins_i8 = refs[n_in_f32:n_in_f32 + n_in_i8]
            outs = refs[n_in_f32 + n_in_i8:
                        n_in_f32 + n_in_i8 + n_out_f32]
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
                if v is None:
                    v = jnp.full((Wp, B), float(kb), jnp.float32)
                # Dependent chain: each op needs the previous one (and the
                # carried frontier), like the wavefront recurrence.
                for c in range(chain):
                    acc = acc * 0.999 + v
                if chain == 0:
                    acc = acc + v
                for o in outs:
                    o[kb] = acc
            acc_ref[:, :] = acc

        blk = pl.BlockSpec((K, Wp, B), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
        f = pl.pallas_call(
            kernel,
            grid=(G,),
            in_specs=[blk] * (n_in_f32 + n_in_i8),
            out_specs=[blk] * max(n_out_f32, 1),
            out_shape=[jax.ShapeDtypeStruct((D1, Wp, B), jnp.float32)]
            * max(n_out_f32, 1),
            scratch_shapes=[pltpu.VMEM((Wp, B), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024
            ),
        )
        ins = (
            [jnp.ones((D1, Wp, B), jnp.float32)] * n_in_f32
            + [jnp.ones((D1, Wp, B), jnp.int8)] * n_in_i8
        )
        bytes_moved = (
            (n_in_f32 + max(n_out_f32, 1)) * D1 * Wp * B * 4
            + n_in_i8 * D1 * Wp * B
        )

        @jax.jit
        def run():
            outs = f(*ins)
            return outs[0][-1, 0, :].sum()

        return run, bytes_moved

    def bench(label, n_in_f32, n_in_i8, n_out_f32, K, chain=0):
        try:
            run, nbytes = make_probe(n_in_f32, n_in_i8, n_out_f32, K, chain)

            def call():
                return float(run())

            with_retries(call, attempts=3)
            t0 = time.perf_counter()
            for _ in range(reps):
                with_retries(call, attempts=3)
            dt = (time.perf_counter() - t0) / reps
            print(json.dumps({"mode": label, "wall_ms": dt * 1e3,
                              "gbps_eff": nbytes / dt / 1e9}), flush=True)
        except Exception as e:
            print(json.dumps({"mode": label,
                              "error": type(e).__name__ + ": "
                              + str(e)[:200]}), flush=True)

    # Direction / count scaling at serving block size (K=8).
    bench("r1f32_w0_K8", 1, 0, 0, 8)      # 1 read + 1 (dummy) write
    bench("r1f32_w1_K8", 1, 0, 1, 8)      # em + post -like
    bench("r2f32_w1_K8", 2, 0, 1, 8)      # em + bm + post (fwd pass shape)
    bench("r0_w1f32_K8", 0, 0, 1, 8)      # write-only
    bench("r3i8_w1_K8", 0, 3, 1, 8)       # lean fwd-ish input side
    bench("r1i8_w1_K8", 0, 1, 1, 8)       # packed-code candidate
    # Block-size scaling (bigger DMAs per grid step).
    bench("r2f32_w1_K32", 2, 0, 1, 32)
    bench("r2f32_w1_K2", 2, 0, 1, 2)
    # Overlap: dependent chain behind the same streams.
    bench("r2f32_w1_K8_chain8", 2, 0, 1, 8, chain=8)
    bench("r2f32_w1_K8_chain32", 2, 0, 1, 8, chain=32)


if __name__ == "__main__":
    main()
