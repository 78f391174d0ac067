"""Pipelined (steady-state) re-tune of the serving kernel's K and B.

Every round-1/2 parameter conclusion (K=8 sweet spot, batch scaling) was
timed sync-per-call and therefore sat on the ~25ms dispatch floor
(benchmarks/floor_probe.py); this re-measures with the floor removed.
One (K, B) config per SUBPROCESS (K binds at module import).

Usage: python benchmarks/pipelined_sweep.py            # run the sweep
       SWEEP_ONE=1 K=8 B=2048 python ...pipelined_sweep.py  # one point
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one():
    import functools

    import jax

    from __graft_entry__ import _example_batch
    from marginalign_trna_tpu.models.hmm import PairHmm
    from marginalign_trna_tpu.ops.fb import circ_device_batch, make_tables
    from marginalign_trna_tpu.ops.fb_pallas import (
        _posteriors_circ_static, static_tables,
    )
    from marginalign_trna_tpu.parallel.runtime import with_retries

    K = int(os.environ["K"])
    B = int(os.environ["B"])
    mode = os.environ.get("MODE", "em")
    depth = int(os.environ.get("PROBE_DEPTH", "8"))
    read_len = int(os.environ.get("BENCH_READ_LEN", "3500"))

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

    if mode in ("cx", "cxk", "cxa", "cxs", "cxg", "cxl", "cxsl"):
        # Fused caller serving: FB + in-kernel expectation accumulation +
        # the gather assembly into [rg, 4] (the complete caller device
        # cost; there is no posterior band).
        import jax.numpy as jnp
        import numpy as np

        from marginalign_trna_tpu.ops.band import circ_flush_rows
        from marginalign_trna_tpu.ops.expectations import (
            _fused_assemble, _round_up, fused_expectation_indices,
        )
        from marginalign_trna_tpu.ops.fb_pallas import (
            STEP_BLOCK, _posteriors_circ_cx_static,
        )

        from marginalign_trna_tpu.ops.bucket_scatter import (
            bucket_scatter_chunked, group_spread_ok, pad_group_rows,
        )
        from marginalign_trna_tpu.ops.expectations import fused_flush_jmaps

        d1k = -(-batch.num_steps // STEP_BLOCK) * STEP_BLOCK
        rg = _round_up(read_len + 100, 512)
        offsets = np.zeros(B, np.int64)
        fr = jnp.asarray(circ_flush_rows(batch, d1k))
        df, ti = fused_expectation_indices(batch, offsets, rg, B, d1k)
        dfj, tij = jnp.asarray(df), jnp.asarray(ti)
        jmap, jtail = fused_flush_jmaps(batch, offsets, B, d1k)
        jm_all = np.concatenate([jmap, jtail], axis=0)
        assert group_spread_ok(jm_all, rg), "bench batch violates spread"
        jmj = jnp.asarray(jm_all)

        @functools.partial(jax.jit, static_argnames=("s",))
        def serve_cx(s, c, frj, jmv):
            logZ, fl, tails = _posteriors_circ_cx_static(s, c, frj)
            vals = jnp.concatenate([fl, tails], axis=1)
            vals, jmp = pad_group_rows(vals, jmv)
            out3 = bucket_scatter_chunked(vals, jmp, rg)
            return logZ.sum() + out3.sum()

        @functools.partial(jax.jit, static_argnames=("s",))
        def serve_cxg(s, c, frj, dfv, tiv):
            logZ, fl, tails = _posteriors_circ_cx_static(s, c, frj)
            return logZ.sum() + _fused_assemble(fl, tails, dfv, tiv).sum()

        @functools.partial(jax.jit, static_argnames=("s",))
        def serve_cxk(s, c, frj):
            # Kernel only (no assembly) — isolates kernel vs gather cost.
            logZ, fl, tails = _posteriors_circ_cx_static(s, c, frj)
            return logZ.sum() + fl.sum() + tails.sum()

        fl0 = jnp.zeros((4, d1k, B), jnp.float32)
        tl0 = jnp.zeros((4, batch.wp, B), jnp.float32)

        @jax.jit
        def serve_cxa(dfv, tiv):
            # Gather assembly only.
            return _fused_assemble(fl0, tl0, dfv, tiv).sum()

        @jax.jit
        def serve_cxs(jmv):
            # Scatter assembly only.
            vals, jmp = pad_group_rows(
                jnp.concatenate([fl0, tl0], axis=1), jmv
            )
            return bucket_scatter_chunked(vals, jmp, rg).sum()

        from marginalign_trna_tpu.ops.bucket_scatter import (
            bucket_scatter_lanesum,
        )

        @jax.jit
        def serve_cxsl(jmv):
            # Lane-summed scatter assembly only.
            vals, jmp = pad_group_rows(
                jnp.concatenate([fl0, tl0], axis=1), jmv
            )
            return bucket_scatter_lanesum(vals, jmp, rg).sum()

        @functools.partial(jax.jit, static_argnames=("s",))
        def serve_cxl(s, c, frj, jmv):
            # Full fused caller with the lane-summed assembly (the
            # production band_expectations_cx path).
            logZ, fl, tails = _posteriors_circ_cx_static(s, c, frj)
            vals, jmp = pad_group_rows(
                jnp.concatenate([fl, tails], axis=1), jmv
            )
            return logZ.sum() + bucket_scatter_lanesum(
                vals, jmp, rg
            ).sum()

        def serve_scalar(s, c, m):
            if mode == "cxk":
                return serve_cxk(s, c, fr)
            if mode == "cxa":
                return serve_cxa(dfj, tij)
            if mode == "cxs":
                return serve_cxs(jmj)
            if mode == "cxsl":
                return serve_cxsl(jmj)
            if mode == "cxl":
                return serve_cxl(s, c, fr, jmj)
            if mode == "cxg":
                return serve_cxg(s, c, fr, dfj, tij)
            return serve_cx(s, c, fr, jmj)
    elif mode in ("mw", "mwk", "mwold", "wgo", "rold", "rnew", "c2r",
                  "dlk", "mg", "ssc1"):
        # Fused realign serving (mw kernel) vs the old two-pass path,
        # both measured to the same product: posterior band + (wup,
        # wleft) MEA gap weights.  mwk = mw kernel only (no assembly).
        import jax.numpy as jnp
        import numpy as np

        from marginalign_trna_tpu.ops.band import (
            circ_flush_rows, circ_lo_mod_rows, circ_row_flush_rows,
            circ_to_rel_device,
        )
        from marginalign_trna_tpu.ops.expectations import (
            _round_up, _scatter_assemble, fused_flush_jmaps,
            fused_row_jmaps,
        )
        from marginalign_trna_tpu.ops.fb_pallas import (
            STEP_BLOCK, _posteriors_circ_mw_static,
        )
        from marginalign_trna_tpu.ops.mea import (
            _mea_weights_jit, _weights_from_sums_jit,
        )
        from marginalign_trna_tpu.ops.expectations import (
            read_position_boundaries, run_boundaries,
        )

        gap = jnp.float32(0.5)
        d1k = -(-batch.num_steps // STEP_BLOCK) * STEP_BLOCK
        fr = jnp.asarray(circ_flush_rows(batch, d1k))
        frr = jnp.asarray(circ_row_flush_rows(batch, d1k))
        lom = jnp.asarray(circ_lo_mod_rows(batch, d1k))
        rgm = _round_up(max(int(batch.m.max()), 1), 256)
        rgn = _round_up(max(int(batch.n.max()), 1), 256)
        validj = jnp.asarray(batch.valid)
        loj = jnp.asarray(batch.lo)
        jmc, jtc = fused_flush_jmaps(
            batch, np.zeros(B, np.int64), B, d1k
        )
        jmr, jtr = fused_row_jmaps(batch, B, d1k)
        e1r = jnp.asarray(read_position_boundaries(batch, rgm, B))
        e1c = jnp.asarray(
            run_boundaries(batch, np.zeros(B, np.int64), rgn, B)
        )

        # NOTE: these compositions are deliberately NOT wrapped in one
        # outer jit: closure-captured index arrays would be baked into
        # the executable as constants and blow the remote-compile
        # request size (HTTP 413).  Each piece is jitted with array
        # ARGS, like the production pipelines.
        sumj = jax.jit(lambda *xs: sum(x.sum() for x in xs))

        def serve_mw(s, c, frj, frrj):
            logZ, post, flc, flr, tc, tr = _posteriors_circ_mw_static(
                s, c, frj, frrj, lom
            )
            accc = _scatter_assemble(flc[None], tc[None], jmc, jtc, rgn)
            accr = _scatter_assemble(flr[None], tr[None], jmr, jtr, rgm)
            assert accc is not None and accr is not None
            wup, wleft = _weights_from_sums_jit(
                accr[0, :rgm], accc[0, :rgn], validj, loj, gap,
                rgm=rgm, rgn=rgn,
            )
            return sumj(logZ, post, wup, wleft)

        def serve_mwk(s, c, frj, frrj):
            logZ, post, flc, flr, tc, tr = _posteriors_circ_mw_static(
                s, c, frj, frrj, lom
            )
            return sumj(logZ, post, flc, flr, tc, tr)

        def serve_mwold(s, c):
            logZ, post = _posteriors_circ_static(s, c, mode="em")
            postr = circ_to_rel_device(post, loj)
            wup, wleft = _mea_weights_jit(
                postr, validj, loj, e1r, e1c, gap,
                width=batch.width, rgm=rgm, rgn=rgn,
            )
            return sumj(logZ, postr, wup, wleft)

        accr0 = jnp.zeros((rgm, B), jnp.float32)
        accc0 = jnp.zeros((rgn, B), jnp.float32)

        # Full realign device cost, old vs new: rold = em FB +
        # circ->rel + segment-sum weights + MEA wavefront; rnew = mw FB
        # (in-kernel weight sums) + scatter assembly + delay-line MEA.
        from marginalign_trna_tpu.ops.mea import NEG as MEA_NEG
        from marginalign_trna_tpu.ops.mea import mea_weights_device
        from marginalign_trna_tpu.ops.wavefront_pallas import (
            _mea_dl_jit, banded_mea_pallas,
        )

        s1j = jnp.asarray(batch.s1)
        s2j = jnp.asarray(batch.s2)
        fdj = jnp.asarray(batch.final_d)
        fkj = jnp.asarray(batch.final_k)

        maskj = jax.jit(
            lambda p: jnp.where(p > 0, p, MEA_NEG)
        )
        ptrsumj = jax.jit(
            lambda logZ, sc, ptrs: logZ.sum() + sc.sum()
            + ptrs.astype(jnp.int32).sum()
        )

        def serve_rold(s, c):
            logZ, post = _posteriors_circ_static(s, c, mode="em")
            postr = circ_to_rel_device(post, loj)
            wup, wleft = mea_weights_device(postr, batch, 0.5)
            wdiag = maskj(postr)
            res = banded_mea_pallas(wdiag, wup, wleft, validj, s1j,
                                    s2j, fdj, fkj)
            return ptrsumj(logZ, res.score, res.pointers)

        def serve_rnew(s, c):
            # post comes back band-relative from the mw forward.
            logZ, postr, flc, flr, tc, tr = _posteriors_circ_mw_static(
                s, c, fr, frr, lom
            )
            accc = _scatter_assemble(flc[None], tc[None], jmc, jtc, rgn)
            accr = _scatter_assemble(flr[None], tr[None], jmr, jtr, rgm)
            ptrs, terms = _mea_dl_jit(
                postr, validj, s1j, s2j, fkj, loj,
                accr[0, :rgm], accc[0, :rgn],
                jnp.float32(0.5), jnp.float32(0.0), rgm=rgm, rgn=rgn,
            )
            return ptrsumj(logZ, terms, ptrs)

        def serve_wgo(ar, ac):
            # Weights gather-back only (band-layout wup/wleft from
            # per-position sums) — isolates the take_along_axis cost.
            wup, wleft = _weights_from_sums_jit(
                ar, ac, validj, loj, gap, rgm=rgm, rgn=rgn,
            )
            return sumj(wup, wleft)

        serve_rold_j = serve_rold
        serve_rnew_j = serve_rnew

        post0 = jnp.zeros(batch.valid.shape, jnp.float32)

        def serve_c2r(p):
            # circ->rel conversion only (the sublane-dim gather on the
            # default realign path).
            return sumj(circ_to_rel_device(p, loj))

        from marginalign_trna_tpu.ops.bucket_scatter import (
            monotone_gather,
        )
        from marginalign_trna_tpu.ops.wavefront_pallas import _mea_dl_jit

        accr0f = jnp.zeros((rgm, B), jnp.float32)
        accc0f = jnp.zeros((rgn, B), jnp.float32)
        post0f = jnp.zeros(batch.valid.shape, jnp.float32)
        d1g = -(-d1k // 128) * 128
        mgidx = jnp.asarray(
            np.minimum(
                np.arange(d1g, dtype=np.int32)[:, None]
                + np.zeros((1, B), np.int32), rgm - 1
            )
        )
        g0 = jnp.zeros((rgm, B), jnp.float32)

        def serve_dlk(postv, ar, ac):
            ptrs, terms = _mea_dl_jit(
                postv, validj, s1j, s2j, fkj, loj, ar, ac,
                jnp.float32(0.5), jnp.float32(0.0), rgm=rgm, rgn=rgn,
            )
            return ptrsumj(terms, terms, ptrs)

        def serve_mg(srcv, idxv):
            return sumj(monotone_gather(srcv, idxv))

        def serve_ssc1(flv, tcv):
            out = _scatter_assemble(flv, tcv, jmc, jtc, rgn)
            return sumj(out)

        fl1 = jnp.zeros((1, d1k, B), jnp.float32)
        tc1 = jnp.zeros((1, batch.wp, B), jnp.float32)

        def serve_scalar(s, c, m):
            if mode == "dlk":
                return serve_dlk(post0f, accr0f, accc0f)
            if mode == "mg":
                return serve_mg(g0, mgidx)
            if mode == "ssc1":
                return serve_ssc1(fl1, tc1)
            if mode == "mwk":
                return serve_mwk(s, c, fr, frr)
            if mode == "mwold":
                return serve_mwold(s, c)
            if mode == "wgo":
                return serve_wgo(accr0, accc0)
            if mode == "rold":
                return serve_rold_j(s, c)
            if mode == "rnew":
                return serve_rnew_j(s, c)
            if mode == "c2r":
                return serve_c2r(post0)
            return serve_mw(s, c, fr, frr)
    else:
        @functools.partial(jax.jit, static_argnames=("s", "m"))
        def serve_scalar(s, c, m):
            logZ, post = _posteriors_circ_static(s, c, mode=m)
            return logZ.sum() + post.sum()

    with_retries(lambda: float(serve_scalar(st, cdev, mode)), attempts=3)

    def pipelined():
        t0 = time.perf_counter()
        outs = [serve_scalar(st, cdev, mode) for _ in range(depth)]
        out = float(outs[-1])
        del outs, out
        return (time.perf_counter() - t0) / depth

    dt = min(with_retries(pipelined, attempts=3) for _ in range(3))
    print(json.dumps({"K": K, "B": B, "mode": mode,
                      "wall_ms": dt * 1e3,
                      "cells_per_sec": cells / dt}), flush=True)


def main():
    if os.environ.get("SWEEP_ONE") == "1":
        run_one()
        return
    configs = [
        # (K, B, mode)
        (8, 2048, "em"),
        (16, 2048, "em"),
        (32, 2048, "em"),
        (4, 2048, "em"),
        (8, 1024, "em"),
        (8, 3072, "em"),
        (8, 4096, "lean"),
    ]
    for K, B, mode in configs:
        env = dict(os.environ, SWEEP_ONE="1", K=str(K), B=str(B), MODE=mode,
                   MARGINALIGN_STEP_BLOCK=str(K))
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            capture_output=True, text=True, timeout=3600, env=env,
        )
        for ln in r.stdout.splitlines():
            if ln.startswith("{"):
                print(ln, flush=True)
        if r.returncode != 0:
            print(json.dumps({"K": K, "B": B, "mode": mode,
                              "error": r.stderr[-300:]}), flush=True)


if __name__ == "__main__":
    main()
