"""TPU smoke gate: compile + run every production kernel mode, tiny shapes.

Mosaic lowering rejects constructs the interpret-mode CPU suite cannot
catch (dynamic-offset sublane stores, partial-unroll fori_loops, cheap
sublane transposes, int8 relayouts — three such failures were found
on-chip in round 4 alone).  This script makes the manual "TPU-smoke every
new kernel" discipline mechanical: one process, one tiny batch per kernel
family, asserting finiteness and basic invariants.  Run it at round end
and after ANY kernel change:

    python benchmarks/tpu_smoke.py            # on the real chip
    MARGINALIGN_PLATFORM=cpu python benchmarks/tpu_smoke.py  # interpret

Prints one PASS/FAIL line per mode and exits nonzero on any failure.
"""
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

plat = os.environ.get("MARGINALIGN_PLATFORM")
if plat:
    import jax

    jax.config.update("jax_platforms", "cpu" if plat == "cpu" else plat)

import numpy as np


def _inputs(rng, n_pairs=5):
    reads = [rng.integers(0, 4, size=int(m)).astype(np.int8)
             for m in rng.integers(30, 90, size=n_pairs)]
    refs = [rng.integers(0, 4, size=int(n)).astype(np.int8)
            for n in rng.integers(30, 90, size=n_pairs)]
    return reads, refs


FAILED = []


def smoke(name):
    def deco(fn):
        def run(*a, **kw):
            t0 = time.time()
            try:
                fn(*a, **kw)
                print("PASS %-28s %.1fs" % (name, time.time() - t0),
                      flush=True)
            except Exception:
                FAILED.append(name)
                print("FAIL %-28s" % name, flush=True)
                traceback.print_exc()
        return run
    return deco


def main():
    import jax.numpy as jnp

    from marginalign_trna_tpu.models.hmm import PairHmm
    from marginalign_trna_tpu.ops import band as bandm
    from marginalign_trna_tpu.ops.band import (
        circ_flush_rows, circ_mw_streams_device, pack_banded_batch,
        pack_compact_batch, pack_multi_banded_batch,
    )
    from marginalign_trna_tpu.ops.fb import (
        circ_device_batch, device_batch, make_tables,
    )
    from marginalign_trna_tpu.ops import fb_pallas as fp
    from marginalign_trna_tpu.ops import fb_pallas_counts as fpc
    from marginalign_trna_tpu.ops import wavefront_pallas as wf
    from marginalign_trna_tpu.ops.bucket_scatter import (
        bucket_scatter, bucket_scatter_lanesum, monotone_gather,
    )

    rng = np.random.default_rng(11)
    hmm = PairHmm.load(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "marginalign_trna_tpu", "models", "last_hmm_20.txt",
    ))
    tables = make_tables(hmm)
    reads, refs = _inputs(rng)
    batch = pack_banded_batch(reads, refs, width=21, quantize=True)
    comp = pack_compact_batch(reads, refs, width=21, quantize=True)
    dev = device_batch(batch)
    cdev = circ_device_batch(batch)
    comp_dev = fp.compact_device_batch(comp)
    d1k = -(-batch.num_steps // fp.STEP_BLOCK) * fp.STEP_BLOCK

    def finite(*arrs):
        for a in arrs:
            a = np.asarray(a)
            if a.dtype.kind == "f":
                assert np.isfinite(a).all()

    @smoke("serve rel pre")
    def _s0():
        finite(*fp.posteriors_pallas_specialised(tables, dev))

    _s0()

    for mode in ("sv", "em", "lean", "ckpt", "emw"):
        @smoke("serve circ %s" % mode)
        def _s(mode=mode):
            logZ, post = fp.posteriors_pallas_circ(tables, cdev, mode=mode)
            finite(logZ, post)
            assert float(jnp.max(post)) <= 1.01

        _s()

    @smoke("serve mw fused")
    def _s1():
        fr, frr, lom = circ_mw_streams_device(
            jnp.asarray(batch.lo), batch.width, batch.wp, d1k
        )
        finite(*fp.posteriors_weights_pallas_circ(
            tables, cdev, fr, frr, lom))

    _s1()

    @smoke("serve cx fused")
    def _s2():
        fr = circ_flush_rows(batch, d1k)
        finite(*fp.posteriors_expectations_pallas_circ(tables, cdev, fr))

    _s2()

    @smoke("serve mw compact")
    def _s3():
        finite(*fp.posteriors_weights_pallas_compact(
            tables, comp_dev, comp.width))

    _s3()

    @smoke("serve cx compact")
    def _s4():
        finite(*fp.posteriors_expectations_pallas_compact(
            tables, comp_dev, comp.width))

    _s4()

    for kern in ("stored", "ckpt"):
        @smoke("counts %s" % kern)
        def _c(kern=kern):
            os.environ["MARGINALIGN_EM_KERNEL"] = kern
            try:
                res = fpc.counts_pallas(tables, dev)
                finite(res.logZ, res.trans_counts, res.emit_gap)
            finally:
                os.environ.pop("MARGINALIGN_EM_KERNEL", None)

        _c()

    @smoke("counts trials")
    def _c2():
        import jax

        stacked = jax.tree_util.tree_map(
            lambda a: jnp.stack([a, a]), tables
        )
        res = fpc.counts_pallas_trials(stacked, dev)
        finite(res.logZ, res.trans_counts)

    _c2()

    mb = pack_multi_banded_batch(reads, refs, width=21, pad_steps_to=256)
    mdev = fp.multi_device_batch(mb)

    @smoke("serve multi")
    def _m0():
        finite(*fp.posteriors_pallas_multi(tables, mdev))

    _m0()

    @smoke("counts multi")
    def _m1():
        res = fpc.counts_pallas_multi(tables, mdev)
        finite(res.logZ, res.trans_counts)

    _m1()

    @smoke("counts multi trials")
    def _m2():
        import jax

        stacked = jax.tree_util.tree_map(
            lambda a: jnp.stack([a, a]), tables
        )
        res = fpc.counts_pallas_multi_trials(stacked, mdev)
        finite(res.logZ, res.trans_counts)

    _m2()

    params = jnp.asarray([1.0, -1.0, -2.0, -0.5], jnp.float32)

    @smoke("nw wavefront")
    def _w0():
        res = wf.banded_nw_pallas(params, dev)
        finite(res.score)

    _w0()

    @smoke("nw wavefront multi")
    def _w1():
        res = wf.banded_nw_pallas_multi(params, mdev)
        finite(res.score)

    _w1()

    @smoke("mea wavefront")
    def _w2():
        D1, Wp, B = batch.xb.shape
        post = rng.random((D1, Wp, B)).astype(np.float32) * batch.valid
        wd = jnp.where(jnp.asarray(post) > 0, jnp.asarray(post), -1e30)
        zeros = jnp.zeros((D1, Wp, B), jnp.float32)
        res = wf.banded_mea_pallas(
            wd, zeros, zeros, jnp.asarray(batch.valid),
            jnp.asarray(batch.s1), jnp.asarray(batch.s2),
            jnp.asarray(batch.final_d), jnp.asarray(batch.final_k),
        )
        finite(res.score)

    _w2()

    @smoke("expand rel + nw packed")
    def _w4():
        from marginalign_trna_tpu.ops.band import band_masks_device
        from marginalign_trna_tpu.ops.fb import DeviceBatch
        from marginalign_trna_tpu.ops.nw import traceback
        from marginalign_trna_tpu import native

        d1k = -(-comp.num_steps // fp.STEP_BLOCK) * fp.STEP_BLOCK
        xbr, ybr = fp.expand_rel_codes(comp_dev, d1k)
        valid, s1, s2 = band_masks_device(
            comp_dev.lo, comp_dev.m, comp_dev.n, comp.width, comp.wp
        )
        devr = DeviceBatch(
            xb=xbr[: comp.num_steps], yb=ybr[: comp.num_steps],
            valid=valid, s1=s1, s2=s2,
            final_d=jnp.asarray(comp.final_d),
            final_k=jnp.asarray(comp.final_k),
        )
        res = wf.banded_nw_pallas(params, devr, pack_bits=4)
        finite(res.score)
        ptrs = np.asarray(res.pointers)
        fs = np.asarray(res.final_state)
        bits = 4
        if not native.available():
            ptrs = native.unpack_ptrs(ptrs, bits, comp.wp)
            bits = 8
        ops = traceback(ptrs, comp, 0, int(fs[0]), bits=bits)
        assert ops

    _w4()

    @smoke("mea delay-line")
    def _w3():
        D1, Wp, B = batch.xb.shape
        post = rng.random((D1, Wp, B)).astype(np.float32) * batch.valid
        rgm = -(-max(int(batch.m.max()), 1) // 256) * 256
        rgn = -(-max(int(batch.n.max()), 1) // 256) * 256
        accr = jnp.zeros((rgm, B), jnp.float32)
        accc = jnp.zeros((rgn, B), jnp.float32)
        res = wf.banded_mea_pallas_dl(
            jnp.asarray(post), batch.lo, batch.m, batch.n, batch.width,
            batch.final_d, batch.final_k, accr, accc, 0.5, 0.0,
        )
        finite(res.score)
        res_p = wf.banded_mea_pallas_dl(
            jnp.asarray(post), batch.lo, batch.m, batch.n, batch.width,
            batch.final_d, batch.final_k, accr, accc, 0.5, 0.0,
            pack_bits=2,
        )
        finite(res_p.score)
        assert np.asarray(res_p.pointers).shape[1] == batch.wp // 4

    _w3()

    @smoke("bucket scatter + gather")
    def _b0():
        D, B = 256, 128
        jm = np.minimum(
            np.cumsum(rng.integers(0, 2, size=(D, B)), axis=0), 255
        ).astype(np.int32)
        vals = rng.random((2, D, B)).astype(np.float32)
        out = bucket_scatter(jnp.asarray(vals), jnp.asarray(jm), 256)
        finite(out)
        out2 = bucket_scatter_lanesum(
            jnp.asarray(vals), jnp.asarray(jm), 256
        )
        finite(out2)
        src = rng.random((256, B)).astype(np.float32)
        got = monotone_gather(jnp.asarray(src), jnp.asarray(jm))
        finite(got)

    _b0()

    @smoke("device traceback scans")
    def _t0():
        from marginalign_trna_tpu.ops.nw import traceback
        from marginalign_trna_tpu.ops.traceback_device import (
            mea_moves_device, nw_moves_device, ops_from_moves,
            pack_moves, unpack_moves,
        )

        res = wf.banded_nw_pallas(params, dev)
        lo_d = jnp.asarray(batch.lo)
        m_d = jnp.asarray(batch.m)
        n_d = jnp.asarray(batch.n)
        mv = pack_moves(nw_moves_device(
            res.pointers, lo_d, m_d, n_d, res.final_state
        ))
        moves = unpack_moves(
            np.ascontiguousarray(np.asarray(mv)), batch.num_steps - 1
        )
        ptrs = np.ascontiguousarray(np.asarray(res.pointers))
        fs = np.asarray(res.final_state)
        for b in range(3):
            assert (ops_from_moves(moves, b)
                    == traceback(ptrs, batch, b, int(fs[b])))
        D1, Wp, B = batch.xb.shape
        post = rng.random((D1, Wp, B)).astype(np.float32) * batch.valid
        rgm = -(-max(int(batch.m.max()), 1) // 256) * 256
        rgn = -(-max(int(batch.n.max()), 1) // 256) * 256
        resm = wf.banded_mea_pallas_dl(
            jnp.asarray(post), batch.lo, batch.m, batch.n, batch.width,
            batch.final_d, batch.final_k,
            jnp.zeros((rgm, B), jnp.float32),
            jnp.zeros((rgn, B), jnp.float32), 0.5, 0.0,
        )
        mvm = pack_moves(mea_moves_device(resm.pointers, lo_d, m_d, n_d))
        movesm = unpack_moves(
            np.ascontiguousarray(np.asarray(mvm)), batch.num_steps - 1
        )
        assert ops_from_moves(movesm, 0)

    _t0()

    if FAILED:
        print("TPU SMOKE: %d FAILED: %s" % (len(FAILED), FAILED))
        sys.exit(1)
    print("TPU SMOKE: all kernel modes pass")


if __name__ == "__main__":
    main()
