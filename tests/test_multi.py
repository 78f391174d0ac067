"""Multi-problem lane packing: posteriors/logZ must match per-problem
single-lane runs (the short-read / tRNA production path)."""
import pytest
import numpy as np

from marginalign_trna_tpu.models.hmm import PairHmm
from marginalign_trna_tpu.ops.band import (
    pack_banded_batch, pack_multi_banded_batch, path_from_cigar,
    unpack_band, unpack_problem,
)
from marginalign_trna_tpu.ops.fb import device_batch, make_tables
from marginalign_trna_tpu.ops.fb_pallas import (
    multi_device_batch, posteriors_pallas_multi,
    posteriors_pallas_specialised,
)

MODEL = "/root/reference/src/margin/mappers/last_hmm_20.txt"


def _problems(rng, count=6):
    reads, refs, paths = [], [], []
    for p in range(count):
        m = int(rng.integers(8, 40))
        n = int(rng.integers(8, 40))
        reads.append(rng.integers(0, 4, size=m).astype(np.int8))
        refs.append(rng.integers(0, 4, size=n).astype(np.int8))
        paths.append(None)
    # One with a moving band.
    reads.append(np.concatenate([refs[0][:8], refs[0][8:]]))
    refs.append(refs[0].copy())
    paths.append(None)
    return reads, refs, paths


def test_multi_pack_matches_single(rng):
    reads, refs, paths = _problems(rng)
    hmm = PairHmm.load(MODEL)
    # Normalise like serving: flat gap emissions (required by the
    # specialised kernels' folding and the multi path).
    hmm.set_flat_indel_emissions()
    tables = make_tables(hmm)

    mb = pack_multi_banded_batch(reads, refs, width=9, paths=paths,
                                 pad_steps_to=96)
    assert mb.xb.shape[0] == 96
    # Packing actually shares lanes (otherwise the test is vacuous).
    lanes = {pr.lane for pr in mb.problems}
    assert len(lanes) < len(mb.problems)

    logZ_m, post_m = posteriors_pallas_multi(tables, multi_device_batch(mb))
    logZ_m = np.asarray(logZ_m)
    post_m = np.asarray(post_m)

    for p in range(len(reads)):
        sb = pack_banded_batch([reads[p]], [refs[p]], width=9,
                               paths=[paths[p]])
        logZ_s, post_s = posteriors_pallas_specialised(
            tables, device_batch(sb)
        )
        assert np.allclose(logZ_m[p], float(np.asarray(logZ_s)[0]),
                           rtol=1e-4, atol=1e-3), p
        dense_m = unpack_problem(post_m, mb, p)
        dense_s = unpack_band(np.asarray(post_s)[:, :, 0], sb, 0)
        assert np.allclose(dense_m, dense_s, atol=3e-4), p


def test_multi_pack_geometry(rng):
    reads, refs, paths = _problems(rng, count=4)
    mb = pack_multi_banded_batch(reads, refs, width=9, paths=paths,
                                 pad_steps_to=128)
    # Problems in one lane are separated and tagged consistently.
    for p, pr in enumerate(mb.problems):
        D = pr.m + pr.n
        assert pr.final_d == pr.d0 + D
        assert mb.start[pr.d0, pr.lane] == 1
        assert mb.find[pr.final_d, pr.lane] == pr.final_d
        assert mb.fink_steps[pr.final_d, pr.lane] == pr.final_k
        assert mb.valid[pr.d0, 0, pr.lane]
    # Spacers have no valid cells.
    by_lane = {}
    for pr in mb.problems:
        by_lane.setdefault(pr.lane, []).append(pr)
    for lane, prs in by_lane.items():
        prs.sort(key=lambda q: q.d0)
        for a, b in zip(prs, prs[1:]):
            assert b.d0 - a.final_d - 1 >= 2  # SPACER
            assert not mb.valid[a.final_d + 1 : b.d0, :, lane].any()


def test_multi_expectations_match_host(rng):
    from marginalign_trna_tpu.ops.band import pack_multi_banded_batch
    from marginalign_trna_tpu.ops.expectations import (
        band_expectations_host, multi_band_expectations,
    )

    reads, refs, paths = _problems(rng)
    mb = pack_multi_banded_batch(reads, refs, width=9, paths=paths,
                                 pad_steps_to=96)
    D1, Wp, B = mb.xb.shape
    post = (rng.random((D1, Wp, B)).astype(np.float32) * mb.valid)
    # Problems map into a 200-position global space at varied offsets.
    starts = (rng.integers(0, 150, size=len(reads))).astype(np.int64)
    got = np.zeros((200, 4))
    multi_band_expectations(post, mb, starts, got)

    want = np.zeros((200, 4))
    for p, pr in enumerate(mb.problems):
        # Re-pack just this problem's band values into a single-lane batch
        # shape so the host oracle can accumulate it.
        sb = pack_banded_batch([reads[p]], [refs[p]], width=9,
                               paths=[paths[p]])
        vals = np.zeros(sb.xb.shape, np.float32)
        vals[: pr.m + pr.n + 1, :, 0] = post[pr.d0 : pr.final_d + 1, :,
                                             pr.lane]
        want += band_expectations_host(
            vals, sb, np.array([starts[p]]), 200
        )
    assert np.allclose(got, want, rtol=1e-4, atol=1e-4)


def test_multi_mea_decode_matches_single(rng):
    import os

    from marginalign_trna_tpu.ops.band import pack_multi_banded_batch
    from marginalign_trna_tpu.ops.mea import mea_decode, mea_decode_multi

    reads, refs, paths = _problems(rng)
    mb = pack_multi_banded_batch(reads, refs, width=9, paths=paths,
                                 pad_steps_to=96)
    D1, Wp, B = mb.xb.shape
    # Use plausible posteriors (from the model) so decodes are meaningful.
    hmm = PairHmm.load(MODEL)
    hmm.set_flat_indel_emissions()
    tables = make_tables(hmm)
    _, post = posteriors_pallas_multi(tables, multi_device_batch(mb))
    post = np.asarray(post)

    got = mea_decode_multi(post, mb, 0.5, 0.0)

    def score_ops(ops, dense, gr, gc):
        s, i, j = 0.0, 0, 0
        for op, ln in ops:
            for _ in range(ln):
                if op == 0:
                    assert dense[i, j] > 0  # banned pairs never matched
                    s += dense[i, j]
                    i += 1
                    j += 1
                elif op == 1:
                    s += gr[i]
                    i += 1
                else:
                    s += gc[j]
                    j += 1
        return s

    os.environ["MARGINALIGN_MEA"] = "host"
    try:
        for p, pr in enumerate(mb.problems):
            sb = pack_banded_batch([reads[p]], [refs[p]], width=9,
                                   paths=[paths[p]])
            vals = np.zeros(sb.xb.shape, np.float32)
            vals[: pr.m + pr.n + 1, :, 0] = post[pr.d0 : pr.final_d + 1, :,
                                                 pr.lane]
            want = mea_decode(vals, sb, 0.5, 0.0)[0]
            if got[p] == want:
                continue
            # Equally-optimal ties are fine: assert identical objective.
            from marginalign_trna_tpu.ops.band import unpack_band

            dense = unpack_band(vals[:, :, 0], sb, 0, fill=0.0)
            r = dense.sum(axis=1)
            c = dense.sum(axis=0)
            gr = 0.5 * np.clip(1 - r, 0, 1)
            gc = 0.5 * np.clip(1 - c, 0, 1)
            sm = score_ops(got[p], dense, gr, gc)
            sh = score_ops(want, dense, gr, gc)
            assert abs(sm - sh) < 1e-3, (p, sm, sh)
    finally:
        del os.environ["MARGINALIGN_MEA"]


@pytest.mark.parametrize("em_kernel", ["stored", "ckpt"])
def test_multi_counts_match_engine(rng, monkeypatch, em_kernel):
    """counts_pallas_multi == summed per-problem forward_backward counts
    (dynamic tables, non-flat emissions: the EM-in-training case), on
    both E-step kernel families (the auto policy picks by HBM fit, so
    pin each explicitly)."""
    from marginalign_trna_tpu.ops.band import pack_multi_banded_batch
    from marginalign_trna_tpu.ops.fb import forward_backward
    from marginalign_trna_tpu.ops.fb_pallas_counts import (
        counts_pallas_multi, match_counts_from_posteriors_multi,
    )

    monkeypatch.setenv("MARGINALIGN_EM_KERNEL", em_kernel)
    reads, refs, paths = _problems(rng)
    mb = pack_multi_banded_batch(reads, refs, width=9, paths=paths,
                                 pad_steps_to=96)
    hmm = PairHmm.load(MODEL)  # non-flat gap emissions on purpose
    tables = make_tables(hmm)
    mdev = multi_device_batch(mb)
    res = counts_pallas_multi(tables, mdev)
    em_m = (res.emit_match if res.emit_match is not None
            else match_counts_from_posteriors_multi(res.posteriors, mdev))

    tc = np.zeros((5, 5))
    em = np.zeros((5, 5))
    eg = np.zeros((5, 5))
    for p in range(len(reads)):
        sb = pack_banded_batch([reads[p]], [refs[p]], width=9,
                               paths=[paths[p]])
        ref = forward_backward(tables, device_batch(sb),
                               want_posteriors=False, want_counts=True)
        assert np.allclose(float(np.asarray(res.logZ)[p]),
                           float(np.asarray(ref.logZ)[0]),
                           rtol=1e-4, atol=1e-3), p
        tc += np.asarray(ref.trans_counts)
        em += np.asarray(ref.emit_match)
        eg += np.asarray(ref.emit_gap)
    assert np.allclose(np.asarray(res.trans_counts), tc,
                       rtol=1e-3, atol=1e-3)
    assert np.allclose(np.asarray(em_m), em, rtol=1e-3, atol=1e-3)
    assert np.allclose(np.asarray(res.emit_gap), eg, rtol=1e-3, atol=1e-3)


def test_em_multi_smoke(rng):
    """train_em through the multi path: likelihood increases, model valid."""
    import os

    from marginalign_trna_tpu.align.em import EmOptions, train_em
    from marginalign_trna_tpu.align.realign import RealignJob

    jobs = []
    for _ in range(6):
        ref = rng.integers(0, 4, size=30).astype(np.int8)
        read = ref.copy()
        subs = rng.random(30) < 0.15
        read[subs] = (read[subs] + 1) % 4
        jobs.append(RealignJob(record=None, read_region=read,
                               ref_region=ref, path=None))
    os.environ["MARGINALIGN_MULTI"] = "on"
    try:
        res = train_em(
            jobs,
            EmOptions(trials=1, iterations=3, random_start=False,
                      band_width=9, seed=1),
            input_hmm=PairHmm.load(MODEL),
        )
    finally:
        del os.environ["MARGINALIGN_MULTI"]
    hist = res.likelihood_history
    assert len(hist) >= 2
    assert hist[-1] >= hist[0] - 1e-6
    assert np.allclose(res.hmm.transitions.sum(axis=1), 1.0, atol=1e-3)


@pytest.mark.parametrize("em_kernel", ["stored", "ckpt"])
def test_trials_kernels_match_single_trial(rng, monkeypatch, em_kernel):
    """counts_pallas_trials / counts_pallas_multi_trials (trials = major
    grid axis) match per-trial single-model kernel calls, on both E-step
    kernel families."""
    import jax.numpy as jnp

    monkeypatch.setenv("MARGINALIGN_EM_KERNEL", em_kernel)

    from marginalign_trna_tpu.ops.band import pack_multi_banded_batch
    from marginalign_trna_tpu.ops.fb import FbTables
    from marginalign_trna_tpu.ops.fb_pallas_counts import (
        counts_pallas, counts_pallas_multi, counts_pallas_multi_trials,
        counts_pallas_trials,
    )

    hmm = PairHmm.load(MODEL)
    t0 = make_tables(hmm)
    # Second trial: perturbed transitions (renormalised).
    T1 = np.asarray(t0.T) * (0.8 + 0.4 * rng.random((5, 5)))
    T1 = np.where(np.asarray(t0.T) > 0, T1, 0.0)
    T1 = T1 / T1.sum(axis=1, keepdims=True)
    t1 = t0._replace(T=jnp.asarray(T1, jnp.float32))
    stacked = FbTables(
        T=jnp.stack([t0.T, t1.T]),
        Ematch=jnp.stack([t0.Ematch, t1.Ematch]),
        Egap=jnp.stack([t0.Egap, t1.Egap]),
        pi=jnp.stack([t0.pi, t1.pi]),
    )

    reads, refs, paths = _problems(rng)

    # Single-problem batch.
    batch = pack_banded_batch(reads, refs, width=9, paths=paths,
                              pad_batch_to=8)
    dev = device_batch(batch)
    res_tr = counts_pallas_trials(stacked, dev)
    for tr, tables in enumerate((t0, t1)):
        ref = counts_pallas(tables, dev)
        assert np.allclose(np.asarray(res_tr.logZ[tr]),
                           np.asarray(ref.logZ), rtol=1e-4, atol=1e-4)
        assert np.allclose(np.asarray(res_tr.trans_counts[tr]),
                           np.asarray(ref.trans_counts),
                           rtol=1e-3, atol=1e-3)
        # ckpt folds match counts in-kernel; stored derives them from the
        # posterior band.
        from marginalign_trna_tpu.ops.fb_pallas_counts import (
            match_counts_from_posteriors, match_counts_from_posteriors_trials,
        )

        em_tr = (res_tr.emit_match if res_tr.emit_match is not None
                 else match_counts_from_posteriors_trials(
                     res_tr.posteriors, dev))
        em_ref = (ref.emit_match if ref.emit_match is not None
                  else match_counts_from_posteriors(ref.posteriors, dev))
        assert np.allclose(np.asarray(em_tr[tr]), np.asarray(em_ref),
                           rtol=1e-3, atol=1e-3)
        if res_tr.posteriors is not None and ref.posteriors is not None:
            assert np.allclose(np.asarray(res_tr.posteriors[tr]),
                               np.asarray(ref.posteriors), atol=2e-4)

    # Multi-problem lanes.
    mb = pack_multi_banded_batch(reads, refs, width=9, paths=paths,
                                 pad_steps_to=96)
    mdev = multi_device_batch(mb)
    res_mtr = counts_pallas_multi_trials(stacked, mdev)
    for tr, tables in enumerate((t0, t1)):
        ref = counts_pallas_multi(tables, mdev)
        assert np.allclose(np.asarray(res_mtr.logZ[tr]),
                           np.asarray(ref.logZ), rtol=1e-4, atol=1e-4)
        assert np.allclose(np.asarray(res_mtr.trans_counts[tr]),
                           np.asarray(ref.trans_counts),
                           rtol=1e-3, atol=1e-3)
        from marginalign_trna_tpu.ops.fb_pallas_counts import (
            match_counts_from_posteriors_multi,
            match_counts_from_posteriors_multi_trials,
        )

        em_mtr = (res_mtr.emit_match if res_mtr.emit_match is not None
                  else match_counts_from_posteriors_multi_trials(
                      res_mtr.posteriors, mdev))
        em_mref = (ref.emit_match if ref.emit_match is not None
                   else match_counts_from_posteriors_multi(
                       ref.posteriors, mdev))
        assert np.allclose(np.asarray(em_mtr[tr]), np.asarray(em_mref),
                           rtol=1e-3, atol=1e-3)
        if res_mtr.posteriors is not None and ref.posteriors is not None:
            assert np.allclose(np.asarray(res_mtr.posteriors[tr]),
                               np.asarray(ref.posteriors), atol=2e-4)
