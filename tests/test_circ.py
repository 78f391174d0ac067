"""Circular-band-layout FB kernels vs the band-relative paths.

The circular layout (band.circular_streams) stores row r = i mod Wp; the
kernels then use unconditional single-row rotates instead of conditional
roll+select band motion.  These tests check the layout conversion is a
bijection on in-band cells and that the circ kernels reproduce the
specialised band-relative kernels exactly (same arithmetic, reindexed).
"""
import numpy as np
import pytest

from marginalign_trna_tpu.models.hmm import PairHmm
from marginalign_trna_tpu.ops.band import (
    circ_to_rel, circular_streams, pack_banded_batch, path_from_cigar,
)
from marginalign_trna_tpu.ops.fb import (
    circ_device_batch, device_batch, forward_backward, make_tables,
)
from marginalign_trna_tpu.ops.fb_pallas import (
    posteriors_pallas_circ, posteriors_pallas_specialised,
)

REF_MAPPERS = "/root/reference/src/margin/mappers"


def _mixed_batch(rng):
    hmm = PairHmm.load(REF_MAPPERS + "/last_hmm_20.txt")
    reads = [rng.integers(0, 4, size=m).astype(np.int8) for m in (9, 17, 30)]
    refs = [rng.integers(0, 4, size=n).astype(np.int8) for n in (12, 15, 28)]
    batch = pack_banded_batch(reads, refs, width=31, pad_batch_to=4)
    return hmm, batch


def test_circular_streams_roundtrip(rng):
    _, batch = _mixed_batch(rng)
    xb_c, yb_c, valid_c, fink = circular_streams(batch)
    assert valid_c.sum() == batch.valid.sum()
    # circ_to_rel inverts the conversion on every stream.
    assert np.array_equal(circ_to_rel(xb_c, batch), batch.xb)
    assert np.array_equal(circ_to_rel(yb_c, batch), batch.yb)
    assert np.array_equal(circ_to_rel(valid_c, batch), batch.valid)
    # Terminal row: i = m lives at m mod Wp.
    assert np.array_equal(fink, batch.m % batch.wp)
    # Spot-check the row map on valid cells: circ[d, (lo+k) % Wp] == rel.
    d = int(batch.final_d[0]) // 2
    for k in range(batch.width):
        if not batch.valid[d, k, 0]:
            continue
        r = (int(batch.lo[d, 0]) + k) % batch.wp
        assert valid_c[d, r, 0]
        assert xb_c[d, r, 0] == batch.xb[d, k, 0]


def test_circ_posteriors_match_engine(rng):
    hmm, batch = _mixed_batch(rng)
    tables = make_tables(hmm)
    ref = forward_backward(tables, device_batch(batch),
                           want_posteriors=True)
    logZ, post_c = posteriors_pallas_circ(tables, circ_device_batch(batch))
    assert np.allclose(np.asarray(logZ)[:3], np.asarray(ref.logZ)[:3],
                       rtol=1e-4, atol=1e-4)
    post = circ_to_rel(np.asarray(post_c), batch)
    # Compare in-band cells only (the layouts park zeros differently in
    # guard rows).
    ok = batch.valid
    assert np.allclose(post[ok], np.asarray(ref.posteriors)[ok], atol=2e-4)
    assert np.allclose(post[~ok], 0.0, atol=2e-4)


def test_circ_matches_specialised_with_moving_band(rng):
    """Guide-path case: the band offset actually moves, so the circular
    row map is exercised (lo motion is where the layouts differ)."""
    hmm = PairHmm.load(REF_MAPPERS + "/last_hmm_20.txt")
    n = 80
    x = rng.integers(0, 4, size=n).astype(np.int8)
    y = np.concatenate([x[:40], x[50:]])  # 10-base deletion
    pd, pi = path_from_cigar([(0, 40), (2, 10), (0, 30)])
    batch = pack_banded_batch([y], [x], width=21, paths=[(pd, pi)])
    tables = make_tables(hmm)
    logZ_s, post_s = posteriors_pallas_specialised(
        tables, device_batch(batch)
    )
    logZ_c, post_c = posteriors_pallas_circ(tables, circ_device_batch(batch))
    assert np.allclose(float(logZ_c[0]), float(logZ_s[0]), rtol=1e-5,
                       atol=1e-4)
    post = circ_to_rel(np.asarray(post_c), batch)
    ok = batch.valid
    assert np.allclose(post[ok], np.asarray(post_s)[ok], atol=1e-5)


@pytest.mark.parametrize("mode", ["lean", "ckpt", "sv", "emw"])
def test_circ_stream_diets_match_streamed(rng, mode):
    """The in-kernel-emission (lean) and checkpoint-recompute (ckpt) circ
    paths compute exactly what the emission-streamed circ path does."""
    hmm, batch = _mixed_batch(rng)
    tables = make_tables(hmm)
    cdev = circ_device_batch(batch)
    logZ_a, post_a = posteriors_pallas_circ(tables, cdev, mode="em")
    logZ_b, post_b = posteriors_pallas_circ(tables, cdev, mode=mode)
    assert np.allclose(np.asarray(logZ_b)[:3], np.asarray(logZ_a)[:3],
                       rtol=1e-6, atol=1e-6)
    assert np.allclose(np.asarray(post_b), np.asarray(post_a), atol=1e-6)


def test_circ_ckpt_matches_oracle(rng):
    """mode="ckpt" against the engine oracle (not just the streamed twin):
    logZ and in-band posteriors within the usual tolerances."""
    hmm, batch = _mixed_batch(rng)
    tables = make_tables(hmm)
    ref = forward_backward(tables, device_batch(batch),
                           want_posteriors=True)
    logZ, post_c = posteriors_pallas_circ(
        tables, circ_device_batch(batch), mode="ckpt"
    )
    assert np.allclose(np.asarray(logZ)[:3], np.asarray(ref.logZ)[:3],
                       rtol=1e-4, atol=1e-4)
    post = circ_to_rel(np.asarray(post_c), batch)
    ok = batch.valid
    assert np.allclose(post[ok], np.asarray(ref.posteriors)[ok], atol=2e-4)


@pytest.mark.parametrize("mode", ["em", "sv", "emw"])
def test_circ_generic_branch_non_chain_model(rng, mode):
    """A flat-gap model whose transitions break the gap-chain pattern
    exercises the circ kernels' generic (non-gap-chain) branch — in the
    default mode and in the sv/emw signed-emission kernels, which carry
    their own copy of that branch."""
    import jax.numpy as jnp

    from marginalign_trna_tpu.ops.fb_pallas import (
        _flat_gap_consts, _gap_chain_consts, static_tables,
    )

    hmm, batch = _mixed_batch(rng)
    tables = make_tables(hmm)
    # Move some mass between gap states 1 and 2 (renormalise the rows).
    T = np.asarray(tables.T).copy()
    for s, t in ((1, 2), (2, 1)):
        T[s, t] = 0.05
    T = T / T.sum(axis=1, keepdims=True)
    tables = tables._replace(T=jnp.asarray(T))
    st = static_tables(tables)
    assert _gap_chain_consts(st, _flat_gap_consts(st)) is None

    ref = forward_backward(tables, device_batch(batch),
                           want_posteriors=True)
    logZ, post_c = posteriors_pallas_circ(
        tables, circ_device_batch(batch), mode=mode
    )
    assert np.allclose(np.asarray(logZ)[:3], np.asarray(ref.logZ)[:3],
                       rtol=1e-4, atol=1e-4)
    post = circ_to_rel(np.asarray(post_c), batch)
    ok = batch.valid
    assert np.allclose(post[ok], np.asarray(ref.posteriors)[ok], atol=2e-4)


@pytest.mark.parametrize("assembly", ["scatter", "gather"])
def test_fused_cx_expectations_match_host_oracle(rng, assembly,
                                                 monkeypatch):
    """The fused caller serving path (cx kernel: expectations accumulated
    in rolling VMEM scratch, flushed one position per diagonal, no
    posterior band in HBM) reproduces the host np.add.at oracle — via
    both the bucket-scatter assembly and the gather fallback."""
    monkeypatch.setenv("MARGINALIGN_ASSEMBLY", assembly)
    from marginalign_trna_tpu.ops.expectations import (
        band_expectations_cx, band_expectations_host,
    )
    from marginalign_trna_tpu.ops.fb import forward_backward

    hmm = PairHmm.load(REF_MAPPERS + "/last_hmm_20.txt")
    n = 80
    x = rng.integers(0, 4, size=n).astype(np.int8)
    y = np.concatenate([x[:40], x[50:]])  # moving band (deletion)
    pd, pi = path_from_cigar([(0, 40), (2, 10), (0, 30)])
    x2 = rng.integers(0, 4, size=60).astype(np.int8)
    y2 = rng.integers(0, 4, size=55).astype(np.int8)
    x3 = rng.integers(0, 4, size=33).astype(np.int8)
    y3 = np.concatenate(
        [x3[:20], rng.integers(0, 4, size=9).astype(np.int8), x3[20:]]
    )  # insertion
    pd3, pi3 = path_from_cigar([(0, 20), (1, 9), (0, 13)])
    batch = pack_banded_batch(
        [y, y2, y3], [x, x2, x3], width=21,
        paths=[(pd, pi), None, (pd3, pi3)], pad_batch_to=4,
    )
    tables = make_tables(hmm)
    offsets = np.array([0, 90, 160, 0], dtype=np.int64)
    total = 200

    res = forward_backward(tables, device_batch(batch),
                           want_posteriors=True)
    want = band_expectations_host(
        np.asarray(res.posteriors), batch, offsets, total, n_real=3
    )
    got = band_expectations_cx(
        tables, batch, circ_device_batch(batch), offsets, total, n_real=3
    )
    assert got.shape == (total, 4)
    assert np.allclose(got, want, atol=2e-3), (
        np.abs(got - want).max()
    )


def test_fused_cx_logZ_matches_engine(rng):
    """The cx pass's logZ (from the emw backward) matches the engine."""
    from marginalign_trna_tpu.ops.band import circ_flush_rows
    from marginalign_trna_tpu.ops.fb_pallas import (
        STEP_BLOCK, posteriors_expectations_pallas_circ,
    )

    hmm, batch = _mixed_batch(rng)
    tables = make_tables(hmm)
    ref = forward_backward(tables, device_batch(batch),
                           want_posteriors=False)
    d1k = -(-batch.num_steps // STEP_BLOCK) * STEP_BLOCK
    logZ, _, _ = posteriors_expectations_pallas_circ(
        tables, circ_device_batch(batch), circ_flush_rows(batch, d1k)
    )
    assert np.allclose(np.asarray(logZ)[:3], np.asarray(ref.logZ)[:3],
                       rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("assembly", ["scatter", "gather"])
def test_fused_mw_posteriors_and_sums_match_oracle(rng, assembly,
                                                   monkeypatch):
    """The mw (realign-fused) kernel's posterior band matches the em-mode
    band, and its flushed row/col posterior sums match numpy sums over
    the band — via both assembly paths."""
    monkeypatch.setenv("MARGINALIGN_ASSEMBLY", assembly)
    from marginalign_trna_tpu.ops.band import (
        circ_flush_rows, circ_row_flush_rows,
    )
    from marginalign_trna_tpu.ops.fb_pallas import (
        STEP_BLOCK, posteriors_weights_pallas_circ,
    )
    from marginalign_trna_tpu.ops.mea import rowcol_sums_from_flushed

    hmm = PairHmm.load(REF_MAPPERS + "/last_hmm_20.txt")
    n = 80
    x = rng.integers(0, 4, size=n).astype(np.int8)
    y = np.concatenate([x[:40], x[50:]])
    pd, pi = path_from_cigar([(0, 40), (2, 10), (0, 30)])
    x2 = rng.integers(0, 4, size=60).astype(np.int8)
    y2 = rng.integers(0, 4, size=55).astype(np.int8)
    batch = pack_banded_batch([y, y2], [x, x2], width=21,
                              paths=[(pd, pi), None], pad_batch_to=4)
    tables = make_tables(hmm)
    cdev = circ_device_batch(batch)
    d1k = -(-batch.num_steps // STEP_BLOCK) * STEP_BLOCK

    # mw shares the sv backward, so sv parity is bit-class (1e-6); em
    # parity is the established cross-mode float-noise bound (2e-4).
    # mw's posterior band comes back BAND-RELATIVE (in-kernel rotation);
    # the plain serving modes return circular.
    from marginalign_trna_tpu.ops.band import circ_lo_mod_rows

    logZ_s, post_s = posteriors_pallas_circ(tables, cdev, mode="sv")
    logZ_a, post_a = posteriors_pallas_circ(tables, cdev, mode="em")
    logZ_b, post_b, flc, flr, tc, tr = posteriors_weights_pallas_circ(
        tables, cdev, circ_flush_rows(batch, d1k),
        circ_row_flush_rows(batch, d1k), circ_lo_mod_rows(batch, d1k),
    )
    post_s_rel = circ_to_rel(np.asarray(post_s), batch)
    post_a_rel = circ_to_rel(np.asarray(post_a), batch)
    assert np.allclose(np.asarray(logZ_b)[:2], np.asarray(logZ_s)[:2],
                       rtol=1e-6, atol=1e-6)
    assert np.allclose(np.asarray(post_b), post_s_rel, atol=1e-6)
    assert np.allclose(np.asarray(logZ_b)[:2], np.asarray(logZ_a)[:2],
                       rtol=1e-4, atol=1e-4)
    assert np.allclose(np.asarray(post_b), post_a_rel, atol=2e-4)

    accr, accc = rowcol_sums_from_flushed(batch, flc, flr, tc, tr)
    accr, accc = np.asarray(accr), np.asarray(accc)

    post_rel = circ_to_rel(np.asarray(post_a), batch)
    ks = np.arange(batch.wp)
    for b, (m, nn) in enumerate(((len(y), n), (len(y2), 60))):
        D = m + nn
        lo = batch.lo[: D + 1, b]
        i_idx = lo[:, None] + ks[None, :]
        j_idx = np.arange(D + 1)[:, None] - i_idx
        ok = batch.valid[: D + 1, :, b] & (i_idx >= 1) & (j_idx >= 1)
        pv = post_rel[: D + 1, :, b]
        r = np.zeros(m)
        c = np.zeros(nn)
        np.add.at(r, np.clip(i_idx - 1, 0, m - 1)[ok], pv[ok])
        np.add.at(c, np.clip(j_idx - 1, 0, nn - 1)[ok], pv[ok])
        assert np.allclose(accr[:m, b], r, atol=2e-3), (
            b, np.abs(accr[:m, b] - r).max()
        )
        assert np.allclose(accc[:nn, b], c, atol=2e-3), (
            b, np.abs(accc[:nn, b] - c).max()
        )


def test_fused_realign_matches_unfused(rng):
    """End-to-end realign consistency: the fused mw path produces the
    same realigned operations as the segment-sum weights path."""
    import os

    from marginalign_trna_tpu.align.realign import (
        RealignJob, realigned_ops_for_jobs,
    )
    from marginalign_trna_tpu.io.sam import SamRecord

    hmm = PairHmm.load(REF_MAPPERS + "/last_hmm_20.txt")
    jobs = []
    for idx in range(3):
        n = int(rng.integers(40, 90))
        ref = rng.integers(0, 4, size=n).astype(np.int8)
        read = ref.copy()
        subs = rng.random(n) < 0.15
        read[subs] = rng.integers(0, 4, size=int(subs.sum()))
        rec = SamRecord(qname="r%d" % idx, flag=0, rname="ref", pos=0,
                        mapq=255, cigar=[(0, n)], seq="A" * n)
        pd, pi = path_from_cigar([(0, n)])
        jobs.append(RealignJob(record=rec, read_region=read,
                               ref_region=ref, path=(pd, pi)))

    env = {"MARGINALIGN_KERNEL": "pallas", "MARGINALIGN_LAYOUT": "circ",
           "MARGINALIGN_MULTI": "off"}
    saved = {k: os.environ.get(k) for k in list(env) + [
        "MARGINALIGN_REALIGN_FUSED"]}
    os.environ.update(env)
    try:
        os.environ["MARGINALIGN_REALIGN_FUSED"] = "on"
        ops_fused = realigned_ops_for_jobs(jobs, hmm, 0.5, 0.0)
        os.environ["MARGINALIGN_REALIGN_FUSED"] = "off"
        ops_band = realigned_ops_for_jobs(jobs, hmm, 0.5, 0.0)
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    assert ops_fused == ops_band


def test_circ_to_rel_device_matches_host(rng):
    """The device gather used by the realign pipeline reproduces the host
    circ_to_rel exactly."""
    from marginalign_trna_tpu.ops.band import circ_to_rel_device

    _, batch = _mixed_batch(rng)
    vals = rng.random(batch.xb.shape).astype(np.float32)
    dev = circ_to_rel_device(vals, batch.lo)
    assert np.array_equal(np.asarray(dev), circ_to_rel(vals, batch))


def test_circ_band_expectations_match_host(rng):
    """Device circ-layout caller expectations (shear + 2-gather run
    boundaries) match the host np.add.at oracle."""
    from marginalign_trna_tpu.ops.expectations import (
        band_expectations_circ, band_expectations_host,
    )

    hmm = PairHmm.load(REF_MAPPERS + "/last_hmm_20.txt")
    n = 80
    x = rng.integers(0, 4, size=n).astype(np.int8)
    y = np.concatenate([x[:40], x[50:]])  # moving band
    pd, pi = path_from_cigar([(0, 40), (2, 10), (0, 30)])
    x2 = rng.integers(0, 4, size=60).astype(np.int8)
    y2 = rng.integers(0, 4, size=55).astype(np.int8)
    batch = pack_banded_batch([y, y2], [x, x2], width=21,
                              paths=[(pd, pi), None], pad_batch_to=4)
    tables = make_tables(hmm)
    cdev = circ_device_batch(batch)
    _, post_c = posteriors_pallas_circ(tables, cdev)

    offsets = np.array([100, 300, 0, 0], np.int64)
    total = 400
    exp_c = band_expectations_circ(post_c, batch, cdev, offsets, total,
                                   n_real=2)
    post_rel = circ_to_rel(np.asarray(post_c), batch)
    exp_h = band_expectations_host(post_rel, batch, offsets, total,
                                   n_real=2)
    assert np.allclose(exp_c, exp_h, atol=1e-5)


def test_fused_caller_matches_unfused(tmp_path, monkeypatch):
    """End-to-end caller consistency: the fused cx serving path (no
    posterior band) calls the same variants as the posterior-band +
    segment-sum circ path, Pallas interpret mode on CPU."""
    from marginalign_trna_tpu.call.caller import CallerOptions, margin_caller
    from marginalign_trna_tpu.io.sam import SamFile

    monkeypatch.setenv("MARGINALIGN_KERNEL", "pallas")
    monkeypatch.setenv("MARGINALIGN_LAYOUT", "circ")
    monkeypatch.setenv("MARGINALIGN_MULTI", "off")
    fixtures = "/root/reference/tests"
    sam = SamFile.read(fixtures + "/inputBigMutations.sam")
    sam.records = sam.records[:2]
    sam_path = str(tmp_path / "two.sam")
    sam.write(sam_path)
    hmm = PairHmm.load(REF_MAPPERS + "/last_hmm_20.txt")
    ref = fixtures + "/referencesMutated.fa"

    monkeypatch.setenv("MARGINALIGN_CALLER_FUSED", "on")
    calls_fused = margin_caller(
        sam_path, ref, str(tmp_path / "fused.vcf"),
        alignment_model=hmm, error_model=hmm,
    )
    monkeypatch.setenv("MARGINALIGN_CALLER_FUSED", "off")
    calls_band = margin_caller(
        sam_path, ref, str(tmp_path / "band.vcf"),
        alignment_model=hmm, error_model=hmm,
    )
    assert {(c[0], c[1], c[2]) for c in calls_fused} == {
        (c[0], c[1], c[2]) for c in calls_band
    }
    assert calls_fused  # non-trivial


def test_circ_pipeline_smoke(rng, tmp_path, monkeypatch):
    """Force the circular layout through the CLI-level align+call pipeline
    on CPU (Pallas interpret): the circ consumer wiring in realign.py and
    caller.py must produce a valid SAM and VCF."""
    monkeypatch.setenv("MARGINALIGN_KERNEL", "pallas")
    monkeypatch.setenv("MARGINALIGN_LAYOUT", "circ")
    import subprocess
    import sys

    repo = "/root/repo"
    out_sam = str(tmp_path / "out.sam")
    r = subprocess.run(
        [sys.executable, repo + "/marginAlign",
         "/root/reference/tests/lessReads.fq",
         "/root/reference/tests/references.fa", out_sam],
        capture_output=True, text=True, timeout=3600,
        env=dict(__import__("os").environ,
                 MARGINALIGN_PLATFORM="cpu", JAX_PLATFORMS="cpu"),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    n_aligned = sum(
        1 for ln in open(out_sam) if ln.strip() and not ln.startswith("@")
    )
    assert n_aligned >= 4


def test_mea_dl_kernel_matches_weights_oracle(rng):
    """The delay-line MEA kernel (in-kernel gap-weight windows fed by
    monotone_gather entering streams) reproduces the XLA banded_mea run
    on explicitly materialised wdiag/wup/wleft built from the SAME
    accr/accc sums — on a batch whose band actually moves (indel path),
    so both window roll directions and injections are exercised."""
    import jax.numpy as jnp

    from marginalign_trna_tpu.ops.mea import (
        NEG, _round_up, _weights_from_sums_jit, banded_mea,
    )
    from marginalign_trna_tpu.ops.wavefront_pallas import (
        banded_mea_pallas_dl,
    )

    n = 90
    x = rng.integers(0, 4, size=n).astype(np.int8)
    y = np.concatenate([x[:30], x[42:]])  # deletion: band steps right
    pd, pi = path_from_cigar([(0, 30), (2, 12), (0, 48)])
    y2 = np.concatenate(
        [x[:50], rng.integers(0, 4, size=9).astype(np.int8), x[50:]]
    )  # insertion: band plateaus
    pd2, pi2 = path_from_cigar([(0, 50), (1, 9), (0, 40)])
    x3 = rng.integers(0, 4, size=70).astype(np.int8)
    y3 = rng.integers(0, 4, size=64).astype(np.int8)
    batch = pack_banded_batch(
        [y, y2, y3], [x, x, x3], width=21,
        paths=[(pd, pi), (pd2, pi2), None], pad_batch_to=4,
    )
    D1, Wp, B = batch.valid.shape
    rgm = _round_up(int(batch.m.max()), 256)
    rgn = _round_up(int(batch.n.max()), 256)
    post = (rng.random((D1, Wp, B)).astype(np.float32)
            * batch.valid * 0.9)
    accr = rng.random((rgm, B)).astype(np.float32)
    accc = rng.random((rgn, B)).astype(np.float32)
    gap, mg = 0.5, 0.05

    wup, wleft = _weights_from_sums_jit(
        jnp.asarray(accr), jnp.asarray(accc), jnp.asarray(batch.valid),
        jnp.asarray(batch.lo), jnp.float32(gap), rgm=rgm, rgn=rgn,
    )
    wdiag = np.where((post >= mg) & (post > 0), post, NEG).astype(
        np.float32
    )
    want = banded_mea(
        jnp.asarray(wdiag), wup, wleft, jnp.asarray(batch.valid),
        jnp.asarray(batch.s1), jnp.asarray(batch.s2),
        jnp.asarray(batch.final_d), jnp.asarray(batch.final_k),
    )
    got = banded_mea_pallas_dl(
        post, batch.lo, batch.m, batch.n, batch.width, batch.final_d,
        batch.final_k, accr, accc, gap, mg,
    )
    # Padded lanes differ benignly (0 vs NEG terminal); real lanes must
    # match.
    assert np.allclose(np.asarray(got.score)[:3],
                       np.asarray(want.score)[:3],
                       rtol=1e-5, atol=1e-4), (
        np.asarray(got.score), np.asarray(want.score)
    )
    # Decoded paths may differ by structural ties (swapping an adjacent
    # left/up pair between the same endpoints adds the same
    # g_ref[j-1] + g_read[i-1] either way), so assert the two paths
    # score identically under the oracle weights.
    from marginalign_trna_tpu.ops.mea import _traceback_one

    wup_n, wleft_n = np.asarray(wup), np.asarray(wleft)
    lo_np = batch.lo.astype(np.int64)

    def path_score(pointers, b):
        total, i, j = 0.0, 0, 0
        for op, ln in _traceback_one(pointers, batch, b):
            for _ in range(ln):
                if op == 0:
                    i, j = i + 1, j + 1
                elif op == 2:
                    j += 1
                else:
                    i += 1
                d = i + j
                k = i - int(lo_np[d, b])
                total += (wdiag[d, k, b] if op == 0
                          else wleft_n[d, k, b] if op == 2
                          else wup_n[d, k, b])
        return total

    pw = np.asarray(want.pointers)
    pg = np.asarray(got.pointers)[: pw.shape[0]]
    for b in range(3):
        sw, sg = path_score(pw, b), path_score(pg, b)
        assert abs(sw - sg) < 1e-3, (b, sw, sg)
