"""Device-side stream expansion (fb_pallas compact serving) equality.

The compact path uploads packed sequences + band offsets (~50MB at
production sizes) and re-derives the circ-layout signed-emission / yb /
flush-row streams on device; these tests pin it EXACTLY to the host
constructors (band.circular_streams + fb_pallas._precompute_ematch) and
to the full fused serving outputs.
"""
import numpy as np
import pytest

from marginalign_trna_tpu.ops.band import (
    circ_flush_rows, circ_lo_mod_rows, circ_row_flush_rows,
    circular_streams, pack_banded_batch, pack_compact_batch,
    path_from_cigar,
)

pytestmark = []


def _mk_inputs(rng):
    reads = [rng.integers(0, 4, size=mm).astype(np.int8)
             for mm in (40, 73, 80, 5, 64)]
    refs = [rng.integers(0, 4, size=nn).astype(np.int8)
            for nn in (45, 70, 77, 8, 60)]
    paths = [None] * len(reads)
    # one indel-ful guide path
    m0, n0 = len(reads[2]), len(refs[2])
    c = min(m0, n0) // 2
    paths[2] = path_from_cigar([(0, c), (1, m0 - c), (2, n0 - c)])
    return reads, refs, paths


def test_pack_compact_matches_full(rng):
    """Geometry fields of the compact pack equal the full pack."""
    reads, refs, paths = _mk_inputs(rng)
    full = pack_banded_batch(reads, refs, width=21, paths=paths,
                             quantize=True)
    comp = pack_compact_batch(reads, refs, width=21, paths=paths,
                              quantize=True)
    assert comp.num_steps == full.num_steps
    assert comp.batch == full.batch
    assert comp.wp == full.wp
    assert np.array_equal(comp.lo, full.lo)
    assert np.array_equal(comp.m, full.m)
    assert np.array_equal(comp.n, full.n)
    assert np.array_equal(comp.final_d, full.final_d)
    assert np.array_equal(comp.final_k, full.final_k)
    assert comp.dp_cells() == full.dp_cells()
    for b in range(len(reads)):
        assert np.array_equal(comp.reads_p[: len(reads[b]), b], reads[b])
        assert np.array_equal(comp.refs_p[: len(refs[b]), b], refs[b])


def _host_es(st, batch):
    import jax.numpy as jnp

    from marginalign_trna_tpu.ops.fb_pallas import (
        STEP_BLOCK, _pad_steps, _precompute_ematch,
    )

    xb_c, yb_c, valid_c, fink = circular_streams(batch)
    d1k = -(-batch.num_steps // STEP_BLOCK) * STEP_BLOCK
    vf = _pad_steps(jnp.asarray(valid_c), d1k).astype(jnp.float32)
    xb = _pad_steps(jnp.asarray(xb_c), d1k)
    yb = _pad_steps(jnp.asarray(yb_c), d1k)
    es = _precompute_ematch(st, xb, yb) * vf - (1.0 - vf)
    return np.asarray(es), np.asarray(yb_c), np.asarray(valid_c), d1k


def test_expand_streams_match_host(rng):
    """es / yb / fr / frr / lom from the device expansion equal the host
    constructions exactly (yb compared at valid cells — invalid cells
    are clip artefacts on the host and window garbage on the device,
    both masked by es = -1)."""
    from marginalign_trna_tpu.models.hmm import PairHmm
    from marginalign_trna_tpu.ops.fb import make_tables
    from marginalign_trna_tpu.ops.fb_pallas import (
        _expand_streams, compact_device_batch, static_tables,
    )

    hmm = PairHmm.load(
        "marginalign_trna_tpu/models/last_hmm_20.txt"
    )
    st = static_tables(make_tables(hmm))
    reads, refs, paths = _mk_inputs(rng)
    full = pack_banded_batch(reads, refs, width=21, paths=paths,
                             quantize=True)
    comp = pack_compact_batch(reads, refs, width=21, paths=paths,
                              quantize=True)
    es_h, yb_h, valid_h, d1k = _host_es(st, full)

    es_d, yb_d, fr_d, frr_d, lom_d = _expand_streams(
        st, compact_device_batch(comp), full.width, d1k, want_yb=True
    )
    es_d = np.asarray(es_d)
    assert np.array_equal(es_d, es_h), (es_d != es_h).sum()
    yb_d = np.asarray(yb_d)[: valid_h.shape[0]]
    assert np.array_equal(
        np.where(valid_h, yb_d, 0), np.where(valid_h, yb_h, 0)
    )
    assert np.array_equal(np.asarray(fr_d), circ_flush_rows(full, d1k))
    assert np.array_equal(np.asarray(frr_d),
                          circ_row_flush_rows(full, d1k))
    assert np.array_equal(np.asarray(lom_d), circ_lo_mod_rows(full, d1k))


def test_compact_mw_serving_matches_circ(rng):
    """Full fused realign serving: compact == circ path outputs."""
    import jax.numpy as jnp

    from marginalign_trna_tpu.models.hmm import PairHmm
    from marginalign_trna_tpu.ops.band import circ_mw_streams_device
    from marginalign_trna_tpu.ops.fb import circ_device_batch, make_tables
    from marginalign_trna_tpu.ops.fb_pallas import (
        STEP_BLOCK, compact_device_batch, posteriors_weights_pallas_circ,
        posteriors_weights_pallas_compact,
    )

    hmm = PairHmm.load("marginalign_trna_tpu/models/last_hmm_20.txt")
    tables = make_tables(hmm)
    reads, refs, paths = _mk_inputs(rng)
    full = pack_banded_batch(reads, refs, width=21, paths=paths,
                             quantize=True)
    comp = pack_compact_batch(reads, refs, width=21, paths=paths,
                              quantize=True)

    d1k = -(-full.num_steps // STEP_BLOCK) * STEP_BLOCK
    fr, frr, lom = circ_mw_streams_device(
        jnp.asarray(full.lo), full.width, full.wp, d1k
    )
    want = posteriors_weights_pallas_circ(
        tables, circ_device_batch(full), fr, frr, lom
    )
    got = posteriors_weights_pallas_compact(
        tables, compact_device_batch(comp), full.width
    )
    names = ("logZ", "post", "flc", "flr", "tc", "tr")
    for nm, w, g in zip(names, want, got):
        w, g = np.asarray(w), np.asarray(g)
        assert w.shape == g.shape, (nm, w.shape, g.shape)
        assert np.array_equal(w, g), (nm, np.abs(w - g).max())


def test_realign_production_compact_matches_host_streams(rng, monkeypatch):
    """realigned_ops_for_jobs output is identical with device-expanded
    streams (compact) vs host-built circ streams."""
    from marginalign_trna_tpu.align.realign import (
        RealignJob, realigned_ops_for_jobs,
    )
    from marginalign_trna_tpu.models.hmm import PairHmm

    hmm = PairHmm.load("marginalign_trna_tpu/models/last_hmm_20.txt")
    reads, refs, paths = _mk_inputs(rng)
    jobs = [
        RealignJob(record=None, read_region=r, ref_region=f,
                   path=p if p is not None else path_from_cigar(
                       [(0, min(len(r), len(f)))]
                       + ([(1, len(r) - min(len(r), len(f)))]
                          if len(r) > len(f) else
                          [(2, len(f) - min(len(r), len(f)))])))
        for r, f, p in zip(reads, refs, paths)
    ]
    monkeypatch.setenv("MARGINALIGN_KERNEL", "pallas")
    monkeypatch.setenv("MARGINALIGN_COMPACT", "off")
    want = realigned_ops_for_jobs(jobs, hmm, 0.5, 0.0)
    monkeypatch.setenv("MARGINALIGN_COMPACT", "on")
    got = realigned_ops_for_jobs(jobs, hmm, 0.5, 0.0)
    assert want == got


def test_caller_production_compact_matches_host_streams(rng, monkeypatch):
    """accumulate_expectations is identical with device-expanded streams
    (compact) vs host-built circ streams."""
    from marginalign_trna_tpu.call.caller import (
        CallerOptions, accumulate_expectations,
    )
    from marginalign_trna_tpu.io.sam import SamFile, SamRecord, make_header
    from marginalign_trna_tpu.models.hmm import PairHmm
    from marginalign_trna_tpu.utils.seq import BASES

    hmm = PairHmm.load("marginalign_trna_tpu/models/last_hmm_20.txt")
    ref_codes = rng.integers(0, 4, size=200)
    ref_seq = "".join(BASES[c] for c in ref_codes)
    records = []
    for i in range(4):
        start = int(rng.integers(0, 40))
        ln = int(rng.integers(60, 120))
        read = ref_codes[start : start + ln].copy()
        subs = rng.random(ln) < 0.1
        read[subs] = rng.integers(0, 4, size=int(subs.sum()))
        seq = "".join(BASES[c] for c in read)
        records.append(SamRecord(
            qname="r%d" % i, flag=0, rname="ref", pos=start, mapq=60,
            cigar=[(0, ln)], seq=seq, qual="*",
        ))
    sam = SamFile(make_header([("ref", 200)]), records)
    opts = CallerOptions(split_size=0)

    monkeypatch.setenv("MARGINALIGN_KERNEL", "pallas")
    monkeypatch.setenv("MARGINALIGN_COMPACT", "off")
    want = accumulate_expectations(sam, {"ref": ref_seq}, hmm, opts)
    monkeypatch.setenv("MARGINALIGN_COMPACT", "on")
    got = accumulate_expectations(sam, {"ref": ref_seq}, hmm, opts)
    for k in want:
        assert np.array_equal(want[k], got[k]), k


def test_expand_rel_codes_match_host(rng):
    """Device REL-layout code expansion equals pack_banded_batch's
    xb/yb at every in-band cell."""
    from marginalign_trna_tpu.ops.fb_pallas import (
        STEP_BLOCK, compact_device_batch, expand_rel_codes,
    )

    reads, refs, paths = _mk_inputs(rng)
    full = pack_banded_batch(reads, refs, width=21, paths=paths,
                             quantize=True)
    comp = pack_compact_batch(reads, refs, width=21, paths=paths,
                              quantize=True)
    d1k = -(-comp.num_steps // STEP_BLOCK) * STEP_BLOCK
    xb, yb = expand_rel_codes(compact_device_batch(comp), d1k)
    xb = np.asarray(xb)[: full.num_steps]
    yb = np.asarray(yb)[: full.num_steps]
    v = full.valid
    assert np.array_equal(np.where(v, xb, 0), np.where(v, full.xb, 0))
    assert np.array_equal(np.where(v, yb, 0), np.where(v, full.yb, 0))


def test_packed_ptr_roundtrip(rng):
    """pack_ptr_bits (device) and native.unpack_ptrs (host) invert."""
    import jax.numpy as jnp

    from marginalign_trna_tpu import native
    from marginalign_trna_tpu.ops.wavefront_pallas import pack_ptr_bits

    for bits, hi in ((2, 3), (4, 16)):
        ptrs = rng.integers(0, hi, size=(16, 24, 8)).astype(np.int32)
        packed = np.asarray(pack_ptr_bits(jnp.asarray(ptrs), bits))
        assert packed.shape == (16, 24 * bits // 8, 8)
        un = native.unpack_ptrs(packed, bits, 24)
        assert np.array_equal(un, ptrs.astype(np.uint8))


def test_nw_packed_traceback_matches_unpacked(rng):
    """4-bit packed NW pointers decode to the identical ops (native
    packed fetch vs the legacy unpacked path)."""
    import jax.numpy as jnp

    from marginalign_trna_tpu.ops.fb import device_batch
    from marginalign_trna_tpu.ops.nw import traceback
    from marginalign_trna_tpu.ops.wavefront_pallas import banded_nw_pallas

    reads, refs, paths = _mk_inputs(rng)
    full = pack_banded_batch(reads, refs, width=21, paths=paths,
                             quantize=True)
    dev = device_batch(full)
    params = jnp.asarray([1.0, -2.0, -3.0, -1.0], jnp.float32)
    plain = banded_nw_pallas(params, dev)
    packed = banded_nw_pallas(params, dev, pack_bits=4)
    fs = np.asarray(plain.final_state)
    assert np.array_equal(fs, np.asarray(packed.final_state))
    pp = np.asarray(plain.pointers)
    pk = np.asarray(packed.pointers)
    for b in range(len(reads)):
        want = traceback(pp, full, b, int(fs[b]))
        got = traceback(pk, full, b, int(fs[b]), bits=4)
        assert want == got, b


def test_mea_packed_traceback_matches_unpacked(rng):
    """2-bit packed DL MEA pointers decode to the identical ops."""
    from marginalign_trna_tpu.ops.mea import _round_up, _traceback_one
    from marginalign_trna_tpu.ops.wavefront_pallas import (
        banded_mea_pallas_dl,
    )

    reads, refs, paths = _mk_inputs(rng)
    full = pack_banded_batch(reads, refs, width=21, paths=paths,
                             quantize=True)
    D1, Wp, B = full.valid.shape
    post = (rng.random((D1, Wp, B)).astype(np.float32) * full.valid)
    rgm = _round_up(max(int(full.m.max()), 1), 256)
    rgn = _round_up(max(int(full.n.max()), 1), 256)
    accr = rng.random((rgm, B)).astype(np.float32)
    accc = rng.random((rgn, B)).astype(np.float32)
    kw = dict(gap_gamma=0.5, match_gamma=0.0)
    plain = banded_mea_pallas_dl(
        post, full.lo, full.m, full.n, full.width, full.final_d,
        full.final_k, accr, accc, **kw
    )
    packed = banded_mea_pallas_dl(
        post, full.lo, full.m, full.n, full.width, full.final_d,
        full.final_k, accr, accc, pack_bits=2, **kw
    )
    pp = np.asarray(plain.pointers)
    pk = np.asarray(packed.pointers)
    for b in range(len(reads)):
        want = _traceback_one(pp, full, b)
        got = _traceback_one(pk, full, b, bits=2)
        assert want == got, b


def test_guide_compact_matches_host_path(rng, monkeypatch):
    """align_candidates emits identical SAM records with the compact
    device guide path vs host stream construction."""
    from marginalign_trna_tpu.align.guide import (
        GuideConfig, KmerIndex, _best_candidate, align_candidates,
    )
    from marginalign_trna_tpu.utils.seq import BASES

    cfg = GuideConfig(k=9, band_width=16)
    ref_codes = rng.integers(0, 4, size=300)
    refs = {"r0": "".join(BASES[c] for c in ref_codes)}
    index = KmerIndex(refs, cfg.k, cfg.minimizer_w)
    candidates = []
    for i in range(6):
        start = int(rng.integers(0, 60))
        ln = int(rng.integers(80, 200))
        read = ref_codes[start : start + ln].copy()
        subs = rng.random(len(read)) < 0.08
        read[subs] = rng.integers(0, 4, size=int(subs.sum()))
        c = _best_candidate(
            "q%d" % i, "".join(BASES[x] for x in read), index, cfg
        )
        if c is not None:
            candidates.append(c)
    assert len(candidates) >= 4
    monkeypatch.setenv("MARGINALIGN_KERNEL", "pallas")
    monkeypatch.setenv("MARGINALIGN_COMPACT", "off")
    want = align_candidates(candidates, index, cfg)
    monkeypatch.setenv("MARGINALIGN_COMPACT", "on")
    got = align_candidates(candidates, index, cfg)
    assert [r.to_line() if hasattr(r, "to_line") else str(r.__dict__)
            for r in want] == \
           [r.to_line() if hasattr(r, "to_line") else str(r.__dict__)
            for r in got]


def test_compact_sv_posteriors_match_circ(rng):
    """posteriors_pallas_compact == posteriors_pallas_circ(mode='sv')."""
    from marginalign_trna_tpu.models.hmm import PairHmm
    from marginalign_trna_tpu.ops.fb import circ_device_batch, make_tables
    from marginalign_trna_tpu.ops.fb_pallas import (
        compact_device_batch, posteriors_pallas_circ,
        posteriors_pallas_compact,
    )

    hmm = PairHmm.load("marginalign_trna_tpu/models/last_hmm_20.txt")
    tables = make_tables(hmm)
    reads, refs, paths = _mk_inputs(rng)
    full = pack_banded_batch(reads, refs, width=21, paths=paths,
                             quantize=True)
    comp = pack_compact_batch(reads, refs, width=21, paths=paths,
                              quantize=True)
    want = posteriors_pallas_circ(tables, circ_device_batch(full),
                                  mode="sv")
    got = posteriors_pallas_compact(tables, compact_device_batch(comp),
                                    full.width)
    for nm, w, g in zip(("logZ", "post"), want, got):
        w, g = np.asarray(w), np.asarray(g)
        assert w.shape == g.shape, (nm, w.shape, g.shape)
        assert np.array_equal(w, g), (nm, np.abs(w - g).max())


def test_compact_cx_serving_matches_circ(rng):
    """Full fused caller serving: compact == circ path outputs."""
    from marginalign_trna_tpu.models.hmm import PairHmm
    from marginalign_trna_tpu.ops.band import circ_flush_rows
    from marginalign_trna_tpu.ops.fb import circ_device_batch, make_tables
    from marginalign_trna_tpu.ops.fb_pallas import (
        STEP_BLOCK, compact_device_batch,
        posteriors_expectations_pallas_circ,
        posteriors_expectations_pallas_compact,
    )

    hmm = PairHmm.load("marginalign_trna_tpu/models/last_hmm_20.txt")
    tables = make_tables(hmm)
    reads, refs, paths = _mk_inputs(rng)
    full = pack_banded_batch(reads, refs, width=21, paths=paths,
                             quantize=True)
    comp = pack_compact_batch(reads, refs, width=21, paths=paths,
                              quantize=True)

    d1k = -(-full.num_steps // STEP_BLOCK) * STEP_BLOCK
    fr = circ_flush_rows(full, d1k)
    want = posteriors_expectations_pallas_circ(
        tables, circ_device_batch(full), fr
    )
    got = posteriors_expectations_pallas_compact(
        tables, compact_device_batch(comp), full.width
    )
    for nm, w, g in zip(("logZ", "fl", "tails"), want, got):
        w, g = np.asarray(w), np.asarray(g)
        assert w.shape == g.shape, (nm, w.shape, g.shape)
        assert np.array_equal(w, g), (nm, np.abs(w - g).max())


def test_nonflat_gap_model_falls_back_to_rel(rng, monkeypatch):
    """Realign/caller with NON-FLAT gap emissions (un-normalised
    EM-trained models, updateTheBand mid-training) must not hit the
    circ/compact kernels' flat-gap assert: dispatch routes them through
    the REL specialised path's generic branch, matching the XLA engine."""
    import numpy as np

    from marginalign_trna_tpu.align.realign import (
        RealignJob, realigned_ops_for_jobs,
    )
    from marginalign_trna_tpu.models.hmm import PairHmm
    from marginalign_trna_tpu.ops.band import path_from_cigar

    hmm = PairHmm.load("marginalign_trna_tpu/models/last_hmm_20.txt")
    em = hmm.emissions.copy()
    # Perturb a gap state's emission row off flat, renormalised.
    em[1, :4] = np.array([0.4, 0.3, 0.2, 0.1])
    hmm.emissions = em
    from marginalign_trna_tpu.ops.dispatch import has_flat_gap_emissions
    from marginalign_trna_tpu.ops.fb import make_tables

    assert not has_flat_gap_emissions(make_tables(hmm))

    jobs = []
    for ln in (50, 80):
        ref = rng.integers(0, 4, ln).astype(np.int8)
        read = ref.copy()
        sub = rng.random(ln) < 0.1
        read[sub] = rng.integers(0, 4, int(sub.sum()))
        jobs.append(RealignJob(
            record=None, read_region=read, ref_region=ref,
            path=path_from_cigar([(0, ln)]),
        ))
    monkeypatch.setenv("MARGINALIGN_KERNEL", "xla")
    want = realigned_ops_for_jobs(jobs, hmm, 0.5, 0.0, split_size=0)
    monkeypatch.setenv("MARGINALIGN_KERNEL", "pallas")
    monkeypatch.setenv("MARGINALIGN_COMPACT", "on")
    got = realigned_ops_for_jobs(jobs, hmm, 0.5, 0.0, split_size=0)
    assert want == got
