"""Maximum-expected-accuracy (AMAP) realignment decode.

TPU-native equivalent of cPecanRealign's posterior-decoding realignment
(reference: the realigned cigar emitted per read at
src/margin/marginAlignLib.py:315-318, AMAP objective weighted by
--gapGamma/--matchGamma, src/margin/marginAlign.py:30-33).

Objective over a monotone alignment path:
    sum_{matched (i,j)} p(i,j) + gapGamma * sum_{skipped read i} (1 - r_i)
                              + gapGamma * sum_{skipped ref j} (1 - c_j)
where p = posterior match probability (from ops/fb.py), r_i / c_j its row and
column sums.  Pairs with p < matchGamma are disallowed.  The DP runs banded
on device (same wavefront machinery as ops/fb.py) emitting 2-bit move
pointers; the cigar is recovered by host traceback.
"""
from __future__ import annotations

import os
from functools import partial
from typing import List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .band import BandedBatch
from .fb import _shift

NEG = -1e30


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class MeaResult(NamedTuple):
    pointers: jnp.ndarray  # [D1, Wp, B] uint8 (0=diag, 1=left/ref, 2=up/read)
    score: jnp.ndarray     # [B]


def mea_weights(
    post: np.ndarray, batch: BandedBatch, gap_gamma: float
) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side per-cell gap weights [D1, Wp, B] for read-skip and ref-skip
    moves, from banded posteriors.  wup[d,k,b] applies to the move that skips
    read symbol i-1; wleft to the move skipping ref symbol j-1."""
    D1, Wp, B = post.shape
    ks = np.arange(Wp)
    wup = np.zeros_like(post)
    wleft = np.zeros_like(post)
    for b in range(B):
        m, n = int(batch.m[b]), int(batch.n[b])
        if m == 0 and n == 0:
            continue
        r = np.zeros(max(m, 1))
        c = np.zeros(max(n, 1))
        D = m + n
        lo = batch.lo[: D + 1, b]
        i_idx = lo[:, None] + ks[None, :]
        j_idx = np.arange(D + 1)[:, None] - i_idx
        ok = batch.valid[: D + 1, :, b] & (i_idx >= 1) & (j_idx >= 1)
        pi = post[: D + 1, :, b]
        np.add.at(r, np.clip(i_idx - 1, 0, m - 1)[ok], pi[ok])
        np.add.at(c, np.clip(j_idx - 1, 0, n - 1)[ok], pi[ok])
        g_read = gap_gamma * np.clip(1.0 - r, 0.0, 1.0)
        g_ref = gap_gamma * np.clip(1.0 - c, 0.0, 1.0)
        oku = batch.valid[: D + 1, :, b] & (i_idx >= 1)
        okl = batch.valid[: D + 1, :, b] & (j_idx >= 1)
        wup[: D + 1, :, b][oku] = g_read[np.clip(i_idx - 1, 0, m - 1)[oku]]
        wleft[: D + 1, :, b][okl] = g_ref[np.clip(j_idx - 1, 0, n - 1)[okl]]
    return wup, wleft


@partial(jax.jit, static_argnames=("rgm", "rgn"))
def _weights_from_sums_jit(
    accr, accc, valid, lo, gap_gamma, rgm: int, rgn: int
):
    """(wup, wleft) band-layout gap weights from per-position posterior
    sums accr [rgm, B] / accc [rgn, B] (however computed: segment-sum or
    the fused mw kernel's flush streams)."""
    D1, Wp, B = valid.shape
    d = jax.lax.broadcasted_iota(jnp.int32, (D1, 1, 1), 0)
    k = jax.lax.broadcasted_iota(jnp.int32, (1, Wp, 1), 1)
    i = lo[:, None, :].astype(jnp.int32) + k
    j = d - i

    g_read = gap_gamma * jnp.clip(1.0 - accr, 0.0, 1.0)  # [rgm, B]
    g_ref = gap_gamma * jnp.clip(1.0 - accc, 0.0, 1.0)   # [rgn, B]

    iu = jnp.clip(i - 1, 0, rgm - 1)
    ju = jnp.clip(j - 1, 0, rgn - 1)
    wup = jnp.where(
        valid & (i >= 1),
        jnp.take_along_axis(
            jnp.broadcast_to(g_read[:, None, :], (rgm, Wp, B)), iu, axis=0
        ),
        0.0,
    )
    wleft = jnp.where(
        valid & (j >= 1),
        jnp.take_along_axis(
            jnp.broadcast_to(g_ref[:, None, :], (rgn, Wp, B)), ju, axis=0
        ),
        0.0,
    )
    return wup, wleft


@partial(jax.jit, static_argnames=("width", "rgm", "rgn"))
def _mea_weights_jit(
    post, valid, lo, e1r, e1c, gap_gamma, width: int, rgm: int, rgn: int
):
    """Device mea_weights: per-position posterior sums via the banded
    monotone segment-sum (see ops/expectations.py — read positions move
    0/1 per diagonal exactly like reference positions), then the clipped
    gap weights are gathered back into band layout.  Replaces the host
    per-read np.add.at loops at production batch sizes."""
    D1, Wp, B = post.shape
    d = jax.lax.broadcasted_iota(jnp.int32, (D1, 1, 1), 0)
    k = jax.lax.broadcasted_iota(jnp.int32, (1, Wp, 1), 1)
    i = lo[:, None, :].astype(jnp.int32) + k
    j = d - i
    ok = valid & (i >= 1) & (j >= 1)
    w = jnp.where(ok, post, 0.0)
    sp = jnp.concatenate(
        [jnp.zeros((1, Wp, B), post.dtype), jnp.cumsum(w, axis=0)], axis=0
    )  # [D1+1, Wp, B]

    accr = jnp.zeros((rgm, B), post.dtype)  # row sums r_{i-1}
    accc = jnp.zeros((rgn, B), post.dtype)  # col sums c_{j-1}
    for kk in range(width):
        gkr = jnp.take_along_axis(
            sp[:, kk, :], e1r[width - kk : width - kk + rgm + 1, :], axis=0
        )
        accr = accr + (gkr[1:] - gkr[:-1])
        gkc = jnp.take_along_axis(
            sp[:, kk, :], e1c[kk : kk + rgn + 1, :], axis=0
        )
        accc = accc + (gkc[1:] - gkc[:-1])

    return _weights_from_sums_jit(accr, accc, valid, lo, gap_gamma,
                                  rgm=rgm, rgn=rgn)


def mea_weights_device(post, batch: BandedBatch, gap_gamma: float):
    """Device arrays (wup, wleft) [D1, Wp, B]; post may live on device."""
    from .expectations import read_position_boundaries, run_boundaries

    n_real = batch.batch
    rgm = _round_up(max(int(batch.m.max()), 1), 256)
    rgn = _round_up(max(int(batch.n.max()), 1), 256)
    e1r = read_position_boundaries(batch, rgm, n_real)
    e1c = run_boundaries(batch, np.zeros(n_real, np.int64), rgn, n_real)
    return _mea_weights_jit(
        jnp.asarray(post),
        jnp.asarray(batch.valid),
        jnp.asarray(batch.lo),
        jnp.asarray(e1r),
        jnp.asarray(e1c),
        jnp.float32(gap_gamma),
        width=batch.width,
        rgm=rgm,
        rgn=rgn,
    )


@jax.jit
def banded_mea(
    wdiag: jnp.ndarray,   # [D1, Wp, B] posterior match weights (NEG = banned)
    wup: jnp.ndarray,     # [D1, Wp, B]
    wleft: jnp.ndarray,   # [D1, Wp, B]
    valid: jnp.ndarray,   # [D1, Wp, B]
    s1: jnp.ndarray,      # [D1, B]
    s2: jnp.ndarray,      # [D1, B]
    final_d: jnp.ndarray,  # [B]
    final_k: jnp.ndarray,  # [B]
) -> MeaResult:
    D1, Wp, B = wdiag.shape
    dtype = jnp.float32

    a0 = jnp.full((Wp, B), NEG, dtype).at[0, :].set(0.0)
    term_sel = (
        jnp.arange(Wp, dtype=jnp.int32)[:, None]
        == final_k.astype(jnp.int32)[None, :]
    )

    def step(carry, xs):
        a1, a2, delta_prev, cum = carry
        wd, wu, wl, valid_d, s1_d, s2_d = xs

        diag = _shift(a2, s2_d - 1) - delta_prev[None, :] + wd
        up = _shift(a1, s1_d - 1) + wu
        left = _shift(a1, s1_d) + wl

        stackv = jnp.stack([diag, left, up])  # ptr order 0,1,2
        a_new = jnp.max(stackv, axis=0)
        ptr = jnp.argmax(stackv, axis=0).astype(jnp.uint8)
        a_new = jnp.where(valid_d, a_new, NEG)

        delta = jnp.maximum(jnp.max(a_new, axis=0), 0.0)
        a_new = jnp.where(a_new <= NEG / 2, NEG, a_new - delta)
        # Absolute score needs the *cumulative* normalisation added back.
        cum = cum + delta
        term = jnp.max(jnp.where(term_sel, a_new, NEG), axis=0) + cum
        return (a_new, a1, delta, cum), (ptr, term)

    xs = (wdiag[1:], wup[1:], wleft[1:], valid[1:], s1[1:], s2[1:])
    zb = jnp.zeros((B,), dtype)
    carry0 = (a0, jnp.full_like(a0, NEG), zb, zb)
    _, (ptrs, terms) = jax.lax.scan(step, carry0, xs)
    ptrs = jnp.concatenate([jnp.zeros((1, Wp, B), jnp.uint8), ptrs], axis=0)
    t_idx = jnp.maximum(final_d.astype(jnp.int32) - 1, 0)
    score = terms[t_idx, jnp.arange(B)]
    return MeaResult(pointers=ptrs, score=score)


def rowcol_sums_from_flushed(batch, flc, flr, tc, tr, n_real=None):
    """(accr [rgm, B], accc [rgn, B]) per-position posterior sums from the
    mw kernel's flush streams + tails (fb_pallas.posteriors_weights_
    pallas_circ) — one gather each, replacing the band cumsum +
    per-band-row gathers of _mea_weights_jit."""
    from .expectations import (
        _scatter_assemble, _use_scatter_assembly,
        fused_expectation_indices, fused_flush_jmaps, fused_gather_sums,
        fused_row_indices, fused_row_jmaps,
    )

    n_real = batch.batch if n_real is None else n_real
    d1k = int(flc.shape[0])
    rgm = _round_up(max(int(batch.m.max()), 1), 256)
    rgn = _round_up(max(int(batch.n.max()), 1), 256)
    accr = accc = None
    if _use_scatter_assembly():
        # Targets derived on device from one lo upload (the host jmap
        # concat + upload costs ~300ms per bucket per side at B=3072).
        from .expectations import (
            _scatter_assemble_dev, fused_flush_jmaps_device,
            fused_row_jmaps_device,
        )

        lo_dev = jnp.asarray(batch.lo)
        jmc_dev = fused_flush_jmaps_device(
            lo_dev, jnp.zeros(batch.batch, jnp.int32),
            jnp.asarray(batch.n), batch.width, batch.wp, d1k,
        )
        outc = _scatter_assemble_dev(flc[None], tc[None], jmc_dev, rgn)
        jmr_dev = fused_row_jmaps_device(
            lo_dev, jnp.asarray(batch.m), batch.wp, d1k
        )
        outr = _scatter_assemble_dev(flr[None], tr[None], jmr_dev, rgm)
        accc = outc[0, :rgn]
        accr = outr[0, :rgm]
    if accc is None or accr is None:
        dfc, tic = fused_expectation_indices(
            batch, np.zeros(batch.batch, np.int64), rgn, n_real, d1k
        )
        dfr, tir = fused_row_indices(batch, rgm, n_real, d1k)
        accc = fused_gather_sums(flc, tc, jnp.asarray(dfc),
                                 jnp.asarray(tic))
        accr = fused_gather_sums(flr, tr, jnp.asarray(dfr),
                                 jnp.asarray(tir))
    return accr, accc


def mea_decode(
    post: np.ndarray,
    batch: BandedBatch,
    gap_gamma: float = 0.5,
    match_gamma: float = 0.0,
    rowcol=None,
) -> List[List[Tuple[int, int]]]:
    """Decode realigned cigars for every read in the batch.

    post: [D1, Wp, B] banded posterior match probabilities (numpy).
    rowcol: optional precomputed (accr [rgm, B], accc [rgn, B]) posterior
    row/col sums (the fused mw serving path; see rowcol_sums_from_flushed)
    — skips the segment-sum weights pass.
    Returns per-read aligned ops [(op, len)] with 0=M, 1=I, 2=D spanning the
    full (m, n) region.
    """
    D1, Wp, B = post.shape
    from .dispatch import use_pallas

    mode = os.environ.get("MARGINALIGN_MEA", "")
    use_device = use_pallas() if mode == "" else mode == "device"
    if rowcol is not None:
        # Fused mw serving path: the delay-line MEA kernel builds the
        # gap-weight windows in VMEM from the per-position sums, so
        # wdiag/wup/wleft are never materialised in HBM (and the
        # take_along_axis gather-back, which scalarises on TPU, is
        # replaced by two monotone_gather entering-value streams).
        accr, accc = rowcol
        from .dispatch import use_device_traceback
        from .wavefront_pallas import banded_mea_pallas_dl

        if use_device_traceback():
            # Traceback ON DEVICE (ops/traceback_device.py): only the
            # 2-bit [ceil(D1/4), B] move stream crosses the ~30MB/s
            # tunnel — ~20x fewer bytes than even the 2-bit pointer
            # band.
            from .traceback_device import (
                mea_moves_device, ops_from_moves, pack_moves,
                unpack_moves,
            )

            lo_dev = jnp.asarray(batch.lo)
            res = banded_mea_pallas_dl(
                jnp.asarray(post), lo_dev, batch.m, batch.n,
                batch.width, batch.final_d, batch.final_k, accr, accc,
                gap_gamma, match_gamma, pack_bits=8,
            )
            mv = pack_moves(mea_moves_device(
                res.pointers, lo_dev, jnp.asarray(batch.m),
                jnp.asarray(batch.n),
            ))
            moves = unpack_moves(
                np.ascontiguousarray(np.asarray(mv)), D1 - 1
            )
            return [ops_from_moves(moves, b) for b in range(B)]

        # 2-bit packed pointers: D2H on the remote tunnel measures
        # ~30MB/s, so the pointer pull dominated the realign wall; the
        # native traceback reads packed bytes directly.
        ptr_bits = 2
        res = banded_mea_pallas_dl(
            jnp.asarray(post), batch.lo, batch.m, batch.n, batch.width,
            batch.final_d, batch.final_k, accr, accc,
            gap_gamma, match_gamma, pack_bits=ptr_bits,
        )
        from .. import native as _native

        # One contiguity pass HERE: np.asarray of the packed device
        # array can come back non-contiguous, and the per-lane
        # np.ascontiguousarray inside the traceback would then copy the
        # whole pointer array once per read (measured ~50s per bucket).
        pointers = np.ascontiguousarray(np.asarray(res.pointers))
        if not _native.has_packed_readers():
            # No native lib, or a stale .so without the packed entry
            # points (which would otherwise unpack per READ below).
            pointers = _native.unpack_ptrs(pointers, ptr_bits, Wp)
            ptr_bits = 8
        return [_traceback_one(pointers, batch, b, bits=ptr_bits)
                for b in range(B)]
    elif use_device:
        # Weights and DP stay on device; only pointers cross to the host.
        post_dev = jnp.asarray(post)
        wup, wleft = mea_weights_device(post_dev, batch, gap_gamma)
        wdiag = jnp.where(
            (post_dev >= match_gamma) & (post_dev > 0), post_dev, NEG
        ).astype(jnp.float32)
        from .wavefront_pallas import banded_mea_pallas

        res = banded_mea_pallas(
            wdiag, wup, wleft,
            jnp.asarray(batch.valid), jnp.asarray(batch.s1),
            jnp.asarray(batch.s2),
            jnp.asarray(batch.final_d), jnp.asarray(batch.final_k),
        )
    else:
        wup_h, wleft_h = mea_weights(np.asarray(post), batch, gap_gamma)
        wdiag_h = np.where(
            (post >= match_gamma) & (post > 0), post, NEG
        ).astype(np.float32)
        # Diagonal moves only exist for cells with i >= 1 and j >= 1; other
        # cells keep NEG.  (Cells outside the band are masked by `valid`.)
        res = banded_mea(
            jnp.asarray(wdiag_h), jnp.asarray(wup_h), jnp.asarray(wleft_h),
            jnp.asarray(batch.valid), jnp.asarray(batch.s1),
            jnp.asarray(batch.s2),
            jnp.asarray(batch.final_d), jnp.asarray(batch.final_k),
        )
    from .dispatch import use_device_traceback

    if use_device_traceback():
        import jax.numpy as _jnp

        from .traceback_device import (
            mea_moves_device, ops_from_moves, pack_moves, unpack_moves,
        )

        mv = pack_moves(mea_moves_device(
            res.pointers, _jnp.asarray(batch.lo),
            _jnp.asarray(batch.m), _jnp.asarray(batch.n),
        ))
        moves = unpack_moves(
            np.ascontiguousarray(np.asarray(mv)), D1 - 1
        )
        return [ops_from_moves(moves, b) for b in range(B)]
    pointers = np.ascontiguousarray(np.asarray(res.pointers))
    out = []
    for b in range(B):
        out.append(_traceback_one(pointers, batch, b))
    return out


def _traceback_one(
    pointers: np.ndarray, batch: BandedBatch, b: int, bits: int = 8
) -> List[Tuple[int, int]]:
    from .. import native as _native

    m, n = int(batch.m[b]), int(batch.n[b])
    lo = batch.lo[:, b]
    nat = _native.mea_traceback(np.ascontiguousarray(pointers), lo, b, m, n,
                                bits=bits)
    if nat is not None:
        return nat
    assert bits == 8, "packed pointers need the native traceback"
    i, j = m, n
    ops_rev: List[int] = []
    while not (i == 0 and j == 0):
        if i == 0:
            ops_rev.append(2)
            j -= 1
            continue
        if j == 0:
            ops_rev.append(1)
            i -= 1
            continue
        d = i + j
        k = i - int(lo[d])
        p = int(pointers[d, k, b])
        if p == 0:
            ops_rev.append(0)
            i -= 1
            j -= 1
        elif p == 1:
            ops_rev.append(2)
            j -= 1
        else:
            ops_rev.append(1)
            i -= 1
        assert i >= 0 and j >= 0
    ops_rev.reverse()
    out: List[Tuple[int, int]] = []
    for op in ops_rev:
        if out and out[-1][0] == op:
            out[-1] = (op, out[-1][1] + 1)
        else:
            out.append((op, 1))
    return out


# ------------------------ multi-problem lanes (short-read packing) --------


@partial(jax.jit, static_argnames=("width", "rgm", "rgn"))
def _mea_weights_multi_jit(
    post, valid, lo, dloc, e1r, e1c, ibase, jbase, gap_gamma,
    width: int, rgm: int, rgn: int,
):
    """mea_weights over multi-problem lanes: per-lane virtual read/ref
    position spaces (each problem owns a disjoint window), same banded
    monotone segment-sum + gather-back as the single-problem device path."""
    D1, Wp, B = post.shape
    k = jax.lax.broadcasted_iota(jnp.int32, (1, Wp, 1), 1)
    i = lo[:, None, :].astype(jnp.int32) + k
    j = dloc[:, None, :].astype(jnp.int32) - i
    ok = valid & (i >= 1) & (j >= 1)
    w = jnp.where(ok, post, 0.0)
    sp = jnp.concatenate(
        [jnp.zeros((1, Wp, B), post.dtype), jnp.cumsum(w, axis=0)], axis=0
    )

    accr = jnp.zeros((rgm, B), post.dtype)
    accc = jnp.zeros((rgn, B), post.dtype)
    for kk in range(width):
        gkr = jnp.take_along_axis(
            sp[:, kk, :], e1r[width - kk : width - kk + rgm + 1, :], axis=0
        )
        accr = accr + (gkr[1:] - gkr[:-1])
        gkc = jnp.take_along_axis(
            sp[:, kk, :], e1c[kk : kk + rgn + 1, :], axis=0
        )
        accc = accc + (gkc[1:] - gkc[:-1])

    g_read = gap_gamma * jnp.clip(1.0 - accr, 0.0, 1.0)
    g_ref = gap_gamma * jnp.clip(1.0 - accc, 0.0, 1.0)

    iu = jnp.clip(ibase[:, None, :].astype(jnp.int32) + k, 0, rgm - 1)
    ju = jnp.clip(jbase[:, None, :].astype(jnp.int32) - k, 0, rgn - 1)
    wup = jnp.where(
        valid & (i >= 1),
        jnp.take_along_axis(
            jnp.broadcast_to(g_read[:, None, :], (rgm, Wp, B)), iu, axis=0
        ),
        0.0,
    )
    wleft = jnp.where(
        valid & (j >= 1),
        jnp.take_along_axis(
            jnp.broadcast_to(g_ref[:, None, :], (rgn, Wp, B)), ju, axis=0
        ),
        0.0,
    )
    return wup, wleft


def _traceback_problem(pointers: np.ndarray, mb, p) -> List[Tuple[int, int]]:
    pr = mb.problems[p]
    ptr = np.ascontiguousarray(
        pointers[pr.d0 : pr.final_d + 1, :, pr.lane : pr.lane + 1]
    )
    lo = np.ascontiguousarray(mb.lo[pr.d0 : pr.final_d + 1, pr.lane])
    from .. import native as _native

    nat = _native.mea_traceback(ptr, lo, 0, pr.m, pr.n)
    if nat is not None:
        return nat
    i, j = pr.m, pr.n
    ops_rev: List[int] = []
    while not (i == 0 and j == 0):
        if i == 0:
            ops_rev.append(2)
            j -= 1
            continue
        if j == 0:
            ops_rev.append(1)
            i -= 1
            continue
        d = i + j
        k = i - int(lo[d])
        pv = int(ptr[d, k, 0])
        if pv == 0:
            ops_rev.append(0)
            i -= 1
            j -= 1
        elif pv == 1:
            ops_rev.append(2)
            j -= 1
        else:
            ops_rev.append(1)
            i -= 1
        assert i >= 0 and j >= 0
    ops_rev.reverse()
    out: List[Tuple[int, int]] = []
    for op in ops_rev:
        if out and out[-1][0] == op:
            out[-1] = (op, out[-1][1] + 1)
        else:
            out.append((op, 1))
    return out


def mea_decode_multi(
    post,
    mb,
    gap_gamma: float = 0.5,
    match_gamma: float = 0.0,
) -> List[List[Tuple[int, int]]]:
    """MEA decode for every problem of a multi-problem batch.  post may be
    a device array (kept on device through weights + DP; only pointers
    cross to the host)."""
    from .expectations import (
        _lane_virtual_offsets, _multi_boundaries, _multi_gu, _round_up,
    )
    from .wavefront_pallas import banded_mea_pallas_multi

    voffr, vmaxr = _lane_virtual_offsets(mb, lambda p: mb.problems[p].m)
    voffc, vmaxc = _lane_virtual_offsets(mb, lambda p: mb.problems[p].n)
    rgm = _round_up(max(int(vmaxr), 1), 256)
    rgn = _round_up(max(int(vmaxc), 1), 256)
    gur = _multi_gu(mb, voffr, "read")
    guc = _multi_gu(mb, voffc, "ref")
    e1r = _multi_boundaries(gur, -mb.width, rgm)
    e1c = _multi_boundaries(guc, 0, rgn + mb.width)

    D1, B = mb.lo.shape
    ibase = np.zeros((D1, B), dtype=np.int32)
    jbase = np.zeros((D1, B), dtype=np.int32)
    for p, pr in enumerate(mb.problems):
        sl = slice(pr.d0, pr.final_d + 1)
        lo = mb.lo[sl, pr.lane].astype(np.int64)
        ibase[sl, pr.lane] = voffr[p] + lo - 1
        jbase[sl, pr.lane] = (
            voffc[p] + mb.dloc[sl, pr.lane].astype(np.int64) - lo - 1
        )

    post_dev = jnp.asarray(post)
    wup, wleft = _mea_weights_multi_jit(
        post_dev,
        jnp.asarray(mb.valid),
        jnp.asarray(mb.lo),
        jnp.asarray(mb.dloc),
        jnp.asarray(e1r),
        jnp.asarray(e1c),
        jnp.asarray(ibase),
        jnp.asarray(jbase),
        jnp.float32(gap_gamma),
        width=mb.width,
        rgm=rgm,
        rgn=rgn,
    )
    wdiag = jnp.where(
        (post_dev >= match_gamma) & (post_dev > 0), post_dev, NEG
    ).astype(jnp.float32)
    res = banded_mea_pallas_multi(
        wdiag, wup, wleft,
        jnp.asarray(mb.valid), jnp.asarray(mb.s1), jnp.asarray(mb.s2),
        jnp.asarray(mb.start), jnp.asarray(mb.find),
        jnp.asarray(mb.fink_steps),
        jnp.asarray(mb.final_d), 
        jnp.asarray(np.array([pr.lane for pr in mb.problems], np.int32)),
    )
    pointers = np.ascontiguousarray(np.asarray(res.pointers))
    return [_traceback_problem(pointers, mb, p)
            for p in range(len(mb.problems))]
