"""Pallas TPU kernels for the max-plus banded wavefronts (guide Viterbi
and MEA decode).

These mirror the forward-backward kernel structure (ops/fb_pallas.py): the
grid walks blocks of STEP_BLOCK anti-diagonals, VMEM scratch carries the DP
frontier between blocks, per-step inputs/outputs stream through block
specs.  Max-plus DPs are simpler than the probability ones: scores grow at
most ~1 per diagonal, so f32 needs no rescaling at all — the per-step work
is shifts, adds and maxes only.

Replaces the XLA lax.scan implementations in ops/nw.py (guide alignment,
reference role: LAST/BWA/minimap2 seed mappers, src/margin/mappers/*.py)
and ops/mea.py (AMAP decode, reference role: cPecanRealign's posterior
realignment, src/margin/marginAlignLib.py:315-318) on accelerators; the
scan versions remain the CPU path and test oracle.

Pointer encoding matches the scan engines exactly, so the host/native
tracebacks are shared:
  NW:  uint8  ptrM(2b) | ptrIx<<2 | ptrIy<<3
  MEA: uint8  0=diag, 1=left/ref-skip, 2=up/read-skip
(stored as int32 blocks on TPU — sub-byte band tiles don't lay out well at
Wp=24 sublanes — and cast to uint8 on exit; traffic is still small next to
the f32 weight streams).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fb import DeviceBatch
from .fb_pallas import (
    STEP_BLOCK, _compiler_params, _pad_steps, _roll_shift,
    _use_interpret,
)

NEG = -1e30


def _max_argmax3(v0, v1, v2):
    m01 = jnp.maximum(v0, v1)
    p01 = (v1 > v0).astype(jnp.int32)
    m = jnp.maximum(m01, v2)
    p = jnp.where(v2 > m01, 2, p01)
    return m, p


def pack_ptr_bits(ptrs, bits: int):
    """Pack pointer cells (values < 2**bits) 8//bits per byte along the
    band dimension: [D1, Wp, B] int -> [D1, ceil(Wp*bits/8), B] uint8.

    Device-to-host on the remote-PJRT tunnel measures ~30MB/s
    (benchmarks: d2h probe, round 5), so the pointer pull — not the DP —
    was the realign/guide wall; 2-bit MEA and 4-bit NW packing cut it
    4x/2x.  The native tracebacks read packed bytes directly
    (native/margin_native.cpp fetch_cell)."""
    if bits == 8:
        return ptrs.astype(jnp.uint8)
    per = 8 // bits
    D1, Wp, B = ptrs.shape
    pad = (-Wp) % per
    if pad:
        ptrs = jnp.pad(ptrs, [(0, 0), (0, pad), (0, 0)])
    g = ptrs.astype(jnp.int32).reshape(D1, (Wp + pad) // per, per, B)
    acc = g[:, :, 0, :]
    for t in range(1, per):
        acc = acc | (g[:, :, t, :] << (t * bits))
    return acc.astype(jnp.uint8)


# ------------------------------------------------------------------ NW


def _nw_kernel(
    xb_ref, yb_ref, valid_ref, s1_ref, s2_ref, fink_ref, params_ref,
    ptr_ref, tm_ref, tx_ref, ty_ref,
    m1_ref, x1_ref, y1_ref, m2_ref, x2_ref, y2_ref,
):
    i = pl.program_id(0)
    match = params_ref[0, 0]
    mismatch = params_ref[0, 1]
    gap_open = params_ref[0, 2]
    gap_extend = params_ref[0, 3]

    @pl.when(i == 0)
    def _init():
        neg = jnp.full_like(m1_ref[:, :], NEG)
        row0 = jax.lax.broadcasted_iota(jnp.int32, neg.shape, 0) == 0
        m1_ref[:, :] = jnp.where(row0, 0.0, NEG)
        x1_ref[:, :] = neg
        y1_ref[:, :] = neg
        m2_ref[:, :] = neg
        x2_ref[:, :] = neg
        y2_ref[:, :] = neg

    f1 = [m1_ref[:, :], x1_ref[:, :], y1_ref[:, :]]
    f2 = [m2_ref[:, :], x2_ref[:, :], y2_ref[:, :]]

    for kb in range(STEP_BLOCK):
        # f32 comparisons: Mosaic rejects packed-int8 vector cmpi on TPU.
        xb = xb_ref[kb].astype(jnp.float32)
        yb = yb_ref[kb].astype(jnp.float32)
        valid = valid_ref[kb].astype(jnp.float32) != 0.0
        s1 = s1_ref[kb]
        s2 = s2_ref[kb]

        sub = jnp.where(
            (xb == yb) & (xb < 4.0), match,
            jnp.where((xb >= 4.0) | (yb >= 4.0), 0.0, mismatch),
        )

        # Match from (i-1, j-1): shift t = s2 - 1 in {-1, 0, 1}.
        diag = [_roll_shift(f2[s], s2 == 2, s2 == 0) for s in range(3)]
        m_val, m_ptr = _max_argmax3(diag[0], diag[1], diag[2])
        m_val = m_val + sub

        # Ix from (i, j-1): shift t = s1 in {0, 1}.
        hz_m = _roll_shift(f1[0], s1 == 1, False)
        hz_x = _roll_shift(f1[1], s1 == 1, False)
        ix_open = hz_m + gap_open
        ix_ext = hz_x + gap_extend
        ix_val = jnp.maximum(ix_open, ix_ext)
        ix_ptr = (ix_ext > ix_open).astype(jnp.int32)

        # Iy from (i-1, j): shift t = s1 - 1 in {-1, 0}.
        vt_m = _roll_shift(f1[0], False, s1 == 0)
        vt_y = _roll_shift(f1[2], False, s1 == 0)
        iy_open = vt_m + gap_open
        iy_ext = vt_y + gap_extend
        iy_val = jnp.maximum(iy_open, iy_ext)
        iy_ptr = (iy_ext > iy_open).astype(jnp.int32)

        new = [
            jnp.where(valid, m_val, NEG),
            jnp.where(valid, ix_val, NEG),
            jnp.where(valid, iy_val, NEG),
        ]
        ptr = m_ptr | (ix_ptr << 2) | (iy_ptr << 3)

        if kb == 0:
            # d = 0 on the first grid step is pure initialisation.
            is_first = i == 0
            new = [jnp.where(is_first, f1[s], new[s]) for s in range(3)]
            f2_next = [jnp.where(is_first, f2[s], f1[s]) for s in range(3)]
            ptr = jnp.where(is_first, 0, ptr)
        else:
            f2_next = f1

        kidx = jax.lax.broadcasted_iota(jnp.int32, new[0].shape, 0)
        sel = kidx == fink_ref[kb]
        tm_ref[kb] = jnp.where(sel, new[0], NEG).max(axis=0, keepdims=True)
        tx_ref[kb] = jnp.where(sel, new[1], NEG).max(axis=0, keepdims=True)
        ty_ref[kb] = jnp.where(sel, new[2], NEG).max(axis=0, keepdims=True)
        ptr_ref[kb] = ptr
        f1, f2 = new, f2_next

    m1_ref[:, :], x1_ref[:, :], y1_ref[:, :] = f1
    m2_ref[:, :], x2_ref[:, :], y2_ref[:, :] = f2


@functools.partial(jax.jit, static_argnames=("pack_bits",))
def banded_nw_pallas(params_arr: jnp.ndarray, batch: DeviceBatch,
                     pack_bits: int = 8):
    """Drop-in Pallas version of ops.nw.banded_nw (same NwResult fields).
    pack_bits=4 returns pointers bit-packed 2 cells/byte (pack_ptr_bits);
    pass bits=4 to the traceback."""
    from .nw import NwResult

    D1, Wp, B = batch.xb.shape
    K = STEP_BLOCK
    D1K = -(-D1 // K) * K
    G = D1K // K

    xb = _pad_steps(batch.xb, D1K)
    yb = _pad_steps(batch.yb, D1K)
    valid = _pad_steps(batch.valid.astype(jnp.int8), D1K)
    s1 = _pad_steps(batch.s1.astype(jnp.int32), D1K)[:, None, :]
    s2 = _pad_steps(batch.s2.astype(jnp.int32), D1K)[:, None, :]
    fink = jnp.broadcast_to(
        batch.final_k.astype(jnp.int32)[None, None, :], (D1K, 1, B)
    )

    blk3 = pl.BlockSpec((K, Wp, B), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    blk2 = pl.BlockSpec((K, 1, B), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)

    ptrs, tm, tx, ty = pl.pallas_call(
        _nw_kernel,
        grid=(G,),
        in_specs=[blk3, blk3, blk3, blk2, blk2, blk2, full],
        out_specs=[blk3, blk2, blk2, blk2],
        out_shape=[
            jax.ShapeDtypeStruct((D1K, Wp, B), jnp.int32),
            jax.ShapeDtypeStruct((D1K, 1, B), jnp.float32),
            jax.ShapeDtypeStruct((D1K, 1, B), jnp.float32),
            jax.ShapeDtypeStruct((D1K, 1, B), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((Wp, B), jnp.float32) for _ in range(6)],
        interpret=_use_interpret(),
        compiler_params=_compiler_params(min_mb=64),
    )(xb, yb, valid, s1, s2, fink,
      params_arr.astype(jnp.float32)[None, :])

    d_idx = batch.final_d.astype(jnp.int32)
    b_idx = jnp.arange(B)
    term = jnp.stack(
        [tm[d_idx, 0, b_idx], tx[d_idx, 0, b_idx], ty[d_idx, 0, b_idx]],
        axis=-1,
    )  # [B, 3]
    return NwResult(
        pointers=pack_ptr_bits(ptrs[:D1], pack_bits),
        score=jnp.max(term, axis=-1),
        final_state=jnp.argmax(term, axis=-1),
    )


# ----------------------------------------------- NW over multi-problem lanes


def _nw_kernel_multi(
    xb_ref, yb_ref, valid_ref, s1_ref, s2_ref, start_ref, fink_ref, find_ref,
    params_ref,
    ptr_ref, tm_ref, tx_ref, ty_ref,
    m1_ref, x1_ref, y1_ref, m2_ref, x2_ref, y2_ref,
):
    """Guide Viterbi over packed lanes (band.pack_multi_banded_batch): each
    problem's local d = 0 re-seeds M = 0 at band row 0 (spacer steps have
    pushed both frontier generations to NEG), and terminal scores stream out
    gated by the per-step terminal markers."""
    i = pl.program_id(0)
    match = params_ref[0, 0]
    mismatch = params_ref[0, 1]
    gap_open = params_ref[0, 2]
    gap_extend = params_ref[0, 3]

    @pl.when(i == 0)
    def _init():
        neg = jnp.full_like(m1_ref[:, :], NEG)
        m1_ref[:, :] = neg
        x1_ref[:, :] = neg
        y1_ref[:, :] = neg
        m2_ref[:, :] = neg
        x2_ref[:, :] = neg
        y2_ref[:, :] = neg

    f1 = [m1_ref[:, :], x1_ref[:, :], y1_ref[:, :]]
    f2 = [m2_ref[:, :], x2_ref[:, :], y2_ref[:, :]]

    for kb in range(STEP_BLOCK):
        xb = xb_ref[kb].astype(jnp.float32)
        yb = yb_ref[kb].astype(jnp.float32)
        valid = valid_ref[kb].astype(jnp.float32) != 0.0
        s1 = s1_ref[kb]
        s2 = s2_ref[kb]

        sub = jnp.where(
            (xb == yb) & (xb < 4.0), match,
            jnp.where((xb >= 4.0) | (yb >= 4.0), 0.0, mismatch),
        )

        diag = [_roll_shift(f2[s], s2 == 2, s2 == 0) for s in range(3)]
        m_val, m_ptr = _max_argmax3(diag[0], diag[1], diag[2])
        m_val = m_val + sub

        hz_m = _roll_shift(f1[0], s1 == 1, False)
        hz_x = _roll_shift(f1[1], s1 == 1, False)
        ix_open = hz_m + gap_open
        ix_ext = hz_x + gap_extend
        ix_val = jnp.maximum(ix_open, ix_ext)
        ix_ptr = (ix_ext > ix_open).astype(jnp.int32)

        vt_m = _roll_shift(f1[0], False, s1 == 0)
        vt_y = _roll_shift(f1[2], False, s1 == 0)
        iy_open = vt_m + gap_open
        iy_ext = vt_y + gap_extend
        iy_val = jnp.maximum(iy_open, iy_ext)
        iy_ptr = (iy_ext > iy_open).astype(jnp.int32)

        new = [
            jnp.where(valid, m_val, NEG),
            jnp.where(valid, ix_val, NEG),
            jnp.where(valid, iy_val, NEG),
        ]
        ptr = m_ptr | (ix_ptr << 2) | (iy_ptr << 3)

        kidx = jax.lax.broadcasted_iota(jnp.int32, new[0].shape, 0)
        seed = (kidx == 0) & (start_ref[kb].astype(jnp.float32) != 0.0)
        new[0] = jnp.where(seed, 0.0, new[0])
        new[1] = jnp.where(seed, NEG, new[1])
        new[2] = jnp.where(seed, NEG, new[2])
        ptr = jnp.where(seed, 0, ptr)

        sel = (kidx == fink_ref[kb]) & (find_ref[kb] >= 0)
        tm_ref[kb] = jnp.where(sel, new[0], NEG).max(axis=0, keepdims=True)
        tx_ref[kb] = jnp.where(sel, new[1], NEG).max(axis=0, keepdims=True)
        ty_ref[kb] = jnp.where(sel, new[2], NEG).max(axis=0, keepdims=True)
        ptr_ref[kb] = ptr
        f1, f2 = new, f1

    m1_ref[:, :], x1_ref[:, :], y1_ref[:, :] = f1
    m2_ref[:, :], x2_ref[:, :], y2_ref[:, :] = f2


@jax.jit
def banded_nw_pallas_multi(params_arr: jnp.ndarray, mdev):
    """Guide Viterbi over multi-problem lanes.  mdev is a
    fb_pallas.MultiDeviceBatch; returns NwResult with per-problem score and
    final_state ([P]) and the packed pointer stream [D1, Wp, B].

    Removes the guide stage's compile diversity: the reference re-runs its
    mapper binaries per input (src/margin/mappers/last.py:24-26) while the
    single-problem TPU path recompiles per batch shape; packed lanes keep
    one quantized shape across calls."""
    from .nw import NwResult

    D1, Wp, B = mdev.xb.shape
    K = STEP_BLOCK
    D1K = -(-D1 // K) * K
    G = D1K // K

    xb = _pad_steps(mdev.xb, D1K)
    yb = _pad_steps(mdev.yb, D1K)
    valid = _pad_steps(mdev.valid, D1K)
    s1 = _pad_steps(mdev.s1, D1K)[:, None, :]
    s2 = _pad_steps(mdev.s2, D1K)[:, None, :]
    start = _pad_steps(mdev.start, D1K)[:, None, :]
    fink = jnp.pad(mdev.fink, [(0, D1K - D1), (0, 0)],
                   constant_values=-1)[:, None, :]
    find = jnp.pad(mdev.find, [(0, D1K - D1), (0, 0)],
                   constant_values=-1)[:, None, :]

    blk3 = pl.BlockSpec((K, Wp, B), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    blk2 = pl.BlockSpec((K, 1, B), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)

    ptrs, tm, tx, ty = pl.pallas_call(
        _nw_kernel_multi,
        grid=(G,),
        in_specs=[blk3, blk3, blk3, blk2, blk2, blk2, blk2, blk2, full],
        out_specs=[blk3, blk2, blk2, blk2],
        out_shape=[
            jax.ShapeDtypeStruct((D1K, Wp, B), jnp.int32),
            jax.ShapeDtypeStruct((D1K, 1, B), jnp.float32),
            jax.ShapeDtypeStruct((D1K, 1, B), jnp.float32),
            jax.ShapeDtypeStruct((D1K, 1, B), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((Wp, B), jnp.float32) for _ in range(6)],
        interpret=_use_interpret(),
        compiler_params=_compiler_params(min_mb=64),
    )(xb, yb, valid, s1, s2, start, fink, find,
      params_arr.astype(jnp.float32)[None, :])

    pf = mdev.p_final_d.astype(jnp.int32)
    pl_ = mdev.p_lane.astype(jnp.int32)
    term = jnp.stack(
        [tm[pf, 0, pl_], tx[pf, 0, pl_], ty[pf, 0, pl_]], axis=-1
    )  # [P, 3]
    return NwResult(
        pointers=ptrs[:D1].astype(jnp.uint8),
        score=jnp.max(term, axis=-1),
        final_state=jnp.argmax(term, axis=-1),
    )


# ------------------------------------------------------------------ MEA


def _mea_kernel(
    wd_ref, wu_ref, wl_ref, valid_ref, s1_ref, s2_ref, fink_ref,
    ptr_ref, term_ref,
    a1_ref, a2_ref,
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        neg = jnp.full_like(a1_ref[:, :], NEG)
        row0 = jax.lax.broadcasted_iota(jnp.int32, neg.shape, 0) == 0
        a1_ref[:, :] = jnp.where(row0, 0.0, NEG)
        a2_ref[:, :] = neg

    a1 = a1_ref[:, :]
    a2 = a2_ref[:, :]

    for kb in range(STEP_BLOCK):
        valid = valid_ref[kb].astype(jnp.float32) != 0.0
        s1 = s1_ref[kb]
        s2 = s2_ref[kb]

        diag = _roll_shift(a2, s2 == 2, s2 == 0) + wd_ref[kb]
        left = _roll_shift(a1, s1 == 1, False) + wl_ref[kb]
        up = _roll_shift(a1, False, s1 == 0) + wu_ref[kb]

        # ptr order matches ops.mea.banded_mea: 0=diag, 1=left, 2=up.
        a_new, ptr = _max_argmax3(diag, left, up)
        a_new = jnp.where(valid, a_new, NEG)

        if kb == 0:
            is_first = i == 0
            a_new = jnp.where(is_first, a1, a_new)
            a2_next = jnp.where(is_first, a2, a1)
            ptr = jnp.where(is_first, 0, ptr)
        else:
            a2_next = a1

        kidx = jax.lax.broadcasted_iota(jnp.int32, a_new.shape, 0)
        sel = kidx == fink_ref[kb]
        term_ref[kb] = jnp.where(sel, a_new, NEG).max(axis=0, keepdims=True)
        ptr_ref[kb] = ptr
        a1, a2 = a_new, a2_next

    a1_ref[:, :] = a1
    a2_ref[:, :] = a2


@jax.jit
def banded_mea_pallas(
    wdiag, wup, wleft, valid, s1, s2, final_d, final_k
):
    """Drop-in Pallas version of ops.mea.banded_mea (same MeaResult)."""
    from .mea import MeaResult

    D1, Wp, B = wdiag.shape
    K = STEP_BLOCK
    D1K = -(-D1 // K) * K
    G = D1K // K

    wd = _pad_steps(wdiag, D1K)
    wu = _pad_steps(wup, D1K)
    wl = _pad_steps(wleft, D1K)
    va = _pad_steps(valid.astype(jnp.int8), D1K)
    s1p = _pad_steps(s1.astype(jnp.int32), D1K)[:, None, :]
    s2p = _pad_steps(s2.astype(jnp.int32), D1K)[:, None, :]
    fink = jnp.broadcast_to(
        final_k.astype(jnp.int32)[None, None, :], (D1K, 1, B)
    )

    blk3 = pl.BlockSpec((K, Wp, B), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    blk2 = pl.BlockSpec((K, 1, B), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)

    ptrs, terms = pl.pallas_call(
        _mea_kernel,
        grid=(G,),
        in_specs=[blk3, blk3, blk3, blk3, blk2, blk2, blk2],
        out_specs=[blk3, blk2],
        out_shape=[
            jax.ShapeDtypeStruct((D1K, Wp, B), jnp.int32),
            jax.ShapeDtypeStruct((D1K, 1, B), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((Wp, B), jnp.float32) for _ in range(2)],
        interpret=_use_interpret(),
        compiler_params=_compiler_params(min_mb=64),
    )(wd, wu, wl, va, s1p, s2p, fink)

    d_idx = final_d.astype(jnp.int32)
    b_idx = jnp.arange(B)
    return MeaResult(
        pointers=ptrs[:D1].astype(jnp.uint8),
        score=terms[d_idx, 0, b_idx],
    )


# ---------------------------------------------- MEA over multi-problem lanes


def _mea_kernel_dl(
    post_ref, valid_ref, s1_ref, s2_ref, fink_ref, er_ref, ec_ref,
    initup_ref, params_ref,
    ptr_ref, term_ref,
    a1_ref, a2_ref, wu_ref, wl_ref,
):
    """MEA decode with DELAY-LINE gap weights: instead of reading
    pre-materialised wup/wleft [D1, Wp, B] streams (8 B/cell of HBM
    traffic each way, built by a per-lane take_along_axis that
    scalarises on TPU — benchmarks/pipelined_sweep.py 'wgo' mode), the
    kernel carries the band window of per-position gap weights in VMEM
    scratch and shifts in ONE entering value per diagonal per side:

      wup window row k holds g_read[lo(d)+k-1]; when the band steps
      (s1==1) the window rolls up and g_read[lo(d)+Wp-2] (the er
      stream) enters at the top row.  wleft row k holds
      g_ref[d-lo(d)-k-1]; when the band does NOT step (s1==0) it rolls
      down and g_ref[d-lo(d)-1] (ec) enters at row 0.  Entering values
      for rows that are out of band are bounded garbage ([0, gapGamma])
      masked the same way the rolled score frontier's wrapped rows are.

    The wdiag mask (post >= matchGamma, else NEG) is applied in-kernel
    from the raw posterior band, so no masked copy is materialised
    either.  Reference semantics: gap weights gapGamma*(1 - posterior
    row/col mass), marginAlignLib.py AMAP realignment."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        neg = jnp.full_like(a1_ref[:, :], NEG)
        row0 = jax.lax.broadcasted_iota(jnp.int32, neg.shape, 0) == 0
        a1_ref[:, :] = jnp.where(row0, 0.0, NEG)
        a2_ref[:, :] = neg
        wu_ref[:, :] = initup_ref[:, :]
        wl_ref[:, :] = jnp.zeros_like(wl_ref)

    a1 = a1_ref[:, :]
    a2 = a2_ref[:, :]
    wu_w = wu_ref[:, :]
    wl_w = wl_ref[:, :]
    Wp = a1.shape[0]
    kidx = jax.lax.broadcasted_iota(jnp.int32, a1.shape, 0)
    mg = params_ref[0, 0]

    for kb in range(STEP_BLOCK):
        valid = valid_ref[kb].astype(jnp.float32) != 0.0
        s1 = s1_ref[kb]
        s2 = s2_ref[kb]
        post = post_ref[kb]
        wd = jnp.where((post >= mg) & (post > 0), post, NEG)

        wu_new = _roll_shift(wu_w, s1 == 1, False)
        wu_new = jnp.where((kidx == Wp - 1) & (s1 == 1),
                           er_ref[kb], wu_new)
        wl_new = _roll_shift(wl_w, False, s1 == 0)
        wl_new = jnp.where((kidx == 0) & (s1 == 0),
                           ec_ref[kb], wl_new)
        if kb == 0:
            is_first = i == 0
            wu_new = jnp.where(is_first, wu_w, wu_new)
            wl_new = jnp.where(is_first, wl_w, wl_new)

        diag = _roll_shift(a2, s2 == 2, s2 == 0) + wd
        left = _roll_shift(a1, s1 == 1, False) + wl_new
        up = _roll_shift(a1, False, s1 == 0) + wu_new

        a_new, ptr = _max_argmax3(diag, left, up)
        a_new = jnp.where(valid, a_new, NEG)

        if kb == 0:
            a_new = jnp.where(is_first, a1, a_new)
            a2_next = jnp.where(is_first, a2, a1)
            ptr = jnp.where(is_first, 0, ptr)
        else:
            a2_next = a1

        sel = kidx == fink_ref[kb]
        term_ref[kb] = jnp.where(sel, a_new, NEG).max(axis=0, keepdims=True)
        ptr_ref[kb] = ptr
        a1, a2 = a_new, a2_next
        wu_w, wl_w = wu_new, wl_new

    a1_ref[:, :] = a1
    a2_ref[:, :] = a2
    wu_ref[:, :] = wu_w
    wl_ref[:, :] = wl_w


@functools.partial(jax.jit, static_argnames=("rgm", "rgn"))
def _mea_dl_jit(post, valid, s1, s2, final_k, lo, accr, accc,
                gap_gamma, match_gamma, rgm: int, rgn: int):
    """Pointers + terminal scores via the delay-line MEA kernel.

    accr/accc are the per-position posterior row/col sums (the fused mw
    serving path's assembled flush streams); the entering-value streams
    are built by two monotone_gather calls (no scalarised gathers
    anywhere on this path)."""
    from .bucket_scatter import GROUP, monotone_gather

    D1, Wp, B = post.shape
    K = STEP_BLOCK
    D1K = -(-D1 // K) * K
    G = D1K // K
    D1G = -(-D1K // GROUP) * GROUP

    g_read = gap_gamma * jnp.clip(1.0 - accr, 0.0, 1.0)  # [rgm, B]
    g_ref = gap_gamma * jnp.clip(1.0 - accc, 0.0, 1.0)   # [rgn, B]

    lo32 = lo.astype(jnp.int32)
    lo_pad = jnp.concatenate(
        [lo32, jnp.broadcast_to(lo32[-1:], (D1G - D1, B))], axis=0
    )
    d_iota = jax.lax.broadcasted_iota(jnp.int32, (D1G, B), 0)
    er_idx = jnp.clip(lo_pad + Wp - 2, 0, rgm - 1)
    ec_idx = jnp.clip(d_iota - lo_pad - 1, 0, rgn - 1)
    er = monotone_gather(g_read, er_idx)[:D1K, None, :]
    ec = monotone_gather(g_ref, ec_idx)[:D1K, None, :]

    k_io = jax.lax.broadcasted_iota(jnp.int32, (Wp, B), 0)
    initup = jnp.where(
        k_io >= 1,
        jnp.concatenate(
            [jnp.zeros((1, B), g_read.dtype), g_read[: Wp - 1]], axis=0
        ),
        0.0,
    )

    pm = _pad_steps(post, D1K)
    va = _pad_steps(valid.astype(jnp.int8), D1K)
    s1p = _pad_steps(s1.astype(jnp.int32), D1K)[:, None, :]
    s2p = _pad_steps(s2.astype(jnp.int32), D1K)[:, None, :]
    fink = jnp.broadcast_to(
        final_k.astype(jnp.int32)[None, None, :], (D1K, 1, B)
    )
    params = jnp.full((1, 2), match_gamma, jnp.float32)

    blk3 = pl.BlockSpec((K, Wp, B), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    blk2 = pl.BlockSpec((K, 1, B), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)

    ptrs, terms = pl.pallas_call(
        _mea_kernel_dl,
        grid=(G,),
        in_specs=[blk3, blk3, blk2, blk2, blk2, blk2, blk2, full, full],
        out_specs=[blk3, blk2],
        out_shape=[
            jax.ShapeDtypeStruct((D1K, Wp, B), jnp.int32),
            jax.ShapeDtypeStruct((D1K, 1, B), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((Wp, B), jnp.float32)
                        for _ in range(4)],
        interpret=_use_interpret(),
        compiler_params=_compiler_params(min_mb=64),
    )(pm, va, s1p, s2p, fink, er, ec, initup, params)
    return ptrs, terms


def banded_mea_pallas_dl(
    post, lo, m, n, width, final_d, final_k, accr, accc,
    gap_gamma: float, match_gamma: float, pack_bits: int = 8,
):
    """Drop-in banded_mea from the RAW posterior band + per-position
    row/col sums (same MeaResult as banded_mea_pallas, which takes
    pre-built wdiag/wup/wleft streams).  valid/s1/s2 are derived ON
    DEVICE from the [D1, B] lo stream (band.band_masks_device) — the
    524MB valid upload per bucket costs ~0.7s through the tunnel."""
    from .band import band_masks_device
    from .mea import MeaResult

    D1 = post.shape[0]
    Wp = post.shape[1]
    B = post.shape[2]
    lo_dev = jnp.asarray(lo)
    valid, s1, s2 = band_masks_device(
        lo_dev, jnp.asarray(m), jnp.asarray(n), int(width), Wp
    )
    ptrs, terms = _mea_dl_jit(
        jnp.asarray(post), valid, s1, s2,
        jnp.asarray(final_k), lo_dev,
        jnp.asarray(accr), jnp.asarray(accc),
        jnp.float32(gap_gamma), jnp.float32(match_gamma),
        rgm=int(accr.shape[0]), rgn=int(accc.shape[0]),
    )
    d_idx = jnp.asarray(final_d).astype(jnp.int32)
    b_idx = jnp.arange(B)
    return MeaResult(
        pointers=pack_ptr_bits(ptrs[:D1], pack_bits),
        score=terms[d_idx, 0, b_idx],
    )


def _mea_kernel_multi(
    wd_ref, wu_ref, wl_ref, valid_ref, s1_ref, s2_ref, start_ref, fink_ref,
    find_ref,
    ptr_ref, term_ref,
    a1_ref, a2_ref,
):
    """MEA decode over packed lanes: each problem's local d = 0 re-seeds the
    score frontier at band row 0 (spacer steps have pushed it to NEG)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        neg = jnp.full_like(a1_ref[:, :], NEG)
        a1_ref[:, :] = neg
        a2_ref[:, :] = neg

    a1 = a1_ref[:, :]
    a2 = a2_ref[:, :]

    for kb in range(STEP_BLOCK):
        valid = valid_ref[kb].astype(jnp.float32) != 0.0
        s1 = s1_ref[kb]
        s2 = s2_ref[kb]

        diag = _roll_shift(a2, s2 == 2, s2 == 0) + wd_ref[kb]
        left = _roll_shift(a1, s1 == 1, False) + wl_ref[kb]
        up = _roll_shift(a1, False, s1 == 0) + wu_ref[kb]

        a_new, ptr = _max_argmax3(diag, left, up)
        a_new = jnp.where(valid, a_new, NEG)

        kidx = jax.lax.broadcasted_iota(jnp.int32, a_new.shape, 0)
        seed = (kidx == 0) & (start_ref[kb].astype(jnp.float32) != 0.0)
        a_new = jnp.where(seed, 0.0, a_new)
        ptr = jnp.where(seed, 0, ptr)

        sel = (kidx == fink_ref[kb]) & (find_ref[kb] >= 0)
        term_ref[kb] = jnp.where(sel, a_new, NEG).max(axis=0, keepdims=True)
        ptr_ref[kb] = ptr
        a1, a2 = a_new, a1

    a1_ref[:, :] = a1
    a2_ref[:, :] = a2


@jax.jit
def banded_mea_pallas_multi(
    wdiag, wup, wleft, valid, s1, s2, start, find, fink,
    p_final_d, p_lane,
):
    """Pointers + per-problem scores for a multi-problem MEA decode."""
    from .mea import MeaResult

    D1, Wp, B = wdiag.shape
    K = STEP_BLOCK
    D1K = -(-D1 // K) * K
    G = D1K // K

    wd = _pad_steps(wdiag, D1K)
    wu = _pad_steps(wup, D1K)
    wl = _pad_steps(wleft, D1K)
    va = _pad_steps(valid.astype(jnp.int8), D1K)
    s1p = _pad_steps(s1.astype(jnp.int32), D1K)[:, None, :]
    s2p = _pad_steps(s2.astype(jnp.int32), D1K)[:, None, :]
    stp = _pad_steps(start.astype(jnp.int8), D1K)[:, None, :]
    fkp = jnp.pad(fink.astype(jnp.int32), [(0, D1K - D1), (0, 0)],
                  constant_values=-1)[:, None, :]
    fdp = jnp.pad(find.astype(jnp.int32), [(0, D1K - D1), (0, 0)],
                  constant_values=-1)[:, None, :]

    blk3 = pl.BlockSpec((K, Wp, B), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    blk2 = pl.BlockSpec((K, 1, B), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)

    ptrs, terms = pl.pallas_call(
        _mea_kernel_multi,
        grid=(G,),
        in_specs=[blk3, blk3, blk3, blk3, blk2, blk2, blk2, blk2, blk2],
        out_specs=[blk3, blk2],
        out_shape=[
            jax.ShapeDtypeStruct((D1K, Wp, B), jnp.int32),
            jax.ShapeDtypeStruct((D1K, 1, B), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((Wp, B), jnp.float32) for _ in range(2)],
        interpret=_use_interpret(),
        compiler_params=_compiler_params(min_mb=64),
    )(wd, wu, wl, va, s1p, s2p, stp, fkp, fdp)

    score = terms[p_final_d.astype(jnp.int32), 0, p_lane.astype(jnp.int32)]
    return MeaResult(pointers=ptrs[:D1].astype(jnp.uint8), score=score)
