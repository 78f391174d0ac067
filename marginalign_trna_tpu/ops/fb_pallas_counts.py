"""Pallas kernels for Baum-Welch expected counts (the EM E-step).

Unlike the posterior path (fb_pallas.py), EM needs expected transition
counts and per-state emission counts, and the model changes every
iteration, so tables stay dynamic VMEM inputs (one compile for the whole
training run).

Design:
  - forward stores all five scaled state frontiers to HBM
    ([D1K, 5, Wp, B] blocks);
  - backward accumulates, in VMEM scratch, the per-(from,to) transition
    partials  sum_k F_hat[s] * q_hat[t] * alpha  reduced over the band and
    kept per-lane ([25 rows, B]); gap-state occupancy-by-code partials are
    accumulated the same way ([4*5 rows, B]); the match-emission counts are
    reduced outside the kernel from the posterior band (one parallel XLA
    einsum);
  - the host multiplies transition partials by T and sums over lanes.

Validated against the XLA engine / numpy oracle in tests/test_pallas.py.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fb import DeviceBatch, FbTables
from .fb_pallas import (
    STEP_BLOCK, _TableView, _bwd_divide_step, _bwd_rescale_step, _emissions,
    _fwd_divide_step, _fwd_rescale_step, _max5, _mix, _pad_steps,
    _roll_shift, _sum5, _use_interpret, check_uniform_pi,
)

_NSTATE = 5


def _fwd_all_impl(
    axis,
    xb_ref, yb_ref, valid_ref, s1_ref, fink_ref,
    T_ref, Em_ref, Eg_ref,
    f_out_ref, lsf_ref, term_ref,
    f1_0, f1_1, f1_2, f1_3, f1_4, f2_0, f2_1, f2_2, f2_3, f2_4,
    ls_ref, cprev_ref, sh_ref,
):
    """axis = grid axis that walks diagonal blocks (1 when a leading trials
    axis streams one model table per trial; scratch re-inits per trial).
    fink is a per-lane constant ([1, B] whole block); s2 is derived from
    the s1 stream via a one-step delay (s2(d) = s1(d) + s1(d-1))."""
    T = _TableView.from_ref(T_ref)
    Em = _TableView.from_ref(Em_ref)
    Eg = _TableView.from_ref(Eg_ref)
    f1_refs = (f1_0, f1_1, f1_2, f1_3, f1_4)
    f2_refs = (f2_0, f2_1, f2_2, f2_3, f2_4)
    i = pl.program_id(axis)

    @pl.when(i == 0)
    def _init():
        zero = jnp.zeros_like(f1_refs[0][:, :])
        row0 = jax.lax.broadcasted_iota(jnp.int32, zero.shape, 0) == 0
        # Uniform start distribution baked in (check_uniform_pi at entry).
        init = jnp.where(row0, 0.2, 0.0)
        for s in range(_NSTATE):
            f1_refs[s][:, :] = init
            f2_refs[s][:, :] = zero
        ls_ref[:, :] = jnp.zeros_like(ls_ref)
        cprev_ref[:, :] = jnp.ones_like(cprev_ref)
        sh_ref[:, :] = jnp.zeros_like(sh_ref)

    f1 = [f1_refs[s][:, :] for s in range(_NSTATE)]
    f2 = [f2_refs[s][:, :] for s in range(_NSTATE)]
    ls = ls_ref[:, :]
    cprev = cprev_ref[:, :]
    zero_arr = jnp.zeros_like(f1[0])
    sprev = sh_ref[:, :]
    fink = fink_ref[:, :]

    for kb in range(STEP_BLOCK):
        xb = xb_ref[kb].astype(jnp.int32)
        yb = yb_ref[kb].astype(jnp.int32)
        valid = valid_ref[kb].astype(jnp.float32)
        s1 = s1_ref[kb]
        s2 = s1 + sprev
        sprev = s1

        e_match, e_gap = _emissions(Em, Eg, xb, yb)

        mix_m = _mix(T, f2, 0, zero_arr)
        if _fwd_divide_step(kb):
            mix_m = mix_m / cprev
        mix_g = [_mix(T, f1, t, zero_arr) for t in range(1, _NSTATE)]

        new = [None] * _NSTATE
        new[0] = e_match * _roll_shift(mix_m, s2 == 2, s2 == 0) * valid
        for s in (1, 3):
            new[s] = e_gap[s] * _roll_shift(
                mix_g[s - 1], s1 == 1, False) * valid
        for s in (2, 4):
            new[s] = e_gap[s] * _roll_shift(
                mix_g[s - 1], False, s1 == 0) * valid

        rescale = _fwd_rescale_step(kb)
        kidx = jax.lax.broadcasted_iota(jnp.int32, new[0].shape, 0)
        sel = (kidx == fink).astype(jnp.float32)
        term = (_sum5(new) * sel).sum(axis=0, keepdims=True)
        if rescale:
            fmax = _max5(new).max(axis=0, keepdims=True)
            c = jnp.where(fmax > 0, fmax, 1.0)
            inv_c = 1.0 / c
            term = term * inv_c
            scaled = [new[s] * inv_c for s in range(_NSTATE)]
        else:
            scaled = new

        if kb == 0:
            is_first = i == 0
            f1_next = [jnp.where(is_first, f1[s], scaled[s])
                       for s in range(_NSTATE)]
            f2_next = [jnp.where(is_first, f2[s], f1[s])
                       for s in range(_NSTATE)]
            if rescale:  # only when STEP_BLOCK == 1
                ls = jnp.where(is_first, ls, ls + jnp.log(c))
                cprev = jnp.where(is_first, cprev, c)
            term = jnp.where(
                is_first, (_sum5(f1) * sel).sum(axis=0, keepdims=True), term
            )
        else:
            f1_next = scaled
            f2_next = f1
            if rescale:
                ls = ls + jnp.log(c)
                cprev = c

        for s in range(_NSTATE):
            f_out_ref[kb, s] = f1_next[s]
        lsf_ref[kb] = ls
        term_ref[kb] = term
        f1, f2 = f1_next, f2_next

    for s in range(_NSTATE):
        f1_refs[s][:, :] = f1[s]
        f2_refs[s][:, :] = f2[s]
    ls_ref[:, :] = ls
    cprev_ref[:, :] = cprev
    sh_ref[:, :] = sprev


_fwd_all_kernel = functools.partial(_fwd_all_impl, 0)


def _bwd_counts_impl(
    axis,
    f_ref, lsf_ref, valid_ref,
    xb_ref, yb_ref, s1_ref,
    fink_ref, find_ref,
    T_ref, Em_ref, Eg_ref, logZ_ref,
    post_ref, tcp_ref, egp_ref,
    b1_0, b1_1, b1_2, b1_3, b1_4, b2_0, b2_1, b2_2, b2_3, b2_4,
    bls_ref, cprev_ref, tca_ref, ega_ref,
    em_h1_ref, em_h2_ref, eg_h1_ref, eg_h2_ref, eg_h3_ref, eg_h4_ref,
    sh_ref,
):
    """Walking d downward: emissions at d+1/d+2 and s1 at d+1/d+2 were
    computed/read one and two steps ago and carried in scratch delay lines
    — no shifted xb/yb/s1/s2 stream copies.  fink/find are per-lane
    constants ([1, B] whole blocks)."""
    T = _TableView.from_ref(T_ref)
    Em = _TableView.from_ref(Em_ref)
    Eg = _TableView.from_ref(Eg_ref)
    b1_refs = (b1_0, b1_1, b1_2, b1_3, b1_4)
    b2_refs = (b2_0, b2_1, b2_2, b2_3, b2_4)
    eg_h_refs = (eg_h1_ref, eg_h2_ref, eg_h3_ref, eg_h4_ref)
    i = pl.program_id(axis)
    K = STEP_BLOCK

    @pl.when(i == 0)
    def _init():
        zero = jnp.zeros_like(b1_refs[0][:, :])
        for s in range(_NSTATE):
            b1_refs[s][:, :] = zero
            b2_refs[s][:, :] = zero
        bls_ref[:, :] = jnp.zeros_like(bls_ref)
        cprev_ref[:, :] = jnp.ones_like(cprev_ref)
        tca_ref[:, :] = jnp.zeros_like(tca_ref)
        ega_ref[:, :] = jnp.zeros_like(ega_ref)
        em_h1_ref[:, :] = zero
        em_h2_ref[:, :] = zero
        for r in eg_h_refs:
            r[:, :] = zero
        sh_ref[:, :] = jnp.zeros_like(sh_ref)

    b1 = [b1_refs[s][:, :] for s in range(_NSTATE)]
    b2 = [b2_refs[s][:, :] for s in range(_NSTATE)]
    bls = bls_ref[:, :]
    cprev = cprev_ref[:, :]
    logZ = logZ_ref[0] if len(logZ_ref.shape) == 3 else logZ_ref[:, :]
    tca = tca_ref[:, :]   # [32, B] rows s*5+t
    ega = ega_ref[:, :]   # [32, B] rows (s-1)*5+code
    em_h1 = em_h1_ref[:, :]
    em_h2 = em_h2_ref[:, :]
    eg_h = [None] + [r[:, :] for r in eg_h_refs]  # e_gap at d+1
    sh1 = sh_ref[0:1, :]
    sh2 = sh_ref[1:2, :]
    fink = fink_ref[:, :]
    find = find_ref[:, :]

    blk_base = (pl.num_programs(axis) - 1 - i) * K
    for t_step in range(K):
        kb = K - 1 - t_step
        d = blk_base + kb

        valid = valid_ref[kb].astype(jnp.float32)
        xb = xb_ref[kb].astype(jnp.int32)
        yb = yb_ref[kb].astype(jnp.int32)
        s1n = sh1
        s2n = sh2 + sh1
        f_d = [f_ref[kb, s] for s in range(_NSTATE)]

        e_match2 = em_h2
        e_gap1 = eg_h

        q = [None] * _NSTATE
        q[0] = _roll_shift(e_match2 * b2[0], s2n == 0, s2n == 2)
        if _bwd_divide_step(kb):
            q[0] = q[0] / cprev
        for s in (1, 3):
            q[s] = _roll_shift(e_gap1[s] * b1[s], False, s1n == 1)
        for s in (2, 4):
            q[s] = _roll_shift(e_gap1[s] * b1[s], s1n == 0, False)

        # Shift the delay lines: emissions at d, s1 at d.
        e_match_d, e_gap_d = _emissions(Em, Eg, xb, yb)
        em_h2 = em_h1
        em_h1 = e_match_d
        zero_like = jnp.zeros_like(q[0])
        eg_h = [None] + [
            e_gap_d[s] if not isinstance(e_gap_d[s], float)
            else jnp.full_like(zero_like, e_gap_d[s])
            for s in range(1, _NSTATE)
        ]
        sh2 = sh1
        sh1 = s1_ref[kb]

        kidx = jax.lax.broadcasted_iota(jnp.int32, q[0].shape, 0)
        inj = jnp.where(
            (kidx == jnp.where(find == d, fink, -1)), 1.0, 0.0
        )

        zero_arr = jnp.zeros_like(q[0])
        new = [None] * _NSTATE
        for s in range(_NSTATE):
            acc = None
            for u in range(_NSTATE):
                term = q[u] * T[s][u]
                acc = term if acc is None else acc + term
            new[s] = (acc + inj) * valid

        if _bwd_rescale_step(kb):
            bmax = _max5(new).max(axis=0, keepdims=True)
            c = jnp.where(bmax > 0, bmax, 1.0)
            inv_c = 1.0 / c
            bls = bls + jnp.log(c)
            cprev = c
            b_out = [new[s] * inv_c for s in range(_NSTATE)]
            alpha0 = jnp.exp(lsf_ref[kb] + bls - logZ)   # for gamma at d
            alpha1 = alpha0 * inv_c                      # q is on bls[d+1]
        else:
            b_out = new
            alpha0 = jnp.exp(lsf_ref[kb] + bls - logZ)
            alpha1 = alpha0  # no rescale: bls[d] == bls[d+1]

        post_ref[kb] = f_d[0] * b_out[0] * alpha0

        # Transition partials: rows s*5+u accumulate
        #   sum_k F_hat[s] * q_hat[u] (alpha applied; T factor on host).
        rows = []
        for s in range(_NSTATE):
            fs = f_d[s] * alpha1
            for u in range(_NSTATE):
                rows.append((fs * q[u]).sum(axis=0, keepdims=True))
        rows += [jnp.zeros_like(rows[0])] * (32 - len(rows))
        tca = tca + jnp.concatenate(rows, axis=0)

        # Gap-state occupancy-by-code partials (match handled from the
        # posterior band outside).  Row (s-1)*5 + code.  The d=0 boundary
        # cell holds the start distribution and emits nothing.
        not_boundary = jnp.where(d == 0, 0.0, 1.0)
        grows = []
        for s in range(1, _NSTATE):
            gamma_s = f_d[s] * b_out[s] * (alpha0 * not_boundary)
            basis = xb if s in (1, 3) else yb
            for code in range(5):
                m = jnp.where(basis == code, gamma_s, 0.0)
                grows.append(m.sum(axis=0, keepdims=True))
        grows += [jnp.zeros_like(grows[0])] * (32 - len(grows))
        ega = ega + jnp.concatenate(grows, axis=0)

        b2 = b1
        b1 = b_out

    for s in range(_NSTATE):
        b1_refs[s][:, :] = b1[s]
        b2_refs[s][:, :] = b2[s]
    bls_ref[:, :] = bls
    cprev_ref[:, :] = cprev
    tca_ref[:, :] = tca
    ega_ref[:, :] = ega
    em_h1_ref[:, :] = em_h1
    em_h2_ref[:, :] = em_h2
    for s in range(1, _NSTATE):
        eg_h_refs[s - 1][:, :] = eg_h[s]
    sh_ref[0:1, :] = sh1
    sh_ref[1:2, :] = sh2

    @pl.when(i == pl.num_programs(axis) - 1)
    def _emit():
        tcp_ref[0] = tca_ref[:, :]
        egp_ref[0] = ega_ref[:, :]


_bwd_counts_kernel = functools.partial(_bwd_counts_impl, 0)


class CountsResult(NamedTuple):
    logZ: jnp.ndarray         # [B]
    posteriors: jnp.ndarray   # [D1, Wp, B] match posteriors (None on the
    #                           checkpoint-recompute path)
    trans_counts: jnp.ndarray  # [5, 5]
    emit_gap: jnp.ndarray      # [5, 5] (state, code); row 0 zero
    emit_match: jnp.ndarray = None  # [5, 5] (ref, read); set when match
    #                           counts were accumulated in-kernel


@jax.jit
def _counts_pallas_jit(tables: FbTables, batch: DeviceBatch) -> CountsResult:
    D1, Wp, B = batch.xb.shape
    K = STEP_BLOCK
    D1K = -(-D1 // K) * K
    G = D1K // K

    xb = _pad_steps(batch.xb, D1K)
    yb = _pad_steps(batch.yb, D1K)
    valid = _pad_steps(batch.valid.astype(jnp.int8), D1K)
    s1 = _pad_steps(batch.s1.astype(jnp.int32), D1K)[:, None, :]
    fink = batch.final_k.astype(jnp.int32)[None, :]
    find = batch.final_d.astype(jnp.int32)[None, :]

    blk3 = pl.BlockSpec((K, Wp, B), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    blk4 = pl.BlockSpec((K, _NSTATE, Wp, B), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    blk2 = pl.BlockSpec((K, 1, B), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)

    f_all, lsf2, term2 = pl.pallas_call(
        _fwd_all_kernel,
        grid=(G,),
        in_specs=[blk3, blk3, blk3, blk2, full, full, full, full],
        out_specs=[blk4, blk2, blk2],
        out_shape=[
            jax.ShapeDtypeStruct((D1K, _NSTATE, Wp, B), jnp.float32),
            jax.ShapeDtypeStruct((D1K, 1, B), jnp.float32),
            jax.ShapeDtypeStruct((D1K, 1, B), jnp.float32),
        ],
        scratch_shapes=(
            [pltpu.VMEM((Wp, B), jnp.float32) for _ in range(10)]
            + [pltpu.VMEM((1, B), jnp.float32),
               pltpu.VMEM((1, B), jnp.float32),
               pltpu.VMEM((1, B), jnp.int32)]
        ),
        interpret=_use_interpret(),
        compiler_params=_counts_compiler_params(),
    )(xb, yb, valid, s1, fink, tables.T, tables.Ematch, tables.Egap)

    lsf = lsf2[:, 0, :]
    term = term2[:, 0, :]
    d_idx = batch.final_d.astype(jnp.int32)
    b_idx = jnp.arange(B)
    logZ = (
        jnp.log(jnp.maximum(term[d_idx, b_idx], 1e-30)) + lsf[d_idx, b_idx]
    )

    rev3 = pl.BlockSpec((K, Wp, B), lambda i: (G - 1 - i, 0, 0),
                        memory_space=pltpu.VMEM)
    rev4 = pl.BlockSpec((K, _NSTATE, Wp, B), lambda i: (G - 1 - i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    rev2 = pl.BlockSpec((K, 1, B), lambda i: (G - 1 - i, 0, 0),
                        memory_space=pltpu.VMEM)
    last_blk = pl.BlockSpec((1, 32, B), lambda i: (0, 0, 0),
                            memory_space=pltpu.VMEM)

    post, tcp, egp = pl.pallas_call(
        _bwd_counts_kernel,
        grid=(G,),
        in_specs=[
            rev4, rev2, rev3,
            rev3, rev3,           # xb, yb at d (emissions delayed in-kernel)
            rev2,                 # s1 at d (s1n/s2n delayed in-kernel)
            full, full,           # fink, find ([1, B] per-lane constants)
            full, full, full, full,
        ],
        out_specs=[rev3, last_blk, last_blk],
        out_shape=[
            jax.ShapeDtypeStruct((D1K, Wp, B), jnp.float32),
            jax.ShapeDtypeStruct((1, 32, B), jnp.float32),
            jax.ShapeDtypeStruct((1, 32, B), jnp.float32),
        ],
        scratch_shapes=(
            [pltpu.VMEM((Wp, B), jnp.float32) for _ in range(10)]
            + [pltpu.VMEM((1, B), jnp.float32),
               pltpu.VMEM((1, B), jnp.float32),
               pltpu.VMEM((32, B), jnp.float32),
               pltpu.VMEM((32, B), jnp.float32)]
            + [pltpu.VMEM((Wp, B), jnp.float32) for _ in range(6)]
            + [pltpu.VMEM((2, B), jnp.int32)]
        ),
        interpret=_use_interpret(),
        compiler_params=_counts_compiler_params(),
    )(
        f_all,
        lsf2,
        valid,
        xb, yb,
        s1,
        fink, find,
        tables.T, tables.Ematch, tables.Egap,
        logZ[None, :],
    )

    tc = (tcp[0, :25].sum(axis=1).reshape(5, 5)) * tables.T
    eg_rows = egp[0, :20].sum(axis=1).reshape(4, 5)
    emit_gap = jnp.concatenate([jnp.zeros((1, 5)), eg_rows], axis=0)
    return CountsResult(
        logZ=logZ, posteriors=post[:D1], trans_counts=tc, emit_gap=emit_gap
    )


def counts_pallas(tables: FbTables, batch: DeviceBatch) -> CountsResult:
    """Baum-Welch expected counts.  Kernel policy is _use_ckpt (auto:
    stored-forward while its bands fit HBM — faster steady-state — else
    checkpoint-recompute, which stores no forward/posterior band and
    folds emit_match in-kernel)."""
    check_uniform_pi(tables)
    if _use_ckpt(batch.xb.shape):
        return _counts_ckpt_jit(tables, batch)
    return _counts_pallas_jit(tables, batch)


def match_counts_from_posteriors(
    post: jnp.ndarray, batch: DeviceBatch
) -> jnp.ndarray:
    """[5, 5] match emission counts from the posterior band: one parallel
    XLA reduction (excludes the d=0 boundary, which carries no emission)."""
    D1 = post.shape[0]
    mask = jnp.arange(D1)[:, None, None] > 0
    p = jnp.where(mask, post, 0.0)
    out = jnp.zeros((5, 5), jnp.float32)
    xi = batch.xb[:D1].astype(jnp.int32)
    yi = batch.yb[:D1].astype(jnp.int32)
    for a in range(5):
        pa = jnp.where(xi == a, p, 0.0)
        for cc in range(5):
            out = out.at[a, cc].set(jnp.where(yi == cc, pa, 0.0).sum())
    return out


# ------------------- multi-problem lanes (short-read / tRNA EM) -----------


def _fwd_all_multi_impl(
    axis,
    xb_ref, yb_ref, valid_ref, s1_ref, fink_ref, start_ref,
    T_ref, Em_ref, Eg_ref,
    f_out_ref, lsf_ref, term_ref,
    f1_0, f1_1, f1_2, f1_3, f1_4, f2_0, f2_1, f2_2, f2_3, f2_4,
    ls_ref, cprev_ref, sh_ref,
):
    """All-states forward over multi-problem lanes (dynamic tables): each
    problem's local d = 0 seeds the start distribution in-stream (spacers
    have zeroed the frontier), exactly as fb_pallas's multi forward.
    s2 is derived (s2(d) = s1(d) + s1(d-1); safe at problem seams where
    the d-2 frontier is all-zero)."""
    T = _TableView.from_ref(T_ref)
    Em = _TableView.from_ref(Em_ref)
    Eg = _TableView.from_ref(Eg_ref)
    f1_refs = (f1_0, f1_1, f1_2, f1_3, f1_4)
    f2_refs = (f2_0, f2_1, f2_2, f2_3, f2_4)
    i = pl.program_id(axis)

    @pl.when(i == 0)
    def _init():
        zero = jnp.zeros_like(f1_refs[0][:, :])
        for s in range(_NSTATE):
            f1_refs[s][:, :] = zero
            f2_refs[s][:, :] = zero
        ls_ref[:, :] = jnp.zeros_like(ls_ref)
        cprev_ref[:, :] = jnp.ones_like(cprev_ref)
        sh_ref[:, :] = jnp.zeros_like(sh_ref)

    f1 = [f1_refs[s][:, :] for s in range(_NSTATE)]
    f2 = [f2_refs[s][:, :] for s in range(_NSTATE)]
    ls = ls_ref[:, :]
    cprev = cprev_ref[:, :]
    zero_arr = jnp.zeros_like(f1[0])
    sprev = sh_ref[:, :]

    for kb in range(STEP_BLOCK):
        xb = xb_ref[kb].astype(jnp.int32)
        yb = yb_ref[kb].astype(jnp.int32)
        valid = valid_ref[kb].astype(jnp.float32)
        s1 = s1_ref[kb]
        s2 = s1 + sprev
        sprev = s1

        e_match, e_gap = _emissions(Em, Eg, xb, yb)

        mix_m = _mix(T, f2, 0, zero_arr)
        if _fwd_divide_step(kb):
            mix_m = mix_m / cprev
        mix_g = [_mix(T, f1, t, zero_arr) for t in range(1, _NSTATE)]

        kidx = jax.lax.broadcasted_iota(jnp.int32, zero_arr.shape, 0)
        # Uniform start distribution baked in (check_uniform_pi at entry).
        inj = jnp.where((kidx == 0) & (start_ref[kb].astype(jnp.float32) != 0.0), 0.2, 0.0)

        new = [None] * _NSTATE
        new[0] = (e_match * _roll_shift(mix_m, s2 == 2, s2 == 0) * valid
                  + inj)
        for s in (1, 3):
            new[s] = e_gap[s] * _roll_shift(
                mix_g[s - 1], s1 == 1, False) * valid + inj
        for s in (2, 4):
            new[s] = e_gap[s] * _roll_shift(
                mix_g[s - 1], False, s1 == 0) * valid + inj

        rescale = _fwd_rescale_step(kb)
        sel = (kidx == fink_ref[kb]).astype(jnp.float32)
        term = (_sum5(new) * sel).sum(axis=0, keepdims=True)
        if rescale:
            fmax = _max5(new).max(axis=0, keepdims=True)
            c = jnp.where(fmax > 0, fmax, 1.0)
            inv_c = 1.0 / c
            term = term * inv_c
            scaled = [new[s] * inv_c for s in range(_NSTATE)]
            ls = ls + jnp.log(c)
            cprev = c
        else:
            scaled = new

        for s in range(_NSTATE):
            f_out_ref[kb, s] = scaled[s]
        lsf_ref[kb] = ls
        term_ref[kb] = term
        f1, f2 = scaled, f1

    for s in range(_NSTATE):
        f1_refs[s][:, :] = f1[s]
        f2_refs[s][:, :] = f2[s]
    ls_ref[:, :] = ls
    cprev_ref[:, :] = cprev
    sh_ref[:, :] = sprev


_fwd_all_kernel_multi = functools.partial(_fwd_all_multi_impl, 0)


def _bwd_counts_multi_impl(
    axis,
    f_ref, lsf_ref, valid_ref,
    xb_ref, yb_ref, s1_ref,
    fink_ref, find_ref, start_ref,
    T_ref, Em_ref, Eg_ref, L_ref,
    post_ref, tcp_ref, egp_ref,
    b1_0, b1_1, b1_2, b1_3, b1_4, b2_0, b2_1, b2_2, b2_3, b2_4,
    bls_ref, cprev_ref, tca_ref, ega_ref,
    em_h1_ref, em_h2_ref, eg_h1_ref, eg_h2_ref, eg_h3_ref, eg_h4_ref,
    sh_ref,
):
    """Counts backward over multi-problem lanes: per-step terminal streams
    inject and reset the cumulative backward scale; the per-step L stream
    (log term + lsf at the owning problem's terminal) normalises gammas per
    problem; each problem's start step is its no-emission boundary.
    Emissions at d+1/d+2 and s1n/s2n come from scratch delay lines over the
    ALIGNED xb/yb/s1 streams (no shifted stream copies)."""
    T = _TableView.from_ref(T_ref)
    Em = _TableView.from_ref(Em_ref)
    Eg = _TableView.from_ref(Eg_ref)
    b1_refs = (b1_0, b1_1, b1_2, b1_3, b1_4)
    b2_refs = (b2_0, b2_1, b2_2, b2_3, b2_4)
    eg_h_refs = (eg_h1_ref, eg_h2_ref, eg_h3_ref, eg_h4_ref)
    i = pl.program_id(axis)
    K = STEP_BLOCK

    @pl.when(i == 0)
    def _init():
        zero = jnp.zeros_like(b1_refs[0][:, :])
        for s in range(_NSTATE):
            b1_refs[s][:, :] = zero
            b2_refs[s][:, :] = zero
        bls_ref[:, :] = jnp.zeros_like(bls_ref)
        cprev_ref[:, :] = jnp.ones_like(cprev_ref)
        tca_ref[:, :] = jnp.zeros_like(tca_ref)
        ega_ref[:, :] = jnp.zeros_like(ega_ref)
        em_h1_ref[:, :] = zero
        em_h2_ref[:, :] = zero
        for r in eg_h_refs:
            r[:, :] = zero
        sh_ref[:, :] = jnp.zeros_like(sh_ref)

    b1 = [b1_refs[s][:, :] for s in range(_NSTATE)]
    b2 = [b2_refs[s][:, :] for s in range(_NSTATE)]
    bls = bls_ref[:, :]
    cprev = cprev_ref[:, :]
    tca = tca_ref[:, :]
    ega = ega_ref[:, :]
    em_h1 = em_h1_ref[:, :]
    em_h2 = em_h2_ref[:, :]
    eg_h = [None] + [r[:, :] for r in eg_h_refs]
    sh1 = sh_ref[0:1, :]
    sh2 = sh_ref[1:2, :]

    blk_base = (pl.num_programs(axis) - 1 - i) * K
    for t_step in range(K):
        kb = K - 1 - t_step
        d = blk_base + kb

        valid = valid_ref[kb].astype(jnp.float32)
        xb = xb_ref[kb].astype(jnp.int32)
        yb = yb_ref[kb].astype(jnp.int32)
        s1n = sh1
        s2n = sh2 + sh1
        f_d = [f_ref[kb, s] for s in range(_NSTATE)]

        e_match2 = em_h2
        e_gap1 = eg_h

        q = [None] * _NSTATE
        q[0] = _roll_shift(e_match2 * b2[0], s2n == 0, s2n == 2)
        if _bwd_divide_step(kb):
            q[0] = q[0] / cprev
        for s in (1, 3):
            q[s] = _roll_shift(e_gap1[s] * b1[s], False, s1n == 1)
        for s in (2, 4):
            q[s] = _roll_shift(e_gap1[s] * b1[s], s1n == 0, False)

        e_match_d, e_gap_d = _emissions(Em, Eg, xb, yb)
        em_h2 = em_h1
        em_h1 = e_match_d
        zero_like = jnp.zeros_like(q[0])
        eg_h = [None] + [
            e_gap_d[s] if not isinstance(e_gap_d[s], float)
            else jnp.full_like(zero_like, e_gap_d[s])
            for s in range(1, _NSTATE)
        ]
        sh2 = sh1
        sh1 = s1_ref[kb]

        kidx = jax.lax.broadcasted_iota(jnp.int32, q[0].shape, 0)
        is_term = find_ref[kb] == d
        inj = jnp.where((kidx == fink_ref[kb]) & is_term, 1.0, 0.0)

        new = [None] * _NSTATE
        for s in range(_NSTATE):
            acc = None
            for u in range(_NSTATE):
                term = q[u] * T[s][u]
                acc = term if acc is None else acc + term
            new[s] = (acc + inj) * valid

        bls = jnp.where(is_term, 0.0, bls)
        if _bwd_rescale_step(kb):
            bmax = _max5(new).max(axis=0, keepdims=True)
            c = jnp.where(bmax > 0, bmax, 1.0)
            inv_c = 1.0 / c
            bls = bls + jnp.log(c)
            cprev = c
            b_out = [new[s] * inv_c for s in range(_NSTATE)]
            alpha0 = jnp.exp(lsf_ref[kb] + bls - L_ref[kb])
            alpha1 = alpha0 * inv_c
        else:
            b_out = new
            alpha0 = jnp.exp(lsf_ref[kb] + bls - L_ref[kb])
            alpha1 = alpha0

        post_ref[kb] = f_d[0] * b_out[0] * alpha0

        rows = []
        for s in range(_NSTATE):
            fs = f_d[s] * alpha1
            for u in range(_NSTATE):
                rows.append((fs * q[u]).sum(axis=0, keepdims=True))
        rows += [jnp.zeros_like(rows[0])] * (32 - len(rows))
        tca = tca + jnp.concatenate(rows, axis=0)

        # Each problem's start step is its no-emission boundary.
        not_boundary = jnp.where(start_ref[kb].astype(jnp.float32) != 0.0, 0.0, 1.0)
        grows = []
        for s in range(1, _NSTATE):
            gamma_s = f_d[s] * b_out[s] * (alpha0 * not_boundary)
            basis = xb if s in (1, 3) else yb
            for code in range(5):
                m = jnp.where(basis == code, gamma_s, 0.0)
                grows.append(m.sum(axis=0, keepdims=True))
        grows += [jnp.zeros_like(grows[0])] * (32 - len(grows))
        ega = ega + jnp.concatenate(grows, axis=0)

        b2 = b1
        b1 = b_out

    for s in range(_NSTATE):
        b1_refs[s][:, :] = b1[s]
        b2_refs[s][:, :] = b2[s]
    bls_ref[:, :] = bls
    cprev_ref[:, :] = cprev
    tca_ref[:, :] = tca
    ega_ref[:, :] = ega
    em_h1_ref[:, :] = em_h1
    em_h2_ref[:, :] = em_h2
    for s in range(1, _NSTATE):
        eg_h_refs[s - 1][:, :] = eg_h[s]
    sh_ref[0:1, :] = sh1
    sh_ref[1:2, :] = sh2

    @pl.when(i == pl.num_programs(axis) - 1)
    def _emit():
        tcp_ref[0] = tca_ref[:, :]
        egp_ref[0] = ega_ref[:, :]


_bwd_counts_kernel_multi = functools.partial(_bwd_counts_multi_impl, 0)


@jax.jit
def _counts_pallas_multi_jit(tables: FbTables, mdev) -> CountsResult:
    D1, Wp, B = mdev.xb.shape
    K = STEP_BLOCK
    D1K = -(-D1 // K) * K
    G = D1K // K

    xb = _pad_steps(mdev.xb, D1K)
    yb = _pad_steps(mdev.yb, D1K)
    valid = _pad_steps(mdev.valid, D1K)
    s1 = _pad_steps(mdev.s1, D1K)[:, None, :]
    start = _pad_steps(mdev.start, D1K)[:, None, :]
    fink = jnp.pad(mdev.fink, [(0, D1K - D1), (0, 0)],
                   constant_values=-1)[:, None, :]
    find = jnp.pad(mdev.find, [(0, D1K - D1), (0, 0)],
                   constant_values=-1)[:, None, :]

    blk3 = pl.BlockSpec((K, Wp, B), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    blk4 = pl.BlockSpec((K, _NSTATE, Wp, B), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    blk2 = pl.BlockSpec((K, 1, B), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)

    f_all, lsf2, term2 = pl.pallas_call(
        _fwd_all_kernel_multi,
        grid=(G,),
        in_specs=[blk3, blk3, blk3, blk2, blk2, blk2,
                  full, full, full],
        out_specs=[blk4, blk2, blk2],
        out_shape=[
            jax.ShapeDtypeStruct((D1K, _NSTATE, Wp, B), jnp.float32),
            jax.ShapeDtypeStruct((D1K, 1, B), jnp.float32),
            jax.ShapeDtypeStruct((D1K, 1, B), jnp.float32),
        ],
        scratch_shapes=(
            [pltpu.VMEM((Wp, B), jnp.float32) for _ in range(10)]
            + [pltpu.VMEM((1, B), jnp.float32),
               pltpu.VMEM((1, B), jnp.float32),
               pltpu.VMEM((1, B), jnp.int32)]
        ),
        interpret=_use_interpret(),
        compiler_params=_counts_compiler_params(),
    )(xb, yb, valid, s1, fink, start,
      tables.T, tables.Ematch, tables.Egap)

    lsf = lsf2[:, 0, :]
    term = term2[:, 0, :]
    logterm = jnp.log(jnp.maximum(term, 1e-30)) + lsf
    sf = _pad_steps(mdev.step_final, D1K)
    L = jnp.take_along_axis(logterm, sf, axis=0)

    pf = mdev.p_final_d
    pl_ = mdev.p_lane
    p0 = mdev.p_d0
    base = jnp.where(p0 > 0, lsf[jnp.maximum(p0 - 1, 0), pl_], 0.0)
    logZ = logterm[pf, pl_] - base

    rev3 = pl.BlockSpec((K, Wp, B), lambda i: (G - 1 - i, 0, 0),
                        memory_space=pltpu.VMEM)
    rev4 = pl.BlockSpec((K, _NSTATE, Wp, B), lambda i: (G - 1 - i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    rev2 = pl.BlockSpec((K, 1, B), lambda i: (G - 1 - i, 0, 0),
                        memory_space=pltpu.VMEM)
    last_blk = pl.BlockSpec((1, 32, B), lambda i: (0, 0, 0),
                            memory_space=pltpu.VMEM)

    post, tcp, egp = pl.pallas_call(
        _bwd_counts_kernel_multi,
        grid=(G,),
        in_specs=[
            rev4, rev2, rev3,
            rev3, rev3,           # xb, yb at d (emissions delayed in-kernel)
            rev2,                 # s1 at d
            rev2, rev2, rev2,     # fink, find, start streams
            full, full, full,
            rev2,
        ],
        out_specs=[rev3, last_blk, last_blk],
        out_shape=[
            jax.ShapeDtypeStruct((D1K, Wp, B), jnp.float32),
            jax.ShapeDtypeStruct((1, 32, B), jnp.float32),
            jax.ShapeDtypeStruct((1, 32, B), jnp.float32),
        ],
        scratch_shapes=(
            [pltpu.VMEM((Wp, B), jnp.float32) for _ in range(10)]
            + [pltpu.VMEM((1, B), jnp.float32),
               pltpu.VMEM((1, B), jnp.float32),
               pltpu.VMEM((32, B), jnp.float32),
               pltpu.VMEM((32, B), jnp.float32)]
            + [pltpu.VMEM((Wp, B), jnp.float32) for _ in range(6)]
            + [pltpu.VMEM((2, B), jnp.int32)]
        ),
        interpret=_use_interpret(),
        compiler_params=_counts_compiler_params(),
    )(
        f_all,
        lsf2,
        valid,
        xb, yb,
        s1,
        fink, find, start,
        tables.T, tables.Ematch, tables.Egap,
        L[:, None, :],
    )

    tc = (tcp[0, :25].sum(axis=1).reshape(5, 5)) * tables.T
    eg_rows = egp[0, :20].sum(axis=1).reshape(4, 5)
    emit_gap = jnp.concatenate([jnp.zeros((1, 5)), eg_rows], axis=0)
    return CountsResult(
        logZ=logZ, posteriors=post[:D1], trans_counts=tc, emit_gap=emit_gap
    )


def counts_pallas_multi(tables: FbTables, mdev) -> CountsResult:
    """Baum-Welch expected counts over multi-problem lanes.  logZ is per
    problem [P]; counts/posteriors sum over every problem in the batch.
    Kernel policy per _use_ckpt (see counts_pallas)."""
    check_uniform_pi(tables)
    if _use_ckpt(mdev.xb.shape):
        return _counts_ckpt_multi_jit(tables, mdev)
    return _counts_pallas_multi_jit(tables, mdev)


def match_counts_from_posteriors_multi(post: jnp.ndarray, mdev) -> jnp.ndarray:
    """[5, 5] match emission counts over multi-problem lanes: every
    problem's start step carries no emission (local d = 0), and grid
    boundary cells are excluded by construction of the posteriors."""
    D1 = post.shape[0]
    mask = mdev.start[:D1] == 0  # [D1, B]
    p = jnp.where(mask[:, None, :], post, 0.0)
    out = jnp.zeros((5, 5), jnp.float32)
    xi = mdev.xb[:D1].astype(jnp.int32)
    yi = mdev.yb[:D1].astype(jnp.int32)
    for a in range(5):
        pa = jnp.where(xi == a, p, 0.0)
        for cc in range(5):
            out = out.at[a, cc].set(jnp.where(yi == cc, pa, 0.0).sum())
    return out


# ------------------- lockstep trials (one device call for all trials) -----


def _check_trials_tables(tables: FbTables) -> int:
    assert tables.T.ndim == 3, "trials tables must be stacked [Ntr, 5, 5]"
    check_uniform_pi(tables)
    return tables.T.shape[0]


@jax.jit
def _counts_pallas_trials_jit(
    tables: FbTables, batch: DeviceBatch
) -> CountsResult:
    Ntr = _check_trials_tables(tables)
    D1, Wp, B = batch.xb.shape
    K = STEP_BLOCK
    D1K = -(-D1 // K) * K
    G = D1K // K

    xb = _pad_steps(batch.xb, D1K)
    yb = _pad_steps(batch.yb, D1K)
    valid = _pad_steps(batch.valid.astype(jnp.int8), D1K)
    s1 = _pad_steps(batch.s1.astype(jnp.int32), D1K)[:, None, :]
    fink = batch.final_k.astype(jnp.int32)[None, :]
    find = batch.final_d.astype(jnp.int32)[None, :]

    # Shared streams: same diagonal block for every trial.
    blk3 = pl.BlockSpec((K, Wp, B), lambda t, i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    blk2 = pl.BlockSpec((K, 1, B), lambda t, i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    # Per-lane constants ([1, B] whole blocks, same for every trial).
    lane_const = pl.BlockSpec((1, B), lambda t, i: (0, 0),
                              memory_space=pltpu.VMEM)
    # Per-trial blocks.
    tab = pl.BlockSpec((1, 5, 5), lambda t, i: (t, 0, 0),
                       memory_space=pltpu.VMEM)
    tblk4 = pl.BlockSpec((K, _NSTATE, Wp, B), lambda t, i: (t * G + i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    tblk3 = pl.BlockSpec((K, Wp, B), lambda t, i: (t * G + i, 0, 0),
                         memory_space=pltpu.VMEM)
    tblk2 = pl.BlockSpec((K, 1, B), lambda t, i: (t * G + i, 0, 0),
                         memory_space=pltpu.VMEM)

    f_all, lsf2, term2 = pl.pallas_call(
        functools.partial(_fwd_all_impl, 1),
        grid=(Ntr, G),
        in_specs=[blk3, blk3, blk3, blk2, lane_const, tab, tab, tab],
        out_specs=[tblk4, tblk2, tblk2],
        out_shape=[
            jax.ShapeDtypeStruct((Ntr * D1K, _NSTATE, Wp, B), jnp.float32),
            jax.ShapeDtypeStruct((Ntr * D1K, 1, B), jnp.float32),
            jax.ShapeDtypeStruct((Ntr * D1K, 1, B), jnp.float32),
        ],
        scratch_shapes=(
            [pltpu.VMEM((Wp, B), jnp.float32) for _ in range(10)]
            + [pltpu.VMEM((1, B), jnp.float32),
               pltpu.VMEM((1, B), jnp.float32),
               pltpu.VMEM((1, B), jnp.int32)]
        ),
        interpret=_use_interpret(),
        compiler_params=_counts_compiler_params(),
    )(xb, yb, valid, s1, fink, tables.T, tables.Ematch, tables.Egap)

    lsf = lsf2.reshape(Ntr, D1K, B)
    term = term2.reshape(Ntr, D1K, B)
    d_idx = batch.final_d.astype(jnp.int32)
    b_idx = jnp.arange(B)
    logZ = (
        jnp.log(jnp.maximum(term[:, d_idx, b_idx], 1e-30))
        + lsf[:, d_idx, b_idx]
    )  # [Ntr, B]

    rev3 = pl.BlockSpec((K, Wp, B), lambda t, i: (G - 1 - i, 0, 0),
                        memory_space=pltpu.VMEM)
    rev2 = pl.BlockSpec((K, 1, B), lambda t, i: (G - 1 - i, 0, 0),
                        memory_space=pltpu.VMEM)
    trev4 = pl.BlockSpec(
        (K, _NSTATE, Wp, B), lambda t, i: (t * G + G - 1 - i, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    trev3 = pl.BlockSpec(
        (K, Wp, B), lambda t, i: (t * G + G - 1 - i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    trev2 = pl.BlockSpec(
        (K, 1, B), lambda t, i: (t * G + G - 1 - i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    tz = pl.BlockSpec((1, 1, B), lambda t, i: (t, 0, 0),
                      memory_space=pltpu.VMEM)
    tlast = pl.BlockSpec((1, 32, B), lambda t, i: (t, 0, 0),
                         memory_space=pltpu.VMEM)

    post, tcp, egp = pl.pallas_call(
        functools.partial(_bwd_counts_impl, 1),
        grid=(Ntr, G),
        in_specs=[
            trev4, trev2, rev3,
            rev3, rev3,           # xb, yb at d (emissions delayed)
            rev2,                 # s1 at d
            lane_const, lane_const,   # fink, find
            tab, tab, tab, tz,
        ],
        out_specs=[trev3, tlast, tlast],
        out_shape=[
            jax.ShapeDtypeStruct((Ntr * D1K, Wp, B), jnp.float32),
            jax.ShapeDtypeStruct((Ntr, 32, B), jnp.float32),
            jax.ShapeDtypeStruct((Ntr, 32, B), jnp.float32),
        ],
        scratch_shapes=(
            [pltpu.VMEM((Wp, B), jnp.float32) for _ in range(10)]
            + [pltpu.VMEM((1, B), jnp.float32),
               pltpu.VMEM((1, B), jnp.float32),
               pltpu.VMEM((32, B), jnp.float32),
               pltpu.VMEM((32, B), jnp.float32)]
            + [pltpu.VMEM((Wp, B), jnp.float32) for _ in range(6)]
            + [pltpu.VMEM((2, B), jnp.int32)]
        ),
        interpret=_use_interpret(),
        compiler_params=_counts_compiler_params(),
    )(
        f_all,
        lsf2,
        valid,
        xb, yb,
        s1,
        fink, find,
        tables.T, tables.Ematch, tables.Egap,
        logZ[:, None, :],
    )

    tc = tcp[:, :25].sum(axis=2).reshape(Ntr, 5, 5) * tables.T
    eg_rows = egp[:, :20].sum(axis=2).reshape(Ntr, 4, 5)
    emit_gap = jnp.concatenate(
        [jnp.zeros((Ntr, 1, 5)), eg_rows], axis=1
    )
    return CountsResult(
        logZ=logZ,
        posteriors=post.reshape(Ntr, D1K, Wp, B)[:, :D1],
        trans_counts=tc,
        emit_gap=emit_gap,
    )


def counts_pallas_trials(tables: FbTables, batch: DeviceBatch) -> CountsResult:
    """Baum-Welch expected counts for Ntr models over ONE batch in ONE
    device call: the trials axis is the major grid dimension, streaming one
    (T, Ematch, Egap) table per trial while the per-step band inputs are
    re-streamed per trial.  tables leaves are stacked [Ntr, ...]; returns
    logZ [Ntr, B], counts [Ntr, 5, 5], posteriors [Ntr, D1, Wp, B].

    Replaces the reference's serial EM trials (cPecanEm
    expectationMaximisationTrials, called at src/margin/marginAlignLib.py:
    219-221) with lockstep trials — one executable, one call per E-step.
    Kernel policy per _use_ckpt (see counts_pallas)."""
    check_uniform_pi(tables)
    if _use_ckpt(batch.xb.shape, ntr=_check_trials_tables(tables)):
        return _counts_ckpt_trials_jit(tables, batch)
    return _counts_pallas_trials_jit(tables, batch)


def match_counts_from_posteriors_trials(
    post: jnp.ndarray, batch: DeviceBatch
) -> jnp.ndarray:
    """[Ntr, 5, 5] match emission counts from per-trial posterior bands
    (excludes the d=0 boundary, which carries no emission)."""
    Ntr, D1 = post.shape[0], post.shape[1]
    mask = jnp.arange(D1)[None, :, None, None] > 0
    p = jnp.where(mask, post, 0.0)
    out = jnp.zeros((Ntr, 5, 5), jnp.float32)
    xi = batch.xb[:D1].astype(jnp.int32)[None]
    yi = batch.yb[:D1].astype(jnp.int32)[None]
    for a in range(5):
        pa = jnp.where(xi == a, p, 0.0)
        for cc in range(5):
            out = out.at[:, a, cc].set(
                jnp.where(yi == cc, pa, 0.0).sum(axis=(1, 2, 3))
            )
    return out


@jax.jit
def _counts_pallas_multi_trials_jit(tables: FbTables, mdev) -> CountsResult:
    Ntr = _check_trials_tables(tables)
    D1, Wp, B = mdev.xb.shape
    K = STEP_BLOCK
    D1K = -(-D1 // K) * K
    G = D1K // K

    xb = _pad_steps(mdev.xb, D1K)
    yb = _pad_steps(mdev.yb, D1K)
    valid = _pad_steps(mdev.valid, D1K)
    s1 = _pad_steps(mdev.s1, D1K)[:, None, :]
    start = _pad_steps(mdev.start, D1K)[:, None, :]
    fink = jnp.pad(mdev.fink, [(0, D1K - D1), (0, 0)],
                   constant_values=-1)[:, None, :]
    find = jnp.pad(mdev.find, [(0, D1K - D1), (0, 0)],
                   constant_values=-1)[:, None, :]

    blk3 = pl.BlockSpec((K, Wp, B), lambda t, i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    blk2 = pl.BlockSpec((K, 1, B), lambda t, i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    tab = pl.BlockSpec((1, 5, 5), lambda t, i: (t, 0, 0),
                       memory_space=pltpu.VMEM)
    tblk4 = pl.BlockSpec((K, _NSTATE, Wp, B), lambda t, i: (t * G + i, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    tblk2 = pl.BlockSpec((K, 1, B), lambda t, i: (t * G + i, 0, 0),
                         memory_space=pltpu.VMEM)

    f_all, lsf2, term2 = pl.pallas_call(
        functools.partial(_fwd_all_multi_impl, 1),
        grid=(Ntr, G),
        in_specs=[blk3, blk3, blk3, blk2, blk2, blk2,
                  tab, tab, tab],
        out_specs=[tblk4, tblk2, tblk2],
        out_shape=[
            jax.ShapeDtypeStruct((Ntr * D1K, _NSTATE, Wp, B), jnp.float32),
            jax.ShapeDtypeStruct((Ntr * D1K, 1, B), jnp.float32),
            jax.ShapeDtypeStruct((Ntr * D1K, 1, B), jnp.float32),
        ],
        scratch_shapes=(
            [pltpu.VMEM((Wp, B), jnp.float32) for _ in range(10)]
            + [pltpu.VMEM((1, B), jnp.float32),
               pltpu.VMEM((1, B), jnp.float32),
               pltpu.VMEM((1, B), jnp.int32)]
        ),
        interpret=_use_interpret(),
        compiler_params=_counts_compiler_params(),
    )(xb, yb, valid, s1, fink, start,
      tables.T, tables.Ematch, tables.Egap)

    lsf = lsf2.reshape(Ntr, D1K, B)
    term = term2.reshape(Ntr, D1K, B)
    logterm = jnp.log(jnp.maximum(term, 1e-30)) + lsf
    sf = jnp.broadcast_to(
        _pad_steps(mdev.step_final, D1K)[None], (Ntr, D1K, B)
    )
    L = jnp.take_along_axis(logterm, sf, axis=1)  # [Ntr, D1K, B]

    pf = mdev.p_final_d
    pl_ = mdev.p_lane
    p0 = mdev.p_d0
    base = jnp.where(
        (p0 > 0)[None], lsf[:, jnp.maximum(p0 - 1, 0), pl_], 0.0
    )
    logZ = logterm[:, pf, pl_] - base  # [Ntr, P]

    rev3 = pl.BlockSpec((K, Wp, B), lambda t, i: (G - 1 - i, 0, 0),
                        memory_space=pltpu.VMEM)
    rev2 = pl.BlockSpec((K, 1, B), lambda t, i: (G - 1 - i, 0, 0),
                        memory_space=pltpu.VMEM)
    trev4 = pl.BlockSpec(
        (K, _NSTATE, Wp, B), lambda t, i: (t * G + G - 1 - i, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    trev3 = pl.BlockSpec(
        (K, Wp, B), lambda t, i: (t * G + G - 1 - i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    trev2 = pl.BlockSpec(
        (K, 1, B), lambda t, i: (t * G + G - 1 - i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    tlast = pl.BlockSpec((1, 32, B), lambda t, i: (t, 0, 0),
                         memory_space=pltpu.VMEM)

    post, tcp, egp = pl.pallas_call(
        functools.partial(_bwd_counts_multi_impl, 1),
        grid=(Ntr, G),
        in_specs=[
            trev4, trev2, rev3,
            rev3, rev3,           # xb, yb at d (emissions delayed)
            rev2,                 # s1 at d
            rev2, rev2, rev2,     # fink, find, start streams
            tab, tab, tab,
            trev2,
        ],
        out_specs=[trev3, tlast, tlast],
        out_shape=[
            jax.ShapeDtypeStruct((Ntr * D1K, Wp, B), jnp.float32),
            jax.ShapeDtypeStruct((Ntr, 32, B), jnp.float32),
            jax.ShapeDtypeStruct((Ntr, 32, B), jnp.float32),
        ],
        scratch_shapes=(
            [pltpu.VMEM((Wp, B), jnp.float32) for _ in range(10)]
            + [pltpu.VMEM((1, B), jnp.float32),
               pltpu.VMEM((1, B), jnp.float32),
               pltpu.VMEM((32, B), jnp.float32),
               pltpu.VMEM((32, B), jnp.float32)]
            + [pltpu.VMEM((Wp, B), jnp.float32) for _ in range(6)]
            + [pltpu.VMEM((2, B), jnp.int32)]
        ),
        interpret=_use_interpret(),
        compiler_params=_counts_compiler_params(),
    )(
        f_all,
        lsf2,
        valid,
        xb, yb,
        s1,
        fink, find, start,
        tables.T, tables.Ematch, tables.Egap,
        L.reshape(Ntr * D1K, 1, B),
    )

    tc = tcp[:, :25].sum(axis=2).reshape(Ntr, 5, 5) * tables.T
    eg_rows = egp[:, :20].sum(axis=2).reshape(Ntr, 4, 5)
    emit_gap = jnp.concatenate(
        [jnp.zeros((Ntr, 1, 5)), eg_rows], axis=1
    )
    return CountsResult(
        logZ=logZ,
        posteriors=post.reshape(Ntr, D1K, Wp, B)[:, :D1],
        trans_counts=tc,
        emit_gap=emit_gap,
    )


def counts_pallas_multi_trials(tables: FbTables, mdev) -> CountsResult:
    """Lockstep-trials variant of counts_pallas_multi: Ntr models over one
    multi-problem-lane batch in one device call.  logZ is [Ntr, P].
    Kernel policy per _use_ckpt (see counts_pallas)."""
    check_uniform_pi(tables)
    if _use_ckpt(mdev.xb.shape, ntr=_check_trials_tables(tables)):
        return _counts_ckpt_multi_trials_jit(tables, mdev)
    return _counts_pallas_multi_trials_jit(tables, mdev)


def match_counts_from_posteriors_multi_trials(
    post: jnp.ndarray, mdev
) -> jnp.ndarray:
    """[Ntr, 5, 5] match emission counts over multi-problem lanes, per
    trial (every problem's start step carries no emission)."""
    Ntr, D1 = post.shape[0], post.shape[1]
    mask = (mdev.start[:D1] == 0)[None, :, None, :]
    p = jnp.where(mask, post, 0.0)
    out = jnp.zeros((Ntr, 5, 5), jnp.float32)
    xi = mdev.xb[:D1].astype(jnp.int32)[None]
    yi = mdev.yb[:D1].astype(jnp.int32)[None]
    for a in range(5):
        pa = jnp.where(xi == a, p, 0.0)
        for cc in range(5):
            out = out.at[:, a, cc].set(
                jnp.where(yi == cc, pa, 0.0).sum(axis=(1, 2, 3))
            )
    return out


# ------------- checkpoint-recompute E-step (no stored forward band) -------
#
# Hardware probes (benchmarks/limiter_probe.py) showed the kernels are
# stream-bound with large VPU headroom, and the EM path's f_all
# ([D1K, 5, Wp, B] f32, written by the forward and re-read by the
# backward: 40 B/cell) dominates its HBM traffic.  The checkpoint-
# recompute kernels apply classic rematerialisation inside Pallas: the
# forward stores only the per-grid-step frontier checkpoint (10 state
# buffers + scale rows per K=8 diagonals, ~5 B/cell), and the backward
# reloads the checkpoint, recomputes the block's forward into VMEM
# scratch (free VPU), then runs the counts backward against it.  Match-
# emission counts are accumulated in-kernel (25 more accumulator rows),
# so the posterior band is never written either (~59 -> ~20 B/cell).


def _fwd_ckpt_impl(
    axis,
    xb_ref, yb_ref, valid_ref, s1_ref, fink_ref,
    T_ref, Em_ref, Eg_ref,
    ckpt_ref, cs_ref, lsf_ref, term_ref,
    f1_0, f1_1, f1_2, f1_3, f1_4, f2_0, f2_1, f2_2, f2_3, f2_4,
    ls_ref, cprev_ref, sh_ref,
):
    """Forward identical to _fwd_all_impl except the per-step all-state
    store is replaced by one end-of-block frontier checkpoint
    (ckpt [1, 10, Wp, B] = f1 x5, f2 x5; cs [1, 4, B] = ls, cprev,
    s1(last), pad)."""
    T = _TableView.from_ref(T_ref)
    Em = _TableView.from_ref(Em_ref)
    Eg = _TableView.from_ref(Eg_ref)
    f1_refs = (f1_0, f1_1, f1_2, f1_3, f1_4)
    f2_refs = (f2_0, f2_1, f2_2, f2_3, f2_4)
    i = pl.program_id(axis)

    @pl.when(i == 0)
    def _init():
        zero = jnp.zeros_like(f1_refs[0][:, :])
        row0 = jax.lax.broadcasted_iota(jnp.int32, zero.shape, 0) == 0
        init = jnp.where(row0, 0.2, 0.0)
        for s in range(_NSTATE):
            f1_refs[s][:, :] = init
            f2_refs[s][:, :] = zero
        ls_ref[:, :] = jnp.zeros_like(ls_ref)
        cprev_ref[:, :] = jnp.ones_like(cprev_ref)
        sh_ref[:, :] = jnp.zeros_like(sh_ref)

    f1 = [f1_refs[s][:, :] for s in range(_NSTATE)]
    f2 = [f2_refs[s][:, :] for s in range(_NSTATE)]
    ls = ls_ref[:, :]
    cprev = cprev_ref[:, :]
    zero_arr = jnp.zeros_like(f1[0])
    sprev = sh_ref[:, :]
    fink = fink_ref[:, :]

    for kb in range(STEP_BLOCK):
        xb = xb_ref[kb].astype(jnp.int32)
        yb = yb_ref[kb].astype(jnp.int32)
        valid = valid_ref[kb].astype(jnp.float32)
        s1 = s1_ref[kb]
        s2 = s1 + sprev
        sprev = s1

        e_match, e_gap = _emissions(Em, Eg, xb, yb)

        mix_m = _mix(T, f2, 0, zero_arr)
        if _fwd_divide_step(kb):
            mix_m = mix_m / cprev
        mix_g = [_mix(T, f1, t, zero_arr) for t in range(1, _NSTATE)]

        new = [None] * _NSTATE
        new[0] = e_match * _roll_shift(mix_m, s2 == 2, s2 == 0) * valid
        for s in (1, 3):
            new[s] = e_gap[s] * _roll_shift(
                mix_g[s - 1], s1 == 1, False) * valid
        for s in (2, 4):
            new[s] = e_gap[s] * _roll_shift(
                mix_g[s - 1], False, s1 == 0) * valid

        rescale = _fwd_rescale_step(kb)
        kidx = jax.lax.broadcasted_iota(jnp.int32, new[0].shape, 0)
        sel = (kidx == fink).astype(jnp.float32)
        term = (_sum5(new) * sel).sum(axis=0, keepdims=True)
        if rescale:
            fmax = _max5(new).max(axis=0, keepdims=True)
            c = jnp.where(fmax > 0, fmax, 1.0)
            inv_c = 1.0 / c
            term = term * inv_c
            scaled = [new[s] * inv_c for s in range(_NSTATE)]
        else:
            scaled = new

        if kb == 0:
            is_first = i == 0
            f1_next = [jnp.where(is_first, f1[s], scaled[s])
                       for s in range(_NSTATE)]
            f2_next = [jnp.where(is_first, f2[s], f1[s])
                       for s in range(_NSTATE)]
            if rescale:  # only when STEP_BLOCK == 1
                ls = jnp.where(is_first, ls, ls + jnp.log(c))
                cprev = jnp.where(is_first, cprev, c)
            term = jnp.where(
                is_first, (_sum5(f1) * sel).sum(axis=0, keepdims=True), term
            )
        else:
            f1_next = scaled
            f2_next = f1
            if rescale:
                ls = ls + jnp.log(c)
                cprev = c

        lsf_ref[kb] = ls
        term_ref[kb] = term
        f1, f2 = f1_next, f2_next

    for s in range(_NSTATE):
        ckpt_ref[0, s] = f1[s]
        ckpt_ref[0, 5 + s] = f2[s]
        f1_refs[s][:, :] = f1[s]
        f2_refs[s][:, :] = f2[s]
    cs_ref[0, 0:1] = ls
    cs_ref[0, 1:2] = cprev
    cs_ref[0, 2:3] = sprev.astype(jnp.float32)
    cs_ref[0, 3:4] = jnp.zeros_like(ls)
    ls_ref[:, :] = ls
    cprev_ref[:, :] = cprev
    sh_ref[:, :] = sprev


def _bwd_counts_ckpt_impl(
    axis,
    ckpt_ref, cs_ref, valid_ref, xb_ref, yb_ref, s1_ref,
    fink_ref, find_ref,
    T_ref, Em_ref, Eg_ref, logZ_ref,
    tcp_ref, egp_ref, mcp_ref,
    b1_0, b1_1, b1_2, b1_3, b1_4, b2_0, b2_1, b2_2, b2_3, b2_4,
    bls_ref, cprev_ref, tca_ref, ega_ref, mca_ref,
    em_h1_ref, em_h2_ref, eg_h1_ref, eg_h2_ref, eg_h3_ref, eg_h4_ref,
    sh_ref, fs_ref, lsb_ref,
):
    """Counts backward over one diagonal block: loads the previous block's
    frontier checkpoint, recomputes the block's forward into fs/lsb VMEM
    scratch, then runs the transition/gap/match count accumulation exactly
    like _bwd_counts_impl but against the recomputed values.  The match-
    emission counts are folded in (rows of mca), so no posterior band is
    emitted."""
    T = _TableView.from_ref(T_ref)
    Em = _TableView.from_ref(Em_ref)
    Eg = _TableView.from_ref(Eg_ref)
    b1_refs = (b1_0, b1_1, b1_2, b1_3, b1_4)
    eg_h_refs = (eg_h1_ref, eg_h2_ref, eg_h3_ref, eg_h4_ref)
    b2_refs = (b2_0, b2_1, b2_2, b2_3, b2_4)
    i = pl.program_id(axis)
    NP = pl.num_programs(axis)
    K = STEP_BLOCK
    is_g0 = i == NP - 1  # this grid step holds the forward's block 0

    @pl.when(i == 0)
    def _init():
        zero = jnp.zeros_like(b1_refs[0][:, :])
        for s in range(_NSTATE):
            b1_refs[s][:, :] = zero
            b2_refs[s][:, :] = zero
        bls_ref[:, :] = jnp.zeros_like(bls_ref)
        cprev_ref[:, :] = jnp.ones_like(cprev_ref)
        tca_ref[:, :] = jnp.zeros_like(tca_ref)
        ega_ref[:, :] = jnp.zeros_like(ega_ref)
        mca_ref[:, :] = jnp.zeros_like(mca_ref)
        em_h1_ref[:, :] = zero
        em_h2_ref[:, :] = zero
        for r in eg_h_refs:
            r[:, :] = zero
        sh_ref[:, :] = jnp.zeros_like(sh_ref)

    zero_arr = jnp.zeros_like(b1_refs[0][:, :])
    row0 = jax.lax.broadcasted_iota(jnp.int32, zero_arr.shape, 0) == 0
    finit = jnp.where(row0, 0.2, 0.0)
    blk_base = (NP - 1 - i) * K

    # ---- recompute phase (ascending kb): forward over this block from
    # the previous block's checkpoint (the init state on block 0).
    f1 = [jnp.where(is_g0, finit, ckpt_ref[0, s]) for s in range(_NSTATE)]
    f2 = [jnp.where(is_g0, zero_arr, ckpt_ref[0, 5 + s])
          for s in range(_NSTATE)]
    lsF = jnp.where(is_g0, 0.0, cs_ref[0, 0:1])
    cprevF = jnp.where(is_g0, 1.0, cs_ref[0, 1:2])
    sprev = jnp.where(is_g0, 0.0, cs_ref[0, 2:3])

    for kb in range(K):
        xb = xb_ref[kb].astype(jnp.int32)
        yb = yb_ref[kb].astype(jnp.int32)
        valid = valid_ref[kb].astype(jnp.float32)
        s1f = s1_ref[kb].astype(jnp.float32)
        s2f = s1f + sprev
        sprev = s1f

        e_match, e_gap = _emissions(Em, Eg, xb, yb)

        mix_m = _mix(T, f2, 0, zero_arr)
        if _fwd_divide_step(kb):
            mix_m = mix_m / cprevF
        mix_g = [_mix(T, f1, t, zero_arr) for t in range(1, _NSTATE)]

        new = [None] * _NSTATE
        new[0] = e_match * _roll_shift(mix_m, s2f == 2, s2f == 0) * valid
        for s in (1, 3):
            new[s] = e_gap[s] * _roll_shift(
                mix_g[s - 1], s1f == 1, False) * valid
        for s in (2, 4):
            new[s] = e_gap[s] * _roll_shift(
                mix_g[s - 1], False, s1f == 0) * valid

        rescale = _fwd_rescale_step(kb)
        if rescale:
            fmax = _max5(new).max(axis=0, keepdims=True)
            c = jnp.where(fmax > 0, fmax, 1.0)
            inv_c = 1.0 / c
            scaled = [new[s] * inv_c for s in range(_NSTATE)]
        else:
            scaled = new

        if kb == 0:
            # d = 0 (block 0 only) is pure initialisation.
            f1_next = [jnp.where(is_g0, f1[s], scaled[s])
                       for s in range(_NSTATE)]
            f2_next = [jnp.where(is_g0, f2[s], f1[s])
                       for s in range(_NSTATE)]
            if rescale:  # only when STEP_BLOCK == 1
                lsF = jnp.where(is_g0, lsF, lsF + jnp.log(c))
                cprevF = jnp.where(is_g0, cprevF, c)
        else:
            f1_next = scaled
            f2_next = f1
            if rescale:
                lsF = lsF + jnp.log(c)
                cprevF = c

        for s in range(_NSTATE):
            fs_ref[kb, s] = f1_next[s]
        lsb_ref[kb] = lsF
        f1, f2 = f1_next, f2_next

    # ---- backward counts phase (descending kb) -------------------------
    b1 = [b1_refs[s][:, :] for s in range(_NSTATE)]
    b2 = [b2_refs[s][:, :] for s in range(_NSTATE)]
    bls = bls_ref[:, :]
    cprev = cprev_ref[:, :]
    logZ = logZ_ref[0] if len(logZ_ref.shape) == 3 else logZ_ref[:, :]
    tca = tca_ref[:, :]
    ega = ega_ref[:, :]
    mca = mca_ref[:, :]
    em_h1 = em_h1_ref[:, :]
    em_h2 = em_h2_ref[:, :]
    eg_h = [None] + [r[:, :] for r in eg_h_refs]
    sh1 = sh_ref[0:1, :]
    sh2 = sh_ref[1:2, :]
    fink = fink_ref[:, :]
    find = find_ref[:, :]

    for t_step in range(K):
        kb = K - 1 - t_step
        d = blk_base + kb

        valid = valid_ref[kb].astype(jnp.float32)
        xb = xb_ref[kb].astype(jnp.int32)
        yb = yb_ref[kb].astype(jnp.int32)
        s1n = sh1
        s2n = sh2 + sh1
        f_d = [fs_ref[kb, s] for s in range(_NSTATE)]

        e_match2 = em_h2
        e_gap1 = eg_h

        q = [None] * _NSTATE
        q[0] = _roll_shift(e_match2 * b2[0], s2n == 0, s2n == 2)
        if _bwd_divide_step(kb):
            q[0] = q[0] / cprev
        for s in (1, 3):
            q[s] = _roll_shift(e_gap1[s] * b1[s], False, s1n == 1)
        for s in (2, 4):
            q[s] = _roll_shift(e_gap1[s] * b1[s], s1n == 0, False)

        e_match_d, e_gap_d = _emissions(Em, Eg, xb, yb)
        em_h2 = em_h1
        em_h1 = e_match_d
        eg_h = [None] + [
            e_gap_d[s] if not isinstance(e_gap_d[s], float)
            else jnp.full_like(zero_arr, e_gap_d[s])
            for s in range(1, _NSTATE)
        ]
        sh2 = sh1
        sh1 = s1_ref[kb]

        kidx = jax.lax.broadcasted_iota(jnp.int32, q[0].shape, 0)
        inj = jnp.where(
            (kidx == jnp.where(find == d, fink, -1)), 1.0, 0.0
        )

        new = [None] * _NSTATE
        for s in range(_NSTATE):
            acc = None
            for u in range(_NSTATE):
                term = q[u] * T[s][u]
                acc = term if acc is None else acc + term
            new[s] = (acc + inj) * valid

        if _bwd_rescale_step(kb):
            bmax = _max5(new).max(axis=0, keepdims=True)
            c = jnp.where(bmax > 0, bmax, 1.0)
            inv_c = 1.0 / c
            bls = bls + jnp.log(c)
            cprev = c
            b_out = [new[s] * inv_c for s in range(_NSTATE)]
            alpha0 = jnp.exp(lsb_ref[kb] + bls - logZ)
            alpha1 = alpha0 * inv_c
        else:
            b_out = new
            alpha0 = jnp.exp(lsb_ref[kb] + bls - logZ)
            alpha1 = alpha0

        rows = []
        for s in range(_NSTATE):
            fsv = f_d[s] * alpha1
            for u in range(_NSTATE):
                rows.append((fsv * q[u]).sum(axis=0, keepdims=True))
        rows += [jnp.zeros_like(rows[0])] * (32 - len(rows))
        tca = tca + jnp.concatenate(rows, axis=0)

        # The d=0 boundary cell holds the start distribution and emits
        # nothing: exclude it from every emission count.
        not_boundary = jnp.where(d == 0, 0.0, 1.0)
        grows = []
        for s in range(1, _NSTATE):
            gamma_s = f_d[s] * b_out[s] * (alpha0 * not_boundary)
            basis = xb if s in (1, 3) else yb
            for code in range(5):
                m = jnp.where(basis == code, gamma_s, 0.0)
                grows.append(m.sum(axis=0, keepdims=True))
        grows += [jnp.zeros_like(grows[0])] * (32 - len(grows))
        ega = ega + jnp.concatenate(grows, axis=0)

        # Match-emission counts in-kernel: rows a*5 + c.
        gamma_m = f_d[0] * b_out[0] * (alpha0 * not_boundary)
        mrows = []
        for a in range(5):
            pa = jnp.where(xb == a, gamma_m, 0.0)
            for ccode in range(5):
                mm = jnp.where(yb == ccode, pa, 0.0)
                mrows.append(mm.sum(axis=0, keepdims=True))
        mrows += [jnp.zeros_like(mrows[0])] * (32 - len(mrows))
        mca = mca + jnp.concatenate(mrows, axis=0)

        b2 = b1
        b1 = b_out

    for s in range(_NSTATE):
        b1_refs[s][:, :] = b1[s]
        b2_refs[s][:, :] = b2[s]
    bls_ref[:, :] = bls
    cprev_ref[:, :] = cprev
    tca_ref[:, :] = tca
    ega_ref[:, :] = ega
    mca_ref[:, :] = mca
    em_h1_ref[:, :] = em_h1
    em_h2_ref[:, :] = em_h2
    for s in range(1, _NSTATE):
        eg_h_refs[s - 1][:, :] = eg_h[s]
    sh_ref[0:1, :] = sh1
    sh_ref[1:2, :] = sh2

    @pl.when(i == NP - 1)
    def _emit():
        tcp_ref[0] = tca_ref[:, :]
        egp_ref[0] = ega_ref[:, :]
        mcp_ref[0] = mca_ref[:, :]


_fwd_ckpt_kernel = functools.partial(_fwd_ckpt_impl, 0)
_bwd_counts_ckpt_kernel = functools.partial(_bwd_counts_ckpt_impl, 0)


def _use_ckpt(xb_shape, ntr: int = 1) -> bool:
    """E-step kernel policy.  Pipelined (steady-state) hardware timing
    shows the STORED-forward path is faster than checkpoint-recompute
    whenever its f_all band fits HBM (4.58e9 vs 3.67e9 cells/s at
    512 x 3.5kb on v5e — the round-2 '+14% for ckpt' reading was the
    per-call dispatch floor, docs/KERNELS.md round-3 postmortem), so:

      MARGINALIGN_EM_KERNEL=auto  (default) stored while the stored
          path's big bands (f_all [D1K,5,Wp,B] + posterior band) fit
          MARGINALIGN_EM_STORED_BUDGET_MB (default 6144), else ckpt
      MARGINALIGN_EM_KERNEL=stored / ckpt   force one path
    """
    env = __import__("os").environ
    mode = env.get("MARGINALIGN_EM_KERNEL", "auto").lower()
    if mode == "stored":
        return False
    if mode == "ckpt":
        return True
    budget_mb = int(env.get("MARGINALIGN_EM_STORED_BUDGET_MB", "6144"))
    d1, wp, b = xb_shape[-3], xb_shape[-2], xb_shape[-1]
    d1k = -(-d1 // STEP_BLOCK) * STEP_BLOCK
    stored_bytes = (_NSTATE + 1) * d1k * wp * b * 4 * ntr
    return stored_bytes > budget_mb * 1024 * 1024


@jax.jit
def _counts_ckpt_jit(tables: FbTables, batch: DeviceBatch) -> CountsResult:
    D1, Wp, B = batch.xb.shape
    K = STEP_BLOCK
    D1K = -(-D1 // K) * K
    G = D1K // K

    xb = _pad_steps(batch.xb, D1K)
    yb = _pad_steps(batch.yb, D1K)
    valid = _pad_steps(batch.valid.astype(jnp.int8), D1K)
    s1 = _pad_steps(batch.s1.astype(jnp.int32), D1K)[:, None, :]
    fink = batch.final_k.astype(jnp.int32)[None, :]
    find = batch.final_d.astype(jnp.int32)[None, :]

    blk3 = pl.BlockSpec((K, Wp, B), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    blk2 = pl.BlockSpec((K, 1, B), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    ckb = pl.BlockSpec((1, 2 * _NSTATE, Wp, B), lambda i: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    csb = pl.BlockSpec((1, 4, B), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)

    ckpt, cs, lsf2, term2 = pl.pallas_call(
        _fwd_ckpt_kernel,
        grid=(G,),
        in_specs=[blk3, blk3, blk3, blk2, full, full, full, full],
        out_specs=[ckb, csb, blk2, blk2],
        out_shape=[
            jax.ShapeDtypeStruct((G, 2 * _NSTATE, Wp, B), jnp.float32),
            jax.ShapeDtypeStruct((G, 4, B), jnp.float32),
            jax.ShapeDtypeStruct((D1K, 1, B), jnp.float32),
            jax.ShapeDtypeStruct((D1K, 1, B), jnp.float32),
        ],
        scratch_shapes=(
            [pltpu.VMEM((Wp, B), jnp.float32) for _ in range(10)]
            + [pltpu.VMEM((1, B), jnp.float32),
               pltpu.VMEM((1, B), jnp.float32),
               pltpu.VMEM((1, B), jnp.int32)]
        ),
        interpret=_use_interpret(),
        compiler_params=_counts_compiler_params(),
    )(xb, yb, valid, s1, fink, tables.T, tables.Ematch, tables.Egap)

    lsf = lsf2[:, 0, :]
    term = term2[:, 0, :]
    d_idx = batch.final_d.astype(jnp.int32)
    b_idx = jnp.arange(B)
    logZ = (
        jnp.log(jnp.maximum(term[d_idx, b_idx], 1e-30)) + lsf[d_idx, b_idx]
    )

    rev3 = pl.BlockSpec((K, Wp, B), lambda i: (G - 1 - i, 0, 0),
                        memory_space=pltpu.VMEM)
    rev2 = pl.BlockSpec((K, 1, B), lambda i: (G - 1 - i, 0, 0),
                        memory_space=pltpu.VMEM)
    ckrev = pl.BlockSpec(
        (1, 2 * _NSTATE, Wp, B),
        lambda i: (jnp.maximum(G - 2 - i, 0), 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    csrev = pl.BlockSpec(
        (1, 4, B), lambda i: (jnp.maximum(G - 2 - i, 0), 0, 0),
        memory_space=pltpu.VMEM,
    )
    last_blk = pl.BlockSpec((1, 32, B), lambda i: (0, 0, 0),
                            memory_space=pltpu.VMEM)

    tcp, egp, mcp = pl.pallas_call(
        _bwd_counts_ckpt_kernel,
        grid=(G,),
        in_specs=[
            ckrev, csrev,
            rev3, rev3, rev3,     # valid, xb, yb
            rev2,                 # s1
            full, full,           # fink, find
            full, full, full, full,
        ],
        out_specs=[last_blk, last_blk, last_blk],
        out_shape=[
            jax.ShapeDtypeStruct((1, 32, B), jnp.float32),
            jax.ShapeDtypeStruct((1, 32, B), jnp.float32),
            jax.ShapeDtypeStruct((1, 32, B), jnp.float32),
        ],
        scratch_shapes=(
            [pltpu.VMEM((Wp, B), jnp.float32) for _ in range(10)]
            + [pltpu.VMEM((1, B), jnp.float32),
               pltpu.VMEM((1, B), jnp.float32),
               pltpu.VMEM((32, B), jnp.float32),
               pltpu.VMEM((32, B), jnp.float32),
               pltpu.VMEM((32, B), jnp.float32)]
            + [pltpu.VMEM((Wp, B), jnp.float32) for _ in range(6)]
            + [pltpu.VMEM((2, B), jnp.int32),
               pltpu.VMEM((K, _NSTATE, Wp, B), jnp.float32),
               pltpu.VMEM((K, 1, B), jnp.float32)]
        ),
        interpret=_use_interpret(),
        compiler_params=_counts_compiler_params(),
    )(
        ckpt, cs,
        valid, xb, yb,
        s1,
        fink, find,
        tables.T, tables.Ematch, tables.Egap,
        logZ[None, :],
    )

    tc = (tcp[0, :25].sum(axis=1).reshape(5, 5)) * tables.T
    eg_rows = egp[0, :20].sum(axis=1).reshape(4, 5)
    emit_gap = jnp.concatenate([jnp.zeros((1, 5)), eg_rows], axis=0)
    emit_match = mcp[0, :25].sum(axis=1).reshape(5, 5)
    return CountsResult(
        logZ=logZ, posteriors=None, trans_counts=tc, emit_gap=emit_gap,
        emit_match=emit_match,
    )


def _counts_compiler_params():
    """Scoped-VMEM budget for every counts kernel: the stored-forward
    kernels' f_all blocks and the checkpoint kernels' recompute scratch
    (fs: K x 5 state buffers) both exceed the 16MB compiler default at
    wide batches (first seen as a compile failure at B=2048 multi)."""
    from .fb_pallas import _compiler_params

    return _compiler_params()


@jax.jit
def _counts_ckpt_trials_jit(
    tables: FbTables, batch: DeviceBatch
) -> CountsResult:
    Ntr = _check_trials_tables(tables)
    D1, Wp, B = batch.xb.shape
    K = STEP_BLOCK
    D1K = -(-D1 // K) * K
    G = D1K // K

    xb = _pad_steps(batch.xb, D1K)
    yb = _pad_steps(batch.yb, D1K)
    valid = _pad_steps(batch.valid.astype(jnp.int8), D1K)
    s1 = _pad_steps(batch.s1.astype(jnp.int32), D1K)[:, None, :]
    fink = batch.final_k.astype(jnp.int32)[None, :]
    find = batch.final_d.astype(jnp.int32)[None, :]

    blk3 = pl.BlockSpec((K, Wp, B), lambda t, i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    blk2 = pl.BlockSpec((K, 1, B), lambda t, i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    lane_const = pl.BlockSpec((1, B), lambda t, i: (0, 0),
                              memory_space=pltpu.VMEM)
    tab = pl.BlockSpec((1, 5, 5), lambda t, i: (t, 0, 0),
                       memory_space=pltpu.VMEM)
    tckb = pl.BlockSpec((1, 2 * _NSTATE, Wp, B),
                        lambda t, i: (t * G + i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    tcsb = pl.BlockSpec((1, 4, B), lambda t, i: (t * G + i, 0, 0),
                        memory_space=pltpu.VMEM)
    tblk2 = pl.BlockSpec((K, 1, B), lambda t, i: (t * G + i, 0, 0),
                         memory_space=pltpu.VMEM)

    ckpt, cs, lsf2, term2 = pl.pallas_call(
        functools.partial(_fwd_ckpt_impl, 1),
        grid=(Ntr, G),
        in_specs=[blk3, blk3, blk3, blk2, lane_const, tab, tab, tab],
        out_specs=[tckb, tcsb, tblk2, tblk2],
        out_shape=[
            jax.ShapeDtypeStruct((Ntr * G, 2 * _NSTATE, Wp, B), jnp.float32),
            jax.ShapeDtypeStruct((Ntr * G, 4, B), jnp.float32),
            jax.ShapeDtypeStruct((Ntr * D1K, 1, B), jnp.float32),
            jax.ShapeDtypeStruct((Ntr * D1K, 1, B), jnp.float32),
        ],
        scratch_shapes=(
            [pltpu.VMEM((Wp, B), jnp.float32) for _ in range(10)]
            + [pltpu.VMEM((1, B), jnp.float32),
               pltpu.VMEM((1, B), jnp.float32),
               pltpu.VMEM((1, B), jnp.int32)]
        ),
        interpret=_use_interpret(),
        compiler_params=_counts_compiler_params(),
    )(xb, yb, valid, s1, fink, tables.T, tables.Ematch, tables.Egap)

    lsf = lsf2.reshape(Ntr, D1K, B)
    term = term2.reshape(Ntr, D1K, B)
    d_idx = batch.final_d.astype(jnp.int32)
    b_idx = jnp.arange(B)
    logZ = (
        jnp.log(jnp.maximum(term[:, d_idx, b_idx], 1e-30))
        + lsf[:, d_idx, b_idx]
    )  # [Ntr, B]

    rev3 = pl.BlockSpec((K, Wp, B), lambda t, i: (G - 1 - i, 0, 0),
                        memory_space=pltpu.VMEM)
    rev2 = pl.BlockSpec((K, 1, B), lambda t, i: (G - 1 - i, 0, 0),
                        memory_space=pltpu.VMEM)
    tckrev = pl.BlockSpec(
        (1, 2 * _NSTATE, Wp, B),
        lambda t, i: (t * G + jnp.maximum(G - 2 - i, 0), 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    tcsrev = pl.BlockSpec(
        (1, 4, B), lambda t, i: (t * G + jnp.maximum(G - 2 - i, 0), 0, 0),
        memory_space=pltpu.VMEM,
    )
    tz = pl.BlockSpec((1, 1, B), lambda t, i: (t, 0, 0),
                      memory_space=pltpu.VMEM)
    tlast = pl.BlockSpec((1, 32, B), lambda t, i: (t, 0, 0),
                         memory_space=pltpu.VMEM)

    tcp, egp, mcp = pl.pallas_call(
        functools.partial(_bwd_counts_ckpt_impl, 1),
        grid=(Ntr, G),
        in_specs=[
            tckrev, tcsrev,
            rev3, rev3, rev3,
            rev2,
            lane_const, lane_const,
            tab, tab, tab, tz,
        ],
        out_specs=[tlast, tlast, tlast],
        out_shape=[
            jax.ShapeDtypeStruct((Ntr, 32, B), jnp.float32),
            jax.ShapeDtypeStruct((Ntr, 32, B), jnp.float32),
            jax.ShapeDtypeStruct((Ntr, 32, B), jnp.float32),
        ],
        scratch_shapes=(
            [pltpu.VMEM((Wp, B), jnp.float32) for _ in range(10)]
            + [pltpu.VMEM((1, B), jnp.float32),
               pltpu.VMEM((1, B), jnp.float32),
               pltpu.VMEM((32, B), jnp.float32),
               pltpu.VMEM((32, B), jnp.float32),
               pltpu.VMEM((32, B), jnp.float32)]
            + [pltpu.VMEM((Wp, B), jnp.float32) for _ in range(6)]
            + [pltpu.VMEM((2, B), jnp.int32),
               pltpu.VMEM((K, _NSTATE, Wp, B), jnp.float32),
               pltpu.VMEM((K, 1, B), jnp.float32)]
        ),
        interpret=_use_interpret(),
        compiler_params=_counts_compiler_params(),
    )(
        ckpt, cs,
        valid, xb, yb,
        s1,
        fink, find,
        tables.T, tables.Ematch, tables.Egap,
        logZ[:, None, :],
    )

    tc = tcp[:, :25].sum(axis=2).reshape(Ntr, 5, 5) * tables.T
    eg_rows = egp[:, :20].sum(axis=2).reshape(Ntr, 4, 5)
    emit_gap = jnp.concatenate(
        [jnp.zeros((Ntr, 1, 5)), eg_rows], axis=1
    )
    emit_match = mcp[:, :25].sum(axis=2).reshape(Ntr, 5, 5)
    return CountsResult(
        logZ=logZ, posteriors=None, trans_counts=tc, emit_gap=emit_gap,
        emit_match=emit_match,
    )


# ---------- checkpoint-recompute E-step over multi-problem lanes ----------


def _fwd_ckpt_multi_impl(
    axis,
    xb_ref, yb_ref, valid_ref, s1_ref, fink_ref, start_ref,
    T_ref, Em_ref, Eg_ref,
    ckpt_ref, cs_ref, lsf_ref, term_ref,
    f1_0, f1_1, f1_2, f1_3, f1_4, f2_0, f2_1, f2_2, f2_3, f2_4,
    ls_ref, cprev_ref, sh_ref,
):
    """Multi-problem forward identical to _fwd_all_multi_impl except the
    per-step all-state store is replaced by one end-of-block frontier
    checkpoint (see _fwd_ckpt_impl)."""
    T = _TableView.from_ref(T_ref)
    Em = _TableView.from_ref(Em_ref)
    Eg = _TableView.from_ref(Eg_ref)
    f1_refs = (f1_0, f1_1, f1_2, f1_3, f1_4)
    f2_refs = (f2_0, f2_1, f2_2, f2_3, f2_4)
    i = pl.program_id(axis)

    @pl.when(i == 0)
    def _init():
        zero = jnp.zeros_like(f1_refs[0][:, :])
        for s in range(_NSTATE):
            f1_refs[s][:, :] = zero
            f2_refs[s][:, :] = zero
        ls_ref[:, :] = jnp.zeros_like(ls_ref)
        cprev_ref[:, :] = jnp.ones_like(cprev_ref)
        sh_ref[:, :] = jnp.zeros_like(sh_ref)

    f1 = [f1_refs[s][:, :] for s in range(_NSTATE)]
    f2 = [f2_refs[s][:, :] for s in range(_NSTATE)]
    ls = ls_ref[:, :]
    cprev = cprev_ref[:, :]
    zero_arr = jnp.zeros_like(f1[0])
    sprev = sh_ref[:, :]

    for kb in range(STEP_BLOCK):
        xb = xb_ref[kb].astype(jnp.int32)
        yb = yb_ref[kb].astype(jnp.int32)
        valid = valid_ref[kb].astype(jnp.float32)
        s1 = s1_ref[kb]
        s2 = s1 + sprev
        sprev = s1

        e_match, e_gap = _emissions(Em, Eg, xb, yb)

        mix_m = _mix(T, f2, 0, zero_arr)
        if _fwd_divide_step(kb):
            mix_m = mix_m / cprev
        mix_g = [_mix(T, f1, t, zero_arr) for t in range(1, _NSTATE)]

        kidx = jax.lax.broadcasted_iota(jnp.int32, zero_arr.shape, 0)
        inj = jnp.where(
            (kidx == 0) & (start_ref[kb].astype(jnp.float32) != 0.0),
            0.2, 0.0,
        )

        new = [None] * _NSTATE
        new[0] = (e_match * _roll_shift(mix_m, s2 == 2, s2 == 0) * valid
                  + inj)
        for s in (1, 3):
            new[s] = e_gap[s] * _roll_shift(
                mix_g[s - 1], s1 == 1, False) * valid + inj
        for s in (2, 4):
            new[s] = e_gap[s] * _roll_shift(
                mix_g[s - 1], False, s1 == 0) * valid + inj

        rescale = _fwd_rescale_step(kb)
        sel = (kidx == fink_ref[kb]).astype(jnp.float32)
        term = (_sum5(new) * sel).sum(axis=0, keepdims=True)
        if rescale:
            fmax = _max5(new).max(axis=0, keepdims=True)
            c = jnp.where(fmax > 0, fmax, 1.0)
            inv_c = 1.0 / c
            term = term * inv_c
            scaled = [new[s] * inv_c for s in range(_NSTATE)]
            ls = ls + jnp.log(c)
            cprev = c
        else:
            scaled = new

        lsf_ref[kb] = ls
        term_ref[kb] = term
        f1, f2 = scaled, f1

    for s in range(_NSTATE):
        ckpt_ref[0, s] = f1[s]
        ckpt_ref[0, 5 + s] = f2[s]
        f1_refs[s][:, :] = f1[s]
        f2_refs[s][:, :] = f2[s]
    cs_ref[0, 0:1] = ls
    cs_ref[0, 1:2] = cprev
    cs_ref[0, 2:3] = sprev.astype(jnp.float32)
    cs_ref[0, 3:4] = jnp.zeros_like(ls)
    ls_ref[:, :] = ls
    cprev_ref[:, :] = cprev
    sh_ref[:, :] = sprev


def _bwd_counts_ckpt_multi_impl(
    axis,
    ckpt_ref, cs_ref, valid_ref, xb_ref, yb_ref, s1_ref,
    fink_ref, find_ref, start_ref,
    T_ref, Em_ref, Eg_ref, L_ref,
    tcp_ref, egp_ref, mcp_ref,
    b1_0, b1_1, b1_2, b1_3, b1_4, b2_0, b2_1, b2_2, b2_3, b2_4,
    bls_ref, cprev_ref, tca_ref, ega_ref, mca_ref,
    em_h1_ref, em_h2_ref, eg_h1_ref, eg_h2_ref, eg_h3_ref, eg_h4_ref,
    sh_ref, fs_ref, lsb_ref,
):
    """Multi-problem counts backward with block forward recompute (see
    _bwd_counts_ckpt_impl).  Seeds, terminal injections, per-step L
    normalisation and start-step boundaries follow
    _bwd_counts_multi_impl."""
    T = _TableView.from_ref(T_ref)
    Em = _TableView.from_ref(Em_ref)
    Eg = _TableView.from_ref(Eg_ref)
    b1_refs = (b1_0, b1_1, b1_2, b1_3, b1_4)
    b2_refs = (b2_0, b2_1, b2_2, b2_3, b2_4)
    eg_h_refs = (eg_h1_ref, eg_h2_ref, eg_h3_ref, eg_h4_ref)
    i = pl.program_id(axis)
    NP = pl.num_programs(axis)
    K = STEP_BLOCK
    is_g0 = i == NP - 1

    @pl.when(i == 0)
    def _init():
        zero = jnp.zeros_like(b1_refs[0][:, :])
        for s in range(_NSTATE):
            b1_refs[s][:, :] = zero
            b2_refs[s][:, :] = zero
        bls_ref[:, :] = jnp.zeros_like(bls_ref)
        cprev_ref[:, :] = jnp.ones_like(cprev_ref)
        tca_ref[:, :] = jnp.zeros_like(tca_ref)
        ega_ref[:, :] = jnp.zeros_like(ega_ref)
        mca_ref[:, :] = jnp.zeros_like(mca_ref)
        em_h1_ref[:, :] = zero
        em_h2_ref[:, :] = zero
        for r in eg_h_refs:
            r[:, :] = zero
        sh_ref[:, :] = jnp.zeros_like(sh_ref)

    zero_arr = jnp.zeros_like(b1_refs[0][:, :])
    blk_base = (NP - 1 - i) * K

    # ---- recompute phase: multi forward over this block from the
    # previous block's checkpoint (all-zero frontier on block 0).
    f1 = [jnp.where(is_g0, zero_arr, ckpt_ref[0, s])
          for s in range(_NSTATE)]
    f2 = [jnp.where(is_g0, zero_arr, ckpt_ref[0, 5 + s])
          for s in range(_NSTATE)]
    lsF = jnp.where(is_g0, 0.0, cs_ref[0, 0:1])
    cprevF = jnp.where(is_g0, 1.0, cs_ref[0, 1:2])
    sprev = jnp.where(is_g0, 0.0, cs_ref[0, 2:3])

    for kb in range(K):
        xb = xb_ref[kb].astype(jnp.int32)
        yb = yb_ref[kb].astype(jnp.int32)
        valid = valid_ref[kb].astype(jnp.float32)
        s1f = s1_ref[kb].astype(jnp.float32)
        s2f = s1f + sprev
        sprev = s1f

        e_match, e_gap = _emissions(Em, Eg, xb, yb)

        mix_m = _mix(T, f2, 0, zero_arr)
        if _fwd_divide_step(kb):
            mix_m = mix_m / cprevF
        mix_g = [_mix(T, f1, t, zero_arr) for t in range(1, _NSTATE)]

        kidx = jax.lax.broadcasted_iota(jnp.int32, zero_arr.shape, 0)
        inj = jnp.where(
            (kidx == 0) & (start_ref[kb].astype(jnp.float32) != 0.0),
            0.2, 0.0,
        )

        new = [None] * _NSTATE
        new[0] = (e_match * _roll_shift(mix_m, s2f == 2, s2f == 0) * valid
                  + inj)
        for s in (1, 3):
            new[s] = e_gap[s] * _roll_shift(
                mix_g[s - 1], s1f == 1, False) * valid + inj
        for s in (2, 4):
            new[s] = e_gap[s] * _roll_shift(
                mix_g[s - 1], False, s1f == 0) * valid + inj

        if _fwd_rescale_step(kb):
            fmax = _max5(new).max(axis=0, keepdims=True)
            c = jnp.where(fmax > 0, fmax, 1.0)
            inv_c = 1.0 / c
            scaled = [new[s] * inv_c for s in range(_NSTATE)]
            lsF = lsF + jnp.log(c)
            cprevF = c
        else:
            scaled = new

        for s in range(_NSTATE):
            fs_ref[kb, s] = scaled[s]
        lsb_ref[kb] = lsF
        f1, f2 = scaled, f1

    # ---- backward counts phase -----------------------------------------
    b1 = [b1_refs[s][:, :] for s in range(_NSTATE)]
    b2 = [b2_refs[s][:, :] for s in range(_NSTATE)]
    bls = bls_ref[:, :]
    cprev = cprev_ref[:, :]
    tca = tca_ref[:, :]
    ega = ega_ref[:, :]
    mca = mca_ref[:, :]
    em_h1 = em_h1_ref[:, :]
    em_h2 = em_h2_ref[:, :]
    eg_h = [None] + [r[:, :] for r in eg_h_refs]
    sh1 = sh_ref[0:1, :]
    sh2 = sh_ref[1:2, :]

    for t_step in range(K):
        kb = K - 1 - t_step
        d = blk_base + kb

        valid = valid_ref[kb].astype(jnp.float32)
        xb = xb_ref[kb].astype(jnp.int32)
        yb = yb_ref[kb].astype(jnp.int32)
        s1n = sh1
        s2n = sh2 + sh1
        f_d = [fs_ref[kb, s] for s in range(_NSTATE)]

        e_match2 = em_h2
        e_gap1 = eg_h

        q = [None] * _NSTATE
        q[0] = _roll_shift(e_match2 * b2[0], s2n == 0, s2n == 2)
        if _bwd_divide_step(kb):
            q[0] = q[0] / cprev
        for s in (1, 3):
            q[s] = _roll_shift(e_gap1[s] * b1[s], False, s1n == 1)
        for s in (2, 4):
            q[s] = _roll_shift(e_gap1[s] * b1[s], s1n == 0, False)

        e_match_d, e_gap_d = _emissions(Em, Eg, xb, yb)
        em_h2 = em_h1
        em_h1 = e_match_d
        eg_h = [None] + [
            e_gap_d[s] if not isinstance(e_gap_d[s], float)
            else jnp.full_like(zero_arr, e_gap_d[s])
            for s in range(1, _NSTATE)
        ]
        sh2 = sh1
        sh1 = s1_ref[kb]

        kidx = jax.lax.broadcasted_iota(jnp.int32, q[0].shape, 0)
        is_term = find_ref[kb] == d
        inj = jnp.where((kidx == fink_ref[kb]) & is_term, 1.0, 0.0)

        new = [None] * _NSTATE
        for s in range(_NSTATE):
            acc = None
            for u in range(_NSTATE):
                term = q[u] * T[s][u]
                acc = term if acc is None else acc + term
            new[s] = (acc + inj) * valid

        bls = jnp.where(is_term, 0.0, bls)
        if _bwd_rescale_step(kb):
            bmax = _max5(new).max(axis=0, keepdims=True)
            c = jnp.where(bmax > 0, bmax, 1.0)
            inv_c = 1.0 / c
            bls = bls + jnp.log(c)
            cprev = c
            b_out = [new[s] * inv_c for s in range(_NSTATE)]
            alpha0 = jnp.exp(lsb_ref[kb] + bls - L_ref[kb])
            alpha1 = alpha0 * inv_c
        else:
            b_out = new
            alpha0 = jnp.exp(lsb_ref[kb] + bls - L_ref[kb])
            alpha1 = alpha0

        rows = []
        for s in range(_NSTATE):
            fsv = f_d[s] * alpha1
            for u in range(_NSTATE):
                rows.append((fsv * q[u]).sum(axis=0, keepdims=True))
        rows += [jnp.zeros_like(rows[0])] * (32 - len(rows))
        tca = tca + jnp.concatenate(rows, axis=0)

        # Each problem's start step is its no-emission boundary.
        not_boundary = jnp.where(
            start_ref[kb].astype(jnp.float32) != 0.0, 0.0, 1.0
        )
        grows = []
        for s in range(1, _NSTATE):
            gamma_s = f_d[s] * b_out[s] * (alpha0 * not_boundary)
            basis = xb if s in (1, 3) else yb
            for code in range(5):
                m = jnp.where(basis == code, gamma_s, 0.0)
                grows.append(m.sum(axis=0, keepdims=True))
        grows += [jnp.zeros_like(grows[0])] * (32 - len(grows))
        ega = ega + jnp.concatenate(grows, axis=0)

        gamma_m = f_d[0] * b_out[0] * (alpha0 * not_boundary)
        mrows = []
        for a in range(5):
            pa = jnp.where(xb == a, gamma_m, 0.0)
            for ccode in range(5):
                mm = jnp.where(yb == ccode, pa, 0.0)
                mrows.append(mm.sum(axis=0, keepdims=True))
        mrows += [jnp.zeros_like(mrows[0])] * (32 - len(mrows))
        mca = mca + jnp.concatenate(mrows, axis=0)

        b2 = b1
        b1 = b_out

    for s in range(_NSTATE):
        b1_refs[s][:, :] = b1[s]
        b2_refs[s][:, :] = b2[s]
    bls_ref[:, :] = bls
    cprev_ref[:, :] = cprev
    tca_ref[:, :] = tca
    ega_ref[:, :] = ega
    mca_ref[:, :] = mca
    em_h1_ref[:, :] = em_h1
    em_h2_ref[:, :] = em_h2
    for s in range(1, _NSTATE):
        eg_h_refs[s - 1][:, :] = eg_h[s]
    sh_ref[0:1, :] = sh1
    sh_ref[1:2, :] = sh2

    @pl.when(i == NP - 1)
    def _emit():
        tcp_ref[0] = tca_ref[:, :]
        egp_ref[0] = ega_ref[:, :]
        mcp_ref[0] = mca_ref[:, :]


@jax.jit
def _counts_ckpt_multi_jit(tables: FbTables, mdev) -> CountsResult:
    D1, Wp, B = mdev.xb.shape
    K = STEP_BLOCK
    D1K = -(-D1 // K) * K
    G = D1K // K

    xb = _pad_steps(mdev.xb, D1K)
    yb = _pad_steps(mdev.yb, D1K)
    valid = _pad_steps(mdev.valid, D1K)
    s1 = _pad_steps(mdev.s1, D1K)[:, None, :]
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
    ckb = pl.BlockSpec((1, 2 * _NSTATE, Wp, B), lambda i: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    csb = pl.BlockSpec((1, 4, B), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)

    ckpt, cs, lsf2, term2 = pl.pallas_call(
        functools.partial(_fwd_ckpt_multi_impl, 0),
        grid=(G,),
        in_specs=[blk3, blk3, blk3, blk2, blk2, blk2,
                  full, full, full],
        out_specs=[ckb, csb, blk2, blk2],
        out_shape=[
            jax.ShapeDtypeStruct((G, 2 * _NSTATE, Wp, B), jnp.float32),
            jax.ShapeDtypeStruct((G, 4, B), jnp.float32),
            jax.ShapeDtypeStruct((D1K, 1, B), jnp.float32),
            jax.ShapeDtypeStruct((D1K, 1, B), jnp.float32),
        ],
        scratch_shapes=(
            [pltpu.VMEM((Wp, B), jnp.float32) for _ in range(10)]
            + [pltpu.VMEM((1, B), jnp.float32),
               pltpu.VMEM((1, B), jnp.float32),
               pltpu.VMEM((1, B), jnp.int32)]
        ),
        interpret=_use_interpret(),
        compiler_params=_counts_compiler_params(),
    )(xb, yb, valid, s1, fink, start,
      tables.T, tables.Ematch, tables.Egap)

    lsf = lsf2[:, 0, :]
    term = term2[:, 0, :]
    logterm = jnp.log(jnp.maximum(term, 1e-30)) + lsf
    sf = _pad_steps(mdev.step_final, D1K)
    L = jnp.take_along_axis(logterm, sf, axis=0)

    pf = mdev.p_final_d
    pl_ = mdev.p_lane
    p0 = mdev.p_d0
    base = jnp.where(p0 > 0, lsf[jnp.maximum(p0 - 1, 0), pl_], 0.0)
    logZ = logterm[pf, pl_] - base

    rev3 = pl.BlockSpec((K, Wp, B), lambda i: (G - 1 - i, 0, 0),
                        memory_space=pltpu.VMEM)
    rev2 = pl.BlockSpec((K, 1, B), lambda i: (G - 1 - i, 0, 0),
                        memory_space=pltpu.VMEM)
    ckrev = pl.BlockSpec(
        (1, 2 * _NSTATE, Wp, B),
        lambda i: (jnp.maximum(G - 2 - i, 0), 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    csrev = pl.BlockSpec(
        (1, 4, B), lambda i: (jnp.maximum(G - 2 - i, 0), 0, 0),
        memory_space=pltpu.VMEM,
    )
    last_blk = pl.BlockSpec((1, 32, B), lambda i: (0, 0, 0),
                            memory_space=pltpu.VMEM)

    tcp, egp, mcp = pl.pallas_call(
        functools.partial(_bwd_counts_ckpt_multi_impl, 0),
        grid=(G,),
        in_specs=[
            ckrev, csrev,
            rev3, rev3, rev3,
            rev2,
            rev2, rev2, rev2,     # fink, find, start streams
            full, full, full,
            rev2,                 # L stream
        ],
        out_specs=[last_blk, last_blk, last_blk],
        out_shape=[
            jax.ShapeDtypeStruct((1, 32, B), jnp.float32),
            jax.ShapeDtypeStruct((1, 32, B), jnp.float32),
            jax.ShapeDtypeStruct((1, 32, B), jnp.float32),
        ],
        scratch_shapes=(
            [pltpu.VMEM((Wp, B), jnp.float32) for _ in range(10)]
            + [pltpu.VMEM((1, B), jnp.float32),
               pltpu.VMEM((1, B), jnp.float32),
               pltpu.VMEM((32, B), jnp.float32),
               pltpu.VMEM((32, B), jnp.float32),
               pltpu.VMEM((32, B), jnp.float32)]
            + [pltpu.VMEM((Wp, B), jnp.float32) for _ in range(6)]
            + [pltpu.VMEM((2, B), jnp.int32),
               pltpu.VMEM((K, _NSTATE, Wp, B), jnp.float32),
               pltpu.VMEM((K, 1, B), jnp.float32)]
        ),
        interpret=_use_interpret(),
        compiler_params=_counts_compiler_params(),
    )(
        ckpt, cs,
        valid, xb, yb,
        s1,
        fink, find, start,
        tables.T, tables.Ematch, tables.Egap,
        L[:, None, :],
    )

    tc = (tcp[0, :25].sum(axis=1).reshape(5, 5)) * tables.T
    eg_rows = egp[0, :20].sum(axis=1).reshape(4, 5)
    emit_gap = jnp.concatenate([jnp.zeros((1, 5)), eg_rows], axis=0)
    emit_match = mcp[0, :25].sum(axis=1).reshape(5, 5)
    return CountsResult(
        logZ=logZ, posteriors=None, trans_counts=tc, emit_gap=emit_gap,
        emit_match=emit_match,
    )


@jax.jit
def _counts_ckpt_multi_trials_jit(tables: FbTables, mdev) -> CountsResult:
    Ntr = _check_trials_tables(tables)
    D1, Wp, B = mdev.xb.shape
    K = STEP_BLOCK
    D1K = -(-D1 // K) * K
    G = D1K // K

    xb = _pad_steps(mdev.xb, D1K)
    yb = _pad_steps(mdev.yb, D1K)
    valid = _pad_steps(mdev.valid, D1K)
    s1 = _pad_steps(mdev.s1, D1K)[:, None, :]
    start = _pad_steps(mdev.start, D1K)[:, None, :]
    fink = jnp.pad(mdev.fink, [(0, D1K - D1), (0, 0)],
                   constant_values=-1)[:, None, :]
    find = jnp.pad(mdev.find, [(0, D1K - D1), (0, 0)],
                   constant_values=-1)[:, None, :]

    blk3 = pl.BlockSpec((K, Wp, B), lambda t, i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    blk2 = pl.BlockSpec((K, 1, B), lambda t, i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    tab = pl.BlockSpec((1, 5, 5), lambda t, i: (t, 0, 0),
                       memory_space=pltpu.VMEM)
    tckb = pl.BlockSpec((1, 2 * _NSTATE, Wp, B),
                        lambda t, i: (t * G + i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    tcsb = pl.BlockSpec((1, 4, B), lambda t, i: (t * G + i, 0, 0),
                        memory_space=pltpu.VMEM)
    tblk2 = pl.BlockSpec((K, 1, B), lambda t, i: (t * G + i, 0, 0),
                         memory_space=pltpu.VMEM)

    ckpt, cs, lsf2, term2 = pl.pallas_call(
        functools.partial(_fwd_ckpt_multi_impl, 1),
        grid=(Ntr, G),
        in_specs=[blk3, blk3, blk3, blk2, blk2, blk2,
                  tab, tab, tab],
        out_specs=[tckb, tcsb, tblk2, tblk2],
        out_shape=[
            jax.ShapeDtypeStruct((Ntr * G, 2 * _NSTATE, Wp, B), jnp.float32),
            jax.ShapeDtypeStruct((Ntr * G, 4, B), jnp.float32),
            jax.ShapeDtypeStruct((Ntr * D1K, 1, B), jnp.float32),
            jax.ShapeDtypeStruct((Ntr * D1K, 1, B), jnp.float32),
        ],
        scratch_shapes=(
            [pltpu.VMEM((Wp, B), jnp.float32) for _ in range(10)]
            + [pltpu.VMEM((1, B), jnp.float32),
               pltpu.VMEM((1, B), jnp.float32),
               pltpu.VMEM((1, B), jnp.int32)]
        ),
        interpret=_use_interpret(),
        compiler_params=_counts_compiler_params(),
    )(xb, yb, valid, s1, fink, start,
      tables.T, tables.Ematch, tables.Egap)

    lsf = lsf2.reshape(Ntr, D1K, B)
    term = term2.reshape(Ntr, D1K, B)
    logterm = jnp.log(jnp.maximum(term, 1e-30)) + lsf
    sf = jnp.broadcast_to(
        _pad_steps(mdev.step_final, D1K)[None], (Ntr, D1K, B)
    )
    L = jnp.take_along_axis(logterm, sf, axis=1)

    pf = mdev.p_final_d
    pl_ = mdev.p_lane
    p0 = mdev.p_d0
    base = jnp.where(
        (p0 > 0)[None], lsf[:, jnp.maximum(p0 - 1, 0), pl_], 0.0
    )
    logZ = logterm[:, pf, pl_] - base  # [Ntr, P]

    rev3 = pl.BlockSpec((K, Wp, B), lambda t, i: (G - 1 - i, 0, 0),
                        memory_space=pltpu.VMEM)
    rev2 = pl.BlockSpec((K, 1, B), lambda t, i: (G - 1 - i, 0, 0),
                        memory_space=pltpu.VMEM)
    tckrev = pl.BlockSpec(
        (1, 2 * _NSTATE, Wp, B),
        lambda t, i: (t * G + jnp.maximum(G - 2 - i, 0), 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    tcsrev = pl.BlockSpec(
        (1, 4, B), lambda t, i: (t * G + jnp.maximum(G - 2 - i, 0), 0, 0),
        memory_space=pltpu.VMEM,
    )
    trev2 = pl.BlockSpec(
        (K, 1, B), lambda t, i: (t * G + G - 1 - i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    tlast = pl.BlockSpec((1, 32, B), lambda t, i: (t, 0, 0),
                         memory_space=pltpu.VMEM)

    tcp, egp, mcp = pl.pallas_call(
        functools.partial(_bwd_counts_ckpt_multi_impl, 1),
        grid=(Ntr, G),
        in_specs=[
            tckrev, tcsrev,
            rev3, rev3, rev3,
            rev2,
            rev2, rev2, rev2,
            tab, tab, tab,
            trev2,
        ],
        out_specs=[tlast, tlast, tlast],
        out_shape=[
            jax.ShapeDtypeStruct((Ntr, 32, B), jnp.float32),
            jax.ShapeDtypeStruct((Ntr, 32, B), jnp.float32),
            jax.ShapeDtypeStruct((Ntr, 32, B), jnp.float32),
        ],
        scratch_shapes=(
            [pltpu.VMEM((Wp, B), jnp.float32) for _ in range(10)]
            + [pltpu.VMEM((1, B), jnp.float32),
               pltpu.VMEM((1, B), jnp.float32),
               pltpu.VMEM((32, B), jnp.float32),
               pltpu.VMEM((32, B), jnp.float32),
               pltpu.VMEM((32, B), jnp.float32)]
            + [pltpu.VMEM((Wp, B), jnp.float32) for _ in range(6)]
            + [pltpu.VMEM((2, B), jnp.int32),
               pltpu.VMEM((K, _NSTATE, Wp, B), jnp.float32),
               pltpu.VMEM((K, 1, B), jnp.float32)]
        ),
        interpret=_use_interpret(),
        compiler_params=_counts_compiler_params(),
    )(
        ckpt, cs,
        valid, xb, yb,
        s1,
        fink, find, start,
        tables.T, tables.Ematch, tables.Egap,
        L.reshape(Ntr * D1K, 1, B),
    )

    tc = tcp[:, :25].sum(axis=2).reshape(Ntr, 5, 5) * tables.T
    eg_rows = egp[:, :20].sum(axis=2).reshape(Ntr, 4, 5)
    emit_gap = jnp.concatenate(
        [jnp.zeros((Ntr, 1, 5)), eg_rows], axis=1
    )
    emit_match = mcp[:, :25].sum(axis=2).reshape(Ntr, 5, 5)
    return CountsResult(
        logZ=logZ, posteriors=None, trans_counts=tc, emit_gap=emit_gap,
        emit_match=emit_match,
    )
