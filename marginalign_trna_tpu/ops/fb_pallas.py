"""Pallas TPU kernels for the banded pair-HMM forward-backward.

The pure-JAX engine in ops/fb.py expresses one anti-diagonal per lax.scan
step; on TPU each step costs microseconds of dispatch overhead.  These
kernels run the whole wavefront inside a single pallas_call:

  - the grid dimension walks blocks of K anti-diagonals (TPU grids execute
    sequentially, so VMEM scratch carries the DP frontier between blocks;
    the K inner steps are unrolled in the kernel body);
  - block specs stream the per-step band inputs from HBM and stream stored
    values back out, double-buffered by the Pallas pipeline;
  - all per-cell arithmetic is fused VPU work on [Wp, B] f32 tiles.

HBM-traffic design: the posterior path stores only the match-state forward
values (the backward recurrence itself needs no stored F; posteriors need
F_M*B_M only), plus a per-step [1, B] terminal-cell snapshot from which logZ
is gathered.

Model-specialised kernels: for serving, the 5x5 transition and emission
tables are baked in as trace-time constants, so zero transitions (most of
the 5-state model's rows) and flat indel emissions (all shipped/normalised
models) fold away entirely — the dominant per-cell op count drops ~35%.
The dynamic-table variant remains for changing models (EM) and tests.

Layout: band window Wp in sublanes (multiple of 8), reads B in lanes
(ideally a multiple of 128).  States are separate [Wp, B] buffers.  Scaled
linear-space f32 exactly like ops/fb.py; results match the CPU engine to
float tolerance (tests/test_pallas.py) and are *more* accurate than the
XLA-scan engine on TPU (whose einsums round through the MXU).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fb import DeviceBatch, FbTables

_NSTATE = 5
STEP_BLOCK = int(__import__("os").environ.get("MARGINALIGN_STEP_BLOCK", "8"))
# anti-diagonals per grid step (kernel unroll factor)

# Rescale by the band max only once every _RESCALE_PERIOD diagonals instead
# of every step: the fmax chain, divides, per-state rescale multiplies and
# the log() are ~12 of the ~45 VPU ops per cell, and f32 has the headroom —
# worst-case per-diagonal band-max decay is ~3e-3 (min live
# transition*emission in the shipped models), so 8 unrescaled steps decay at
# most ~1e-21, far above the 1e-38 f32 normal floor.  The d-1/d-2 frontier
# scale-mixing invariant then only applies on the step immediately after a
# rescale (cprev == 1.0 statically elsewhere, so those divides fold away:
# kb is a Python-unrolled constant).
_RESCALE_PERIOD = 8


def _fwd_rescale_step(kb: int) -> bool:
    return kb % _RESCALE_PERIOD == _RESCALE_PERIOD - 1 or kb == STEP_BLOCK - 1


def _fwd_divide_step(kb: int) -> bool:
    # True iff the previous diagonal (kb-1, or the prior block's last step)
    # rescaled, so the d-2 frontier is one scale factor behind.
    return kb % _RESCALE_PERIOD == 0


def _bwd_rescale_step(kb: int) -> bool:
    # The backward walks kb descending within a block.
    return kb % _RESCALE_PERIOD == 0


def _bwd_divide_step(kb: int) -> bool:
    # True iff the previously-processed diagonal (kb+1, or the prior
    # block's kb==0) rescaled.
    return (kb + 1) % _RESCALE_PERIOD == 0 or kb == STEP_BLOCK - 1


def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


def _compiler_params(min_mb: int = 0):
    """Scoped-VMEM budget (MARGINALIGN_VMEM_LIMIT_MB, default 32).  The
    16MB compiler default is exceeded at wide batches (B >= 4096 lanes)
    now that the backward kernels carry emission/shift delay lines in
    scratch; v5e has 128MB of VMEM, so 32MB scoped is still conservative.
    Larger STEP_BLOCKs need more again for their double-buffered streams;
    callers with known-larger footprints pass a floor via min_mb."""
    mb = int(__import__("os").environ.get("MARGINALIGN_VMEM_LIMIT_MB", "32"))
    return pltpu.CompilerParams(
        vmem_limit_bytes=max(mb, min_mb) * 1024 * 1024
    )


def _roll_up(a):
    """out[k] = a[k+1] (circular; pltpu.roll needs non-negative shifts)."""
    return pltpu.roll(a, a.shape[0] - 1, axis=0)


def _roll_down(a):
    return pltpu.roll(a, 1, axis=0)


# Diagnostics-only knob: "static" replaces every conditional roll+select
# with one unconditional roll, "none" removes rolls entirely.  Both produce
# WRONG numbers — they exist to measure the roll/select cost ceiling on
# hardware (see docs/KERNELS.md optimisation log).
_ROLL_MODE = __import__("os").environ.get("MARGINALIGN_ROLL_MODE", "normal")


def _roll_shift(a, t_is_1, t_is_m1):
    """out[k] = a[k+1] where t==1, a[k-1] where t==-1, else a[k].
    t_* are boolean [1, B] masks (or literal False for statically-impossible
    branches, which fold away).  Wrapped rows land in guard rows that the
    valid mask zeroes."""
    if _ROLL_MODE == "none":
        return a
    if _ROLL_MODE == "static":
        return _roll_up(a) if t_is_1 is not False else _roll_down(a)
    out = a
    if t_is_m1 is not False:
        out = jnp.where(t_is_m1, _roll_down(a), out)
    if t_is_1 is not False:
        out = jnp.where(t_is_1, _roll_up(a), out)
    return out


def static_tables(tables: FbTables):
    """Hashable (T, Ematch, Egap) nested float tuples for kernel baking."""
    t = np.asarray(tables.T, np.float32)
    em = np.asarray(tables.Ematch, np.float32)
    eg = np.asarray(tables.Egap, np.float32)
    tup = lambda a: tuple(tuple(float(v) for v in row) for row in a)
    return (tup(t), tup(em), tup(eg))


def check_uniform_pi(tables: FbTables) -> None:
    """The Pallas kernels bake the uniform start distribution (1/5) into
    their start injections and logZ extraction; tables.pi exists for the
    XLA-scan engine and the numpy oracle.  The HMM file format carries no
    start distribution and pi is never trained, so pi is uniform everywhere
    today — this guard makes a future non-uniform pi fail loudly instead of
    silently diverging between the Pallas and XLA/oracle paths.

    No-op on traced values (calls from inside jit keep working).
    Result is memoised per pi OBJECT: np.asarray of a committed device
    pi is a D2H sync on every serving call otherwise (~0.5s per realign
    invocation through the remote tunnel, e2e profile round 5)."""
    pi = tables.pi
    if isinstance(pi, jax.core.Tracer):
        return
    if _UNIFORM_PI_MEMO.get(id(pi)) is pi:
        return
    arr = np.asarray(pi, np.float32)
    if not np.allclose(arr, 1.0 / arr.shape[-1], atol=1e-6):
        raise NotImplementedError(
            "Pallas FB kernels assume a uniform start distribution "
            f"(got pi={arr.tolist()}); use the XLA engine "
            "(MARGINALIGN_KERNEL=xla) or extend the kernels to load pi."
        )
    if len(_UNIFORM_PI_MEMO) > 256:  # bound the memo
        _UNIFORM_PI_MEMO.clear()
    # The strong ref pins the object alive, so its id cannot be reused
    # while the entry exists.
    _UNIFORM_PI_MEMO[id(pi)] = pi


_UNIFORM_PI_MEMO: dict = {}


def _flat_gap_consts(st) -> Optional[Tuple[float, float, float, float]]:
    """Per-gap-state constant emission values when every gap row is flat
    (true for all shipped/normalised models), else None."""
    consts = []
    for s in range(1, _NSTATE):
        row = st[2][s]
        if len(set(row)) != 1:
            return None
        consts.append(row[0])
    return tuple(consts)


class _GapChain(NamedTuple):
    """Scaled gap-state representation constants (see _gap_chain_consts).
    Lists are indexed by gap state - 1 (states 1..4)."""

    k: Tuple[float, ...]      # stored fwd f'[t] = f[t] / k[t]
    c: Tuple[float, ...]      # fwd self coefficient: g_t = f0 + c[t] f'[t]
    mcoef: Tuple[float, ...]  # f'[t] coefficient in the fwd match mix
    r: Tuple[float, ...]      # bwd injection constant (b'[t] = b[t] r[t])
    cb: Tuple[float, ...]     # bwd self coefficient
    m0: Tuple[float, ...]     # q'[t] coefficient in the bwd match row


def _gap_chain_consts(st, gc) -> Optional[_GapChain]:
    """Constants for the scaled gap-state representation, available when
    every gap state exchanges mass only with the match state and itself
    (T[s][t] = T[t][s] = 0 for gap s != t, and M<->t transitions nonzero).
    True for every cPecan model family (three/fiveState, sym/asym:
    reference src/margin/mappers/last_hmm_*.txt transitions).

    In that regime each gap mix collapses to one fused multiply-add:
      forward   f'[t]_d = roll(f0 + c_t f'[t])_{d-1} * valid,
                with true f[t] = (gc_t T[0][t]) f'[t]
      backward  b'[t]_d = (q0 + cb_t q'[t]) * valid,
                with true b[t] = b'[t] / r_t, r_t = 1 / T[t][0]
    instead of two multiplies and an add per state per step."""
    if gc is None:
        return None
    T = st[0]
    for t in range(1, _NSTATE):
        if T[0][t] <= 0.0 or T[t][0] <= 0.0:
            return None
        for s in range(1, _NSTATE):
            if s != t and (T[s][t] != 0.0 or T[t][s] != 0.0):
                return None
    k = tuple(gc[t - 1] * T[0][t] for t in range(1, _NSTATE))
    c = tuple(gc[t - 1] * T[t][t] for t in range(1, _NSTATE))
    mcoef = tuple(T[t][0] * k[t - 1] for t in range(1, _NSTATE))
    r = tuple(1.0 / T[t][0] for t in range(1, _NSTATE))
    cb = tuple(gc[t - 1] * T[t][t] for t in range(1, _NSTATE))
    m0 = tuple(gc[t - 1] * T[0][t] * T[t][0] for t in range(1, _NSTATE))
    return _GapChain(k=k, c=c, mcoef=mcoef, r=r, cb=cb, m0=m0)


class _TableView:
    """Uniform [a][b] scalar access over either loaded VMEM arrays or baked
    float constants, with is_zero / flat-row knowledge for folding."""

    def __init__(self, rows):
        self.rows = rows  # list of lists of scalars (traced or python float)

    def __getitem__(self, a):
        return self.rows[a]

    def is_zero(self, a, b) -> bool:
        v = self.rows[a][b]
        return isinstance(v, float) and v == 0.0

    def flat_row(self, a) -> Optional[float]:
        row = self.rows[a]
        if all(isinstance(v, float) for v in row) and len(set(row)) == 1:
            return row[0]
        return None

    @staticmethod
    def from_ref(ref):
        # Accepts [5, 5] blocks or [1, 5, 5] per-trial blocks (the trials
        # grid axis streams one table per trial).
        arr = ref[0] if len(ref.shape) == 3 else ref[:, :]
        return _TableView(
            [[arr[a, b] for b in range(5)] for a in range(5)]
        )

    @staticmethod
    def from_tuple(tup):
        return _TableView([list(row) for row in tup])


def _emissions(Em: Optional[_TableView], Eg: Optional[_TableView], xb, yb):
    """e_match [Wp,B] (if Em) and e_gap[s] values/scalars (if Eg)."""
    ex = ey = None
    e_match = None
    if Em is not None:
        ex = [(xb == a).astype(jnp.float32) for a in range(5)]
        ey = [(yb == c).astype(jnp.float32) for c in range(5)]
        e_match = jnp.zeros_like(ex[0])
        for a in range(5):
            tmp = None
            for c in range(5):
                if Em.is_zero(a, c):
                    continue
                term = Em[a][c] * ey[c]
                tmp = term if tmp is None else tmp + term
            if tmp is not None:
                e_match = e_match + ex[a] * tmp
    e_gap = None
    if Eg is not None:
        e_gap = [None] * _NSTATE
        for s in range(1, _NSTATE):
            flat = Eg.flat_row(s)
            if flat is not None:
                e_gap[s] = flat  # scalar: folds into downstream multiplies
                continue
            use_x = s in (1, 3)
            if use_x and ex is None:
                ex = [(xb == a).astype(jnp.float32) for a in range(5)]
            if not use_x and ey is None:
                ey = [(yb == c).astype(jnp.float32) for c in range(5)]
            basis = ex if use_x else ey
            acc = None
            for a in range(5):
                if Eg.is_zero(s, a):
                    continue
                term = Eg[s][a] * basis[a]
                acc = term if acc is None else acc + term
            e_gap[s] = acc if acc is not None else 0.0
    return e_match, e_gap


def _mix(T: _TableView, vals, target: int, zero):
    """sum_s vals[s] * T[s][target], skipping statically-zero terms."""
    acc = None
    for s in range(_NSTATE):
        if T.is_zero(s, target):
            continue
        term = vals[s] * T[s][target]
        acc = term if acc is None else acc + term
    return acc if acc is not None else zero


def _max5(vals):
    return jnp.maximum(
        jnp.maximum(jnp.maximum(vals[0], vals[1]),
                    jnp.maximum(vals[2], vals[3])),
        vals[4],
    )


def _sum5(vals):
    return vals[0] + vals[1] + vals[2] + vals[3] + vals[4]


# ----------------------------------------------------------------- forward


def _fwd_body(
    views, xb_ref, yb_ref, valid_ref, s1_ref, s2_ref, fink_ref,
    fm_out_ref, lsf_ref, term_ref, f1_refs, f2_refs, ls_ref, cprev_ref,
):
    T, Em, Eg = views
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        # F at d=0 is pure initialisation: pi at band cell (0,0).
        zero = jnp.zeros_like(f1_refs[0][:, :])
        row0 = jax.lax.broadcasted_iota(jnp.int32, zero.shape, 0) == 0
        init = jnp.where(row0, 0.2, 0.0)
        for s in range(_NSTATE):
            f1_refs[s][:, :] = init
            f2_refs[s][:, :] = zero
        ls_ref[:, :] = jnp.zeros_like(ls_ref)
        cprev_ref[:, :] = jnp.ones_like(cprev_ref)

    f1 = [f1_refs[s][:, :] for s in range(_NSTATE)]
    f2 = [f2_refs[s][:, :] for s in range(_NSTATE)]
    ls = ls_ref[:, :]
    cprev = cprev_ref[:, :]
    zero_arr = jnp.zeros_like(f1[0])

    for kb in range(STEP_BLOCK):
        xb = xb_ref[kb].astype(jnp.int32)
        yb = yb_ref[kb].astype(jnp.int32)
        valid = valid_ref[kb].astype(jnp.float32)
        s1 = s1_ref[kb]
        s2 = s2_ref[kb]

        e_match, e_gap = _emissions(Em, Eg, xb, yb)

        mix_m = _mix(T, f2, 0, zero_arr)
        if _fwd_divide_step(kb):
            mix_m = mix_m / cprev
        mix_g = [_mix(T, f1, t, zero_arr) for t in range(1, _NSTATE)]

        new = [None] * _NSTATE
        new[0] = e_match * _roll_shift(mix_m, s2 == 2, s2 == 0) * valid
        for s in (1, 3):  # X-gap: shift t = s1 in {0, 1}
            new[s] = e_gap[s] * _roll_shift(
                mix_g[s - 1], s1 == 1, False) * valid
        for s in (2, 4):  # Y-gap: shift t = s1 - 1 in {-1, 0}
            new[s] = e_gap[s] * _roll_shift(
                mix_g[s - 1], False, s1 == 0) * valid

        rescale = _fwd_rescale_step(kb)
        kidx = jax.lax.broadcasted_iota(jnp.int32, new[0].shape, 0)
        sel = (kidx == fink_ref[kb]).astype(jnp.float32)
        term = (_sum5(new) * sel).sum(axis=0, keepdims=True)
        if rescale:
            fmax = _max5(new).max(axis=0, keepdims=True)  # [1, B]
            c = jnp.where(fmax > 0, fmax, 1.0)
            inv_c = 1.0 / c
            term = term * inv_c
            scaled = [new[s] * inv_c for s in range(_NSTATE)]
        else:
            scaled = new

        if kb == 0:
            # d = 0 on the first grid step is pure initialisation: keep the
            # init frontier and emit it instead of the computed step.
            is_first = i == 0
            f1_next = [jnp.where(is_first, f1[s], scaled[s])
                       for s in range(_NSTATE)]
            f2_next = [jnp.where(is_first, f2[s], f1[s])
                       for s in range(_NSTATE)]
            if rescale:  # only when STEP_BLOCK == 1
                ls = jnp.where(is_first, ls, ls + jnp.log(c))
                cprev = jnp.where(is_first, cprev, c)
            term = jnp.where(is_first,
                             (_sum5(f1) * sel).sum(axis=0, keepdims=True),
                             term)
        else:
            f1_next = scaled
            f2_next = f1
            if rescale:
                ls = ls + jnp.log(c)
                cprev = c

        fm_out_ref[kb] = f1_next[0]
        lsf_ref[kb] = ls
        term_ref[kb] = term
        f1, f2 = f1_next, f2_next

    for s in range(_NSTATE):
        f1_refs[s][:, :] = f1[s]
        f2_refs[s][:, :] = f2[s]
    ls_ref[:, :] = ls
    cprev_ref[:, :] = cprev


def _fwd_kernel_dynamic(
    xb_ref, yb_ref, valid_ref, s1_ref, s2_ref, fink_ref,
    T_ref, Em_ref, Eg_ref,
    fm_out_ref, lsf_ref, term_ref,
    f1_0, f1_1, f1_2, f1_3, f1_4, f2_0, f2_1, f2_2, f2_3, f2_4,
    ls_ref, cprev_ref,
):
    views = (
        _TableView.from_ref(T_ref),
        _TableView.from_ref(Em_ref),
        _TableView.from_ref(Eg_ref),
    )
    _fwd_body(
        views, xb_ref, yb_ref, valid_ref, s1_ref, s2_ref, fink_ref,
        fm_out_ref, lsf_ref, term_ref,
        (f1_0, f1_1, f1_2, f1_3, f1_4), (f2_0, f2_1, f2_2, f2_3, f2_4),
        ls_ref, cprev_ref,
    )


def _make_fwd_kernel_static(st):
    views = (
        _TableView.from_tuple(st[0]),
        _TableView.from_tuple(st[1]),
        _TableView.from_tuple(st[2]),
    )

    def kernel(
        xb_ref, yb_ref, valid_ref, s1_ref, s2_ref, fink_ref,
        fm_out_ref, lsf_ref, term_ref,
        f1_0, f1_1, f1_2, f1_3, f1_4, f2_0, f2_1, f2_2, f2_3, f2_4,
        ls_ref, cprev_ref,
    ):
        _fwd_body(
            views, xb_ref, yb_ref, valid_ref, s1_ref, s2_ref, fink_ref,
            fm_out_ref, lsf_ref, term_ref,
            (f1_0, f1_1, f1_2, f1_3, f1_4), (f2_0, f2_1, f2_2, f2_3, f2_4),
            ls_ref, cprev_ref,
        )

    return kernel


class PallasFwdResult(NamedTuple):
    F_match: jnp.ndarray  # [D1K, Wp, B] scaled match-state forward values
    lsf: jnp.ndarray      # [D1K, B]
    logZ: jnp.ndarray     # [B]


def _pad_steps(a, d1k):
    pad = d1k - a.shape[0]
    if pad <= 0:
        return a
    return jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))


def _run_forward(tables, batch, st):
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

    common = dict(
        grid=(G,),
        out_specs=[blk3, blk2, blk2],
        out_shape=[
            jax.ShapeDtypeStruct((D1K, Wp, B), jnp.float32),
            jax.ShapeDtypeStruct((D1K, 1, B), jnp.float32),
            jax.ShapeDtypeStruct((D1K, 1, B), jnp.float32),
        ],
        scratch_shapes=(
            [pltpu.VMEM((Wp, B), jnp.float32) for _ in range(10)]
            + [pltpu.VMEM((1, B), jnp.float32),
               pltpu.VMEM((1, B), jnp.float32)]
        ),
        interpret=_use_interpret(),
        **({"compiler_params": _compiler_params()}
           if _compiler_params() else {}),
    )
    if st is None:
        fm_out, lsf2, term2 = pl.pallas_call(
            _fwd_kernel_dynamic,
            in_specs=[blk3, blk3, blk3, blk2, blk2, blk2, full, full, full],
            **common,
        )(xb, yb, valid, s1, s2, fink,
          tables.T, tables.Ematch, tables.Egap)
    else:
        fm_out, lsf2, term2 = pl.pallas_call(
            _make_fwd_kernel_static(st),
            in_specs=[blk3, blk3, blk3, blk2, blk2, blk2],
            **common,
        )(xb, yb, valid, s1, s2, fink)

    lsf = lsf2[:, 0, :]
    term = term2[:, 0, :]
    d_idx = batch.final_d.astype(jnp.int32)
    b_idx = jnp.arange(B)
    logZ = (
        jnp.log(jnp.maximum(term[d_idx, b_idx], 1e-30)) + lsf[d_idx, b_idx]
    )
    return PallasFwdResult(F_match=fm_out, lsf=lsf, logZ=logZ)


@jax.jit
def forward_pallas(tables: FbTables, batch: DeviceBatch) -> PallasFwdResult:
    return _run_forward(tables, batch, None)


# ---------------------------------------------------------------- backward


def _bwd_body(
    views, fm_ref, lsf_ref, valid_ref,
    xb1_ref, yb1_ref, xb2_ref, yb2_ref, s1n_ref, s2n_ref,
    fink_ref, find_ref, logZ,
    post_ref, b1_refs, b2_refs, bls_ref, cprev_ref,
):
    T, Em, Eg = views
    i = pl.program_id(0)
    K = STEP_BLOCK

    @pl.when(i == 0)
    def _init():
        zero = jnp.zeros_like(b1_refs[0][:, :])
        for s in range(_NSTATE):
            b1_refs[s][:, :] = zero
            b2_refs[s][:, :] = zero
        bls_ref[:, :] = jnp.zeros_like(bls_ref)
        cprev_ref[:, :] = jnp.ones_like(cprev_ref)

    b1 = [b1_refs[s][:, :] for s in range(_NSTATE)]
    b2 = [b2_refs[s][:, :] for s in range(_NSTATE)]
    bls = bls_ref[:, :]
    cprev = cprev_ref[:, :]

    blk_base = (pl.num_programs(0) - 1 - i) * K
    for t in range(K):
        kb = K - 1 - t  # descending within the block
        d = blk_base + kb

        valid = valid_ref[kb].astype(jnp.float32)
        xb1 = xb1_ref[kb].astype(jnp.int32)
        yb1 = yb1_ref[kb].astype(jnp.int32)
        xb2 = xb2_ref[kb].astype(jnp.int32)
        yb2 = yb2_ref[kb].astype(jnp.int32)
        s1n = s1n_ref[kb]
        s2n = s2n_ref[kb]

        e_match2, _ = _emissions(Em, None, xb2, yb2)
        _, e_gap1 = _emissions(None, Eg, xb1, yb1)

        q = [None] * _NSTATE
        # Match target at d+2 (b2 is one scale step behind b1 only on the
        # step right after a rescale).
        q[0] = _roll_shift(e_match2 * b2[0], s2n == 0, s2n == 2)
        if _bwd_divide_step(kb):
            q[0] = q[0] / cprev
        for s in (1, 3):  # X-gap at d+1: shift t = -s1n in {-1, 0}
            q[s] = _roll_shift(e_gap1[s] * b1[s], False, s1n == 1)
        for s in (2, 4):  # Y-gap at d+1: shift t = 1 - s1n in {0, 1}
            q[s] = _roll_shift(e_gap1[s] * b1[s], s1n == 0, False)

        kidx = jax.lax.broadcasted_iota(jnp.int32, q[0].shape, 0)
        inj = jnp.where(
            (kidx == fink_ref[kb]) & (d == find_ref[kb]), 1.0, 0.0
        )

        zero_arr = jnp.zeros_like(q[0])
        new = [None] * _NSTATE
        for s in range(_NSTATE):
            acc = None
            for u in range(_NSTATE):
                if T.is_zero(s, u):
                    continue
                term = q[u] * T[s][u]
                acc = term if acc is None else acc + term
            if acc is None:
                acc = zero_arr
            new[s] = (acc + inj) * valid

        if _bwd_rescale_step(kb):
            bmax = _max5(new).max(axis=0, keepdims=True)
            c = jnp.where(bmax > 0, bmax, 1.0)
            inv_c = 1.0 / c
            bls = bls + jnp.log(c)
            cprev = c
            b_out = [new[s] * inv_c for s in range(_NSTATE)]
        else:
            b_out = new

        alpha = jnp.exp(lsf_ref[kb] + bls - logZ)
        post_ref[kb] = fm_ref[kb] * b_out[0] * alpha

        b2 = b1
        b1 = b_out

    for s in range(_NSTATE):
        b1_refs[s][:, :] = b1[s]
        b2_refs[s][:, :] = b2[s]
    bls_ref[:, :] = bls
    cprev_ref[:, :] = cprev


def _bwd_kernel_dynamic(
    fm_ref, lsf_ref, valid_ref,
    xb1_ref, yb1_ref, xb2_ref, yb2_ref, s1n_ref, s2n_ref,
    fink_ref, find_ref,
    T_ref, Em_ref, Eg_ref, logZ_ref,
    post_ref,
    b1_0, b1_1, b1_2, b1_3, b1_4, b2_0, b2_1, b2_2, b2_3, b2_4,
    bls_ref, cprev_ref,
):
    views = (
        _TableView.from_ref(T_ref),
        _TableView.from_ref(Em_ref),
        _TableView.from_ref(Eg_ref),
    )
    _bwd_body(
        views, fm_ref, lsf_ref, valid_ref,
        xb1_ref, yb1_ref, xb2_ref, yb2_ref, s1n_ref, s2n_ref,
        fink_ref, find_ref, logZ_ref[:, :],
        post_ref,
        (b1_0, b1_1, b1_2, b1_3, b1_4), (b2_0, b2_1, b2_2, b2_3, b2_4),
        bls_ref, cprev_ref,
    )


def _make_bwd_kernel_static(st):
    views = (
        _TableView.from_tuple(st[0]),
        _TableView.from_tuple(st[1]),
        _TableView.from_tuple(st[2]),
    )

    def kernel(
        fm_ref, lsf_ref, valid_ref,
        xb1_ref, yb1_ref, xb2_ref, yb2_ref, s1n_ref, s2n_ref,
        fink_ref, find_ref, logZ_ref,
        post_ref,
        b1_0, b1_1, b1_2, b1_3, b1_4, b2_0, b2_1, b2_2, b2_3, b2_4,
        bls_ref, cprev_ref,
    ):
        _bwd_body(
            views, fm_ref, lsf_ref, valid_ref,
            xb1_ref, yb1_ref, xb2_ref, yb2_ref, s1n_ref, s2n_ref,
            fink_ref, find_ref, logZ_ref[:, :],
            post_ref,
            (b1_0, b1_1, b1_2, b1_3, b1_4), (b2_0, b2_1, b2_2, b2_3, b2_4),
            bls_ref, cprev_ref,
        )

    return kernel


def _run_backward(tables, batch, fwd: PallasFwdResult, st):
    D1, Wp, B = batch.xb.shape
    K = STEP_BLOCK
    D1K = -(-D1 // K) * K
    G = D1K // K

    # Successor-diagonal views are pre-sliced from padded arrays, so every
    # block below uses the same offset-free descending block index map.
    pad2 = lambda a: jnp.pad(
        _pad_steps(a, D1K), [(0, 2)] + [(0, 0)] * (a.ndim - 1)
    )
    xb_p, yb_p = pad2(batch.xb), pad2(batch.yb)
    s1_p = pad2(batch.s1.astype(jnp.int32))[:, None, :]
    s2_p = pad2(batch.s2.astype(jnp.int32))[:, None, :]
    valid = _pad_steps(batch.valid.astype(jnp.int8), D1K)

    rev3 = pl.BlockSpec((K, Wp, B), lambda i: (G - 1 - i, 0, 0),
                        memory_space=pltpu.VMEM)
    rev2 = pl.BlockSpec((K, 1, B), lambda i: (G - 1 - i, 0, 0),
                        memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)

    fink = jnp.broadcast_to(
        batch.final_k.astype(jnp.int32)[None, None, :], (D1K, 1, B)
    )
    find = jnp.broadcast_to(
        batch.final_d.astype(jnp.int32)[None, None, :], (D1K, 1, B)
    )

    common = dict(
        grid=(G,),
        out_specs=[rev3],
        out_shape=[jax.ShapeDtypeStruct((D1K, Wp, B), jnp.float32)],
        scratch_shapes=(
            [pltpu.VMEM((Wp, B), jnp.float32) for _ in range(10)]
            + [pltpu.VMEM((1, B), jnp.float32),
               pltpu.VMEM((1, B), jnp.float32)]
        ),
        interpret=_use_interpret(),
        **({"compiler_params": _compiler_params()}
           if _compiler_params() else {}),
    )
    args = [
        fwd.F_match,
        fwd.lsf[:, None, :],
        valid,
        xb_p[1 : D1K + 1], yb_p[1 : D1K + 1],
        xb_p[2 : D1K + 2], yb_p[2 : D1K + 2],
        s1_p[1 : D1K + 1], s2_p[2 : D1K + 2],
        fink, find,
    ]
    specs = [rev3, rev2, rev3, rev3, rev3, rev3, rev3, rev2, rev2,
             rev2, rev2]
    if st is None:
        post = pl.pallas_call(
            _bwd_kernel_dynamic,
            in_specs=specs + [full, full, full, full],
            **common,
        )(*args, tables.T, tables.Ematch, tables.Egap, fwd.logZ[None, :])[0]
    else:
        post = pl.pallas_call(
            _make_bwd_kernel_static(st),
            in_specs=specs + [full],
            **common,
        )(*args, fwd.logZ[None, :])[0]
    return post[:D1]


@jax.jit
def _posteriors_pallas_jit(
    tables: FbTables, batch: DeviceBatch
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    fwd = _run_forward(tables, batch, None)
    post = _run_backward(tables, batch, fwd, None)
    return fwd.logZ, post


def posteriors_pallas(
    tables: FbTables, batch: DeviceBatch
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full FB with dynamic model tables (works for any model; used when the
    model changes between calls, e.g. inside EM)."""
    check_uniform_pi(tables)
    return _posteriors_pallas_jit(tables, batch)


@functools.partial(jax.jit, static_argnames=("st",))
def _posteriors_pallas_static(st, batch: DeviceBatch):
    gc = _flat_gap_consts(st)
    if gc is not None:
        return _posteriors_pre(st, gc, batch)
    fwd = _run_forward(None, batch, st)
    post = _run_backward(None, batch, fwd, st)
    return fwd.logZ, post


def posteriors_pallas_specialised(
    tables: FbTables, batch: DeviceBatch
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Model-specialised FB: tables baked as constants (recompiles per
    model; intended for serving where the model is fixed).  For models with
    flat gap emissions (all shipped/normalised ones) the match emissions are
    precomputed in a parallel XLA pass and gap emissions fold into the
    transition constants, cutting the sequential kernels' per-cell work."""
    check_uniform_pi(tables)
    return _posteriors_pallas_static(static_tables(tables), batch)


# --------------------- precomputed-emission specialisation (flat gaps) ----


def _precompute_ematch(st, xb, yb):
    """[D, Wp, B] f32 match emissions, one vectorised (parallel) pass."""
    em = jnp.asarray(np.asarray(st[1], np.float32))  # [5, 5]
    out = jnp.zeros(xb.shape, jnp.float32)
    xi = xb.astype(jnp.int32)
    yi = yb.astype(jnp.int32)
    for a in range(5):
        row = None
        for c in range(5):
            v = float(st[1][a][c])
            if v == 0.0:
                continue
            term = jnp.where(yi == c, v, 0.0)
            row = term if row is None else row + term
        if row is not None:
            out = out + jnp.where(xi == a, row, 0.0)
    return out


def _make_bwd_kernel_pre_first(st, gc):
    """Backward-first specialised kernel: runs before (and independent of)
    the forward, emitting the scaled match-state backward values plus its
    cumulative log-scale per step, and the origin row from which logZ is
    read (Z = sum_s pi_s * B_s(0,0)).  This removes the forward's per-step
    terminal-extraction work entirely: the forward then consumes
    (bm, bls, logZ) and emits normalised posteriors in-kernel.

    With the gap-chain transition pattern (_gap_chain_consts) gap states
    are carried as b'[t] = b[t] / T[t][0], collapsing each gap row to one
    fused multiply-add, and the terminal injection becomes a select
    overwrite (the accumulator is provably zero at terminal cells: every
    later diagonal of the lane is invalid, so all q streams are zero)."""
    T = st[0]
    ch = _gap_chain_consts(st, gc)

    def kernel(
        valid_ref, em_ref, s1_ref, fink_ref, find_ref,
        bm_out_ref, bls_out_ref, zrow_ref,
        b1_0, b1_1, b1_2, b1_3, b1_4, b2_0, b2_1, b2_2, b2_3, b2_4,
        bls_ref, cprev_ref, eh1_ref, eh2_ref, sh_ref,
    ):
        b1_refs = (b1_0, b1_1, b1_2, b1_3, b1_4)
        b2_refs = (b2_0, b2_1, b2_2, b2_3, b2_4)
        i = pl.program_id(0)
        K = STEP_BLOCK

        @pl.when(i == 0)
        def _init():
            zero = jnp.zeros_like(b1_refs[0][:, :])
            for s in range(_NSTATE):
                b1_refs[s][:, :] = zero
                b2_refs[s][:, :] = zero
            bls_ref[:, :] = jnp.zeros_like(bls_ref)
            cprev_ref[:, :] = jnp.ones_like(cprev_ref)
            eh1_ref[:, :] = zero
            eh2_ref[:, :] = zero
            sh_ref[:, :] = jnp.zeros_like(sh_ref)

        b1 = [b1_refs[s][:, :] for s in range(_NSTATE)]
        b2 = [b2_refs[s][:, :] for s in range(_NSTATE)]
        bls = bls_ref[:, :]
        cprev = cprev_ref[:, :]
        # Delay lines: walking d downward, em/s1 at d+1 and d+2 were read
        # one and two steps ago from the ALIGNED streams — no host-side
        # shifted copies.  s2 is derived (s2(d) = s1(d) + s1(d-1)).
        e1 = eh1_ref[:, :]
        e2 = eh2_ref[:, :]
        sh1 = sh_ref[0:1, :]
        sh2 = sh_ref[1:2, :]
        # fink/find are per-lane constants ([1, B] blocks, not streams).
        fink = fink_ref[:, :]
        find = find_ref[:, :]

        blk_base = (pl.num_programs(0) - 1 - i) * K
        for t in range(K):
            kb = K - 1 - t
            d = blk_base + kb

            valid = valid_ref[kb].astype(jnp.float32)
            s1n = sh1
            s2n = sh2 + sh1

            q = [None] * _NSTATE
            q[0] = _roll_shift(e2 * b2[0], s2n == 0, s2n == 2)
            if _bwd_divide_step(kb):
                q[0] = q[0] / cprev
            for s in (1, 3):
                q[s] = _roll_shift(b1[s], False, s1n == 1)
            for s in (2, 4):
                q[s] = _roll_shift(b1[s], s1n == 0, False)
            e2 = e1
            e1 = em_ref[kb]
            sh2 = sh1
            sh1 = s1_ref[kb]

            kidx = jax.lax.broadcasted_iota(jnp.int32, q[0].shape, 0)
            new = [None] * _NSTATE
            if ch is not None:
                sel_k = jnp.where(find == d, fink, -1)  # [1, B]
                mask = kidx == sel_k
                acc0 = T[0][0] * q[0]
                for s in range(1, _NSTATE):
                    acc0 = acc0 + ch.m0[s - 1] * q[s]
                new[0] = jnp.where(mask, 1.0, acc0) * valid
                for s in range(1, _NSTATE):
                    accs = q[0] + ch.cb[s - 1] * q[s]
                    new[s] = jnp.where(mask, ch.r[s - 1], accs) * valid
            else:
                inj = jnp.where(
                    (kidx == fink) & (d == find), 1.0, 0.0
                )
                zero_arr = jnp.zeros_like(q[0])
                for s in range(_NSTATE):
                    acc = None
                    for u in range(_NSTATE):
                        v = T[s][u] * (1.0 if u == 0 else gc[u - 1])
                        if v == 0.0:
                            continue
                        term = q[u] * v
                        acc = term if acc is None else acc + term
                    if acc is None:
                        acc = zero_arr
                    new[s] = (acc + inj) * valid

            if _bwd_rescale_step(kb):
                bmax = _max5(new).max(axis=0, keepdims=True)
                c = jnp.where(bmax > 0, bmax, 1.0)
                inv_c = 1.0 / c
                bls = bls + jnp.log(c)
                cprev = c
                b_out = [new[s] * inv_c for s in range(_NSTATE)]
            else:
                b_out = new

            bm_out_ref[kb] = b_out[0]
            bls_out_ref[kb] = bls

            b2 = b1
            b1 = b_out

        # Origin row: 0.2 * sum_s b(0)[s][row 0]; written every grid step,
        # the last (d = 0) write is the one that lands.  Scaled gap states
        # weight back by T[t][0] (b[t] = b'[t] * T[t][0]).
        if ch is not None:
            zr = b1[0][0:1]
            for s in range(1, _NSTATE):
                zr = zr + T[s][0] * b1[s][0:1]
            zrow_ref[0] = 0.2 * zr
        else:
            zrow_ref[0] = 0.2 * (
                b1[0][0:1] + b1[1][0:1] + b1[2][0:1] + b1[3][0:1]
                + b1[4][0:1]
            )

        for s in range(_NSTATE):
            b1_refs[s][:, :] = b1[s]
            b2_refs[s][:, :] = b2[s]
        bls_ref[:, :] = bls
        cprev_ref[:, :] = cprev
        eh1_ref[:, :] = e1
        eh2_ref[:, :] = e2
        sh_ref[0:1, :] = sh1
        sh_ref[1:2, :] = sh2

    return kernel


def _make_fwd_kernel_pre_post(st, gc):
    """Forward for the backward-first specialised path: no terminal
    extraction at all (logZ is already known from the backward); emits the
    normalised posterior band directly (post = f_M * b_M * alpha) instead
    of storing forward values.

    With the gap-chain transition pattern (_gap_chain_consts) gap states
    are carried as f'[t] = f[t] / (gc_t T[0][t]), collapsing each gap mix
    to one fused multiply-add; the match state (the only one read outside)
    stays unscaled."""
    T = st[0]
    ch = _gap_chain_consts(st, gc)

    def kernel(
        em_ref, valid_ref, s1_ref, bm_ref, bls_ref, logZ_ref,
        post_ref,
        f1_0, f1_1, f1_2, f1_3, f1_4, f2_0, f2_1, f2_2, f2_3, f2_4,
        ls_ref, cprev_ref, sh_ref,
    ):
        f1_refs = (f1_0, f1_1, f1_2, f1_3, f1_4)
        f2_refs = (f2_0, f2_1, f2_2, f2_3, f2_4)
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            zero = jnp.zeros_like(f1_refs[0][:, :])
            row0 = jax.lax.broadcasted_iota(jnp.int32, zero.shape, 0) == 0
            # Uniform start distribution baked in (check_uniform_pi at
            # entry); scaled gap states store pi / k[t].
            for s in range(_NSTATE):
                pi_s = 0.2 if (ch is None or s == 0) else 0.2 / ch.k[s - 1]
                f1_refs[s][:, :] = jnp.where(row0, pi_s, 0.0)
                f2_refs[s][:, :] = zero
            ls_ref[:, :] = jnp.zeros_like(ls_ref)
            cprev_ref[:, :] = jnp.ones_like(cprev_ref)
            sh_ref[:, :] = jnp.zeros_like(sh_ref)

        f1 = [f1_refs[s][:, :] for s in range(_NSTATE)]
        f2 = [f2_refs[s][:, :] for s in range(_NSTATE)]
        ls = ls_ref[:, :]
        cprev = cprev_ref[:, :]
        zero_arr = jnp.zeros_like(f1[0])
        logZ = logZ_ref[:, :]
        # s2 is derived: s2(d) = s1(d) + s1(d-1), with s1(d-1) carried in
        # a one-step delay (no s2 stream).
        sprev = sh_ref[:, :]

        def mix(vals, t, coeff=1.0):
            acc = None
            for s in range(_NSTATE):
                v = T[s][t] * coeff
                if v == 0.0:
                    continue
                term = vals[s] * v
                acc = term if acc is None else acc + term
            return acc

        def mix_match(vals):
            """Match mix; scaled gap states carry their k[t] factor in the
            coefficient."""
            if ch is None:
                m = mix(vals, 0)
                return m if m is not None else zero_arr
            acc = T[0][0] * vals[0]
            for s in range(1, _NSTATE):
                acc = acc + ch.mcoef[s - 1] * vals[s]
            return acc

        for kb in range(STEP_BLOCK):
            # em is premasked by valid, so the match state needs no
            # separate valid multiply.
            e_match = em_ref[kb]
            valid = valid_ref[kb].astype(jnp.float32)
            s1 = s1_ref[kb]
            s2 = s1 + sprev
            sprev = s1

            mix_m = mix_match(f2)
            if _fwd_divide_step(kb):
                mix_m = mix_m / cprev
            if ch is not None:
                mix_g = [f1[0] + ch.c[t - 1] * f1[t]
                         for t in range(1, _NSTATE)]
            else:
                mix_g = [mix(f1, t, gc[t - 1]) for t in range(1, _NSTATE)]
                mix_g = [m if m is not None else zero_arr for m in mix_g]

            new = [None] * _NSTATE
            new[0] = e_match * _roll_shift(mix_m, s2 == 2, s2 == 0)
            for s in (1, 3):
                new[s] = _roll_shift(
                    mix_g[s - 1], s1 == 1, False) * valid
            for s in (2, 4):
                new[s] = _roll_shift(
                    mix_g[s - 1], False, s1 == 0) * valid

            rescale = _fwd_rescale_step(kb)
            if rescale:
                fmax = _max5(new).max(axis=0, keepdims=True)
                c = jnp.where(fmax > 0, fmax, 1.0)
                inv_c = 1.0 / c
                scaled = [new[s] * inv_c for s in range(_NSTATE)]
            else:
                scaled = new

            if kb == 0:
                # d = 0 on the first grid step is pure initialisation.
                is_first = i == 0
                f1_next = [jnp.where(is_first, f1[s], scaled[s])
                           for s in range(_NSTATE)]
                f2_next = [jnp.where(is_first, f2[s], f1[s])
                           for s in range(_NSTATE)]
                if rescale:  # only when STEP_BLOCK == 1
                    ls = jnp.where(is_first, ls, ls + jnp.log(c))
                    cprev = jnp.where(is_first, cprev, c)
            else:
                f1_next = scaled
                f2_next = f1
                if rescale:
                    ls = ls + jnp.log(c)
                    cprev = c

            alpha = jnp.exp(ls + bls_ref[kb] - logZ)  # [1, B]
            post_ref[kb] = f1_next[0] * bm_ref[kb] * alpha
            f1, f2 = f1_next, f2_next

        for s in range(_NSTATE):
            f1_refs[s][:, :] = f1[s]
            f2_refs[s][:, :] = f2[s]
        ls_ref[:, :] = ls
        cprev_ref[:, :] = cprev
        sh_ref[:, :] = sprev

    return kernel


def _posteriors_pre(st, gc, batch: DeviceBatch):
    """Backward-first orchestration: the backward needs nothing from the
    forward and yields logZ at the origin (Z = sum_s pi_s B_s(0,0)), so the
    forward runs second, consumes (bm, bls, logZ) and emits normalised
    posteriors in-kernel — no per-step terminal extraction anywhere and no
    separate normalisation pass.  HBM stream traffic is unchanged (the
    backward stores b_M instead of the forward storing f_M)."""
    D1, Wp, B = batch.xb.shape
    K = STEP_BLOCK
    D1K = -(-D1 // K) * K
    G = D1K // K

    xb = _pad_steps(batch.xb, D1K)
    yb = _pad_steps(batch.yb, D1K)
    valid = _pad_steps(batch.valid.astype(jnp.int8), D1K)
    s1 = _pad_steps(batch.s1.astype(jnp.int32), D1K)[:, None, :]
    # Per-lane constants, passed as whole [1, B] blocks (not broadcast
    # streams): fink/find; s2 is derived in-kernel from the s1 stream.
    fink = batch.final_k.astype(jnp.int32)[None, :]
    find = batch.final_d.astype(jnp.int32)[None, :]

    # Premasked by valid: the match state then needs no in-kernel valid
    # multiply in the forward (gap states still do — their rolled mixes can
    # land real mass on cells outside the band at d).
    ematch = _precompute_ematch(st, xb, yb) * valid.astype(jnp.float32)

    blk3 = pl.BlockSpec((K, Wp, B), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    blk2 = pl.BlockSpec((K, 1, B), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    scratch = (
        [pltpu.VMEM((Wp, B), jnp.float32) for _ in range(10)]
        + [pltpu.VMEM((1, B), jnp.float32), pltpu.VMEM((1, B), jnp.float32)]
    )

    rev3 = pl.BlockSpec((K, Wp, B), lambda i: (G - 1 - i, 0, 0),
                        memory_space=pltpu.VMEM)
    rev2 = pl.BlockSpec((K, 1, B), lambda i: (G - 1 - i, 0, 0),
                        memory_space=pltpu.VMEM)

    # The backward needs e_match and s1 at d+1/d+2: it reads the ALIGNED
    # streams and keeps two-step delay lines in scratch, avoiding shifted
    # full-size copies on the host side.
    bwd_scratch = scratch + [
        pltpu.VMEM((Wp, B), jnp.float32), pltpu.VMEM((Wp, B), jnp.float32),
        pltpu.VMEM((2, B), jnp.int32),
    ]
    bm, bls2, zrow = pl.pallas_call(
        _make_bwd_kernel_pre_first(st, gc),
        grid=(G,),
        in_specs=[rev3, rev3, rev2, full, full],
        out_specs=[rev3, rev2,
                   pl.BlockSpec((1, 1, B), lambda i: (0, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((D1K, Wp, B), jnp.float32),
            jax.ShapeDtypeStruct((D1K, 1, B), jnp.float32),
            jax.ShapeDtypeStruct((1, 1, B), jnp.float32),
        ],
        scratch_shapes=bwd_scratch,
        interpret=_use_interpret(),
        **({"compiler_params": _compiler_params()}
           if _compiler_params() else {}),
    )(
        valid,
        ematch,
        s1,
        fink, find,
    )

    # Z = 0.2 * sum_s b_s(0,0), rescaled by the backward's cumulative
    # log-scale after its final (d = 0) step.
    logZ = (
        jnp.log(jnp.maximum(zrow[0, 0, :], 1e-30)) + bls2[0, 0, :]
    )

    fwd_scratch = scratch + [pltpu.VMEM((1, B), jnp.int32)]
    post = pl.pallas_call(
        _make_fwd_kernel_pre_post(st, gc),
        grid=(G,),
        in_specs=[blk3, blk3, blk2, blk3, blk2, full],
        out_specs=[blk3],
        out_shape=[jax.ShapeDtypeStruct((D1K, Wp, B), jnp.float32)],
        scratch_shapes=fwd_scratch,
        interpret=_use_interpret(),
        **({"compiler_params": _compiler_params()}
           if _compiler_params() else {}),
    )(ematch, valid, s1, bm, bls2, logZ[None, :])[0]
    return logZ, post[:D1]


# ------------------- multi-problem lanes (short-read / tRNA packing) ------


class MultiDeviceBatch(NamedTuple):
    """Device streams of a band.MultiBandedBatch plus per-problem indices."""

    xb: jnp.ndarray          # [D1, Wp, B] int8
    yb: jnp.ndarray          # [D1, Wp, B] int8
    valid: jnp.ndarray       # [D1, Wp, B] int8
    s1: jnp.ndarray          # [D1, B] int32
    s2: jnp.ndarray          # [D1, B] int32
    start: jnp.ndarray       # [D1, B] int8
    find: jnp.ndarray        # [D1, B] int32 (-1 off terminal steps)
    fink: jnp.ndarray        # [D1, B] int32 (-1 off terminal steps)
    step_final: jnp.ndarray  # [D1, B] int32
    p_final_d: jnp.ndarray   # [P] int32
    p_lane: jnp.ndarray      # [P] int32
    p_d0: jnp.ndarray        # [P] int32


def multi_device_batch(mb) -> MultiDeviceBatch:
    """band.MultiBandedBatch -> device streams."""
    import numpy as _np

    return MultiDeviceBatch(
        xb=jnp.asarray(mb.xb),
        yb=jnp.asarray(mb.yb),
        valid=jnp.asarray(mb.valid.astype(_np.int8)),
        s1=jnp.asarray(mb.s1.astype(_np.int32)),
        s2=jnp.asarray(mb.s2.astype(_np.int32)),
        start=jnp.asarray(mb.start),
        find=jnp.asarray(mb.find),
        fink=jnp.asarray(mb.fink_steps),
        step_final=jnp.asarray(mb.step_final),
        p_final_d=jnp.asarray(mb.final_d.astype(_np.int32)),
        p_lane=jnp.asarray(
            _np.array([p.lane for p in mb.problems], _np.int32)
        ),
        p_d0=jnp.asarray(
            _np.array([p.d0 for p in mb.problems], _np.int32)
        ),
    )


def _make_fwd_kernel_pre_multi(st, gc):
    """Specialised forward with in-stream start injections: each problem's
    local d = 0 seeds the start distribution at band row 0 (spacer steps
    have zeroed the frontier, so the recurrence contributes nothing there).
    No first-step special case: the scratch frontier starts at zero.

    With the gap-chain pattern (_gap_chain_consts) gap states are carried
    scaled (one fused multiply-add per gap mix) and the start injection is
    a select overwrite (the accumulator is provably zero at seed cells).
    em is premasked by valid in the host wrapper."""
    T = st[0]
    ch = _gap_chain_consts(st, gc)

    def kernel(
        em_ref, valid_ref, s1_ref, fink_ref, start_ref,
        fm_out_ref, lsf_ref, term_ref,
        f1_0, f1_1, f1_2, f1_3, f1_4, f2_0, f2_1, f2_2, f2_3, f2_4,
        ls_ref, cprev_ref, sh_ref,
    ):
        f1_refs = (f1_0, f1_1, f1_2, f1_3, f1_4)
        f2_refs = (f2_0, f2_1, f2_2, f2_3, f2_4)
        i = pl.program_id(0)

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

        def mix(vals, t, coeff=1.0):
            acc = None
            for s in range(_NSTATE):
                v = T[s][t] * coeff
                if v == 0.0:
                    continue
                term = vals[s] * v
                acc = term if acc is None else acc + term
            return acc

        # s2 is derived: s2(d) = s1(d) + s1(d-1) (safe at problem seams:
        # wherever derived and streamed s2 could differ, the d-2 frontier
        # is all-zero, so the roll choice is irrelevant).
        sprev = sh_ref[:, :]

        for kb in range(STEP_BLOCK):
            e_match = em_ref[kb]
            valid = valid_ref[kb].astype(jnp.float32)
            s1 = s1_ref[kb]
            s2 = s1 + sprev
            sprev = s1

            kidx = jax.lax.broadcasted_iota(jnp.int32, zero_arr.shape, 0)
            new = [None] * _NSTATE
            if ch is not None:
                mix_m = T[0][0] * f2[0]
                for s in range(1, _NSTATE):
                    mix_m = mix_m + ch.mcoef[s - 1] * f2[s]
                if _fwd_divide_step(kb):
                    mix_m = mix_m / cprev
                mix_g = [f1[0] + ch.c[t - 1] * f1[t]
                         for t in range(1, _NSTATE)]

                seed = (kidx == 0) & (start_ref[kb].astype(jnp.float32) != 0.0)
                # em is premasked by valid; the seed cell is overwritten
                # (accumulators are zero there: spacers cleared the
                # frontier).  Scaled gap states seed pi / k[t].
                new[0] = jnp.where(
                    seed, 0.2,
                    e_match * _roll_shift(mix_m, s2 == 2, s2 == 0),
                )
                for s in (1, 3):
                    new[s] = jnp.where(
                        seed, 0.2 / ch.k[s - 1],
                        _roll_shift(mix_g[s - 1], s1 == 1, False) * valid,
                    )
                for s in (2, 4):
                    new[s] = jnp.where(
                        seed, 0.2 / ch.k[s - 1],
                        _roll_shift(mix_g[s - 1], False, s1 == 0) * valid,
                    )
            else:
                mix_m = mix(f2, 0)
                mix_m = mix_m if mix_m is not None else zero_arr
                if _fwd_divide_step(kb):
                    mix_m = mix_m / cprev
                mix_g = [mix(f1, t, gc[t - 1]) for t in range(1, _NSTATE)]
                mix_g = [m if m is not None else zero_arr for m in mix_g]

                inj = jnp.where(
                    (kidx == 0) & (start_ref[kb].astype(jnp.float32) != 0.0), 0.2, 0.0
                )
                new[0] = (e_match * _roll_shift(mix_m, s2 == 2, s2 == 0)
                          * valid + inj)
                for s in (1, 3):
                    new[s] = _roll_shift(
                        mix_g[s - 1], s1 == 1, False) * valid + inj
                for s in (2, 4):
                    new[s] = _roll_shift(
                        mix_g[s - 1], False, s1 == 0) * valid + inj

            rescale = _fwd_rescale_step(kb)
            sel = (kidx == fink_ref[kb]).astype(jnp.float32)
            if ch is not None:
                # Terminal likelihood weights scaled gap states back.
                wsum = new[0]
                for s in range(1, _NSTATE):
                    wsum = wsum + ch.k[s - 1] * new[s]
            else:
                wsum = _sum5(new)
            term = (wsum * sel).sum(axis=0, keepdims=True)
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

            fm_out_ref[kb] = scaled[0]
            lsf_ref[kb] = ls
            term_ref[kb] = term
            f1, f2 = scaled, f1

        for s in range(_NSTATE):
            f1_refs[s][:, :] = f1[s]
            f2_refs[s][:, :] = f2[s]
        ls_ref[:, :] = ls
        cprev_ref[:, :] = cprev
        sh_ref[:, :] = sprev

    return kernel


def _make_bwd_kernel_pre_multi(st, gc):
    """Specialised backward for multi-problem lanes: the per-step find/fink
    streams inject 1 at every problem's terminal cell, the cumulative
    backward scale resets there (so each problem's scale baseline is 0),
    and the per-step L stream carries the owning problem's
    log(term) + lsf(final_d) so posteriors normalise per problem.

    With the gap-chain pattern (_gap_chain_consts) gap states are carried
    as b'[t] = b[t] / T[t][0] (one fused multiply-add per gap row) and the
    terminal injection is a select overwrite against the fink stream (-1
    off terminal steps; accumulators are provably zero at terminal cells)."""
    T = st[0]
    ch = _gap_chain_consts(st, gc)

    def kernel(
        fm_ref, lsf_ref, valid_ref, em_ref, s1_ref,
        fink_ref, find_ref, L_ref,
        post_ref,
        b1_0, b1_1, b1_2, b1_3, b1_4, b2_0, b2_1, b2_2, b2_3, b2_4,
        bls_ref, cprev_ref, eh1_ref, eh2_ref, sh_ref,
    ):
        b1_refs = (b1_0, b1_1, b1_2, b1_3, b1_4)
        b2_refs = (b2_0, b2_1, b2_2, b2_3, b2_4)
        i = pl.program_id(0)
        K = STEP_BLOCK

        @pl.when(i == 0)
        def _init():
            zero = jnp.zeros_like(b1_refs[0][:, :])
            for s in range(_NSTATE):
                b1_refs[s][:, :] = zero
                b2_refs[s][:, :] = zero
            bls_ref[:, :] = jnp.zeros_like(bls_ref)
            cprev_ref[:, :] = jnp.ones_like(cprev_ref)
            eh1_ref[:, :] = zero
            eh2_ref[:, :] = zero
            sh_ref[:, :] = jnp.zeros_like(sh_ref)

        b1 = [b1_refs[s][:, :] for s in range(_NSTATE)]
        b2 = [b2_refs[s][:, :] for s in range(_NSTATE)]
        bls = bls_ref[:, :]
        cprev = cprev_ref[:, :]
        # em/s1 delay lines (see _make_bwd_kernel_pre_first); s2 derived.
        e1 = eh1_ref[:, :]
        e2 = eh2_ref[:, :]
        sh1 = sh_ref[0:1, :]
        sh2 = sh_ref[1:2, :]

        blk_base = (pl.num_programs(0) - 1 - i) * K
        for t in range(K):
            kb = K - 1 - t
            d = blk_base + kb

            valid = valid_ref[kb].astype(jnp.float32)
            s1n = sh1
            s2n = sh2 + sh1

            q = [None] * _NSTATE
            q[0] = _roll_shift(e2 * b2[0], s2n == 0, s2n == 2)
            if _bwd_divide_step(kb):
                q[0] = q[0] / cprev
            for s in (1, 3):
                q[s] = _roll_shift(b1[s], False, s1n == 1)
            for s in (2, 4):
                q[s] = _roll_shift(b1[s], s1n == 0, False)
            e2 = e1
            e1 = em_ref[kb]
            sh2 = sh1
            sh1 = s1_ref[kb]

            kidx = jax.lax.broadcasted_iota(jnp.int32, q[0].shape, 0)
            is_term = find_ref[kb] == d  # [1, B]
            new = [None] * _NSTATE
            if ch is not None:
                # fink is -1 off terminal steps, so it gates by itself.
                mask = kidx == fink_ref[kb]
                acc0 = T[0][0] * q[0]
                for s in range(1, _NSTATE):
                    acc0 = acc0 + ch.m0[s - 1] * q[s]
                new[0] = jnp.where(mask, 1.0, acc0) * valid
                for s in range(1, _NSTATE):
                    accs = q[0] + ch.cb[s - 1] * q[s]
                    new[s] = jnp.where(mask, ch.r[s - 1], accs) * valid
            else:
                inj = jnp.where((kidx == fink_ref[kb]) & is_term, 1.0, 0.0)
                zero_arr = jnp.zeros_like(q[0])
                for s in range(_NSTATE):
                    acc = None
                    for u in range(_NSTATE):
                        v = T[s][u] * (1.0 if u == 0 else gc[u - 1])
                        if v == 0.0:
                            continue
                        term = q[u] * v
                        acc = term if acc is None else acc + term
                    if acc is None:
                        acc = zero_arr
                    new[s] = (acc + inj) * valid

            # Per-problem scale baseline: reset at terminal steps.
            bls = jnp.where(is_term, 0.0, bls)
            if _bwd_rescale_step(kb):
                bmax = _max5(new).max(axis=0, keepdims=True)
                c = jnp.where(bmax > 0, bmax, 1.0)
                inv_c = 1.0 / c
                bls = bls + jnp.log(c)
                cprev = c
                b_out = [new[s] * inv_c for s in range(_NSTATE)]
            else:
                b_out = new

            alpha = jnp.exp(lsf_ref[kb] + bls - L_ref[kb])
            post_ref[kb] = fm_ref[kb] * b_out[0] * alpha

            b2 = b1
            b1 = b_out

        for s in range(_NSTATE):
            b1_refs[s][:, :] = b1[s]
            b2_refs[s][:, :] = b2[s]
        bls_ref[:, :] = bls
        cprev_ref[:, :] = cprev
        eh1_ref[:, :] = e1
        eh2_ref[:, :] = e2
        sh_ref[0:1, :] = sh1
        sh_ref[1:2, :] = sh2

    return kernel


def _posteriors_pre_multi(st, gc, mdev: MultiDeviceBatch):
    D1, Wp, B = mdev.xb.shape
    K = STEP_BLOCK
    D1K = -(-D1 // K) * K
    G = D1K // K

    valid = _pad_steps(mdev.valid, D1K)
    s1 = _pad_steps(mdev.s1, D1K)[:, None, :]
    start = _pad_steps(mdev.start, D1K)[:, None, :]
    fink = jnp.pad(mdev.fink, [(0, D1K - D1), (0, 0)],
                   constant_values=-1)[:, None, :]
    find = jnp.pad(mdev.find, [(0, D1K - D1), (0, 0)],
                   constant_values=-1)[:, None, :]

    xb = _pad_steps(mdev.xb, D1K)
    yb = _pad_steps(mdev.yb, D1K)
    # Premasked by valid: the match state then needs no in-kernel valid
    # multiply (the gap-chain fast path relies on this).
    ematch = _precompute_ematch(st, xb, yb) * valid.astype(jnp.float32)

    blk3 = pl.BlockSpec((K, Wp, B), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    blk2 = pl.BlockSpec((K, 1, B), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    scratch = (
        [pltpu.VMEM((Wp, B), jnp.float32) for _ in range(10)]
        + [pltpu.VMEM((1, B), jnp.float32), pltpu.VMEM((1, B), jnp.float32)]
    )

    fwd_scratch = scratch + [pltpu.VMEM((1, B), jnp.int32)]
    fm_out, lsf2, term2 = pl.pallas_call(
        _make_fwd_kernel_pre_multi(st, gc),
        grid=(G,),
        in_specs=[blk3, blk3, blk2, blk2, blk2],
        out_specs=[blk3, blk2, blk2],
        out_shape=[
            jax.ShapeDtypeStruct((D1K, Wp, B), jnp.float32),
            jax.ShapeDtypeStruct((D1K, 1, B), jnp.float32),
            jax.ShapeDtypeStruct((D1K, 1, B), jnp.float32),
        ],
        scratch_shapes=fwd_scratch,
        interpret=_use_interpret(),
        **({"compiler_params": _compiler_params()}
           if _compiler_params() else {}),
    )(ematch, valid, s1, fink, start)

    lsf = lsf2[:, 0, :]   # [D1K, B]
    term = term2[:, 0, :]
    # Per-step L = log(term) + lsf at the owning problem's terminal step.
    logterm = jnp.log(jnp.maximum(term, 1e-30)) + lsf
    sf = _pad_steps(mdev.step_final, D1K)
    L = jnp.take_along_axis(logterm, sf, axis=0)  # [D1K, B]

    # Per-problem true logZ: L at the terminal step minus the forward
    # scale baseline (lsf just before the start injection).
    pf = mdev.p_final_d
    pl_ = mdev.p_lane
    p0 = mdev.p_d0
    base = jnp.where(p0 > 0, lsf[jnp.maximum(p0 - 1, 0), pl_], 0.0)
    logZ = logterm[pf, pl_] - base

    rev3 = pl.BlockSpec((K, Wp, B), lambda i: (G - 1 - i, 0, 0),
                        memory_space=pltpu.VMEM)
    rev2 = pl.BlockSpec((K, 1, B), lambda i: (G - 1 - i, 0, 0),
                        memory_space=pltpu.VMEM)

    # The backward reads the ALIGNED em/s1 streams and delays them two
    # steps in scratch instead of consuming shifted full-size copies.
    bwd_scratch = scratch + [
        pltpu.VMEM((Wp, B), jnp.float32), pltpu.VMEM((Wp, B), jnp.float32),
        pltpu.VMEM((2, B), jnp.int32),
    ]
    post = pl.pallas_call(
        _make_bwd_kernel_pre_multi(st, gc),
        grid=(G,),
        in_specs=[rev3, rev2, rev3, rev3, rev2, rev2, rev2, rev2],
        out_specs=[rev3],
        out_shape=[jax.ShapeDtypeStruct((D1K, Wp, B), jnp.float32)],
        scratch_shapes=bwd_scratch,
        interpret=_use_interpret(),
        **({"compiler_params": _compiler_params()}
           if _compiler_params() else {}),
    )(
        fm_out,
        lsf2,
        valid,
        ematch,
        s1,
        fink, find,
        L[:, None, :],
    )[0]
    return logZ, post[:D1]


# --------------- circular band layout (unconditional static rotates) ------
#
# Band rows are absolute read coordinates modulo Wp (band.circular_streams):
# row r holds i ≡ r (mod Wp), so "the value at i-1" is ALWAYS one
# roll_down / roll_up, for every lane on every step — the conditional
# roll+select band-motion mix and the s1/s2 shift streams disappear
# entirely.  Per step the forward needs 3 static rotates (match mix and the
# two read-consuming gap mixes; ref-emitting gap states move nowhere) and
# the backward 3; the mod-Wp wrap of the rotate is exactly the row map, and
# any aliased frontier row is out-of-band and therefore zero (see
# band.circular_streams for the Wp >= width+1 safety argument).


def _make_bwd_kernel_circ_first(st, gc):
    """Circular-layout twin of _make_bwd_kernel_pre_first: backward-first,
    emitting (bm, bls, origin row for logZ).  Successor references are
    unconditional: M at (d+2, i+1) and the read-consuming gaps (2, 4) at
    (d+1, i+1) are roll_up; the ref-emitting gaps (1, 3) at (d+1, i) move
    nowhere."""
    T = st[0]
    ch = _gap_chain_consts(st, gc)

    def kernel(
        valid_ref, em_ref, fink_ref, find_ref,
        bm_out_ref, bls_out_ref, zrow_ref,
        b1_0, b1_1, b1_2, b1_3, b1_4, b2_0, b2_1, b2_2, b2_3, b2_4,
        bls_ref, cprev_ref, eh1_ref, eh2_ref,
    ):
        b1_refs = (b1_0, b1_1, b1_2, b1_3, b1_4)
        b2_refs = (b2_0, b2_1, b2_2, b2_3, b2_4)
        i = pl.program_id(0)
        K = STEP_BLOCK

        @pl.when(i == 0)
        def _init():
            zero = jnp.zeros_like(b1_refs[0][:, :])
            for s in range(_NSTATE):
                b1_refs[s][:, :] = zero
                b2_refs[s][:, :] = zero
            bls_ref[:, :] = jnp.zeros_like(bls_ref)
            cprev_ref[:, :] = jnp.ones_like(cprev_ref)
            eh1_ref[:, :] = zero
            eh2_ref[:, :] = zero

        b1 = [b1_refs[s][:, :] for s in range(_NSTATE)]
        b2 = [b2_refs[s][:, :] for s in range(_NSTATE)]
        bls = bls_ref[:, :]
        cprev = cprev_ref[:, :]
        e1 = eh1_ref[:, :]
        e2 = eh2_ref[:, :]
        fink = fink_ref[:, :]
        find = find_ref[:, :]
        kidx = jax.lax.broadcasted_iota(jnp.int32, b1[0].shape, 0)

        blk_base = (pl.num_programs(0) - 1 - i) * K
        for t in range(K):
            kb = K - 1 - t
            d = blk_base + kb

            valid = valid_ref[kb].astype(jnp.float32)

            q = [None] * _NSTATE
            q[0] = _roll_up(e2 * b2[0])
            if _bwd_divide_step(kb):
                q[0] = q[0] / cprev
            q[1] = b1[1]
            q[3] = b1[3]
            q[2] = _roll_up(b1[2])
            q[4] = _roll_up(b1[4])
            e2 = e1
            e1 = em_ref[kb]

            new = [None] * _NSTATE
            if ch is not None:
                sel_k = jnp.where(find == d, fink, -1)  # [1, B]
                mask = kidx == sel_k
                acc0 = T[0][0] * q[0]
                for s in range(1, _NSTATE):
                    acc0 = acc0 + ch.m0[s - 1] * q[s]
                new[0] = jnp.where(mask, 1.0, acc0) * valid
                for s in range(1, _NSTATE):
                    accs = q[0] + ch.cb[s - 1] * q[s]
                    new[s] = jnp.where(mask, ch.r[s - 1], accs) * valid
            else:
                inj = jnp.where((kidx == fink) & (d == find), 1.0, 0.0)
                zero_arr = jnp.zeros_like(q[0])
                for s in range(_NSTATE):
                    acc = None
                    for u in range(_NSTATE):
                        v = T[s][u] * (1.0 if u == 0 else gc[u - 1])
                        if v == 0.0:
                            continue
                        term = q[u] * v
                        acc = term if acc is None else acc + term
                    if acc is None:
                        acc = zero_arr
                    new[s] = (acc + inj) * valid

            if _bwd_rescale_step(kb):
                bmax = _max5(new).max(axis=0, keepdims=True)
                c = jnp.where(bmax > 0, bmax, 1.0)
                inv_c = 1.0 / c
                bls = bls + jnp.log(c)
                cprev = c
                b_out = [new[s] * inv_c for s in range(_NSTATE)]
            else:
                b_out = new

            bm_out_ref[kb] = b_out[0]
            bls_out_ref[kb] = bls

            b2 = b1
            b1 = b_out

        # Origin cell (d = 0, i = 0) is circular row 0, same as rel layout.
        if ch is not None:
            zr = b1[0][0:1]
            for s in range(1, _NSTATE):
                zr = zr + T[s][0] * b1[s][0:1]
            zrow_ref[0] = 0.2 * zr
        else:
            zrow_ref[0] = 0.2 * (
                b1[0][0:1] + b1[1][0:1] + b1[2][0:1] + b1[3][0:1]
                + b1[4][0:1]
            )

        for s in range(_NSTATE):
            b1_refs[s][:, :] = b1[s]
            b2_refs[s][:, :] = b2[s]
        bls_ref[:, :] = bls
        cprev_ref[:, :] = cprev
        eh1_ref[:, :] = e1
        eh2_ref[:, :] = e2

    return kernel


def _make_fwd_kernel_circ_post(st, gc):
    """Circular-layout twin of _make_fwd_kernel_pre_post: consumes
    (bm, bls, logZ) and emits normalised posteriors.  The match mix (from
    d-2) and the read-consuming gap mixes (2, 4; from d-1, i-1) are one
    roll_down each; the ref-emitting gap mixes (1, 3) move nowhere."""
    T = st[0]
    ch = _gap_chain_consts(st, gc)

    def kernel(
        em_ref, valid_ref, bm_ref, bls_ref, logZ_ref,
        post_ref,
        f1_0, f1_1, f1_2, f1_3, f1_4, f2_0, f2_1, f2_2, f2_3, f2_4,
        ls_ref, cprev_ref,
    ):
        f1_refs = (f1_0, f1_1, f1_2, f1_3, f1_4)
        f2_refs = (f2_0, f2_1, f2_2, f2_3, f2_4)
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            zero = jnp.zeros_like(f1_refs[0][:, :])
            row0 = jax.lax.broadcasted_iota(jnp.int32, zero.shape, 0) == 0
            # Uniform start distribution baked in (check_uniform_pi at
            # entry); scaled gap states store pi / k[t].
            for s in range(_NSTATE):
                pi_s = 0.2 if (ch is None or s == 0) else 0.2 / ch.k[s - 1]
                f1_refs[s][:, :] = jnp.where(row0, pi_s, 0.0)
                f2_refs[s][:, :] = zero
            ls_ref[:, :] = jnp.zeros_like(ls_ref)
            cprev_ref[:, :] = jnp.ones_like(cprev_ref)

        f1 = [f1_refs[s][:, :] for s in range(_NSTATE)]
        f2 = [f2_refs[s][:, :] for s in range(_NSTATE)]
        ls = ls_ref[:, :]
        cprev = cprev_ref[:, :]
        zero_arr = jnp.zeros_like(f1[0])
        logZ = logZ_ref[:, :]

        def mix(vals, t, coeff=1.0):
            acc = None
            for s in range(_NSTATE):
                v = T[s][t] * coeff
                if v == 0.0:
                    continue
                term = vals[s] * v
                acc = term if acc is None else acc + term
            return acc

        def mix_match(vals):
            if ch is None:
                m = mix(vals, 0)
                return m if m is not None else zero_arr
            acc = T[0][0] * vals[0]
            for s in range(1, _NSTATE):
                acc = acc + ch.mcoef[s - 1] * vals[s]
            return acc

        for kb in range(STEP_BLOCK):
            # em is premasked by valid: the match state needs no separate
            # valid multiply.
            e_match = em_ref[kb]
            valid = valid_ref[kb].astype(jnp.float32)

            mix_m = mix_match(f2)
            if _fwd_divide_step(kb):
                mix_m = mix_m / cprev
            if ch is not None:
                mix_g = [f1[0] + ch.c[t - 1] * f1[t]
                         for t in range(1, _NSTATE)]
            else:
                mix_g = [mix(f1, t, gc[t - 1]) for t in range(1, _NSTATE)]
                mix_g = [m if m is not None else zero_arr for m in mix_g]

            new = [None] * _NSTATE
            new[0] = e_match * _roll_down(mix_m)
            new[1] = mix_g[0] * valid
            new[3] = mix_g[2] * valid
            new[2] = _roll_down(mix_g[1]) * valid
            new[4] = _roll_down(mix_g[3]) * valid

            rescale = _fwd_rescale_step(kb)
            if rescale:
                fmax = _max5(new).max(axis=0, keepdims=True)
                c = jnp.where(fmax > 0, fmax, 1.0)
                inv_c = 1.0 / c
                scaled = [new[s] * inv_c for s in range(_NSTATE)]
            else:
                scaled = new

            if kb == 0:
                # d = 0 on the first grid step is pure initialisation.
                is_first = i == 0
                f1_next = [jnp.where(is_first, f1[s], scaled[s])
                           for s in range(_NSTATE)]
                f2_next = [jnp.where(is_first, f2[s], f1[s])
                           for s in range(_NSTATE)]
                if rescale:  # only when STEP_BLOCK == 1
                    ls = jnp.where(is_first, ls, ls + jnp.log(c))
                    cprev = jnp.where(is_first, cprev, c)
            else:
                f1_next = scaled
                f2_next = f1
                if rescale:
                    ls = ls + jnp.log(c)
                    cprev = c

            alpha = jnp.exp(ls + bls_ref[kb] - logZ)  # [1, B]
            post_ref[kb] = f1_next[0] * bm_ref[kb] * alpha
            f1, f2 = f1_next, f2_next

        for s in range(_NSTATE):
            f1_refs[s][:, :] = f1[s]
            f2_refs[s][:, :] = f2[s]
        ls_ref[:, :] = ls
        cprev_ref[:, :] = cprev

    return kernel


def _make_bwd_kernel_circ_lean(st, gc):
    """Stream-diet twin of _make_bwd_kernel_circ_first: match emissions are
    computed IN-KERNEL from the int8 code streams instead of reading a
    precomputed f32 emission stream — per probe measurements the kernels
    have large VPU headroom while HBM bytes are the scarce resource (the
    em stream plus its XLA precompute pass cost ~11 f32-equivalent bytes
    per cell; the code streams cost 2)."""
    T = st[0]
    ch = _gap_chain_consts(st, gc)
    Em = _TableView.from_tuple(st[1])

    def kernel(
        valid_ref, xb_ref, yb_ref, fink_ref, find_ref,
        bm_out_ref, bls_out_ref, zrow_ref,
        b1_0, b1_1, b1_2, b1_3, b1_4, b2_0, b2_1, b2_2, b2_3, b2_4,
        bls_ref, cprev_ref, eh1_ref, eh2_ref,
    ):
        b1_refs = (b1_0, b1_1, b1_2, b1_3, b1_4)
        b2_refs = (b2_0, b2_1, b2_2, b2_3, b2_4)
        i = pl.program_id(0)
        K = STEP_BLOCK

        @pl.when(i == 0)
        def _init():
            zero = jnp.zeros_like(b1_refs[0][:, :])
            for s in range(_NSTATE):
                b1_refs[s][:, :] = zero
                b2_refs[s][:, :] = zero
            bls_ref[:, :] = jnp.zeros_like(bls_ref)
            cprev_ref[:, :] = jnp.ones_like(cprev_ref)
            eh1_ref[:, :] = zero
            eh2_ref[:, :] = zero

        b1 = [b1_refs[s][:, :] for s in range(_NSTATE)]
        b2 = [b2_refs[s][:, :] for s in range(_NSTATE)]
        bls = bls_ref[:, :]
        cprev = cprev_ref[:, :]
        e1 = eh1_ref[:, :]
        e2 = eh2_ref[:, :]
        fink = fink_ref[:, :]
        find = find_ref[:, :]
        kidx = jax.lax.broadcasted_iota(jnp.int32, b1[0].shape, 0)

        blk_base = (pl.num_programs(0) - 1 - i) * K
        for t in range(K):
            kb = K - 1 - t
            d = blk_base + kb

            valid = valid_ref[kb].astype(jnp.float32)

            q = [None] * _NSTATE
            q[0] = _roll_up(e2 * b2[0])
            if _bwd_divide_step(kb):
                q[0] = q[0] / cprev
            q[1] = b1[1]
            q[3] = b1[3]
            q[2] = _roll_up(b1[2])
            q[4] = _roll_up(b1[4])

            # Emission delay line, computed in-kernel and premasked (codes
            # in invalid cells are arbitrary).
            xb = xb_ref[kb].astype(jnp.int32)
            yb = yb_ref[kb].astype(jnp.int32)
            e_match_d, _ = _emissions(Em, None, xb, yb)
            e2 = e1
            e1 = e_match_d * valid

            new = [None] * _NSTATE
            if ch is not None:
                sel_k = jnp.where(find == d, fink, -1)  # [1, B]
                mask = kidx == sel_k
                acc0 = T[0][0] * q[0]
                for s in range(1, _NSTATE):
                    acc0 = acc0 + ch.m0[s - 1] * q[s]
                new[0] = jnp.where(mask, 1.0, acc0) * valid
                for s in range(1, _NSTATE):
                    accs = q[0] + ch.cb[s - 1] * q[s]
                    new[s] = jnp.where(mask, ch.r[s - 1], accs) * valid
            else:
                inj = jnp.where((kidx == fink) & (d == find), 1.0, 0.0)
                zero_arr = jnp.zeros_like(q[0])
                for s in range(_NSTATE):
                    acc = None
                    for u in range(_NSTATE):
                        v = T[s][u] * (1.0 if u == 0 else gc[u - 1])
                        if v == 0.0:
                            continue
                        term = q[u] * v
                        acc = term if acc is None else acc + term
                    if acc is None:
                        acc = zero_arr
                    new[s] = (acc + inj) * valid

            if _bwd_rescale_step(kb):
                bmax = _max5(new).max(axis=0, keepdims=True)
                c = jnp.where(bmax > 0, bmax, 1.0)
                inv_c = 1.0 / c
                bls = bls + jnp.log(c)
                cprev = c
                b_out = [new[s] * inv_c for s in range(_NSTATE)]
            else:
                b_out = new

            bm_out_ref[kb] = b_out[0]
            bls_out_ref[kb] = bls

            b2 = b1
            b1 = b_out

        if ch is not None:
            zr = b1[0][0:1]
            for s in range(1, _NSTATE):
                zr = zr + T[s][0] * b1[s][0:1]
            zrow_ref[0] = 0.2 * zr
        else:
            zrow_ref[0] = 0.2 * (
                b1[0][0:1] + b1[1][0:1] + b1[2][0:1] + b1[3][0:1]
                + b1[4][0:1]
            )

        for s in range(_NSTATE):
            b1_refs[s][:, :] = b1[s]
            b2_refs[s][:, :] = b2[s]
        bls_ref[:, :] = bls
        cprev_ref[:, :] = cprev
        eh1_ref[:, :] = e1
        eh2_ref[:, :] = e2

    return kernel


def _make_fwd_kernel_circ_post_lean(st, gc):
    """Stream-diet twin of _make_fwd_kernel_circ_post: emissions in-kernel
    from the int8 code streams (see _make_bwd_kernel_circ_lean)."""
    T = st[0]
    ch = _gap_chain_consts(st, gc)
    Em = _TableView.from_tuple(st[1])

    def kernel(
        xb_ref, yb_ref, valid_ref, bm_ref, bls_ref, logZ_ref,
        post_ref,
        f1_0, f1_1, f1_2, f1_3, f1_4, f2_0, f2_1, f2_2, f2_3, f2_4,
        ls_ref, cprev_ref,
    ):
        f1_refs = (f1_0, f1_1, f1_2, f1_3, f1_4)
        f2_refs = (f2_0, f2_1, f2_2, f2_3, f2_4)
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            zero = jnp.zeros_like(f1_refs[0][:, :])
            row0 = jax.lax.broadcasted_iota(jnp.int32, zero.shape, 0) == 0
            for s in range(_NSTATE):
                pi_s = 0.2 if (ch is None or s == 0) else 0.2 / ch.k[s - 1]
                f1_refs[s][:, :] = jnp.where(row0, pi_s, 0.0)
                f2_refs[s][:, :] = zero
            ls_ref[:, :] = jnp.zeros_like(ls_ref)
            cprev_ref[:, :] = jnp.ones_like(cprev_ref)

        f1 = [f1_refs[s][:, :] for s in range(_NSTATE)]
        f2 = [f2_refs[s][:, :] for s in range(_NSTATE)]
        ls = ls_ref[:, :]
        cprev = cprev_ref[:, :]
        zero_arr = jnp.zeros_like(f1[0])
        logZ = logZ_ref[:, :]

        def mix(vals, t, coeff=1.0):
            acc = None
            for s in range(_NSTATE):
                v = T[s][t] * coeff
                if v == 0.0:
                    continue
                term = vals[s] * v
                acc = term if acc is None else acc + term
            return acc

        def mix_match(vals):
            if ch is None:
                m = mix(vals, 0)
                return m if m is not None else zero_arr
            acc = T[0][0] * vals[0]
            for s in range(1, _NSTATE):
                acc = acc + ch.mcoef[s - 1] * vals[s]
            return acc

        for kb in range(STEP_BLOCK):
            valid = valid_ref[kb].astype(jnp.float32)
            xb = xb_ref[kb].astype(jnp.int32)
            yb = yb_ref[kb].astype(jnp.int32)
            em_raw, _ = _emissions(Em, None, xb, yb)
            e_match = em_raw * valid

            mix_m = mix_match(f2)
            if _fwd_divide_step(kb):
                mix_m = mix_m / cprev
            if ch is not None:
                mix_g = [f1[0] + ch.c[t - 1] * f1[t]
                         for t in range(1, _NSTATE)]
            else:
                mix_g = [mix(f1, t, gc[t - 1]) for t in range(1, _NSTATE)]
                mix_g = [m if m is not None else zero_arr for m in mix_g]

            new = [None] * _NSTATE
            new[0] = e_match * _roll_down(mix_m)
            new[1] = mix_g[0] * valid
            new[3] = mix_g[2] * valid
            new[2] = _roll_down(mix_g[1]) * valid
            new[4] = _roll_down(mix_g[3]) * valid

            rescale = _fwd_rescale_step(kb)
            if rescale:
                fmax = _max5(new).max(axis=0, keepdims=True)
                c = jnp.where(fmax > 0, fmax, 1.0)
                inv_c = 1.0 / c
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
            else:
                f1_next = scaled
                f2_next = f1
                if rescale:
                    ls = ls + jnp.log(c)
                    cprev = c

            alpha = jnp.exp(ls + bls_ref[kb] - logZ)  # [1, B]
            post_ref[kb] = f1_next[0] * bm_ref[kb] * alpha
            f1, f2 = f1_next, f2_next

        for s in range(_NSTATE):
            f1_refs[s][:, :] = f1[s]
            f2_refs[s][:, :] = f2[s]
        ls_ref[:, :] = ls
        cprev_ref[:, :] = cprev

    return kernel


def _posteriors_circ_lean(st, gc, cdev):
    """Backward-first FB over circular streams with in-kernel emissions:
    no f32 emission stream and no precompute pass — the int8 code streams
    feed both kernels directly."""
    D1, Wp, B = cdev.xb.shape
    K = STEP_BLOCK
    D1K = -(-D1 // K) * K
    G = D1K // K

    valid = _pad_steps(cdev.valid.astype(jnp.int8), D1K)
    xb = _pad_steps(cdev.xb, D1K)
    yb = _pad_steps(cdev.yb, D1K)
    fink = cdev.fink.astype(jnp.int32)[None, :]
    find = cdev.final_d.astype(jnp.int32)[None, :]

    blk3 = pl.BlockSpec((K, Wp, B), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    blk2 = pl.BlockSpec((K, 1, B), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    rev3 = pl.BlockSpec((K, Wp, B), lambda i: (G - 1 - i, 0, 0),
                        memory_space=pltpu.VMEM)
    rev2 = pl.BlockSpec((K, 1, B), lambda i: (G - 1 - i, 0, 0),
                        memory_space=pltpu.VMEM)

    scratch = (
        [pltpu.VMEM((Wp, B), jnp.float32) for _ in range(10)]
        + [pltpu.VMEM((1, B), jnp.float32), pltpu.VMEM((1, B), jnp.float32)]
    )
    bwd_scratch = scratch + [
        pltpu.VMEM((Wp, B), jnp.float32), pltpu.VMEM((Wp, B), jnp.float32),
    ]
    bm, bls2, zrow = pl.pallas_call(
        _make_bwd_kernel_circ_lean(st, gc),
        grid=(G,),
        in_specs=[rev3, rev3, rev3, full, full],
        out_specs=[rev3, rev2,
                   pl.BlockSpec((1, 1, B), lambda i: (0, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((D1K, Wp, B), jnp.float32),
            jax.ShapeDtypeStruct((D1K, 1, B), jnp.float32),
            jax.ShapeDtypeStruct((1, 1, B), jnp.float32),
        ],
        scratch_shapes=bwd_scratch,
        interpret=_use_interpret(),
        **({"compiler_params": _compiler_params()}
           if _compiler_params() else {}),
    )(valid, xb, yb, fink, find)

    logZ = (
        jnp.log(jnp.maximum(zrow[0, 0, :], 1e-30)) + bls2[0, 0, :]
    )

    post = pl.pallas_call(
        _make_fwd_kernel_circ_post_lean(st, gc),
        grid=(G,),
        in_specs=[blk3, blk3, blk3, blk3, blk2, full],
        out_specs=[blk3],
        out_shape=[jax.ShapeDtypeStruct((D1K, Wp, B), jnp.float32)],
        scratch_shapes=scratch,
        interpret=_use_interpret(),
        **({"compiler_params": _compiler_params()}
           if _compiler_params() else {}),
    )(xb, yb, valid, bm, bls2, logZ[None, :])[0]
    return logZ, post[:D1]


def _posteriors_circ(st, gc, cdev):
    """Backward-first FB over circular-layout streams (no s1/s2 anywhere).
    Returns (logZ [B], posterior band [D1, Wp, B] in CIRCULAR layout —
    band.circ_to_rel converts for band-relative consumers)."""
    D1, Wp, B = cdev.xb.shape
    K = STEP_BLOCK
    D1K = -(-D1 // K) * K
    G = D1K // K

    valid = _pad_steps(cdev.valid.astype(jnp.int8), D1K)
    fink = cdev.fink.astype(jnp.int32)[None, :]
    find = cdev.final_d.astype(jnp.int32)[None, :]

    xb = _pad_steps(cdev.xb, D1K)
    yb = _pad_steps(cdev.yb, D1K)
    ematch = _precompute_ematch(st, xb, yb) * valid.astype(jnp.float32)

    blk3 = pl.BlockSpec((K, Wp, B), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    blk2 = pl.BlockSpec((K, 1, B), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    rev3 = pl.BlockSpec((K, Wp, B), lambda i: (G - 1 - i, 0, 0),
                        memory_space=pltpu.VMEM)
    rev2 = pl.BlockSpec((K, 1, B), lambda i: (G - 1 - i, 0, 0),
                        memory_space=pltpu.VMEM)

    scratch = (
        [pltpu.VMEM((Wp, B), jnp.float32) for _ in range(10)]
        + [pltpu.VMEM((1, B), jnp.float32), pltpu.VMEM((1, B), jnp.float32)]
    )
    bwd_scratch = scratch + [
        pltpu.VMEM((Wp, B), jnp.float32), pltpu.VMEM((Wp, B), jnp.float32),
    ]
    bm, bls2, zrow = pl.pallas_call(
        _make_bwd_kernel_circ_first(st, gc),
        grid=(G,),
        in_specs=[rev3, rev3, full, full],
        out_specs=[rev3, rev2,
                   pl.BlockSpec((1, 1, B), lambda i: (0, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((D1K, Wp, B), jnp.float32),
            jax.ShapeDtypeStruct((D1K, 1, B), jnp.float32),
            jax.ShapeDtypeStruct((1, 1, B), jnp.float32),
        ],
        scratch_shapes=bwd_scratch,
        interpret=_use_interpret(),
        **({"compiler_params": _compiler_params()}
           if _compiler_params() else {}),
    )(valid, ematch, fink, find)

    logZ = (
        jnp.log(jnp.maximum(zrow[0, 0, :], 1e-30)) + bls2[0, 0, :]
    )

    post = pl.pallas_call(
        _make_fwd_kernel_circ_post(st, gc),
        grid=(G,),
        in_specs=[blk3, blk3, blk3, blk2, full],
        out_specs=[blk3],
        out_shape=[jax.ShapeDtypeStruct((D1K, Wp, B), jnp.float32)],
        scratch_shapes=scratch,
        interpret=_use_interpret(),
        **({"compiler_params": _compiler_params()}
           if _compiler_params() else {}),
    )(ematch, valid, bm, bls2, logZ[None, :])[0]
    return logZ, post[:D1]


# --------- signed-emission serving (valid lives in the sign bit) ---------
#
# The int8 valid stream is information-free given the (premasked) emission
# stream: encode es = em * valid - (1 - valid), so invalid cells read
# exactly -1.0 and in-band cells read their emission (>= 0; a genuine zero
# emission still decodes as valid, which is correct — gap-state validity
# must not depend on the match emission).  Kernels decode with one compare
# and one max per diagonal, dropping the valid stream from both passes
# (2 of the ~29 B/cell the em-mode serving path moves system-wide).
# "emw" goes further: the backward computes emissions in-kernel from the
# int8 code streams (like "lean") and WRITES the signed stream for the
# forward — the XLA emission-precompute pass disappears entirely (another
# ~7 B/cell and one dispatch), at the price of the one-hot emission
# expansion sitting in the backward's sequential body.


def _make_bwd_kernel_circ_sv(st, gc):
    """Signed-emission twin of _make_bwd_kernel_circ_first: one es stream
    replaces (valid, em); valid = es >= 0, emission = max(es, 0)."""
    T = st[0]
    ch = _gap_chain_consts(st, gc)

    def kernel(
        es_ref, fink_ref, find_ref,
        bm_out_ref, bls_out_ref, zrow_ref,
        b1_0, b1_1, b1_2, b1_3, b1_4, b2_0, b2_1, b2_2, b2_3, b2_4,
        bls_ref, cprev_ref, eh1_ref, eh2_ref,
    ):
        b1_refs = (b1_0, b1_1, b1_2, b1_3, b1_4)
        b2_refs = (b2_0, b2_1, b2_2, b2_3, b2_4)
        i = pl.program_id(0)
        K = STEP_BLOCK

        @pl.when(i == 0)
        def _init():
            zero = jnp.zeros_like(b1_refs[0][:, :])
            for s in range(_NSTATE):
                b1_refs[s][:, :] = zero
                b2_refs[s][:, :] = zero
            bls_ref[:, :] = jnp.zeros_like(bls_ref)
            cprev_ref[:, :] = jnp.ones_like(cprev_ref)
            eh1_ref[:, :] = zero
            eh2_ref[:, :] = zero

        b1 = [b1_refs[s][:, :] for s in range(_NSTATE)]
        b2 = [b2_refs[s][:, :] for s in range(_NSTATE)]
        bls = bls_ref[:, :]
        cprev = cprev_ref[:, :]
        e1 = eh1_ref[:, :]
        e2 = eh2_ref[:, :]
        fink = fink_ref[:, :]
        find = find_ref[:, :]
        kidx = jax.lax.broadcasted_iota(jnp.int32, b1[0].shape, 0)

        blk_base = (pl.num_programs(0) - 1 - i) * K
        for t in range(K):
            kb = K - 1 - t
            d = blk_base + kb

            es = es_ref[kb]
            valid = (es >= 0.0).astype(jnp.float32)

            q = [None] * _NSTATE
            q[0] = _roll_up(e2 * b2[0])
            if _bwd_divide_step(kb):
                q[0] = q[0] / cprev
            q[1] = b1[1]
            q[3] = b1[3]
            q[2] = _roll_up(b1[2])
            q[4] = _roll_up(b1[4])
            e2 = e1
            e1 = jnp.maximum(es, 0.0)

            new = [None] * _NSTATE
            if ch is not None:
                sel_k = jnp.where(find == d, fink, -1)  # [1, B]
                mask = kidx == sel_k
                acc0 = T[0][0] * q[0]
                for s in range(1, _NSTATE):
                    acc0 = acc0 + ch.m0[s - 1] * q[s]
                new[0] = jnp.where(mask, 1.0, acc0) * valid
                for s in range(1, _NSTATE):
                    accs = q[0] + ch.cb[s - 1] * q[s]
                    new[s] = jnp.where(mask, ch.r[s - 1], accs) * valid
            else:
                inj = jnp.where((kidx == fink) & (d == find), 1.0, 0.0)
                zero_arr = jnp.zeros_like(q[0])
                for s in range(_NSTATE):
                    acc = None
                    for u in range(_NSTATE):
                        v = T[s][u] * (1.0 if u == 0 else gc[u - 1])
                        if v == 0.0:
                            continue
                        term = q[u] * v
                        acc = term if acc is None else acc + term
                    if acc is None:
                        acc = zero_arr
                    new[s] = (acc + inj) * valid

            if _bwd_rescale_step(kb):
                bmax = _max5(new).max(axis=0, keepdims=True)
                c = jnp.where(bmax > 0, bmax, 1.0)
                inv_c = 1.0 / c
                bls = bls + jnp.log(c)
                cprev = c
                b_out = [new[s] * inv_c for s in range(_NSTATE)]
            else:
                b_out = new

            bm_out_ref[kb] = b_out[0]
            bls_out_ref[kb] = bls

            b2 = b1
            b1 = b_out

        if ch is not None:
            zr = b1[0][0:1]
            for s in range(1, _NSTATE):
                zr = zr + T[s][0] * b1[s][0:1]
            zrow_ref[0] = 0.2 * zr
        else:
            zrow_ref[0] = 0.2 * (
                b1[0][0:1] + b1[1][0:1] + b1[2][0:1] + b1[3][0:1]
                + b1[4][0:1]
            )

        for s in range(_NSTATE):
            b1_refs[s][:, :] = b1[s]
            b2_refs[s][:, :] = b2[s]
        bls_ref[:, :] = bls
        cprev_ref[:, :] = cprev
        eh1_ref[:, :] = e1
        eh2_ref[:, :] = e2

    return kernel


def _make_fwd_kernel_circ_post_sv(st, gc):
    """Signed-emission twin of _make_fwd_kernel_circ_post: one es stream
    replaces (em, valid)."""
    T = st[0]
    ch = _gap_chain_consts(st, gc)

    def kernel(
        es_ref, bm_ref, bls_ref, logZ_ref,
        post_ref,
        f1_0, f1_1, f1_2, f1_3, f1_4, f2_0, f2_1, f2_2, f2_3, f2_4,
        ls_ref, cprev_ref,
    ):
        f1_refs = (f1_0, f1_1, f1_2, f1_3, f1_4)
        f2_refs = (f2_0, f2_1, f2_2, f2_3, f2_4)
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            zero = jnp.zeros_like(f1_refs[0][:, :])
            row0 = jax.lax.broadcasted_iota(jnp.int32, zero.shape, 0) == 0
            for s in range(_NSTATE):
                pi_s = 0.2 if (ch is None or s == 0) else 0.2 / ch.k[s - 1]
                f1_refs[s][:, :] = jnp.where(row0, pi_s, 0.0)
                f2_refs[s][:, :] = zero
            ls_ref[:, :] = jnp.zeros_like(ls_ref)
            cprev_ref[:, :] = jnp.ones_like(cprev_ref)

        f1 = [f1_refs[s][:, :] for s in range(_NSTATE)]
        f2 = [f2_refs[s][:, :] for s in range(_NSTATE)]
        ls = ls_ref[:, :]
        cprev = cprev_ref[:, :]
        zero_arr = jnp.zeros_like(f1[0])
        logZ = logZ_ref[:, :]

        def mix(vals, t, coeff=1.0):
            acc = None
            for s in range(_NSTATE):
                v = T[s][t] * coeff
                if v == 0.0:
                    continue
                term = vals[s] * v
                acc = term if acc is None else acc + term
            return acc

        def mix_match(vals):
            if ch is None:
                m = mix(vals, 0)
                return m if m is not None else zero_arr
            acc = T[0][0] * vals[0]
            for s in range(1, _NSTATE):
                acc = acc + ch.mcoef[s - 1] * vals[s]
            return acc

        for kb in range(STEP_BLOCK):
            es = es_ref[kb]
            e_match = jnp.maximum(es, 0.0)
            valid = (es >= 0.0).astype(jnp.float32)

            mix_m = mix_match(f2)
            if _fwd_divide_step(kb):
                mix_m = mix_m / cprev
            if ch is not None:
                mix_g = [f1[0] + ch.c[t - 1] * f1[t]
                         for t in range(1, _NSTATE)]
            else:
                mix_g = [mix(f1, t, gc[t - 1]) for t in range(1, _NSTATE)]
                mix_g = [m if m is not None else zero_arr for m in mix_g]

            new = [None] * _NSTATE
            new[0] = e_match * _roll_down(mix_m)
            new[1] = mix_g[0] * valid
            new[3] = mix_g[2] * valid
            new[2] = _roll_down(mix_g[1]) * valid
            new[4] = _roll_down(mix_g[3]) * valid

            rescale = _fwd_rescale_step(kb)
            if rescale:
                fmax = _max5(new).max(axis=0, keepdims=True)
                c = jnp.where(fmax > 0, fmax, 1.0)
                inv_c = 1.0 / c
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
            else:
                f1_next = scaled
                f2_next = f1
                if rescale:
                    ls = ls + jnp.log(c)
                    cprev = c

            alpha = jnp.exp(ls + bls_ref[kb] - logZ)  # [1, B]
            post_ref[kb] = f1_next[0] * bm_ref[kb] * alpha
            f1, f2 = f1_next, f2_next

        for s in range(_NSTATE):
            f1_refs[s][:, :] = f1[s]
            f2_refs[s][:, :] = f2[s]
        ls_ref[:, :] = ls
        cprev_ref[:, :] = cprev

    return kernel


def _make_bwd_kernel_circ_emw(st, gc):
    """_make_bwd_kernel_circ_lean plus a signed-emission output stream:
    the in-kernel emissions are written out as es = em * valid - (1 - valid)
    for the signed-stream forward, so no pass ever reads a precomputed
    emission array."""
    T = st[0]
    ch = _gap_chain_consts(st, gc)
    Em = _TableView.from_tuple(st[1])

    def kernel(
        valid_ref, xb_ref, yb_ref, fink_ref, find_ref,
        bm_out_ref, bls_out_ref, zrow_ref, es_out_ref,
        b1_0, b1_1, b1_2, b1_3, b1_4, b2_0, b2_1, b2_2, b2_3, b2_4,
        bls_ref, cprev_ref, eh1_ref, eh2_ref,
    ):
        b1_refs = (b1_0, b1_1, b1_2, b1_3, b1_4)
        b2_refs = (b2_0, b2_1, b2_2, b2_3, b2_4)
        i = pl.program_id(0)
        K = STEP_BLOCK

        @pl.when(i == 0)
        def _init():
            zero = jnp.zeros_like(b1_refs[0][:, :])
            for s in range(_NSTATE):
                b1_refs[s][:, :] = zero
                b2_refs[s][:, :] = zero
            bls_ref[:, :] = jnp.zeros_like(bls_ref)
            cprev_ref[:, :] = jnp.ones_like(cprev_ref)
            eh1_ref[:, :] = zero
            eh2_ref[:, :] = zero

        b1 = [b1_refs[s][:, :] for s in range(_NSTATE)]
        b2 = [b2_refs[s][:, :] for s in range(_NSTATE)]
        bls = bls_ref[:, :]
        cprev = cprev_ref[:, :]
        e1 = eh1_ref[:, :]
        e2 = eh2_ref[:, :]
        fink = fink_ref[:, :]
        find = find_ref[:, :]
        kidx = jax.lax.broadcasted_iota(jnp.int32, b1[0].shape, 0)

        blk_base = (pl.num_programs(0) - 1 - i) * K
        for t in range(K):
            kb = K - 1 - t
            d = blk_base + kb

            valid = valid_ref[kb].astype(jnp.float32)

            q = [None] * _NSTATE
            q[0] = _roll_up(e2 * b2[0])
            if _bwd_divide_step(kb):
                q[0] = q[0] / cprev
            q[1] = b1[1]
            q[3] = b1[3]
            q[2] = _roll_up(b1[2])
            q[4] = _roll_up(b1[4])

            xb = xb_ref[kb].astype(jnp.int32)
            yb = yb_ref[kb].astype(jnp.int32)
            e_match_d, _ = _emissions(Em, None, xb, yb)
            e2 = e1
            e1 = e_match_d * valid
            es_out_ref[kb] = e1 - (1.0 - valid)

            new = [None] * _NSTATE
            if ch is not None:
                sel_k = jnp.where(find == d, fink, -1)  # [1, B]
                mask = kidx == sel_k
                acc0 = T[0][0] * q[0]
                for s in range(1, _NSTATE):
                    acc0 = acc0 + ch.m0[s - 1] * q[s]
                new[0] = jnp.where(mask, 1.0, acc0) * valid
                for s in range(1, _NSTATE):
                    accs = q[0] + ch.cb[s - 1] * q[s]
                    new[s] = jnp.where(mask, ch.r[s - 1], accs) * valid
            else:
                inj = jnp.where((kidx == fink) & (d == find), 1.0, 0.0)
                zero_arr = jnp.zeros_like(q[0])
                for s in range(_NSTATE):
                    acc = None
                    for u in range(_NSTATE):
                        v = T[s][u] * (1.0 if u == 0 else gc[u - 1])
                        if v == 0.0:
                            continue
                        term = q[u] * v
                        acc = term if acc is None else acc + term
                    if acc is None:
                        acc = zero_arr
                    new[s] = (acc + inj) * valid

            if _bwd_rescale_step(kb):
                bmax = _max5(new).max(axis=0, keepdims=True)
                c = jnp.where(bmax > 0, bmax, 1.0)
                inv_c = 1.0 / c
                bls = bls + jnp.log(c)
                cprev = c
                b_out = [new[s] * inv_c for s in range(_NSTATE)]
            else:
                b_out = new

            bm_out_ref[kb] = b_out[0]
            bls_out_ref[kb] = bls

            b2 = b1
            b1 = b_out

        if ch is not None:
            zr = b1[0][0:1]
            for s in range(1, _NSTATE):
                zr = zr + T[s][0] * b1[s][0:1]
            zrow_ref[0] = 0.2 * zr
        else:
            zrow_ref[0] = 0.2 * (
                b1[0][0:1] + b1[1][0:1] + b1[2][0:1] + b1[3][0:1]
                + b1[4][0:1]
            )

        for s in range(_NSTATE):
            b1_refs[s][:, :] = b1[s]
            b2_refs[s][:, :] = b2[s]
        bls_ref[:, :] = bls
        cprev_ref[:, :] = cprev
        eh1_ref[:, :] = e1
        eh2_ref[:, :] = e2

    return kernel


def _sv_from_es(st, gc, es, fink, find):
    """Signed-emission posterior serving from a prepared es stream:
    (logZ, post [D1K, Wp, B] CIRC layout)."""
    D1K, Wp, B = es.shape
    G, blk3, blk2, full, rev3, rev2, tail_spec, scratch = _sv_specs(
        D1K, Wp, B
    )
    bm, bls2, logZ = _sv_backward_call(st, gc, es, fink, find)
    post = pl.pallas_call(
        _make_fwd_kernel_circ_post_sv(st, gc),
        grid=(G,),
        in_specs=[blk3, blk3, blk2, full],
        out_specs=[blk3],
        out_shape=[jax.ShapeDtypeStruct((D1K, Wp, B), jnp.float32)],
        scratch_shapes=scratch,
        interpret=_use_interpret(),
        **({"compiler_params": _compiler_params()}
           if _compiler_params() else {}),
    )(es, bm, bls2, logZ[None, :])[0]
    return logZ, post


def _posteriors_circ_sv(st, gc, cdev):
    """Signed-emission serving: like _posteriors_circ but the XLA
    precompute pass emits es = em * valid - (1 - valid) and neither Pallas
    pass reads a valid stream."""
    D1, Wp, B = cdev.xb.shape
    K = STEP_BLOCK
    D1K = -(-D1 // K) * K

    valid = _pad_steps(cdev.valid.astype(jnp.int8), D1K)
    fink = cdev.fink.astype(jnp.int32)[None, :]
    find = cdev.final_d.astype(jnp.int32)[None, :]

    xb = _pad_steps(cdev.xb, D1K)
    yb = _pad_steps(cdev.yb, D1K)
    vf = valid.astype(jnp.float32)
    es = _precompute_ematch(st, xb, yb) * vf - (1.0 - vf)
    logZ, post = _sv_from_es(st, gc, es, fink, find)
    return logZ, post[:D1]


def _posteriors_circ_emw(st, gc, cdev):
    """Emissions-written serving: the backward computes emissions in-kernel
    from the int8 code streams (lean-style) and writes the signed stream
    the forward reads — no XLA emission-precompute pass anywhere."""
    D1, Wp, B = cdev.xb.shape
    K = STEP_BLOCK
    D1K = -(-D1 // K) * K
    G = D1K // K

    valid = _pad_steps(cdev.valid.astype(jnp.int8), D1K)
    xb = _pad_steps(cdev.xb, D1K)
    yb = _pad_steps(cdev.yb, D1K)
    fink = cdev.fink.astype(jnp.int32)[None, :]
    find = cdev.final_d.astype(jnp.int32)[None, :]

    blk3 = pl.BlockSpec((K, Wp, B), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    blk2 = pl.BlockSpec((K, 1, B), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    rev3 = pl.BlockSpec((K, Wp, B), lambda i: (G - 1 - i, 0, 0),
                        memory_space=pltpu.VMEM)
    rev2 = pl.BlockSpec((K, 1, B), lambda i: (G - 1 - i, 0, 0),
                        memory_space=pltpu.VMEM)

    scratch = (
        [pltpu.VMEM((Wp, B), jnp.float32) for _ in range(10)]
        + [pltpu.VMEM((1, B), jnp.float32), pltpu.VMEM((1, B), jnp.float32)]
    )
    bwd_scratch = scratch + [
        pltpu.VMEM((Wp, B), jnp.float32), pltpu.VMEM((Wp, B), jnp.float32),
    ]
    bm, bls2, zrow, es = pl.pallas_call(
        _make_bwd_kernel_circ_emw(st, gc),
        grid=(G,),
        in_specs=[rev3, rev3, rev3, full, full],
        out_specs=[rev3, rev2,
                   pl.BlockSpec((1, 1, B), lambda i: (0, 0, 0),
                                memory_space=pltpu.VMEM),
                   rev3],
        out_shape=[
            jax.ShapeDtypeStruct((D1K, Wp, B), jnp.float32),
            jax.ShapeDtypeStruct((D1K, 1, B), jnp.float32),
            jax.ShapeDtypeStruct((1, 1, B), jnp.float32),
            jax.ShapeDtypeStruct((D1K, Wp, B), jnp.float32),
        ],
        scratch_shapes=bwd_scratch,
        interpret=_use_interpret(),
        **({"compiler_params": _compiler_params()}
           if _compiler_params() else {}),
    )(valid, xb, yb, fink, find)

    logZ = (
        jnp.log(jnp.maximum(zrow[0, 0, :], 1e-30)) + bls2[0, 0, :]
    )

    post = pl.pallas_call(
        _make_fwd_kernel_circ_post_sv(st, gc),
        grid=(G,),
        in_specs=[blk3, blk3, blk2, full],
        out_specs=[blk3],
        out_shape=[jax.ShapeDtypeStruct((D1K, Wp, B), jnp.float32)],
        scratch_shapes=scratch,
        interpret=_use_interpret(),
        **({"compiler_params": _compiler_params()}
           if _compiler_params() else {}),
    )(es, bm, bls2, logZ[None, :])[0]
    return logZ, post[:D1]


# --------- fused posterior consumers (caller expectations, MEA weights) ---
#
# The serving path used to write the posterior band to HBM and re-read it
# in the consumers (caller base expectations via the banded segment-sum,
# MEA row/col gap weights), costing ~8+ B/cell plus the consumers' own
# cumsum/gather traffic.  Both consumers are position-indexed reductions,
# and in the circular layout they fold INTO the posterior kernel:
#
# - A REFERENCE position j sits at circular row (d - j) mod Wp, which
#   advances by exactly one row per diagonal — so a [Wp, B] accumulator
#   that rolls down once per diagonal stays frame-aligned, and
#   acc[r] += post[r] accumulates every position's run with no permutes.
#   Position j completes (leaves the band window) at the first diagonal
#   with gu(d) = d - lo(d) = j + W; at most ONE position completes per
#   diagonal, at row (lo(d) + W) mod Wp (the band.circ_flush_rows
#   stream), so completed totals stream out as [K, 1, B] blocks —
#   16 bytes per diagonal-lane for all four base codes (~0.8 B/cell at
#   W=21) instead of the 4 B/cell posterior band plus consumer reads.
# - A READ position i is row-stable in the circular layout (r = i mod
#   Wp), so row sums need no rolling; position i completes when the band
#   moves past it (lo steps), at row (lo - 1) mod Wp
#   (band.circ_row_flush_rows).
#
# Positions still in the window at the last diagonal drain into [Wp, B]
# accumulator-tail outputs, written once on the final grid step.  The
# host precomputes gather indices from the flushed streams/tails into
# dense [refLen, 4] / per-position arrays (ops/expectations.py).


def _make_fwd_kernel_circ_cx(st, gc):
    """Caller-fused signed-emission forward: the posterior band is never
    written — per-reference-position expected base counts accumulate in
    four rolling VMEM accumulators (one per base code) and only the
    per-diagonal completed totals plus the final accumulator tails leave
    the kernel.  Replaces cPecanRealign --outputAllPosteriorProbs plus
    the reference's per-chunk expectation accumulation
    (src/margin/marginCallerLib.py:54-74) in one pass."""
    T = st[0]
    ch = _gap_chain_consts(st, gc)

    def kernel(
        es_ref, yb_ref, fr_ref, bm_ref, bls_ref, logZ_ref,
        fl0_ref, fl1_ref, fl2_ref, fl3_ref,
        t0_ref, t1_ref, t2_ref, t3_ref,
        f1_0, f1_1, f1_2, f1_3, f1_4, f2_0, f2_1, f2_2, f2_3, f2_4,
        ls_ref, cprev_ref, a0_ref, a1_ref, a2_ref, a3_ref,
    ):
        f1_refs = (f1_0, f1_1, f1_2, f1_3, f1_4)
        f2_refs = (f2_0, f2_1, f2_2, f2_3, f2_4)
        fl_refs = (fl0_ref, fl1_ref, fl2_ref, fl3_ref)
        tail_refs = (t0_ref, t1_ref, t2_ref, t3_ref)
        acc_refs = (a0_ref, a1_ref, a2_ref, a3_ref)
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            zero = jnp.zeros_like(f1_refs[0][:, :])
            row0 = jax.lax.broadcasted_iota(jnp.int32, zero.shape, 0) == 0
            for s in range(_NSTATE):
                pi_s = 0.2 if (ch is None or s == 0) else 0.2 / ch.k[s - 1]
                f1_refs[s][:, :] = jnp.where(row0, pi_s, 0.0)
                f2_refs[s][:, :] = zero
            ls_ref[:, :] = jnp.zeros_like(ls_ref)
            cprev_ref[:, :] = jnp.ones_like(cprev_ref)
            for c in range(4):
                acc_refs[c][:, :] = zero

        f1 = [f1_refs[s][:, :] for s in range(_NSTATE)]
        f2 = [f2_refs[s][:, :] for s in range(_NSTATE)]
        acc = [acc_refs[c][:, :] for c in range(4)]
        ls = ls_ref[:, :]
        cprev = cprev_ref[:, :]
        zero_arr = jnp.zeros_like(f1[0])
        logZ = logZ_ref[:, :]
        kidx = jax.lax.broadcasted_iota(jnp.int32, zero_arr.shape, 0)

        def mix(vals, t, coeff=1.0):
            out = None
            for s in range(_NSTATE):
                v = T[s][t] * coeff
                if v == 0.0:
                    continue
                term = vals[s] * v
                out = term if out is None else out + term
            return out

        def mix_match(vals):
            if ch is None:
                m = mix(vals, 0)
                return m if m is not None else zero_arr
            out = T[0][0] * vals[0]
            for s in range(1, _NSTATE):
                out = out + ch.mcoef[s - 1] * vals[s]
            return out

        for kb in range(STEP_BLOCK):
            es = es_ref[kb]
            e_match = jnp.maximum(es, 0.0)
            valid = (es >= 0.0).astype(jnp.float32)

            mix_m = mix_match(f2)
            if _fwd_divide_step(kb):
                mix_m = mix_m / cprev
            if ch is not None:
                mix_g = [f1[0] + ch.c[t - 1] * f1[t]
                         for t in range(1, _NSTATE)]
            else:
                mix_g = [mix(f1, t, gc[t - 1]) for t in range(1, _NSTATE)]
                mix_g = [m if m is not None else zero_arr for m in mix_g]

            new = [None] * _NSTATE
            new[0] = e_match * _roll_down(mix_m)
            new[1] = mix_g[0] * valid
            new[3] = mix_g[2] * valid
            new[2] = _roll_down(mix_g[1]) * valid
            new[4] = _roll_down(mix_g[3]) * valid

            rescale = _fwd_rescale_step(kb)
            if rescale:
                fmax = _max5(new).max(axis=0, keepdims=True)
                c = jnp.where(fmax > 0, fmax, 1.0)
                inv_c = 1.0 / c
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
            else:
                f1_next = scaled
                f2_next = f1
                if rescale:
                    ls = ls + jnp.log(c)
                    cprev = c

            alpha = jnp.exp(ls + bls_ref[kb] - logZ)  # [1, B]
            post = f1_next[0] * bm_ref[kb] * alpha
            if kb == 0:
                # The origin cell (d = 0, row 0) holds the start
                # distribution and emits nothing — exclude it.
                post = jnp.where((i == 0) & (kidx == 0), 0.0, post)

            # Advance the accumulator frame (position j moves one row
            # down per diagonal), flush the completed position's row,
            # then add this diagonal's contributions.
            fr = fr_ref[kb]  # [1, B] int32; -1 = nothing completes
            fmask = kidx == fr
            # int32: Mosaic has no int8 vector compare.
            yb = yb_ref[kb].astype(jnp.int32)
            for c in range(4):
                rolled = _roll_down(acc[c])
                fl_refs[c][kb] = jnp.sum(
                    jnp.where(fmask, rolled, 0.0), axis=0, keepdims=True
                )
                acc[c] = jnp.where(fmask, 0.0, rolled) + jnp.where(
                    yb == c, post, 0.0
                )

            f1, f2 = f1_next, f2_next

        for s in range(_NSTATE):
            f1_refs[s][:, :] = f1[s]
            f2_refs[s][:, :] = f2[s]
        ls_ref[:, :] = ls
        cprev_ref[:, :] = cprev
        for c in range(4):
            acc_refs[c][:, :] = acc[c]

        @pl.when(i == pl.num_programs(0) - 1)
        def _tails():
            for c in range(4):
                tail_refs[c][:, :] = acc_refs[c][:, :]

    return kernel


def _sv_specs(D1K, Wp, B):
    """Shared BlockSpec / scratch set for the sv-family serving passes."""
    K = STEP_BLOCK
    G = D1K // K
    blk3 = pl.BlockSpec((K, Wp, B), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    blk2 = pl.BlockSpec((K, 1, B), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    rev3 = pl.BlockSpec((K, Wp, B), lambda i: (G - 1 - i, 0, 0),
                        memory_space=pltpu.VMEM)
    rev2 = pl.BlockSpec((K, 1, B), lambda i: (G - 1 - i, 0, 0),
                        memory_space=pltpu.VMEM)
    tail_spec = pl.BlockSpec((Wp, B), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
    scratch = (
        [pltpu.VMEM((Wp, B), jnp.float32) for _ in range(10)]
        + [pltpu.VMEM((1, B), jnp.float32), pltpu.VMEM((1, B), jnp.float32)]
    )
    return G, blk3, blk2, full, rev3, rev2, tail_spec, scratch


def _sv_backward_call(st, gc, es, fink, find):
    """Signed-emission backward pass: (bm, bls2, logZ) from an es stream
    (however produced — XLA precompute or the device expansion kernel)."""
    D1K, Wp, B = es.shape
    G, blk3, blk2, full, rev3, rev2, tail_spec, scratch = _sv_specs(
        D1K, Wp, B
    )
    bwd_scratch = scratch + [
        pltpu.VMEM((Wp, B), jnp.float32), pltpu.VMEM((Wp, B), jnp.float32),
    ]
    bm, bls2, zrow = pl.pallas_call(
        _make_bwd_kernel_circ_sv(st, gc),
        grid=(G,),
        in_specs=[rev3, full, full],
        out_specs=[rev3, rev2,
                   pl.BlockSpec((1, 1, B), lambda i: (0, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[
            jax.ShapeDtypeStruct((D1K, Wp, B), jnp.float32),
            jax.ShapeDtypeStruct((D1K, 1, B), jnp.float32),
            jax.ShapeDtypeStruct((1, 1, B), jnp.float32),
        ],
        scratch_shapes=bwd_scratch,
        interpret=_use_interpret(),
        compiler_params=_compiler_params(min_mb=64),
    )(es, fink, find)
    logZ = (
        jnp.log(jnp.maximum(zrow[0, 0, :], 1e-30)) + bls2[0, 0, :]
    )
    return bm, bls2, logZ


def _cx_from_es(st, gc, es, yb, fink, find, fr):
    """Caller-fused serving from prepared es/yb streams: sv backward +
    cx forward (no posterior band).  Returns (logZ, fl [4, D1K, B],
    tails [4, Wp, B])."""
    D1K, Wp, B = es.shape
    G, blk3, blk2, full, rev3, rev2, tail_spec, scratch = _sv_specs(
        D1K, Wp, B
    )
    fr3 = fr[:, None, :]  # [D1K, 1, B]
    bm, bls2, logZ = _sv_backward_call(st, gc, es, fink, find)

    cx_scratch = scratch + [
        pltpu.VMEM((Wp, B), jnp.float32) for _ in range(4)
    ]
    outs = pl.pallas_call(
        _make_fwd_kernel_circ_cx(st, gc),
        grid=(G,),
        in_specs=[blk3, blk3, blk2, blk3, blk2, full],
        out_specs=[blk2, blk2, blk2, blk2,
                   tail_spec, tail_spec, tail_spec, tail_spec],
        out_shape=(
            [jax.ShapeDtypeStruct((D1K, 1, B), jnp.float32)
             for _ in range(4)]
            + [jax.ShapeDtypeStruct((Wp, B), jnp.float32)
               for _ in range(4)]
        ),
        scratch_shapes=cx_scratch,
        interpret=_use_interpret(),
        compiler_params=_compiler_params(min_mb=64),
    )(es, yb, fr3, bm, bls2, logZ[None, :])
    fl = jnp.stack([outs[c][:, 0, :] for c in range(4)])   # [4, D1K, B]
    tails = jnp.stack(list(outs[4:8]))                     # [4, Wp, B]
    return logZ, fl, tails


def _posteriors_circ_cx(st, gc, cdev, fr):
    """Caller-fused serving: sv backward (XLA-precomputed signed
    emission stream) + cx forward (no posterior band output — fused
    expectation accumulation).  Returns
    (logZ [B], fl [4, D1K, B] flushed completed-position totals,
    tails [4, Wp, B] end-of-stream accumulators).

    Round-4 measurement moved this off the emw backward: computing
    emissions inside the backward's sequential body costs far more than
    the precompute pass it saves (11.1e9 vs 15.7e9 cells/s standalone,
    benchmarks/pipelined_sweep.py emw vs sv)."""
    D1, Wp, B = cdev.xb.shape
    K = STEP_BLOCK
    D1K = -(-D1 // K) * K

    valid = _pad_steps(cdev.valid.astype(jnp.int8), D1K)
    xb = _pad_steps(cdev.xb, D1K)
    yb = _pad_steps(cdev.yb, D1K)
    fink = cdev.fink.astype(jnp.int32)[None, :]
    find = cdev.final_d.astype(jnp.int32)[None, :]
    vf = valid.astype(jnp.float32)
    es = _precompute_ematch(st, xb, yb) * vf - (1.0 - vf)
    return _cx_from_es(st, gc, es, yb, fink, find, fr)


@functools.partial(jax.jit, static_argnames=("st",))
def _posteriors_circ_cx_static(st, cdev, fr):
    gc = _flat_gap_consts(st)
    assert gc is not None, "circular path needs flat gap emissions"
    return _posteriors_circ_cx(st, gc, cdev, fr)


def _make_fwd_kernel_circ_mw(st, gc):
    """Realign-fused signed-emission forward: emits the posterior band
    (the MEA wavefront still consumes it) PLUS the per-position row/col
    posterior sums the MEA gap weights need, accumulated in VMEM —
    replacing the separate cumsum + W-gather weights pass over the band
    (ops/mea._mea_weights_jit's first half).

    Column (reference-position) sums use the same rolling accumulator as
    the cx kernel; row (read-position) sums need NO rolling — a read
    position's circular row is fixed for its whole band lifetime — and
    flush when the band moves past them (band.circ_row_flush_rows)."""
    T = st[0]
    ch = _gap_chain_consts(st, gc)

    def kernel(
        es_ref, fr_ref, frr_ref, lom_ref, bm_ref, bls_ref, logZ_ref,
        post_ref, flc_ref, flr_ref, tc_ref, tr_ref,
        f1_0, f1_1, f1_2, f1_3, f1_4, f2_0, f2_1, f2_2, f2_3, f2_4,
        ls_ref, cprev_ref, accc_ref, accr_ref,
    ):
        f1_refs = (f1_0, f1_1, f1_2, f1_3, f1_4)
        f2_refs = (f2_0, f2_1, f2_2, f2_3, f2_4)
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            zero = jnp.zeros_like(f1_refs[0][:, :])
            row0 = jax.lax.broadcasted_iota(jnp.int32, zero.shape, 0) == 0
            for s in range(_NSTATE):
                pi_s = 0.2 if (ch is None or s == 0) else 0.2 / ch.k[s - 1]
                f1_refs[s][:, :] = jnp.where(row0, pi_s, 0.0)
                f2_refs[s][:, :] = zero
            ls_ref[:, :] = jnp.zeros_like(ls_ref)
            cprev_ref[:, :] = jnp.ones_like(cprev_ref)
            accc_ref[:, :] = zero
            accr_ref[:, :] = zero

        f1 = [f1_refs[s][:, :] for s in range(_NSTATE)]
        f2 = [f2_refs[s][:, :] for s in range(_NSTATE)]
        accc = accc_ref[:, :]
        accr = accr_ref[:, :]
        ls = ls_ref[:, :]
        cprev = cprev_ref[:, :]
        zero_arr = jnp.zeros_like(f1[0])
        logZ = logZ_ref[:, :]
        kidx = jax.lax.broadcasted_iota(jnp.int32, zero_arr.shape, 0)

        def mix(vals, t, coeff=1.0):
            out = None
            for s in range(_NSTATE):
                v = T[s][t] * coeff
                if v == 0.0:
                    continue
                term = vals[s] * v
                out = term if out is None else out + term
            return out

        def mix_match(vals):
            if ch is None:
                m = mix(vals, 0)
                return m if m is not None else zero_arr
            out = T[0][0] * vals[0]
            for s in range(1, _NSTATE):
                out = out + ch.mcoef[s - 1] * vals[s]
            return out

        for kb in range(STEP_BLOCK):
            es = es_ref[kb]
            e_match = jnp.maximum(es, 0.0)
            valid = (es >= 0.0).astype(jnp.float32)

            mix_m = mix_match(f2)
            if _fwd_divide_step(kb):
                mix_m = mix_m / cprev
            if ch is not None:
                mix_g = [f1[0] + ch.c[t - 1] * f1[t]
                         for t in range(1, _NSTATE)]
            else:
                mix_g = [mix(f1, t, gc[t - 1]) for t in range(1, _NSTATE)]
                mix_g = [m if m is not None else zero_arr for m in mix_g]

            new = [None] * _NSTATE
            new[0] = e_match * _roll_down(mix_m)
            new[1] = mix_g[0] * valid
            new[3] = mix_g[2] * valid
            new[2] = _roll_down(mix_g[1]) * valid
            new[4] = _roll_down(mix_g[3]) * valid

            rescale = _fwd_rescale_step(kb)
            if rescale:
                fmax = _max5(new).max(axis=0, keepdims=True)
                c = jnp.where(fmax > 0, fmax, 1.0)
                inv_c = 1.0 / c
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
            else:
                f1_next = scaled
                f2_next = f1
                if rescale:
                    ls = ls + jnp.log(c)
                    cprev = c

            alpha = jnp.exp(ls + bls_ref[kb] - logZ)  # [1, B]
            post = f1_next[0] * bm_ref[kb] * alpha
            # Emit the posterior row in BAND-RELATIVE layout:
            # rel[k] = circ[(k + lo) mod Wp], done as Wp static
            # roll+selects on the OUTPUT only (off the sequential
            # chain).  The host-side circ->rel take_along_axis this
            # replaces scalarises (~12s per 3072-lane batch;
            # benchmarks/pipelined_sweep.py c2r isolation).
            lom = lom_ref[kb]  # [1, B] = lo(d) mod Wp
            Wp_k = post.shape[0]
            rel = jnp.zeros_like(post)
            for sh in range(Wp_k):
                rel = jnp.where(
                    lom == sh,
                    pltpu.roll(post, (Wp_k - sh) % Wp_k, axis=0),
                    rel,
                )
            post_ref[kb] = rel
            pm = post
            if kb == 0:
                # Origin cell: start distribution, emits nothing.
                pm = jnp.where((i == 0) & (kidx == 0), 0.0, pm)

            # Column sums: rolling frame, flush at fr.
            frv = fr_ref[kb]
            fmask = kidx == frv
            rolled = _roll_down(accc)
            flc_ref[kb] = jnp.sum(
                jnp.where(fmask, rolled, 0.0), axis=0, keepdims=True
            )
            accc = jnp.where(fmask, 0.0, rolled) + pm

            # Row sums: row-stable, flush at frr when the band moves on.
            frrv = frr_ref[kb]
            rmask = kidx == frrv
            flr_ref[kb] = jnp.sum(
                jnp.where(rmask, accr, 0.0), axis=0, keepdims=True
            )
            accr = jnp.where(rmask, 0.0, accr) + pm

            f1, f2 = f1_next, f2_next

        for s in range(_NSTATE):
            f1_refs[s][:, :] = f1[s]
            f2_refs[s][:, :] = f2[s]
        ls_ref[:, :] = ls
        cprev_ref[:, :] = cprev
        accc_ref[:, :] = accc
        accr_ref[:, :] = accr

        @pl.when(i == pl.num_programs(0) - 1)
        def _tails():
            tc_ref[:, :] = accc_ref[:, :]
            tr_ref[:, :] = accr_ref[:, :]

    return kernel


def _posteriors_circ_mw(st, gc, cdev, fr, frr, lom):
    """Realign-fused serving: sv backward (XLA-precomputed signed
    emission stream; see _posteriors_circ_cx for why not emw) + mw
    forward.  Returns (logZ [B], post band [D1, Wp, B] BAND-RELATIVE —
    the forward converts layout on output, lom = lo mod Wp stream,
    flc/flr [D1K, B] flushed col/row posterior sums, tc/tr [Wp, B]
    accumulator tails)."""
    D1, Wp, B = cdev.xb.shape
    K = STEP_BLOCK
    D1K = -(-D1 // K) * K

    valid = _pad_steps(cdev.valid.astype(jnp.int8), D1K)
    xb = _pad_steps(cdev.xb, D1K)
    yb = _pad_steps(cdev.yb, D1K)
    fink = cdev.fink.astype(jnp.int32)[None, :]
    find = cdev.final_d.astype(jnp.int32)[None, :]
    vf = valid.astype(jnp.float32)
    es = _precompute_ematch(st, xb, yb) * vf - (1.0 - vf)
    logZ, post, flc, flr, tc, tr = _mw_from_es(
        st, gc, es, fink, find, fr, frr, lom
    )
    return logZ, post[:D1], flc, flr, tc, tr


def _mw_from_es(st, gc, es, fink, find, fr, frr, lom):
    """Realign-fused serving from a prepared es stream: sv backward + mw
    forward.  Returns (logZ, post [D1K, Wp, B] band-relative,
    flc/flr [D1K, B], tc/tr [Wp, B])."""
    D1K, Wp, B = es.shape
    G, blk3, blk2, full, rev3, rev2, tail_spec, scratch = _sv_specs(
        D1K, Wp, B
    )
    fr3 = fr[:, None, :]
    frr3 = frr[:, None, :]
    lom3 = lom[:, None, :]
    bm, bls2, logZ = _sv_backward_call(st, gc, es, fink, find)

    mw_scratch = scratch + [
        pltpu.VMEM((Wp, B), jnp.float32), pltpu.VMEM((Wp, B), jnp.float32),
    ]
    post, flc, flr, tc, tr = pl.pallas_call(
        _make_fwd_kernel_circ_mw(st, gc),
        grid=(G,),
        in_specs=[blk3, blk2, blk2, blk2, blk3, blk2, full],
        out_specs=[blk3, blk2, blk2, tail_spec, tail_spec],
        out_shape=[
            jax.ShapeDtypeStruct((D1K, Wp, B), jnp.float32),
            jax.ShapeDtypeStruct((D1K, 1, B), jnp.float32),
            jax.ShapeDtypeStruct((D1K, 1, B), jnp.float32),
            jax.ShapeDtypeStruct((Wp, B), jnp.float32),
            jax.ShapeDtypeStruct((Wp, B), jnp.float32),
        ],
        scratch_shapes=mw_scratch,
        interpret=_use_interpret(),
        compiler_params=_compiler_params(min_mb=64),
    )(es, fr3, frr3, lom3, bm, bls2, logZ[None, :])
    return logZ, post, flc[:, 0, :], flr[:, 0, :], tc, tr


@functools.partial(jax.jit, static_argnames=("st",))
def _posteriors_circ_mw_static(st, cdev, fr, frr, lom):
    gc = _flat_gap_consts(st)
    assert gc is not None, "circular path needs flat gap emissions"
    return _posteriors_circ_mw(st, gc, cdev, fr, frr, lom)


def posteriors_weights_pallas_circ(tables: FbTables, cdev, fr, frr, lom):
    """Fused realign serving over a fb.CircDeviceBatch: the forward
    accumulates the MEA gap-weight row/col posterior sums in VMEM while
    writing the posterior band in BAND-RELATIVE layout (lom =
    band.circ_lo_mod_rows stream; the layout conversion happens on the
    kernel's output write).  fr/frr are band.circ_flush_rows /
    circ_row_flush_rows streams.  Assemble per-position sums with
    ops.mea.rowcol_sums_from_flushed."""
    check_uniform_pi(tables)
    return _posteriors_circ_mw_static(
        static_tables(tables), cdev, jnp.asarray(fr), jnp.asarray(frr),
        jnp.asarray(lom),
    )


def posteriors_expectations_pallas_circ(tables: FbTables, cdev, fr):
    """Fused caller serving over a fb.CircDeviceBatch: one FB pass whose
    forward accumulates per-reference-position expected base counts
    in-kernel (no posterior band in HBM).  fr is the
    band.circ_flush_rows stream padded to the kernel step count.
    Returns (logZ [B], fl [4, D1K, B], tails [4, Wp, B]); assemble with
    ops.expectations.band_expectations_cx."""
    check_uniform_pi(tables)
    return _posteriors_circ_cx_static(
        static_tables(tables), cdev, jnp.asarray(fr)
    )


# --------- compact serving: streams expanded ON DEVICE (round 5) ----------
#
# The circ serving path used to upload xb/yb/valid [D1, Wp, B] every
# bucket (~1.5GB at B=3072 through a ~730MB/s tunnel) after building
# them on the host (another ~3GB of host memory traffic per bucket,
# band.circular_streams).  All three are determined by ~50MB: packed
# read/ref codes + the band-offset stream.  The expansion kernel
# re-creates the circular-layout windows in VMEM with a delay line:
#
#   - read-code window (yw): rows are position-stable in the circular
#     layout (row r holds i ≡ r mod Wp); when lo steps, exactly one row
#     recycles (i jumps by Wp) and receives reads[lo + Wp - 2];
#   - ref-code window (xw): j = d - i increments for every row each
#     diagonal, which in the circular layout is one unconditional
#     roll_down plus a single-row inject: refs[gu - 1] at row lo mod Wp
#     when gu steps, refs[gu - Wp] at row (lo-1) mod Wp when lo steps;
#   - validity is a closed form in (lo, m, n, d).
#
# The per-step inject values are monotone 0/1-index streams over the
# packed sequence arrays, produced by bucket_scatter.monotone_gather
# (per-lane take_along_axis scalarises on TPU).  The kernel emits the
# signed-emission stream es (and optionally the circ yb stream for the
# fused caller) directly — the sv/mw/cx serving kernels are unchanged.
# Equality with the host constructors is enforced by
# tests/test_expand.py.


class CompactCircBatch(NamedTuple):
    """Device twin of band.CompactBandedBatch."""

    reads: jnp.ndarray    # [Mp, B] int8 packed read codes
    refs: jnp.ndarray     # [Np, B] int8 packed ref codes
    lo: jnp.ndarray       # [D1, B] int32 (edge-replicated)
    m: jnp.ndarray        # [B] int32
    n: jnp.ndarray        # [B] int32
    final_d: jnp.ndarray  # [B] int32
    fink: jnp.ndarray     # [B] int32 terminal circular row (m mod Wp)
    x_init: jnp.ndarray   # [Wp, B] int8 d=0 ref-code window
    y_init: jnp.ndarray   # [Wp, B] int8 d=0 read-code window


def compact_device_batch(cb, device=None) -> CompactCircBatch:
    """Upload a band.CompactBandedBatch (~50MB vs ~1.5GB for the
    expanded circ streams).  device: upload DIRECTLY to that chip —
    jnp.asarray-then-device_put would stage every bucket through the
    default device and pay a second device-to-device copy."""
    if device is not None:
        _put = lambda x: jax.device_put(np.asarray(x), device)
    else:
        _put = jnp.asarray
    return CompactCircBatch(
        reads=_put(cb.reads_p),
        refs=_put(cb.refs_p),
        lo=_put(cb.lo),
        m=_put(cb.m),
        n=_put(cb.n),
        final_d=_put(cb.final_d),
        fink=_put((cb.m.astype(np.int64) % cb.wp).astype(np.int32)),
        x_init=_put(cb.x_init),
        y_init=_put(cb.y_init),
    )


def _make_expand_kernel(st, width: int, Wp: int, want_yb: bool):
    """Delay-line expansion kernel: es (and optionally circ yb) from
    per-step inject streams + the d=0 windows."""
    Em = _TableView.from_tuple(st[1])
    K = STEP_BLOCK

    def kernel(*refs):
        (lo_ref, lom_ref, s1_ref, inj_ref, xv_ref, yv_ref,
         m_ref, n_ref, xinit_ref, yinit_ref) = refs[:10]
        if want_yb:
            es_ref, yb_ref, xw_ref, yw_ref = refs[10:]
        else:
            es_ref, xw_ref, yw_ref = refs[10:]
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            xw_ref[:, :] = xinit_ref[:, :]
            yw_ref[:, :] = yinit_ref[:, :]

        xw = xw_ref[:, :]
        yw = yw_ref[:, :]
        kidx = jax.lax.broadcasted_iota(jnp.int32, xw.shape, 0)
        mv = m_ref[:, :]   # [1, B] int32
        nv = n_ref[:, :]
        mn_pos = (mv + nv) > 0

        for kb in range(K):
            d = i * K + kb
            s1 = s1_ref[kb]        # [1, B]
            mask = kidx == inj_ref[kb]
            # The d=0 step is a harmless no-op against the init windows
            # (xw uniform per lane and xv = refs[0]; s1(0) = 0), so no
            # first-step special case is needed.
            xw = _roll_down(xw)
            xw = jnp.where(mask, xv_ref[kb], xw)
            yw = jnp.where(mask & (s1 == 1), yv_ref[kb], yw)

            krel = kidx - lom_ref[kb]
            krel = krel + jnp.where(krel < 0, Wp, 0)
            iv = lo_ref[kb] + krel
            jv = d - iv
            valid = (
                (krel < width) & (iv <= mv) & (iv <= d)
                & (jv >= 0) & (jv <= nv) & mn_pos
            )
            em, _ = _emissions(Em, None, xw, yw)
            es_ref[kb] = jnp.where(valid, em, -1.0)
            if want_yb:
                yb_ref[kb] = yw.astype(jnp.int8)

        xw_ref[:, :] = xw
        yw_ref[:, :] = yw

    return kernel


def _expand_streams(st, comp: CompactCircBatch, width: int, d1k: int,
                    want_yb: bool):
    """(es [d1k, Wp, B] f32, yb [d1k, Wp, B] int8 | None,
    fr / frr / lom [d1k, B] i32) — the complete serving stream set,
    derived on device from a CompactCircBatch."""
    from .bucket_scatter import GROUP, monotone_gather

    Mp, B = comp.reads.shape
    Np = comp.refs.shape[0]
    Wp = comp.x_init.shape[0]
    K = STEP_BLOCK
    assert d1k % K == 0
    d1kg = -(-d1k // GROUP) * GROUP

    lo = comp.lo.astype(jnp.int32)
    D1 = lo.shape[0]
    if d1kg > D1:
        lo_g = jnp.concatenate(
            [lo, jnp.broadcast_to(lo[-1:], (d1kg - D1, B))], axis=0
        )
    else:
        lo_g = lo[:d1kg]
    d = jax.lax.broadcasted_iota(jnp.int32, (d1kg, B), 0)
    gu = d - lo_g
    s1 = jnp.concatenate(
        [jnp.zeros((1, B), jnp.int32), lo_g[1:] - lo_g[:-1]], axis=0
    )
    lom = lo_g % Wp
    injrow = (lo_g - s1) % Wp
    fr = jnp.where((s1 == 0) & (d > 0), (lo_g + width) % Wp, -1)
    frr = jnp.where(s1 == 1, (lo_g - 1) % Wp, -1)

    reads_f = comp.reads.astype(jnp.float32)
    refs_f = comp.refs.astype(jnp.float32)
    yv = monotone_gather(reads_f, jnp.clip(lo_g + (Wp - 2), 0, Mp - 1))
    xg = monotone_gather(refs_f, jnp.clip(gu - 1, 0, Np - 1))
    xr = monotone_gather(refs_f, jnp.clip(gu - Wp, 0, Np - 1))
    xv = jnp.where(s1 == 1, xr, xg)

    cut = lambda a: a[:d1k][:, None, :]  # noqa: E731
    blk3 = pl.BlockSpec((K, Wp, B), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    blk2 = pl.BlockSpec((K, 1, B), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    out_specs = [blk3, blk3] if want_yb else [blk3]
    out_shape = [jax.ShapeDtypeStruct((d1k, Wp, B), jnp.float32)]
    if want_yb:
        out_shape.append(jax.ShapeDtypeStruct((d1k, Wp, B), jnp.int8))
    outs = pl.pallas_call(
        _make_expand_kernel(st, width, Wp, want_yb),
        grid=(d1k // K,),
        in_specs=[blk2] * 6 + [full] * 4,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((Wp, B), jnp.float32),
            pltpu.VMEM((Wp, B), jnp.float32),
        ],
        interpret=_use_interpret(),
        compiler_params=_compiler_params(min_mb=64),
    )(
        cut(lo_g), cut(lom), cut(s1), cut(injrow), cut(xv), cut(yv),
        comp.m.astype(jnp.int32)[None, :],
        comp.n.astype(jnp.int32)[None, :],
        comp.x_init.astype(jnp.float32),
        comp.y_init.astype(jnp.float32),
    )
    if want_yb:
        es, yb = outs
    else:
        (es,) = outs if isinstance(outs, (list, tuple)) else (outs,)
        yb = None
    return es, yb, fr[:d1k], frr[:d1k], lom[:d1k]


@functools.partial(jax.jit, static_argnames=("st", "width", "d1k"))
def _posteriors_circ_mw_compact_static(st, comp: CompactCircBatch,
                                       width: int, d1k: int):
    gc = _flat_gap_consts(st)
    assert gc is not None, "compact path needs flat gap emissions"
    es, _, fr, frr, lom = _expand_streams(st, comp, width, d1k,
                                          want_yb=False)
    fink = comp.fink.astype(jnp.int32)[None, :]
    find = comp.final_d.astype(jnp.int32)[None, :]
    logZ, post, flc, flr, tc, tr = _mw_from_es(
        st, gc, es, fink, find, fr, frr, lom
    )
    return logZ, post[: comp.lo.shape[0]], flc, flr, tc, tr


def posteriors_weights_pallas_compact(tables: FbTables, comp, width: int):
    """Fused realign serving over a CompactCircBatch: every band-shaped
    stream (es, masks, flush rows) derives on device; the host uploads
    only packed sequences + band offsets.  Output contract matches
    posteriors_weights_pallas_circ."""
    check_uniform_pi(tables)
    d1k = -(-comp.lo.shape[0] // STEP_BLOCK) * STEP_BLOCK
    return _posteriors_circ_mw_compact_static(
        static_tables(tables), comp, width, d1k
    )


@functools.partial(jax.jit, static_argnames=("st", "width", "d1k"))
def _posteriors_circ_cx_compact_static(st, comp: CompactCircBatch,
                                       width: int, d1k: int):
    gc = _flat_gap_consts(st)
    assert gc is not None, "compact path needs flat gap emissions"
    es, yb, fr, _, _ = _expand_streams(st, comp, width, d1k, want_yb=True)
    fink = comp.fink.astype(jnp.int32)[None, :]
    find = comp.final_d.astype(jnp.int32)[None, :]
    return _cx_from_es(st, gc, es, yb, fink, find, fr)


def posteriors_expectations_pallas_compact(tables: FbTables, comp,
                                           width: int):
    """Fused caller serving over a CompactCircBatch (device-expanded
    streams).  Output contract matches
    posteriors_expectations_pallas_circ."""
    check_uniform_pi(tables)
    d1k = -(-comp.lo.shape[0] // STEP_BLOCK) * STEP_BLOCK
    return _posteriors_circ_cx_compact_static(
        static_tables(tables), comp, width, d1k
    )


@functools.partial(jax.jit, static_argnames=("st", "width", "d1k"))
def _posteriors_sv_compact_static(st, comp: CompactCircBatch,
                                  width: int, d1k: int):
    gc = _flat_gap_consts(st)
    assert gc is not None, "compact path needs flat gap emissions"
    es, _, _, _, _ = _expand_streams(st, comp, width, d1k, want_yb=False)
    fink = comp.fink.astype(jnp.int32)[None, :]
    find = comp.final_d.astype(jnp.int32)[None, :]
    logZ, post = _sv_from_es(st, gc, es, fink, find)
    return logZ, post[: comp.lo.shape[0]]


def posteriors_pallas_compact(tables: FbTables, comp, width: int):
    """(logZ, posterior band in CIRC layout) over a CompactCircBatch:
    the es stream comes from the device expansion kernel instead of the
    XLA precompute over uploaded xb/yb/valid — the byte mix drops from
    26 to ~24 B/cell system-wide and the host uploads only sequences +
    offsets.  Posterior values equal posteriors_pallas_circ(mode='sv')
    exactly (same es bytes by tests/test_expand.py)."""
    check_uniform_pi(tables)
    d1k = -(-comp.lo.shape[0] // STEP_BLOCK) * STEP_BLOCK
    return _posteriors_sv_compact_static(
        static_tables(tables), comp, width, d1k
    )


def _make_expand_rel_kernel(Wp: int):
    """BAND-RELATIVE code-window expansion (the guide NW kernel's layout):
    rel row k holds i = lo + k.  When lo steps the read window rolls up
    one row with one entering value at the top; when gu steps the ref
    window rolls down one row with one entering value at row 0 — both
    rolls conditional (s1), both injects at STATIC rows."""
    K = STEP_BLOCK

    def kernel(s1_ref, xg_ref, yv_ref, xinit_ref, yinit_ref,
               xb_ref, yb_ref, xw_ref, yw_ref):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            xw_ref[:, :] = xinit_ref[:, :]
            yw_ref[:, :] = yinit_ref[:, :]

        xw = xw_ref[:, :]
        yw = yw_ref[:, :]
        kidx = jax.lax.broadcasted_iota(jnp.int32, xw.shape, 0)

        for kb in range(K):
            d = i * K + kb
            s1 = s1_ref[kb]                     # [1, B]
            lo_step = s1 == 1
            gu_step = (s1 == 0) & (d > 0)
            yw = jnp.where(lo_step, _roll_up(yw), yw)
            yw = jnp.where(lo_step & (kidx == Wp - 1), yv_ref[kb], yw)
            xw = jnp.where(gu_step, _roll_down(xw), xw)
            xw = jnp.where(gu_step & (kidx == 0), xg_ref[kb], xw)
            xb_ref[kb] = xw.astype(jnp.int8)
            yb_ref[kb] = yw.astype(jnp.int8)

        xw_ref[:, :] = xw
        yw_ref[:, :] = yw

    return kernel


@functools.partial(jax.jit, static_argnames=("d1k",))
def expand_rel_codes(comp: CompactCircBatch, d1k: int):
    """(xb, yb) [d1k, Wp, B] int8 in BAND-RELATIVE layout, expanded on
    device from a CompactCircBatch — code values equal the host
    pack_banded_batch arrays at every in-band cell.  Pair with
    band.band_masks_device for valid/s1/s2 to build a DeviceBatch for
    the NW wavefront without any host band-array construction."""
    from .bucket_scatter import GROUP, monotone_gather

    Mp, B = comp.reads.shape
    Np = comp.refs.shape[0]
    Wp = comp.x_init.shape[0]
    K = STEP_BLOCK
    assert d1k % K == 0
    d1kg = -(-d1k // GROUP) * GROUP

    lo = comp.lo.astype(jnp.int32)
    D1 = lo.shape[0]
    if d1kg > D1:
        lo_g = jnp.concatenate(
            [lo, jnp.broadcast_to(lo[-1:], (d1kg - D1, B))], axis=0
        )
    else:
        lo_g = lo[:d1kg]
    d = jax.lax.broadcasted_iota(jnp.int32, (d1kg, B), 0)
    gu = d - lo_g
    s1 = jnp.concatenate(
        [jnp.zeros((1, B), jnp.int32), lo_g[1:] - lo_g[:-1]], axis=0
    )
    reads_f = comp.reads.astype(jnp.float32)
    refs_f = comp.refs.astype(jnp.float32)
    yv = monotone_gather(reads_f, jnp.clip(lo_g + (Wp - 2), 0, Mp - 1))
    xg = monotone_gather(refs_f, jnp.clip(gu - 1, 0, Np - 1))

    cut = lambda a: a[:d1k][:, None, :]  # noqa: E731
    blk3 = pl.BlockSpec((K, Wp, B), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    blk2 = pl.BlockSpec((K, 1, B), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    xb, yb = pl.pallas_call(
        _make_expand_rel_kernel(Wp),
        grid=(d1k // K,),
        in_specs=[blk2] * 3 + [full] * 2,
        out_specs=[blk3, blk3],
        out_shape=[
            jax.ShapeDtypeStruct((d1k, Wp, B), jnp.int8),
            jax.ShapeDtypeStruct((d1k, Wp, B), jnp.int8),
        ],
        scratch_shapes=[
            pltpu.VMEM((Wp, B), jnp.float32),
            pltpu.VMEM((Wp, B), jnp.float32),
        ],
        interpret=_use_interpret(),
        compiler_params=_compiler_params(min_mb=64),
    )(
        cut(s1), cut(xg), cut(yv),
        comp.x_init.astype(jnp.float32),
        comp.y_init.astype(jnp.float32),
    )
    return xb, yb


# --------- checkpoint-recompute serving (no stored backward band) ---------
#
# The stored serving path writes the backward match band and re-reads it in
# the posterior pass (8 B/cell of HBM traffic), and the limiter probes show
# the serving kernels are stream-bound with large VPU headroom
# (docs/KERNELS.md).  Like the EM ckpt kernels (fb_pallas_counts.py), the
# backward here emits only its per-block ENTERING frontier (b1 x5, b2 x5,
# the two emission-delay rows, and the bls/cprev scale rows: 48/K B/cell
# per direction), and the posterior pass recomputes each block's backward
# into VMEM scratch before running the forward against it — bit-identical
# to the stored path since the recompute replays the same ops from the
# same state.  K (MARGINALIGN_CKPT_BLOCK, default 32) is larger than the
# serving STEP_BLOCK because the checkpoint cost scales as 1/K.

_CKPT_BLOCK = int(
    __import__("os").environ.get("MARGINALIGN_CKPT_BLOCK", "32")
)


def _ckpt_bwd_rescale(kb: int) -> bool:
    return kb % _RESCALE_PERIOD == 0


def _ckpt_bwd_divide(kb: int, K: int) -> bool:
    return (kb + 1) % _RESCALE_PERIOD == 0 or kb == K - 1


def _ckpt_fwd_rescale(kb: int, K: int) -> bool:
    return kb % _RESCALE_PERIOD == _RESCALE_PERIOD - 1 or kb == K - 1


def _ckpt_fwd_divide(kb: int) -> bool:
    return kb % _RESCALE_PERIOD == 0


def _make_bwd_kernel_circ_ckpt(st, gc, K):
    """Checkpointing twin of _make_bwd_kernel_circ_lean: same backward
    recurrence (emissions computed in-kernel from the int8 code streams),
    but the only per-block outputs are the entering frontier checkpoint
    (ckpt [1, 12, Wp, B] = b1 x5, b2 x5, e1, e2; cs [1, 2, B] = bls,
    cprev) plus the logZ terms (zrow, final bls)."""
    T = st[0]
    ch = _gap_chain_consts(st, gc)
    Em = _TableView.from_tuple(st[1])

    def kernel(*refs):
        (valid_ref, xb_ref, yb_ref, fink_ref, find_ref,
         ckpt_ref, cs_ref, zrow_ref, blsf_ref,
         b1_0, b1_1, b1_2, b1_3, b1_4, b2_0, b2_1, b2_2, b2_3, b2_4,
         bls_ref, cprev_ref, eh1_ref, eh2_ref) = refs
        b1_refs = (b1_0, b1_1, b1_2, b1_3, b1_4)
        b2_refs = (b2_0, b2_1, b2_2, b2_3, b2_4)
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            zero = jnp.zeros_like(b1_refs[0][:, :])
            for s in range(_NSTATE):
                b1_refs[s][:, :] = zero
                b2_refs[s][:, :] = zero
            bls_ref[:, :] = jnp.zeros_like(bls_ref)
            cprev_ref[:, :] = jnp.ones_like(cprev_ref)
            eh1_ref[:, :] = zero
            eh2_ref[:, :] = zero

        # The ENTERING state of this block is the checkpoint the posterior
        # pass restarts its recompute from (all-zero for the last block,
        # written right after _init).
        for s in range(_NSTATE):
            ckpt_ref[0, s] = b1_refs[s][:, :]
            ckpt_ref[0, 5 + s] = b2_refs[s][:, :]
        ckpt_ref[0, 10] = eh1_ref[:, :]
        ckpt_ref[0, 11] = eh2_ref[:, :]
        cs_ref[0, 0:1] = bls_ref[:, :]
        cs_ref[0, 1:2] = cprev_ref[:, :]

        b1 = [b1_refs[s][:, :] for s in range(_NSTATE)]
        b2 = [b2_refs[s][:, :] for s in range(_NSTATE)]
        bls = bls_ref[:, :]
        cprev = cprev_ref[:, :]
        e1 = eh1_ref[:, :]
        e2 = eh2_ref[:, :]
        fink = fink_ref[:, :]
        find = find_ref[:, :]
        kidx = jax.lax.broadcasted_iota(jnp.int32, b1[0].shape, 0)

        blk_base = (pl.num_programs(0) - 1 - i) * K
        for t in range(K):
            kb = K - 1 - t
            d = blk_base + kb

            valid = valid_ref[kb].astype(jnp.float32)

            q = [None] * _NSTATE
            q[0] = _roll_up(e2 * b2[0])
            if _ckpt_bwd_divide(kb, K):
                q[0] = q[0] / cprev
            q[1] = b1[1]
            q[3] = b1[3]
            q[2] = _roll_up(b1[2])
            q[4] = _roll_up(b1[4])

            e2 = e1
            xb = xb_ref[kb].astype(jnp.int32)
            yb = yb_ref[kb].astype(jnp.int32)
            e_match_d, _ = _emissions(Em, None, xb, yb)
            e1 = e_match_d * valid

            new = [None] * _NSTATE
            if ch is not None:
                sel_k = jnp.where(find == d, fink, -1)  # [1, B]
                mask = kidx == sel_k
                acc0 = T[0][0] * q[0]
                for s in range(1, _NSTATE):
                    acc0 = acc0 + ch.m0[s - 1] * q[s]
                new[0] = jnp.where(mask, 1.0, acc0) * valid
                for s in range(1, _NSTATE):
                    accs = q[0] + ch.cb[s - 1] * q[s]
                    new[s] = jnp.where(mask, ch.r[s - 1], accs) * valid
            else:
                inj = jnp.where((kidx == fink) & (d == find), 1.0, 0.0)
                zero_arr = jnp.zeros_like(q[0])
                for s in range(_NSTATE):
                    acc = None
                    for u in range(_NSTATE):
                        v = T[s][u] * (1.0 if u == 0 else gc[u - 1])
                        if v == 0.0:
                            continue
                        term = q[u] * v
                        acc = term if acc is None else acc + term
                    if acc is None:
                        acc = zero_arr
                    new[s] = (acc + inj) * valid

            if _ckpt_bwd_rescale(kb):
                bmax = _max5(new).max(axis=0, keepdims=True)
                c = jnp.where(bmax > 0, bmax, 1.0)
                inv_c = 1.0 / c
                bls = bls + jnp.log(c)
                cprev = c
                b_out = [new[s] * inv_c for s in range(_NSTATE)]
            else:
                b_out = new

            b2 = b1
            b1 = b_out

        if ch is not None:
            zr = b1[0][0:1]
            for s in range(1, _NSTATE):
                zr = zr + T[s][0] * b1[s][0:1]
            zrow_ref[0] = 0.2 * zr
        else:
            zrow_ref[0] = 0.2 * (
                b1[0][0:1] + b1[1][0:1] + b1[2][0:1] + b1[3][0:1]
                + b1[4][0:1]
            )
        blsf_ref[0] = bls

        for s in range(_NSTATE):
            b1_refs[s][:, :] = b1[s]
            b2_refs[s][:, :] = b2[s]
        bls_ref[:, :] = bls
        cprev_ref[:, :] = cprev
        eh1_ref[:, :] = e1
        eh2_ref[:, :] = e2

    return kernel


def _make_fwd_kernel_circ_ckpt(st, gc, K):
    """Posterior pass of the checkpoint-recompute serving path: loads the
    block's entering backward frontier, replays the block's backward into
    bm/bls VMEM scratch (bit-identical to _make_bwd_kernel_circ_ckpt),
    then runs the forward and emits normalised posteriors like
    _make_fwd_kernel_circ_post_lean."""
    T = st[0]
    ch = _gap_chain_consts(st, gc)
    Em = _TableView.from_tuple(st[1])

    def kernel(*refs):
        (xb_ref, yb_ref, valid_ref, ckpt_ref, cs_ref,
         fink_ref, find_ref, logZ_ref,
         post_ref,
         f1_0, f1_1, f1_2, f1_3, f1_4, f2_0, f2_1, f2_2, f2_3, f2_4,
         ls_ref, cprev_ref, bm_s, bls_s) = refs
        f1_refs = (f1_0, f1_1, f1_2, f1_3, f1_4)
        f2_refs = (f2_0, f2_1, f2_2, f2_3, f2_4)
        i = pl.program_id(0)

        # ---- backward recompute (descending kb) from the checkpoint ----
        b1 = [ckpt_ref[0, s] for s in range(_NSTATE)]
        b2 = [ckpt_ref[0, 5 + s] for s in range(_NSTATE)]
        e1 = ckpt_ref[0, 10]
        e2 = ckpt_ref[0, 11]
        bls = cs_ref[0, 0:1]
        cprevB = cs_ref[0, 1:2]
        fink = fink_ref[:, :]
        find = find_ref[:, :]
        kidx = jax.lax.broadcasted_iota(jnp.int32, b1[0].shape, 0)
        blk_base = i * K

        for t in range(K):
            kb = K - 1 - t
            d = blk_base + kb

            valid = valid_ref[kb].astype(jnp.float32)

            q = [None] * _NSTATE
            q[0] = _roll_up(e2 * b2[0])
            if _ckpt_bwd_divide(kb, K):
                q[0] = q[0] / cprevB
            q[1] = b1[1]
            q[3] = b1[3]
            q[2] = _roll_up(b1[2])
            q[4] = _roll_up(b1[4])

            e2 = e1
            xb = xb_ref[kb].astype(jnp.int32)
            yb = yb_ref[kb].astype(jnp.int32)
            e_match_d, _ = _emissions(Em, None, xb, yb)
            e1 = e_match_d * valid

            new = [None] * _NSTATE
            if ch is not None:
                sel_k = jnp.where(find == d, fink, -1)
                mask = kidx == sel_k
                acc0 = T[0][0] * q[0]
                for s in range(1, _NSTATE):
                    acc0 = acc0 + ch.m0[s - 1] * q[s]
                new[0] = jnp.where(mask, 1.0, acc0) * valid
                for s in range(1, _NSTATE):
                    accs = q[0] + ch.cb[s - 1] * q[s]
                    new[s] = jnp.where(mask, ch.r[s - 1], accs) * valid
            else:
                inj = jnp.where((kidx == fink) & (d == find), 1.0, 0.0)
                zero_arr = jnp.zeros_like(q[0])
                for s in range(_NSTATE):
                    acc = None
                    for u in range(_NSTATE):
                        v = T[s][u] * (1.0 if u == 0 else gc[u - 1])
                        if v == 0.0:
                            continue
                        term = q[u] * v
                        acc = term if acc is None else acc + term
                    if acc is None:
                        acc = zero_arr
                    new[s] = (acc + inj) * valid

            if _ckpt_bwd_rescale(kb):
                bmax = _max5(new).max(axis=0, keepdims=True)
                c = jnp.where(bmax > 0, bmax, 1.0)
                inv_c = 1.0 / c
                bls = bls + jnp.log(c)
                cprevB = c
                b_out = [new[s] * inv_c for s in range(_NSTATE)]
            else:
                b_out = new

            bm_s[kb] = b_out[0]
            bls_s[kb] = bls

            b2 = b1
            b1 = b_out

        # ---- forward + posterior (ascending kb) -------------------------
        @pl.when(i == 0)
        def _init():
            zero = jnp.zeros_like(f1_refs[0][:, :])
            row0 = jax.lax.broadcasted_iota(jnp.int32, zero.shape, 0) == 0
            for s in range(_NSTATE):
                pi_s = 0.2 if (ch is None or s == 0) else 0.2 / ch.k[s - 1]
                f1_refs[s][:, :] = jnp.where(row0, pi_s, 0.0)
                f2_refs[s][:, :] = zero
            ls_ref[:, :] = jnp.zeros_like(ls_ref)
            cprev_ref[:, :] = jnp.ones_like(cprev_ref)

        f1 = [f1_refs[s][:, :] for s in range(_NSTATE)]
        f2 = [f2_refs[s][:, :] for s in range(_NSTATE)]
        ls = ls_ref[:, :]
        cprev = cprev_ref[:, :]
        zero_arr = jnp.zeros_like(f1[0])
        logZ = logZ_ref[:, :]

        def mix(vals, t, coeff=1.0):
            acc = None
            for s in range(_NSTATE):
                v = T[s][t] * coeff
                if v == 0.0:
                    continue
                term = vals[s] * v
                acc = term if acc is None else acc + term
            return acc

        def mix_match(vals):
            if ch is None:
                m = mix(vals, 0)
                return m if m is not None else zero_arr
            acc = T[0][0] * vals[0]
            for s in range(1, _NSTATE):
                acc = acc + ch.mcoef[s - 1] * vals[s]
            return acc

        for kb in range(K):
            valid = valid_ref[kb].astype(jnp.float32)
            xb = xb_ref[kb].astype(jnp.int32)
            yb = yb_ref[kb].astype(jnp.int32)
            em_raw, _ = _emissions(Em, None, xb, yb)
            e_match = em_raw * valid

            mix_m = mix_match(f2)
            if _ckpt_fwd_divide(kb):
                mix_m = mix_m / cprev
            if ch is not None:
                mix_g = [f1[0] + ch.c[t - 1] * f1[t]
                         for t in range(1, _NSTATE)]
            else:
                mix_g = [mix(f1, t, gc[t - 1]) for t in range(1, _NSTATE)]
                mix_g = [m if m is not None else zero_arr for m in mix_g]

            new = [None] * _NSTATE
            new[0] = e_match * _roll_down(mix_m)
            new[1] = mix_g[0] * valid
            new[3] = mix_g[2] * valid
            new[2] = _roll_down(mix_g[1]) * valid
            new[4] = _roll_down(mix_g[3]) * valid

            rescale = _ckpt_fwd_rescale(kb, K)
            if rescale:
                fmax = _max5(new).max(axis=0, keepdims=True)
                c = jnp.where(fmax > 0, fmax, 1.0)
                inv_c = 1.0 / c
                scaled = [new[s] * inv_c for s in range(_NSTATE)]
            else:
                scaled = new

            if kb == 0:
                is_first = i == 0
                f1_next = [jnp.where(is_first, f1[s], scaled[s])
                           for s in range(_NSTATE)]
                f2_next = [jnp.where(is_first, f2[s], f1[s])
                           for s in range(_NSTATE)]
                if rescale:  # only when K == 1
                    ls = jnp.where(is_first, ls, ls + jnp.log(c))
                    cprev = jnp.where(is_first, cprev, c)
            else:
                f1_next = scaled
                f2_next = f1
                if rescale:
                    ls = ls + jnp.log(c)
                    cprev = c

            alpha = jnp.exp(ls + bls_s[kb] - logZ)  # [1, B]
            post_ref[kb] = f1_next[0] * bm_s[kb] * alpha
            f1, f2 = f1_next, f2_next

        for s in range(_NSTATE):
            f1_refs[s][:, :] = f1[s]
            f2_refs[s][:, :] = f2[s]
        ls_ref[:, :] = ls
        cprev_ref[:, :] = cprev

    return kernel


def _posteriors_circ_ckpt(st, gc, cdev):
    """Checkpoint-recompute serving FB over circular streams: the backward
    band is never materialised in HBM — only 48/K B/cell of frontier
    checkpoints cross between the passes (vs 8 B/cell stored bm)."""
    D1, Wp, B = cdev.xb.shape
    K = _CKPT_BLOCK
    D1K = -(-D1 // K) * K
    G = D1K // K

    valid = _pad_steps(cdev.valid.astype(jnp.int8), D1K)
    xb = _pad_steps(cdev.xb, D1K)
    yb = _pad_steps(cdev.yb, D1K)
    fink = cdev.fink.astype(jnp.int32)[None, :]
    find = cdev.final_d.astype(jnp.int32)[None, :]

    blk3 = pl.BlockSpec((K, Wp, B), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    rev3 = pl.BlockSpec((K, Wp, B), lambda i: (G - 1 - i, 0, 0),
                        memory_space=pltpu.VMEM)
    one = pl.BlockSpec((1, 1, B), lambda i: (0, 0, 0),
                       memory_space=pltpu.VMEM)
    ckpt_w = pl.BlockSpec((1, 12, Wp, B), lambda i: (G - 1 - i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    cs_w = pl.BlockSpec((1, 2, B), lambda i: (G - 1 - i, 0, 0),
                        memory_space=pltpu.VMEM)
    ckpt_r = pl.BlockSpec((1, 12, Wp, B), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    cs_r = pl.BlockSpec((1, 2, B), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)

    bwd_scratch = (
        [pltpu.VMEM((Wp, B), jnp.float32) for _ in range(10)]
        + [pltpu.VMEM((1, B), jnp.float32), pltpu.VMEM((1, B), jnp.float32)]
        + [pltpu.VMEM((Wp, B), jnp.float32), pltpu.VMEM((Wp, B), jnp.float32)]
    )
    ckpt, cs, zrow, blsf = pl.pallas_call(
        _make_bwd_kernel_circ_ckpt(st, gc, K),
        grid=(G,),
        in_specs=[rev3, rev3, rev3, full, full],
        out_specs=[ckpt_w, cs_w, one, one],
        out_shape=[
            jax.ShapeDtypeStruct((G, 12, Wp, B), jnp.float32),
            jax.ShapeDtypeStruct((G, 2, B), jnp.float32),
            jax.ShapeDtypeStruct((1, 1, B), jnp.float32),
            jax.ShapeDtypeStruct((1, 1, B), jnp.float32),
        ],
        scratch_shapes=bwd_scratch,
        interpret=_use_interpret(),
        compiler_params=_compiler_params(min_mb=96),
    )(valid, xb, yb, fink, find)

    logZ = (
        jnp.log(jnp.maximum(zrow[0, 0, :], 1e-30)) + blsf[0, 0, :]
    )

    fwd_scratch = (
        [pltpu.VMEM((Wp, B), jnp.float32) for _ in range(10)]
        + [pltpu.VMEM((1, B), jnp.float32), pltpu.VMEM((1, B), jnp.float32)]
        + [pltpu.VMEM((K, Wp, B), jnp.float32),
           pltpu.VMEM((K, 1, B), jnp.float32)]
    )
    post = pl.pallas_call(
        _make_fwd_kernel_circ_ckpt(st, gc, K),
        grid=(G,),
        in_specs=[blk3, blk3, blk3, ckpt_r, cs_r, full, full, full],
        out_specs=[blk3],
        out_shape=[jax.ShapeDtypeStruct((D1K, Wp, B), jnp.float32)],
        scratch_shapes=fwd_scratch,
        interpret=_use_interpret(),
        compiler_params=_compiler_params(min_mb=96),
    )(xb, yb, valid, ckpt, cs, fink, find, logZ[None, :])[0]
    return logZ, post[:D1]


@functools.partial(jax.jit, static_argnames=("st", "mode"))
def _posteriors_circ_static(st, cdev, mode="lean"):
    gc = _flat_gap_consts(st)
    assert gc is not None, "circular path needs flat gap emissions"
    if mode == "ckpt":
        return _posteriors_circ_ckpt(st, gc, cdev)
    if mode == "lean":
        return _posteriors_circ_lean(st, gc, cdev)
    if mode == "sv":
        return _posteriors_circ_sv(st, gc, cdev)
    if mode == "emw":
        return _posteriors_circ_emw(st, gc, cdev)
    return _posteriors_circ(st, gc, cdev)


def posteriors_pallas_circ(tables: FbTables, cdev, mode=None):
    """(logZ [B], posterior band in CIRCULAR layout) over a
    fb.CircDeviceBatch.  Model-specialised, flat-gap models (all
    shipped/normalised ones); band motion costs three unconditional
    single-row rotates per direction per step instead of six conditional
    roll+select pairs (measured +9% vs the band-relative path on v5e).

    mode (MARGINALIGN_CIRC_SERVE) picks the stream diet:
      - "sv":   SIGNED precomputed emission stream (validity in the sign
        bit, es = em*valid - (1-valid)) so neither kernel reads the int8
        valid stream — fastest measured (15.7e9 vs em 13.9e9 cells/s at
        B=3072, benchmarks/pipelined_sweep.py round 4); the default
      - "em":   unsigned f32 emission stream + int8 valid stream
      - "emw":  the backward computes emissions in-kernel from the int8
        code streams and writes the signed stream for the forward — no
        XLA emission-precompute pass at all
      - "lean": emissions in-kernel in BOTH kernels from the int8 code
        streams (least HBM: the choice when lanes don't fit)
      - "ckpt": lean + checkpoint-recompute — the backward band is never
        written to HBM; the posterior pass replays each block's backward
        from a 48/K B/cell frontier checkpoint (bit-identical numerics).
        Slowest (the replay doubles the posterior-pass body) but smallest
        footprint.
    All modes produce identical posteriors up to float noise; measured
    throughputs are recorded in docs/KERNELS.md (round-3 em/lean/ckpt
    table, round-4 sv/emw/fused table)."""
    check_uniform_pi(tables)
    if mode is None:
        env = __import__("os").environ.get("MARGINALIGN_CIRC_SERVE", "")
        if env in ("em", "lean", "ckpt", "sv", "emw"):
            mode = env
        elif __import__("os").environ.get("MARGINALIGN_CIRC_LEAN") == "1":
            mode = "lean"
        else:
            mode = "sv"
    return _posteriors_circ_static(static_tables(tables), cdev, mode)


@functools.partial(jax.jit, static_argnames=("st",))
def _posteriors_multi_static(st, mdev: MultiDeviceBatch):
    gc = _flat_gap_consts(st)
    assert gc is not None, "multi-problem path needs flat gap emissions"
    return _posteriors_pre_multi(st, gc, mdev)


def posteriors_pallas_multi(tables: FbTables, mdev: MultiDeviceBatch):
    """(logZ [P], posterior band [D1, Wp, B]) over multi-problem lanes
    (band.pack_multi_banded_batch).  Model-specialised, flat-gap models
    (all shipped/normalised ones)."""
    check_uniform_pi(tables)
    return _posteriors_multi_static(static_tables(tables), mdev)
