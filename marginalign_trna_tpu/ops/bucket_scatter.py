"""Monotone bucket scatter: position-space assembly without gathers.

Problem: the fused serving kernels (fb_pallas cx/mw) emit per-diagonal
flushed values whose target positions vary per lane; assembling them
into dense [positions, B] arrays with ``take_along_axis`` costs ~150ms
per [4096, 3072] gather on this TPU (benchmarks/gather_probe.py — XLA
scalarises per-lane gathers), 25x the serving kernel itself.

Structure that rescues it: the target stream jmap[d, b] advances by at
most 1 per diagonal, so within any aligned group of 128 diagonals each
lane's flushed positions (a) are at most 128 consecutive values, hence
occupy DISTINCT residues v mod 128, and (b) span at most a few aligned
128-blocks of the output across all lanes.  So per group:

  1. residue stage: place each flushed [1, B] value into row
     (v mod 128) of a [128, B] VMEM buffer by constant-shape masks
     (128 compare+select+adds per input row — VPU work, no gathers);
  2. merge stage: the buffer's rows belong to output blocks
     t2 = v // 128; a static loop over all blocks of the VMEM-resident
     [RG, B] output does a [128, B] read-modify-write per block,
     predicated (pl.when) on the group actually touching it — a group
     spans <= 2 blocks, so ~all iterations skip at run time.  (Mosaic
     cannot lower dynamic-offset vector loads/stores on the sublane
     dim, so the offsets must be static.)

Everything is masks, adds, and static-offset slices; the full assembly
costs ~VPU-bandwidth instead of scalarised gather time.

The host wrapper only checks targets are in range (group_spread_ok);
out-of-range targets fall back to the XLA gather path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 128           # diagonals per residue group == residue count


def _use_interpret() -> bool:
    from .fb_pallas import _use_interpret as fbi

    return fbi()


def _compiler_params(min_mb=128):
    from .fb_pallas import _compiler_params as fbc

    return fbc(min_mb=min_mb)


def _make_bucket_scatter_kernel(rg: int):
    """Kernel over grid (C, G): channel-major, then sequential groups."""

    def kernel(vals_ref, jmap_ref, out_ref, bk_ref, vb_ref):
        g = pl.program_id(1)

        @pl.when(g == 0)
        def _init():
            out_ref[0] = jnp.zeros_like(out_ref[0])

        B = jmap_ref.shape[1]
        riota = jax.lax.broadcasted_iota(
            jnp.int32, (GROUP, B), 0
        )
        bk_ref[:, :] = jnp.zeros_like(bk_ref)
        vb_ref[:, :] = jnp.full_like(vb_ref, -1)

        def body(u, _):
            j = jmap_ref[u][None, :]       # [1, B] int32 (-1 = none)
            v = vals_ref[0, u][None, :]    # [1, B] f32
            r = jnp.where(j >= 0, jnp.remainder(j, GROUP), -1)
            mask = riota == r
            bk_ref[:, :] = bk_ref[:, :] + jnp.where(mask, v, 0.0)
            vb_ref[:, :] = jnp.where(mask, j, vb_ref[:, :])
            return 0

        # Mosaic only lowers unroll=1 or unroll=num_steps for fori_loop;
        # partial unrolls fail to compile on TPU.
        jax.lax.fori_loop(0, GROUP, body, 0, unroll=1)

        vb = vb_ref[:, :]
        bk = bk_ref[:, :]
        t2 = jnp.where(vb >= 0, vb // GROUP, jnp.int32(-1))
        n_blocks = rg // GROUP

        # Static loop over output blocks: Mosaic cannot lower dynamic-
        # offset vector loads/stores on the sublane dim (the earlier
        # t2min+candidate RMW design failed to compile), so every block
        # gets a STATIC-offset read-modify-write, predicated on the group
        # actually touching it — a group's values span <= 2 blocks, so
        # ~all iterations skip at run time.
        for s in range(n_blocks):
            sel = t2 == s

            @pl.when(jnp.any(sel))
            def _merge(s=s, sel=sel):
                contrib = jnp.where(sel, bk, 0.0)
                cur = out_ref[0, s * GROUP : (s + 1) * GROUP, :]
                out_ref[0, s * GROUP : (s + 1) * GROUP, :] = (
                    cur + contrib
                )

    return kernel


@functools.partial(jax.jit, static_argnames=("rg",))
def bucket_scatter(vals, jmap, rg: int):
    """[C, rg, B] from vals [C, D, B] f32 and jmap [D, B] int32 targets.

    out[c, v, b] = sum over d of vals[c, d, b] where jmap[d, b] == v.
    D must be a multiple of GROUP (pad with jmap = -1 rows); rg a
    multiple of GROUP.  Per-group constraints as per module docstring.
    """
    C, D, B = vals.shape
    assert D % GROUP == 0 and rg % GROUP == 0
    G = D // GROUP

    grid = (C, G)
    out = pl.pallas_call(
        _make_bucket_scatter_kernel(rg),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, GROUP, B), lambda c, g: (c, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, B), lambda c, g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rg, B), lambda c, g: (c, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, rg, B), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((GROUP, B), jnp.float32),
            pltpu.VMEM((GROUP, B), jnp.int32),
        ],
        interpret=_use_interpret(),
        compiler_params=_compiler_params(min_mb=128),
    )(vals, jmap)
    return out


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def bucket_scatter_chunked(vals, jmap, rg: int):
    """bucket_scatter with the output chunked so the VMEM-resident
    [chunk, B] accumulator stays within budget (the kernel re-reads the
    input streams per chunk; they are ~1ms of HBM traffic each)."""
    B = vals.shape[2]
    rgc = 4096 if B < 4096 else 2048
    rgp = _round_up(rg, GROUP)
    if rgp <= rgc:
        return bucket_scatter(vals, jmap, rgp)
    outs = []
    for v0 in range(0, rgp, rgc):
        jm = jnp.where(
            (jmap >= v0) & (jmap < v0 + rgc), jmap - v0, -1
        )
        outs.append(bucket_scatter(vals, jm, rgc))
    return jnp.concatenate(outs, axis=1)[:, :rgp]


def pad_group_rows(vals: jnp.ndarray, jmap: jnp.ndarray):
    """Pad the row dimension to a GROUP multiple (jmap pads with -1)."""
    D = vals.shape[1]
    Dp = _round_up(D, GROUP)
    if Dp == D:
        return vals, jmap
    vals = jnp.pad(vals, [(0, 0), (0, Dp - D), (0, 0)])
    jmap = jnp.pad(jmap, [(0, Dp - D), (0, 0)], constant_values=-1)
    return vals, jmap


def _make_bucket_scatter_lanesum_kernel(rg: int, C: int):
    """Kernel over grid (G,): all C channels per group (they share one
    jmap, so the residue masks are computed once), and the merge stage
    reduces over lanes — output [C, rg] instead of [C, rg, B].  For
    consumers that sum lanes anyway (the caller's global expectation
    vector) this removes the VMEM-resident [rg, B] accumulator, its
    read-modify-writes, and any need to chunk rg."""

    def kernel(vals_ref, jmap_ref, out_ref, bk_ref, vb_ref):
        g = pl.program_id(0)

        @pl.when(g == 0)
        def _init():
            out_ref[:, :] = jnp.zeros_like(out_ref)

        B = jmap_ref.shape[1]
        riota = jax.lax.broadcasted_iota(jnp.int32, (GROUP, B), 0)
        bk_ref[:, :] = jnp.zeros_like(bk_ref)
        vb_ref[:, :] = jnp.full_like(vb_ref, -1)

        def body(u, _):
            j = jmap_ref[u][None, :]
            r = jnp.where(j >= 0, jnp.remainder(j, GROUP), -1)
            mask = riota == r
            for c in range(C):
                v = vals_ref[c, u][None, :]
                bk_ref[c * GROUP : (c + 1) * GROUP, :] = (
                    bk_ref[c * GROUP : (c + 1) * GROUP, :]
                    + jnp.where(mask, v, 0.0)
                )
            vb_ref[:, :] = jnp.where(mask, j, vb_ref[:, :])
            return 0

        jax.lax.fori_loop(0, GROUP, body, 0, unroll=1)

        vb = vb_ref[:, :]
        t2 = jnp.where(vb >= 0, vb // GROUP, jnp.int32(-1))
        n_blocks = rg // GROUP

        # Output is positions-major [rgp, C]: the lane-reduced [GROUP, 1]
        # contribution writes straight into a sublane-dim slice (no
        # sublane->lane transpose, which Mosaic can't lower cheaply).
        for s in range(n_blocks):
            sel = t2 == s

            @pl.when(jnp.any(sel))
            def _merge(s=s, sel=sel):
                for c in range(C):
                    contrib = jnp.where(
                        sel, bk_ref[c * GROUP : (c + 1) * GROUP, :], 0.0
                    ).sum(axis=1, keepdims=True)
                    cur = out_ref[s * GROUP : (s + 1) * GROUP, c : c + 1]
                    out_ref[s * GROUP : (s + 1) * GROUP, c : c + 1] = (
                        cur + contrib
                    )

    return kernel


@functools.partial(jax.jit, static_argnames=("rg",))
def bucket_scatter_lanesum(vals, jmap, rg: int):
    """[rg, C] f32: like bucket_scatter but summed over lanes.

    out[v, c] = sum over (d, b) of vals[c, d, b] where jmap[d, b] == v.
    Same preconditions as bucket_scatter; rg needs no chunking (the
    output is [rg, C], not [C, rg, B])."""
    C, D, B = vals.shape
    rgp = _round_up(rg, GROUP)
    assert D % GROUP == 0
    G = D // GROUP

    out = pl.pallas_call(
        _make_bucket_scatter_lanesum_kernel(rgp, C),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((C, GROUP, B), lambda g: (0, g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((GROUP, B), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rgp, C), lambda g: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rgp, C), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((C * GROUP, B), jnp.float32),
            pltpu.VMEM((GROUP, B), jnp.int32),
        ],
        interpret=_use_interpret(),
        compiler_params=_compiler_params(min_mb=128),
    )(vals, jmap)
    return out[:rg]


def _make_monotone_gather_kernel(rg: int):
    """Kernel over grid (G,): sequential groups of GROUP output rows."""

    def kernel(idx_ref, src_ref, out_ref, pick_ref):
        idx = idx_ref[:, :]                       # [GROUP, B] int32
        B = idx.shape[1]
        # Within a group the requested values span [a, a+GROUP-1] (idx
        # advances 0/1 per row), so each residue r mod GROUP names at
        # most one requested value v_r; its source block is one of two
        # consecutive blocks, selected per lane by masks against
        # residue-ALIGNED whole-block reads of src (no gathers).
        a = idx[0:1, :]                           # [1, B]
        rr = jax.lax.broadcasted_iota(jnp.int32, (GROUP, B), 0)
        v_r = a + jnp.remainder(rr - a, GROUP)    # [GROUP, B]
        blk = v_r // GROUP
        pick_ref[:, :] = jnp.zeros_like(pick_ref)

        for s in range(rg // GROUP):
            sel = blk == s

            @pl.when(jnp.any(sel))
            def _pick(s=s, sel=sel):
                pick_ref[:, :] = pick_ref[:, :] + jnp.where(
                    sel, src_ref[s * GROUP : (s + 1) * GROUP, :], 0.0
                )

        # out[u, b] = pick[idx[u, b] mod GROUP, b]: residue masks again.
        rmod = jnp.remainder(idx, GROUP)
        pick = pick_ref[:, :]
        acc = jnp.zeros_like(out_ref[:, :])
        for r in range(GROUP):
            acc = acc + jnp.where(rmod == r, pick[r : r + 1, :], 0.0)
        out_ref[:, :] = acc

    return kernel


@functools.partial(jax.jit, static_argnames=())
def monotone_gather(src, idx):
    """[D, B] f32 with out[u, b] = src[idx[u, b], b].

    idx int32 must advance by 0 or 1 per row within every aligned
    GROUP-row window (the monotone band-offset streams do), so requested
    values per group span < GROUP and residues mod GROUP are unique.
    D and src rows must be GROUP multiples; idx must be in range.
    Replaces per-lane take_along_axis, which scalarises on TPU
    (benchmarks/gather_probe.py: ~150ms per [4096, B] gather)."""
    D, B = idx.shape
    rg = src.shape[0]
    assert D % GROUP == 0 and rg % GROUP == 0
    G = D // GROUP

    return pl.pallas_call(
        _make_monotone_gather_kernel(rg),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((GROUP, B), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # src resident
        ],
        out_specs=pl.BlockSpec((GROUP, B), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((D, B), jnp.float32),
        scratch_shapes=[pltpu.VMEM((GROUP, B), jnp.float32)],
        interpret=_use_interpret(),
        compiler_params=_compiler_params(min_mb=128),
    )(idx, src)


def group_spread_ok(jmap_np: np.ndarray, rg: int) -> bool:
    """Host check: are all targets in range?  (The static-block merge
    stage has no per-group spread constraint; this only guards against
    targets outside [0, rg), which would silently drop mass.)"""
    return bool(jmap_np.max() < rg)
