"""Kernel dispatch: choose the Pallas wavefront kernels or the XLA scan.

Default policy: Pallas on real accelerators (it is both ~4x faster and more
accurate there — the XLA scan's einsums round through the MXU), XLA scan on
CPU (Pallas interpret mode is slow).  Override with MARGINALIGN_KERNEL=
pallas|xla.
"""
from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp

from .fb import DeviceBatch, FbTables, forward_backward


def use_pallas() -> bool:
    env = os.environ.get("MARGINALIGN_KERNEL", "").lower()
    if env == "pallas":
        return True
    if env == "xla":
        return False
    return jax.default_backend() != "cpu"


def use_circ() -> bool:
    """Circular band layout (band.circular_streams): the Pallas kernels'
    band motion becomes unconditional static rotates.  Default on
    accelerators; MARGINALIGN_LAYOUT=rel forces the band-relative path."""
    env = os.environ.get("MARGINALIGN_LAYOUT", "").lower()
    if env == "circ":
        return True
    if env == "rel":
        return False
    return use_pallas()


def use_fused_caller() -> bool:
    """Fused caller serving (fb_pallas cx kernels): the forward pass
    accumulates reference-position base expectations in VMEM and the
    posterior band never reaches HBM.  Default on wherever the circular
    Pallas path runs; MARGINALIGN_CALLER_FUSED=off restores the
    posterior-band + segment-sum path."""
    env = os.environ.get("MARGINALIGN_CALLER_FUSED", "").lower()
    if env in ("on", "1"):
        return True
    if env in ("off", "0"):
        return False
    return use_pallas() and use_circ()


def use_fused_realign() -> bool:
    """Fused realign serving (fb_pallas mw kernels): the forward pass
    accumulates the MEA gap-weight row/col posterior sums in VMEM while
    writing the posterior band, replacing the separate segment-sum
    weights pass.  Default on wherever the circular Pallas path runs;
    MARGINALIGN_REALIGN_FUSED=off restores the weights pass."""
    env = os.environ.get("MARGINALIGN_REALIGN_FUSED", "").lower()
    if env in ("on", "1"):
        return True
    if env in ("off", "0"):
        return False
    return use_pallas() and use_circ()


def use_compact_streams() -> bool:
    """Compact serving (fb_pallas CompactCircBatch): the host packs only
    sequences + band offsets (~50MB/bucket) and the circ-layout es/yb/
    mask/flush streams derive ON DEVICE via the delay-line expansion
    kernel — replacing ~1.5GB of per-bucket uploads through the
    ~730MB/s tunnel plus ~3GB of host-side band-array construction.
    Default on wherever the fused circ serving runs;
    MARGINALIGN_COMPACT=off restores host stream construction."""
    env = os.environ.get("MARGINALIGN_COMPACT", "").lower()
    if env in ("on", "1"):
        return True
    if env in ("off", "0"):
        return False
    return use_pallas() and use_circ()


def has_flat_gap_emissions(tables) -> bool:
    """True when every gap state's emission row is flat — the premise the
    circ/compact/fused serving kernels assert (gap emissions fold into
    transition constants there).  EM-trained models mid-training or
    un-normalised trial models are generically non-flat and must route
    through the REL specialised path's generic branch."""
    from .fb_pallas import _flat_gap_consts, static_tables

    try:
        return _flat_gap_consts(static_tables(tables)) is not None
    except Exception:
        return False


def use_device_traceback() -> bool:
    """Device-side traceback scans (ops/traceback_device.py): the NW/MEA
    walks run on device and only a 2-bit [ceil(D1/4), B] MOVE stream
    crosses to the host — ~40x fewer D2H bytes than the bit-packed
    pointer bands (the guide/realign wall on a ~30MB/s tunnel).  Default
    on wherever Pallas runs; MARGINALIGN_DEVICE_TB=off restores the
    pointer pull + host/native traceback."""
    env = os.environ.get("MARGINALIGN_DEVICE_TB", "").lower()
    if env in ("on", "1"):
        return True
    if env in ("off", "0"):
        return False
    return use_pallas()


def make_fb_device_batch(batch):
    """Layout-appropriate device streams for fb_posteriors (a
    CircDeviceBatch on the circular path, else a DeviceBatch)."""
    if use_pallas() and use_circ():
        from .fb import circ_device_batch

        return circ_device_batch(batch)
    from .fb import device_batch

    return device_batch(batch)


def fb_posteriors(
    tables: FbTables, batch
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(logZ [B], posterior match band [D1, Wp, B]) via the active kernel.

    With a CircDeviceBatch input the posterior band comes back in the
    CIRCULAR layout (band.circ_to_rel converts; device-side consumers use
    the circular-aware expectation helpers)."""
    from .fb import CircDeviceBatch

    if isinstance(batch, CircDeviceBatch):
        from .fb_pallas import posteriors_pallas_circ

        return posteriors_pallas_circ(tables, batch)
    if use_pallas():
        from .fb_pallas import posteriors_pallas_specialised

        return posteriors_pallas_specialised(tables, batch)
    res = forward_backward(
        tables, batch, want_posteriors=True, want_counts=False
    )
    return res.logZ, res.posteriors


def fb_counts_multi(tables: FbTables, mdev):
    """EM expected counts over multi-problem lanes (always Pallas; the
    multi streams only exist for the Pallas kernels — interpret mode covers
    CPU).  logZ is per problem [P]."""
    from .fb_pallas_counts import (
        counts_pallas_multi, match_counts_from_posteriors_multi,
    )

    res = counts_pallas_multi(tables, mdev)
    em = (res.emit_match if res.emit_match is not None
          else match_counts_from_posteriors_multi(res.posteriors, mdev))
    return res.logZ, res.trans_counts, em, res.emit_gap


def fb_counts(tables: FbTables, batch: DeviceBatch):
    """(logZ [B], trans_counts [5,5], emit_match [5,5], emit_gap [5,5]) via
    the active kernel (EM E-step)."""
    if use_pallas():
        from .fb_pallas_counts import (
            counts_pallas, match_counts_from_posteriors,
        )

        res = counts_pallas(tables, batch)
        em = (res.emit_match if res.emit_match is not None
              else match_counts_from_posteriors(res.posteriors, batch))
        return res.logZ, res.trans_counts, em, res.emit_gap
    res = forward_backward(
        tables, batch, want_posteriors=False, want_counts=True
    )
    return res.logZ, res.trans_counts, res.emit_match, res.emit_gap


def fb_counts_trials(tables_stacked: FbTables, batch: DeviceBatch):
    """Lockstep EM trials: expected counts for Ntr models over one batch in
    ONE device call.  tables_stacked leaves are [Ntr, ...]; returns
    (logZ [Ntr, B], trans [Ntr,5,5], emit_match [Ntr,5,5],
    emit_gap [Ntr,5,5]).  Pallas trials-grid kernel on accelerators; vmap of
    the XLA scan engine on CPU."""
    if use_pallas():
        from .fb_pallas_counts import (
            counts_pallas_trials, match_counts_from_posteriors_trials,
        )

        res = counts_pallas_trials(tables_stacked, batch)
        em = (res.emit_match if res.emit_match is not None
              else match_counts_from_posteriors_trials(
                  res.posteriors, batch))
        return res.logZ, res.trans_counts, em, res.emit_gap
    res = jax.vmap(
        lambda t: forward_backward(
            t, batch, want_posteriors=False, want_counts=True
        ),
        in_axes=(FbTables(T=0, Ematch=0, Egap=0, pi=0),),
    )(tables_stacked)
    return res.logZ, res.trans_counts, res.emit_match, res.emit_gap


def fb_counts_multi_trials(tables_stacked: FbTables, mdev):
    """Lockstep EM trials over multi-problem lanes (always Pallas; interpret
    mode covers CPU).  logZ is [Ntr, P]."""
    from .fb_pallas_counts import (
        counts_pallas_multi_trials, match_counts_from_posteriors_multi_trials,
    )

    res = counts_pallas_multi_trials(tables_stacked, mdev)
    em = (res.emit_match if res.emit_match is not None
          else match_counts_from_posteriors_multi_trials(
              res.posteriors, mdev))
    return res.logZ, res.trans_counts, em, res.emit_gap
