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


def fb_posteriors(
    tables: FbTables, batch: DeviceBatch
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(logZ [B], posterior match band [D1, Wp, B]) via the active kernel."""
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
    em = match_counts_from_posteriors_multi(res.posteriors, mdev)
    return res.logZ, res.trans_counts, em, res.emit_gap


def fb_counts(tables: FbTables, batch: DeviceBatch):
    """(logZ [B], trans_counts [5,5], emit_match [5,5], emit_gap [5,5]) via
    the active kernel (EM E-step)."""
    if use_pallas():
        from .fb_pallas_counts import (
            counts_pallas, match_counts_from_posteriors,
        )

        res = counts_pallas(tables, batch)
        em = match_counts_from_posteriors(res.posteriors, batch)
        return res.logZ, res.trans_counts, em, res.emit_gap
    res = forward_backward(
        tables, batch, want_posteriors=False, want_counts=True
    )
    return res.logZ, res.trans_counts, res.emit_match, res.emit_gap
