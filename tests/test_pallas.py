"""Pallas FB kernels vs the JAX scan engine (interpret mode on CPU)."""
import numpy as np
import pytest

from marginalign_trna_tpu.models.hmm import PairHmm
from marginalign_trna_tpu.ops.band import pack_banded_batch, path_from_cigar
from marginalign_trna_tpu.ops.fb import (
    device_batch, forward, forward_backward, make_tables,
)
from marginalign_trna_tpu.ops.fb_pallas import forward_pallas, posteriors_pallas

REF_MAPPERS = "/root/reference/src/margin/mappers"


def _mixed_batch(rng, widths=(16,)):
    hmm = PairHmm.load(REF_MAPPERS + "/last_hmm_20.txt")
    reads = [rng.integers(0, 4, size=m).astype(np.int8) for m in (9, 17, 30)]
    refs = [rng.integers(0, 4, size=n).astype(np.int8) for n in (12, 15, 28)]
    batch = pack_banded_batch(reads, refs, width=31, pad_batch_to=4)
    return hmm, batch


def test_forward_pallas_matches_jax(rng):
    hmm, batch = _mixed_batch(rng)
    tables = make_tables(hmm)
    dev = device_batch(batch)
    _, _, logZ_jax = forward(tables, dev)
    res = forward_pallas(tables, dev)
    assert np.allclose(
        np.asarray(res.logZ)[:3], np.asarray(logZ_jax)[:3], rtol=1e-4,
        atol=1e-4,
    )


def test_posteriors_pallas_match_jax(rng):
    hmm, batch = _mixed_batch(rng)
    tables = make_tables(hmm)
    dev = device_batch(batch)
    ref = forward_backward(tables, dev, want_posteriors=True)
    logZ, post = posteriors_pallas(tables, dev)
    assert np.allclose(np.asarray(logZ)[:3], np.asarray(ref.logZ)[:3],
                       rtol=1e-4, atol=1e-4)
    assert np.allclose(np.asarray(post), np.asarray(ref.posteriors),
                       atol=2e-4)


def test_pallas_with_guide_path(rng):
    """Banded case with a moving band (nonzero shifts)."""
    hmm = PairHmm.load(REF_MAPPERS + "/last_hmm_20.txt")
    n = 80
    x = rng.integers(0, 4, size=n).astype(np.int8)
    y = np.concatenate([x[:40], x[50:]])  # 10-base deletion
    pd, pi = path_from_cigar([(0, 40), (2, 10), (0, 30)])
    batch = pack_banded_batch([y], [x], width=21, paths=[(pd, pi)])
    tables = make_tables(hmm)
    dev = device_batch(batch)
    ref = forward_backward(tables, dev, want_posteriors=True)
    logZ, post = posteriors_pallas(tables, dev)
    assert np.allclose(float(logZ[0]), float(ref.logZ[0]), rtol=1e-4,
                       atol=1e-3)
    assert np.allclose(np.asarray(post), np.asarray(ref.posteriors),
                       atol=2e-4)


def test_specialised_matches_dynamic(rng):
    from marginalign_trna_tpu.ops.fb_pallas import (
        posteriors_pallas_specialised,
    )

    hmm, batch = _mixed_batch(rng)
    tables = make_tables(hmm)
    dev = device_batch(batch)
    logZ_d, post_d = posteriors_pallas(tables, dev)
    logZ_s, post_s = posteriors_pallas_specialised(tables, dev)
    assert np.allclose(np.asarray(logZ_s)[:3], np.asarray(logZ_d)[:3],
                       rtol=1e-5, atol=1e-4)
    assert np.allclose(np.asarray(post_s), np.asarray(post_d), atol=1e-5)


def test_counts_pallas_matches_engine(rng):
    """Both E-step kernels — the stored-forward path (posterior band +
    host match reduction) and the default checkpoint-recompute path
    (in-kernel match counts, no stored bands) — match the XLA engine."""
    from marginalign_trna_tpu.ops.fb_pallas_counts import (
        _counts_ckpt_jit, _counts_pallas_jit, match_counts_from_posteriors,
    )

    hmm, batch = _mixed_batch(rng)
    tables = make_tables(hmm)
    dev = device_batch(batch)
    ref = forward_backward(tables, dev, want_posteriors=True,
                           want_counts=True)

    res = _counts_pallas_jit(tables, dev)
    assert np.allclose(np.asarray(res.logZ)[:3], np.asarray(ref.logZ)[:3],
                       rtol=1e-4, atol=1e-4)
    assert np.allclose(np.asarray(res.posteriors),
                       np.asarray(ref.posteriors), atol=2e-4)
    assert np.allclose(np.asarray(res.trans_counts),
                       np.asarray(ref.trans_counts), rtol=1e-3, atol=1e-3)
    assert np.allclose(np.asarray(res.emit_gap),
                       np.asarray(ref.emit_gap), rtol=1e-3, atol=1e-3)
    em = match_counts_from_posteriors(res.posteriors, dev)
    assert np.allclose(np.asarray(em), np.asarray(ref.emit_match),
                       rtol=1e-3, atol=1e-3)

    ck = _counts_ckpt_jit(tables, dev)
    assert ck.posteriors is None
    assert np.allclose(np.asarray(ck.logZ)[:3], np.asarray(ref.logZ)[:3],
                       rtol=1e-4, atol=1e-4)
    assert np.allclose(np.asarray(ck.trans_counts),
                       np.asarray(ref.trans_counts), rtol=1e-3, atol=1e-3)
    assert np.allclose(np.asarray(ck.emit_gap),
                       np.asarray(ref.emit_gap), rtol=1e-3, atol=1e-3)
    assert np.allclose(np.asarray(ck.emit_match),
                       np.asarray(ref.emit_match), rtol=1e-3, atol=1e-3)


def test_nonuniform_pi_rejected(rng):
    """Pallas entry points refuse a non-uniform start distribution instead
    of silently diverging from the XLA/oracle paths (ADVICE r1)."""
    import jax.numpy as jnp

    from marginalign_trna_tpu.ops.fb_pallas import (
        check_uniform_pi, posteriors_pallas, posteriors_pallas_specialised,
    )
    from marginalign_trna_tpu.ops.fb_pallas_counts import counts_pallas

    hmm, batch = _mixed_batch(rng)
    tables = make_tables(hmm)
    dev = device_batch(batch)
    bad = tables._replace(pi=jnp.asarray([0.6, 0.1, 0.1, 0.1, 0.1]))
    check_uniform_pi(tables)  # uniform passes
    for fn in (posteriors_pallas, posteriors_pallas_specialised,
               counts_pallas):
        with pytest.raises(NotImplementedError):
            fn(bad, dev)


def test_specialised_generic_path_non_chain_model(rng):
    """A model where gap states exchange mass with each other falls off the
    gap-chain fast path (_gap_chain_consts returns None); the specialised
    kernels' generic branch must still match the dynamic engine."""
    import jax.numpy as jnp

    from marginalign_trna_tpu.ops.fb_pallas import (
        _flat_gap_consts, _gap_chain_consts, posteriors_pallas_specialised,
        static_tables,
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
    assert _flat_gap_consts(st) is not None
    assert _gap_chain_consts(st, _flat_gap_consts(st)) is None

    dev = device_batch(batch)
    logZ_d, post_d = posteriors_pallas(tables, dev)
    logZ_s, post_s = posteriors_pallas_specialised(tables, dev)
    assert np.allclose(np.asarray(logZ_s)[:3], np.asarray(logZ_d)[:3],
                       rtol=1e-5, atol=1e-4)
    assert np.allclose(np.asarray(post_s), np.asarray(post_d), atol=1e-5)
