"""Multi-device sharding tests on the virtual 8-device CPU mesh."""
import jax
import numpy as np
import pytest

from marginalign_trna_tpu.models.hmm import PairHmm
from marginalign_trna_tpu.ops.band import pack_banded_batch
from marginalign_trna_tpu.ops.fb import device_batch, forward_backward, make_tables
from marginalign_trna_tpu.parallel.mesh import (
    make_data_mesh, make_em_train_step, make_sharded_fb, pad_batch_lanes,
)


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest should provide 8 CPU devices"
    return make_data_mesh()


def _random_jobs(rng, count, m_range=(10, 30), n_range=(10, 30)):
    reads = [
        rng.integers(0, 4, size=rng.integers(*m_range)).astype(np.int8)
        for _ in range(count)
    ]
    refs = [
        rng.integers(0, 4, size=rng.integers(*n_range)).astype(np.int8)
        for _ in range(count)
    ]
    return reads, refs


def test_sharded_counts_match_single_device(mesh, rng):
    hmm = PairHmm.random(seed=5)
    reads, refs = _random_jobs(rng, 13)
    batch = pad_batch_lanes(
        pack_banded_batch(reads, refs, width=32), len(jax.devices())
    )
    tables = make_tables(hmm)
    dev = device_batch(batch)

    # Single-device reference result.
    res1 = forward_backward(tables, dev, want_posteriors=False,
                            want_counts=True)

    step = make_em_train_step(mesh)
    res8 = step(
        tables,
        jax.numpy.asarray(hmm.transitions, jax.numpy.float32),
        jax.numpy.asarray(hmm.emissions, jax.numpy.float32),
        dev,
    )
    assert np.allclose(np.asarray(res8.trans_counts),
                       np.asarray(res1.trans_counts), rtol=1e-3, atol=1e-3)
    assert np.allclose(np.asarray(res8.emit_match),
                       np.asarray(res1.emit_match), rtol=1e-3, atol=1e-3)
    ll1 = float(np.sum(np.asarray(res1.logZ)))
    assert np.isclose(float(res8.log_likelihood), ll1, rtol=1e-4)
    # M-step outputs are stochastic.
    assert np.allclose(np.asarray(res8.new_transitions).sum(axis=1), 1.0,
                       atol=1e-4)
    assert np.allclose(np.asarray(res8.new_emissions).sum(axis=1), 1.0,
                       atol=1e-4)


def test_sharded_posteriors_match(mesh, rng):
    hmm = PairHmm.random(seed=6)
    reads, refs = _random_jobs(rng, 8)
    batch = pad_batch_lanes(
        pack_banded_batch(reads, refs, width=32), len(jax.devices())
    )
    tables = make_tables(hmm)
    dev = device_batch(batch)
    res1 = forward_backward(tables, dev, want_posteriors=True)
    fb = make_sharded_fb(mesh)
    logZ8, post8 = fb(tables, dev)
    assert np.allclose(np.asarray(logZ8), np.asarray(res1.logZ),
                       rtol=1e-4, atol=1e-4)
    assert np.allclose(np.asarray(post8), np.asarray(res1.posteriors),
                       atol=1e-4)


def test_em_step_improves_likelihood(mesh, rng):
    """Two successive mesh EM steps: likelihood must not decrease."""
    hmm = PairHmm.random(seed=7)
    reads, refs = _random_jobs(rng, 8, (20, 40), (20, 40))
    batch = pad_batch_lanes(
        pack_banded_batch(reads, refs, width=48), len(jax.devices())
    )
    dev = device_batch(batch)
    step = make_em_train_step(mesh)

    t = jax.numpy.asarray(hmm.transitions, jax.numpy.float32)
    e = jax.numpy.asarray(hmm.emissions, jax.numpy.float32)
    lls = []
    for _ in range(3):
        res = step(make_tables(_hmm_from(t, e)), t, e, dev)
        lls.append(float(res.log_likelihood))
        t, e = res.new_transitions, res.new_emissions
    assert lls[1] >= lls[0] - 1e-3
    assert lls[2] >= lls[1] - 1e-3


def _hmm_from(t, e):
    h = PairHmm(np.asarray(t, np.float64), np.asarray(e, np.float64))
    return h


def test_runtime_helpers():
    from marginalign_trna_tpu.parallel.runtime import (
        is_host_zero, shard_for_host, with_retries,
    )

    assert is_host_zero()  # single-process tests
    assert shard_for_host([1, 2, 3]) == [1, 2, 3]

    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("transient")
        return "ok"

    assert with_retries(flaky, attempts=4, base_delay=0.01) == "ok"
    assert calls["n"] == 3

    with pytest.raises(RuntimeError):
        with_retries(lambda: (_ for _ in ()).throw(RuntimeError("x")),
                     attempts=2, base_delay=0.01)
