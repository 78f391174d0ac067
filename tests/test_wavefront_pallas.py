"""Pallas max-plus wavefront kernels (NW / MEA) vs the XLA scan engines
(interpret mode on CPU)."""
import numpy as np
import jax.numpy as jnp

from marginalign_trna_tpu.ops.band import pack_banded_batch, path_from_cigar
from marginalign_trna_tpu.ops.fb import device_batch
from marginalign_trna_tpu.ops.mea import (
    NEG, banded_mea, mea_weights, mea_weights_device, _traceback_one,
)
from marginalign_trna_tpu.ops.nw import banded_nw, traceback
from marginalign_trna_tpu.ops.wavefront_pallas import (
    banded_mea_pallas, banded_nw_pallas,
)


def _batch(rng, with_path=True):
    reads = [rng.integers(0, 4, size=m).astype(np.int8) for m in (9, 17, 30)]
    refs = [rng.integers(0, 4, size=n).astype(np.int8) for n in (12, 15, 28)]
    # One read is a mutated copy of its ref so real alignments exist.
    refs[2] = reads[2][:28].copy()
    refs[2][5] = (refs[2][5] + 1) % 4
    paths = None
    if with_path:
        paths = [None, None, path_from_cigar([(0, 10), (1, 2), (0, 18)])]
    return pack_banded_batch(reads, refs, width=9, paths=paths,
                             pad_batch_to=4)


def test_nw_pallas_matches_xla(rng):
    batch = _batch(rng)
    dev = device_batch(batch)
    params = jnp.asarray([1.0, -2.0, -3.0, -1.0], jnp.float32)
    ref = banded_nw(params, dev)
    got = banded_nw_pallas(params, dev)
    # Integer-valued scores: tie-breaking is identical, pointers must be
    # equal and the decoded cigars therefore too.
    assert np.array_equal(np.asarray(got.final_state)[:3],
                          np.asarray(ref.final_state)[:3])
    assert np.allclose(np.asarray(got.score)[:3], np.asarray(ref.score)[:3],
                       rtol=1e-5, atol=1e-4)
    for b in range(3):
        ops_ref = traceback(np.asarray(ref.pointers), batch, b,
                            int(np.asarray(ref.final_state)[b]))
        ops_got = traceback(np.asarray(got.pointers), batch, b,
                            int(np.asarray(got.final_state)[b]))
        assert ops_ref == ops_got


def test_mea_pallas_matches_xla(rng):
    batch = _batch(rng)
    D1, Wp, B = batch.xb.shape
    post = (rng.random((D1, Wp, B)).astype(np.float32) * batch.valid)
    wup, wleft = mea_weights(post, batch, gap_gamma=0.5)
    wdiag = np.where(post > 0, post, NEG).astype(np.float32)
    args = (
        jnp.asarray(batch.valid), jnp.asarray(batch.s1),
        jnp.asarray(batch.s2),
        jnp.asarray(batch.final_d), jnp.asarray(batch.final_k),
    )
    ref = banded_mea(jnp.asarray(wdiag), jnp.asarray(wup),
                     jnp.asarray(wleft), *args)
    got = banded_mea_pallas(jnp.asarray(wdiag), jnp.asarray(wup),
                            jnp.asarray(wleft), *args)
    assert np.allclose(np.asarray(got.score)[:3], np.asarray(ref.score)[:3],
                       rtol=1e-5, atol=1e-4)
    for b in range(3):
        assert (_traceback_one(np.asarray(ref.pointers), batch, b)
                == _traceback_one(np.asarray(got.pointers), batch, b))


def test_mea_weights_device_matches_host(rng):
    batch = _batch(rng)
    D1, Wp, B = batch.xb.shape
    post = (rng.random((D1, Wp, B)).astype(np.float32) * batch.valid)
    wup_h, wleft_h = mea_weights(post, batch, gap_gamma=0.5)
    wup_d, wleft_d = mea_weights_device(post, batch, gap_gamma=0.5)
    assert np.allclose(np.asarray(wup_d), wup_h, rtol=1e-5, atol=1e-5)
    assert np.allclose(np.asarray(wleft_d), wleft_h, rtol=1e-5, atol=1e-5)


def test_mea_decode_device_path_matches_host_path(rng):
    import os

    from marginalign_trna_tpu.ops.mea import mea_decode

    batch = _batch(rng)
    D1, Wp, B = batch.xb.shape
    post = (rng.random((D1, Wp, B)).astype(np.float32) * batch.valid)
    os.environ["MARGINALIGN_MEA"] = "host"
    try:
        host_ops = mea_decode(post, batch)
    finally:
        os.environ["MARGINALIGN_MEA"] = "device"
    try:
        dev_ops = mea_decode(post, batch)
    finally:
        del os.environ["MARGINALIGN_MEA"]
    assert host_ops[:3] == dev_ops[:3]


def test_nw_pallas_multi_matches_single(rng):
    """Per-problem scores/final states/tracebacks from multi-problem lanes
    equal the single-problem engine's."""
    from marginalign_trna_tpu.ops.band import pack_multi_banded_batch
    from marginalign_trna_tpu.ops.fb_pallas import multi_device_batch
    from marginalign_trna_tpu.ops.nw import traceback_multi
    from marginalign_trna_tpu.ops.wavefront_pallas import (
        banded_nw_pallas_multi,
    )

    reads = [rng.integers(0, 4, size=m).astype(np.int8)
             for m in (9, 17, 30, 22, 13)]
    refs = [rng.integers(0, 4, size=n).astype(np.int8)
            for n in (12, 15, 28, 25, 11)]
    refs[2] = reads[2][:28].copy()
    refs[2][5] = (refs[2][5] + 1) % 4
    params = jnp.asarray([1.0, -2.0, -3.0, -1.0], jnp.float32)

    single = pack_banded_batch(reads, refs, width=9, pad_batch_to=8)
    ref = banded_nw(params, device_batch(single))
    ref_states = np.asarray(ref.final_state)
    ref_ptrs = np.asarray(ref.pointers)

    # Small step budget forces several problems per lane.
    mb = pack_multi_banded_batch(reads, refs, width=9, pad_steps_to=128)
    assert len({pr.lane for pr in mb.problems}) < len(reads)
    got = banded_nw_pallas_multi(params, multi_device_batch(mb))
    got_states = np.asarray(got.final_state)
    got_ptrs = np.asarray(got.pointers)

    assert np.allclose(np.asarray(got.score), np.asarray(ref.score)[:5],
                       rtol=1e-5, atol=1e-4)
    assert np.array_equal(got_states, ref_states[:5])
    for p in range(5):
        ops_ref = traceback(ref_ptrs, single, p, int(ref_states[p]))
        ops_got = traceback_multi(got_ptrs, mb, p, int(got_states[p]))
        assert ops_ref == ops_got
