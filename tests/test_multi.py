"""Multi-problem lane packing: posteriors/logZ must match per-problem
single-lane runs (the short-read / tRNA production path)."""
import numpy as np

from marginalign_trna_tpu.models.hmm import PairHmm
from marginalign_trna_tpu.ops.band import (
    pack_banded_batch, pack_multi_banded_batch, path_from_cigar,
    unpack_band, unpack_problem,
)
from marginalign_trna_tpu.ops.fb import device_batch, make_tables
from marginalign_trna_tpu.ops.fb_pallas import (
    multi_device_batch, posteriors_pallas_multi,
    posteriors_pallas_specialised,
)

MODEL = "/root/reference/src/margin/mappers/last_hmm_20.txt"


def _problems(rng, count=6):
    reads, refs, paths = [], [], []
    for p in range(count):
        m = int(rng.integers(8, 40))
        n = int(rng.integers(8, 40))
        reads.append(rng.integers(0, 4, size=m).astype(np.int8))
        refs.append(rng.integers(0, 4, size=n).astype(np.int8))
        paths.append(None)
    # One with a moving band.
    reads.append(np.concatenate([refs[0][:8], refs[0][8:]]))
    refs.append(refs[0].copy())
    paths.append(None)
    return reads, refs, paths


def test_multi_pack_matches_single(rng):
    reads, refs, paths = _problems(rng)
    hmm = PairHmm.load(MODEL)
    # Normalise like serving: flat gap emissions (required by the
    # specialised kernels' folding and the multi path).
    hmm.set_flat_indel_emissions()
    tables = make_tables(hmm)

    mb = pack_multi_banded_batch(reads, refs, width=9, paths=paths,
                                 pad_steps_to=96)
    assert mb.xb.shape[0] == 96
    # Packing actually shares lanes (otherwise the test is vacuous).
    lanes = {pr.lane for pr in mb.problems}
    assert len(lanes) < len(mb.problems)

    logZ_m, post_m = posteriors_pallas_multi(tables, multi_device_batch(mb))
    logZ_m = np.asarray(logZ_m)
    post_m = np.asarray(post_m)

    for p in range(len(reads)):
        sb = pack_banded_batch([reads[p]], [refs[p]], width=9,
                               paths=[paths[p]])
        logZ_s, post_s = posteriors_pallas_specialised(
            tables, device_batch(sb)
        )
        assert np.allclose(logZ_m[p], float(np.asarray(logZ_s)[0]),
                           rtol=1e-4, atol=1e-3), p
        dense_m = unpack_problem(post_m, mb, p)
        dense_s = unpack_band(np.asarray(post_s)[:, :, 0], sb, 0)
        assert np.allclose(dense_m, dense_s, atol=3e-4), p


def test_multi_pack_geometry(rng):
    reads, refs, paths = _problems(rng, count=4)
    mb = pack_multi_banded_batch(reads, refs, width=9, paths=paths,
                                 pad_steps_to=128)
    # Problems in one lane are separated and tagged consistently.
    for p, pr in enumerate(mb.problems):
        D = pr.m + pr.n
        assert pr.final_d == pr.d0 + D
        assert mb.start[pr.d0, pr.lane] == 1
        assert mb.find[pr.final_d, pr.lane] == pr.final_d
        assert mb.fink_steps[pr.final_d, pr.lane] == pr.final_k
        assert mb.valid[pr.d0, 0, pr.lane]
    # Spacers have no valid cells.
    by_lane = {}
    for pr in mb.problems:
        by_lane.setdefault(pr.lane, []).append(pr)
    for lane, prs in by_lane.items():
        prs.sort(key=lambda q: q.d0)
        for a, b in zip(prs, prs[1:]):
            assert b.d0 - a.final_d - 1 >= 2  # SPACER
            assert not mb.valid[a.final_d + 1 : b.d0, :, lane].any()
