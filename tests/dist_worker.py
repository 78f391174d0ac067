"""Worker process for the multi-process jax.distributed CPU test.

Launched by tests/test_parallel.py as

    python tests/dist_worker.py <port> <num_processes> <process_id> <out.json>

Each process brings up the distributed runtime against a localhost
coordinator, takes its strided share of a deterministic job list
(parallel.runtime.shard_for_host), computes the REAL EM expected-count
E-step over its share (align.em.expectation_step on the XLA CPU engine)
plus a caller-shaped [L, 4] expectation partial, all-reduces everything
with parallel.runtime.allreduce_sum_host, and writes the merged result as
JSON.  The parent asserts both processes agree with the single-process
result to f64 tolerance — this is the multi-*process* coverage SURVEY.md
§4 calls for (multi-host tests via jax.distributed), as opposed to the
multi-*device* coverage of the 8-device mesh tests.
"""
import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "")
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def make_jobs():
    """Deterministic small job set shared by workers and the parent."""
    from marginalign_trna_tpu.align.realign import RealignJob

    rng = np.random.default_rng(1234)
    jobs = []
    for _ in range(11):
        m = int(rng.integers(8, 24))
        n = int(rng.integers(8, 24))
        jobs.append(
            RealignJob(
                record=None,
                read_region=rng.integers(0, 4, m).astype(np.int8),
                ref_region=rng.integers(0, 4, n).astype(np.int8),
                path=None,
            )
        )
    return jobs


def caller_partial(indexed_jobs, L=64):
    """Caller-shaped [L, 4] f64 partial over (global_index, job) pairs,
    with magnitudes that expose any f32 rounding in the all-reduce
    transport (1e9 + 1e-7-scale terms).  Keyed by the GLOBAL job index so
    shard partials sum to the full-set partial."""
    acc = np.zeros((L, 4), np.float64)
    for k, j in indexed_jobs:
        for i, c in enumerate(j.read_region):
            acc[(7 * k + i) % L, int(c)] += 1e9 if i == 0 else 1.23e-7 * (
                i + 1
            )
    return acc


def local_counts(jobs):
    from marginalign_trna_tpu.align.em import (
        expectation_step, prepare_em_batches,
    )
    from marginalign_trna_tpu.models.hmm import PairHmm

    hmm = PairHmm.random(seed=9)
    batches = prepare_em_batches(jobs, band_width=16)
    return expectation_step(batches, hmm)


def main():
    port, nproc, pid, out_path = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    from marginalign_trna_tpu.parallel.runtime import (
        allreduce_sum_host, initialize_distributed, shard_for_host,
    )

    initialize_distributed("localhost:%s" % port, nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()

    jobs = make_jobs()
    indexed = shard_for_host(list(enumerate(jobs)))
    mine = [j for _, j in indexed]
    tc, em, eg, ll = local_counts(mine)
    exp = caller_partial(indexed)
    tc, em, eg, ll, exp = allreduce_sum_host(tc, em, eg, ll, exp)

    with open(out_path, "w") as fh:
        json.dump(
            {
                "process_id": pid,
                "tc": np.asarray(tc).tolist(),
                "em": np.asarray(em).tolist(),
                "eg": np.asarray(eg).tolist(),
                "ll": float(ll),
                "exp": np.asarray(exp).tolist(),
            },
            fh,
        )


if __name__ == "__main__":
    main()
