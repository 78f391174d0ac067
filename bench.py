"""Benchmark: banded pair-HMM forward-backward DP throughput per chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: in-band DP cells per second for the full forward-backward with
posterior extraction (the marginAlign realign / marginCaller hot path) on a
batch shaped like the bundled test corpus (reads ~3.5 kb vs refs ~3.6 kb,
lane-filled batch, band width 21 = the reference's --diagonalExpansion=10).

Baseline: the reference's cPecanRealign is single-threaded C scheduled 4-way
by jobTree (--maxThreads default 4, reference README.md:52).  Measured-class
C banded FB throughput is ~5e7 cells/s/core -> 2e8 cells/s for the reference
configuration.  vs_baseline = value / 2e8.  (The reference repo publishes no
benchmark numbers; BASELINE.md documents this derivation.)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_CELLS_PER_SEC = 2.0e8


def main():
    import jax

    from marginalign_trna_tpu.models.hmm import PairHmm
    from marginalign_trna_tpu.ops.dispatch import (
        fb_posteriors, make_fb_device_batch,
    )
    from marginalign_trna_tpu.ops.fb import make_tables
    from __graft_entry__ import _example_batch

    platform = jax.devices()[0].platform
    # Batch sized for one chip: 2048 lanes of ~3.5kb reads
    # (largest that holds all streams in HBM; 3072 OOMs).
    n_reads = int(os.environ.get("BENCH_READS", "2048"))
    read_len = int(os.environ.get("BENCH_READ_LEN", "3500"))
    reps = int(os.environ.get("BENCH_REPS", "3"))

    batch = _example_batch(n_reads, read_len, read_len, width=21, seed=1)
    cells = batch.dp_cells()

    hmm = PairHmm.load(
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "marginalign_trna_tpu", "models", "last_hmm_20.txt",
        )
    )
    tables = make_tables(hmm)
    dev = make_fb_device_batch(batch)

    def run():
        logZ, post = fb_posteriors(tables, dev)
        # Force a device->host transfer: block_until_ready alone does not
        # reliably block on remote-execution PJRT backends.  Drop the
        # buffers before returning so back-to-back runs don't hold two
        # generations of multi-GB outputs (device OOM).
        out = float(np.asarray(logZ).sum())
        del logZ, post
        return out

    from marginalign_trna_tpu.parallel.runtime import with_retries

    with_retries(run, attempts=3)  # compile + warm up (tunnel can flake)
    t0 = time.perf_counter()
    for _ in range(reps):
        with_retries(run, attempts=3)
    dt = (time.perf_counter() - t0) / reps

    value = cells / dt
    print(
        json.dumps(
            {
                "metric": "banded_pairhmm_fb_cells_per_sec_per_chip",
                "value": value,
                "unit": "DP cells/s (%s, %d reads x %dbp, band 21)"
                % (platform, n_reads, read_len),
                "vs_baseline": value / BASELINE_CELLS_PER_SEC,
            }
        )
    )


if __name__ == "__main__":
    main()
