"""Measure the anchor-split workload shape: the same total DP cells as the
serving bench (2048 reads x 3.5 kb, band 21), but split at guide anchors
into segments (reference --splitMatrixBiggerThanThis semantics) and packed
several-per-lane, which trades diagonal-count for lane-count.  Per the
round-2 probes wall(B) ~ fixed_per_diagonal + marginal x B, so fewer
diagonals at more lanes should amortise the fixed component.

Prints one JSON line per configuration.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    from marginalign_trna_tpu.models.hmm import PairHmm
    from marginalign_trna_tpu.ops.band import pack_multi_banded_batch
    from marginalign_trna_tpu.ops.fb import make_tables
    from marginalign_trna_tpu.ops.fb_pallas import (
        multi_device_batch, posteriors_pallas_multi,
    )
    from marginalign_trna_tpu.parallel.runtime import with_retries

    reps = int(os.environ.get("BENCH_REPS", "3"))
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    hmm = PairHmm.load(os.path.join(
        here, "marginalign_trna_tpu", "models", "last_hmm_20.txt"))
    tables = make_tables(hmm)
    rng = np.random.default_rng(1)

    # Total workload ~= the serving bench: 2048 x 3500bp reads.  Segments
    # approximate splitting those reads at guide anchors.
    total_reads = int(os.environ.get("SPLIT_READS", "2048"))
    read_len = 3500

    configs = ((100, 4096), (100, 8192), (350, 4096), (1750, 4096))
    for split, lanes in configs:
        n_seg = total_reads * (read_len // split)
        reads, refs = [], []
        for _ in range(n_seg):
            n = split
            ref = rng.integers(0, 4, size=n).astype(np.int8)
            read = ref.copy()
            subs = rng.random(n) < 0.10
            read[subs] = rng.integers(0, 4, size=int(subs.sum()))
            keep = rng.random(n) >= 0.05
            read = read[keep]
            ins = np.flatnonzero(rng.random(len(read)) < 0.05)
            if len(ins):
                read = np.insert(
                    read, ins + 1,
                    rng.integers(0, 4, size=len(ins)).astype(np.int8))
            reads.append(read[:n].astype(np.int8))
            refs.append(ref)
        total_diags = sum(len(a) + len(b) + 3 for a, b in zip(reads, refs))
        steps = max(2 * split + 8, int(total_diags / lanes * 1.05))
        mb = pack_multi_banded_batch(
            reads, refs, width=21, pad_steps_to=steps,
        )
        cells = mb.dp_cells()
        mdev = multi_device_batch(mb)
        label = "split%d_B%d_D%d" % (split, mb.batch, mb.num_steps)

        def run():
            logZ, post = posteriors_pallas_multi(tables, mdev)
            s = float(np.asarray(logZ).sum())
            del logZ, post
            return s

        try:
            with_retries(run, attempts=3)
            t0 = time.perf_counter()
            for _ in range(reps):
                with_retries(run, attempts=3)
            dt = (time.perf_counter() - t0) / reps
            print(json.dumps({"mode": label, "wall_ms": dt * 1e3,
                              "cells_per_sec": cells / dt}), flush=True)
        except Exception as e:
            print(json.dumps({"mode": label,
                              "error": type(e).__name__ + ": "
                              + str(e)[:200]}), flush=True)
        del mdev, mb


if __name__ == "__main__":
    main()
