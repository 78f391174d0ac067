"""tRNA-scale throughput: multi-problem lane packing vs quantized lanes.

The production workload of the reference pipeline is direct tRNA reads
(~60-150 nt) against ~70-90 nt tRNA references (README.md:1-3).  Batches
quantize step counts to 1024 for compile reuse, so one-problem-per-lane
packing wastes ~5x of each lane on such reads; pack_multi_banded_batch
recovers it.  Prints one JSON line per engine: reads/s through full FB +
posterior extraction (the realign/caller hot path).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_READS = int(os.environ.get("TRNA_READS", "4096"))
READ_LEN = int(os.environ.get("TRNA_READ_LEN", "100"))
REF_LEN = int(os.environ.get("TRNA_REF_LEN", "90"))
WIDTH = 21
REPS = int(os.environ.get("TRNA_REPS", "3"))


def main():
    from marginalign_trna_tpu.models.hmm import PairHmm
    from marginalign_trna_tpu.ops.band import (
        pack_banded_batch, pack_multi_banded_batch,
    )
    from marginalign_trna_tpu.ops.fb import device_batch, make_tables
    from marginalign_trna_tpu.ops.fb_pallas import (
        multi_device_batch, posteriors_pallas_multi,
        posteriors_pallas_specialised,
    )
    from marginalign_trna_tpu.parallel.runtime import with_retries

    rng = np.random.default_rng(0)
    refs = [rng.integers(0, 4, size=REF_LEN).astype(np.int8)
            for _ in range(N_READS)]
    reads = []
    for r in refs:
        # ~12% substitutions + short indel: realistic ONT tRNA error shape.
        y = r.copy()
        subs = rng.random(REF_LEN) < 0.12
        y[subs] = (y[subs] + rng.integers(1, 4, subs.sum())) % 4
        ins = rng.integers(0, 4, size=READ_LEN - REF_LEN).astype(np.int8)
        pos = rng.integers(0, REF_LEN)
        reads.append(np.concatenate([y[:pos], ins, y[pos:]]))

    hmm = PairHmm.load(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "marginalign_trna_tpu", "models", "last_hmm_20.txt"))
    tables = make_tables(hmm)

    import jax

    # Steady-state timing: queue the whole run `depth` times, reduce every
    # output on device, sync once (per-synchronous-call dispatch costs
    # ~25ms here — benchmarks/floor_probe.py).
    depth = int(os.environ.get("PROBE_DEPTH", "6"))

    @jax.jit
    def _single_scalar(d):
        logZ, post = posteriors_pallas_specialised(tables, d)
        return logZ.sum() + post.sum()

    @jax.jit
    def _multi_scalar(d):
        logZ, post = posteriors_pallas_multi(tables, d)
        return logZ.sum() + post.sum()

    def bench_pipelined(fn, devs_list):
        def once():
            t0 = time.perf_counter()
            outs = [fn(d) for _ in range(depth) for d in devs_list]
            out = float(outs[-1])
            del outs, out
            return (time.perf_counter() - t0) / depth

        with_retries(lambda: float(fn(devs_list[0])), attempts=3)  # warm
        return min(with_retries(once, attempts=3) for _ in range(REPS))

    # Quantized single-problem lanes (the pre-multi production path),
    # chunked at its feasible lane count per batch.
    chunk = int(os.environ.get("TRNA_SINGLE_LANES", "4096"))
    devs = []
    for c0 in range(0, N_READS, chunk):
        sbatch = pack_banded_batch(reads[c0 : c0 + chunk],
                                   refs[c0 : c0 + chunk],
                                   width=WIDTH, quantize=True)
        devs.append(device_batch(sbatch))
    sb = sbatch
    dt_single = bench_pipelined(_single_scalar, devs)

    # Multi-problem lanes.
    mb = pack_multi_banded_batch(reads, refs, width=WIDTH)
    mdev = multi_device_batch(mb)
    dt_multi = bench_pipelined(_multi_scalar, [mdev])

    for name, dt, shape in (
        ("single", dt_single, sb.xb.shape),
        ("multi", dt_multi, mb.xb.shape),
    ):
        print(json.dumps({
            "metric": "trna_fb_reads_per_sec_%s" % name,
            "value": N_READS / dt,
            "unit": "reads/s (%d x %dnt vs %dnt, band %d, lanes %s)"
                    % (N_READS, READ_LEN, REF_LEN, WIDTH, str(shape)),
            "speedup_vs_single": dt_single / dt,
        }))


if __name__ == "__main__":
    main()
