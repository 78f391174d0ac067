"""A/B the circular-layout serving kernels on hardware, one process:

  rel          — production band-relative specialised path (baseline)
  circ         — circular layout, emission-streamed
  circ_lean    — circular layout, in-kernel emissions (stream diet)
  circ_lean @ larger B — the diet frees ~2.8GB of HBM at B=2048; check
                 whether more lanes now fit and amortise fixed costs.

Prints one JSON line per measurement.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    from __graft_entry__ import _example_batch
    from marginalign_trna_tpu.models.hmm import PairHmm
    from marginalign_trna_tpu.ops.fb import (
        circ_device_batch, device_batch, make_tables,
    )
    from marginalign_trna_tpu.ops.fb_pallas import (
        posteriors_pallas_circ, posteriors_pallas_specialised,
    )
    from marginalign_trna_tpu.parallel.runtime import with_retries

    print(json.dumps({"device": str(jax.devices()[0].device_kind),
                      "platform": jax.devices()[0].platform}), flush=True)
    read_len = int(os.environ.get("BENCH_READ_LEN", "3500"))
    reps = int(os.environ.get("BENCH_REPS", "3"))
    hmm = PairHmm.load(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "marginalign_trna_tpu", "models", "last_hmm_20.txt",
        )
    )
    tables = make_tables(hmm)

    def bench(label, cells, fn, *args):
        def run():
            logZ, post = fn(*args)
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
        except Exception as e:  # OOM at large B is an expected outcome
            print(json.dumps({"mode": label,
                              "error": type(e).__name__ + ": " + str(e)[:200]}),
                  flush=True)

    batch = _example_batch(2048, read_len, read_len, width=21, seed=1)
    cells = batch.dp_cells()

    dev = device_batch(batch)
    bench("rel_B2048", cells, posteriors_pallas_specialised, tables, dev)
    del dev

    cdev = circ_device_batch(batch)
    for mode in ("em", "lean", "ckpt"):
        bench("circ_%s_B2048" % mode, cells,
              lambda t, c, m=mode: posteriors_pallas_circ(t, c, mode=m),
              tables, cdev)
    del cdev, batch

    for nb in (3072, 4096):
        batch = _example_batch(nb, read_len, read_len, width=21, seed=1)
        cells = batch.dp_cells()
        cdev = circ_device_batch(batch)
        for mode in ("lean", "ckpt"):
            bench("circ_%s_B%d" % (mode, nb), cells,
                  lambda t, c, m=mode: posteriors_pallas_circ(t, c, mode=m),
                  tables, cdev)
        del cdev, batch


if __name__ == "__main__":
    main()
