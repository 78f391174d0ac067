"""Scale benchmark: EM + caller throughput on a synthetic read set
(BASELINE config 5 shape: "full pipeline at scale").

Generates a large synthetic nanopore-like corpus against the bundled
references, then measures:
  - EM E-step throughput (reads/s and DP cells/s) via the mesh-sharded
    train step with psum merges;
  - caller posterior-accumulation throughput.

Run on TPU (default platform) or a virtual CPU mesh:
  python benchmarks/scale.py --reads 512 --devices 1
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python benchmarks/scale.py --reads 64 --devices 8 --cpu
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--reads", type=int, default=512)
    p.add_argument("--read-len", type=int, default=3500)
    p.add_argument("--devices", type=int, default=1)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    if args.cpu:
        os.environ.setdefault(
            "XLA_FLAGS", "--xla_force_host_platform_device_count=%d"
            % args.devices
        )
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from __graft_entry__ import _example_batch
    from marginalign_trna_tpu.models.hmm import PairHmm
    from marginalign_trna_tpu.ops.fb import device_batch, make_tables
    from marginalign_trna_tpu.parallel.mesh import (
        make_data_mesh, make_em_train_step, pad_batch_lanes,
    )

    devices = jax.devices()[: args.devices]
    mesh = make_data_mesh(devices)
    hmm = PairHmm.load(
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "marginalign_trna_tpu", "models", "last_hmm_20.txt",
        )
    )

    batch = pad_batch_lanes(
        _example_batch(args.reads, args.read_len, args.read_len, width=21,
                       seed=7),
        len(devices),
    )
    dev = device_batch(batch)
    cells = batch.dp_cells()

    step = make_em_train_step(mesh)
    t = jax.numpy.asarray(hmm.transitions, jax.numpy.float32)
    e = jax.numpy.asarray(hmm.emissions, jax.numpy.float32)
    tables = make_tables(hmm)

    res = step(tables, t, e, dev)  # compile + warm
    np.asarray(res.log_likelihood)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        res = step(tables, t, e, dev)
        np.asarray(res.log_likelihood)
    dt = (time.perf_counter() - t0) / args.iters

    print(json.dumps({
        "metric": "em_estep_reads_per_sec",
        "value": args.reads / dt,
        "unit": "reads/s (%d devices, %d x %dbp, %.3g DP cells/s)"
        % (len(devices), args.reads, args.read_len, cells / dt),
        "devices": len(devices),
        "dp_cells_per_sec": cells / dt,
    }))

    # Production realign path under multi-device round-robin dispatch
    # (align.realign bucket loop; MARGINALIGN_LOCAL_DEVICES caps it).
    from marginalign_trna_tpu.align.realign import (
        RealignJob, realigned_ops_for_jobs,
    )
    from marginalign_trna_tpu.ops.band import path_from_cigar

    rng = np.random.default_rng(7)
    jobs = []
    for _ in range(args.reads):
        ref = rng.integers(0, 4, size=args.read_len).astype(np.int8)
        read = ref.copy()
        subs = rng.random(args.read_len) < 0.1
        read[subs] = rng.integers(0, 4, size=int(subs.sum()))
        jobs.append(RealignJob(
            record=None, read_region=read, ref_region=ref,
            path=path_from_cigar([(0, args.read_len)]),
        ))
    os.environ["MARGINALIGN_LOCAL_DEVICES"] = str(args.devices)
    cells_per_job = 2 * args.read_len * 21
    realigned_ops_for_jobs(jobs, hmm, 0.5, 0.0)  # compile + warm
    t0 = time.perf_counter()
    for _ in range(args.iters):
        realigned_ops_for_jobs(jobs, hmm, 0.5, 0.0)
    dt = (time.perf_counter() - t0) / args.iters
    print(json.dumps({
        "metric": "realign_reads_per_sec",
        "value": args.reads / dt,
        "unit": "reads/s (%d devices round-robin, %d x %dbp, band 21)"
        % (args.devices, args.reads, args.read_len),
        "devices": args.devices,
        "dp_cells_per_sec": args.reads * cells_per_job / dt,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
