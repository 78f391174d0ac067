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


def realign_corpus(tmpdir):
    """Deterministic tiny SAM + fastq + ref on disk; returns paths."""
    from marginalign_trna_tpu.io.sam import SamFile, SamRecord, make_header

    rng = np.random.default_rng(77)
    bases = "ACGT"
    ref_codes = rng.integers(0, 4, 120)
    ref_seq = "".join(bases[c] for c in ref_codes)
    records = []
    for i in range(7):
        start = int(rng.integers(0, 20))
        ln = int(rng.integers(40, 80))
        read = ref_codes[start : start + ln].copy()
        subs = rng.random(ln) < 0.1
        read[subs] = rng.integers(0, 4, int(subs.sum()))
        seq = "".join(bases[c] for c in read)
        records.append(SamRecord(
            qname="r%d" % i, flag=0, rname="ref", pos=start, mapq=60,
            cigar=[(0, ln)], seq=seq, qual="*",
        ))
    os.makedirs(tmpdir, exist_ok=True)
    ref_fa = os.path.join(tmpdir, "ref.fa")
    with open(ref_fa, "w") as fh:
        fh.write(">ref\n%s\n" % ref_seq)
    fq = os.path.join(tmpdir, "reads.fq")
    with open(fq, "w") as fh:
        for r in records:
            fh.write("@%s\n%s\n+\n%s\n" % (r.qname, r.seq,
                                           "I" * len(r.seq)))
    sam_path = os.path.join(tmpdir, "in.sam")
    SamFile(make_header([("ref", 120)]), records).write(sam_path)
    return sam_path, fq, ref_fa


def realign_multihost(tmpdir):
    """Run the PRODUCTION realign path (job sharding + record all-gather,
    align.realign.realign_sam_file) and return the output SAM text."""
    from marginalign_trna_tpu.align.realign import realign_sam_file
    from marginalign_trna_tpu.models.hmm import PairHmm

    sam_path, fq, ref_fa = realign_corpus(tmpdir)
    hmm = PairHmm.load(os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "marginalign_trna_tpu", "models", "last_hmm_20.txt",
    ))
    out_sam = os.path.join(tmpdir, "out.sam")
    realign_sam_file(sam_path, out_sam, fq, ref_fa, hmm, no_chain=True,
                     split_size=0)
    with open(out_sam) as fh:
        return fh.read()


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

    sam_text = realign_multihost(out_path + ".d%d" % pid)

    with open(out_path, "w") as fh:
        json.dump(
            {
                "process_id": pid,
                "tc": np.asarray(tc).tolist(),
                "em": np.asarray(em).tolist(),
                "eg": np.asarray(eg).tolist(),
                "ll": float(ll),
                "exp": np.asarray(exp).tolist(),
                "sam": sam_text,
            },
            fh,
        )


if __name__ == "__main__":
    main()
