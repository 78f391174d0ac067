"""marginCaller tests: synthetic ground truth + reference fixtures."""
import os

import numpy as np
import pytest

from marginalign_trna_tpu.call.caller import (
    CallerOptions, calc_base_posterior_probs, margin_caller,
)
from marginalign_trna_tpu.io.sam import SamFile
from marginalign_trna_tpu.io.vcf import vcf_read
from marginalign_trna_tpu.models.hmm import PairHmm

MODEL = "/root/repo/marginalign_trna_tpu/models/last_hmm_20.txt"


def test_calc_base_posterior_probs_uniform():
    hmm = PairHmm.load(MODEL)
    err = hmm.substitution_matrix()
    # All observations = C against ref A: C should dominate.
    obs = np.array([0.0, 1.0, 0.0, 0.0])
    probs = calc_base_posterior_probs(obs, "A", err)
    assert probs.argmax() == 1
    assert np.isclose(probs.sum(), 1.0)


def _load_mutations(fixtures_dir):
    """Expected ALT at each mutated site is the ORIGINAL reference base
    (column 3): reads derive from the unmutated reference, so that's the
    variant seen against the mutated one.  Matches the reference's
    validateVcf which takes x[2] (tests/tests.py:66-67)."""
    muts = set()
    with open(os.path.join(fixtures_dir, "mutations.txt")) as fh:
        for line in fh:
            name, pos, original, _mutated = line.split()
            muts.add((name, int(pos) + 1, original.upper()))
    return muts


@pytest.mark.parametrize("no_margin", [True, False])
def test_caller_on_mutated_reference(fixtures_dir, tmp_path, no_margin):
    """Call SNVs from the pre-aligned reads against the mutated reference
    and measure precision/recall against the known 542 mutations, like the
    reference's validateVcf (tests/tests.py:62-78)."""
    sam_path = os.path.join(fixtures_dir, "inputBigMutations.sam")
    if not no_margin:
        # Margin mode runs the full FB; trim to a subset for test speed.
        sam = SamFile.read(sam_path)
        sam.records = sam.records[:6]
        sam_path = str(tmp_path / "subset.sam")
        sam.write(sam_path)
    out = str(tmp_path / "out.vcf")
    hmm = PairHmm.load(MODEL)
    calls = margin_caller(
        sam_path,
        os.path.join(fixtures_dir, "referencesMutated.fa"),
        out,
        alignment_model=hmm,
        error_model=hmm,
        options=CallerOptions(no_margin=no_margin),
    )
    assert calls, "no variants called"
    known = _load_mutations(fixtures_dir)
    imputed = vcf_read(out)
    inter = len(known & imputed)
    precision = inter / len(imputed)
    recall = inter / len(known)
    # The reference logs, never asserts; we enforce sane floors.
    assert precision > 0.5, (precision, recall)
    if no_margin:
        assert recall > 0.3, (precision, recall)


def test_caller_bucket_pipeline_matches_multi(fixtures_dir, tmp_path,
                                              monkeypatch):
    """The pipelined bucket-window path (multi-packing off, tiny
    max_batch_cells so several buckets stay in flight and the drain loop
    runs) calls the same variants as the multi-problem-lane path."""
    sam = SamFile.read(os.path.join(fixtures_dir, "inputBigMutations.sam"))
    sam.records = sam.records[:6]
    sam_path = str(tmp_path / "subset.sam")
    sam.write(sam_path)
    hmm = PairHmm.load(MODEL)
    ref = os.path.join(fixtures_dir, "referencesMutated.fa")

    out_multi = str(tmp_path / "multi.vcf")
    calls_multi = margin_caller(sam_path, ref, out_multi,
                                alignment_model=hmm, error_model=hmm)

    monkeypatch.setenv("MARGINALIGN_MULTI", "off")
    out_bucket = str(tmp_path / "bucket.vcf")
    calls_bucket = margin_caller(
        sam_path, ref, out_bucket, alignment_model=hmm, error_model=hmm,
        options=CallerOptions(max_batch_cells=200_000),
    )
    assert {(c[0], c[1], c[2]) for c in calls_bucket} == {
        (c[0], c[1], c[2]) for c in calls_multi
    }


def test_vcf_writer_round_trip_assert(fixtures_dir, tmp_path):
    """margin_caller itself asserts the vcfWrite/vcfRead round trip
    (reference: marginCallerLib.py:219-222); reaching here means it held."""
    sam = SamFile.read(os.path.join(fixtures_dir, "inputBigMutations.sam"))
    sam.records = sam.records[:2]
    sam_path = str(tmp_path / "two.sam")
    sam.write(sam_path)
    out = str(tmp_path / "out.vcf")
    hmm = PairHmm.load(MODEL)
    margin_caller(
        sam_path, os.path.join(fixtures_dir, "referencesMutated.fa"), out,
        alignment_model=hmm, error_model=hmm,
        options=CallerOptions(no_margin=True),
    )
    assert os.path.exists(out)
    with open(out) as fh:
        head = fh.read(200)
    assert head.startswith("##fileformat=VCFv4.2")
