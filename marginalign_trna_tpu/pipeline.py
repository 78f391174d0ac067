"""High-level one-call API for the full pipeline.

The CLI entry points (cli.py) mirror the reference's command surface; this
module is the programmatic equivalent for production embedding:

    from marginalign_trna_tpu import pipeline
    pipeline.align("reads.fq", "ref.fa", "out.sam")
    pipeline.call("out.sam", "ref.fa", "out.vcf")
    pipeline.align_and_call("reads.fq", "ref.fa", "out.sam", "out.vcf")
"""
from __future__ import annotations

import os
import tempfile
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

from .align.chain import chain_sam_file
from .align.em import EmOptions, normalise_trained_hmm, train_em
from .align.guide import GuideConfig, map_reads
from .align.realign import _jobs_from_sam, realign_sam_file
from .call.caller import CallerOptions, margin_caller
from .io.fasta import get_fasta_dictionary
from .io.sam import SamFile
from .models.hmm import PairHmm
from .utils.seq import encode


def _default_model() -> PairHmm:
    return PairHmm.load(
        os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "models", "last_hmm_20.txt",
        )
    )


@dataclass
class AlignOptions:
    no_chain: bool = False
    no_realign: bool = False
    em: bool = False
    gap_gamma: float = 0.5
    match_gamma: float = 0.0
    mapper_preset: str = "last"
    input_model: Optional[PairHmm] = None
    output_model_path: Optional[str] = None
    em_options: EmOptions = field(default_factory=EmOptions)
    em_checkpoint_path: Optional[str] = None
    # Reference realign-path --splitMatrixBiggerThanThis
    # (src/margin/marginAlignLib.py:316); 0 = exact full-length DP.
    split_size: int = 3000


def align(
    read_fastq_path: str,
    reference_fasta_path: str,
    output_sam_path: str,
    options: Optional[AlignOptions] = None,
) -> Optional[PairHmm]:
    """marginAlign equivalent; returns the trained model when em=True."""
    options = options or AlignOptions()
    cfg = GuideConfig.preset(options.mapper_preset)
    trained: Optional[PairHmm] = None

    if options.no_realign:
        if options.no_chain:
            map_reads(read_fastq_path, reference_fasta_path,
                      output_sam_path, cfg)
        else:
            with tempfile.NamedTemporaryFile(suffix=".sam") as tmp:
                map_reads(read_fastq_path, reference_fasta_path, tmp.name,
                          cfg)
                chain_sam_file(tmp.name, output_sam_path, read_fastq_path,
                               reference_fasta_path)
        return None

    hmm = options.input_model or _default_model()
    with tempfile.NamedTemporaryFile(suffix=".sam") as tmp:
        map_reads(read_fastq_path, reference_fasta_path, tmp.name, cfg)
        if options.em:
            chained = tmp.name
            tmp2 = None
            if not options.no_chain:
                tmp2 = tempfile.NamedTemporaryFile(suffix=".sam",
                                                   delete=False)
                tmp2.close()
                chain_sam_file(tmp.name, tmp2.name, read_fastq_path,
                               reference_fasta_path)
                chained = tmp2.name
            sam = SamFile.read(chained)
            refs = get_fasta_dictionary(reference_fasta_path)
            jobs = _jobs_from_sam(sam, refs, encode)
            best = train_em(jobs, options.em_options, input_hmm=hmm,
                            checkpoint_path=options.em_checkpoint_path)
            trained = normalise_trained_hmm(best.hmm)
            trained.likelihood = best.likelihood
            hmm = trained
            if options.output_model_path:
                trained.write(options.output_model_path)
            if tmp2 is not None:
                os.unlink(tmp2.name)
        realign_sam_file(
            tmp.name, output_sam_path, read_fastq_path,
            reference_fasta_path, hmm,
            gap_gamma=options.gap_gamma, match_gamma=options.match_gamma,
            no_chain=options.no_chain,
            split_size=options.split_size,
        )
    return trained


def call(
    sam_path: str,
    reference_fasta_path: str,
    output_vcf_path: str,
    alignment_model: Optional[PairHmm] = None,
    error_model: Optional[PairHmm] = None,
    options: Optional[CallerOptions] = None,
) -> List[Tuple[str, int, str, float]]:
    """marginCaller equivalent; returns the variant calls."""
    default = _default_model()
    return margin_caller(
        sam_path, reference_fasta_path, output_vcf_path,
        alignment_model=alignment_model or default,
        error_model=error_model or default,
        options=options,
    )


def align_and_call(
    read_fastq_path: str,
    reference_fasta_path: str,
    output_sam_path: str,
    output_vcf_path: str,
    align_options: Optional[AlignOptions] = None,
    caller_options: Optional[CallerOptions] = None,
) -> List[Tuple[str, int, str, float]]:
    """Full FASTQ -> SAM -> VCF pipeline.  When align_options.em is set, the
    trained model is also used for calling (the reference's integrative
    flow, tests/tests.py:189-209)."""
    trained = align(read_fastq_path, reference_fasta_path, output_sam_path,
                    align_options)
    return call(
        output_sam_path, reference_fasta_path, output_vcf_path,
        alignment_model=trained, error_model=trained,
        options=caller_options,
    )
