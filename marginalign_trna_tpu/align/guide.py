"""TPU-native guide alignment: k-mer seeding + chaining + banded Viterbi.

Replaces the reference's external seed mappers (LAST default, BWA and
minimap2 optional; src/margin/mappers/{last,bwa,minimap2}.py) with an
in-process pipeline:

  1. host: exact k-mer index of the references (tiny for tRNA-scale refs);
  2. host: seed hits per read and strand, colinear chaining (the same role
     as LAST's seed-and-extend / minimap2's chaining);
  3. device: banded affine Viterbi (ops/nw.py) of each read against its
     chain corridor, batched over all reads;
  4. host: traceback -> SAM records (primary alignment per read, like
     minimap2 -N 0; reference src/margin/mappers/minimap2.py:6).

Mapper "presets" mirror the reference's CLI surface with behaviorally
distinct seeding/scoring per mapper (GuideConfig.preset):

  last      exact 13-mer seeds, default scoring — the LAST-style default
            (src/margin/mappers/last.py:24-26, `-s 2 -T 0 -Q 0 -a 1`).
  bwa       short exact 8-mer seeds, unit-cost gap scoring, and chains
            covering fewer than 15 read bases discarded — bwa mem's ONT
            preset `-W 15 -k 8 -x ont2d` (src/margin/mappers/bwa.py:6).
  minimap2  (15,10)-minimizer sampling with map-ont scoring, primary
            alignment only — `-ax map-ont -N 0`
            (src/margin/mappers/minimap2.py:6-9).

Measured per-preset guide quality on the reference's own per-mapper
fixtures is recorded in docs/PARITY.md.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..io.fasta import get_fasta_dictionary
from ..io.fastq import fastq_read
from ..io.sam import SamFile, SamRecord, make_header
from ..ops import band as band_mod
from ..ops.band import pack_banded_batch
from ..ops.fb import device_batch
from ..ops.nw import NwParams, banded_nw_auto, traceback
from ..utils.seq import encode, revcomp_codes, reverse_complement


@dataclass
class GuideConfig:
    k: int = 13
    max_hits_per_kmer: int = 64
    max_chain_gap: int = 500
    max_diag_drift: int = 120
    # Guide Viterbi band half-window.  Width-sensitivity A/B on the
    # reference fixtures (reads.fq vs referencesMutated.fa, round 5):
    # mean identity 0.5475 / 0.5466 / 0.5464 / 0.5459 at 64/48/40/32 —
    # flat to ~0.002 — while pointer-pull bytes (the guide's D2H wall on
    # the ~30MB/s tunnel) scale ~linearly with width.  40 keeps margin
    # over the real-mapper fixture bar (0.527) at 2/3 the transfer.
    band_width: int = 40
    edge_pad: int = 32
    max_seeds_for_chaining: int = 1500
    # (w,k)-minimizer sampling window; 0 = index/query every k-mer.
    minimizer_w: int = 0
    # Discard candidates whose chain covers fewer read bases than this
    # (bwa mem -W analog).
    min_seeded_bases: int = 0
    nw: NwParams = field(default_factory=NwParams)

    @staticmethod
    def preset(name: str) -> "GuideConfig":
        """Behaviorally distinct mapper presets (see module docstring):
        'last' = exact 13-mer seeds + default scoring; 'bwa' = bwa mem
        `-W 15 -k 8 -x ont2d` (short seeds, unit gap costs, 15-base
        chain-coverage floor; src/margin/mappers/bwa.py:6); 'minimap2' =
        `-ax map-ont -N 0` ((15,10) minimizers, map-ont A2/B4/O4/E2
        scoring; src/margin/mappers/minimap2.py:6)."""
        if name == "bwa":
            return GuideConfig(
                k=8, max_hits_per_kmer=32, min_seeded_bases=15,
                nw=NwParams(match=1.0, mismatch=-1.0, gap_open=-1.0,
                            gap_extend=-1.0),
            )
        if name == "minimap2":
            return GuideConfig(
                k=15, minimizer_w=10,
                nw=NwParams(match=2.0, mismatch=-4.0, gap_open=-4.0,
                            gap_extend=-2.0),
            )
        return GuideConfig()


def _kmer_values(codes: np.ndarray, k: int) -> np.ndarray:
    """Packed k-mer integer per position (-1 where the window contains N)."""
    L = len(codes)
    if L < k:
        return np.empty(0, dtype=np.int64)
    vals = np.zeros(L - k + 1, dtype=np.int64)
    bad = np.zeros(L - k + 1, dtype=bool)
    for t in range(k):
        window = codes[t : L - k + 1 + t].astype(np.int64)
        vals = vals * 4 + np.clip(window, 0, 3)
        bad |= window >= 4
    vals[bad] = -1
    return vals


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer: a well-mixed hash so minimizer selection is
    not biased toward lexicographically small (poly-A) k-mers."""
    x = x + np.uint64(0x9E3779B97F4A7C15)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def _minimizer_positions(vals: np.ndarray, w: int) -> np.ndarray:
    """Indices of (w,k)-minimizers: the minimum hashed k-mer of every
    window of w consecutive k-mers (minimap2's sampling scheme)."""
    L = len(vals)
    if L == 0:
        return np.empty(0, dtype=np.int64)
    if w <= 1 or L <= w:
        return np.arange(L, dtype=np.int64) if w <= 1 else np.array(
            [int(np.argmin(_mix64(vals.astype(np.uint64))))], np.int64
        )
    h = _mix64(vals.astype(np.uint64))
    h = np.where(vals < 0, np.uint64(0xFFFFFFFFFFFFFFFF), h)
    from numpy.lib.stride_tricks import sliding_window_view

    wins = sliding_window_view(h, w)
    pos = wins.argmin(axis=1) + np.arange(L - w + 1, dtype=np.int64)
    return np.unique(pos)


class KmerIndex:
    """Exact k-mer (optionally (w,k)-minimizer-sampled) index over the
    (forward-strand) reference sequences.

    Sorted-array layout: one flat (kmer value, ref, pos) table sorted by
    value; queries are a batch searchsorted join.  The round-4 dict
    (~per-k-mer-position Python loop) cost ~0.18 s/read on 3.5 kb reads
    — the larger half of the end-to-end wall (the reference's LAST does
    this in compiled C, src/margin/mappers/last.py:24-26)."""

    def __init__(self, refs: Dict[str, str], k: int, minimizer_w: int = 0):
        self.k = k
        self.minimizer_w = minimizer_w
        self.ref_names = list(refs.keys())
        self.ref_codes = [encode(refs[n]) for n in self.ref_names]
        vals_l, ri_l, pos_l = [], [], []
        for ri, codes in enumerate(self.ref_codes):
            vals = _kmer_values(codes, k)
            if minimizer_w > 1:
                positions = _minimizer_positions(vals, minimizer_w)
            else:
                positions = np.arange(len(vals), dtype=np.int64)
            v = vals[positions]
            keep = v >= 0
            vals_l.append(v[keep])
            ri_l.append(np.full(int(keep.sum()), ri, dtype=np.int32))
            pos_l.append(positions[keep])
        v = np.concatenate(vals_l) if vals_l else np.empty(0, np.int64)
        ri_a = np.concatenate(ri_l) if ri_l else np.empty(0, np.int32)
        pos_a = np.concatenate(pos_l) if pos_l else np.empty(0, np.int64)
        order = np.argsort(v, kind="stable")
        self._vals = v[order]
        self._ri = ri_a[order]
        self._pos = pos_a[order].astype(np.int64)
        self.n_refs = len(self.ref_names)
        # Direct-address presence table: only ~6% of noisy-read k-mers
        # exist in the reference at all, and the searchsorted calls were
        # ~60% of the seeding wall — one vectorised bool gather drops
        # the guaranteed misses first (identical results; cnt==0 rows
        # were filtered anyway).  4^13 bools = 67MB; skipped for k > 13.
        self._present: Optional[np.ndarray] = None
        if k <= 13 and len(self._vals):
            self._present = np.zeros(4 ** k, dtype=bool)
            self._present[self._vals] = True

    def hits(self, read_codes: np.ndarray, max_per_kmer: int):
        """-> per-ref dict {ref_idx: (qpos array, rpos array)}.

        Semantics match the reference-era dict walk: k-mers whose total
        occurrence count across all references exceeds max_per_kmer are
        dropped (repeat masking, like LAST's -m / minimap2's -f)."""
        out: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
        vals = _kmer_values(read_codes, self.k)
        if self.minimizer_w > 1:
            positions = _minimizer_positions(vals, self.minimizer_w)
        else:
            positions = np.arange(len(vals), dtype=np.int64)
        q = vals[positions]
        keep = q >= 0
        q = q[keep]
        qpos = positions[keep]
        if not len(q) or not len(self._vals):
            return out
        if self._present is not None:
            pf = self._present[q]
            q = q[pf]
            qpos = qpos[pf]
            if not len(q):
                return out
        left = np.searchsorted(self._vals, q, side="left")
        right = np.searchsorted(self._vals, q, side="right")
        cnt = right - left
        ok = (cnt > 0) & (cnt <= max_per_kmer)
        if not ok.any():
            return out
        l, c, qp = left[ok], cnt[ok], qpos[ok]
        # Expand each query's [l, l+c) run into flat table indices.
        ends = np.cumsum(c)
        total = int(ends[-1])
        offs = np.arange(total, dtype=np.int64) - np.repeat(ends - c, c)
        eidx = np.repeat(l, c) + offs
        out_q = np.repeat(qp, c)
        ris = self._ri[eidx]
        rpos = self._pos[eidx]
        if self.n_refs == 1:
            return {0: (out_q, rpos)}
        order = np.argsort(ris, kind="stable")
        ris_s = ris[order]
        bounds = np.searchsorted(ris_s, np.arange(self.n_refs + 1))
        for ri in np.unique(ris_s):
            s, e = bounds[ri], bounds[ri + 1]
            sel = order[s:e]
            out[int(ri)] = (out_q[sel], rpos[sel])
        return out


def chain_seeds(
    hits, cfg: GuideConfig
) -> Tuple[List[Tuple[int, int]], int]:
    """Best colinear chain of seed hits (strictly increasing in read and
    ref, bounded gap and diagonal drift).  O(h^2) DP like the reference's
    segment chaining (marginAlignLib.py:129-145), but over k-mer seeds.

    hits: either [(qpos, rpos), ...] or a (qpos array, rpos array) pair
    (the KmerIndex.hits batch output)."""
    if isinstance(hits, tuple):
        q0, r0 = hits
        if not len(q0):
            return [], 0
        # Dedup + sort by (rpos, qpos), vectorised.
        order = np.lexsort((q0, r0))
        q0, r0 = q0[order], r0[order]
        uniq = np.concatenate(
            [[True], (np.diff(q0) != 0) | (np.diff(r0) != 0)]
        )
        q, r = q0[uniq], r0[uniq]
        if len(q) > cfg.max_seeds_for_chaining:
            sel = (
                np.arange(cfg.max_seeds_for_chaining, dtype=np.float64)
                * (len(q) / cfg.max_seeds_for_chaining)
            ).astype(np.int64)
            q, r = q[sel], r[sel]
    else:
        if not hits:
            return [], 0
        hits = sorted(set(hits), key=lambda h: (h[1], h[0]))
        if len(hits) > cfg.max_seeds_for_chaining:
            stride = len(hits) / cfg.max_seeds_for_chaining
            hits = [hits[int(i * stride)]
                    for i in range(cfg.max_seeds_for_chaining)]
        q = np.array([x[0] for x in hits])
        r = np.array([x[1] for x in hits])
    h = len(q)

    from .. import native as _native

    idx = _native.chain_seeds(
        q, r, 2 * cfg.max_chain_gap, cfg.max_diag_drift
    )
    if idx is not None:
        chain = [(int(q[i]), int(r[i])) for i in idx]
        return chain, len(chain)

    score = np.ones(h, dtype=np.int64)
    parent = np.full(h, -1, dtype=np.int64)
    for i in range(h):
        dq = q[i] - q[:i]
        dr = r[i] - r[:i]
        ok = (
            (dq > 0)
            & (dr > 0)
            & (dq + dr <= 2 * cfg.max_chain_gap)
            & (np.abs(dq - dr) <= cfg.max_diag_drift)
        )
        if ok.any():
            cand = np.where(ok, score[:i], 0)
            j = int(np.argmax(cand))
            if cand[j] + 1 > score[i]:
                score[i] = cand[j] + 1
                parent[i] = j
    best = int(np.argmax(score))
    chain = []
    while best >= 0:
        chain.append((int(q[best]), int(r[best])))
        best = int(parent[best])
    chain.reverse()
    return chain, int(score.max())


@dataclass
class _Candidate:
    read_name: str
    seq: str              # SEQ as it will appear in SAM (revcomp'd if reverse)
    ref_idx: int
    is_reverse: bool
    window_start: int
    window_end: int
    chain: List[Tuple[int, int]]  # (qpos, rpos) in seq/ref-forward coords
    score: int


def _corridor(
    chain: List[Tuple[int, int]], m: int, ref_len: int, cfg: GuideConfig
) -> Tuple[int, int]:
    q0, r0 = chain[0]
    q1, r1 = chain[-1]
    pad0 = cfg.edge_pad + q0 // 4
    pad1 = cfg.edge_pad + (m - q1 - cfg.k) // 4
    ws = max(0, r0 - q0 - pad0)
    we = min(ref_len, r1 + cfg.k + (m - q1 - cfg.k) + pad1)
    return ws, we


def map_reads(
    read_fastq_path: str,
    reference_fasta_path: str,
    output_sam_path: str,
    cfg: Optional[GuideConfig] = None,
) -> None:
    """Map all reads, emitting a guide SAM (primary alignment per read).

    This is the 'mapper.run()' stage of the reference pipeline
    (e.g. Last.run, src/margin/mappers/last.py:6-26), including its
    hand-built @SQ header.
    """
    cfg = cfg or GuideConfig()
    refs = get_fasta_dictionary(reference_fasta_path)
    index = KmerIndex(refs, cfg.k, cfg.minimizer_w)
    header = make_header([(n, len(refs[n])) for n in index.ref_names])

    candidates: List[_Candidate] = []
    for name, seq, _ in fastq_read(read_fastq_path):
        name = name.split()[0]
        cand = _best_candidate(name, seq, index, cfg)
        if cand is not None:
            candidates.append(cand)

    records = align_candidates(candidates, index, cfg)
    SamFile(header, records).write(output_sam_path)


def _chain_coverage(chain: List[Tuple[int, int]], k: int) -> int:
    """Read bases covered by the chain's seeds (union of [q, q+k))."""
    covered = 0
    last_end = -1
    for q, _ in chain:
        s = max(q, last_end)
        e = q + k
        if e > s:
            covered += e - s
            last_end = e
    return covered


def _best_candidate(
    name: str, seq: str, index: KmerIndex, cfg: GuideConfig
) -> Optional[_Candidate]:
    codes_f = encode(seq)
    codes_r = revcomp_codes(codes_f)
    best: Optional[_Candidate] = None
    for is_reverse, codes, oriented_seq in (
        (False, codes_f, seq),
        (True, codes_r, reverse_complement(seq)),
    ):
        per_ref = index.hits(codes, cfg.max_hits_per_kmer)
        for ri, hits in per_ref.items():
            chain, score = chain_seeds(hits, cfg)
            if not chain:
                continue
            if cfg.min_seeded_bases and _chain_coverage(
                chain, cfg.k
            ) < cfg.min_seeded_bases:
                continue  # bwa mem -W: too little seeded support
            if best is None or score > best.score:
                ws, we = _corridor(
                    chain, len(codes), len(index.ref_codes[ri]), cfg
                )
                best = _Candidate(
                    read_name=name, seq=oriented_seq, ref_idx=ri,
                    is_reverse=is_reverse, window_start=ws, window_end=we,
                    chain=chain, score=score,
                )
    return best


MULTI_MAX_GUIDE_STEPS = 512  # multi-pack lanes when every problem fits this


def _use_multi_guide(sizes: List[int]) -> bool:
    """Multi-problem lane packing policy for the guide stage.  OFF by
    default since round 3 (like realign/caller/EM): single-problem lanes
    with ladder step quantization reuse compiles across calls and the
    multi kernels' per-step machinery measured far slower than the step
    padding it recovers.  MARGINALIGN_MULTI=on re-enables."""
    import os as _os

    return _os.environ.get("MARGINALIGN_MULTI", "") == "on"


def align_candidates(
    candidates: List[_Candidate], index: KmerIndex, cfg: GuideConfig
) -> List[SamRecord]:
    """Batched banded Viterbi over all candidates -> SAM records."""
    if not candidates:
        return []
    reads, windows, paths = [], [], []
    for c in candidates:
        read_codes = encode(c.seq)
        win = index.ref_codes[c.ref_idx][c.window_start : c.window_end]
        reads.append(read_codes)
        windows.append(win)
        # Prefix-coordinate anchors: (0,0), seed starts, (m, n).
        m, n = len(read_codes), len(win)
        pd, pi = [0], [0]
        for qpos, rpos in c.chain:
            i = qpos + 1
            j = rpos - c.window_start + 1
            d = i + j
            if d > pd[-1] and i >= pi[-1] and d < m + n:
                pd.append(d)
                pi.append(i)
        pd.append(m + n)
        pi.append(m)
        paths.append((np.asarray(pd), np.asarray(pi)))

    params = jnp.asarray(
        [cfg.nw.match, cfg.nw.mismatch, cfg.nw.gap_open, cfg.nw.gap_extend],
        jnp.float32,
    )

    sizes = [len(r) + len(w) + 1 for r, w in zip(reads, windows)]
    if _use_multi_guide(sizes):
        from ..ops.band import pack_multi_banded_batch
        from ..ops.fb_pallas import multi_device_batch
        from ..ops.nw import traceback_multi
        from ..ops.wavefront_pallas import banded_nw_pallas_multi
        from ..parallel.runtime import with_retries

        mb = pack_multi_banded_batch(
            reads, windows, width=cfg.band_width, paths=paths
        )
        res = with_retries(
            lambda: banded_nw_pallas_multi(params, multi_device_batch(mb))
        )
        pointers = np.asarray(res.pointers)
        final_states = np.asarray(res.final_state)
        records = []
        for p, c in enumerate(candidates):
            ops = traceback_multi(pointers, mb, p, int(final_states[p]))
            rec = _ops_to_record(c, ops, index)
            if rec is not None:
                records.append(rec)
        return records

    from ..ops.dispatch import (
        use_compact_streams, use_device_traceback as _use_device_tb,
        use_pallas,
    )

    if use_pallas() and use_compact_streams():
        # Compact device path: host packs only sequences + band offsets;
        # the rel code windows expand on device, masks derive from the
        # lo stream, and the NW pointers come back 4-bit packed (D2H on
        # the remote tunnel measures ~30MB/s — the unpacked pointer pull
        # was half the guide wall).  Candidates run in size-sorted
        # buckets, pipelined with async host copies so pointer pulls
        # overlap later buckets' device compute, and buckets round-robin
        # across local devices like the realign path.
        import os as _os

        import jax

        from .. import native as _native
        from ..ops.band import band_masks_device, pack_compact_batch
        from ..ops.fb import DeviceBatch as _DeviceBatch
        from ..ops.fb_pallas import (
            STEP_BLOCK, compact_device_batch, expand_rel_codes,
        )
        from ..ops.wavefront_pallas import banded_nw_pallas
        from ..parallel.runtime import local_dispatch_devices, with_retries

        devices = local_dispatch_devices()
        # One bucket per local device by default: measured on the axon
        # tunnel, copy_to_host_async pulls do NOT overlap device compute
        # (4-bucket pipelining at N=1024 was ~10% slower than one
        # batch), so finer bucketing only pays when it feeds more chips.
        default_lanes = max(1, -(-len(candidates) // max(1, len(devices))))
        # Cap at 2048 real lanes: the lane ladder is strict pow2, so
        # 2049+ pads to 4096, where the width-40 NW kernel exceeds its
        # scoped-VMEM budget (85MB needed vs the 64MB floor — a large
        # corpus crashed the guide stage outright, e2e N=4096 probe
        # round 5) and monotone_gather hits its VMEM cliff.
        default_lanes = min(default_lanes, 2048)
        max_lanes = int(_os.environ.get("MARGINALIGN_GUIDE_BUCKET",
                                        str(default_lanes)))
        order = sorted(range(len(candidates)),
                       key=lambda i: len(reads[i]) + len(windows[i]))
        buckets = [order[i : i + max_lanes]
                   for i in range(0, len(order), max_lanes)]

        def _dispatch(bidx, device):
            comp = pack_compact_batch(
                [reads[i] for i in bidx], [windows[i] for i in bidx],
                width=cfg.band_width, paths=[paths[i] for i in bidx],
                quantize=True,
            )
            d1k = -(-comp.num_steps // STEP_BLOCK) * STEP_BLOCK
            comp_dev = compact_device_batch(comp, device)
            xb, yb = expand_rel_codes(comp_dev, d1k)
            valid, s1, s2 = band_masks_device(
                comp_dev.lo, comp_dev.m, comp_dev.n, comp.width, comp.wp
            )
            dev = _DeviceBatch(
                xb=xb[: comp.num_steps], yb=yb[: comp.num_steps],
                valid=valid, s1=s1, s2=s2,
                final_d=jnp.asarray(comp.final_d),
                final_k=jnp.asarray(comp.final_k),
            )
            if _use_device_tb():
                # Traceback ON DEVICE: only the [ceil(D1/4), B] 2-bit
                # move stream crosses the tunnel (~40x fewer bytes than
                # the 4-bit pointer band at width 40; D2H is ~30MB/s).
                from ..ops.traceback_device import (
                    nw_moves_device, pack_moves,
                )

                res = banded_nw_pallas(params, dev)
                mv = pack_moves(nw_moves_device(
                    res.pointers[: comp.num_steps], comp_dev.lo,
                    comp_dev.m, comp_dev.n, res.final_state,
                ))
                if hasattr(mv, "copy_to_host_async"):
                    mv.copy_to_host_async()
                return comp, mv, None
            res = banded_nw_pallas(params, dev, pack_bits=4)
            for a in (res.pointers, res.final_state):
                if hasattr(a, "copy_to_host_async"):
                    a.copy_to_host_async()
            return comp, res.pointers, res.final_state

        pending = []
        for bi, bidx in enumerate(buckets):
            dev_t = devices[bi % len(devices)] if len(devices) > 1 else None
            run = lambda b=bidx, d=dev_t: _dispatch(b, d)
            pending.append((bidx, run, with_retries(run)))

        ops_by_cand: List[Optional[List[Tuple[int, int]]]] = (
            [None] * len(candidates)
        )
        for bidx, run, res in pending:
            # Materialise under retry WITH re-dispatch: transient tunnel
            # failures surface at the async D2H pull, after the enqueue
            # already succeeded (same holder pattern as realign's
            # _drain_one).
            holder = [res]

            def _materialise():
                if holder[0] is None:
                    holder[0] = run()
                comp_, ptr_, fs_ = holder[0]
                try:
                    return (
                        comp_,
                        np.ascontiguousarray(np.asarray(ptr_)),
                        None if fs_ is None else np.asarray(fs_),
                    )
                except Exception:
                    holder[0] = None
                    raise

            comp, ptr_host, fs_dev = with_retries(_materialise)
            if fs_dev is None:
                from ..ops.traceback_device import (
                    ops_from_moves, unpack_moves,
                )

                moves = unpack_moves(ptr_host, comp.num_steps - 1)
                for local_b, i in enumerate(bidx):
                    ops_by_cand[i] = ops_from_moves(moves, local_b)
                continue
            # Contiguity once per bucket: the packed device array can
            # pull back non-contiguous, and the per-read traceback
            # would then re-copy the whole array every call.
            pointers = ptr_host
            final_states = fs_dev
            bits = 4
            if not _native.has_packed_readers():
                # No native lib, or stale .so without packed readers
                # (per-read full-array unpacking otherwise).
                pointers = _native.unpack_ptrs(pointers, bits, comp.wp)
                bits = 8
            for local_b, i in enumerate(bidx):
                ops_by_cand[i] = traceback(
                    pointers, comp, local_b, int(final_states[local_b]),
                    bits=bits,
                )
        records = []
        for i, c in enumerate(candidates):
            rec = _ops_to_record(c, ops_by_cand[i], index)
            if rec is not None:
                records.append(rec)
        return records

    # Ladder quantization (steps + lanes) so repeated guide calls reuse
    # compiled kernels across varying candidate shapes.
    batch = pack_banded_batch(reads, windows, width=cfg.band_width,
                              paths=paths, quantize=True)
    res = banded_nw_auto(params, device_batch(batch))
    pointers = np.ascontiguousarray(np.asarray(res.pointers))
    final_states = np.asarray(res.final_state)

    records = []
    for b, c in enumerate(candidates):
        ops = traceback(pointers, batch, b, int(final_states[b]))
        rec = _ops_to_record(c, ops, index)
        if rec is not None:
            records.append(rec)
    return records


def _ops_to_record(
    c: _Candidate, ops: List[Tuple[int, int]], index: KmerIndex
) -> Optional[SamRecord]:
    """Convert global (read x window) ops to a SAM record: leading/trailing
    ref-gaps shift the window, read-gaps become soft clips."""
    pos = c.window_start
    # Leading deletions consume reference before the alignment starts.
    while ops and ops[0][0] == 2:
        pos += ops[0][1]
        ops = ops[1:]
    while ops and ops[-1][0] == 2:
        ops = ops[:-1]
    lead_clip = 0
    if ops and ops[0][0] == 1:
        lead_clip = ops[0][1]
        ops = ops[1:]
    tail_clip = 0
    if ops and ops[-1][0] == 1:
        tail_clip = ops[-1][1]
        ops = ops[:-1]
    while ops and ops[0][0] == 2:
        pos += ops[0][1]
        ops = ops[1:]
    while ops and ops[-1][0] == 2:
        ops = ops[:-1]
    if not ops:
        return None
    cigar: List[Tuple[int, int]] = []
    if lead_clip:
        cigar.append((4, lead_clip))
    cigar.extend(ops)
    if tail_clip:
        cigar.append((4, tail_clip))
    return SamRecord(
        qname=c.read_name,
        flag=16 if c.is_reverse else 0,
        rname=index.ref_names[c.ref_idx],
        pos=pos,
        mapq=255,
        cigar=cigar,
        seq=c.seq,
        qual="*",
        tags=["AS:i:%d" % c.score],
    )
