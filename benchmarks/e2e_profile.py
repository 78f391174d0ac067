"""Host-side profile of the warm realign + guide stages (cProfile).

Identifies where the post-device-traceback e2e wall lives: device sync
points show up inside jax wait functions, host work under its own
frames.  Runs guide+chain+realign once cold, then profiles a warm
repeat of guide and realign separately.

    python benchmarks/e2e_profile.py          # N=512 x 3.5kb
"""
import cProfile
import io
import os
import pstats
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from e2e import make_corpus  # noqa: E402


def main():
    n_reads = int(os.environ.get("E2E_READS", "512"))
    read_len = int(os.environ.get("E2E_READ_LEN", "3500"))
    with tempfile.TemporaryDirectory() as tmpdir:
        fq, ref = make_corpus(n_reads, read_len, tmpdir)

        from marginalign_trna_tpu.align.chain import chain_sam_file
        from marginalign_trna_tpu.align.guide import GuideConfig, map_reads
        from marginalign_trna_tpu.align.realign import realign_sam_file
        from marginalign_trna_tpu.models.hmm import PairHmm

        hmm = PairHmm.load(os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "marginalign_trna_tpu", "models", "last_hmm_20.txt",
        ))
        g_sam = os.path.join(tmpdir, "g.sam")
        c_sam = os.path.join(tmpdir, "c.sam")
        o_sam = os.path.join(tmpdir, "o.sam")

        # Cold pass pays compiles.
        map_reads(fq, ref, g_sam, GuideConfig())
        chain_sam_file(g_sam, c_sam, fq, ref)
        realign_sam_file(c_sam, o_sam, fq, ref, hmm, no_chain=True)

        for tag, fn in (
            ("guide", lambda: map_reads(fq, ref, g_sam, GuideConfig())),
            ("realign", lambda: realign_sam_file(
                c_sam, o_sam, fq, ref, hmm, no_chain=True)),
        ):
            pr = cProfile.Profile()
            t0 = time.perf_counter()
            pr.enable()
            fn()
            pr.disable()
            wall = time.perf_counter() - t0
            buf = io.StringIO()
            st = pstats.Stats(pr, stream=buf)
            st.sort_stats("cumulative").print_stats(22)
            print("==== %s warm: %.2fs ====" % (tag, wall), flush=True)
            print("\n".join(
                ln for ln in buf.getvalue().splitlines()
                if ln.strip() and "{" not in ln[:9]
            )[:4000], flush=True)


if __name__ == "__main__":
    main()
