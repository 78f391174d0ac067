"""marginalign_trna_tpu — a TPU-native reimplementation of the marginAlign-tRNA pipeline.

A from-scratch JAX/XLA/Pallas framework providing the capabilities of the
reference marginAlign-tRNA toolchain (guide alignment, pair-HMM banded
forward-backward realignment, Baum-Welch EM training, posterior-decoding SNV
calling, and alignment QC statistics) designed TPU-first:

- All DP inner loops are batched anti-diagonal wavefronts over device arrays
  (band in sublanes, reads in lanes) compiled by XLA / written in Pallas.
- Parallelism is data-parallel sharding over a ``jax.sharding.Mesh`` with
  ``psum``-merged expectation tensors, replacing the reference's jobTree
  process DAG + file-based reduction (reference: src/margin/utils.py:127,
  src/margin/marginCallerLib.py:171-187).
- The reference's C binaries (cPecanRealign, LAST/BWA/minimap2) are replaced
  by on-device kernels plus a thin native (C++) host runtime for parsing,
  seeding and traceback.
"""

__version__ = "0.1.0"
