"""Fused Pallas TPU kernels for the front-end hot path (BASELINE.json:5).

Three kernels (SURVEY.md §2.8 work list):
  1. stft_kernel:   framing + window + real-DFT matmul, fused — frames are
     built in VMEM and never round-trip HBM (the jnp path materializes a
     win/hop-times-expanded [T', win] frame tensor in HBM).
  2. conv encoder:  the adaptive filterbank analysis is the SAME compute shape
     (framing + matmul) — stft_kernel with a learned basis, so it is reused
     via `framed_matmul`.
  3. overlap-add:   decoder-side transposed matmul + OLA scatter-free
     accumulation (ola_kernel).

Every kernel has a jnp reference implementation in amss_tpu/ops and parity
tests run both (interpret mode on CPU).
"""

from amss_tpu.ops.pallas.framed_matmul import framed_matmul, pallas_stft_ri
from amss_tpu.ops.pallas.ola import pallas_overlap_add
