"""Signal & compute primitives (the framework's kernel layer).

The reference delegated all native compute to stock TF1 kernels (SURVEY.md
§2.8); here each relied-upon op is rebuilt TPU-native: jnp/XLA compositions by
default, Pallas fused kernels on the hot paths (ops/pallas/).
"""

from amss_tpu.ops.framing import frame_signal, overlap_add
from amss_tpu.ops.stft import stft, istft, stft_ri, istft_ri, hann_window, dft_matrices
from amss_tpu.ops.metrics import si_sdr, pit_si_sdr, sdr_improvement
from amss_tpu.ops.pooling import max_pool_argmax, unpool_argmax
from amss_tpu.ops.kmeans import kmeans

__all__ = [
    "frame_signal",
    "overlap_add",
    "stft",
    "istft",
    "stft_ri",
    "istft_ri",
    "hann_window",
    "dft_matrices",
    "si_sdr",
    "pit_si_sdr",
    "sdr_improvement",
    "max_pool_argmax",
    "unpool_argmax",
    "kmeans",
]
