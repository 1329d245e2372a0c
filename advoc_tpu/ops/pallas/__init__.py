"""Pallas TPU kernels for the DSP hot path (SURVEY.md §2.3, §7.1 step 7).

The reference's native tier was the lws C extension + TF CUDA kernels; the
TPU-native equivalent is Pallas. :mod:`featurizer` implements the
BASELINE north-star "fused frame+window+FFT+mel-matmul kernel over
HBM-resident audio".
"""

from advoc_tpu.ops.pallas.featurizer import fused_melspec  # noqa: F401
