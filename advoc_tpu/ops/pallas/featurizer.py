"""Fused Pallas featurizer: HBM-resident audio → r9y9 normalized mel.

The BASELINE north-star kernel: "the STFT/mel-filterbank featurizer becomes a
Pallas fused frame+window+FFT+matmul kernel over HBM-resident audio". One
kernel performs framing, windowing, the DFT, magnitude, the mel projection,
and the dB/normalize epilogue — audio is read from HBM exactly once and only
the (T, 80) mel ever leaves the kernel.

TPU-first design (all constants precomputed on host in float64):

* **DFT as MXU matmuls.** For a fixed n_fft the rFFT is a linear map; the
  windowed DFT is ``frames @ (win ⊙ C)`` and ``frames @ (win ⊙ S)`` with
  C/S the cos/sin DFT matrices. On TPU the MXU does this at peak FLOPs with
  zero shuffle traffic — beating generic FFT butterflies at this size.
* **No framing step at all.** hop (256) divides n_fft (1024), so frame i is
  the concatenation of hop-blocks i..i+3, and
  ``frames @ W = Σ_k blocks[i+k] @ W_k`` where ``W_k`` is the k-th 256-row
  band of W. The kernel computes 4 shifted (T, 256) @ (256, F) matmuls over
  the raw hop-block view of the audio — framing never materializes.
* **Mel-support truncation.** The Slaney filterbank with fmax 7600 Hz has no
  support above rFFT bin 353 (of 513), so the DFT matrices keep only
  F̃ = 384 bins (a multiple of the 128-lane width). Exact, not approximate.
* **Overlapping reads via manual DMA.** Each grid step copies its
  (T_blk + 3, 256) hop-block window from HBM to VMEM with an async copy —
  BlockSpecs can't express the 3-block halo.

Semantics match :func:`advoc_tpu.ops.spectral.waveform_to_r9y9_melspec`
(tested against the float64 oracle in tests/test_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from advoc_tpu.ops import reference as ref
from advoc_tpu.ops.reference import AudioParams, DEFAULT_PARAMS

F_KEPT = 384  # rFFT bins kept (mel support ends at bin 353 for fmax=7600)
MEL_PAD = 128  # mel output padded to one lane tile (80 → 128)


@functools.lru_cache(maxsize=4)
def _kernel_consts(params: AudioParams):
    """(W_cos, W_sin, mel_T) float32, window folded into the DFT matrices."""
    n_fft, hop = params.n_fft, params.hop_length
    assert n_fft % hop == 0 and n_fft // hop == 4, "kernel assumes 4 bands"
    win = ref.hann_window(params.win_length)
    if params.win_length < n_fft:
        lpad = (n_fft - params.win_length) // 2
        win = np.pad(win, (lpad, n_fft - params.win_length - lpad))
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(F_KEPT, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    w_cos = (win[:, None] * np.cos(ang)).astype(np.float32)  # (1024, 384)
    w_sin = (win[:, None] * -np.sin(ang)).astype(np.float32)
    fb = ref.create_mel_filterbank(params)[:, :F_KEPT]  # (80, 384)
    assert np.allclose(
        ref.create_mel_filterbank(params)[:, F_KEPT:], 0.0
    ), "mel filterbank has support above the kept bins"
    mel_t = np.zeros((F_KEPT, MEL_PAD), np.float32)
    mel_t[:, : params.n_mels] = fb.T
    return w_cos, w_sin, mel_t


def _featurizer_kernel(
    blocks_hbm,  # (B, n_blocks_total, hop) HBM ref — raw audio hop-blocks
    wc_ref,      # (4*hop, F_KEPT) VMEM — cos DFT bands (window folded)
    ws_ref,      # (4*hop, F_KEPT) VMEM
    mel_ref,     # (F_KEPT, MEL_PAD) VMEM
    out_ref,     # (1, T_BLK, MEL_PAD) VMEM block
    scratch,     # (T_BLK + 8, hop) VMEM (t_blk+3 used; 8-aligned)
    sem,
    *,
    t_blk: int,
    hop: int,
    amp_floor: float,
    ref_level_db: float,
    min_level_db: float,
):
    bidx = pl.program_id(0)
    t = pl.program_id(1)
    # Halo'd hop-block window for this (batch row, frame tile). The copy is
    # t_blk + 8 rows (only t_blk + 3 are used): Mosaic requires DMA slice
    # sizes aligned to the (8, 128) sublane tiling.
    dma = pltpu.make_async_copy(
        blocks_hbm.at[bidx, pl.ds(t * t_blk, t_blk + 8), :],
        scratch,
        sem,
    )
    dma.start()
    dma.wait()

    # precision=HIGHEST: the MXU's bf16 default loses ~8 mantissa bits, and
    # DFT bins with heavy cancellation (quiet high frequencies) turn that
    # into tens of dB of error after the log — measured 0.22 max error in
    # normalized-dB units vs 1e-3 with 3-pass f32 passes.
    hi = jax.lax.Precision.HIGHEST
    re = jnp.zeros((t_blk, F_KEPT), jnp.float32)
    im = jnp.zeros((t_blk, F_KEPT), jnp.float32)
    for kband in range(4):
        band = scratch[kband : kband + t_blk, :]  # (T_BLK, hop)
        re += jnp.dot(
            band, wc_ref[kband * hop : (kband + 1) * hop, :],
            preferred_element_type=jnp.float32, precision=hi,
        )
        im += jnp.dot(
            band, ws_ref[kband * hop : (kband + 1) * hop, :],
            preferred_element_type=jnp.float32, precision=hi,
        )
    mag = jnp.sqrt(re * re + im * im)  # (T_BLK, F_KEPT)
    mel = jnp.dot(mag, mel_ref[:], preferred_element_type=jnp.float32,
                  precision=hi)
    db = 20.0 * jnp.log10(jnp.maximum(amp_floor, mel)) - ref_level_db
    out_ref[0] = jnp.clip((db - min_level_db) / -min_level_db, 0.0, 1.0)


def fused_melspec(
    wav: jax.Array,
    params: AudioParams = DEFAULT_PARAMS,
    t_blk: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """(..., L) waveform → (..., L//hop, n_mels) r9y9 normalized mel.

    Drop-in for ``spectral.waveform_to_r9y9_melspec`` minus the final frame
    (yields L//hop frames, not 1 + L//hop — the trailing frame is mostly
    pad; the halo-exchange SP path has the same convention).
    """
    hop = params.hop_length
    pad = params.n_fft // 2
    lead = wav.shape[:-1]
    L = wav.shape[-1]
    n_frames = L // hop
    wav2 = wav.reshape((-1, L)).astype(jnp.float32)
    b = wav2.shape[0]

    # Frames must tile by t_blk; pad frame count up and crop after.
    n_tiles = max(1, -(-n_frames // t_blk))
    n_frames_pad = n_tiles * t_blk
    # Samples needed: reflect pad (center) + frame coverage + halo blocks
    # (8, not 3, so every DMA window is sublane-aligned).
    total_blocks = n_frames_pad + 8
    needed = total_blocks * hop
    xp = jnp.pad(wav2, ((0, 0), (pad, pad)), mode="reflect")
    if xp.shape[1] < needed:
        xp = jnp.pad(xp, ((0, 0), (0, needed - xp.shape[1])))
    blocks = xp[:, :needed].reshape(b, total_blocks, hop)

    w_cos, w_sin, mel_t = _kernel_consts(params)
    kern = functools.partial(
        _featurizer_kernel,
        t_blk=t_blk,
        hop=hop,
        amp_floor=params.amp_floor,
        ref_level_db=params.ref_level_db,
        min_level_db=params.min_level_db,
    )

    out = pl.pallas_call(
        kern,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),   # audio stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # W_cos
            pl.BlockSpec(memory_space=pltpu.VMEM),  # W_sin
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mel
        ],
        out_specs=pl.BlockSpec(
            (1, t_blk, MEL_PAD), lambda bi, t: (bi, t, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, n_frames_pad, MEL_PAD), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((t_blk + 8, hop), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(blocks, jnp.asarray(w_cos), jnp.asarray(w_sin), jnp.asarray(mel_t))
    out = out[:, :n_frames, : params.n_mels]
    return out.reshape(lead + (n_frames, params.n_mels))
