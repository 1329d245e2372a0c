"""Mel-conditioned waveform GAN: neural mel → waveform, no phase recovery.

The TPU-native completion of BASELINE config 5: the reference's WaveGAN is
*unconditional* (z → audio), which demonstrates the "no phase-recovery stage"
path but is not usable as a TTS vocoder. This module conditions the same
transposed-conv generator family on r9y9 mel frames, giving a second,
fully-neural mel→waveform path alongside the advoc U-Net + G-L pipeline
(MelGAN-style; see PAPERS.md MelGAN/Parallel WaveGAN for the lineage).

Geometry: the r9y9 hop is 256 samples/frame and the generator upsamples
×4×4×4×4 = ×256, so T mel frames → T·256 samples exactly — the same frame
clock as the rest of this framework.

Training (``make_cond_wavegan_train_step`` in train/gan.py): adversarial
loss against a phase-shuffle waveform discriminator that also sees the
(nearest-upsampled) mel as a conditioning channel, plus a mel-reconstruction
L1 computed by re-extracting mels from the generated audio on-device.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class CondWaveGANConfig:
    n_frames: int = 64           # mel frames per training chunk
    n_mels: int = 80
    hop: int = 256               # samples per frame (must equal 4^n_up_total)
    width: int = 64
    kernel: int = 24
    stride: int = 4
    phase_shuffle: int = 2
    dtype: str = "bfloat16"
    gan_type: str = "lsgan"
    n_critic: int = 1
    gp_weight: float = 10.0
    mel_l1_weight: float = 45.0  # MelGAN-family reconstruction weight
    sample_rate: int = 22050

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def slice_len(self) -> int:
        return self.n_frames * self.hop

    @property
    def n_up(self) -> int:
        n, size = 0, 1
        while size < self.hop:
            size *= self.stride
            n += 1
        assert size == self.hop, "hop must be a power of stride"
        return n


class CondWaveGANGenerator(nn.Module):
    """mel (B, T, n_mels) → waveform (B, T·hop) in [-1, 1]."""

    cfg: CondWaveGANConfig = CondWaveGANConfig()

    @nn.compact
    def __call__(self, mel: Array) -> Array:
        cfg = self.cfg
        d, n_up = cfg.width, cfg.n_up
        c0 = d * (2**n_up) // 2  # 512 for the defaults
        # Frame-rate trunk: local conv over mel frames.
        x = (mel * 2.0 - 1.0).astype(cfg.compute_dtype)  # (B, T, M)
        x = nn.Conv(c0, (7,), padding="SAME", dtype=cfg.compute_dtype,
                    name="trunk")(x)
        x = nn.leaky_relu(x, 0.2)
        for i in range(n_up):
            feats = max(d, c0 // (2 ** (i + 1)))
            last = i == n_up - 1
            x = nn.ConvTranspose(
                1 if last else feats,
                kernel_size=(cfg.kernel,),
                strides=(cfg.stride,),
                padding="SAME",
                dtype=jnp.float32 if last else cfg.compute_dtype,
                name=f"upconv{i}",
            )(x.astype(jnp.float32) if last else x)
            if not last:
                x = nn.leaky_relu(x, 0.2)
        return jnp.tanh(x[..., 0])


class CondWaveGANDiscriminator(nn.Module):
    """(waveform (B, L), mel (B, T, n_mels)) → patch logits (B, L/4^k).

    The conditioning mel is nearest-upsampled to sample rate and stacked as
    a second input channel; convs downsample ×4 per layer with phase shuffle
    (the WaveGAN anti-periodicity trick).
    """

    cfg: CondWaveGANConfig = CondWaveGANConfig()

    @nn.compact
    def __call__(self, wav: Array, mel: Array, rng: Array | None = None) -> Array:
        from advoc_tpu.models.wavegan.model import phase_shuffle

        cfg = self.cfg
        d = cfg.width
        b, L = wav.shape
        # Mel energy per frame → one conditioning channel at sample rate.
        cond = jnp.repeat(
            (mel.mean(axis=-1) * 2.0 - 1.0), cfg.hop, axis=-1
        )  # (B, L)
        x = jnp.stack([wav, cond], axis=-1).astype(cfg.compute_dtype)
        n_dn = cfg.n_up + 1  # one extra vs G: reach a coarse patch rate
        for i in range(n_dn):
            feats = min(d * (2**i), d * 16)
            x = nn.Conv(
                feats,
                kernel_size=(cfg.kernel,),
                strides=(cfg.stride,),
                padding="SAME",
                dtype=cfg.compute_dtype,
                name=f"conv{i}",
            )(x)
            x = nn.leaky_relu(x, 0.2)
            if cfg.phase_shuffle > 0 and i < n_dn - 1 and rng is not None:
                shift = jax.random.randint(
                    jax.random.fold_in(rng, i),
                    (x.shape[0],),
                    -cfg.phase_shuffle,
                    cfg.phase_shuffle + 1,
                )
                x = phase_shuffle(x, shift, cfg.phase_shuffle)
        # Patch logits over time (no global dense → translation-equivariant).
        return nn.Conv(1, (3,), padding="SAME", dtype=jnp.float32,
                       name="logit")(x.astype(jnp.float32))[..., 0]
