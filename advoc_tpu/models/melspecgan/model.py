"""MelSpecGAN: DCGAN-style unconditional mel-spectrogram generator.

Capability parity with the reference's expected ``models/melspecgan/``
(SURVEY.md §2.1 #13): generates r9y9-normalized mel spectrograms which the
advoc vocoder then converts to audio (the paper's unconditional-generation
experiment: melspecgan + advoc). Deprioritized in BASELINE configs but part of
the component inventory.

The generated image is (n_frames, n_mels) = (64, 80). 80 is not a power of
two, so the deconv stack produces (64, 80) from a (4, 5) seed via 4 ×2
upsamplings — same trick as the reference DCGAN shape-wise, TPU-static.
Output is sigmoid → directly in the [0, 1] normalized-dB mel domain.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class MelSpecGANConfig:
    n_frames: int = 64
    n_mels: int = 80
    latent_dim: int = 100
    width: int = 64
    dtype: str = "bfloat16"
    gan_type: str = "wgan-gp"
    n_critic: int = 5
    gp_weight: float = 10.0

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)


class MelSpecGANGenerator(nn.Module):
    """z (B, latent) → mel (B, n_frames, n_mels) in [0, 1]."""

    cfg: MelSpecGANConfig = MelSpecGANConfig()

    @nn.compact
    def __call__(self, z: Array) -> Array:
        cfg = self.cfg
        d = cfg.width
        h0, w0 = cfg.n_frames // 16, cfg.n_mels // 16  # (4, 5)
        x = nn.Dense(h0 * w0 * d * 8, dtype=cfg.compute_dtype, name="project")(
            z.astype(cfg.compute_dtype)
        )
        x = nn.relu(x.reshape(z.shape[0], h0, w0, d * 8))
        for i, f in enumerate([d * 4, d * 2, d]):
            b, h, w, c = x.shape
            x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
            x = nn.Conv(
                f, (5, 5), padding="SAME", dtype=cfg.compute_dtype, name=f"conv{i}"
            )(x)
            x = nn.GroupNorm(num_groups=8, dtype=jnp.float32, name=f"norm{i}")(x)
            x = nn.relu(x)
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        x = nn.Conv(1, (5, 5), padding="SAME", dtype=jnp.float32, name="head")(
            x.astype(jnp.float32)
        )
        return nn.sigmoid(x[..., 0])


class MelSpecGANDiscriminator(nn.Module):
    """mel (B, n_frames, n_mels) → scalar logit (B,)."""

    cfg: MelSpecGANConfig = MelSpecGANConfig()

    @nn.compact
    def __call__(self, mel: Array) -> Array:
        cfg = self.cfg
        d = cfg.width
        x = (mel * 2.0 - 1.0)[..., None].astype(cfg.compute_dtype)
        for i, f in enumerate([d, d * 2, d * 4, d * 8]):
            x = nn.Conv(
                f,
                (5, 5),
                strides=(2, 2),
                padding="SAME",
                dtype=cfg.compute_dtype,
                name=f"conv{i}",
            )(x)
            x = nn.leaky_relu(x, 0.2)
        x = x.reshape(x.shape[0], -1).astype(jnp.float32)
        return nn.Dense(1, dtype=jnp.float32, name="logit")(x)[..., 0]
