"""End-to-end waveform GAN (WaveGAN-style; SURVEY.md §2.1 #12).

Capability parity with the reference's expected ``models/wavegan/``: a 1-D
transposed-conv generator z → waveform with **no phase-recovery stage**
(audio comes straight out of G; BASELINE config 5), and a strided-conv
discriminator with phase shuffle. TPU-first choices:

* Generator uses ``nn.ConvTranspose`` stride 4 (lax.conv_transpose verified
  on-device) with kernel 24 (multiple of the stride → uniform overlap, no
  checkerboard from kernel/stride aliasing).
* Phase shuffle (the WaveGAN discriminator's anti-periodicity trick) is a
  static ``jnp.roll``-free implementation: pad + one dynamic slice per
  example, vmapped — XLA-friendly, no gathers over time.
* Loss is WGAN-GP by default (the WaveGAN default; SURVEY.md §3.5) — wired
  in :mod:`advoc_tpu.train.gan`.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class WaveGANConfig:
    slice_len: int = 16384
    sample_rate: int = 16000     # SC09/WaveGAN convention
    latent_dim: int = 100
    width: int = 64              # "model dim" d; channels scale in powers of 2
    kernel: int = 24
    stride: int = 4
    phase_shuffle: int = 2
    dtype: str = "bfloat16"
    gan_type: str = "wgan-gp"
    n_critic: int = 5
    gp_weight: float = 10.0

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def n_up(self) -> int:
        # 16 * stride^n_up == slice_len  (16384 = 16 * 4^5)
        n = 0
        size = 16
        while size < self.slice_len:
            size *= self.stride
            n += 1
        assert size == self.slice_len, "slice_len must be 16 * stride^k"
        return n


class WaveGANGenerator(nn.Module):
    """z (B, latent_dim) → waveform (B, slice_len) in [-1, 1]."""

    cfg: WaveGANConfig = WaveGANConfig()

    @nn.compact
    def __call__(self, z: Array) -> Array:
        cfg = self.cfg
        d, n_up = cfg.width, cfg.n_up
        c0 = d * (2**n_up) // 2  # 64*32/2 = 1024 for the default config
        x = nn.Dense(16 * c0, dtype=cfg.compute_dtype, name="project")(
            z.astype(cfg.compute_dtype)
        )
        x = x.reshape(z.shape[0], 16, c0)
        x = nn.relu(x)
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
                x = nn.relu(x)
        return jnp.tanh(x[..., 0])


def phase_shuffle(x: Array, shift: Array, rad: int) -> Array:
    """Shift each example by shift∈[-rad, rad] along time with reflect pad.

    x: (B, T, C); shift: (B,) int32. Static shapes: pad by 2*rad then one
    dynamic slice per example (vmapped) — no gathers.
    """
    if rad == 0:
        return x

    def one(xi: Array, si: Array) -> Array:
        padded = jnp.pad(xi, ((rad, rad), (0, 0)), mode="reflect")
        return jax.lax.dynamic_slice_in_dim(padded, rad + si, xi.shape[0], axis=0)

    return jax.vmap(one)(x, shift)


class WaveGANDiscriminator(nn.Module):
    """waveform (B, slice_len) → scalar logit (B,). Phase-shuffled convs."""

    cfg: WaveGANConfig = WaveGANConfig()

    @nn.compact
    def __call__(self, wav: Array, rng: Array | None = None) -> Array:
        cfg = self.cfg
        d, n_dn = cfg.width, cfg.n_up
        x = wav[..., None].astype(cfg.compute_dtype)  # (B, T, 1)
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
        x = x.reshape(x.shape[0], -1).astype(jnp.float32)
        return nn.Dense(1, dtype=jnp.float32, name="logit")(x)[..., 0]
