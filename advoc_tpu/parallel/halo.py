"""Time-axis sequence parallelism with halo exchange (SURVEY.md §2.4 SP row).

The conv-net/STFT equivalent of ring attention: a long utterance's time axis
is sharded across chips, each chip featurizes its shard locally, and the
samples a boundary frame needs from the neighboring shard travel over ICI via
``shard_map`` + ``lax.ppermute`` — exactly one neighbor exchange, no gather.

Frame↔sample geometry (center-padded STFT, pad = n_fft//2):
frame t covers samples [t·hop − pad, t·hop − pad + n_fft). A shard owning
samples [s0, s0+Lc) owns frames [s0/hop, (s0+Lc)/hop) and therefore needs
``pad`` samples of left halo and ``n_fft − hop − pad`` of right halo
(for n_fft 1024 / hop 256: 512 left, 256 right). Edge shards reflect-pad,
matching the unsharded semantics. The sharded STFT yields L/hop frames total
(the unsharded one yields 1 + L/hop; the final, mostly-padding frame is
dropped — documented, tested).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from advoc_tpu.ops import spectral
from advoc_tpu.ops.reference import AudioParams, DEFAULT_PARAMS


def sharded_stft_mag(
    wav: jax.Array,
    mesh: Mesh,
    axis: str = "data",
    params: AudioParams = DEFAULT_PARAMS,
):
    """|STFT| of a (L,) waveform time-sharded over ``axis``.

    Returns (L//hop, n_freq) magnitudes, frame axis sharded the same way.
    L must be divisible by n_devices·hop.
    """
    n_dev = mesh.shape[axis]
    hop, n_fft = params.hop_length, params.n_fft
    pad = n_fft // 2
    L = wav.shape[-1]
    assert L % (n_dev * hop) == 0, (L, n_dev, hop)
    left_halo = pad
    right_halo = n_fft - hop - pad  # 256 for the r9y9 params

    def local(wav_shard: jax.Array) -> jax.Array:
        # wav_shard: (Lc,) — this device's samples.
        idx = jax.lax.axis_index(axis)
        # Send my tail left-halo to my right neighbor; my head right-halo to
        # my left neighbor. (ppermute: list of (src, dst) pairs.)
        right_from_left = jax.lax.ppermute(
            wav_shard[-left_halo:], axis,
            [(i, (i + 1) % n_dev) for i in range(n_dev)],
        )  # what I receive: left neighbor's tail = my left halo
        left_from_right = jax.lax.ppermute(
            wav_shard[:right_halo], axis,
            [(i, (i - 1) % n_dev) for i in range(n_dev)],
        )  # right neighbor's head = my right halo

        # Global edges reflect-pad instead of wrapping around the ring.
        own_left_reflect = wav_shard[1 : left_halo + 1][::-1]
        own_right_reflect = wav_shard[-right_halo - 1 : -1][::-1]
        left = jnp.where(idx == 0, own_left_reflect, right_from_left)
        right = jnp.where(idx == n_dev - 1, own_right_reflect, left_from_right)

        xp = jnp.concatenate([left, wav_shard, right])  # (Lc + halos,)
        n_frames = wav_shard.shape[0] // hop
        # Public frame-local STFT entry point — one copy of the framing+
        # window+rfft semantics, shared with spectral.stft.
        return spectral.frame_local_stft_mag(xp, params, n_frames)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=P(axis),
        out_specs=P(axis, None),
    )
    return fn(wav)


def sharded_melspec(
    wav: jax.Array,
    mesh: Mesh,
    axis: str = "data",
    params: AudioParams = DEFAULT_PARAMS,
):
    """Time-sharded r9y9 mel extraction: (L,) → (L//hop, n_mels), sharded.

    The mel projection is local per frame, so it needs no extra comms.
    """
    mag = sharded_stft_mag(wav, mesh, axis, params)
    return spectral.magspec_to_r9y9_melspec(mag, params)
