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


def stoi(
    wav_ref,
    wav_gen,
    sample_rate: int = DEFAULT_PARAMS.sample_rate,
) -> float:
    """Short-Time Objective Intelligibility (Taal et al. 2011), host-side.

    Implemented from the published definition (10 kHz, 256/128 hann frames
    zero-padded to a 512-point FFT, energy-VAD silent-frame removal at
    40 dB dynamic range, 15 one-third-octave bands from 150 Hz, 384 ms
    (N=30 frame) segments, −15 dB SDR clipping, per-band-segment linear
    correlation averaged over bands × segments). NOTE: verified against the
    paper's construction and by property tests (identity → 1, monotone
    degradation under noise), not against the authors' MATLAB reference —
    treat absolute values as an intelligibility *proxy*, deltas as the
    meaningful signal. Beyond-reference eval depth (the reference's panel
    was spectrogram L1 + listening, SURVEY.md §3.2).

    Host/numpy by design: silent-frame removal changes the frame count
    (data-dependent shape), which has no efficient jit form; eval panels
    already run host-side plumbing (cf. :func:`stress_panel`).

    Returns NaN when the reference signal has no above-threshold frames
    (all-silence) or is shorter than one segment after VAD.
    """
    import numpy as np

    from advoc_tpu.data.audioio import resample

    fs, flen, hop, nfft, n_bands, seg_n = 10000, 256, 128, 512, 15, 30
    # β = −15 dB lower SDR bound → clip ȳ at x·(1 + 10^(−β/20)) = x·6.62.
    clip_hi = 1.0 + 10.0 ** (15.0 / 20.0)

    x = resample(np.asarray(wav_ref, np.float64), sample_rate, fs)
    y = resample(np.asarray(wav_gen, np.float64), sample_rate, fs)
    n = min(x.shape[-1], y.shape[-1])
    x, y = x[:n], y[:n]
    if n < flen:
        return float("nan")

    win = np.hanning(flen + 2)[1:-1]  # matches the paper's hanning(256)

    def frames(s: np.ndarray) -> np.ndarray:
        m = 1 + (len(s) - flen) // hop
        idx = np.arange(flen)[None] + hop * np.arange(m)[:, None]
        return s[idx] * win

    # Energy-VAD on the *reference*: drop frame pairs whose windowed clean
    # energy is >40 dB below the loudest frame, then overlap-add the kept
    # frames back into contiguous signals (hann at 50% overlap sums to a
    # constant, so interior samples reconstruct exactly up to that gain).
    xf, yf = frames(x), frames(y)
    e = 20.0 * np.log10(np.linalg.norm(xf, axis=1) + 1e-30)
    # The VAD is relative; an all-(near-)zero reference would keep every
    # frame and "score" garbage — treat it as undefined instead.
    if e.max() < -400.0:
        return float("nan")
    keep = e > e.max() - 40.0
    xf, yf = xf[keep], yf[keep]

    def ola(f: np.ndarray) -> np.ndarray:
        out = np.zeros((f.shape[0] - 1) * hop + flen)
        for i, fr in enumerate(f):  # few hundred frames; host-side eval
            out[i * hop : i * hop + flen] += fr
        return out

    x, y = ola(xf), ola(yf)

    # Band magnitudes: |STFT|² summed per one-third-octave band, sqrt'd.
    xs, ys = frames(x), frames(y)
    if xs.shape[0] < seg_n:
        return float("nan")
    fx = np.abs(np.fft.rfft(xs, nfft, axis=1)) ** 2  # (M, 257)
    fy = np.abs(np.fft.rfft(ys, nfft, axis=1)) ** 2
    freqs = np.arange(nfft // 2 + 1) * fs / nfft
    cf = 150.0 * 2.0 ** (np.arange(n_bands) / 3.0)
    lo, hi = cf * 2.0 ** (-1.0 / 6.0), cf * 2.0 ** (1.0 / 6.0)
    band = (freqs[None, :] >= lo[:, None]) & (freqs[None, :] < hi[:, None])
    bx = np.sqrt(fx @ band.T + 1e-30).T  # (15, M)
    by = np.sqrt(fy @ band.T + 1e-30).T

    # 384 ms segments: normalize gen to ref energy per band-segment, clip
    # at −15 dB SDR, then mean-removed linear correlation.
    sw = np.lib.stride_tricks.sliding_window_view  # (15, S, 30)
    xseg, yseg = sw(bx, seg_n, axis=1), sw(by, seg_n, axis=1)
    alpha = np.linalg.norm(xseg, axis=2, keepdims=True) / (
        np.linalg.norm(yseg, axis=2, keepdims=True) + 1e-30
    )
    yn = np.minimum(yseg * alpha, xseg * clip_hi)
    xd = xseg - xseg.mean(axis=2, keepdims=True)
    yd = yn - yn.mean(axis=2, keepdims=True)
    denom = np.linalg.norm(xd, axis=2) * np.linalg.norm(yd, axis=2) + 1e-30
    d = (xd * yd).sum(axis=2) / denom
    return float(d.mean())


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
        metrics["stoi"] = stoi(np.asarray(wav), np.asarray(gen), params.sample_rate)
        # snr_db/stoi are exempt from the finite check only on the silence
        # class (zero signal energy → −∞ SNR / undefined STOI is legitimate
        # there, nowhere else).
        bad = [
            k for k, v in metrics.items()
            if not (k in ("snr_db", "stoi") and kind == "silence")
            and not np.isfinite(v)
        ]
        if bad:
            raise FloatingPointError(
                f"non-finite metrics {bad} on stress class {kind!r}: {metrics}"
            )
        out[kind] = metrics
    return out
