"""Float64 numpy golden oracle for the spectral core.

This module defines the *semantics* the JAX implementation must match. It
re-derives, from first principles and in float64, the r9y9/wavenet_vocoder-
compatible mel pipeline that the reference repo's ``advoc/spectral.py`` exposes
(SURVEY.md §2.1 #2–#4; the reference mount was empty, so constants come from
the documented r9y9 conventions rather than file:line citations):

* Slaney-scale mel filterbank (librosa-compatible, ``htk=False``,
  ``norm='slaney'``), fs 22050, n_fft 1024, hop 256, win 1024 Hann,
  80 mels, fmin 125, fmax 7600.
* r9y9 mel extraction: ``20*log10(max(1e-5, mel @ |STFT|)) - ref_level_db``,
  then normalized to [0, 1] against ``min_level_db = -100``.
* Heuristic inversion: denormalize, dB→amplitude, multiply by the clipped
  pseudo-inverse of the filterbank.
* Phase recovery: Griffin-Lim (with optional fast-GL momentum) over
  center-padded STFT/iSTFT with NOLA-normalized overlap-add.

librosa and lws are NOT installed in this environment, so this file is the
single source of truth for golden values (tests compare the JAX float32 code
against this float64 oracle within documented tolerances).

Everything here is intentionally plain numpy — no JAX — so tests can trust it
independently of the code under test.
"""

from __future__ import annotations

import dataclasses

import numpy as np

# ---------------------------------------------------------------------------
# Audio / feature parameters (r9y9 wavenet_vocoder-compatible defaults).
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class AudioParams:
    """The featurizer parameter block shared by oracle and JAX paths."""

    sample_rate: int = 22050
    n_fft: int = 1024
    hop_length: int = 256
    win_length: int = 1024
    n_mels: int = 80
    fmin: float = 125.0
    fmax: float = 7600.0
    ref_level_db: float = 20.0
    min_level_db: float = -100.0
    # Floor inside amp_to_db: 20*log10(1e-5) = -100 dB.
    amp_floor: float = 1e-5

    @property
    def n_freq(self) -> int:
        return self.n_fft // 2 + 1


DEFAULT_PARAMS = AudioParams()


# ---------------------------------------------------------------------------
# Slaney mel scale + filterbank (librosa-compatible, derived from the
# published Slaney Auditory Toolbox formulas; htk=False, norm='slaney').
# ---------------------------------------------------------------------------


def hz_to_mel_slaney(freq_hz: np.ndarray) -> np.ndarray:
    """Slaney mel scale: linear below 1 kHz, log above."""
    freq_hz = np.asarray(freq_hz, dtype=np.float64)
    f_sp = 200.0 / 3.0  # ~66.667 Hz per mel in the linear region
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp  # = 15.0
    logstep = np.log(6.4) / 27.0
    mels = freq_hz / f_sp
    log_region = freq_hz >= min_log_hz
    mels = np.where(
        log_region,
        min_log_mel + np.log(np.maximum(freq_hz, min_log_hz) / min_log_hz) / logstep,
        mels,
    )
    return mels


def mel_to_hz_slaney(mels: np.ndarray) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    f_sp = 200.0 / 3.0
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    freqs = mels * f_sp
    log_region = mels >= min_log_mel
    freqs = np.where(
        log_region,
        min_log_hz * np.exp(logstep * (np.maximum(mels, min_log_mel) - min_log_mel)),
        freqs,
    )
    return freqs


def mel_frequencies(n_mels: int, fmin: float, fmax: float) -> np.ndarray:
    """``n_mels`` frequencies evenly spaced on the Slaney mel scale."""
    mel_min = hz_to_mel_slaney(np.float64(fmin))
    mel_max = hz_to_mel_slaney(np.float64(fmax))
    mels = np.linspace(mel_min, mel_max, n_mels, dtype=np.float64)
    return mel_to_hz_slaney(mels)


def create_mel_filterbank(params: AudioParams = DEFAULT_PARAMS) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, shape (n_mels, n_freq).

    Matches librosa.filters.mel(sr, n_fft, n_mels, fmin, fmax, htk=False,
    norm='slaney') — the filterbank the r9y9 pipeline uses (SURVEY.md §2.1 #2).
    """
    n_freq = params.n_freq
    fft_freqs = np.linspace(0.0, params.sample_rate / 2.0, n_freq, dtype=np.float64)
    # n_mels + 2 corner frequencies.
    mel_f = mel_frequencies(params.n_mels + 2, params.fmin, params.fmax)

    fdiff = np.diff(mel_f)  # (n_mels + 1,)
    ramps = mel_f[:, None] - fft_freqs[None, :]  # (n_mels + 2, n_freq)

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))  # (n_mels, n_freq)

    # Slaney normalization: each filter integrates to ~constant energy.
    enorm = 2.0 / (mel_f[2 : params.n_mels + 2] - mel_f[: params.n_mels])
    weights *= enorm[:, None]
    return weights


def mel_pseudoinverse(params: AudioParams = DEFAULT_PARAMS) -> np.ndarray:
    """Moore-Penrose pseudo-inverse of the filterbank, shape (n_freq, n_mels).

    This is the "heuristic inversion" operator (SURVEY.md §2.1 #3): a mel
    spectrogram right-multiplied by this matrix gives a (clipped-nonnegative)
    linear-magnitude estimate.
    """
    return np.linalg.pinv(create_mel_filterbank(params))


# ---------------------------------------------------------------------------
# STFT / iSTFT (librosa-convention: centered, reflect-padded, Hann).
# ---------------------------------------------------------------------------


def hann_window(win_length: int) -> np.ndarray:
    """Periodic Hann window (matches scipy.signal.get_window('hann', n))."""
    n = np.arange(win_length, dtype=np.float64)
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)


def stft(x: np.ndarray, params: AudioParams = DEFAULT_PARAMS) -> np.ndarray:
    """Centered STFT. Returns complex128 of shape (n_frames, n_freq).

    Conventions: reflect-pad by n_fft//2 on both sides (librosa center=True),
    periodic Hann window of win_length zero-padded to n_fft, rFFT.
    n_frames = 1 + len(x) // hop_length.
    """
    x = np.asarray(x, dtype=np.float64)
    pad = params.n_fft // 2
    xp = np.pad(x, (pad, pad), mode="reflect")
    win = hann_window(params.win_length)
    if params.win_length < params.n_fft:
        lpad = (params.n_fft - params.win_length) // 2
        win = np.pad(win, (lpad, params.n_fft - params.win_length - lpad))
    n_frames = 1 + (len(xp) - params.n_fft) // params.hop_length
    frames = np.stack(
        [
            xp[i * params.hop_length : i * params.hop_length + params.n_fft]
            for i in range(n_frames)
        ]
    )
    return np.fft.rfft(frames * win[None, :], n=params.n_fft, axis=-1)


def istft(
    spec: np.ndarray, length: int, params: AudioParams = DEFAULT_PARAMS
) -> np.ndarray:
    """Inverse STFT with NOLA window-sum normalization.

    ``spec`` is (n_frames, n_freq) complex; returns float64 waveform of
    ``length`` samples (the original, pre-padding length).
    """
    spec = np.asarray(spec)
    win = hann_window(params.win_length)
    if params.win_length < params.n_fft:
        lpad = (params.n_fft - params.win_length) // 2
        win = np.pad(win, (lpad, params.n_fft - params.win_length - lpad))
    frames = np.fft.irfft(spec, n=params.n_fft, axis=-1)  # (n_frames, n_fft)
    n_frames = frames.shape[0]
    total = params.n_fft + (n_frames - 1) * params.hop_length
    y = np.zeros(total, dtype=np.float64)
    wsum = np.zeros(total, dtype=np.float64)
    wsq = win * win
    for i in range(n_frames):
        s = i * params.hop_length
        y[s : s + params.n_fft] += frames[i] * win
        wsum[s : s + params.n_fft] += wsq
    pad = params.n_fft // 2
    y = y[pad : pad + length]
    wsum = wsum[pad : pad + length]
    return y / np.maximum(wsum, 1e-11)


# ---------------------------------------------------------------------------
# r9y9 mel extraction + heuristic inversion (dB domain, [0,1] normalized).
# ---------------------------------------------------------------------------


def amp_to_db(x: np.ndarray, params: AudioParams = DEFAULT_PARAMS) -> np.ndarray:
    return 20.0 * np.log10(np.maximum(params.amp_floor, x))


def db_to_amp(x: np.ndarray) -> np.ndarray:
    return np.power(10.0, x * 0.05)


def normalize_db(s: np.ndarray, params: AudioParams = DEFAULT_PARAMS) -> np.ndarray:
    return np.clip((s - params.min_level_db) / -params.min_level_db, 0.0, 1.0)


def denormalize_db(s: np.ndarray, params: AudioParams = DEFAULT_PARAMS) -> np.ndarray:
    return np.clip(s, 0.0, 1.0) * -params.min_level_db + params.min_level_db


def waveform_to_magspec(
    x: np.ndarray, params: AudioParams = DEFAULT_PARAMS
) -> np.ndarray:
    """|STFT|, shape (n_frames, n_freq)."""
    return np.abs(stft(x, params))


def waveform_to_r9y9_melspec(
    x: np.ndarray, params: AudioParams = DEFAULT_PARAMS
) -> np.ndarray:
    """r9y9-compatible normalized mel spectrogram in [0, 1].

    Shape (n_frames, n_mels). Pipeline: |STFT| → mel filterbank →
    amp_to_db − ref_level_db → normalize. (SURVEY.md §2.1 #2.)
    """
    mag = waveform_to_magspec(x, params)  # (T, F)
    mel_fb = create_mel_filterbank(params)  # (M, F)
    mel = mag @ mel_fb.T  # (T, M)
    return normalize_db(amp_to_db(mel, params) - params.ref_level_db, params)


def magspec_to_r9y9_melspec(
    mag: np.ndarray, params: AudioParams = DEFAULT_PARAMS
) -> np.ndarray:
    mel_fb = create_mel_filterbank(params)
    mel = mag @ mel_fb.T
    return normalize_db(amp_to_db(mel, params) - params.ref_level_db, params)


def r9y9_melspec_to_magspec(
    mel: np.ndarray, params: AudioParams = DEFAULT_PARAMS
) -> np.ndarray:
    """Heuristic inversion: normalized mel → nonnegative magnitude estimate.

    (SURVEY.md §3.3.) mel is (n_frames, n_mels); returns (n_frames, n_freq).
    """
    amp = db_to_amp(denormalize_db(mel, params) + params.ref_level_db)
    inv = mel_pseudoinverse(params)  # (F, M)
    return np.maximum(amp @ inv.T, 0.0)


# ---------------------------------------------------------------------------
# Griffin-Lim phase recovery.
# ---------------------------------------------------------------------------


def griffin_lim(
    mag: np.ndarray,
    length: int,
    n_iters: int = 60,
    momentum: float = 0.0,
    params: AudioParams = DEFAULT_PARAMS,
    seed: int | None = None,
) -> np.ndarray:
    """Griffin-Lim (optionally fast-GL with momentum) from a magnitude STFT.

    ``mag`` is (n_frames, n_freq) nonnegative; returns a float64 waveform of
    ``length`` samples. momentum=0 is classic G-L (the reference's fallback
    path, SURVEY.md §2.1 #4); momentum≈0.99 is fast G-L (Perraudin et al.).
    Phase is initialized to zero (deterministic) unless a seed is given.
    """
    mag = np.asarray(mag, dtype=np.float64)
    if seed is None:
        angles = np.zeros_like(mag)
    else:
        rng = np.random.default_rng(seed)
        angles = rng.uniform(-np.pi, np.pi, size=mag.shape)
    spec = mag * np.exp(1j * angles)
    prev_rebuilt = None
    for _ in range(n_iters):
        x = istft(spec, length, params)
        rebuilt = stft(x, params)[: mag.shape[0]]
        update = rebuilt.copy()
        if momentum > 0.0 and prev_rebuilt is not None:
            update = rebuilt + momentum * (rebuilt - prev_rebuilt)
        prev_rebuilt = rebuilt
        phase = update / np.maximum(np.abs(update), 1e-16)
        spec = mag * phase
    return istft(spec, length, params)


def magspec_to_waveform_griffin_lim(
    mag: np.ndarray,
    n_iters: int = 60,
    params: AudioParams = DEFAULT_PARAMS,
) -> np.ndarray:
    """Magnitude → waveform via classic Griffin-Lim (reference API name)."""
    length = mag.shape[0] * params.hop_length
    return griffin_lim(mag, length, n_iters=n_iters, params=params)


# ---------------------------------------------------------------------------
# LWS (Local Weighted Sums) phase recovery — Le Roux et al. 2010, "Fast signal
# reconstruction from magnitude STFT spectrogram based on spectrogram
# consistency". The reference repo's default phase path is the native ``lws``
# C extension (SURVEY.md §2.1 #4, §2.3); that package is unavailable here, so
# this float64 implementation — built from the published algorithm — is the
# binding spec the JAX twin must match.
#
# Math: a spectrogram S is *consistent* iff S = G(S) with G = STFT∘iSTFT.
# G is linear over ℝ but only ℝ-linear over ℂ (irfft enforces conjugate
# symmetry), so G(S)[m'] = Σ_dm A_dm S[m'-dm] + B_dm conj(S[m'-dm]), where
# the per-frame-offset kernels A/B are measured numerically from this very
# oracle's stft/istft (delta responses at an interior frame; exact to ~1e-15).
# A is Toeplitz-banded in frequency (|Δn| ≤ 3 holds 99.99% of its energy for
# the 1024/256 Hann setup) and B lives only in the DC/Nyquist corners (the
# conjugate fold). LWS truncates G to those local supports and sweeps the
# frames in order, updating each frame's *phase* to that of its local
# weighted sum (magnitude pinned) — a Gauss-Seidel pass over the consistency
# fixed point, vs. Griffin-Lim's Jacobi step (G-L ≡ the untruncated,
# all-frames-at-once version of the same update).
# ---------------------------------------------------------------------------


def _lws_band_mask(n_freq: int, width: int) -> np.ndarray:
    idx = np.arange(n_freq)
    return np.abs(idx[:, None] - idx[None, :]) <= width


def _lws_corner_mask(n_freq: int, width: int) -> np.ndarray:
    s = np.add.outer(np.arange(n_freq), np.arange(n_freq))
    return (s <= width) | (s >= 2 * (n_freq - 1) - width)


_LWS_KERNEL_CACHE: dict = {}


def lws_kernels(
    params: AudioParams = DEFAULT_PARAMS,
    band: int = 3,
    corner: int = 8,
) -> tuple[np.ndarray, np.ndarray]:
    """Truncated ℝ-linear consistency kernels (A, B), each (2Q-1, F, F).

    Q = n_fft // hop (4 for the r9y9 params ⇒ frame offsets −3…+3). A is
    masked to the |Δn| ≤ ``band`` diagonal band, B to the DC/Nyquist corners
    (``n'+n0 ≤ corner`` or ``≥ 2(F−1)−corner``). Measured numerically: istft
    then stft of per-bin delta spectrograms (real and imaginary separately,
    since G is not ℂ-linear), so the kernels inherit this oracle's exact
    STFT conventions including NOLA normalization. Cached per argument.
    """
    key = (params, band, corner)
    if key in _LWS_KERNEL_CACHE:
        return _LWS_KERNEL_CACHE[key]
    F = params.n_freq
    Q = params.n_fft // params.hop_length
    assert params.n_fft % params.hop_length == 0, "LWS kernels need hop | n_fft"
    T0 = 4 * Q  # enough interior frames around the probe
    m0 = T0 // 2
    length = (T0 - 1) * params.hop_length

    def measure(val: complex) -> np.ndarray:
        K = np.zeros((2 * Q - 1, F, F), dtype=np.complex128)
        for n0 in range(F):
            S = np.zeros((T0, F), dtype=np.complex128)
            S[m0, n0] = val
            G = stft(istft(S, length, params), params)[:T0]
            for j, dm in enumerate(range(-(Q - 1), Q)):
                K[j, :, n0] = G[m0 + dm, :]
        return K

    K1 = measure(1.0)
    Ki = measure(1.0j)
    A = (K1 - 1j * Ki) / 2.0
    B = (K1 + 1j * Ki) / 2.0
    A *= _lws_band_mask(F, band)[None]
    B *= _lws_corner_mask(F, corner)[None]
    _LWS_KERNEL_CACHE[key] = (A, B)
    return A, B


_LWS_EDGE_KERNEL_CACHE: dict = {}


def lws_edge_kernels(
    params: AudioParams = DEFAULT_PARAMS,
    band: int = 3,
    corner: int = 8,
) -> tuple[np.ndarray, np.ndarray]:
    """End-edge consistency kernels (A_edge, B_edge), each (Q−1, 2Q−1, F, F).

    ``A_edge[d]`` is the consistency kernel for a response frame at distance
    ``d`` from the END of a finite signal (a spectrogram that simply stops at
    the stream head, length = n_frames·hop): its analysis window is truncated
    at the signal end and the OLA/NOLA normalization there sums only the
    windows that exist, so the effective windows are *asymmetric* — this is
    the numerically-measured analog of the ``lws`` C library's
    asymmetric-analysis-window mode (SURVEY §7.3 hard-part #2). Frames at
    distance ≥ Q−1 from the end see the interior operator (their window ends
    before the signal does), so only d ∈ 0…Q−2 need edge sets; entries whose
    source frame would lie beyond the end (d + dm < 0) are structurally zero.

    Measured like :func:`lws_kernels` but vectorized over probe bins: both
    STFT and iSTFT are linear and the NOLA window-sum is content-independent,
    so one irFFT of the identity gives all F per-bin time atoms and the F
    probe responses come from one batched OLA + rFFT. Cached per argument.
    """
    key = (params, band, corner)
    if key in _LWS_EDGE_KERNEL_CACHE:
        return _LWS_EDGE_KERNEL_CACHE[key]
    F = params.n_freq
    Q = params.n_fft // params.hop_length
    assert params.n_fft % params.hop_length == 0, "LWS kernels need hop | n_fft"
    nfft, hop = params.n_fft, params.hop_length
    T0 = 4 * Q
    length = T0 * hop  # online convention: T frames ↔ T·hop samples
    win = hann_window(params.win_length)
    if params.win_length < nfft:
        lpad = (nfft - params.win_length) // 2
        win = np.pad(win, (lpad, nfft - params.win_length - lpad))
    # Content-independent NOLA sum for a T0-frame signal of this length.
    total = nfft + (T0 - 1) * hop
    wsum = np.zeros(total, dtype=np.float64)
    for i in range(T0):
        wsum[i * hop : i * hop + nfft] += win * win
    pad = nfft // 2
    wsum_sig = np.maximum(wsum[pad : pad + length], 1e-11)

    def measure(ds: int, val: complex) -> np.ndarray:
        """(T0_resp, F_resp, F_src): responses at every frame to per-bin
        probes at source frame T0−1−ds."""
        s = (T0 - 1 - ds) * hop
        atoms = np.fft.irfft(val * np.eye(F, dtype=np.complex128), n=nfft,
                             axis=-1)  # (F_src, nfft)
        y = np.zeros((F, length), dtype=np.float64)
        lo, hi = max(s, pad), min(s + nfft, pad + length)
        y[:, lo - pad : hi - pad] = (atoms * win[None])[:, lo - s : hi - s]
        y /= wsum_sig[None]
        # Batched centered stft (reflect pad, frame, window, rfft).
        yp = np.pad(y, ((0, 0), (pad, pad)), mode="reflect")
        nf = 1 + (yp.shape[1] - nfft) // hop
        frames = np.stack(
            [yp[:, i * hop : i * hop + nfft] for i in range(min(nf, T0))],
            axis=1,
        )
        G = np.fft.rfft(frames * win[None, None], n=nfft, axis=-1)
        return np.transpose(G, (1, 2, 0))  # (T0, F_resp, F_src)

    A = np.zeros((Q - 1, 2 * Q - 1, F, F), dtype=np.complex128)
    B = np.zeros_like(A)
    for ds in range(2 * Q - 2):
        G1 = measure(ds, 1.0)
        Gi = measure(ds, 1.0j)
        for d in range(Q - 1):
            dm = ds - d
            if -(Q - 1) <= dm <= Q - 1:
                r = T0 - 1 - d
                A[d, dm + Q - 1] = (G1[r] - 1j * Gi[r]) / 2.0
                B[d, dm + Q - 1] = (G1[r] + 1j * Gi[r]) / 2.0
    # Locality, measured (BASELINE.md): d ≥ 1 is as band/corner-local as the
    # interior (≥99.99% of |A|² in |Δn| ≤ 3, B in the corners), but d = 0 —
    # the head frame, whose analysis window overlaps the reflect re-analysis
    # pad — is NOT: its conjugate part holds ~10% of A's energy spread over
    # ALL bins (time reflection ≈ spectral conjugation, a dense ℝ-linear
    # coupling). So d = 0 stays DENSE (one (2Q−1)·F × F matvec — trivial MXU
    # work) and d ≥ 1 get the standard masks.
    A[1:] *= _lws_band_mask(F, band)[None, None]
    B[1:] *= _lws_corner_mask(F, corner)[None, None]
    _LWS_EDGE_KERNEL_CACHE[key] = (A, B)
    return A, B


def lws_online(
    mag: np.ndarray,
    length: int | None = None,
    n_sweeps: int = 2,
    look_ahead: int = 2,
    asymmetric: bool = True,
    band: int = 3,
    corner: int = 8,
    include_self: bool = False,
    params: AudioParams = DEFAULT_PARAMS,
    return_spec: bool = False,
) -> np.ndarray:
    """Online (streaming) LWS phase recovery: magnitude (T, F) → waveform.

    Frames arrive one at a time. When frame m arrives (zero-phase init,
    matching :func:`lws`), the phases of frames m−look_ahead…m are refined
    with ``n_sweeps`` Gauss-Seidel passes (oldest→newest within each pass);
    frames beyond m do not exist yet and contribute nothing. Frame
    m−look_ahead receives its LAST update at step m — the algorithmic
    latency is exactly ``look_ahead`` frames and the causality contract is
    prefix equivariance: running on ``mag[:t]`` produces bit-identical
    phases for frames ≤ t−1−look_ahead (tested).

    ``asymmetric=True`` uses the end-edge kernels of
    :func:`lws_edge_kernels` for response frames within Q−1 of the head, so
    each provisional update is exact for the signal-as-received — the
    asymmetric-window mode of the ``lws`` C library. ``False`` approximates
    the head with interior kernels over zero-extended future frames.
    """
    if length is None:
        length = mag.shape[0] * params.hop_length
    A, B = lws_kernels(params, band, corner)
    Q = params.n_fft // params.hop_length
    if asymmetric:
        Ae, Be = lws_edge_kernels(params, band, corner)
    mag = np.asarray(mag, dtype=np.float64)
    T = mag.shape[0]
    la = look_ahead
    # Q−1 leading zeros (pre-signal, as in batch lws) and Q−1 trailing
    # zeros (the not-yet-arrived future a window may slice into).
    spad = np.zeros((T + 2 * (Q - 1), mag.shape[1]), dtype=np.complex128)
    for m_new in range(T):
        spad[m_new + Q - 1] = mag[m_new]  # zero-phase arrival
        for _ in range(n_sweeps):
            for j in range(max(0, m_new - la), m_new + 1):
                d = m_new - j
                if asymmetric and d <= Q - 2:
                    Ak, Bk = Ae[d], Be[d]
                else:
                    Ak, Bk = A, B
                win = spad[j : j + 2 * Q - 1]
                acc = np.einsum("jab,jb->a", Ak[::-1], win)
                acc += np.einsum("jab,jb->a", Bk[::-1], np.conj(win))
                if not include_self:
                    cur = spad[j + Q - 1]
                    acc -= np.diag(Ak[Q - 1]) * cur
                    acc -= np.diag(Bk[Q - 1]) * np.conj(cur)
                spad[j + Q - 1] = mag[j] * (
                    acc / np.maximum(np.abs(acc), 1e-16)
                )
    spec = spad[Q - 1 : Q - 1 + T]
    wav = istft(spec, length, params)
    if return_spec:
        return wav, spec.copy()
    return wav


def lws(
    mag: np.ndarray,
    length: int | None = None,
    n_sweeps: int = 10,
    band: int = 3,
    corner: int = 8,
    include_self: bool = False,
    params: AudioParams = DEFAULT_PARAMS,
) -> np.ndarray:
    """Batch LWS phase recovery: magnitude (T, F) → float64 waveform.

    Each sweep visits frames 0…T−1 in order; frame m's phase is set to the
    phase of its truncated consistency sum over frames m−(Q−1)…m+(Q−1)
    (already-visited frames contribute their updated values — Gauss-Seidel).
    Bins within a frame update jointly from the pre-update frame (block
    update). ``include_self=False`` drops the current bin's own (dm=0, Δn=0)
    contribution — it only biases the sum toward the current phase and slows
    convergence (Le Roux 2010's accelerated variant). Out-of-range neighbor
    frames are zeros. Zero-phase init, matching :func:`griffin_lim`.
    """
    if length is None:
        length = mag.shape[0] * params.hop_length
    A, B = lws_kernels(params, band, corner)
    Q = params.n_fft // params.hop_length
    mag = np.asarray(mag, dtype=np.float64)
    T = mag.shape[0]
    diag_a = np.diag(A[Q - 1]).copy()
    diag_b = np.diag(B[Q - 1]).copy()
    spad = np.zeros((T + 2 * (Q - 1), mag.shape[1]), dtype=np.complex128)
    spad[Q - 1 : Q - 1 + T] = mag.astype(np.complex128)  # zero phase
    for _ in range(n_sweeps):
        for m in range(T):
            win = spad[m : m + 2 * Q - 1]  # frames m-(Q-1) … m+(Q-1)
            # A/B are indexed by dm = response − source; contribution to
            # frame m from source frame m+j−(Q−1) uses kernel index
            # dm = −(j−(Q−1)) ⇒ reversed kernel order.
            acc = np.einsum("jab,jb->a", A[::-1], win)
            acc += np.einsum("jab,jb->a", B[::-1], np.conj(win))
            if not include_self:
                cur = spad[m + Q - 1]
                acc -= diag_a * cur + diag_b * np.conj(cur)
            spad[m + Q - 1] = mag[m] * (acc / np.maximum(np.abs(acc), 1e-16))
    return istft(spad[Q - 1 : Q - 1 + T], length, params)


def magspec_to_waveform_lws(
    mag: np.ndarray,
    n_sweeps: int = 10,
    params: AudioParams = DEFAULT_PARAMS,
) -> np.ndarray:
    """Magnitude → waveform via batch LWS (reference API name)."""
    return lws(mag, n_sweeps=n_sweeps, params=params)


def r9y9_melspec_to_waveform(
    mel: np.ndarray,
    n_iters: int = 60,
    params: AudioParams = DEFAULT_PARAMS,
) -> np.ndarray:
    """Full heuristic-inversion vocoder: normalized mel → waveform.

    (SURVEY.md §3.3, BASELINE.md config 1.)
    """
    mag = r9y9_melspec_to_magspec(mel, params)
    return magspec_to_waveform_griffin_lim(mag, n_iters=n_iters, params=params)
