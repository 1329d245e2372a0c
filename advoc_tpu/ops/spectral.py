"""TPU-native spectral core (JAX): STFT, mel, heuristic inversion, phase recovery.

This is the production twin of :mod:`advoc_tpu.ops.reference` (the float64
numpy oracle). Everything here is jittable, batched over arbitrary leading
dims, and designed for XLA:TPU:

* **Framing without gathers** — since ``hop_length`` divides ``n_fft`` for the
  r9y9 parameters (1024/256 = 4), frames are built from hop-sized blocks with
  static slices + concat, which XLA fuses; no gather/scatter in the hot path.
* **Scatter-free overlap-add** — iSTFT accumulates the r overlapping block
  diagonals with static ``.at[slice].add`` updates.
* **Trace-time float64 constants** — Hann window, mel filterbank, its
  pseudo-inverse, and the NOLA window-sum are computed on host in float64 by
  the oracle module and embedded as f32 constants; the device never computes
  them.
* **Phase recovery as ``lax.scan``** — Griffin-Lim (and the fast-GL momentum
  variant used as the LWS-quality path) iterates iFFT → overlap-add → FFT →
  magnitude projection entirely on-chip (SURVEY.md §2.3: replaces the
  reference's native ``lws`` C extension and its host Python loop).

Reference parity: mirrors the expected ``advoc/spectral.py`` public surface
(SURVEY.md §2.1 #2–#4): ``stft``, ``waveform_to_r9y9_melspec``,
``r9y9_melspec_to_magspec``, ``magspec_to_waveform_{griffin_lim,lws}``,
``r9y9_melspec_to_waveform``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from advoc_tpu.ops import reference as ref
from advoc_tpu.ops.reference import AudioParams, DEFAULT_PARAMS

Array = jax.Array

# Matmul precision for the mel filterbank projections: float32 accumulation on
# the MXU (SURVEY.md §7.3 hard-part #1 — parity dies without this).
_HIGHEST = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# Trace-time constants (host float64 → device f32).
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _consts(params: AudioParams) -> dict:
    win = ref.hann_window(params.win_length)
    if params.win_length < params.n_fft:
        lpad = (params.n_fft - params.win_length) // 2
        win = np.pad(win, (lpad, params.n_fft - params.win_length - lpad))
    fb = ref.create_mel_filterbank(params)  # (M, F) float64
    inv = np.linalg.pinv(fb)  # (F, M) float64
    return {
        "window": win,  # float64 (n_fft,)
        "window_sq": win * win,
        "mel_fb_t": fb.T.copy(),  # (F, M)
        "mel_pinv_t": inv.T.copy(),  # (M, F)
    }


@functools.lru_cache(maxsize=8)
def _dft_consts(params: AudioParams) -> dict:
    """DFT-as-matmul matrices for the phase-recovery hot loop.

    XLA's TPU FFT lowering is off the MXU's speed at n_fft=1024; a fixed-size
    (windowed) DFT is just a matmul. Measured on v5e, 30-iteration fast-GL
    over 95 s of audio: 99 ms (jnp.fft) → 74 ms (f32 matmuls) → less with
    bf16 loop precision. Matrices are built in float64 (the inverse maps by
    applying numpy's irfft to unit vectors) — exact by construction.

    Shapes (F = n_fft//2+1): fwd_re/fwd_im (n_fft, F): windowed frames →
    spectrum; inv_re/inv_im (F, n_fft): spectrum → windowed time frames
    (synthesis window folded in).
    """
    n_fft = params.n_fft
    F = params.n_freq
    win = np.asarray(_consts(params)["window"])  # (n_fft,)
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(F, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    fwd_re = (win[:, None] * np.cos(ang)).astype(np.float32)
    fwd_im = (win[:, None] * -np.sin(ang)).astype(np.float32)
    # irfft as a linear map from (Re, Im): x = Re @ inv_re + Im @ inv_im.
    eye = np.eye(F)
    inv_re = np.fft.irfft(eye, n=n_fft, axis=1)  # (F, n_fft)
    inv_im = np.fft.irfft(1j * eye, n=n_fft, axis=1)
    # Fold the synthesis window into the inverse maps (istft multiplies by
    # the window before overlap-add).
    inv_re = (inv_re * win[None, :]).astype(np.float32)
    inv_im = (inv_im * win[None, :]).astype(np.float32)
    return {
        "fwd_re": fwd_re,
        "fwd_im": fwd_im,
        "inv_re": inv_re,
        "inv_im": inv_im,
    }


@functools.lru_cache(maxsize=64)
def _nola_norm(params: AudioParams, n_frames: int, length: int) -> np.ndarray:
    """Host-precomputed 1/window-sum for iSTFT normalization (float64→f32).

    Depends only on static shapes, so it is a trace-time constant — the device
    never spends FLOPs or an extra HBM pass normalizing.
    """
    wsq = _consts(params)["window_sq"]
    total = params.n_fft + (n_frames - 1) * params.hop_length
    wsum = np.zeros(total, dtype=np.float64)
    for i in range(n_frames):
        wsum[i * params.hop_length : i * params.hop_length + params.n_fft] += wsq
    pad = params.n_fft // 2
    wsum = wsum[pad : pad + length]
    return (1.0 / np.maximum(wsum, 1e-11)).astype(np.float32)


# ---------------------------------------------------------------------------
# Framing / deframing (batched over one leading dim; public API vmaps more).
# ---------------------------------------------------------------------------


def _frame(xp: Array, params: AudioParams, n_frames: int) -> Array:
    """(B, L_padded) → (B, n_frames, n_fft) using hop-block slicing."""
    hop, n_fft = params.hop_length, params.n_fft
    if n_fft % hop == 0:
        r = n_fft // hop
        needed = (n_frames - 1) * hop + n_fft
        blocks = xp[:, :needed].reshape(xp.shape[0], n_frames - 1 + r, hop)
        parts = [blocks[:, k : k + n_frames, :] for k in range(r)]
        return jnp.concatenate(parts, axis=-1)
    # General case: strided gather (cold path for exotic params).
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    return xp[:, idx]


def _overlap_add(windowed: Array, params: AudioParams, length: int) -> Array:
    """(B, n_frames, n_fft) windowed frames → (B, length) via block diagonals."""
    hop, n_fft = params.hop_length, params.n_fft
    b, n, _ = windowed.shape
    assert n_fft % hop == 0, "overlap-add fast path needs hop | n_fft"
    r = n_fft // hop
    blocks = windowed.reshape(b, n, r, hop)
    y = jnp.zeros((b, n + r - 1, hop), dtype=windowed.dtype)
    for k in range(r):
        y = y.at[:, k : k + n, :].add(blocks[:, :, k, :])
    y = y.reshape(b, (n + r - 1) * hop)
    pad = n_fft // 2
    y = jax.lax.dynamic_slice_in_dim(y, pad, length, axis=1)
    return y * jnp.asarray(_nola_norm(params, n, length))


# ---------------------------------------------------------------------------
# STFT / iSTFT.
# ---------------------------------------------------------------------------


def stft(x: Array, params: AudioParams = DEFAULT_PARAMS) -> Array:
    """Centered STFT. (..., L) float → (..., n_frames, n_freq) complex64.

    n_frames = 1 + L // hop_length (librosa center=True convention; reflect
    padding, periodic Hann). Semantics defined by the float64 oracle
    ``advoc_tpu.ops.reference.stft``.
    """
    lead = x.shape[:-1]
    L = x.shape[-1]
    xb = x.reshape((-1, L)).astype(jnp.float32)
    pad = params.n_fft // 2
    xp = jnp.pad(xb, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + L // params.hop_length
    frames = _frame(xp, params, n_frames)
    win = jnp.asarray(_consts(params)["window"], dtype=jnp.float32)
    spec = jnp.fft.rfft(frames * win, n=params.n_fft, axis=-1)
    return spec.reshape(lead + spec.shape[1:])


def frame_local_stft_mag(
    xp: Array,
    params: AudioParams = DEFAULT_PARAMS,
    n_frames: int | None = None,
) -> Array:
    """|STFT| of an already-padded signal — the frame-local core shared by
    :func:`stft` and the time-sharded featurizer (``advoc_tpu.parallel.halo``).

    No padding is applied here: frame t covers ``xp[..., t·hop : t·hop+n_fft)``,
    so callers own the halo/center-padding policy (halo exchange supplies
    neighbor samples; :func:`stft` reflect-pads). Keeping this public means the
    framing+window+rfft semantics exist in exactly one place.

    xp: (..., L_padded) → (..., n_frames, n_freq) float32.
    n_frames defaults to the maximum that fits: 1 + (L_padded − n_fft)//hop.
    """
    lead = xp.shape[:-1]
    xb = xp.reshape((-1, xp.shape[-1])).astype(jnp.float32)
    if n_frames is None:
        n_frames = 1 + (xp.shape[-1] - params.n_fft) // params.hop_length
    frames = _frame(xb, params, n_frames)
    win = jnp.asarray(_consts(params)["window"], dtype=jnp.float32)
    mag = jnp.abs(jnp.fft.rfft(frames * win, n=params.n_fft, axis=-1))
    return mag.reshape(lead + mag.shape[1:])


def istft(spec: Array, length: int, params: AudioParams = DEFAULT_PARAMS) -> Array:
    """Inverse STFT with NOLA normalization. (..., n_frames, n_freq) → (..., length)."""
    lead = spec.shape[:-2]
    sb = spec.reshape((-1,) + spec.shape[-2:])
    frames = jnp.fft.irfft(sb, n=params.n_fft, axis=-1)
    win = jnp.asarray(_consts(params)["window"], dtype=jnp.float32)
    y = _overlap_add(frames * win, params, length)
    return y.reshape(lead + (length,))


def istft_stream_init(
    n_streams: int, params: AudioParams = DEFAULT_PARAMS
):
    """Fresh carry for :func:`istft_stream_push`.

    Carry = (ola_tail (B, (r−1)·hop), wsum_tail (B, (r−1)·hop)) — the
    pending overlap-add beyond the last emitted sample and the matching
    running window-sum (streamed rather than precomputed, and per-stream,
    so the stream-start partial NOLA normalization is exact even when one
    stream slot is reset mid-batch; it converges to a constant after the
    first push).
    """
    hop, n_fft = params.hop_length, params.n_fft
    assert n_fft % hop == 0, "streaming iSTFT needs hop | n_fft"
    r = n_fft // hop
    z = jnp.zeros((n_streams, (r - 1) * hop), jnp.float32)
    return (z, jnp.zeros_like(z))


def istft_stream_push(
    spec_chunk: Array, carry, params: AudioParams = DEFAULT_PARAMS
):
    """Overlap-add C frames into a live iSTFT stream; emit C·hop samples.

    (B, C, n_freq) complex frames + carry → ((B, C·hop) samples, carry).
    Emission is in *padded* coordinates: the very first ``n_fft // 2``
    samples a stream emits precede t = 0 (the center-padding pre-roll —
    callers drop them once); after that, emitted samples match
    :func:`istft` of the same frame stream exactly, including the partial-
    window-sum normalization at the stream start (the wsum is carried, not
    assumed interior). Ending a stream mid-flight leaves the final
    ``(r−1)·hop`` samples in the carry — :func:`istft_stream_flush` emits
    them with the end-corrected normalization.
    """
    hop, n_fft = params.hop_length, params.n_fft
    r = n_fft // hop
    ola_tail, wsum_tail = carry
    b, c, _ = spec_chunk.shape
    frames = jnp.fft.irfft(spec_chunk, n=n_fft, axis=-1)
    win = jnp.asarray(_consts(params)["window"], dtype=jnp.float32)
    blocks = (frames * win).reshape(b, c, r, hop)
    y = jnp.zeros((b, c + r - 1, hop), jnp.float32)
    for k in range(r):
        y = y.at[:, k : k + c].add(blocks[:, :, k, :])
    y = y.reshape(b, (c + r - 1) * hop)
    y = y.at[:, : (r - 1) * hop].add(ola_tail)
    # Window-sum: static per-push profile (all C frames present) + the tail.
    wsq = _consts(params)["window_sq"]
    wstat = np.zeros(((c + r - 1) * hop,), np.float64)
    for i in range(c):
        wstat[i * hop : i * hop + n_fft] += wsq
    wsum = jnp.asarray(wstat, jnp.float32)[None] + jnp.pad(
        wsum_tail, ((0, 0), (0, c * hop))
    )
    emit = y[:, : c * hop] / jnp.maximum(wsum[:, : c * hop], 1e-11)
    return emit, (y[:, c * hop :], wsum[:, c * hop :])


def istft_stream_flush(carry, params: AudioParams = DEFAULT_PARAMS):
    """Emit a stream's pending ``(r−1)·hop`` tail samples (end-normalized).

    Matches :func:`istft`'s treatment of the final frames: the tail is
    normalized by the as-carried partial window-sum, exactly what the
    offline NOLA normalization does past the last frame's hop block.
    """
    ola_tail, wsum_tail = carry
    return ola_tail / jnp.maximum(wsum_tail, 1e-11)


# ---------------------------------------------------------------------------
# r9y9 mel extraction + heuristic inversion.
# ---------------------------------------------------------------------------


def amp_to_db(x: Array, params: AudioParams = DEFAULT_PARAMS) -> Array:
    return 20.0 * jnp.log10(jnp.maximum(params.amp_floor, x))


def db_to_amp(x: Array) -> Array:
    return jnp.power(10.0, x * 0.05)


def normalize_db(s: Array, params: AudioParams = DEFAULT_PARAMS) -> Array:
    return jnp.clip((s - params.min_level_db) / -params.min_level_db, 0.0, 1.0)


def denormalize_db(s: Array, params: AudioParams = DEFAULT_PARAMS) -> Array:
    return jnp.clip(s, 0.0, 1.0) * -params.min_level_db + params.min_level_db


def waveform_to_magspec(x: Array, params: AudioParams = DEFAULT_PARAMS) -> Array:
    return jnp.abs(stft(x, params))


def magspec_to_r9y9_melspec(mag: Array, params: AudioParams = DEFAULT_PARAMS) -> Array:
    """(..., T, n_freq) magnitude → (..., T, n_mels) normalized mel."""
    fb_t = jnp.asarray(_consts(params)["mel_fb_t"], dtype=jnp.float32)
    mel = jnp.matmul(mag, fb_t, precision=_HIGHEST)
    return normalize_db(amp_to_db(mel, params) - params.ref_level_db, params)


def waveform_to_r9y9_melspec(
    x: Array, params: AudioParams = DEFAULT_PARAMS, impl: str = "xla"
) -> Array:
    """(..., L) waveform → (..., T, n_mels) r9y9 normalized mel (SURVEY §2.1 #2).

    impl="xla" (default): T = 1 + L//hop (librosa convention).
    impl="pallas": the fused single-kernel featurizer (HBM audio read once);
    T = L//hop (no trailing mostly-pad frame) and ~5% faster on v5e.
    """
    if impl == "pallas":
        from advoc_tpu.ops.pallas.featurizer import fused_melspec

        return fused_melspec(x, params)
    return magspec_to_r9y9_melspec(waveform_to_magspec(x, params), params)


def r9y9_melspec_to_magspec(mel: Array, params: AudioParams = DEFAULT_PARAMS) -> Array:
    """Heuristic inversion (SURVEY §2.1 #3): normalized mel → magnitude ≥ 0."""
    amp = db_to_amp(denormalize_db(mel, params) + params.ref_level_db)
    pinv_t = jnp.asarray(_consts(params)["mel_pinv_t"], dtype=jnp.float32)
    return jnp.maximum(jnp.matmul(amp, pinv_t, precision=_HIGHEST), 0.0)


def mel_consistency_project(
    mag: Array,
    mel: Array,
    params: AudioParams = DEFAULT_PARAMS,
    strength: float = 1.0,
    max_gain: float = 4.0,
    n_iters: int = 1,
) -> Array:
    """Pull a magnitude spectrogram back onto the conditioning mel.

    Per frame, per mel band: compute the amplitude-domain mel the magnitude
    currently implies (``melfb @ mag``), the ratio to the conditioning mel's
    amplitude, and apply that ratio to every linear-frequency bin as a
    filterbank-weight-averaged gain. At ``strength=1`` the result's implied
    mel ≈ the conditioning mel (approximate in one step because adjacent
    triangular bands overlap; ``n_iters`` unrolls extra correction steps).
    Bins the filterbank does not cover (below the fmin edge, above fmax, DC)
    keep their value — the mel says nothing about them.

    Why this exists: the heuristic pinv inversion is mel-consistent *by
    construction*, so any envelope-family metric (STOI's one-third-octave
    band correlations, re-extracted mel L1) scores it near-perfectly even
    though its fine structure is far from the true magnitude. The trained
    repair moves toward the true magnitude (normalized-dB L1 0.127 → 0.033
    vs ground truth at 10k corpus steps) but its small *fluctuating* mel
    residual decorrelates band envelopes — the entire r3/r4 "STOI
    inversion" was this effect, dominated by the pitch-fundamental band
    (BASELINE.md round-4 STOI section). This projection keeps the repair's
    fine structure while restoring exact band envelopes: measured STOI
    0.8917 vs 0.8024 (heuristic) vs 0.7371 (raw repair), with dB-L1 vs the
    true magnitude 0.071 vs the heuristic's 0.127.

    ``mel`` is the normalized r9y9 mel (the vocoder's input); ``mag`` any
    nonnegative (..., T, n_freq) magnitude. Per-band ratios are clipped to
    [1/max_gain, max_gain] so silent-band corrections cannot inject energy
    spikes. Cheap: two (T,M)×(M,F) matmuls per iteration, fused into the
    vocoder jit.
    """
    c = _consts(params)
    fb_t = jnp.asarray(c["mel_fb_t"], dtype=jnp.float32)  # (F, M)
    colsum = jnp.asarray(c["mel_fb_t"].sum(axis=1), dtype=jnp.float32)  # (F,)
    covered = colsum > 1e-6
    mel_amp = db_to_amp(denormalize_db(mel, params) + params.ref_level_db)
    out = mag
    for _ in range(n_iters):
        implied = jnp.matmul(out, fb_t, precision=_HIGHEST)  # (..., T, M)
        ratio = mel_amp / jnp.maximum(implied, 1e-8)
        ratio = jnp.clip(ratio, 1.0 / max_gain, max_gain)
        num = jnp.matmul(ratio, fb_t.T, precision=_HIGHEST)  # (..., T, F)
        gain = jnp.where(covered, num / jnp.maximum(colsum, 1e-6), 1.0)
        out = out * (1.0 + strength * (gain - 1.0))
    return out


# ---------------------------------------------------------------------------
# Phase recovery: Griffin-Lim / fast-GL as a lax.scan (on-chip; replaces the
# reference's host-side lws C extension + Python loop — SURVEY §2.3, §3.3).
# ---------------------------------------------------------------------------


def griffin_lim(
    mag: Array,
    length: int | None = None,
    n_iters: int = 60,
    momentum: float = 0.0,
    params: AudioParams = DEFAULT_PARAMS,
    fft_impl: str = "matmul",
    precision=None,
    init_phase: tuple[Array, Array] | None = None,
    return_final_phase: bool = False,
    drop_nyquist: bool = False,
) -> Array:
    """Griffin-Lim phase recovery. (..., T, n_freq) → (..., length) waveform.

    init_phase: optional (cos φ, sin φ) unit-phase arrays broadcastable to
    the magnitude shape — e.g. a linear phase advance continued from a
    previous streaming chunk. return_final_phase additionally returns the
    converged unit phase (cos, sin) so streaming callers can carry it.
    (matmul impl only.)

    momentum=0 → classic G-L; momentum≈0.99 → fast G-L (Perraudin 2013),
    which is the shipped LWS-quality path. Runs as a single ``lax.scan`` so an
    entire vocode is one XLA computation; zero-phase init (deterministic).

    fft_impl: "matmul" (default) runs every iFFT/FFT of the loop as windowed
    DFT matmuls on the MXU (measured 1.3–3× faster than XLA's TPU FFT at
    n_fft=1024); "fft" uses jnp.fft.

    precision: matmul precision for the loop's DFTs. Default HIGHEST
    (float32-equivalent, matches the fft path); pass
    ``jax.lax.Precision.DEFAULT`` for single-pass bf16 MXU — ~2× faster
    loop, phase error inaudible for vocoding (re-extracted mel L1 parity is
    asserted in tests either way). The final synthesis is always HIGHEST.
    """
    if length is None:
        length = mag.shape[-2] * params.hop_length
    mag = mag.astype(jnp.float32)
    n_frames = mag.shape[-2]

    if init_phase is not None and fft_impl not in ("matmul", "pallas"):
        raise ValueError("init_phase needs fft_impl='matmul' or 'pallas'")
    if return_final_phase and fft_impl != "matmul":
        raise ValueError("return_final_phase needs fft_impl='matmul'")
    if drop_nyquist and fft_impl != "pallas":
        raise ValueError("drop_nyquist is a pallas-path optimization")

    if fft_impl == "fft":
        spec0 = mag.astype(jnp.complex64)  # zero phase

        def body(carry, i):
            spec, prev = carry
            x = istft(spec, length, params)
            rebuilt = stft(x, params)
            # stft of length → n_frames' = 1 + length//hop ≥ n_frames; crop.
            rebuilt = rebuilt[..., :n_frames, :]
            # Oracle semantics: no momentum on the first iteration (there is
            # no previous rebuilt yet — reference.griffin_lim).
            m = jnp.where(i == 0, 0.0, momentum).astype(rebuilt.real.dtype)
            update = rebuilt + m * (rebuilt - prev)
            phase = update / jnp.maximum(jnp.abs(update), 1e-16)
            return (mag * phase, rebuilt), None

        (spec, _), _ = jax.lax.scan(
            body, (spec0, spec0), jnp.arange(n_iters)
        )
        return istft(spec, length, params)

    if fft_impl == "pallas":
        # Whole loop VMEM-resident in one Pallas program (3-D input only).
        from advoc_tpu.ops.pallas.griffin_lim import griffin_lim_pallas

        if mag.ndim != 3 or length != mag.shape[-2] * params.hop_length:
            raise ValueError(
                "fft_impl='pallas' needs (B, T, F) magnitudes and the "
                "default length"
            )
        if drop_nyquist:
            # For callers whose Nyquist bin is known-negligible (the advoc
            # pipeline passes the ~zero heuristic estimate through at
            # Nyquist): running the loop on exactly 512 bins lands on a
            # lane multiple — 20% less MXU work than 513-padded-to-640.
            mag = mag[..., : params.n_freq - 1]
        # Mode map (measured on v5e, B=64×256 frames, 30 iters, 512-bin —
        # BASELINE.md):
        # DEFAULT/None → "split_synth": SYNTHESIS maps as bf16 (hi, lo)
        #   pairs (two single-pass dots — ~16 mantissa bits), analysis maps
        #   plain bf16 single-pass. 16.9 ms at mel L1 0.01356, equal to
        #   splitting both sides (22.1 ms / 0.01351): table truncation only
        #   matters where it imprints on the waveform (synthesis); analysis
        #   phase-estimate errors wash out in the magnitude projection —
        #   splitting only analysis gives 0.02252, as bad as no split.
        #   Plain single-pass everywhere (11.5 ms / 0.0214) fails the
        #   quality gate and is not offered here (use
        #   griffin_lim_pallas(loop_dtype="bfloat16") to reproduce).
        # HIGHEST → f32 maps + 3-pass MXU: f32-faithful, 82 ms (slower than
        #   the XLA loop — Mosaic's 3-pass dot is ~5.6× its single-pass).
        if init_phase is not None and drop_nyquist:
            cos0, sin0 = init_phase
            init_phase = (cos0[..., : params.n_freq - 1],
                          sin0[..., : params.n_freq - 1])
        if precision is None or precision == jax.lax.Precision.DEFAULT:
            return griffin_lim_pallas(
                mag, n_iters=n_iters, momentum=momentum, params=params,
                loop_dtype="split_synth", init_phase=init_phase,
            )
        return griffin_lim_pallas(
            mag, n_iters=n_iters, momentum=momentum, params=params,
            loop_dtype="float32", precision=precision, init_phase=init_phase,
        )

    if fft_impl != "matmul":
        raise ValueError(f"unknown fft_impl {fft_impl!r}")

    loop_prec = _HIGHEST if precision is None else precision
    c = _dft_consts(params)
    fwd_re = jnp.asarray(c["fwd_re"])
    fwd_im = jnp.asarray(c["fwd_im"])
    inv_re = jnp.asarray(c["inv_re"])
    inv_im = jnp.asarray(c["inv_im"])
    lead = mag.shape[:-2]
    magb = mag.reshape((-1,) + mag.shape[-2:])  # (B, T, F)
    pad = params.n_fft // 2
    n_frames_re = 1 + length // params.hop_length

    def synth(re: Array, im: Array, prec=None) -> Array:
        """(B, T, F) spectrum → (B, length) waveform (windowed OLA)."""
        frames_w = (
            jnp.matmul(re, inv_re, precision=prec or loop_prec)
            + jnp.matmul(im, inv_im, precision=prec or loop_prec)
        )  # (B, T, n_fft), synthesis window folded into the matrices
        return _overlap_add(frames_w, params, length)

    def analyze(x: Array) -> tuple[Array, Array]:
        """(B, length) → (B, T, F) windowed DFT (cropped to T frames)."""
        xp = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
        frames = _frame(xp, params, n_frames_re)[:, :n_frames, :]
        re = jnp.matmul(frames, fwd_re, precision=loop_prec)
        im = jnp.matmul(frames, fwd_im, precision=loop_prec)
        return re, im

    def body(carry, i):
        re, im, prev_re, prev_im = carry
        x = synth(re, im)
        nre, nim = analyze(x)
        # No momentum on iteration 1 (oracle semantics: no previous rebuilt).
        m = jnp.where(i == 0, 0.0, momentum).astype(nre.dtype)
        ure = nre + m * (nre - prev_re)
        uim = nim + m * (nim - prev_im)
        norm = jnp.maximum(jnp.sqrt(ure * ure + uim * uim), 1e-16)
        scale = magb / norm
        return (ure * scale, uim * scale, nre, nim), None

    if init_phase is not None:
        cos0, sin0 = init_phase
        re0 = magb * jnp.broadcast_to(cos0, mag.shape).reshape(magb.shape)
        im0 = magb * jnp.broadcast_to(sin0, mag.shape).reshape(magb.shape)
    else:
        re0, im0 = magb, jnp.zeros_like(magb)
    init = (re0, im0, re0, im0)
    (re, im, _, _), _ = jax.lax.scan(body, init, jnp.arange(n_iters))
    y = synth(re, im, prec=_HIGHEST).reshape(lead + (length,))
    if return_final_phase:
        inv_mag = 1.0 / jnp.maximum(jnp.sqrt(re * re + im * im), 1e-16)
        shape = lead + mag.shape[-2:]
        return y, (
            (re * inv_mag).reshape(shape),
            (im * inv_mag).reshape(shape),
        )
    return y


def pghi_init_phase(
    mag: Array,
    params: AudioParams = DEFAULT_PARAMS,
    grad_coef: float = 0.0,
) -> tuple[Array, Array]:
    """Magnitude-only phase estimate to seed Griffin-Lim (PGHI-style).

    Integrates an estimated per-bin phase time-gradient over frames
    (``lax.cumsum`` — jit-friendly; no heap):

        tgrad[t, f] = 2π·hop·f/n_fft  +  grad_coef · ∂log|M|/∂f
        φ[t, f]     = Σ_{τ≤t} tgrad[τ, f]

    The first term advances every bin at its center frequency (exact for
    steady sinusoids — the streaming path's RTISI trick generalized to a
    cold start); the second is the phase-gradient correction of
    Gaussian-window STFT theory (Průša & Søndergaard's PGHI), whose proper
    coefficient depends on the window — here it is a *tuned* scalar
    (grad_coef=0 disables it). Measured A/B over grad_coef × iteration
    count lives in BASELINE.md; this is an initialization heuristic, so its
    only contract is the measured quality, not bit semantics.

    (..., T, F) magnitudes → (cosφ, sinφ) of the same shape.
    """
    t = mag.shape[-2]
    f = mag.shape[-1]
    freqs = jnp.arange(f, dtype=jnp.float32)
    base = 2.0 * np.pi * params.hop_length * freqs / params.n_fft  # (F,)
    tgrad = jnp.broadcast_to(base, mag.shape)
    if grad_coef:
        log_m = jnp.log(jnp.maximum(mag, 1e-10))
        # central difference over the frequency axis (edges one-sided)
        d_f = jnp.gradient(log_m, axis=-1)
        tgrad = tgrad + grad_coef * d_f
    phase = jnp.cumsum(tgrad, axis=-2)
    return jnp.cos(phase), jnp.sin(phase)


def magspec_to_waveform_griffin_lim(
    mag: Array,
    n_iters: int = 60,
    params: AudioParams = DEFAULT_PARAMS,
) -> Array:
    """Reference-named API: classic Griffin-Lim (SURVEY §2.1 #4)."""
    return griffin_lim(mag, n_iters=n_iters, momentum=0.0, params=params)


# ---------------------------------------------------------------------------
# LWS (Local Weighted Sums) phase recovery — the true algorithm, as a
# lax.scan twin of the float64 oracle ``reference.lws`` (which defines the
# semantics; see its docstring for the math and Le Roux 2010 citation).
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _lws_consts(params: AudioParams, band: int, corner: int) -> dict:
    """Device-ready split of the oracle's truncated consistency kernels.

    The banded part of A is stored as ``Aband[j, d, n'] = A_j[n', n'-dn]``
    (dn = d − band, zero out of range) so the per-frame contraction is 2·band+1
    shifted elementwise multiply-adds (VPU work, no gathers); B's conjugate
    fold lives only in (corner+1)² blocks at the DC and Nyquist corners.
    Kernel index j is pre-reversed to the sweep's orientation (contribution to
    frame m from source frame m+j−(Q−1) uses offset dm = (Q−1)−j).
    """
    A, B = ref.lws_kernels(params, band, corner)  # masked (2Q-1, F, F)
    Q = params.n_fft // params.hop_length
    return _split_ab(A, B, Q, band, corner)


def _split_ab(A: np.ndarray, B: np.ndarray, Q: int, band: int, corner: int) -> dict:
    F = A.shape[-1]
    A_rev, B_rev = A[::-1], B[::-1]
    nb = 2 * band + 1
    aband = np.zeros((2 * Q - 1, nb, F), dtype=np.complex128)
    for j in range(2 * Q - 1):
        for d in range(nb):
            dn = d - band
            lo, hi = max(0, dn), min(F, F + dn)
            idx = np.arange(lo, hi)
            aband[j, d, idx] = A_rev[j, idx, idx - dn]
    c = corner + 1
    blo = B_rev[:, :c, :c].copy()  # acc[:c] += Blo[j] @ conj(src[:c])
    bhi = B_rev[:, F - c :, F - c :].copy()
    diag_a = np.diag(A[Q - 1]).copy()
    diag_b = np.diag(B[Q - 1]).copy()
    f32 = lambda x: np.ascontiguousarray(x, dtype=np.float32)  # noqa: E731
    return {
        "a_re": f32(aband.real), "a_im": f32(aband.imag),
        "blo_re": f32(blo.real), "blo_im": f32(blo.imag),
        "bhi_re": f32(bhi.real), "bhi_im": f32(bhi.imag),
        "diag_a_re": f32(diag_a.real), "diag_a_im": f32(diag_a.imag),
        "diag_b_re": f32(diag_b.real), "diag_b_im": f32(diag_b.imag),
        "Q": Q, "c": c,
    }


def _lws_update(win_re, win_im, mg, cst, include_self: bool):
    """One LWS frame update from its (B, 2Q−1, F) source window.

    Shared by :func:`lws` and :func:`lws_online`. ``cst`` is a dict from
    ``_lws_consts`` (banded A + corner-block B) or a dense edge set from
    ``_lws_online_consts`` (``cst["dense"]`` — the head frame's kernels are
    not band-local, see ``reference.lws_edge_kernels``). The updated frame
    is the window's center (index Q−1); returns (new_re, new_im) with
    magnitude ``mg``.
    """
    Bn, nj, F = win_re.shape
    ein = functools.partial(jnp.einsum, precision=_HIGHEST)
    if cst.get("dense") is not None:
        # acc = Σ_j A_rev[j] @ win[j] + B_rev[j] @ conj(win[j]), folded into
        # two real (2Q−1·F, F) matmuls per output part.
        kr_wre, kr_wim, ki_wre, ki_wim = (
            jnp.asarray(cst["dense"][k])
            for k in ("kr_wre", "kr_wim", "ki_wre", "ki_wim")
        )
        wre = win_re.reshape(Bn, nj * F)
        wim = win_im.reshape(Bn, nj * F)
        acc_re = ein("nk,ka->na", wre, kr_wre) + ein("nk,ka->na", wim, kr_wim)
        acc_im = ein("nk,ka->na", wre, ki_wre) + ein("nk,ka->na", wim, ki_wim)
    else:
        c = cst["c"]
        a_re, a_im = jnp.asarray(cst["a_re"]), jnp.asarray(cst["a_im"])
        blo_re = jnp.asarray(cst["blo_re"])
        blo_im = jnp.asarray(cst["blo_im"])
        bhi_re = jnp.asarray(cst["bhi_re"])
        bhi_im = jnp.asarray(cst["bhi_im"])
        nb = a_re.shape[1]
        bandw = (nb - 1) // 2
        wp_re = jnp.pad(win_re, ((0, 0), (0, 0), (bandw, bandw)))
        wp_im = jnp.pad(win_im, ((0, 0), (0, 0), (bandw, bandw)))
        acc_re = jnp.zeros((Bn, F), jnp.float32)
        acc_im = jnp.zeros((Bn, F), jnp.float32)
        for d in range(nb):
            dn = d - bandw
            sh_re = jax.lax.slice_in_dim(wp_re, bandw - dn, bandw - dn + F, axis=2)
            sh_im = jax.lax.slice_in_dim(wp_im, bandw - dn, bandw - dn + F, axis=2)
            kr, ki = a_re[:, d, :], a_im[:, d, :]  # (nj, F)
            acc_re += ein("jf,njf->nf", kr, sh_re) - ein("jf,njf->nf", ki, sh_im)
            acc_im += ein("jf,njf->nf", kr, sh_im) + ein("jf,njf->nf", ki, sh_re)
        lo_re, lo_im = win_re[:, :, :c], -win_im[:, :, :c]  # conj(src)
        hi_re, hi_im = win_re[:, :, F - c :], -win_im[:, :, F - c :]
        add_lo_re = ein("jak,njk->na", blo_re, lo_re) - ein(
            "jak,njk->na", blo_im, lo_im
        )
        add_lo_im = ein("jak,njk->na", blo_re, lo_im) + ein(
            "jak,njk->na", blo_im, lo_re
        )
        add_hi_re = ein("jak,njk->na", bhi_re, hi_re) - ein(
            "jak,njk->na", bhi_im, hi_im
        )
        add_hi_im = ein("jak,njk->na", bhi_re, hi_im) + ein(
            "jak,njk->na", bhi_im, hi_re
        )
        acc_re = acc_re.at[:, :c].add(add_lo_re).at[:, F - c :].add(add_hi_re)
        acc_im = acc_im.at[:, :c].add(add_lo_im).at[:, F - c :].add(add_hi_im)

    if not include_self:
        Q = cst["Q"]
        cur_re, cur_im = win_re[:, Q - 1], win_im[:, Q - 1]
        dga_re = jnp.asarray(cst["diag_a_re"])
        dga_im = jnp.asarray(cst["diag_a_im"])
        dgb_re = jnp.asarray(cst["diag_b_re"])
        dgb_im = jnp.asarray(cst["diag_b_im"])
        acc_re -= dga_re * cur_re - dga_im * cur_im
        acc_im -= dga_re * cur_im + dga_im * cur_re
        acc_re -= dgb_re * cur_re + dgb_im * cur_im  # diag_b · conj(cur)
        acc_im -= -dgb_re * cur_im + dgb_im * cur_re

    norm = jnp.maximum(jnp.sqrt(acc_re**2 + acc_im**2), 1e-16)
    return mg * acc_re / norm, mg * acc_im / norm


def lws(
    mag: Array,
    length: int | None = None,
    n_sweeps: int = 10,
    band: int = 3,
    corner: int = 8,
    include_self: bool = False,
    colors: int = 1,
    params: AudioParams = DEFAULT_PARAMS,
) -> Array:
    """True LWS phase recovery. (..., T, n_freq) → (..., length) waveform.

    Gauss-Seidel frame sweeps of the truncated consistency update, exactly
    matching ``reference.lws`` (parity-tested); with ``colors=1`` it runs as
    one nested ``lax.scan`` (sweeps × frames) on-chip. Each frame step is
    tiny (≈(2·band+1)·(2Q−1) shifted multiply-adds over F bins), so that
    path is sequential-depth-bound on TPU: T·n_sweeps dependent updates.

    ``colors=c > 1`` switches to the *chromatic* Gauss-Seidel schedule
    (the offline twin of :func:`lws_block_push`): frames of equal index mod
    ``c`` update together as ONE batched :func:`_lws_update` (frames folded
    into the batch axis), colors in ascending order — sequential depth
    ``n_sweeps·c`` instead of ``n_sweeps·T``. The frame coupling band is
    |Δm| ≤ Q−1, so for ``c ≥ Q`` same-color frames are mutually uncoupled
    and the schedule is a *valid* Gauss-Seidel ordering (same fixed point,
    just a different visit order); convergence per sweep is measurably
    close to sequential (BASELINE.md A/B). Degenerate check: ``c ≥ T``
    makes every color a single frame in ascending order — bit-identical to
    the sequential sweep (parity-tested).
    """
    if length is None:
        length = mag.shape[-2] * params.hop_length
    cst = _lws_consts(params, band, corner)
    Q = cst["Q"]

    lead = mag.shape[:-2]
    magb = mag.reshape((-1,) + mag.shape[-2:]).astype(jnp.float32)  # (B,T,F)
    Bn, T, F = magb.shape
    nj = 2 * Q - 1

    pad_re = jnp.zeros((Bn, T + 2 * (Q - 1), F), jnp.float32)
    pad_re = pad_re.at[:, Q - 1 : Q - 1 + T, :].set(magb)  # zero-phase init
    pad_im = jnp.zeros_like(pad_re)

    if colors > 1:
        nc = min(colors, T)

        def sweep_mc(carry, _):
            s_re, s_im = carry
            for g in range(nc):
                K = (T - g + nc - 1) // nc
                lo = Q - 1 + g  # region index of the color's first frame
                hi = lo + (K - 1) * nc
                # (B, K, nj, F) neighbor windows of every selected frame,
                # as nj strided slices (static indices; j-shifted slices
                # stay in [0, T+2(Q−1)) — see lws_block_push).
                win_re = jnp.stack(
                    [
                        s_re[:, lo - (Q - 1) + j : hi - (Q - 1) + j + 1 : nc]
                        for j in range(nj)
                    ],
                    axis=2,
                )
                win_im = jnp.stack(
                    [
                        s_im[:, lo - (Q - 1) + j : hi - (Q - 1) + j + 1 : nc]
                        for j in range(nj)
                    ],
                    axis=2,
                )
                mg = magb[:, g::nc]  # (B, K, F)
                up_re, up_im = _lws_update(
                    win_re.reshape(Bn * K, nj, F),
                    win_im.reshape(Bn * K, nj, F),
                    mg.reshape(Bn * K, F),
                    cst,
                    include_self,
                )
                s_re = s_re.at[:, lo : hi + 1 : nc].set(
                    up_re.reshape(Bn, K, F)
                )
                s_im = s_im.at[:, lo : hi + 1 : nc].set(
                    up_im.reshape(Bn, K, F)
                )
            return (s_re, s_im), None

        (pad_re, pad_im), _ = jax.lax.scan(
            sweep_mc, (pad_re, pad_im), None, length=n_sweeps
        )
        spec = jax.lax.complex(
            pad_re[:, Q - 1 : Q - 1 + T], pad_im[:, Q - 1 : Q - 1 + T]
        )
        return istft(spec, length, params).reshape(lead + (length,))

    def frame_step(carry, m):
        s_re, s_im = carry
        win_re = jax.lax.dynamic_slice_in_dim(s_re, m, nj, axis=1)  # (B,2Q-1,F)
        win_im = jax.lax.dynamic_slice_in_dim(s_im, m, nj, axis=1)
        mg = jax.lax.dynamic_slice_in_dim(magb, m, 1, axis=1)[:, 0]
        new_re, new_im = _lws_update(win_re, win_im, mg, cst, include_self)
        s_re = jax.lax.dynamic_update_slice_in_dim(
            s_re, new_re[:, None, :], m + Q - 1, axis=1
        )
        s_im = jax.lax.dynamic_update_slice_in_dim(
            s_im, new_im[:, None, :], m + Q - 1, axis=1
        )
        return (s_re, s_im), None

    def sweep(carry, _):
        carry, _ = jax.lax.scan(frame_step, carry, jnp.arange(T))
        return carry, None

    (pad_re, pad_im), _ = jax.lax.scan(
        sweep, (pad_re, pad_im), None, length=n_sweeps
    )
    spec = jax.lax.complex(
        pad_re[:, Q - 1 : Q - 1 + T], pad_im[:, Q - 1 : Q - 1 + T]
    )
    return istft(spec, length, params).reshape(lead + (length,))


@functools.lru_cache(maxsize=8)
def _lws_online_consts(
    params: AudioParams, band: int, corner: int, look_ahead: int,
    asymmetric: bool,
) -> tuple:
    """Per-head-distance kernel constants for :func:`lws_online`.

    Entry d is the const dict for updating a frame at distance d from the
    stream head: the interior split for d ≥ Q−1 (or always, when
    ``asymmetric=False``), the banded split of the measured end-edge kernels
    (``reference.lws_edge_kernels``) for 1 ≤ d ≤ Q−2, and a DENSE set for
    d = 0 — the head frame's kernels are not band-local (its analysis window
    overlaps the reflect re-analysis pad; see the oracle's docstring), so its
    update is two (2Q−1·F, F) real matmuls (trivial MXU work).
    """
    Q = params.n_fft // params.hop_length
    interior = _lws_consts(params, band, corner)
    if not asymmetric:
        return tuple(interior for _ in range(look_ahead + 1))
    Ae, Be = ref.lws_edge_kernels(params, band, corner)
    out = []
    f32 = lambda x: np.ascontiguousarray(x, dtype=np.float32)  # noqa: E731
    for d in range(look_ahead + 1):
        if d >= Q - 1:
            out.append(interior)
        elif d == 0:
            Ar, Br = Ae[0][::-1], Be[0][::-1]  # pre-reversed like _split_ab
            tr = lambda K: f32(  # noqa: E731
                np.transpose(K, (0, 2, 1)).reshape(-1, K.shape[1])
            )  # (j, a, b) → ((j·b), a): win flattened over (j, b)
            dense = {
                "kr_wre": tr(Ar.real + Br.real),
                "kr_wim": tr(Br.imag - Ar.imag),
                "ki_wre": tr(Ar.imag + Br.imag),
                "ki_wim": tr(Ar.real - Br.real),
            }
            out.append({
                "dense": dense, "Q": Q,
                "diag_a_re": f32(np.diag(Ae[0][Q - 1]).real),
                "diag_a_im": f32(np.diag(Ae[0][Q - 1]).imag),
                "diag_b_re": f32(np.diag(Be[0][Q - 1]).real),
                "diag_b_im": f32(np.diag(Be[0][Q - 1]).imag),
            })
        else:
            out.append(_split_ab(Ae[d], Be[d], Q, band, corner))
    return tuple(out)


def _lws_online_step(csts: tuple, n_sweeps: int, look_ahead: int,
                     include_self: bool):
    """Build the one-frame-arrival scan step shared by :func:`lws_online`
    (whole signal in one scan) and :func:`lws_online_push` (chunked carry).

    Carry: ``(s_re, s_im, mbuf)`` — the rolling complex window (B, W, F)
    with the head at index ``la+Q−1`` and Q−1 always-zero future slots, and
    the (B, la+1, F) magnitudes of the still-refining frames. Emits the
    frame leaving the refinement window (final: nothing ever writes it
    again); the first ``look_ahead`` emissions of a stream are exact zeros
    (pre-signal frames with zero magnitude — the algorithmic latency).
    """
    Q = csts[0]["Q"]
    la = look_ahead
    H = la + Q - 1

    def step(carry, mg_new):
        s_re, s_im, mbuf = carry
        Bn, _, F = s_re.shape
        zero = jnp.zeros((Bn, 1, F), jnp.float32)
        s_re = jnp.concatenate([s_re[:, 1:], zero], axis=1)
        s_im = jnp.concatenate([s_im[:, 1:], zero], axis=1)
        mbuf = jnp.concatenate([mbuf[:, 1:], mg_new[:, None]], axis=1)
        s_re = s_re.at[:, H].set(mg_new)  # zero-phase arrival (im already 0)
        for _ in range(n_sweeps):
            for d in range(la, -1, -1):  # oldest → newest (Gauss-Seidel)
                k = H - d
                win_re = s_re[:, k - (Q - 1) : k + Q]
                win_im = s_im[:, k - (Q - 1) : k + Q]
                new_re, new_im = _lws_update(
                    win_re, win_im, mbuf[:, la - d], csts[d], include_self
                )
                s_re = s_re.at[:, k].set(new_re)
                s_im = s_im.at[:, k].set(new_im)
        return (s_re, s_im, mbuf), (s_re[:, H - la], s_im[:, H - la])

    return step


def lws_online_init(
    n_streams: int,
    look_ahead: int = 2,
    params: AudioParams = DEFAULT_PARAMS,
):
    """Fresh carry for :func:`lws_online_push` (all-zero buffers)."""
    Q = params.n_fft // params.hop_length
    F = params.n_freq
    W = look_ahead + 2 * Q - 1
    z = jnp.zeros((n_streams, W, F), jnp.float32)
    mb = jnp.zeros((n_streams, look_ahead + 1, F), jnp.float32)
    return (z, jnp.zeros_like(z), mb)


def lws_online_drain(
    carry,
    look_ahead: int = 2,
    params: AudioParams = DEFAULT_PARAMS,
):
    """End-of-stream drain: the ``look_ahead`` frames still refining in a
    :func:`lws_online_push` / :func:`lws_block_push` carry.

    Returns ``(re, im)`` of shape (B, look_ahead, F) — the frames that would
    never be emitted by further pushes because no more input arrives. They
    are taken as-is, exactly what offline :func:`lws_online` does with its
    buffer tail after the last arrival step (see its emit logic), so a
    chunked stream that is pushed to completion and then drained emits the
    same final frames as the offline scan. Both streaming carries share this
    buffer layout (head frame at index ``look_ahead + Q - 1``).
    """
    s_re, s_im, _ = carry
    Q = params.n_fft // params.hop_length
    H = look_ahead + Q - 1
    return s_re[:, H - look_ahead + 1 : H + 1], s_im[:, H - look_ahead + 1 : H + 1]


def lws_online_push(
    mag_chunk: Array,
    carry,
    n_sweeps: int = 2,
    look_ahead: int = 2,
    asymmetric: bool = True,
    band: int = 3,
    corner: int = 8,
    include_self: bool = False,
    params: AudioParams = DEFAULT_PARAMS,
):
    """Feed C arriving frames into a live online-LWS stream.

    (B, C, F) magnitudes + carry → ``((emit_re, emit_im), carry)`` where
    emit_* are the (B, C, F) FINALIZED frames — emitted frame c is global
    frame ``total_pushed − C + c − look_ahead``; the first ``look_ahead``
    frames a stream ever emits are exact zeros (latency). Chunking is
    semantics-free: pushing a signal in any chunk sizes emits the same
    frames as one :func:`lws_online` scan over the whole signal (tested).
    Carries are (B, ·, F) jax Arrays — keep them device-resident between
    pushes, one fixed-shape jit per chunk.
    """
    csts = _lws_online_consts(params, band, corner, look_ahead, asymmetric)
    step = _lws_online_step(csts, n_sweeps, look_ahead, include_self)
    magb = mag_chunk.astype(jnp.float32)
    carry, (ys_re, ys_im) = jax.lax.scan(
        step, carry, jnp.moveaxis(magb, 1, 0)
    )
    return (jnp.moveaxis(ys_re, 0, 1), jnp.moveaxis(ys_im, 0, 1)), carry


def lws_online(
    mag: Array,
    length: int | None = None,
    n_sweeps: int = 2,
    look_ahead: int = 2,
    asymmetric: bool = True,
    band: int = 3,
    corner: int = 8,
    include_self: bool = False,
    params: AudioParams = DEFAULT_PARAMS,
) -> Array:
    """Online (streaming) LWS phase recovery, (..., T, n_freq) → (..., length).

    ``lax.scan`` twin of the float64 oracle ``reference.lws_online``
    (parity-tested) — the online/asymmetric-window mode of the reference's
    ``lws`` C library (SURVEY §7.3 hard-part #2), TPU-native. Frames arrive
    one per scan step; the step refines frames m−look_ahead…m with
    ``n_sweeps`` Gauss-Seidel passes over a VMEM-resident rolling window of
    look_ahead+2Q−1 frames and emits frame m−look_ahead, which is final —
    the algorithmic latency is exactly ``look_ahead`` frames (prefix
    equivariance is tested). ``asymmetric=True`` updates near-head frames
    with the measured end-edge ("asymmetric window") kernels so each
    provisional phase is exact for the signal-as-received; ``False`` uses
    the interior kernels over zero-extended future frames.

    Fixed per-frame work; like :func:`lws` this path is
    sequential-depth-bound on TPU — for bulk offline vocoding prefer
    fast-GL (:func:`magspec_to_waveform_lws`); for low-latency serving the
    chunked :class:`~advoc_tpu.infer.vocoder.StreamingVocoder` remains the
    production path (BASELINE.md).
    """
    if length is None:
        length = mag.shape[-2] * params.hop_length
    csts = _lws_online_consts(params, band, corner, look_ahead, asymmetric)
    Q = csts[0]["Q"]
    la = look_ahead
    lead = mag.shape[:-2]
    magb = mag.reshape((-1,) + mag.shape[-2:]).astype(jnp.float32)  # (B,T,F)
    Bn, T, F = magb.shape
    if T <= la:
        raise ValueError(f"need T > look_ahead (got T={T}, la={la})")
    H = la + Q - 1  # head index in the rolling buffer
    step = _lws_online_step(csts, n_sweeps, la, include_self)
    (s_re, s_im, _), (ys_re, ys_im) = jax.lax.scan(
        step, lws_online_init(Bn, la, params), jnp.moveaxis(magb, 1, 0)
    )
    # Step m emits frame m−la (final); the last la frames stay in the buffer.
    head_re = jnp.moveaxis(ys_re[la:], 0, 1)  # frames 0…T−1−la
    head_im = jnp.moveaxis(ys_im[la:], 0, 1)
    tail_re = s_re[:, H - la + 1 : H + 1]  # frames T−la…T−1
    tail_im = s_im[:, H - la + 1 : H + 1]
    spec = jax.lax.complex(
        jnp.concatenate([head_re, tail_re], 1),
        jnp.concatenate([head_im, tail_im], 1),
    )
    return istft(spec, length, params).reshape(lead + (length,))


def lws_block_push(
    mag_chunk: Array,
    carry,
    n_sweeps: int = 3,
    look_ahead: int = 2,
    colors: int = 4,
    init: str = "advance",
    band: int = 3,
    corner: int = 8,
    include_self: bool = False,
    params: AudioParams = DEFAULT_PARAMS,
):
    """Block-parallel streaming LWS: one whole chunk per arrival.

    Same stream contract as :func:`lws_online_push` — (B, C, F) magnitudes +
    carry (from :func:`lws_online_init`) → ``((emit_re, emit_im), carry)``,
    emitting the C frames that left the ``look_ahead``-deep refinement
    window (the first ``look_ahead`` frames a stream ever emits are exact
    zeros) — but the update schedule is redesigned for TPU sequential depth.
    :func:`lws_online_push` runs ``C × n_sweeps × (look_ahead+1)`` strictly
    dependent single-frame updates per chunk (the scan twin of the oracle's
    per-frame arrival semantics). This variant admits the whole chunk at
    once and runs ``n_sweeps`` *multicolor Gauss-Seidel* sweeps over the
    ``look_ahead + C`` still-mutable frames: frames of equal index mod
    ``colors`` update together as ONE batched :func:`_lws_update` (frames
    folded into the batch axis — MXU/VPU-fat work), colors in ascending
    order so that with ``colors ≥ Q−1`` every update still sees already-
    updated left neighbors within the coupling band (|Δm| ≤ Q−1).
    Sequential depth per chunk drops from ``C·n_sweeps·(la+1)`` (384 at the
    serving shape C=64, sweeps=2, la=2) to ``n_sweeps·colors`` (12).

    ``colors=1`` is pure Jacobi (every mutable frame from the same pre-sweep
    state). ``init`` seeds newly arrived frames: ``"zero"`` = zero phase;
    ``"advance"`` = the carried head frame's phase advanced by the hop phase
    ramp ``e^{i·2π·hop·k·o/n_fft}`` per bin k and frame offset o (linear
    extrapolation — the vocoder/RTISI prediction, computed in closed form
    for the whole block so it stays parallel).

    Differences from :func:`lws_online_push` (documented, tested): chunking
    is NOT semantics-free (the sweep schedule sees chunk boundaries), and
    near-head frames always use the symmetric interior kernels over the
    zero-extended future (BASELINE.md measured sym ≥ asym on the fixture).
    Use this engine when device time per push matters; ``lws_online_push``
    when per-frame-arrival exactness matters.
    """
    if colors < 1:
        raise ValueError(f"colors must be ≥ 1 (got {colors})")
    if init not in ("zero", "advance"):
        raise ValueError(f"unknown init {init!r}")
    cst = _lws_consts(params, band, corner)
    Q = cst["Q"]
    la = look_ahead
    H = la + Q - 1  # head index in the carried window (frame t)
    nj = 2 * Q - 1
    s_re, s_im, mbuf = carry
    magb = mag_chunk.astype(jnp.float32)
    Bn, C, F = magb.shape
    n_mut = la + C  # mutable frames: t−la+1 … t+C

    # Region buffer over frames t−(la+Q−1) … t+C plus Q−1 zero future slots:
    # [carried window through the head | C new frames | zeros].
    zeros_fut = jnp.zeros((Bn, Q - 1, F), jnp.float32)
    if init == "advance":
        head_re, head_im = s_re[:, H], s_im[:, H]  # frame t (zero at start)
        nrm = jnp.sqrt(head_re**2 + head_im**2)
        safe = nrm > 1e-12
        u_re = jnp.where(safe, head_re / jnp.maximum(nrm, 1e-12), 1.0)
        u_im = jnp.where(safe, head_im / jnp.maximum(nrm, 1e-12), 0.0)
        theta = (
            2.0 * np.pi * params.hop_length / params.n_fft
        ) * np.arange(F, dtype=np.float64)  # per-bin hop phase advance
        offs = np.arange(1, C + 1, dtype=np.float64)[:, None]  # frame t+o
        ramp_re = jnp.asarray(np.cos(offs * theta), jnp.float32)  # (C, F)
        ramp_im = jnp.asarray(np.sin(offs * theta), jnp.float32)
        new_re = magb * (u_re[:, None] * ramp_re - u_im[:, None] * ramp_im)
        new_im = magb * (u_re[:, None] * ramp_im + u_im[:, None] * ramp_re)
    else:
        new_re, new_im = magb, jnp.zeros_like(magb)
    reg_re = jnp.concatenate([s_re[:, : H + 1], new_re, zeros_fut], axis=1)
    reg_im = jnp.concatenate([s_im[:, : H + 1], new_im, zeros_fut], axis=1)
    # Magnitudes of the mutable frames, aligned to region index H−la+1+i:
    # carried provisional mags (mbuf[:, la−d] is frame t−d) then the chunk.
    magr = jnp.concatenate([mbuf[:, 1:], magb], axis=1)  # (B, n_mut, F)

    first_mut = H - la + 1  # region index of frame t−la+1 (≥ 1, so the
    # j-shifted window slices below never go out of range)
    nc = min(colors, n_mut)
    for _ in range(n_sweeps):
        for g in range(nc):
            K = (n_mut - g + nc - 1) // nc
            lo = first_mut + g  # first selected region index
            hi = lo + (K - 1) * nc  # last selected region index
            win_re = jnp.stack(
                [
                    reg_re[:, lo - (Q - 1) + j : hi - (Q - 1) + j + 1 : nc]
                    for j in range(nj)
                ],
                axis=2,
            )  # (B, K, nj, F): window of each selected frame
            win_im = jnp.stack(
                [
                    reg_im[:, lo - (Q - 1) + j : hi - (Q - 1) + j + 1 : nc]
                    for j in range(nj)
                ],
                axis=2,
            )
            mg = magr[:, g::nc]  # (B, K, F)
            up_re, up_im = _lws_update(
                win_re.reshape(Bn * K, nj, F),
                win_im.reshape(Bn * K, nj, F),
                mg.reshape(Bn * K, F),
                cst,
                include_self,
            )
            reg_re = reg_re.at[:, lo : hi + 1 : nc].set(
                up_re.reshape(Bn, K, F)
            )
            reg_im = reg_im.at[:, lo : hi + 1 : nc].set(
                up_im.reshape(Bn, K, F)
            )

    # Emit frames t−la+1 … t+C−la (C frames, now final); carry the rest.
    em_re = reg_re[:, first_mut : first_mut + C]
    em_im = reg_im[:, first_mut : first_mut + C]
    new_carry = (reg_re[:, C:], reg_im[:, C:], magr[:, -(la + 1) :])
    return (em_re, em_im), new_carry


def magspec_to_waveform_lws(
    mag: Array,
    n_iters: int = 30,
    params: AudioParams = DEFAULT_PARAMS,
) -> Array:
    """LWS-quality phase recovery, TPU-native.

    The reference's default phase path is the native ``lws`` C extension
    (SURVEY §2.1 #4, §2.3). Both candidates exist here on-chip — true LWS
    (:func:`lws`, Gauss-Seidel sweeps of the truncated consistency kernel)
    and fast Griffin-Lim (momentum 0.99) — and this ships the measured
    winner: at matched device time on v5e (batch 8 × 256 frames), fast-GL
    30 iters = 17.3 ms, re-extracted mel L1 0.0041 vs true LWS 5 sweeps =
    18.6 ms, mel L1 0.0079 (full table in BASELINE.md). True LWS remains
    selectable via ``r9y9_melspec_to_waveform(phase_method="lws_exact")``.
    """
    return griffin_lim(mag, n_iters=n_iters, momentum=0.99, params=params)


def r9y9_melspec_to_waveform(
    mel: Array,
    n_iters: int = 60,
    phase_method: str = "lws",
    params: AudioParams = DEFAULT_PARAMS,
) -> Array:
    """Full heuristic-inversion vocoder (SURVEY §3.3; BASELINE config 1).

    (..., T, n_mels) normalized mel → (..., T*hop) waveform, one jit region.

    phase_method: "lws" = the shipped quality path (fast-GL momentum 0.99 —
    see :func:`magspec_to_waveform_lws` for the measured A/B vs true LWS);
    "lws_exact" = the true Local Weighted Sums sweeps (:func:`lws`, n_iters
    counts sweeps); "lws_chromatic" = the same fixed point on the
    4-color schedule (n_iters·4 sequential depth instead of n_iters·T —
    the device-time option for true LWS); "lws_online" = causal streaming
    LWS with asymmetric-window head updates (:func:`lws_online`, n_iters
    counts per-arrival sweeps, default look-ahead); "griffin_lim" =
    classic G-L.
    """
    mag = r9y9_melspec_to_magspec(mel, params)
    if phase_method == "lws":
        return magspec_to_waveform_lws(mag, n_iters=n_iters, params=params)
    if phase_method == "lws_exact":
        return lws(mag, n_sweeps=n_iters, params=params)
    if phase_method == "lws_chromatic":
        return lws(mag, n_sweeps=n_iters, colors=4, params=params)
    if phase_method == "lws_online":
        return lws_online(mag, n_sweeps=n_iters, params=params)
    if phase_method == "griffin_lim":
        return magspec_to_waveform_griffin_lim(mag, n_iters=n_iters, params=params)
    raise ValueError(f"unknown phase_method: {phase_method!r}")
