"""Audio I/O: decode WAV → float32 mono PCM, save float arrays as 16-bit WAV.

Mirrors the reference's expected ``advoc/audioio.py`` surface (SURVEY.md §2.1
#1: ``decode_audio``, ``save_as_wav``). Decoding goes through the native C++
parser (:mod:`advoc_tpu.data.native`) when available, with a pure
numpy/stdlib fallback; resampling is a scipy polyphase filter on the host
(done once at dataset-prep time, never in the training hot path).
"""

from __future__ import annotations

import ctypes
import pathlib
import wave

import numpy as np

from advoc_tpu.data import native


def _decode_native(path: str) -> tuple[np.ndarray, int]:
    lib = native.load()
    sr = ctypes.c_int()
    ch = ctypes.c_int()
    nf = ctypes.c_long()
    bits = ctypes.c_int()
    rc = lib.advoc_wav_info(path.encode(), sr, ch, nf, bits)
    if rc != 0:
        raise ValueError(f"cannot parse wav {path!r} (rc={rc})")
    out = np.empty(nf.value, dtype=np.float32)
    n = lib.advoc_wav_decode(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), nf.value
    )
    if n < 0:
        raise ValueError(f"decode failed for {path!r} (rc={n})")
    return out[:n], sr.value


def _decode_fallback(path: str) -> tuple[np.ndarray, int]:
    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif width == 3:
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        v = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        v = np.where(v & 0x800000, v - (1 << 24), v)
        x = v.astype(np.float32) / 8388608.0
    else:
        raise ValueError(f"unsupported sample width {width} in {path!r}")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x, sr


def resample(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Polyphase resampling (host, prep-time only)."""
    if sr_in == sr_out:
        return x
    from scipy.signal import resample_poly
    from math import gcd

    g = gcd(sr_in, sr_out)
    return resample_poly(x, sr_out // g, sr_in // g).astype(np.float32)


def decode_audio(
    path: str | pathlib.Path,
    target_sample_rate: int | None = None,
    normalize: bool = False,
) -> np.ndarray:
    """Decode a WAV file to mono float32 in [-1, 1].

    Resamples to ``target_sample_rate`` if given; ``normalize`` rescales to
    0.95 peak (the loader's optional gain normalization, SURVEY.md §2.1 #5).
    """
    path = str(path)
    try:
        x, sr = _decode_native(path)
    except (native.NativeUnavailable, ValueError):
        x, sr = _decode_fallback(path)
    if target_sample_rate is not None and sr != target_sample_rate:
        x = resample(x, sr, target_sample_rate)
    if normalize:
        peak = np.abs(x).max()
        if peak > 0:
            x = x * (0.95 / peak)
    return np.ascontiguousarray(x, dtype=np.float32)


def decode_audio_slice(path: str, start: int, count: int) -> np.ndarray:
    """Decode only frames [start, start+count) (zero-padded past EOF).

    Uses the native slice reader so random crops never decode whole files.
    """
    try:
        lib = native.load()
        out = np.empty(count, dtype=np.float32)
        n = lib.advoc_wav_decode_slice(
            str(path).encode(),
            start,
            count,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if n >= 0:
            return out
    except native.NativeUnavailable:
        pass
    x = decode_audio(path)
    out = np.zeros(count, dtype=np.float32)
    seg = x[start : start + count]
    out[: len(seg)] = seg
    return out


def wav_num_frames(path: str) -> tuple[int, int]:
    """(n_frames, sample_rate) without decoding samples."""
    try:
        lib = native.load()
        sr = ctypes.c_int()
        ch = ctypes.c_int()
        nf = ctypes.c_long()
        bits = ctypes.c_int()
        if lib.advoc_wav_info(str(path).encode(), sr, ch, nf, bits) == 0:
            return nf.value, sr.value
    except native.NativeUnavailable:
        pass
    with wave.open(str(path), "rb") as w:
        return w.getnframes(), w.getframerate()


def save_as_wav(
    x: np.ndarray, path: str | pathlib.Path, sample_rate: int = 22050
) -> None:
    """Save mono float32 samples as 16-bit PCM WAV (reference API name)."""
    x = np.asarray(x, dtype=np.float32).reshape(-1)
    try:
        lib = native.load()
        rc = lib.advoc_wav_write(
            str(path).encode(),
            np.ascontiguousarray(x).ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(x),
            sample_rate,
        )
        if rc == 0:
            return
    except native.NativeUnavailable:
        pass
    # round-to-nearest to match the native writer (wavio.cc lrintf) and the
    # StreamingVocoder on-device int16 emit path bit-for-bit.
    pcm = np.round(np.clip(x, -1.0, 1.0) * 32767.0).astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
