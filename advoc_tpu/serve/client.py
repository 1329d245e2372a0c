"""Blocking client for the streaming vocoder server.

One socket = one leased stream slot on the server. The client is
deliberately synchronous (one outstanding push per connection — the
server's per-slot contract); run many clients from threads or processes
for concurrency, as `scripts/vocode_server.py --selftest` and
`tests/test_serve.py` do.
"""

from __future__ import annotations

import json
import socket

import numpy as np

from advoc_tpu.serve import protocol as pr


class VocodeClient:
    """Connect, lease a slot, and vocode mel chunks over TCP.

    ``config`` (from the server's CONFIG frame) carries the serving
    contract: chunk_frames × n_mels input in ``mel_dtype``,
    ``emit_samples`` output samples per push in ``emit_dtype``, plus the
    stream-start latency fields (``preroll_samples``, ``latency_frames``)
    the caller drops once per utterance — same semantics as
    :class:`advoc_tpu.infer.StreamingVocoder`.
    """

    def __init__(self, host: str, port: int, timeout: float = 120.0):
        self._sock = socket.create_connection((host, port), timeout=timeout)
        op, payload = pr.read_frame_sync(self._sock)
        if op == pr.OP_ERR:
            raise ConnectionError(payload.decode())
        if op != pr.OP_CONFIG:
            raise ConnectionError(f"expected CONFIG, got op {op}")
        self.config = json.loads(payload.decode())
        self._mel_dtype = np.dtype(self.config["mel_dtype"])
        self._emit_dtype = np.dtype(self.config["emit_dtype"])

    @property
    def slot(self) -> int:
        return self.config["slot"]

    def vocode(self, mel_chunk: np.ndarray) -> np.ndarray:
        """(chunk_frames, n_mels) mel → (emit_samples,) waveform samples."""
        mel = np.ascontiguousarray(mel_chunk, dtype=self._mel_dtype)
        want = (self.config["chunk_frames"], self.config["n_mels"])
        if mel.shape != want:
            raise ValueError(f"mel chunk must be {want}, got {mel.shape}")
        self._sock.sendall(pr.pack(pr.OP_PUSH, mel.tobytes()))
        op, payload = pr.read_frame_sync(self._sock)
        if op == pr.OP_ERR:
            raise RuntimeError(payload.decode())
        if op != pr.OP_PCM:
            raise RuntimeError(f"expected PCM, got op {op}")
        return np.frombuffer(payload, self._emit_dtype)

    def flush(self) -> np.ndarray:
        """End the current utterance: returns the stream's pending
        ``config["flush_samples"]`` samples (the engine's look-ahead/overlap
        tail — without this call the utterance's final samples are lost)
        and resets the slot for a new utterance. Full-utterance assembly:
        drop the first ``flush_samples`` (= preroll + latency) of
        ``concat(pushes) + flush()`` and crop to the true length."""
        self._sock.sendall(pr.pack(pr.OP_FLUSH))
        op, payload = pr.read_frame_sync(self._sock)
        if op == pr.OP_ERR:
            raise RuntimeError(payload.decode())
        if op != pr.OP_PCM:
            raise RuntimeError(f"expected PCM, got op {op}")
        return np.frombuffer(payload, self._emit_dtype)

    def reset(self) -> None:
        """Start a new utterance in this slot (applies before the next
        push; no reply frame)."""
        self._sock.sendall(pr.pack(pr.OP_RESET))

    def close(self) -> None:
        try:
            self._sock.sendall(pr.pack(pr.OP_BYE))
        except OSError:
            pass
        self._sock.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
