"""Metrics / observability: TensorBoard summaries + stdout step logs.

The reference's de-facto UX (SURVEY.md §5): tf.summary scalars (d_loss,
g_loss, L1), spectrogram image summaries, audio summaries of vocoded eval
samples. Reproduced on tensorboardX-free stack via tensorflow's pure-python
summary writer if available, else a minimal self-contained event writer.

TPU hygiene: callers pass *device* metric dicts; :func:`to_host` fetches them
with ONE transfer (stacked), never per-scalar readbacks (slow over the axon
tunnel).
"""

from __future__ import annotations

import time
from typing import Mapping

import jax
import numpy as np


def to_host(metrics: Mapping[str, jax.Array]) -> dict[str, float]:
    """Fetch a dict of device scalars with a single transfer."""
    keys = sorted(metrics.keys())
    import jax.numpy as jnp

    stacked = jnp.stack([jnp.asarray(metrics[k], jnp.float32) for k in keys])
    vals = np.asarray(jax.device_get(stacked))
    return {k: float(v) for k, v in zip(keys, vals)}


class SummaryWriter:
    """Scalar/image/audio summaries; thin wrapper over TF's summary writer
    with a no-op fallback (keeps the harness importable anywhere)."""

    def __init__(self, logdir: str):
        self.logdir = str(logdir)
        self._tf = None
        try:
            import tensorflow as tf  # installed on this machine; CPU-only use

            self._tf = tf
            self._writer = tf.summary.create_file_writer(self.logdir)
        except Exception:
            self._writer = None

    def scalars(self, step: int, values: Mapping[str, float]) -> None:
        if self._writer is None:
            return
        tf = self._tf
        with self._writer.as_default():
            for k, v in values.items():
                tf.summary.scalar(k, v, step=step)
            self._writer.flush()

    def image(self, step: int, tag: str, img: np.ndarray) -> None:
        """img: (H, W) or (H, W, C) float in [0,1] (e.g. a spectrogram)."""
        if self._writer is None:
            return
        tf = self._tf
        if img.ndim == 2:
            img = img[..., None]
        with self._writer.as_default():
            tf.summary.image(tag, img[None].astype(np.float32), step=step)
            self._writer.flush()

    def audio(self, step: int, tag: str, wav: np.ndarray, sample_rate: int) -> None:
        """wav: (T,) float in [-1,1]."""
        if self._writer is None:
            return
        tf = self._tf
        with self._writer.as_default():
            tf.summary.audio(
                tag,
                np.clip(wav, -1, 1).reshape(1, -1, 1).astype(np.float32),
                sample_rate,
                step=step,
            )
            self._writer.flush()


class StepTimer:
    """Wall-clock steps/sec with warmup exclusion."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.count = 0
        self.t0 = None

    def tick(self) -> float | None:
        self.count += 1
        if self.count == self.warmup:
            self.t0 = time.perf_counter()
            return None
        if self.t0 is None or self.count <= self.warmup:
            return None
        return (self.count - self.warmup) / (time.perf_counter() - self.t0)
