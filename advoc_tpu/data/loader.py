"""Waveform slice loader: file list → batched fixed-length float32 slices.

Mirrors the reference's ``advoc/loader.py`` single public entry point
(SURVEY.md §2.1 #5, ≈``decode_extract_and_batch``), redesigned for TPU:

* The host only decodes and slices raw waveforms (native C++ slice reads —
  random crops never decode whole files); **feature extraction happens
  on-device inside the jitted step**, where the featurizer rides the MXU.
* A thread pool decodes slices concurrently and a background queue keeps
  ``prefetch`` batches ready, so host I/O overlaps device compute.
* :func:`device_prefetch` additionally moves batches to the device (with an
  optional ``NamedSharding`` for data parallelism) one step ahead.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterable, Iterator, Sequence

import numpy as np

from advoc_tpu.data import audioio


def synthetic_speech(
    seed: int, n_samples: int, sample_rate: int = 22050
) -> np.ndarray:
    """Deterministic speech-like audio (harmonic source + formants + noise).

    Test/bench fixture generator — no dataset ships with this machine
    (SURVEY.md §4: parity fixtures must be self-generated).
    """
    rng = np.random.default_rng(seed)
    t = np.arange(n_samples, dtype=np.float64) / sample_rate
    # Wandering pitch 90–220 Hz.
    f0 = 140.0 + 60.0 * np.sin(2 * np.pi * 0.7 * t + rng.uniform(0, 6.28))
    phase = 2 * np.pi * np.cumsum(f0) / sample_rate
    x = np.zeros_like(t)
    for k, amp in enumerate([1.0, 0.6, 0.45, 0.3, 0.22, 0.15, 0.1, 0.07], start=1):
        x += amp * np.sin(k * phase + rng.uniform(0, 6.28))
    # Formant-ish colored noise.
    noise = rng.standard_normal(n_samples)
    x += 0.08 * np.convolve(noise, np.hanning(32) / 16.0, mode="same")
    # Syllabic amplitude envelope.
    env = 0.5 * (1 + np.sin(2 * np.pi * 2.8 * t + rng.uniform(0, 6.28)))
    x *= 0.2 + 0.8 * env**1.5
    x = x / np.abs(x).max() * 0.7
    return x.astype(np.float32)


STRESS_KINDS = ("silence", "clipping", "noise", "chirp", "tone", "dc")


def stress_fixture(
    kind: str, n_samples: int, sample_rate: int = 22050, seed: int = 0
) -> np.ndarray:
    """Degenerate/adversarial eval inputs (SURVEY.md §4 self-generated
    fixtures; VERDICT r1 missing #4): characterize vocoder behavior outside
    the speech-like fixture distribution. Classes:

    * ``silence`` — all zeros (G-L must not NaN on zero magnitude).
    * ``clipping`` — speech driven 4× past full scale and hard-clipped
      (dense odd-harmonic splatter across the whole band).
    * ``noise`` — white Gaussian noise (phase recovery has no harmonic
      structure to lock onto; the hardest class for G-L).
    * ``chirp`` — linear 50 Hz → 8 kHz sweep (sweeps through every mel band,
      exposes time-frequency smearing at band edges).
    * ``tone`` — steady 440 Hz sine (narrowband line between mel centers).
    * ``dc`` — constant offset plus quiet speech (energy below fmin=125 Hz
      is invisible to the mel basis and unrecoverable by design).
    """
    rng = np.random.default_rng(seed)
    t = np.arange(n_samples, dtype=np.float64) / sample_rate
    if kind == "silence":
        x = np.zeros(n_samples)
    elif kind == "clipping":
        x = np.clip(
            4.0 * synthetic_speech(seed, n_samples, sample_rate), -0.95, 0.95
        )
    elif kind == "noise":
        x = rng.standard_normal(n_samples)
        x = 0.7 * x / np.abs(x).max()
    elif kind == "chirp":
        f = 50.0 + (8000.0 - 50.0) * np.arange(n_samples) / max(n_samples, 1)
        x = 0.7 * np.sin(2 * np.pi * np.cumsum(f) / sample_rate)
    elif kind == "tone":
        x = 0.7 * np.sin(2 * np.pi * 440.0 * t)
    elif kind == "dc":
        x = 0.4 + 0.3 * synthetic_speech(seed, n_samples, sample_rate)
    else:
        raise ValueError(f"unknown stress kind {kind!r}; one of {STRESS_KINDS}")
    return np.asarray(x, np.float32)


def _slice_plan_eval(n_frames: int, slice_len: int, hop: int) -> list[int]:
    if n_frames <= slice_len:
        return [0]
    return list(range(0, n_frames - slice_len + 1, hop))


_MULAW_LN256 = float(np.log(256.0))


def mulaw8_encode(x: np.ndarray) -> np.ndarray:
    """μ-law-compand a float waveform in [-1, 1] to int8 (μ = 255).

    A quarter-byte wire: ``y = sign(x)·log1p(255·|x|)/ln(256)`` quantized
    to 255 levels (±127; −128 unused so the code is symmetric). NOT
    lossless — 8-bit μ-law carries ~38 dB SNR on speech-shaped signals
    (worst-case absolute error ~0.022 near full scale, relative error ~2%
    in the small-signal region the companding protects). The device-side
    inverse is ``train.gan.as_waveform`` (int8 branch).

    **FAILED the advoc training-wire gate — do not train on it** (measured
    3-seed A/B, BASELINE.md r4 "mulaw8 wire"): the −38 dB waveform noise
    is inaudible-ish in sample space but the r9y9 pipeline regresses
    *normalized-dB* targets, and log compression lifts the quantization
    floor into every low-energy TF bin — the wire shifts the dB-domain
    magnitude target by 0.38 L1 (mel input by 0.13; int16: 0.0002), so
    the generator learns the lifted floor and evals at L1 ≈ 0.32 vs the
    clean-wire 0.022 — worse than the raw heuristic. Kept for
    waveform-domain links where sample SNR is the right criterion.
    """
    y = np.sign(x) * np.log1p(255.0 * np.minimum(np.abs(x), 1.0)) / _MULAW_LN256
    return np.clip(np.rint(y * 127.0), -127, 127).astype(np.int8)


class _ProducerError:
    """Queue envelope carrying an exception from the producer thread."""

    def __init__(self, exc: BaseException):
        self.exc = exc


def decode_extract_and_batch(
    fps: Sequence[str],
    batch_size: int,
    slice_len: int,
    repeat: bool = True,
    shuffle: bool = True,
    seed: int = 0,
    normalize: bool = False,
    num_workers: int = 8,
    prefetch: int = 4,
    drop_remainder: bool = True,
    sample_rate: int | None = None,
    out_dtype: str = "float32",
) -> Iterator[np.ndarray]:
    """Yield (batch_size, slice_len) waveform batches.

    ``out_dtype``: "float32" (default), "int16", or "mulaw8". int16 batches carry
    ``round(x·32768)`` (the exact inverse of the wav decoder's /32768 and of
    ``train.gan.as_waveform``) — lossless for 16-bit PCM sources (LJSpeech and the
    synthetic fixtures are PCM16) and HALF the host→device bytes, which is
    the training bottleneck on slow interconnects (the axon tunnel moves
    ~23 MB/s: a 16×65536 f32 batch costs ~220 ms on the wire vs ~130 ms as
    int16 — BASELINE.md). "mulaw8" ships μ-law-companded int8 (quarter the
    f32 bytes; lossy ~38 dB) — it **failed the training quality gate**
    (eval L1 0.32 vs 0.022, 3-seed A/B in BASELINE.md r4: log-domain
    targets amplify the quantization floor ~20×; see
    :func:`mulaw8_encode`) and is kept only for waveform-domain
    experiments. The jitted train steps normalize integer wires back to
    float on device (``train.gan.as_waveform``).

    Training mode (``repeat=True, shuffle=True``): infinite stream of random
    crops (random file, random offset). Eval mode (``repeat=False,
    shuffle=False``): one pass of sequential non-overlapping windows per file.
    Matches the reference loader's contract (SURVEY.md §3.1), minus tf.data.

    ``sample_rate``: when given, every file's header rate must match it —
    the featurizer's time base (hop/window in samples) silently changes
    meaning otherwise. The hot path never resamples; mismatched data must go
    through scripts/prepare_dataset.py first.

    A decode error in the producer thread is re-raised in the consumer (the
    stream must die loudly, not end as if the epoch completed).
    """
    fps = list(map(str, fps))
    if not fps:
        raise ValueError("empty file list")
    rng = np.random.default_rng(seed)

    meta = [audioio.wav_num_frames(fp) for fp in fps]
    if sample_rate is not None:
        bad = [(fp, sr) for fp, (_, sr) in zip(fps, meta) if sr != sample_rate]
        if bad:
            fp0, sr0 = bad[0]
            raise ValueError(
                f"{len(bad)} file(s) are not at the expected {sample_rate} Hz "
                f"(e.g. {fp0}: {sr0} Hz); resample them first with "
                "scripts/prepare_dataset.py"
            )

    if out_dtype not in ("float32", "int16", "mulaw8"):
        raise ValueError(
            f"out_dtype must be float32, int16 or mulaw8, got {out_dtype!r}"
        )

    def decode_one(args) -> np.ndarray:
        fp, start = args
        x = audioio.decode_audio_slice(fp, start, slice_len)
        if normalize:
            peak = np.abs(x).max()
            if peak > 0:
                x = x * (0.95 / peak)
        if out_dtype == "int16":
            # ×32768 mirrors the decoder's /32768: PCM16 samples round-trip
            # to their exact original integer values.
            return np.clip(np.rint(x * 32768.0), -32768, 32767).astype(np.int16)
        if out_dtype == "mulaw8":
            return mulaw8_encode(x)
        return x

    def gen_indices() -> Iterable[tuple[str, int]]:
        if repeat:
            while True:
                i = int(rng.integers(len(fps)))
                n, _ = meta[i]
                start = int(rng.integers(max(1, n - slice_len + 1)))
                yield fps[i], start
        else:
            for fp, (n, _) in zip(fps, meta):
                for start in _slice_plan_eval(n, slice_len, slice_len):
                    yield fp, start

    stop = threading.Event()
    q: queue.Queue = queue.Queue(maxsize=prefetch)
    _SENTINEL = object()

    def put_or_stop(item) -> bool:
        """Bounded put that never deadlocks: if the consumer stopped (queue
        full forever), give up instead of blocking the thread for good."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        pool = ThreadPoolExecutor(max_workers=num_workers)
        try:
            batch: list = []
            for item in gen_indices():
                if stop.is_set():
                    return
                batch.append(item)
                if len(batch) == batch_size:
                    arrs = list(pool.map(decode_one, batch))
                    if not put_or_stop(np.stack(arrs)):
                        return
                    batch = []
            if batch and not drop_remainder:
                arrs = list(pool.map(decode_one, batch))
                put_or_stop(np.stack(arrs))
        except BaseException as exc:  # noqa: BLE001 — re-raised in consumer
            put_or_stop(_ProducerError(exc))
        finally:
            pool.shutdown(wait=False)
            put_or_stop(_SENTINEL)

    thread = threading.Thread(target=producer, daemon=True)
    thread.start()

    def iterate():
        try:
            while True:
                item = q.get()
                if item is _SENTINEL:
                    return
                if isinstance(item, _ProducerError):
                    raise item.exc
                yield item
        finally:
            stop.set()

    return iterate()


class DeviceCorpus:
    """HBM-resident training corpus: random crops sampled ON DEVICE.

    With the device step at ~28 ms, CLI training on slow interconnects is
    bound by the host→device batch wire (20.4 steps/s vs the ~35 the device
    allows — BASELINE.md r4 wire table). When the corpus fits in HBM (the
    13k-file LJSpeech-scale rehearsal is ≈2.6 GB as int16 vs 16 GB), staging
    it once removes the wire from the steady-state loop entirely: the host
    ships only a (B,) int32 vector of crop start positions per step (64
    bytes at B=16) and the jitted train step gathers the int16 crops from
    the staged buffer (`gather` below, fused into the step).

    **Bit-identical to the int16 wire at matched seed:** `starts()` draws
    (file, offset) with the exact numpy-RNG call sequence of
    :func:`decode_extract_and_batch`'s training mode (uniform file, uniform
    offset — SURVEY §2.1 #5 contract), and the staged buffer holds the same
    round(x·32768) samples the wire loader ships, so the gathered batch
    equals the wire batch exactly (asserted in tests/test_data.py). Files
    shorter than ``slice_len`` are zero-padded at stage time, matching the
    wire decoder's tail padding.

    ``sharding``: optional fully-replicated NamedSharding for DP meshes
    (each device holds the whole corpus; gather indices arrive sharded on
    'data' so every device gathers only its rows). Single-process only —
    multi-host training should keep the per-host wire loader.
    """

    def __init__(self, fps: Sequence[str], slice_len: int,
                 sample_rate: int | None = None, sharding=None):
        import jax
        import jax.numpy as jnp

        fps = list(map(str, fps))
        if not fps:
            raise ValueError("empty file list")
        meta = [audioio.wav_num_frames(fp) for fp in fps]
        if sample_rate is not None:
            bad = [(fp, sr) for fp, (_, sr) in zip(fps, meta)
                   if sr != sample_rate]
            if bad:
                raise ValueError(
                    f"{len(bad)} file(s) not at {sample_rate} Hz "
                    f"(e.g. {bad[0][0]}: {bad[0][1]} Hz); resample first"
                )
        self.slice_len = int(slice_len)
        self.n_files = len(fps)
        self._lens = np.array([n for n, _ in meta], np.int64)

        chunks, offsets = [], []
        pos = 0
        for fp, (n, _) in zip(fps, meta):
            x = audioio.decode_audio(fp)
            # Same samples the int16 wire ships: round(x·32768) — the exact
            # inverse of the decoder's /32768, lossless for PCM16 sources.
            xi = np.clip(np.rint(np.asarray(x) * 32768.0),
                         -32768, 32767).astype(np.int16)
            if len(xi) < slice_len:  # wire decoder zero-pads short reads
                xi = np.pad(xi, (0, slice_len - len(xi)))
            offsets.append(pos)
            chunks.append(xi)
            pos += len(xi)
        flat = np.concatenate(chunks)
        self.nbytes = flat.nbytes
        self._offsets = np.array(offsets, np.int64)
        put = (lambda a: jax.device_put(a, sharding)) if sharding is not None \
            else jax.device_put
        self._samples = put(jnp.asarray(flat))

    def starts(self, batch_size: int, seed: int = 0) -> Iterator[np.ndarray]:
        """Infinite (B,) int32 flat-start batches — the 64-byte wire.

        Mirrors decode_extract_and_batch's training-mode RNG call sequence
        exactly (same seed ⇒ same crops as the wire loader)."""
        rng = np.random.default_rng(seed)
        lens, offs, sl = self._lens, self._offsets, self.slice_len
        while True:
            out = np.empty(batch_size, np.int32)
            for b in range(batch_size):
                i = int(rng.integers(self.n_files))
                start = int(rng.integers(max(1, lens[i] - sl + 1)))
                out[b] = offs[i] + start
            yield out

    def gather(self, starts, samples=None):
        """(B,) int32 flat starts → (B, slice_len) int16 crops. Pure JAX —
        call inside the jitted train step so the crop gather fuses with
        featurization and the batch never exists on the host.

        ``samples``: pass the staged buffer as an EXPLICIT jit argument when
        calling under jit. Closing over ``self._samples`` instead embeds the
        whole corpus as a lowered constant — a 3.68 GB executable on the
        13k-file rehearsal that the axon compile service then has to ship
        (caught live in the r5 full-scale run; regression-tested in
        tests/test_data.py)."""
        import jax
        import jax.numpy as jnp

        if samples is None:
            samples = self._samples
        return jax.vmap(
            lambda s: jax.lax.dynamic_slice(
                samples, (s,), (self.slice_len,)
            )
        )(jnp.asarray(starts))


def hbm_data_step(step_fn, corpus: "DeviceCorpus", mesh=None,
                  donate: bool = True):
    """Wrap a (gstate, dstate, batch, rng) step to take crop starts instead.

    Returns a fully-jitted ``step(gstate, dstate, starts, rng)`` — do NOT
    re-wrap it in :func:`advoc_tpu.train.gan.jit_data_parallel`. The jit
    lives here because the staged corpus must be threaded through as an
    explicit argument of the compiled function: a closure capture lowers
    the whole corpus into the executable as a constant (gigabytes, see
    :meth:`DeviceCorpus.gather`). The gather runs inside the same jit
    region as the train step, so the batch never exists on the host; with
    a mesh, starts arrive sharded on 'data' and states replicated, so DP
    partitioning is identical to the wire path."""
    import jax

    def inner(gstate, dstate, starts, rng, samples):
        batch = corpus.gather(starts, samples=samples)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            batch = jax.lax.with_sharding_constraint(
                batch, NamedSharding(mesh, PartitionSpec("data"))
            )
        return step_fn(gstate, dstate, batch, rng)

    jitted = jax.jit(inner, donate_argnums=(0, 1) if donate else ())

    def step(gstate, dstate, starts, rng):
        if mesh is not None:
            from advoc_tpu.parallel import mesh as mesh_lib

            starts = mesh_lib.shard_batch(starts, mesh)
            gstate, dstate, rng = mesh_lib.replicate(
                (gstate, dstate, rng), mesh
            )
        return jitted(gstate, dstate, starts, rng, corpus._samples)

    return step


def device_prefetch(it: Iterator[np.ndarray], sharding=None, depth: int = 2):
    """Move host batches onto device(s) ``depth`` steps ahead of consumption.

    ``sharding`` is typically a ``NamedSharding(mesh, P('data'))`` for DP
    training (SURVEY.md §2.4); None puts on the default device.
    """
    import collections

    import jax

    buf: collections.deque = collections.deque()

    def put(x):
        return jax.device_put(x, sharding) if sharding is not None else jax.device_put(x)

    for x in it:
        buf.append(put(x))
        if len(buf) >= depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()
