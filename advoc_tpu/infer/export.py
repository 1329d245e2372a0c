"""AOT export: the fused vocoder as a self-contained serialized artifact.

The Orbax inference bundle (train/checkpoint.py:130) ships *params*; a
server still needs the model code and pays a fresh trace per shape. This
module serializes the ENTIRE fused mel→waveform computation — heuristic
estimate → U-Net repair → crossfade join → phase recovery → iSTFT, with the
generator params baked in as constants — through ``jax.export`` into one
StableHLO artifact per production shape. A serving process then needs no
advoc model code and no Python trace: deserialize and call. Combined with
the persistent compilation cache (scripts/precompile.py) a cold start pays
only cache-hit replay; on a fresh cache it pays XLA compile of the
artifact but never Python tracing.

The reference has no analog (TF1 graphs are pickled with the checkpoint,
SURVEY.md §3.1); this is the TPU-idiomatic equivalent of its "restore and
serve the frozen graph" deployment story.

Portability notes (documented behavior, asserted in tests/test_export.py):

* ``phase_impl="xla"`` artifacts are pure StableHLO — exportable for
  multiple platforms at once (``platforms=("tpu", "cpu")``) and stable
  across jax versions per the jax.export compatibility contract.
* ``phase_impl="auto"/"pallas"`` artifacts embed the Mosaic custom call
  when exported on a TPU host; they are TPU-only and tied to the
  exporting jaxlib's Mosaic ABI. Export warns by requiring the caller to
  acknowledge via ``allow_custom_calls=True``.
"""

from __future__ import annotations

import json
import pathlib
from typing import Sequence

import numpy as np

_MANIFEST = "manifest.json"


def _artifact_name(batch: int, t_frames: int) -> str:
    return f"voc_b{batch}_t{t_frames}.jaxexp"


def export_vocoder(
    voc,
    shapes: Sequence[tuple[int, int]],
    out_dir: str | pathlib.Path,
    platforms: Sequence[str] | None = None,
    allow_custom_calls: bool = False,
) -> dict:
    """Serialize ``voc`` (an infer.Vocoder) for each (batch, t_frames).

    ``t_frames`` values must be bucket-aligned (``voc.bucket(t) == t``);
    the loader reproduces Vocoder's pad-to-bucket/crop contract, so any
    utterance up to each exported bucket is servable. Returns the
    manifest dict (also written to ``out_dir/manifest.json``).
    """
    import jax
    from jax import export as jexport

    out = pathlib.Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    p = voc.params
    entries = []
    for batch, t_frames in shapes:
        if voc.bucket(t_frames) != t_frames:
            raise ValueError(
                f"t_frames={t_frames} is not bucket-aligned "
                f"(chunk_frames={voc.chunk}; nearest {voc.bucket(t_frames)})"
            )
        uses_pallas = voc._use_pallas(t_frames)
        if uses_pallas and not allow_custom_calls:
            raise ValueError(
                "this Vocoder lowers through a Pallas (Mosaic) custom call "
                "— the artifact would be TPU-only and tied to this jaxlib "
                "version. Pass allow_custom_calls=True to accept, or build "
                "the Vocoder with phase_impl='xla' for a portable artifact"
            )
        inner = voc._compiled(t_frames)
        g_params = voc.g_params
        # Closing over the params bakes them into the artifact as
        # constants — the export is self-contained (no separate bundle).
        fn = jax.jit(lambda mel: inner(g_params, mel))  # noqa: B023
        kwargs = {}
        if platforms is not None:
            kwargs["platforms"] = tuple(platforms)
        if uses_pallas:
            kwargs["disabled_checks"] = [
                jexport.DisabledSafetyCheck.custom_call("tpu_custom_call")
            ]
        spec = jax.ShapeDtypeStruct((batch, t_frames, p.n_mels), np.float32)
        exp = jexport.export(fn, **kwargs)(spec)
        name = _artifact_name(batch, t_frames)
        (out / name).write_bytes(exp.serialize())
        entries.append({"batch": batch, "t_frames": t_frames, "file": name,
                        "platforms": list(exp.platforms)})
    manifest = {
        "format": 1,
        "sample_rate": p.sample_rate,
        "n_mels": p.n_mels,
        "hop_length": p.hop_length,
        "chunk_frames": voc.chunk,
        "phase_method": voc.phase_method,
        "gl_iters": voc.gl_iters,
        "artifacts": entries,
    }
    (out / _MANIFEST).write_text(json.dumps(manifest, indent=2))
    return manifest


class ExportedVocoder:
    """Serve a directory written by :func:`export_vocoder`.

    Mirrors ``Vocoder.__call__``'s contract — (T, M) or (B, T, M) mels in,
    cropped waveforms out — by padding T up to the smallest exported
    bucket and B up to the smallest exported batch that fit. Needs only
    jax + numpy; no advoc model code runs at load or call time.
    """

    def __init__(self, path: str | pathlib.Path):
        self.path = pathlib.Path(path)
        m = json.loads((self.path / _MANIFEST).read_text())
        self.manifest = m
        self.sample_rate = m["sample_rate"]
        self.n_mels = m["n_mels"]
        self.hop_length = m["hop_length"]
        self._entries = sorted(
            m["artifacts"], key=lambda e: (e["t_frames"], e["batch"])
        )
        self._cache: dict[tuple[int, int], object] = {}

    def shapes(self) -> list[tuple[int, int]]:
        return [(e["batch"], e["t_frames"]) for e in self._entries]

    def _pick(self, b: int, t: int) -> tuple[int, int]:
        fits = [(e["batch"], e["t_frames"]) for e in self._entries
                if e["batch"] >= b and e["t_frames"] >= t]
        if not fits:
            raise ValueError(
                f"no exported artifact fits batch={b}, t_frames={t}; "
                f"available: {self.shapes()}"
            )
        # Smallest waste: tightest T first (compute scales with T), then B.
        return min(fits, key=lambda bt: (bt[1], bt[0]))

    def _load(self, key: tuple[int, int]):
        if key not in self._cache:
            import jax
            from jax import export as jexport

            entry = next(
                e for e in self._entries
                if (e["batch"], e["t_frames"]) == key
            )
            exp = jexport.deserialize(
                (self.path / entry["file"]).read_bytes()
            )
            backend = jax.default_backend()
            if backend not in exp.platforms:
                raise RuntimeError(
                    f"artifact {entry['file']} was exported for "
                    f"{exp.platforms}, current backend is {backend!r}"
                )
            self._cache[key] = jax.jit(exp.call)
        return self._cache[key]

    def __call__(self, mel):
        mel = np.asarray(mel, np.float32)
        squeeze = mel.ndim == 2
        if squeeze:
            mel = mel[None]
        b, t = mel.shape[0], mel.shape[1]
        eb, et = self._pick(b, t)
        if (eb, et) != (b, t):
            mel = np.pad(mel, ((0, eb - b), (0, et - t), (0, 0)))
        wav = self._load((eb, et))(mel)
        wav = np.asarray(wav)[:b, : t * self.hop_length]
        return wav[0] if squeeze else wav
