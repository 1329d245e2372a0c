"""Config plumbing: the reference's ``--model_overrides`` flag, dataclass-ified.

(SURVEY.md §5 config row: per-script argparse + class-attribute hyperparams
with a comma-separated override flag.)
"""

from __future__ import annotations

import dataclasses
import pathlib
from typing import TypeVar

T = TypeVar("T")


def apply_overrides(cfg: T, overrides: str | None) -> T:
    """Apply 'key=value,key2=value2' to a frozen dataclass config.

    Values are parsed with the field's type (bool accepts true/false/1/0).
    Unknown keys raise — typos must not train the wrong model silently.
    """
    if not overrides:
        return cfg
    fields = {f.name: f for f in dataclasses.fields(cfg)}
    updates = {}
    for item in overrides.split(","):
        item = item.strip()
        if not item:
            continue
        if "=" not in item:
            raise ValueError(f"override {item!r} is not key=value")
        key, val = item.split("=", 1)
        key = key.strip()
        if key not in fields:
            raise ValueError(
                f"unknown config field {key!r}; valid: {sorted(fields)}"
            )
        ftype = fields[key].type
        if ftype in (bool, "bool"):
            updates[key] = val.strip().lower() in ("1", "true", "yes")
        elif ftype in (int, "int"):
            updates[key] = int(val)
        elif ftype in (float, "float"):
            updates[key] = float(val)
        else:
            updates[key] = val.strip()
    return dataclasses.replace(cfg, **updates)


def find_wavs(data_dir: str | None, min_count: int = 1) -> list[str]:
    """List .wav files under data_dir (recursively), sorted.

    ``data_dir`` may also be a ``*.txt`` file list (one path per line — the
    output of scripts/prepare_dataset.py)."""
    if data_dir is None:
        return []
    root = pathlib.Path(data_dir)
    if not root.exists():
        return []
    if root.is_file() and root.suffix == ".txt":
        return [ln.strip() for ln in root.read_text().splitlines() if ln.strip()]
    fps = sorted(str(p) for p in root.rglob("*.wav"))
    return fps if len(fps) >= min_count else fps


def ensure_dataset(data_dir: str | None, tmp_dir: str, n_files: int = 8,
                   seconds: float = 4.0, sample_rate: int = 22050) -> list[str]:
    """Return wav paths; if data_dir has none, synthesize a fixture dataset.

    No dataset ships with this machine (SURVEY.md §4) — the synthetic
    fixture keeps every CLI runnable end-to-end out of the box.
    """
    fps = find_wavs(data_dir)
    if fps:
        return fps
    from advoc_tpu.data import audioio, loader

    out = pathlib.Path(tmp_dir)
    out.mkdir(parents=True, exist_ok=True)
    fps = []
    for i in range(n_files):
        p = out / f"synthetic_{i}.wav"
        if not p.exists():
            audioio.save_as_wav(
                loader.synthetic_speech(i, int(seconds * sample_rate), sample_rate),
                p,
                sample_rate,
            )
        fps.append(str(p))
    print(f"[data] no wavs in {data_dir!r}; using {n_files} synthetic fixtures "
          f"in {tmp_dir}", flush=True)
    return fps
