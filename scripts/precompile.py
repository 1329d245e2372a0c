#!/usr/bin/env python
"""Serving cold-start tool: pre-populate the JAX compilation cache.

Fresh compiles on the axon remote-compile tunnel are brutal (the fused
T=5376 tiled G-L graph measured ~34 min, BASELINE.md r3), and the serving
CLI warms exactly one shape — any other shape/config hit in production pays
its compile live (VERDICT r3 weak #3). This script enumerates the
production shape buckets — streaming push+flush per engine × slot count,
and long-form Vocoder length buckets — compiles each into
``JAX_COMPILATION_CACHE_DIR`` (default ``/root/.jax_cache``), and reports
per-shape compile seconds. Run it once per deployment config (or after a
jax/advoc upgrade); a subsequent server start then only replays cache hits.

    python scripts/precompile.py --engines gl,lws_block --n_slots 16 \
        --longform_seconds 15,30,60 [--bundle runs/advoc/bundle]

Prints ONE machine-readable line ``PRECOMPILE_RESULT {...}``. Measure
cold-vs-warm by running twice: the second run's times are the cache-hit
replay cost a production server start pays.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

# NOTE: on this machine jax is pre-imported at interpreter startup (axon
# plugin .pth), so setting JAX_COMPILATION_CACHE_DIR via os.environ here is
# read too late — enable_compilation_cache() goes through jax.config.update,
# which works at any time (BASELINE.md r4 cold-start section).
from advoc_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    from advoc_tpu.serve.cli import add_args

    add_args(p)  # same model/engine/shape flags as the serving CLI
    p.add_argument("--engines", default=None,
                   help="comma list overriding --engine (e.g. gl,lws_block)")
    p.add_argument("--longform_tile", type=int, default=1024,
                   help="length-universal longform tile (ONE push+flush "
                        "executable covers every duration — "
                        "Vocoder.vocode_longform, VERDICT r4 #6); 0 = skip")
    p.add_argument("--longform_seconds", default="",
                   help="comma list of BUCKETED offline Vocoder lengths to "
                        "additionally compile — only needed for the "
                        "fixed-shape AOT/batched path ('' = none; the "
                        "length-universal tile above is the default "
                        "long-form shape)")
    p.add_argument("--longform_batch", default="1,8",
                   help="comma list of offline Vocoder batch sizes to "
                        "compile per length bucket — 1 covers the per-file/"
                        "AOT path, 8 is vocode_cli's --batch default "
                        "(ADVICE r4)")
    args = p.parse_args(argv)

    import numpy as np

    from advoc_tpu.ops.reference import DEFAULT_PARAMS as P
    from advoc_tpu.serve.cli import build_vocoder

    engines = (args.engines or args.engine).split(",")
    shapes: dict[str, float] = {}
    t_all = time.perf_counter()

    # --- streaming: push + flush per engine at the serving batch shape ---
    for engine in engines:
        args.engine = engine
        sv = build_vocoder(args)
        mels = np.zeros(
            (args.n_slots, args.chunk_frames, sv.params.n_mels), np.float32
        )
        inactive = np.zeros(args.n_slots, bool)
        t0 = time.perf_counter()
        sv.push(mels, active=inactive)  # mask is traced: one executable
        shapes[f"stream_push:{engine}:B{args.n_slots}x{args.chunk_frames}"] = (
            time.perf_counter() - t0
        )
        t0 = time.perf_counter()
        sv.flush(active=inactive)
        shapes[f"stream_flush:{engine}:B{args.n_slots}"] = (
            time.perf_counter() - t0
        )
        log(f"[precompile] {engine}: push+flush compiled")

    # --- long-form: the length-universal tile executable (default), plus
    # optional bucketed shapes for the fixed-shape AOT/batched path ---
    secs = [float(s) for s in args.longform_seconds.split(",") if s]
    if secs or args.longform_tile:
        from advoc_tpu.infer import Vocoder

        # Same generator config the serving vocoder used (or heuristic).
        sv0 = build_vocoder(args)
        # Offline long-form runs the bulk-quality iteration budget (30),
        # independent of the streaming --gl_iters knob.
        voc = Vocoder(
            g_apply=sv0.g_apply, g_params=sv0.g_params, params=P,
            gl_iters=30,
        )
    if args.longform_tile:
        tile = args.longform_tile
        t0 = time.perf_counter()
        # One short utterance through the tile engine compiles BOTH its
        # executables (push + flush) — every future duration is a cache hit.
        voc.vocode_longform(
            np.zeros((tile, P.n_mels), np.float32), tile_frames=tile
        )
        shapes[f"longform_tile:{tile}frames"] = time.perf_counter() - t0
        log(f"[precompile] length-universal longform tile {tile} compiled")
    if secs:
        batches = [int(b) for b in args.longform_batch.split(",") if b]
        for s in secs:
            t_frames = voc.bucket(int(s * P.sample_rate / P.hop_length))
            for b in batches:
                mel = np.zeros((b, t_frames, P.n_mels), np.float32)
                t0 = time.perf_counter()
                np.asarray(voc._compiled(t_frames)(voc.g_params, mel))
                shapes[f"vocoder:B{b}x{t_frames}frames(~{s:g}s)"] = (
                    time.perf_counter() - t0
                )
                log(f"[precompile] long-form {s:g}s (bucket {t_frames}, "
                    f"batch {b}) compiled")

    total = time.perf_counter() - t_all
    result = {
        "cache_dir": os.environ["JAX_COMPILATION_CACHE_DIR"],
        "total_s": round(total, 1),
        "shapes": {k: round(v, 1) for k, v in shapes.items()},
    }
    print("PRECOMPILE_RESULT " + json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
