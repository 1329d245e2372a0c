#!/usr/bin/env python
"""Device-cost table for every offline phase-recovery method.

Measures fused jit cost (slope timing: chained K1 vs K2 calls, ONE value
readback each — the axon-tunnel dispatch constant cancels in the slope,
see utils/profiling.py and BASELINE.md methodology notes) and re-extracted
mel L1 for each `phase_method` the framework ships:

  fast-GL (momentum scan)  · classic G-L · true batch LWS ·
  chromatic LWS (colors=4) · online LWS (causal, look-ahead)

This is the measurement harness behind BASELINE.md's "device cost per
phase method" rows. Prints a markdown table plus one machine-readable
JSON line (``PHASE_TIMING_RESULT {...}``).
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
# Persistent compiled-program cache. NOTE: on this machine jax is pre-imported
# at interpreter startup (axon plugin .pth), so JAX_COMPILATION_CACHE_DIR set
# here via os.environ is read too late — enable_compilation_cache() goes
# through jax.config.update, which works at any time (BASELINE.md r4).
from advoc_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--frames", type=int, default=256)
    p.add_argument("--gl_iters", type=int, default=30)
    p.add_argument("--lws_sweeps", type=int, default=5)
    p.add_argument("--k1", type=int, default=2)
    p.add_argument("--k2", type=int, default=6)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from advoc_tpu.data import loader
    from advoc_tpu.ops import spectral as sp
    from advoc_tpu.ops.reference import DEFAULT_PARAMS as P

    hop = P.hop_length
    b, t = args.batch, args.frames
    wav = loader.synthetic_speech(args.seed, b * t * hop)
    mel = sp.waveform_to_r9y9_melspec(jnp.asarray(wav), P)[: b * t]
    mel = mel.reshape(b, t, P.n_mels)
    mag = sp.r9y9_melspec_to_magspec(mel, P)
    audio_s = b * t * hop / P.sample_rate

    def slope_ms(fn, x) -> float:
        def run(k: int) -> float:
            t0 = time.perf_counter()
            out = None
            for _ in range(k):
                out = fn(x)
            float(jnp.mean(out))  # value readback: dispatch can lie
            return time.perf_counter() - t0

        run(1)  # warmup (compile / cache load)
        a, c = run(args.k1), run(args.k2)
        return (c - a) / (args.k2 - args.k1) * 1000.0

    sw = args.lws_sweeps
    methods = [
        (
            f"fast-GL {args.gl_iters} (shipped default)",
            lambda m: sp.griffin_lim(
                m, n_iters=args.gl_iters, momentum=0.99, params=P
            ),
        ),
        (
            f"classic G-L {args.gl_iters}",
            lambda m: sp.griffin_lim(
                m, n_iters=args.gl_iters, momentum=0.0, params=P
            ),
        ),
        (
            f"batch LWS sw{sw} (sequential GS)",
            lambda m: sp.lws(m, n_sweeps=sw, params=P),
        ),
        (
            f"chromatic LWS sw{sw} colors=4",
            lambda m: sp.lws(m, n_sweeps=sw, colors=4, params=P),
        ),
        (
            f"chromatic LWS sw{2 * sw} colors=4",
            lambda m: sp.lws(m, n_sweeps=2 * sw, colors=4, params=P),
        ),
        (
            "online LWS sw2 la2 (causal)",
            lambda m: sp.lws_online(m, n_sweeps=2, look_ahead=2, params=P),
        ),
    ]

    rows = []
    print(
        f"| method | device ms ({b}x{t} frames = {audio_s:.0f}s audio) "
        "| mel L1 | x_realtime |"
    )
    print("|---|---|---|---|")
    for name, raw in methods:
        fn = jax.jit(raw)
        y = fn(mag)
        float(jnp.mean(y))
        ms = slope_ms(fn, mag)
        m2 = sp.waveform_to_r9y9_melspec(y, P)[:, :t]
        l1 = float(jnp.abs(m2 - mel).mean())
        xrt = audio_s / (ms / 1000.0)
        rows.append(
            {"method": name, "device_ms": ms, "mel_l1": l1, "x_rt": xrt}
        )
        print(f"| {name} | {ms:.2f} | {l1:.5f} | {xrt:.0f} |", flush=True)

    print("PHASE_TIMING_RESULT " + json.dumps(
        {"batch": b, "frames": t, "rows": rows}
    ))


if __name__ == "__main__":
    main()
