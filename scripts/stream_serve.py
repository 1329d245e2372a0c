#!/usr/bin/env python
"""Streaming-serving loop: drive N concurrent streams through the
StreamingVocoder and report per-push latency percentiles, per-stream cost,
aggregate throughput, and (optionally) spectral fidelity.

This is both the runbook demo for real-time serving (README) and the
measurement harness behind BASELINE.md's streaming tables: it exercises the
production path exactly — fixed-shape jit per push, device-resident carries,
narrow wire formats — for either phase engine (``gl`` = per-chunk
Griffin-Lim with RTISI carry + crossfade; ``lws_online`` = causal streaming
LWS, globally coherent phase, see BASELINE.md streaming-LWS section).

Prints a markdown-ish table plus ONE machine-readable JSON line
(``STREAM_SERVE_RESULT {...}``).
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--bundle", default=None, help="inference bundle dir")
    p.add_argument("--train_dir", default=None,
                   help="trained ckpt dir; omit both for heuristic pipeline")
    p.add_argument("--model_size", choices=["full", "small"], default="small")
    p.add_argument("--model_overrides", default=None)
    p.add_argument(
        "--engine", choices=["gl", "lws_online", "lws_block"], default="gl"
    )
    p.add_argument("--n_streams", type=int, default=1)
    p.add_argument("--chunk_frames", type=int, default=64)
    p.add_argument("--pushes", type=int, default=20)
    p.add_argument("--gl_iters", type=int, default=16)
    p.add_argument("--overlap_frames", type=int, default=8,
                   help="gl engine: crossfade overlap = emission delay "
                        "(2 ≈ 23 ms is the measured low-latency point)")
    p.add_argument("--lws_sweeps", type=int, default=None)
    p.add_argument("--lws_look_ahead", type=int, default=2)
    p.add_argument("--mel_context", type=int, default=0)
    p.add_argument("--emit_dtype", choices=["float32", "int16"],
                   default="float32")
    p.add_argument("--mel_dtype", choices=["float32", "float16"],
                   default="float32")
    p.add_argument("--input", default=None,
                   help="wav file/dir per stream (cycled); default synthetic")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--fidelity", action="store_true",
                   help="also report stream-0 re-extracted mel L1")
    args = p.parse_args(argv)

    import numpy as np

    import jax.numpy as jnp

    from advoc_tpu.data import loader
    from advoc_tpu.infer.vocoder import StreamingVocoder
    from advoc_tpu.ops import spectral
    from advoc_tpu.ops.reference import DEFAULT_PARAMS as P

    g_apply = g_params = None
    if args.bundle or args.train_dir:
        from advoc_tpu.models.advoc import AdvocGenerator
        from advoc_tpu.models.advoc.model import AdvocConfig, small_config
        from advoc_tpu.utils import apply_overrides

        cfg = small_config() if args.model_size == "small" else AdvocConfig()
        cfg = apply_overrides(cfg, args.model_overrides)
        g = AdvocGenerator(cfg)
        if args.bundle:
            from advoc_tpu.train.checkpoint import load_inference_bundle

            g_params, _ = load_inference_bundle(args.bundle)
        else:
            from advoc_tpu.models.advoc import PatchDiscriminator
            from advoc_tpu.train import gan
            from advoc_tpu.train.checkpoint import CheckpointManager

            est0 = jnp.zeros((1, cfg.n_frames, cfg.n_freq))
            gstate, dstate = gan.make_states(
                g, PatchDiscriminator(cfg), (est0,), (est0, est0)
            )
            mgr = CheckpointManager(args.train_dir)
            g_params = mgr.restore(template={"g": gstate, "d": dstate})["g"].params
            mgr.close()
        g_apply = lambda pr, est: g.apply({"params": pr}, est)  # noqa: E731

    # --- per-stream mel feeds ---
    n, ch = args.n_streams, args.chunk_frames
    need = ch * args.pushes
    mels = []
    if args.input:
        from advoc_tpu.data import audioio

        inp = pathlib.Path(args.input)
        paths = sorted(inp.rglob("*.wav")) if inp.is_dir() else [inp]
        for s in range(n):
            wav = audioio.decode_audio(paths[s % len(paths)], P.sample_rate)
            if s == 0:
                wav0 = np.asarray(wav)  # stream-0 source, for --fidelity
            m = np.asarray(
                spectral.waveform_to_r9y9_melspec(jnp.asarray(wav), P)
            )
            reps = -(-need // max(1, m.shape[0]))
            mels.append(np.tile(m, (reps, 1))[:need])
    else:
        for s in range(n):
            wav = loader.synthetic_speech(args.seed + s, need * P.hop_length)
            if s == 0:
                wav0 = np.asarray(wav)
            mels.append(np.asarray(
                spectral.waveform_to_r9y9_melspec(jnp.asarray(wav), P)
            )[:need])
    mels = np.stack(mels)  # (n, need, M)

    sv = StreamingVocoder(
        g_apply=g_apply, g_params=g_params, params=P, chunk_frames=ch,
        n_streams=n, gl_iters=args.gl_iters, phase_engine=args.engine,
        overlap_frames=args.overlap_frames,
        lws_sweeps=args.lws_sweeps, lws_look_ahead=args.lws_look_ahead,
        mel_context=args.mel_context, emit_dtype=args.emit_dtype,
        mel_dtype=args.mel_dtype,
    )

    def chunk(c):
        x = mels[:, c * ch : (c + 1) * ch]
        return x[0] if n == 1 else x

    t0 = time.perf_counter()
    out0 = sv.push(chunk(0))  # compile + first push
    compile_s = time.perf_counter() - t0
    times, outs = [], [out0]
    for c in range(1, args.pushes):
        t0 = time.perf_counter()
        outs.append(sv.push(chunk(c)))
        times.append(time.perf_counter() - t0)
    times = np.asarray(times) * 1000.0
    audio_s = ch * P.hop_length / P.sample_rate  # per stream per push
    p50, p95 = np.percentile(times, 50), np.percentile(times, 95)
    agg_rtf = n * audio_s * 1000.0 / p50

    print(f"engine={args.engine} streams={n} chunk={ch} frames "
          f"({audio_s*1000:.0f} ms audio/push/stream)")
    print(f"first push (incl. compile): {compile_s:.1f} s")
    print(f"push wall ms: p50 {p50:.2f} / p95 {p95:.2f} / max {times.max():.2f}"
          f"  → {p50/n:.2f} ms/stream, aggregate {agg_rtf:.0f}× RT")

    result = {
        "engine": args.engine, "n_streams": n, "chunk_frames": ch,
        "pushes": args.pushes, "p50_ms": round(float(p50), 3),
        "p95_ms": round(float(p95), 3),
        "ms_per_stream": round(float(p50) / n, 3),
        "aggregate_rtf": round(float(agg_rtf), 1),
    }
    if args.fidelity:
        emitted = np.concatenate(
            [o if n == 1 else o[0] for o in outs]
        ).astype(np.float32)
        if args.emit_dtype == "int16":
            emitted = emitted / 32767.0
        sig = emitted[
            sv.preroll_samples + sv.latency_frames * P.hop_length :
        ]
        n_fr = len(sig) // P.hop_length - 1
        if n_fr > 0:
            m2 = np.asarray(
                spectral.waveform_to_r9y9_melspec(jnp.asarray(sig), P)
            )[:n_fr]
            l1 = float(np.abs(m2 - mels[0][:n_fr]).mean())
            print(f"stream-0 re-extracted mel L1: {l1:.5f}")
            result["mel_l1"] = round(l1, 5)
            from advoc_tpu.train.eval_metrics import stoi

            k = min(len(sig), len(wav0))
            s0 = stoi(wav0[:k], sig[:k], P.sample_rate)
            print(f"stream-0 STOI (intelligibility proxy): {s0:.4f}")
            result["stoi"] = round(s0, 4)
    print("STREAM_SERVE_RESULT " + json.dumps(result))


if __name__ == "__main__":
    main()
