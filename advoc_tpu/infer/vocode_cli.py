"""Standalone serving CLI: mels in → wavs out, with throughput report.

The production-serving face of the fused vocoder:

  python -m advoc_tpu.infer.vocode_cli --bundle runs/advoc/export \
      --input mels.npy --out_dir out/

Input: a .npy of (T, 80) or (B, T, 80) r9y9-normalized mels (a TTS
frontend's output), or a wav/directory of wavs to re-vocode. Loads either an
inference bundle (checkpoint.export_inference_bundle) or a train_dir's latest
checkpoint; with neither, runs the pure heuristic pipeline.
"""

from __future__ import annotations

import argparse
import pathlib
import time

import numpy as np


def main(argv=None) -> None:
    from advoc_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True,
                   help=".npy mels, a wav file, or a directory of wavs")
    p.add_argument("--out_dir", required=True)
    p.add_argument("--bundle", default=None, help="inference bundle dir")
    p.add_argument("--train_dir", default=None, help="ckpt dir (alternative)")
    p.add_argument("--aot", default=None,
                   help="serve from an AOT artifact dir (infer.export_vocoder"
                        " output) — no model code, no trace; overrides "
                        "--bundle/--train_dir")
    p.add_argument("--aot_export", default=None,
                   help="instead of vocoding, export the loaded model as AOT "
                        "artifacts into this dir (shapes from --batch and "
                        "each input's bucketed length)")
    p.add_argument("--model_size", choices=["full", "small"], default="full")
    p.add_argument("--model_overrides", default=None)
    p.add_argument("--gl_iters", type=int, default=30)
    p.add_argument("--mel_projection", type=float, default=None,
                   help="post-repair mel-consistency projection strength. "
                        "Default auto (1.0 with a model, 0.0 heuristic); "
                        "pass 0 for the raw-repair parity contract — "
                        "BASELINE.md r4 STOI section")
    p.add_argument("--batch", type=int, default=8,
                   help="mels vocoded per device call")
    p.add_argument("--phase_impl", choices=["auto", "xla", "pallas"],
                   default="auto",
                   help="G-L kernel: 'auto' = Pallas VMEM kernel on TPU at "
                        "eligible shapes; 'xla' = pure-StableHLO (portable "
                        "AOT artifacts)")
    p.add_argument("--aot_allow_custom_calls", action="store_true",
                   help="--aot_export: accept a Mosaic-custom-call artifact "
                        "(TPU-only, tied to this jaxlib — fine for serving "
                        "on the machine that exported it)")
    p.add_argument("--longform", action="store_true",
                   help="length-universal mode: every input rides ONE "
                        "fixed-tile executable (Vocoder.vocode_longform) — "
                        "no per-length-bucket compiles; use for long or "
                        "arbitrarily-varied durations")
    p.add_argument("--longform_tile", type=int, default=1024,
                   help="longform tile frames (multiple of the model chunk)")
    args = p.parse_args(argv)
    if args.aot and args.aot_export:
        p.error("--aot serves an existing artifact; it cannot be combined "
                "with --aot_export (export from --bundle/--train_dir)")

    import jax.numpy as jnp

    from advoc_tpu.data import audioio
    from advoc_tpu.infer import Vocoder
    from advoc_tpu.models.advoc import AdvocGenerator
    from advoc_tpu.models.advoc.model import AdvocConfig, small_config
    from advoc_tpu.ops import spectral
    from advoc_tpu.ops.reference import DEFAULT_PARAMS as P
    from advoc_tpu.utils import apply_overrides

    cfg = small_config() if args.model_size == "small" else AdvocConfig()
    cfg = apply_overrides(cfg, args.model_overrides)

    g_apply = g_params = None
    if args.aot:
        pass  # no model code needed — the artifact is self-contained
    elif args.bundle:
        from advoc_tpu.train.checkpoint import load_inference_bundle

        g = AdvocGenerator(cfg)
        g_params, conf = load_inference_bundle(args.bundle)
        g_apply = lambda p, est: g.apply({"params": p}, est)  # noqa: E731
        print(f"[vocode] loaded bundle {args.bundle} (config {conf})", flush=True)
    elif args.train_dir:
        from advoc_tpu.train import gan
        from advoc_tpu.train.checkpoint import CheckpointManager

        g = AdvocGenerator(cfg)
        from advoc_tpu.models.advoc import PatchDiscriminator

        est0 = jnp.zeros((1, cfg.n_frames, cfg.n_freq))
        gstate, dstate = gan.make_states(
            g, PatchDiscriminator(cfg), (est0,), (est0, est0)
        )
        mgr = CheckpointManager(args.train_dir)
        bundle = mgr.restore(template={"g": gstate, "d": dstate})
        mgr.close()
        g_params = bundle["g"].params
        g_apply = lambda p, est: g.apply({"params": p}, est)  # noqa: E731
        print(f"[vocode] loaded checkpoint from {args.train_dir}", flush=True)
    else:
        print("[vocode] no model given — heuristic pipeline", flush=True)

    # --- gather mels ---
    inp = pathlib.Path(args.input)
    if inp.suffix == ".npy":
        mels = np.load(inp)
        if mels.ndim == 2:
            mels = mels[None]
        names = [f"{inp.stem}_{i}" for i in range(len(mels))]
        mels = [np.asarray(m) for m in mels]
    else:
        wav_paths = (
            sorted(inp.rglob("*.wav")) if inp.is_dir() else [inp]
        )
        mels, names = [], []
        for wp in wav_paths:
            wav = audioio.decode_audio(wp, P.sample_rate)
            mels.append(
                np.asarray(
                    spectral.waveform_to_r9y9_melspec(jnp.asarray(wav), P)
                )
            )
            names.append(wp.stem)

    out_dir = pathlib.Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    if args.aot:
        from advoc_tpu.infer.export import ExportedVocoder

        voc = ExportedVocoder(args.aot)
        print(f"[vocode] serving AOT artifacts {voc.shapes()} from "
              f"{args.aot}", flush=True)
    else:
        voc = Vocoder(
            g_apply=g_apply, g_params=g_params, params=P,
            chunk_frames=cfg.n_frames, gl_iters=args.gl_iters,
            mel_projection=args.mel_projection,
            phase_impl=args.phase_impl,
        )
    if args.aot_export:
        from advoc_tpu.infer.export import export_vocoder

        shapes = sorted({(1, voc.bucket(m.shape[0])) for m in mels})
        man = export_vocoder(voc, shapes, args.aot_export,
                             allow_custom_calls=args.aot_allow_custom_calls)
        print(f"[vocode] exported {len(man['artifacts'])} artifact(s) "
              f"{[tuple(s) for s in shapes]} → {args.aot_export}", flush=True)
        return

    total_audio = 0.0
    hop = P.hop_length

    if args.longform:
        if args.aot:
            p.error("--longform needs the live Vocoder (AOT artifacts are "
                    "fixed-shape by design)")
        # One push + one flush executable for EVERY duration; the tile loop
        # pipelines dispatch against compute internally (vocode_longform).
        t_start = None
        t_audio0 = 0.0
        for mel, name in zip(mels, names):
            wav = voc.vocode_longform(mel, tile_frames=args.longform_tile)
            if t_start is None:
                t_start = time.perf_counter()  # exclude first-call compile
                t_audio0 = len(wav) / P.sample_rate
            total_audio += len(wav) / P.sample_rate
            audioio.save_as_wav(wav, out_dir / f"{name}.wav", P.sample_rate)
            print(f"[vocode] {name}.wav ({len(wav)} samples, longform)",
                  flush=True)
        if t_start is not None and len(mels) > 1:
            dt = time.perf_counter() - t_start
            done = total_audio - t_audio0
            print(f"[vocode] {done:.1f}s audio in {dt:.2f}s after warmup "
                  f"(one {args.longform_tile}-frame tile executable) "
                  f"→ {done/dt:.0f}× realtime", flush=True)
        return

    if args.aot or args.batch <= 1 or len(mels) == 1:
        # Per-file loop (AOT artifacts are typically exported at batch 1).
        t_start = None
        t_audio0 = 0.0
        for mel, name in zip(mels, names):
            wav = np.asarray(voc(jnp.asarray(mel)))
            if t_start is None:
                t_start = time.perf_counter()  # exclude first-call compile
                t_audio0 = len(wav) / P.sample_rate
            total_audio += len(wav) / P.sample_rate
            audioio.save_as_wav(wav, out_dir / f"{name}.wav", P.sample_rate)
            print(f"[vocode] {name}.wav ({len(wav)} samples)", flush=True)
        if t_start is not None and len(mels) > 1:
            dt = time.perf_counter() - t_start
            done = total_audio - t_audio0
            print(f"[vocode] {done:.1f}s audio in {dt:.2f}s after warmup "
                  f"→ {done/dt:.0f}× realtime", flush=True)
        return

    # --batch > 1: real batched serving. Group mels by their bucketed
    # length (same bucket → same compiled shape), pad every group to
    # exactly --batch rows so each length bucket compiles ONE executable,
    # and materialize group k while group k+1 is already dispatched
    # (Vocoder.__call__ returns lazy device arrays — batch rows are
    # mathematically independent, so padded rows change nothing).
    order = sorted(range(len(mels)), key=lambda i: voc.bucket(mels[i].shape[0]))
    groups: list[list[int]] = []
    for i in order:
        tb = voc.bucket(mels[i].shape[0])
        if (groups and len(groups[-1]) < args.batch
                and voc.bucket(mels[groups[-1][0]].shape[0]) == tb):
            groups[-1].append(i)
        else:
            groups.append([i])

    def dispatch(idx):
        tb = voc.bucket(max(mels[i].shape[0] for i in idx))
        mb = np.zeros((args.batch, tb, P.n_mels), np.float32)
        for r, i in enumerate(idx):
            mb[r, : mels[i].shape[0]] = mels[i]
        return voc(jnp.asarray(mb))  # lazy (--batch, tb*hop)

    def write(idx, out):
        nonlocal total_audio
        arr = np.asarray(out)  # blocks; the NEXT group is already running
        for r, i in enumerate(idx):
            n = mels[i].shape[0] * hop
            total_audio += n / P.sample_rate
            audioio.save_as_wav(
                arr[r, :n], out_dir / f"{names[i]}.wav", P.sample_rate
            )
            print(f"[vocode] {names[i]}.wav ({n} samples)", flush=True)

    # Warm every DISTINCT length bucket before the clock starts — with
    # multi-bucket inputs, a later bucket's first-call compile would
    # otherwise land inside the timed region and skew the reported
    # "after warmup ×realtime" (ADVICE r4).
    buckets = sorted({voc.bucket(mels[i].shape[0]) for i in order})
    for tb in buckets:
        np.asarray(voc(jnp.zeros((args.batch, tb, P.n_mels), np.float32)))
    print(f"[vocode] warmed {len(buckets)} length bucket(s): {buckets}",
          flush=True)

    t_start = time.perf_counter()
    pending = None
    for idx in groups:
        out = dispatch(idx)
        if pending is not None:
            write(*pending)
        pending = (idx, out)
    if pending is not None:
        write(*pending)
    dt = time.perf_counter() - t_start
    print(f"[vocode] {total_audio:.1f}s audio in {dt:.2f}s after warmup "
          f"({len(groups)} batched calls of {args.batch}) "
          f"→ {total_audio/dt:.0f}× realtime", flush=True)


if __name__ == "__main__":
    main()
