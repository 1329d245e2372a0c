#!/usr/bin/env python
"""Stress-fixture eval panel: round-trip the vocoder over degenerate inputs.

Runs each stress class (silence, clipping, noise, chirp, tone, dc —
``advoc_tpu.data.loader.STRESS_KINDS``) through mel extraction → vocoder →
objective panel (spec L1, LSD, SNR, re-extracted mel L1) and prints a
markdown table suitable for BASELINE.md. With ``--train_dir`` the panel runs
through the trained advoc generator; otherwise the pure heuristic pipeline.
``--streaming ENGINE`` routes the panel through the chunked
:class:`StreamingVocoder` path instead of the offline ``Vocoder`` (the
protocol behind BASELINE.md's streaming stress tables: chunked pushes plus
the end-of-utterance ``flush()``, flush_samples-aligned).

VERDICT r1 missing #4: characterize quality outside the speech-like fixture
distribution, since no LJSpeech exists on this machine.
"""

from __future__ import annotations

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def make_streaming_vocode(g_apply, g_params, params, engine, args):
    """mel → waveform through chunked StreamingVocoder pushes, stream-start
    aligned (drop preroll + look-ahead) and trimmed to the input length —
    the measurement protocol behind BASELINE.md's streaming tables."""
    import numpy as np

    from advoc_tpu.infer import StreamingVocoder

    kw = dict(gl_iters=args.gl_iters, overlap_frames=args.overlap_frames)
    if engine != "gl":
        kw = dict(lws_sweeps=args.lws_sweeps,
                  lws_look_ahead=args.lws_look_ahead)

    def vocode(mel):
        mel = np.asarray(mel)
        t = mel.shape[0]
        ch = args.chunk_frames
        sv = StreamingVocoder(
            g_apply=g_apply, g_params=g_params, params=params,
            chunk_frames=ch, phase_engine=engine, **kw,
        )
        # Pad to whole chunks (fixed-shape pushes), then flush() — the
        # real end-of-utterance contract, not the pre-flush silence-pad
        # workaround.
        melp = np.pad(mel, ((0, (-t) % ch), (0, 0)))
        outs = [sv.push(melp[c : c + ch])
                for c in range(0, melp.shape[0], ch)]
        outs.append(sv.flush())
        stream = np.concatenate(outs)
        sig = stream[sv.flush_samples :]
        return sig[: t * params.hop_length]

    return vocode


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--train_dir", default=None,
                   help="trained advoc run; omit for the heuristic pipeline")
    p.add_argument("--model_size", choices=["full", "small"], default="full")
    p.add_argument("--model_overrides", default=None)
    p.add_argument("--n_frames", type=int, default=256)
    p.add_argument("--gl_iters", type=int, default=30)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--streaming", default=None,
                   choices=["gl", "lws_online", "lws_block"],
                   help="run the panel through the StreamingVocoder path")
    p.add_argument("--chunk_frames", type=int, default=64)
    p.add_argument("--overlap_frames", type=int, default=8)
    p.add_argument("--lws_sweeps", type=int, default=None)
    p.add_argument("--lws_look_ahead", type=int, default=2)
    args = p.parse_args(argv)

    import jax.numpy as jnp

    from advoc_tpu.infer import Vocoder
    from advoc_tpu.ops.reference import DEFAULT_PARAMS
    from advoc_tpu.train.eval_metrics import stress_panel

    g_apply = g_params = None
    chunk_frames = args.chunk_frames if args.streaming else 256
    desc = "heuristic"
    if args.train_dir is not None:
        from advoc_tpu.models.advoc import AdvocGenerator, PatchDiscriminator
        from advoc_tpu.models.advoc.model import AdvocConfig, small_config
        from advoc_tpu.train import gan
        from advoc_tpu.train.checkpoint import CheckpointManager
        from advoc_tpu.utils import apply_overrides

        cfg = small_config() if args.model_size == "small" else AdvocConfig()
        cfg = apply_overrides(cfg, args.model_overrides)
        g = AdvocGenerator(cfg)
        d = PatchDiscriminator(cfg)
        est0 = jnp.zeros((1, cfg.n_frames, cfg.n_freq))
        gstate, dstate = gan.make_states(g, d, (est0,), (est0, est0), seed=0)
        mgr = CheckpointManager(args.train_dir)
        step = mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {args.train_dir}")
        bundle = mgr.restore(template={"g": gstate, "d": dstate})
        mgr.close()
        g_apply = lambda pr, est: g.apply({"params": pr}, est)  # noqa: E731
        g_params = bundle["g"].params
        chunk_frames = args.chunk_frames if args.streaming else cfg.n_frames
        desc = f"advoc step {step}"

    if args.streaming:
        voc = make_streaming_vocode(
            g_apply, g_params, DEFAULT_PARAMS, args.streaming, args
        )
        desc += f", streaming {args.streaming} (chunk {args.chunk_frames})"
    else:
        voc = Vocoder(
            g_apply=g_apply, g_params=g_params, params=DEFAULT_PARAMS,
            chunk_frames=chunk_frames, gl_iters=args.gl_iters,
        )

    panel = stress_panel(voc, n_frames=args.n_frames, seed=args.seed)
    print(f"\nStress panel ({desc}, {args.n_frames} frames, "
          f"{args.gl_iters} G-L iters):\n")
    cols = ["spec_l1", "lsd_db", "snr_db", "mel_l1"]
    print("| class | " + " | ".join(cols) + " |")
    print("|---|" + "---|" * len(cols))
    for kind, m in panel.items():
        print(f"| {kind} | " + " | ".join(f"{m[c]:.4f}" for c in cols) + " |")


if __name__ == "__main__":
    main()
