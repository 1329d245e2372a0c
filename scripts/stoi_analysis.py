#!/usr/bin/env python
"""Diagnose the STOI trained-vs-heuristic inversion (VERDICT r3 weak #2).

Round 3 measured the L1-trained generator making the STOI intelligibility
proxy WORSE than the pure heuristic pipeline (0.736/0.740 vs 0.796/0.787 on
2 of 3 seeds) while improving every L1-family metric. This script separates
the candidate causes with data:

  * **magnitude vs phase**: each variant is vocoded twice — through the
    shipped fast-GL phase recovery AND with the ORACLE phase (the reference
    signal's own STFT phase applied to the variant's magnitude). If the
    trained magnitude scores ≥ heuristic under oracle phase but ≤ under
    G-L, the inversion lives in the phase-recovery interaction, not in the
    repaired magnitude itself.
  * **fine detail vs band envelope** (the r3 hypothesis): per-mel-band L1
    and per-band envelope correlation (Pearson over frames of each band's
    trajectory). STOI correlates band envelopes over 384 ms segments, so a
    generator that wins broadband L1 but decorrelates band trajectories
    would show exactly the observed pattern.

Also scores the **mel-consistency projection** (``spectral.
mel_consistency_project``, the shipped fix this diagnosis motivated —
r4): the trained repair projected back onto the conditioning mel's band
envelopes, which restores the quantity STOI scores while keeping the
repair's fine structure.

Reports per-variant STOI / mel-L1 / band-envelope-correlation means over
held-out utterances (synthetic seeds the training stream never saw, or
``--files`` wavs), a per-band table for the worst bands, and ONE
machine-readable ``STOI_ANALYSIS_RESULT {...}`` line for BASELINE.md.

    python scripts/stoi_analysis.py --train_dir /tmp/r4_corpus
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

# Persistent compiled-program cache. NOTE: on this machine jax is pre-imported
# at interpreter startup (axon plugin .pth), so JAX_COMPILATION_CACHE_DIR set
# here via os.environ is read too late — enable_compilation_cache() goes
# through jax.config.update, which works at any time (BASELINE.md r4).
from advoc_tpu.utils import enable_compilation_cache

enable_compilation_cache()


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--train_dir", required=True)
    p.add_argument("--model_size", choices=["full", "small"], default="full")
    p.add_argument("--model_overrides", default=None)
    p.add_argument("--n_frames", type=int, default=256)
    p.add_argument("--gl_iters", type=int, default=30)
    p.add_argument("--n_utts", type=int, default=8)
    p.add_argument("--seed0", type=int, default=200,
                   help="first held-out synthetic-speech seed")
    p.add_argument("--files", default=None,
                   help="optional newline list of eval wav paths to use "
                        "instead of synthetic utterances")
    args = p.parse_args(argv)

    import numpy as np

    import jax
    import jax.numpy as jnp

    from advoc_tpu.data import audioio, loader
    from advoc_tpu.models.advoc import AdvocGenerator, PatchDiscriminator
    from advoc_tpu.models.advoc.model import AdvocConfig, small_config
    from advoc_tpu.ops import spectral as sp
    from advoc_tpu.ops.reference import DEFAULT_PARAMS as P
    from advoc_tpu.train import gan
    from advoc_tpu.train.checkpoint import CheckpointManager
    from advoc_tpu.train.eval_metrics import stoi
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
    g_params = mgr.restore(template={"g": gstate, "d": dstate})["g"].params
    mgr.close()
    print(f"[stoi] restored step {step} from {args.train_dir}", flush=True)

    T = args.n_frames
    length = T * P.hop_length

    def magnitudes(mel):
        """(B, T, M) mel → (heuristic, trained, projected) magnitudes."""
        est = sp.r9y9_melspec_to_magspec(mel, P)
        est_norm = sp.normalize_db(sp.amp_to_db(est, P) - P.ref_level_db, P)
        rep = g.apply({"params": g_params}, est_norm)
        mag_g = sp.db_to_amp(sp.denormalize_db(rep, P) + P.ref_level_db)
        proj = sp.mel_consistency_project(mag_g, mel, P)
        return est, mag_g, proj

    @jax.jit
    def vocode_all(wav_ref):
        """One utterance → dict of 6 vocoded variants + mels."""
        mel = sp.waveform_to_r9y9_melspec(wav_ref, P)[:T][None]
        spec_ref = sp.stft(wav_ref, P)[:T]
        # Oracle phase: the reference's own unit phase per bin.
        ph = spec_ref / jnp.maximum(jnp.abs(spec_ref), 1e-12)
        est, mag_g, proj = magnitudes(mel)
        out = {}
        for name, mag in (("heuristic", est), ("trained", mag_g),
                          ("projected", proj)):
            out[name] = sp.griffin_lim(
                mag, length, n_iters=args.gl_iters, momentum=0.99, params=P
            )[0]
            out[name + "_oracle_phase"] = sp.istft(
                mag[0].astype(jnp.complex64) * ph, length, P
            )
        return out, mel[0]

    if args.files:
        fps = pathlib.Path(args.files).read_text().splitlines()[: args.n_utts]
        wavs = [audioio.decode_audio(fp, P.sample_rate)[:length] for fp in fps]
        wavs = [w for w in wavs if len(w) == length]
        src = f"{len(wavs)} eval files"
    else:
        wavs = [
            loader.synthetic_speech(args.seed0 + i, length)
            for i in range(args.n_utts)
        ]
        src = f"{len(wavs)} held-out synthetic utterances"
    print(f"[stoi] scoring {src} ({T} frames each)", flush=True)

    variants = ["heuristic", "trained", "projected",
                "heuristic_oracle_phase", "trained_oracle_phase",
                "projected_oracle_phase"]
    acc = {v: {"stoi": [], "mel_l1": [], "band_l1": [], "env_corr": []}
           for v in variants}
    for w in wavs:
        wj = jnp.asarray(w, jnp.float32)
        outs, mel_ref = vocode_all(wj)
        mel_ref = np.asarray(mel_ref)  # (T, M) normalized [0,1]
        for v in variants:
            y = np.asarray(outs[v])
            m = np.asarray(sp.waveform_to_r9y9_melspec(jnp.asarray(y), P))[:T]
            n = min(m.shape[0], T) - 1
            diff = np.abs(m[:n] - mel_ref[:n])  # (n, M)
            acc[v]["stoi"].append(stoi(w[: len(y)], y, P.sample_rate))
            acc[v]["mel_l1"].append(float(diff.mean()))
            acc[v]["band_l1"].append(diff.mean(axis=0))  # (M,)
            # Per-band envelope correlation: Pearson over frames of each
            # band trajectory — the quantity STOI actually scores (in
            # one-third-octave bands over 384 ms segments).
            a = m[:n] - m[:n].mean(axis=0)
            b = mel_ref[:n] - mel_ref[:n].mean(axis=0)
            denom = np.sqrt((a**2).sum(axis=0) * (b**2).sum(axis=0)) + 1e-12
            acc[v]["env_corr"].append((a * b).sum(axis=0) / denom)

    summary = {}
    for v in variants:
        summary[v] = {
            "stoi": float(np.mean(acc[v]["stoi"])),
            "mel_l1": float(np.mean(acc[v]["mel_l1"])),
            "env_corr_mean": float(np.mean(np.stack(acc[v]["env_corr"]))),
        }
    print("\n| variant | STOI | mel L1 | band-envelope corr |")
    print("|---|---|---|---|")
    for v in variants:
        s = summary[v]
        print(f"| {v} | {s['stoi']:.4f} | {s['mel_l1']:.4f} | "
              f"{s['env_corr_mean']:.4f} |")

    # Per-band diagnosis: where does the trained G win L1 but lose
    # envelope correlation (through the shipped G-L path)?
    bl_h = np.mean(np.stack(acc["heuristic"]["band_l1"]), axis=0)
    bl_t = np.mean(np.stack(acc["trained"]["band_l1"]), axis=0)
    ec_h = np.mean(np.stack(acc["heuristic"]["env_corr"]), axis=0)
    ec_t = np.mean(np.stack(acc["trained"]["env_corr"]), axis=0)
    worse_env = np.where(ec_t < ec_h - 0.02)[0]
    print(f"\nbands where trained env-corr < heuristic − 0.02: "
          f"{worse_env.tolist()}")
    print("band | L1 heur | L1 trained | env heur | env trained")
    for b in worse_env[:12]:
        print(f"{b:4d} | {bl_h[b]:.4f} | {bl_t[b]:.4f} | "
              f"{ec_h[b]:.4f} | {ec_t[b]:.4f}")

    result = {
        "ckpt_step": int(step),
        "n_utts": len(wavs),
        "source": "files" if args.files else "synthetic",
        **{v: {k: round(x, 4) for k, x in summary[v].items()}
           for v in variants},
        "bands_env_worse": [int(b) for b in worse_env.tolist()],
    }
    print("\nSTOI_ANALYSIS_RESULT " + json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
