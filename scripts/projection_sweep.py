#!/usr/bin/env python
"""Sweep the mel-consistency projection's knobs (VERDICT r4 next #4).

The projection shipped in r4 at defaults chosen without a sweep
(``strength=1.0, max_gain=4.0, n_iters=1`` — ``ops/spectral.py``
``mel_consistency_project``). This script grids (strength, max_gain,
n_iters) on held-out utterances through the trained generator and the
shipped G-L path, scoring STOI, re-extracted mel L1, and normalized-dB
spec L1 vs the true magnitude — the three quantities the r4 decision was
made on (BASELINE.md r4 projection section).

``strength``/``max_gain`` are traced scalars, so the whole grid shares one
compile per distinct ``n_iters`` (the unrolled loop is structural).

    python scripts/projection_sweep.py --train_dir /tmp/r5_corpus/train

Prints a markdown table + ONE ``PROJECTION_SWEEP_RESULT {...}`` line.
"""

from __future__ import annotations

import argparse
import itertools
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

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
    p.add_argument("--seed0", type=int, default=200)
    p.add_argument("--strengths", default="0.0,0.5,1.0")
    p.add_argument("--max_gains", default="2.0,4.0,8.0")
    p.add_argument("--n_iters", default="1,2,3")
    args = p.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp

    from advoc_tpu.data import loader
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
    ckpt_step = mgr.latest_step()
    if ckpt_step is None:
        raise FileNotFoundError(f"no checkpoint in {args.train_dir}")
    g_params = mgr.restore(template={"g": gstate, "d": dstate})["g"].params
    mgr.close()
    print(f"[sweep] restored step {ckpt_step} from {args.train_dir}",
          flush=True)

    T = args.n_frames
    length = T * P.hop_length

    def make_vocode(n_it: int):
        @jax.jit
        def vocode(wav_ref, strength, max_gain):
            mel = sp.waveform_to_r9y9_melspec(wav_ref, P)[:T][None]
            mag_true = jnp.abs(sp.stft(wav_ref, P))[:T][None]
            est = sp.r9y9_melspec_to_magspec(mel, P)
            est_norm = sp.normalize_db(sp.amp_to_db(est, P)
                                       - P.ref_level_db, P)
            rep = g.apply({"params": g_params}, est_norm)
            mag_g = sp.db_to_amp(sp.denormalize_db(rep, P) + P.ref_level_db)
            proj = sp.mel_consistency_project(
                mag_g, mel, P, strength=strength, max_gain=max_gain,
                n_iters=n_it,
            )
            y = sp.griffin_lim(
                proj, length, n_iters=args.gl_iters, momentum=0.99, params=P
            )[0]
            # normalized-dB L1 vs the true magnitude (the r4 decision's
            # third axis: does the projection drag the repair back toward
            # the heuristic's 0.127, or keep its ~0.07?)
            pn = sp.normalize_db(sp.amp_to_db(proj, P) - P.ref_level_db, P)
            tn = sp.normalize_db(
                sp.amp_to_db(mag_true, P) - P.ref_level_db, P)
            db_l1 = jnp.abs(pn - tn).mean()
            return y, mel[0], db_l1

        return vocode

    wavs = [loader.synthetic_speech(args.seed0 + i, length)
            for i in range(args.n_utts)]
    strengths = [float(s) for s in args.strengths.split(",")]
    max_gains = [float(s) for s in args.max_gains.split(",")]
    n_iters = [int(s) for s in args.n_iters.split(",")]
    vocoders = {n: make_vocode(n) for n in n_iters}

    # strength=0 ignores max_gain/n_iters: score it once as the raw-repair
    # floor row instead of 9 duplicate grid points.
    grid = [(0.0, max_gains[0], n_iters[0])] if 0.0 in strengths else []
    grid += [g_ for g_ in itertools.product(
        [s for s in strengths if s > 0.0], max_gains, n_iters)]

    rows = []
    for s, mg, ni in grid:
        st, ml = [], []
        db = []
        for w in wavs:
            y, mel_ref, db_l1 = vocoders[ni](
                jnp.asarray(w, jnp.float32), jnp.float32(s), jnp.float32(mg)
            )
            y = np.asarray(y)
            m = np.asarray(
                sp.waveform_to_r9y9_melspec(jnp.asarray(y), P))[:T]
            n = min(m.shape[0], T) - 1
            st.append(stoi(w[: len(y)], y, P.sample_rate))
            ml.append(float(np.abs(m[:n] - np.asarray(mel_ref)[:n]).mean()))
            db.append(float(db_l1))
        rows.append(dict(strength=s, max_gain=mg, n_iters=ni,
                         stoi=float(np.mean(st)),
                         mel_l1=float(np.mean(ml)),
                         db_l1_vs_true=float(np.mean(db))))
        r = rows[-1]
        print(f"[sweep] s={s} max_gain={mg} n_iters={ni}: "
              f"STOI {r['stoi']:.4f} mel_l1 {r['mel_l1']:.4f} "
              f"dbL1 {r['db_l1_vs_true']:.4f}", flush=True)

    print("\n| strength | max_gain | n_iters | STOI | mel L1 | dB-L1 vs true |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['strength']} | {r['max_gain']} | {r['n_iters']} | "
              f"{r['stoi']:.4f} | {r['mel_l1']:.4f} | "
              f"{r['db_l1_vs_true']:.4f} |")

    best = max(rows, key=lambda r: r["stoi"])
    shipped = next((r for r in rows if r["strength"] == 1.0
                    and r["max_gain"] == 4.0 and r["n_iters"] == 1), None)
    result = {"ckpt_step": int(ckpt_step), "n_utts": len(wavs),
              "rows": [{k: round(v, 4) if isinstance(v, float) else v
                        for k, v in r.items()} for r in rows],
              "best": best, "shipped": shipped}
    print("\nPROJECTION_SWEEP_RESULT " + json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
