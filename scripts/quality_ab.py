#!/usr/bin/env python
"""Matched-run quality A/B harness for advoc architecture decisions.

Trains the advoc GAN for a fixed number of steps on the deterministic
synthetic fixture set and reports held-out eval L1. Every architecture
decision in BASELINE.md (decoder type, freq_pack, head_kernel, packed
discriminator) was made with this protocol: identical data stream,
optimizer, and step count; ≥3 seeds per variant, because GAN eval-L1 seed
spread is ±0.003 — never decide off one seed.

Usage:
  python scripts/quality_ab.py --overrides "freq_pack=4" --steps 1000 --seed 0
  python scripts/quality_ab.py --overrides "head_kernel=1" --steps 1000 --seed 1
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--overrides", default=None,
                   help="comma-separated AdvocConfig overrides for the "
                        "variant under test")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--h2d_dtype", choices=["int16", "float32", "mulaw8"],
                   default="int16",
                   help="training wire format under test (the model/optimizer "
                        "arms stay identical; the wire is the variant)")
    p.add_argument("--fixture_dir", default="/tmp/advoc_ab_fixture")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from advoc_tpu.data import audioio, loader
    from advoc_tpu.models.advoc import (
        AdvocConfig, AdvocGenerator, PatchDiscriminator,
    )
    from advoc_tpu.ops.reference import DEFAULT_PARAMS as P
    from advoc_tpu.train import gan
    from advoc_tpu.utils import apply_overrides

    cfg = apply_overrides(AdvocConfig(), args.overrides)
    g, d = AdvocGenerator(cfg), PatchDiscriminator(cfg)
    est0 = jnp.zeros((1, cfg.n_frames, cfg.n_freq))
    gstate, dstate = gan.make_states(
        g, d, (est0,), (est0, est0), seed=args.seed
    )
    step = jax.jit(gan.make_advoc_train_step(g, d, cfg, P))
    eval_step = jax.jit(gan.make_advoc_eval_step(g, cfg, P))

    # Deterministic fixture set (8 synthetic-speech files, seeds 0-7).
    out = pathlib.Path(args.fixture_dir)
    out.mkdir(parents=True, exist_ok=True)
    fps = []
    for i in range(8):
        fp = out / f"s{i}.wav"
        if not fp.exists():
            audioio.save_as_wav(
                loader.synthetic_speech(i, 4 * P.sample_rate), fp, P.sample_rate
            )
        fps.append(str(fp))

    slice_len = cfg.n_frames * P.hop_length
    it = loader.decode_extract_and_batch(
        fps, batch_size=args.batch_size, slice_len=slice_len, seed=args.seed,
        sample_rate=P.sample_rate, out_dtype=args.h2d_dtype,
    )
    rng = jax.random.PRNGKey(args.seed)
    warm = min(100, args.steps // 2)  # steps before the steady-state clock
    t0 = time.perf_counter()
    t_warm = None
    for i, batch in enumerate(it):
        if i >= args.steps:
            break
        rng, sub = jax.random.split(rng)
        gstate, dstate, metrics = step(gstate, dstate, jnp.asarray(batch), sub)
        if i == warm - 1:  # compile + warmup done; start the steady clock
            # Readback-synced, not block_until_ready: on the axon tunnel
            # block_until_ready can return at dispatch, so a scalar
            # readback is the only honest queue drain.
            float(metrics["d_loss"])
            t_warm = time.perf_counter()
    float(metrics["d_loss"])  # drain the dispatch queue before stopping
    jax.block_until_ready(gstate.params)
    dt = time.perf_counter() - t0
    steady = (
        (args.steps - warm) / (time.perf_counter() - t_warm)
        if t_warm is not None and args.steps > warm else float("nan")
    )

    # Held-out eval: fixture seeds the training stream never saw.
    evs = []
    for s in (100, 101, 102, 103):
        wav = loader.synthetic_speech(s, slice_len * 2)
        bt = jnp.asarray(wav).reshape(2, slice_len)
        m = eval_step(gstate.params, bt)
        evs.append({k: float(v) for k, v in m.items()})
    agg = {k: float(np.mean([e[k] for e in evs])) for k in evs[0]}
    print(
        f"RESULT overrides={args.overrides!r} steps={args.steps} "
        f"seed={args.seed} wire={args.h2d_dtype} time={dt:.0f}s "
        f"steady_steps_per_s={steady:.2f} "
        + " ".join(f"{k}={v:.4f}" for k, v in sorted(agg.items())),
        flush=True,
    )


if __name__ == "__main__":
    main()
