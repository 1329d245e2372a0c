#!/usr/bin/env python
"""Per-stage MFU / roofline account of the headline graph + the train step.

VERDICT r4 next #1: for each stage of the fused B=128 vocoder (featurizer +
pinv estimate, U-Net forward, mel-consistency projection, G-L ×30) and for
the train step, report FLOPs, HBM bytes, achieved TFLOP/s, % of v5e peak
MXU, % of HBM bandwidth, and the speed-of-light time — a stated, quantified
answer to "where does the next 2× live, or why nowhere."

Method: FLOPs/bytes from XLA's optimized-HLO cost analysis
(``jit(f).lower().compile().cost_analysis()``); device seconds from
chained-call slope timing (the axon dispatch constant cancels —
BASELINE.md methodology note). The Pallas G-L kernel's custom call is
invisible to XLA cost analysis, so its FLOPs come from the equivalent XLA
matmul graph (same algorithm ⇒ same required FLOPs) plus a hand count of
the split-synthesis extra hi/lo pass; its bytes row is the hand-derived
VMEM-resident minimum (inputs + outputs + DFT tables), which is the point
of the kernel.

    python scripts/roofline.py [--batch 128] [--skip_train]

Prints the BASELINE.md markdown table on stderr and ONE machine-readable
``ROOFLINE_RESULT {...}`` JSON line on stdout.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from advoc_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=128,
                   help="headline batch (chunks of 256 frames)")
    p.add_argument("--train_batch", type=int, default=16)
    p.add_argument("--gl_iters", type=int, default=30)
    p.add_argument("--skip_train", action="store_true")
    p.add_argument("--k_hi", type=int, default=10,
                   help="long-chain length for slope timing")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (smoke/debug; plain "
                        "JAX_PLATFORMS is read too late — jax is "
                        "pre-imported on this machine)")
    args = p.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from advoc_tpu.data import loader
    from advoc_tpu.models.advoc import (
        AdvocConfig, AdvocGenerator, PatchDiscriminator,
    )
    from advoc_tpu.ops import spectral
    from advoc_tpu.ops.reference import DEFAULT_PARAMS as P
    from advoc_tpu.train import gan
    from advoc_tpu.utils import roofline as rl

    peaks = rl.device_peaks()
    on_tpu = any("tpu" in d.device_kind.lower() for d in jax.devices())
    log(f"[roofline] device: {jax.devices()[0].device_kind!r} → peaks "
        f"{peaks.name}; pallas={'yes' if on_tpu else 'no (CPU: XLA rows only)'}")

    cfg = AdvocConfig()
    g = AdvocGenerator(cfg)
    B, T, F, M = args.batch, cfg.n_frames, cfg.n_freq, P.n_mels
    hop = P.hop_length
    gparams = g.init(jax.random.PRNGKey(0), jnp.zeros((1, T, F)))["params"]

    wav = loader.synthetic_speech(0, B * T * hop)
    mel = spectral.waveform_to_r9y9_melspec(jnp.asarray(wav), P)
    mel = jax.device_put(mel[: B * T].reshape(B, T, M))

    # --- stage functions (the bench.py fused graph, cut at stage seams) ---
    def featurize(mel):
        est = spectral.r9y9_melspec_to_magspec(mel, P)
        return spectral.normalize_db(
            spectral.amp_to_db(est, P) - P.ref_level_db, P
        )

    def unet(params, est_norm):
        return g.apply({"params": params}, est_norm)

    def to_mag_project(repaired, mel):
        mag = spectral.db_to_amp(
            spectral.denormalize_db(repaired, P) + P.ref_level_db
        )
        return spectral.mel_consistency_project(mag, mel, P)

    def gl(mag, impl, n=args.gl_iters):
        return spectral.griffin_lim(
            mag, T * hop, n_iters=n, momentum=0.99, params=P,
            precision=jax.lax.Precision.DEFAULT, fft_impl=impl,
        )

    def fused(params, mel, impl, n=args.gl_iters):
        return gl(to_mag_project(unet(params, featurize(mel)), mel), impl, n)

    est_norm = jax.jit(featurize)(mel)
    repaired = jax.jit(unet)(gparams, est_norm)
    mag = jax.jit(to_mag_project)(repaired, mel)

    rows = []

    def stage(name, fn, *sargs, flops=None, bytes_=None, time_fn=None,
              cost=None):
        cost = cost or rl.cost_of(fn, *sargs)
        secs = rl.slope_time(
            jax.jit(time_fn or fn), *sargs, k_hi=args.k_hi
        )
        row = rl.roofline_row(
            name,
            cost["flops"] if flops is None else flops,
            cost["bytes"] if bytes_ is None else bytes_,
            secs, peaks,
        )
        rows.append(row)
        log(f"[roofline] {name}: {row['ms']:.2f} ms, "
            f"{row['flops']/1e9:.1f} GFLOP, {row['mfu']*100:.1f}% MFU, "
            f"{row['bw_frac']*100:.0f}% BW, bound={row['bound']}")
        return row

    stage("featurize+pinv estimate", featurize, mel)
    stage("U-Net forward", unet, gparams, est_norm)
    stage("db→amp + mel projection", to_mag_project, repaired, mel)
    # XLA cost analysis counts the G-L scan body ONCE regardless of trip
    # count, so every G-L-containing stage is costed trip-count-honestly
    # via cost_of_scan (c0 + n·(c1−c0) from length-0/1 scan graphs).
    gl_xla_cost = rl.cost_of_scan(
        lambda n: (lambda m: gl(m, "matmul", n)), args.gl_iters, mag
    )
    gl_xla_row = stage(f"fast-GL ×{args.gl_iters} (XLA matmul)",
                       lambda m: gl(m, "matmul"), mag, cost=gl_xla_cost)

    # Pallas G-L: FLOPs = XLA graph's + the split-synthesis extra pass.
    # Synthesis per iteration runs re+im (BT,F)@(F,n_fft) dots; split bf16
    # (hi,lo) doubles the SYNTHESIS side only (analysis stays single-pass):
    # extra = iters × 2(re,im) × BT × F_gl × n_fft × 2(mul+add). The kernel
    # drops the Nyquist bin (F_gl = 512). Bytes = the VMEM-resident minimum:
    # mag in + wav out + DFT tables once (that's the kernel's design point).
    F_gl = 512
    split_extra = args.gl_iters * 2 * B * T * F_gl * P.n_fft * 2
    pallas_bytes = (
        B * T * F * 4            # mag in, f32
        + B * T * hop * 4        # waveform out, f32
        + 3 * F_gl * P.n_fft * 2  # synth hi+lo & analysis bf16 tables
    )
    if on_tpu:
        stage(
            f"fast-GL ×{args.gl_iters} (Pallas VMEM, shipped)",
            lambda m: gl(m, "matmul"),  # cost source (overridden below)
            mag,
            flops=gl_xla_row["flops"] + split_extra,
            bytes_=pallas_bytes,
            time_fn=lambda m: gl(m, "pallas"),
        )

    impl = "pallas" if on_tpu else "matmul"
    whole_cost = rl.cost_of_scan(
        lambda n: (lambda p_, m: fused(p_, m, "matmul", n)),
        args.gl_iters, gparams, mel,
    )
    whole = stage(
        "WHOLE fused vocoder (shipped)",
        lambda p_, m: fused(p_, m, "matmul"), gparams, mel,
        cost=whole_cost,
        time_fn=lambda p_, m: fused(p_, m, impl),
    )
    if on_tpu:
        # Correct the whole-graph flops for the kernel's extra split pass;
        # the G-L loop's HBM round trips vanish in VMEM, so replace the XLA
        # loop bytes with the kernel's resident minimum.
        whole["flops"] += split_extra
        whole["bytes"] += pallas_bytes - gl_xla_cost["bytes"]
        whole.update(rl.roofline_row(
            whole["stage"], whole["flops"], whole["bytes"],
            whole["ms"] / 1e3, peaks,
        ))

    # --- the train step (BASELINE config 3) ---
    if not args.skip_train:
        d = PatchDiscriminator(cfg)
        est0 = jnp.zeros((1, T, F))
        gstate, dstate = gan.make_states(g, d, (est0,), (est0, est0), seed=0)
        step = jax.jit(gan.make_advoc_train_step(g, d, cfg, P))
        bt = args.train_batch
        batch = jnp.asarray(
            loader.synthetic_speech(1, bt * T * hop)
        ).reshape(bt, -1)
        rng = jax.random.PRNGKey(0)
        stage(f"GAN train step (B={bt}×{T * hop})",
              step, gstate, dstate, batch, rng)

    audio_s = B * T * hop / P.sample_rate
    log("")
    log(rl.format_table(rows, peaks))
    log("")
    log(f"[roofline] headline batch = {audio_s:.0f}s audio; whole-graph "
        f"×RT at the slope time: {audio_s / (whole['ms'] / 1e3):.0f}×")

    print("ROOFLINE_RESULT " + json.dumps({
        "device": peaks.name,
        "batch": B,
        "rows": [{k: (round(v, 4) if isinstance(v, float) else v)
                  for k, v in r.items()} for r in rows],
    }), flush=True)


if __name__ == "__main__":
    main()
