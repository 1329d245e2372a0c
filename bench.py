"""Headline benchmark: fused mel→waveform vocoding real-time factor per chip.

Prints ONE JSON line:
  {"metric": "vocoding_realtime_factor", "value": <xRT>, "unit": "x_realtime",
   "vs_baseline": <xRT / 100>}

BASELINE.md north-star: ≥100× real time per TPU v5e chip for the full advoc
path (heuristic estimate → full-width U-Net generator → fast-GL phase
recovery scan → waveform) at 22050 Hz. vs_baseline is therefore value/100
(>1.0 beats the target).

Methodology: random-init full-size generator (throughput is independent of
weight values), batch of mel chunks covering ~190 s of audio, ONE fused jit,
warmup call, then timed calls with ``block_until_ready`` and a final single
array readback (per the axon-tunnel rules in .claude/skills/verify/SKILL.md).
Secondary configs (BASELINE.md 1–5) are reported on stderr; the driver
contract line goes to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

# Persistent compiled-program cache: repeat bench runs skip the remote
# compile on the axon tunnel. Must go through jax.config.update — jax is
# pre-imported at interpreter startup here (axon plugin .pth), so the
# env-var route is read too late (BASELINE.md r4 cold-start section).
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from advoc_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from advoc_tpu.data import loader
    from advoc_tpu.models.advoc import AdvocConfig, AdvocGenerator
    from advoc_tpu.models.advoc.model import small_config
    from advoc_tpu.ops import spectral
    from advoc_tpu.ops.reference import DEFAULT_PARAMS as P

    dev = jax.devices()[0]
    log(f"[bench] device: {dev}")

    # --- build the full advoc inference graph (BASELINE config 2, fused) ---
    cfg = AdvocConfig()  # full 64-wide, 256-frame chunks
    g = AdvocGenerator(cfg)
    rng = jax.random.PRNGKey(0)
    est0 = jnp.zeros((1, cfg.n_frames, cfg.n_freq))
    gparams = g.init(rng, est0)["params"]

    # 128 chunks × 256 frames × 256 hop / 22050 Hz ≈ 380 s of audio.
    # Batch sweep (r4): per-audio-second device cost keeps improving past
    # B=64 (0.36 → 0.29 → 0.26 ms/s at B=64/96/128 single-call) because the
    # fixed dispatch floor amortizes; B=128 is comfortably inside HBM.
    B = 128
    GL_ITERS = 30

    # Phase recovery: the VMEM-resident Pallas G-L kernel when a TPU backend
    # is present (at DEFAULT precision it uses split bf16 (hi,lo) DFT maps:
    # 28.8 ms vs 40.1 ms XLA-matmul at this config, slope-timed, mel L1
    # within 6e-4 — BASELINE.md kernel table), XLA matmul-DFT otherwise.
    on_tpu = any("tpu" in d.device_kind.lower() for d in jax.devices())
    fft_impl = "pallas" if on_tpu else "matmul"
    gl_precision = jax.lax.Precision.DEFAULT
    log(f"[bench] phase impl: {fft_impl}")

    def make_fused(impl, n_iters=GL_ITERS):
        def fused_vocode(params, mel):
            est = spectral.r9y9_melspec_to_magspec(mel, P)
            est_norm = spectral.normalize_db(
                spectral.amp_to_db(est, P) - P.ref_level_db, P
            )
            repaired = g.apply({"params": params}, est_norm)
            mag = spectral.db_to_amp(
                spectral.denormalize_db(repaired, P) + P.ref_level_db
            )
            # Shipped default for trained vocoders (BASELINE.md r4 STOI
            # section): the bench graph mirrors the production path. Cost is
            # two fused matmuls — within timing noise at every B measured.
            mag = spectral.mel_consistency_project(mag, mel, P)
            return spectral.griffin_lim(
                mag, cfg.n_frames * P.hop_length, n_iters=n_iters,
                momentum=0.99, params=P, precision=gl_precision,
                fft_impl=impl,
            )
        return fused_vocode

    vocode = jax.jit(make_fused(fft_impl))

    # Real speech-like mels (content irrelevant to throughput, but honest).
    wav = loader.synthetic_speech(0, B * cfg.n_frames * P.hop_length)
    mel = spectral.waveform_to_r9y9_melspec(jnp.asarray(wav), P)
    mel = mel[: B * cfg.n_frames].reshape(B, cfg.n_frames, P.n_mels)
    mel = jax.device_put(mel)

    # Timing note: on the axon tunnel, block_until_ready can return at
    # dispatch time, not execution completion — every timed trial therefore
    # ends with a 4-byte value readback (float(mean)), which cannot complete
    # before the computation has.
    def timed(fn, *args):
        t0 = time.perf_counter()
        out = fn(*args)
        checksum = float(jnp.mean(out))
        return time.perf_counter() - t0, out, checksum

    log("[bench] compiling fused vocoder (full U-Net + 30-iter fast-GL)...")
    dt, out, _ = timed(vocode, gparams, mel)
    log(f"[bench] compile+1st: {dt:.1f}s; out {out.shape} {out.dtype}")

    best = float("inf")
    for trial in range(3):
        dt, out, csum = timed(vocode, gparams, mel)
        best = min(best, dt)
        log(f"[bench] trial {trial} (single call): {dt*1000:.1f} ms "
            f"(mean={csum:.2e})")

    # Steady-state throughput: K back-to-back calls, ONE final readback.
    # A single timed call pays the axon tunnel's full dispatch+readback
    # (~25-28 ms) once per batch; a serving loop pipelines dispatch against
    # execution, which is what this measures (and what the per-stage
    # slope-timed kernel table in BASELINE.md corroborates).
    K = 8
    t0 = time.perf_counter()
    o = None
    for _ in range(K):
        o = vocode(gparams, mel)
    float(jnp.mean(o))
    chained = (time.perf_counter() - t0) / K

    audio_seconds = B * cfg.n_frames * P.hop_length / P.sample_rate
    xrt = audio_seconds / chained
    log(f"[bench] {audio_seconds:.1f}s audio in {chained*1000:.1f}ms/batch "
        f"steady-state ({best*1000:.1f}ms single-call) "
        f"→ {xrt:.0f}× realtime ({xrt*P.sample_rate/1e6:.2f}M samples/s/chip)")

    # Sanity: output finite (single readback of a reduced value).
    finite = bool(jax.device_get(jnp.isfinite(out).all()))
    assert finite, "non-finite vocoder output"

    # --- whole-graph MFU next to ×RT (VERDICT r4 #1; roofline table in
    # BASELINE.md r5). FLOPs come from XLA cost analysis of the matmul-DFT
    # variant of the SAME graph (the Pallas custom call is invisible to the
    # analysis; same algorithm ⇒ same required FLOPs), trip-count-corrected
    # for the G-L scan (cost analysis counts a while body once —
    # utils.roofline.cost_of_scan), plus the kernel's split bf16 (hi,lo)
    # synthesis extra pass. The two small costing compiles (0- and 1-iter
    # graphs) hit the persistent cache after the first run.
    mfu = None
    try:
        from advoc_tpu.utils import roofline as rl

        peaks = rl.device_peaks()
        flops = rl.cost_of_scan(
            lambda n: jax.jit(make_fused("matmul", n)), GL_ITERS,
            gparams, mel,
        )["flops"]
        if fft_impl == "pallas":
            flops += GL_ITERS * 2 * B * cfg.n_frames * 512 * P.n_fft * 2
        mfu = flops / chained / peaks.flops_per_s
        log(f"[bench] whole graph: {flops/1e12:.2f} TFLOP in "
            f"{chained*1000:.1f} ms → {flops/chained/1e12:.1f} TFLOP/s "
            f"= {mfu*100:.1f}% MFU of {peaks.name}"
            + (" (peaks assumed — not a TPU)" if peaks.assumed else ""))
    except Exception as e:  # accounting must never sink the headline line
        log(f"[bench] MFU accounting failed: {e}")

    # --- secondary: small-footprint streaming config (BASELINE config 4) ---
    try:
        scfg = small_config()
        sg = AdvocGenerator(scfg)
        sparams = sg.init(rng, jnp.zeros((1, scfg.n_frames, scfg.n_freq)))["params"]

        def stream_vocode(params, mel):
            est = spectral.r9y9_melspec_to_magspec(mel, P)
            est_norm = spectral.normalize_db(
                spectral.amp_to_db(est, P) - P.ref_level_db, P
            )
            repaired = sg.apply({"params": params}, est_norm)
            mag = spectral.db_to_amp(
                spectral.denormalize_db(repaired, P) + P.ref_level_db
            )
            return spectral.griffin_lim(
                mag, scfg.n_frames * P.hop_length, n_iters=16,
                momentum=0.99, params=P, precision=jax.lax.Precision.DEFAULT,
            )

        svoc = jax.jit(stream_vocode)
        smel = mel[:1, : scfg.n_frames]
        float(jnp.mean(svoc(sparams, smel)))  # compile + complete
        t0 = time.perf_counter()
        N = 10
        for _ in range(N):
            out2 = svoc(sparams, smel)
            float(jnp.mean(out2))  # forces completion (see note above)
        lat = (time.perf_counter() - t0) / N
        chunk_s = scfg.n_frames * P.hop_length / P.sample_rate
        log(f"[bench] streaming small: {lat*1000:.2f} ms/chunk "
            f"({chunk_s*1000:.0f} ms audio → {chunk_s/lat:.0f}× realtime)")
    except Exception as e:  # secondary must never sink the headline line
        log(f"[bench] streaming secondary failed: {e}")

    # --- extended panel (BASELINE configs 1, 3, 5) — manual runs only ---
    if os.environ.get("ADVOC_BENCH_FULL"):
        try:
            extended_panel(log)
        except Exception as e:
            log(f"[bench] extended panel failed: {e}")

    line = {
        "metric": "vocoding_realtime_factor",
        "value": round(xrt, 1),
        "unit": "x_realtime",
        "vs_baseline": round(xrt / 100.0, 3),
    }
    if mfu is not None:
        line["mfu"] = round(mfu, 4)
    print(json.dumps(line), flush=True)


def extended_panel(log) -> None:
    """BASELINE configs 1 (heuristic), 3 (GAN training), 5 (WaveGAN gen)."""
    import time

    import jax
    import jax.numpy as jnp

    from advoc_tpu.data import loader
    from advoc_tpu.models.advoc import AdvocConfig, AdvocGenerator, PatchDiscriminator
    from advoc_tpu.models.wavegan import WaveGANConfig, WaveGANGenerator
    from advoc_tpu.ops import spectral
    from advoc_tpu.ops.reference import DEFAULT_PARAMS as P
    from advoc_tpu.train import gan

    def timed(fn, *args, trials=3):
        fn(*args)  # compile
        float(jnp.mean(jax.tree.leaves(fn(*args))[0]))
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            out = fn(*args)
            float(jnp.mean(jax.tree.leaves(out)[0]))
            best = min(best, time.perf_counter() - t0)
        return best

    # Config 1: heuristic inversion (mel -> pinv -> fast-GL), no generator.
    B, T = 32, 256
    wav = loader.synthetic_speech(0, B * T * P.hop_length)
    mel = spectral.waveform_to_r9y9_melspec(jnp.asarray(wav), P)
    mel = mel[: B * T].reshape(B, T, P.n_mels)
    heur = jax.jit(
        lambda m: spectral.r9y9_melspec_to_waveform(m, n_iters=30, params=P)
    )
    dt = timed(heur, mel)
    audio_s = B * T * P.hop_length / P.sample_rate
    log(f"[bench:cfg1] heuristic inversion: {dt*1000:.1f} ms for "
        f"{audio_s:.0f}s → {audio_s/dt:.0f}× RT")

    # Config 3: advoc GAN training step (full size), samples/s/chip.
    cfg = AdvocConfig()
    g, d = AdvocGenerator(cfg), PatchDiscriminator(cfg)
    est0 = jnp.zeros((1, cfg.n_frames, cfg.n_freq))
    gstate, dstate = gan.make_states(g, d, (est0,), (est0, est0), seed=0)
    step = jax.jit(gan.make_advoc_train_step(g, d, cfg, P))
    bt = 16
    batch = jnp.asarray(
        loader.synthetic_speech(1, bt * cfg.n_frames * P.hop_length)
    ).reshape(bt, -1)
    rng = jax.random.PRNGKey(0)

    def train_once(gs, ds, b, r):
        return step(gs, ds, b, r)

    dt = timed(train_once, gstate, dstate, batch, rng)
    log(f"[bench:cfg3] advoc GAN train step: {dt*1000:.1f} ms "
        f"({bt/dt:.1f} clips/s, {bt*cfg.n_frames*P.hop_length/dt/1e6:.1f}M "
        f"audio-samples/s/chip)")

    # Config 6: long-form vocoding (60 s utterance, time-tiled Pallas G-L).
    # Fresh compile of the T=5376 fused graph is ~34 min on the axon
    # remote-compile tunnel — rely on JAX_COMPILATION_CACHE_DIR.
    from advoc_tpu.infer.vocoder import StreamingVocoder, Vocoder

    cfg = AdvocConfig()
    g = AdvocGenerator(cfg)
    gparams = g.init(jax.random.PRNGKey(0), jnp.zeros((1, cfg.n_frames, cfg.n_freq)))["params"]
    g_apply = lambda p, x: g.apply({"params": p}, x)
    voc = Vocoder(g_apply, gparams, P)
    secs = 60
    wav60 = loader.synthetic_speech(2, secs * P.sample_rate)
    mel60 = spectral.waveform_to_r9y9_melspec(jnp.asarray(wav60), P)
    float(jnp.mean(voc(mel60)))  # compile + complete
    K = 8
    t0 = time.perf_counter()
    o = None
    for _ in range(K):
        o = voc(mel60)
    float(jnp.mean(o))
    dt = (time.perf_counter() - t0) / K
    log(f"[bench:cfg6] long-form 60s utterance: {dt*1000:.1f} ms steady "
        f"→ {secs/dt:.0f}× RT")

    # Config 7: multi-stream low-latency serving (B concurrent streams per
    # push; dispatch amortized B ways — BASELINE.md streaming section).
    from advoc_tpu.models.advoc.model import small_config

    scfg = small_config()
    sg = AdvocGenerator(scfg)
    sparams = sg.init(jax.random.PRNGKey(0), jnp.zeros((1, scfg.n_frames, scfg.n_freq)))["params"]
    import numpy as np
    for Bs in (1, 16):
        sv = StreamingVocoder(
            lambda p, x: sg.apply({"params": p}, x), sparams, P,
            chunk_frames=scfg.n_frames, gl_iters=16, n_streams=Bs,
        )
        mel_np = np.asarray(mel60[: 20 * scfg.n_frames]).reshape(
            20, scfg.n_frames, P.n_mels
        )
        def push_i(i, Bs=Bs, sv=sv, mel_np=mel_np):
            return sv.push(np.broadcast_to(mel_np[i % 20], (Bs,) + mel_np.shape[1:]))
        for i in range(5):
            push_i(i)
        t0 = time.perf_counter()
        N = 30
        for i in range(N):
            push_i(5 + i)
        lat = (time.perf_counter() - t0) / N
        chunk_s = scfg.n_frames * P.hop_length / P.sample_rate
        log(f"[bench:cfg7] streaming x{Bs}: {lat*1000:.2f} ms/push wall, "
            f"{lat/Bs*1000:.3f} ms/stream ({chunk_s*1000:.0f} ms audio/chunk; "
            f"aggregate {chunk_s*Bs/lat:.0f}× RT)")

    # Config 5: WaveGAN generation throughput.
    wcfg = WaveGANConfig()
    wg = WaveGANGenerator(wcfg)
    wparams = wg.init(jax.random.PRNGKey(0), jnp.zeros((1, wcfg.latent_dim)))[
        "params"
    ]
    z = jax.random.normal(jax.random.PRNGKey(1), (64, wcfg.latent_dim))
    gen = jax.jit(lambda p, z: wg.apply({"params": p}, z))
    dt = timed(gen, wparams, z)
    audio_s = 64 * wcfg.slice_len / wcfg.sample_rate
    log(f"[bench:cfg5] wavegan generate: {dt*1000:.1f} ms for {audio_s:.0f}s "
        f"@16kHz → {audio_s/dt:.0f}× RT")


if __name__ == "__main__":
    main()
