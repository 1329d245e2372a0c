"""MelSpecGAN train/infer CLI (reference: ``models/melspecgan/``).

Unconditional mel-spectrogram GAN (SURVEY.md §2.1 #13). --mode infer samples
mels and (optionally) vocodes them with the heuristic advoc pipeline — the
paper's melspecgan+advoc unconditional-speech experiment.
"""

from __future__ import annotations

import dataclasses

import argparse
import pathlib

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mode", choices=["train", "eval", "infer"], required=True)
    p.add_argument("--train_dir", required=True)
    p.add_argument("--data_dir", default=None,
                   help="directory of wavs or a .txt file list")
    p.add_argument("--model_overrides", default=None)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--max_steps", type=int, default=100000)
    p.add_argument("--ckpt_every", type=int, default=1000)
    p.add_argument("--log_every", type=int, default=20)
    p.add_argument("--n_devices", type=int, default=None)
    p.add_argument("--n_samples", type=int, default=8)
    p.add_argument("--eval_once", action="store_true")
    p.add_argument("--vocode", action="store_true",
                   help="also vocode sampled mels to wavs (heuristic path, "
                        "or through a trained advoc generator with "
                        "--advoc_ckpt)")
    p.add_argument("--advoc_ckpt", default=None,
                   help="train_dir of a trained advoc run; sampled mels are "
                        "vocoded through its generator (the paper's "
                        "melspecgan+advoc unconditional pipeline, SURVEY.md "
                        "§2.1 #13) instead of the pure heuristic path")
    p.add_argument("--advoc_model_size", choices=["full", "small"],
                   default="full")
    p.add_argument("--advoc_overrides", default=None,
                   help="config overrides for the advoc generator (must "
                        "match how the checkpoint was trained)")
    p.add_argument("--gl_iters", type=int, default=30)
    p.add_argument("--infer_dir", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--h2d_dtype", choices=["int16", "float32", "mulaw8"],
                   default="int16",
                   help="wire dtype for train batches (int16 halves H2D "
                        "bytes; normalized on device)")
    p.add_argument("--debug_nans", action="store_true",
                   help="enable jax_debug_nans (traps the first NaN at its "
                        "producing op; slow — debugging only)")
    return p


def make_config(args):
    from advoc_tpu.models.melspecgan.model import MelSpecGANConfig
    from advoc_tpu.utils import apply_overrides

    return apply_overrides(MelSpecGANConfig(), args.model_overrides)


def _models_and_states(cfg, seed):
    import jax.numpy as jnp

    from advoc_tpu.models.melspecgan import (
        MelSpecGANGenerator,
        MelSpecGANDiscriminator,
    )
    from advoc_tpu.train import gan

    g = MelSpecGANGenerator(cfg)
    d = MelSpecGANDiscriminator(cfg)
    z0 = jnp.zeros((1, cfg.latent_dim))
    m0 = jnp.zeros((1, cfg.n_frames, cfg.n_mels))
    gstate, dstate = gan.make_states(
        g, d, (z0,), (m0,), seed=seed,
        g_tx=gan.adam(1e-4, 0.5, 0.9), d_tx=gan.adam(1e-4, 0.5, 0.9),
    )
    return g, d, gstate, dstate


def train(args) -> None:
    import jax

    from advoc_tpu.parallel.distributed import initialize as dist_init

    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    if dist_init():
        print(f"[train] multi-host: process {jax.process_index()} of "
              f"{jax.process_count()}", flush=True)

    from advoc_tpu.data import loader
    from advoc_tpu.ops.reference import DEFAULT_PARAMS
    from advoc_tpu.parallel import data_mesh
    from advoc_tpu.train import gan, harness
    from advoc_tpu.utils.config import ensure_dataset

    cfg = make_config(args)
    g, d, gstate, dstate = _models_and_states(cfg, args.seed)
    print(f"[train] melspecgan: {len(jax.devices())} device(s)", flush=True)

    step = gan.make_melspecgan_train_step(g, d, cfg, DEFAULT_PARAMS)
    mesh = data_mesh(args.n_devices, batch_size=args.batch_size)
    dp_step = gan.jit_data_parallel(step, mesh, batch_axis=1)

    fps = ensure_dataset(args.data_dir, f"{args.train_dir}/synthetic_data")
    slice_len = cfg.n_frames * DEFAULT_PARAMS.hop_length
    it = loader.decode_extract_and_batch(
        fps, batch_size=args.batch_size * cfg.n_critic,
        slice_len=slice_len, seed=args.seed,
        sample_rate=DEFAULT_PARAMS.sample_rate, out_dtype=args.h2d_dtype,
    )
    stacked = (
        b.reshape(cfg.n_critic, args.batch_size, slice_len) for b in it
    )
    from jax.sharding import NamedSharding, PartitionSpec as Pspec

    stacked = loader.device_prefetch(
        stacked, sharding=NamedSharding(mesh, Pspec(None, "data")), depth=2
    )
    harness.train_loop(
        dp_step, gstate, dstate, stacked, args.train_dir,
        max_steps=args.max_steps, ckpt_every=args.ckpt_every,
        log_every=args.log_every, seed=args.seed,
        config=dataclasses.asdict(cfg),
    )


def _make_vocoder(args):
    """Build the mel→waveform vocoder for --vocode.

    Default: the fused heuristic pipeline. With --advoc_ckpt: the trained
    AdvocGenerator restored from that run repairs the heuristic magnitude
    estimate inside the same single jit region — the paper's unconditional
    pipeline (melspecgan samples mels, advoc vocodes them; SURVEY.md:53-55).
    Returns (vocoder, description).
    """
    import jax.numpy as jnp

    from advoc_tpu.infer import Vocoder
    from advoc_tpu.ops.reference import DEFAULT_PARAMS

    if args.advoc_ckpt is None:
        cfg = make_config(args)
        return (
            Vocoder(params=DEFAULT_PARAMS, chunk_frames=cfg.n_frames,
                    gl_iters=args.gl_iters),
            "heuristic",
        )

    from advoc_tpu.models.advoc import AdvocGenerator, PatchDiscriminator
    from advoc_tpu.models.advoc.model import AdvocConfig, small_config
    from advoc_tpu.train import gan
    from advoc_tpu.train.checkpoint import CheckpointManager
    from advoc_tpu.utils import apply_overrides

    acfg = small_config() if args.advoc_model_size == "small" else AdvocConfig()
    acfg = apply_overrides(acfg, args.advoc_overrides)
    g = AdvocGenerator(acfg)
    d = PatchDiscriminator(acfg)
    est0 = jnp.zeros((1, acfg.n_frames, acfg.n_freq))
    gstate, dstate = gan.make_states(g, d, (est0,), (est0, est0), seed=0)
    mgr = CheckpointManager(args.advoc_ckpt)
    step = mgr.latest_step()
    if step is None:
        mgr.close()
        raise FileNotFoundError(
            f"--advoc_ckpt {args.advoc_ckpt}: no checkpoint found "
            "(train one with models/advoc/train_evaluate.py --mode train)"
        )
    bundle = mgr.restore(template={"g": gstate, "d": dstate})
    mgr.close()
    voc = Vocoder(
        g_apply=lambda p, est: g.apply({"params": p}, est),
        g_params=bundle["g"].params, params=DEFAULT_PARAMS,
        chunk_frames=acfg.n_frames, gl_iters=args.gl_iters,
    )
    return voc, f"advoc step {step}"


def infer(args) -> None:
    import jax
    import jax.numpy as jnp

    from advoc_tpu.data import audioio
    from advoc_tpu.ops.reference import DEFAULT_PARAMS
    from advoc_tpu.train.checkpoint import CheckpointManager

    cfg = make_config(args)
    g, d, gstate, dstate = _models_and_states(cfg, args.seed)
    mgr = CheckpointManager(args.train_dir)
    if mgr.latest_step() is not None:
        bundle = mgr.restore(template={"g": gstate, "d": dstate})
        gparams = bundle["g"].params
        print(f"[infer] restored step {mgr.latest_step()}", flush=True)
    else:
        gparams = gstate.params
        print("[infer] no checkpoint — random init", flush=True)
    mgr.close()

    z = jax.random.normal(
        jax.random.PRNGKey(args.seed), (args.n_samples, cfg.latent_dim)
    )
    mels = np.asarray(jax.jit(lambda p, z: g.apply({"params": p}, z))(gparams, z))
    out_dir = pathlib.Path(args.infer_dir or f"{args.train_dir}/infer")
    out_dir.mkdir(parents=True, exist_ok=True)
    np.save(out_dir / "mels.npy", mels)
    print(f"[infer] wrote {out_dir/'mels.npy'} {mels.shape}", flush=True)
    if args.vocode:
        from advoc_tpu.ops import spectral

        voc, desc = _make_vocoder(args)
        wavs = np.asarray(voc(jnp.asarray(mels)))
        # Quality panel: re-extract mels from the vocoded audio and compare
        # against the sampled mels (the round-trip metric used repo-wide).
        re_mel = np.asarray(
            jax.jit(lambda w: spectral.waveform_to_r9y9_melspec(
                w, DEFAULT_PARAMS))(jnp.asarray(wavs))
        )
        t = min(re_mel.shape[1], mels.shape[1])
        per_sample = np.mean(
            np.abs(re_mel[:, :t] - mels[:, :t]), axis=(1, 2)
        )
        print(f"[infer] vocoder: {desc}; re-extracted mel L1 "
              f"mean={per_sample.mean():.4f} "
              f"per-sample={np.round(per_sample, 4).tolist()}", flush=True)
        for i, w in enumerate(wavs):
            path = out_dir / f"unconditional_{i}.wav"
            audioio.save_as_wav(w, path, DEFAULT_PARAMS.sample_rate)
            print(f"[infer] wrote {path}", flush=True)


def evaluate(args) -> None:
    """Poll checkpoints; compare generated-mel statistics against the real
    mel distribution and dump mel image summaries.

    Metrics (VERDICT r2 weak #7 — the old global-moment pair could not see
    mode collapse): per-band moment panel + across-sample diversity
    (:func:`advoc_tpu.train.eval_metrics.melspec_moment_panel`) plus a
    held-out-D score — the *trained* discriminator restored from the same
    checkpoint scores real vs generated batches; ``eval_d_margin`` =
    mean(D(real)) − mean(D(fake)). A healthy GAN keeps the margin small; a
    collapsed or off-distribution generator is trivially separated."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from advoc_tpu.data import loader
    from advoc_tpu.ops import spectral
    from advoc_tpu.ops.reference import DEFAULT_PARAMS
    from advoc_tpu.train import harness
    from advoc_tpu.train.eval_metrics import melspec_moment_panel
    from advoc_tpu.utils.config import ensure_dataset

    cfg = make_config(args)
    g, d, gstate, dstate = _models_and_states(cfg, args.seed)
    fps = ensure_dataset(args.data_dir, f"{args.train_dir}/synthetic_data")
    slice_len = cfg.n_frames * DEFAULT_PARAMS.hop_length

    def data_fn():
        return loader.decode_extract_and_batch(
            fps, batch_size=args.batch_size, slice_len=slice_len,
            repeat=False, shuffle=False, drop_remainder=False,
            sample_rate=DEFAULT_PARAMS.sample_rate,
        )

    def eval_fn(bundle, wav):
        gparams = bundle["g"].params
        dparams = bundle["d"].params
        wav = jnp.asarray(wav)
        real = spectral.waveform_to_r9y9_melspec(wav, DEFAULT_PARAMS)
        real = real[:, : cfg.n_frames, :]
        z = jax.random.normal(
            jax.random.PRNGKey(0), (wav.shape[0], cfg.latent_dim))
        fake = g.apply({"params": gparams}, z)
        m = melspec_moment_panel(real, fake)
        d_real = d.apply({"params": dparams}, real).mean()
        d_fake = d.apply({"params": dparams}, fake).mean()
        m["eval_d_real"] = d_real
        m["eval_d_fake"] = d_fake
        m["eval_d_margin"] = d_real - d_fake
        return m

    def image_fn(gparams):
        # audio/image fns always receive generator params (harness contract;
        # only eval_fn sees the full bundle under eval_takes_bundle).
        z = jax.random.normal(jax.random.PRNGKey(7), (1, cfg.latent_dim))
        mel = g.apply({"params": gparams}, z)
        return [("generated_mel", np.asarray(mel[0]).T[::-1])]

    harness.eval_loop(
        jax.jit(eval_fn), lambda: (gstate, dstate), data_fn, args.train_dir,
        once=args.eval_once, image_fn=image_fn, eval_takes_bundle=True,
    )


def main(argv=None):
    args = build_parser().parse_args(argv)
    from advoc_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    {"train": train, "eval": evaluate, "infer": infer}[args.mode](args)


if __name__ == "__main__":
    main()
