"""WaveGAN train/infer CLI (reference: ``models/wavegan/train_evaluate.py``).

End-to-end waveform GAN (BASELINE config 5): z → waveform, no phase-recovery
stage. --mode infer samples latents and writes wavs.

--conditional switches to the mel-conditioned variant (neural mel→waveform
vocoder, still no phase recovery): training extracts mels on-device and
infer vocodes --infer_input (wav or .npy mels) instead of sampling z.
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
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--max_steps", type=int, default=100000)
    p.add_argument("--ckpt_every", type=int, default=1000)
    p.add_argument("--log_every", type=int, default=20)
    p.add_argument("--n_devices", type=int, default=None)
    p.add_argument("--n_samples", type=int, default=8)
    p.add_argument("--eval_once", action="store_true")
    p.add_argument("--conditional", action="store_true",
                   help="mel-conditioned variant (neural mel→waveform)")
    p.add_argument("--infer_input", default=None,
                   help="conditional infer: wav to re-vocode or .npy mels")
    p.add_argument("--infer_dir", default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--h2d_dtype", choices=["int16", "float32", "mulaw8"],
                   default="int16",
                   help="wire dtype for train batches (int16 halves H2D "
                        "bytes; normalized on device)")
    p.add_argument("--debug_nans", action="store_true",
                   help="enable jax_debug_nans (traps the first NaN at its "
                        "producing op; slow — debugging only)")
    p.add_argument("--d_lr", type=float, default=None,
                   help="discriminator learning rate override (TTUR "
                        "stabilizer — the r3 conditional run diverged at "
                        "~step 1900 with an overpowered D at matched lrs; "
                        "BASELINE.md r5 guard-demo section)")
    return p


def make_config(args):
    from advoc_tpu.utils import apply_overrides

    if getattr(args, "conditional", False):
        from advoc_tpu.models.wavegan.conditional import CondWaveGANConfig

        return apply_overrides(CondWaveGANConfig(), args.model_overrides)
    from advoc_tpu.models.wavegan.model import WaveGANConfig

    return apply_overrides(WaveGANConfig(), args.model_overrides)


def _cond_models_and_states(cfg, seed, d_lr=None):
    import jax.numpy as jnp

    from advoc_tpu.models.wavegan.conditional import (
        CondWaveGANGenerator,
        CondWaveGANDiscriminator,
    )
    from advoc_tpu.train import gan

    g = CondWaveGANGenerator(cfg)
    d = CondWaveGANDiscriminator(cfg)
    m0 = jnp.zeros((1, cfg.n_frames, cfg.n_mels))
    w0 = jnp.zeros((1, cfg.slice_len))
    gstate, dstate = gan.make_states(
        g, d, (m0,), (w0, m0), seed=seed,
        g_tx=gan.adam(2e-4), d_tx=gan.adam(d_lr if d_lr else 2e-4),
    )
    return g, d, gstate, dstate


def _models_and_states(cfg, seed):
    import jax.numpy as jnp

    from advoc_tpu.models.wavegan import WaveGANGenerator, WaveGANDiscriminator
    from advoc_tpu.train import gan

    g = WaveGANGenerator(cfg)
    d = WaveGANDiscriminator(cfg)
    z0 = jnp.zeros((1, cfg.latent_dim))
    w0 = jnp.zeros((1, cfg.slice_len))
    gstate, dstate = gan.make_states(
        g, d, (z0,), (w0,), seed=seed,
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
    from advoc_tpu.parallel import data_mesh
    from advoc_tpu.train import gan, harness
    from advoc_tpu.utils.config import ensure_dataset

    from jax.sharding import NamedSharding, PartitionSpec as Pspec

    cfg = make_config(args)
    mesh = data_mesh(args.n_devices, batch_size=args.batch_size)
    fps = ensure_dataset(args.data_dir, f"{args.train_dir}/synthetic_data")

    if args.conditional:
        from advoc_tpu.ops.reference import DEFAULT_PARAMS

        g, d, gstate, dstate = _cond_models_and_states(cfg, args.seed, d_lr=args.d_lr)
        print(f"[train] conditional wavegan (mel→waveform): "
              f"{len(jax.devices())} device(s)", flush=True)
        step = gan.make_cond_wavegan_train_step(g, d, cfg, DEFAULT_PARAMS)
        dp_step = gan.jit_data_parallel(step, mesh)
        it = loader.decode_extract_and_batch(
            fps, batch_size=args.batch_size, slice_len=cfg.slice_len,
            seed=args.seed, sample_rate=DEFAULT_PARAMS.sample_rate,
            out_dtype=args.h2d_dtype,
        )
        it = loader.device_prefetch(
            it, sharding=NamedSharding(mesh, Pspec("data")), depth=2
        )
        harness.train_loop(
            dp_step, gstate, dstate, it, args.train_dir,
            max_steps=args.max_steps, ckpt_every=args.ckpt_every,
            log_every=args.log_every, seed=args.seed,
            config=dataclasses.asdict(cfg),
        )
        return

    g, d, gstate, dstate = _models_and_states(cfg, args.seed)
    print(f"[train] wavegan: {len(jax.devices())} device(s), "
          f"n_critic={cfg.n_critic}", flush=True)

    step = gan.make_wavegan_train_step(g, d, cfg)
    dp_step = gan.jit_data_parallel(step, mesh, batch_axis=1)

    it = loader.decode_extract_and_batch(
        fps, batch_size=args.batch_size * cfg.n_critic,
        slice_len=cfg.slice_len, seed=args.seed, out_dtype=args.h2d_dtype,
    )
    # Reshape each (n_critic*B, T) batch to (n_critic, B, T) for the scan.
    stacked = (
        b.reshape(cfg.n_critic, args.batch_size, cfg.slice_len) for b in it
    )
    stacked = loader.device_prefetch(
        stacked, sharding=NamedSharding(mesh, Pspec(None, "data")), depth=2
    )
    harness.train_loop(
        dp_step, gstate, dstate, stacked, args.train_dir,
        max_steps=args.max_steps, ckpt_every=args.ckpt_every,
        log_every=args.log_every, seed=args.seed,
        config=dataclasses.asdict(cfg),
    )


def infer(args) -> None:
    import jax
    import jax.numpy as jnp

    from advoc_tpu.data import audioio
    from advoc_tpu.train.checkpoint import CheckpointManager

    cfg = make_config(args)
    if args.conditional:
        _cond_infer(args, cfg)
        return
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
    wavs = np.asarray(jax.jit(lambda p, z: g.apply({"params": p}, z))(gparams, z))
    out_dir = pathlib.Path(args.infer_dir or f"{args.train_dir}/infer")
    out_dir.mkdir(parents=True, exist_ok=True)
    for i, w in enumerate(wavs):
        path = out_dir / f"generated_{i}.wav"
        audioio.save_as_wav(w, path, cfg.sample_rate)
        print(f"[infer] wrote {path}", flush=True)


def _cond_infer(args, cfg) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from advoc_tpu.data import audioio, loader
    from advoc_tpu.ops import spectral
    from advoc_tpu.ops.reference import DEFAULT_PARAMS
    from advoc_tpu.train.checkpoint import CheckpointManager

    g, d, gstate, dstate = _cond_models_and_states(cfg, args.seed)
    mgr = CheckpointManager(args.train_dir)
    if mgr.latest_step() is not None:
        bundle = mgr.restore(template={"g": gstate, "d": dstate})
        gparams = bundle["g"].params
        print(f"[infer] restored step {mgr.latest_step()}", flush=True)
    else:
        gparams = gstate.params
        print("[infer] no checkpoint — random init", flush=True)
    mgr.close()

    if args.infer_input and args.infer_input.endswith(".npy"):
        mels = np.load(args.infer_input)
        if mels.ndim == 2:
            mels = mels[None]
    else:
        if args.infer_input:
            wav = audioio.decode_audio(args.infer_input, cfg.sample_rate)
        else:
            wav = loader.synthetic_speech(0, cfg.sample_rate * 2)
        mels = np.asarray(
            spectral.waveform_to_r9y9_melspec(jnp.asarray(wav), DEFAULT_PARAMS)
        )[None]

    gen = jax.jit(lambda p, m: g.apply({"params": p}, m))
    out_dir = pathlib.Path(args.infer_dir or f"{args.train_dir}/infer")
    out_dir.mkdir(parents=True, exist_ok=True)
    for i, mel in enumerate(mels):
        t = (mel.shape[0] // cfg.n_frames) * cfg.n_frames
        t = max(t, cfg.n_frames)
        m = np.zeros((t, cfg.n_mels), np.float32)
        m[: min(t, mel.shape[0])] = mel[:t]
        chunks = jnp.asarray(m).reshape(-1, cfg.n_frames, cfg.n_mels)
        wavs = np.asarray(gen(gparams, chunks)).reshape(-1)
        path = out_dir / f"neural_vocoded_{i}.wav"
        audioio.save_as_wav(wavs, path, cfg.sample_rate)
        print(f"[infer] wrote {path} ({len(wavs)} samples)", flush=True)


def evaluate(args) -> None:
    """Poll checkpoints; report D's real/fake logit gap and (conditional)
    re-extracted-mel L1 over generated audio; dump sample wavs as audio
    summaries (the reference's eval UX, SURVEY.md §3.2)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from advoc_tpu.data import loader
    from advoc_tpu.ops import spectral
    from advoc_tpu.ops.reference import DEFAULT_PARAMS
    from advoc_tpu.train import harness
    from advoc_tpu.utils.config import ensure_dataset

    cfg = make_config(args)
    if args.conditional:
        g, d, gstate, dstate = _cond_models_and_states(cfg, args.seed)
    else:
        g, d, gstate, dstate = _models_and_states(cfg, args.seed)
    fps = ensure_dataset(args.data_dir, f"{args.train_dir}/synthetic_data")

    def data_fn():
        return loader.decode_extract_and_batch(
            fps, batch_size=args.batch_size, slice_len=cfg.slice_len,
            repeat=False, shuffle=False, drop_remainder=False,
            sample_rate=DEFAULT_PARAMS.sample_rate if args.conditional else None,
        )

    if args.conditional:
        def eval_fn(gparams, wav):
            wav = jnp.asarray(wav)
            mel = spectral.waveform_to_r9y9_melspec(wav, DEFAULT_PARAMS)
            mel = mel[:, : cfg.n_frames, :]
            fake = g.apply({"params": gparams}, mel)
            mel_fake = spectral.waveform_to_r9y9_melspec(fake, DEFAULT_PARAMS)
            return {"eval_mel_l1": jnp.mean(
                jnp.abs(mel_fake[:, : cfg.n_frames, :] - mel))}

        def audio_fn(gparams):
            wav = loader.synthetic_speech(123, cfg.slice_len)
            mel = spectral.waveform_to_r9y9_melspec(
                jnp.asarray(wav)[None], DEFAULT_PARAMS)[:, : cfg.n_frames, :]
            out = g.apply({"params": gparams}, mel)
            return [("neural_vocoded", np.asarray(out[0]), cfg.sample_rate)]
    else:
        def eval_fn(gparams, wav):
            z = jax.random.normal(
                jax.random.PRNGKey(0), (wav.shape[0], cfg.latent_dim))
            fake = g.apply({"params": gparams}, z)
            return {"eval_gen_rms": jnp.sqrt(jnp.mean(fake**2)),
                    "eval_gen_peak": jnp.max(jnp.abs(fake))}

        def audio_fn(gparams):
            z = jax.random.normal(jax.random.PRNGKey(7), (1, cfg.latent_dim))
            out = g.apply({"params": gparams}, z)
            return [("generated", np.asarray(out[0]), cfg.sample_rate)]

    harness.eval_loop(
        jax.jit(eval_fn), lambda: (gstate, dstate), data_fn, args.train_dir,
        once=args.eval_once, audio_fn=audio_fn,
    )


def main(argv=None):
    args = build_parser().parse_args(argv)
    from advoc_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    {"train": train, "eval": evaluate, "infer": infer}[args.mode](args)


if __name__ == "__main__":
    main()
