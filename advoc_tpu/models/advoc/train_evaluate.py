"""advoc train/eval/infer CLI (reference: ``models/advoc/train_evaluate.py``).

Usage (mirrors the reference's argparse surface, SURVEY.md §1 L5):

  python -m advoc_tpu.models.advoc.train_evaluate --mode train \
      --train_dir /tmp/advoc_run --data_dir /path/to/LJSpeech/wavs

  python -m advoc_tpu.models.advoc.train_evaluate --mode eval \
      --train_dir /tmp/advoc_run --data_dir ... [--eval_once]

  python -m advoc_tpu.models.advoc.train_evaluate --mode infer \
      --train_dir /tmp/advoc_run --infer_input mels.npy --infer_dir out/

Model size: --model_size {full,small} (small = reduced-width streaming
variant, SURVEY.md §2.1 #11); any hyperparameter via
--model_overrides "width=32,l1_weight=50".
"""

from __future__ import annotations

import argparse
import pathlib

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--mode", choices=["train", "eval", "infer"], required=True)
    p.add_argument("--train_dir", required=True)
    p.add_argument("--data_dir", default=None,
                   help="directory of wavs, or a .txt file list "
                        "from scripts/prepare_dataset.py")
    p.add_argument("--model_size", choices=["full", "small"], default="full")
    p.add_argument("--model_overrides", default=None,
                   help="comma-separated key=value config overrides")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--max_steps", type=int, default=100000)
    p.add_argument("--ckpt_every", type=int, default=1000)
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--n_devices", type=int, default=None,
                   help="data-parallel device count (default: all)")
    p.add_argument("--eval_once", action="store_true")
    p.add_argument("--eval_timeout_s", type=float, default=3600.0,
                   help="eval mode: exit after this long without a new "
                        "checkpoint (concurrent train+eval runs use a small "
                        "value so eval ends shortly after training does)")
    p.add_argument("--infer_input", default=None,
                   help=".npy of (T,80) or (B,T,80) mels, or a wav to "
                        "re-vocode; default: synthetic fixture")
    p.add_argument("--infer_dir", default=None)
    p.add_argument("--gl_iters", type=int, default=30)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--h2d_dtype", choices=["int16", "float32", "mulaw8"],
                   default="int16",
                   help="wire dtype for train batches; int16 halves "
                        "host-to-device bytes (lossless for PCM16 sources) "
                        "and the step normalizes on device")
    p.add_argument("--data_placement", choices=["auto", "hbm", "wire"],
                   default="auto",
                   help="'hbm' stages the whole corpus in device memory as "
                        "int16 and samples random crops on device (the host "
                        "ships 4 bytes/clip/step of crop indices — removes "
                        "the batch wire from the steady-state loop; batches "
                        "bit-identical to the int16 wire at matched seed). "
                        "'auto' picks hbm when the corpus fits --hbm_budget_mb"
                        " in a single-process run, else the streaming wire")
    p.add_argument("--hbm_budget_mb", type=int, default=8192,
                   help="max corpus bytes to stage on device in "
                        "--data_placement auto/hbm (16 GB HBM minus model/"
                        "optimizer/activation headroom)")
    p.add_argument("--debug_nans", action="store_true",
                   help="enable jax_debug_nans (traps the first NaN at its "
                        "producing op; slow — debugging only)")
    return p


def make_config(args):
    from advoc_tpu.models.advoc.model import AdvocConfig, small_config
    from advoc_tpu.utils import apply_overrides

    cfg = small_config() if args.model_size == "small" else AdvocConfig()
    return apply_overrides(cfg, args.model_overrides)


def _models_and_states(cfg, seed):
    import jax.numpy as jnp

    from advoc_tpu.models.advoc import AdvocGenerator, PatchDiscriminator
    from advoc_tpu.train import gan

    g = AdvocGenerator(cfg)
    d = PatchDiscriminator(cfg)
    est0 = jnp.zeros((1, cfg.n_frames, cfg.n_freq))
    gstate, dstate = gan.make_states(g, d, (est0,), (est0, est0), seed=seed)
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
    n_params = sum(x.size for x in jax.tree.leaves(gstate.params))
    print(f"[train] advoc {args.model_size}: G={n_params/1e6:.2f}M params, "
          f"{len(jax.devices())} device(s)", flush=True)

    step = gan.make_advoc_train_step(g, d, cfg, DEFAULT_PARAMS)
    mesh = data_mesh(args.n_devices, batch_size=args.batch_size)

    fps = ensure_dataset(args.data_dir, f"{args.train_dir}/synthetic_data")
    slice_len = cfg.n_frames * DEFAULT_PARAMS.hop_length

    # Placement: HBM-resident corpus (on-device crop sampling; the batch
    # wire collapses to 4 bytes/clip of start indices) vs the streaming
    # host wire. auto = hbm when it fits the budget (BASELINE.md r5).
    from advoc_tpu.data.audioio import wav_num_frames

    placement = args.data_placement
    if placement != "wire":
        est_bytes = sum(
            max(wav_num_frames(fp)[0], slice_len) * 2 for fp in fps
        )
        fits = (est_bytes <= args.hbm_budget_mb * 2**20
                and jax.process_count() == 1)
        if placement == "hbm" and not fits:
            raise ValueError(
                f"--data_placement hbm: corpus is {est_bytes/2**20:.0f} MB "
                f"(budget {args.hbm_budget_mb} MB) or run is multi-host; "
                f"use wire or raise --hbm_budget_mb"
            )
        placement = "hbm" if fits else "wire"
        if args.data_placement == "auto":
            why = ("fits" if fits else
                   f"{est_bytes/2**20:.0f} MB > {args.hbm_budget_mb} MB "
                   "budget or multi-host")
            print(f"[train] data_placement auto → {placement} ({why})",
                  flush=True)

    from jax.sharding import NamedSharding, PartitionSpec as Pspec

    if placement == "hbm":
        corpus = loader.DeviceCorpus(
            fps, slice_len, sample_rate=DEFAULT_PARAMS.sample_rate,
            sharding=NamedSharding(mesh, Pspec()),  # replicated
        )
        print(f"[train] corpus staged in HBM: {len(fps)} files, "
              f"{corpus.nbytes/2**20:.0f} MB int16", flush=True)
        # hbm_data_step owns the jit (the staged corpus must be an explicit
        # argument — see DeviceCorpus.gather); no jit_data_parallel re-wrap,
        # and the 64-byte starts wire needs no prefetch.
        dp_step = loader.hbm_data_step(step, corpus, mesh)
        it = corpus.starts(args.batch_size, seed=args.seed)
    else:
        it = loader.decode_extract_and_batch(
            fps, batch_size=args.batch_size, slice_len=slice_len,
            seed=args.seed, sample_rate=DEFAULT_PARAMS.sample_rate,
            out_dtype=args.h2d_dtype,
        )
        dp_step = gan.jit_data_parallel(step, mesh)
        # Host decode + H2D transfer overlap device compute
        # (double-buffered).
        it = loader.device_prefetch(
            it, sharding=NamedSharding(mesh, Pspec("data")), depth=2
        )
    import dataclasses

    harness.train_loop(
        dp_step, gstate, dstate, it, args.train_dir,
        max_steps=args.max_steps, ckpt_every=args.ckpt_every,
        log_every=args.log_every, seed=args.seed,
        config=dataclasses.asdict(cfg),
    )


def evaluate(args) -> None:
    import jax

    from advoc_tpu.data import loader
    from advoc_tpu.infer import Vocoder
    from advoc_tpu.ops.reference import DEFAULT_PARAMS
    from advoc_tpu.ops import spectral
    from advoc_tpu.train import gan, harness
    from advoc_tpu.utils.config import ensure_dataset

    cfg = make_config(args)
    g, d, gstate, dstate = _models_and_states(cfg, args.seed)
    eval_step = jax.jit(gan.make_advoc_eval_step(g, cfg, DEFAULT_PARAMS))

    fps = ensure_dataset(args.data_dir, f"{args.train_dir}/synthetic_data")
    slice_len = cfg.n_frames * DEFAULT_PARAMS.hop_length

    def data_fn():
        # drop_remainder=False: small eval sets must still yield their final
        # partial batch (with 8 fixture files and batch 16 the whole pass
        # would otherwise be empty).
        return loader.decode_extract_and_batch(
            fps, batch_size=args.batch_size, slice_len=slice_len,
            repeat=False, shuffle=False, drop_remainder=False,
            sample_rate=DEFAULT_PARAMS.sample_rate,
        )

    def audio_fn(gparams):
        wav = loader.synthetic_speech(123, slice_len)
        import jax.numpy as jnp

        mel = spectral.waveform_to_r9y9_melspec(jnp.asarray(wav), DEFAULT_PARAMS)
        voc = Vocoder(
            g_apply=lambda p, est: g.apply({"params": p}, est),
            g_params=gparams, params=DEFAULT_PARAMS,
            chunk_frames=cfg.n_frames, gl_iters=args.gl_iters,
        )
        out = voc(mel)
        return [("vocoded", np.asarray(out), DEFAULT_PARAMS.sample_rate)]

    def image_fn(gparams):
        # Spectrogram triptych: heuristic estimate / repaired / real — the
        # reference's image-summary eval UX (SURVEY.md §5).
        import jax.numpy as jnp

        wav = loader.synthetic_speech(123, slice_len)
        mel, est, real = gan.featurize_advoc(
            jnp.asarray(wav)[None], cfg.n_frames, DEFAULT_PARAMS
        )
        fake = g.apply({"params": gparams}, est)
        img = np.concatenate(
            [np.asarray(x[0]).T[::-1] for x in (est, fake, real)], axis=0
        )  # stacked (3·F, T) images, low freqs at the bottom of each band
        return [("est_repaired_real", img)]

    harness.eval_loop(
        eval_step,
        lambda: (gstate, dstate),
        data_fn,
        args.train_dir,
        once=args.eval_once,
        timeout_s=args.eval_timeout_s,
        audio_fn=audio_fn,
        image_fn=image_fn,
    )


def infer(args) -> None:
    import jax.numpy as jnp

    from advoc_tpu.data import audioio, loader
    from advoc_tpu.infer import Vocoder
    from advoc_tpu.ops import spectral
    from advoc_tpu.ops.reference import DEFAULT_PARAMS
    from advoc_tpu.train.checkpoint import CheckpointManager

    cfg = make_config(args)
    g, d, gstate, dstate = _models_and_states(cfg, args.seed)

    mgr = CheckpointManager(args.train_dir)
    if mgr.latest_step() is not None:
        bundle = mgr.restore(template={"g": gstate, "d": dstate})
        gparams = bundle["g"].params
        print(f"[infer] restored checkpoint step {mgr.latest_step()}", flush=True)
    else:
        gparams = gstate.params
        print("[infer] no checkpoint found — using random init", flush=True)
    mgr.close()

    # Load mels: .npy, a wav (re-vocode), or the synthetic fixture.
    if args.infer_input and args.infer_input.endswith(".npy"):
        mels = np.load(args.infer_input)
        if mels.ndim == 2:
            mels = mels[None]
    else:
        if args.infer_input:
            wav = audioio.decode_audio(
                args.infer_input, DEFAULT_PARAMS.sample_rate
            )
        else:
            wav = loader.synthetic_speech(0, DEFAULT_PARAMS.sample_rate * 4)
        mels = np.asarray(
            spectral.waveform_to_r9y9_melspec(jnp.asarray(wav), DEFAULT_PARAMS)
        )[None]

    voc = Vocoder(
        g_apply=lambda p, est: g.apply({"params": p}, est),
        g_params=gparams, params=DEFAULT_PARAMS,
        chunk_frames=cfg.n_frames, gl_iters=args.gl_iters,
    )
    out_dir = pathlib.Path(args.infer_dir or f"{args.train_dir}/infer")
    out_dir.mkdir(parents=True, exist_ok=True)
    for i, mel in enumerate(mels):
        wav_out = np.asarray(voc(jnp.asarray(mel)))
        path = out_dir / f"vocoded_{i}.wav"
        audioio.save_as_wav(wav_out, path, DEFAULT_PARAMS.sample_rate)
        print(f"[infer] wrote {path} ({len(wav_out)} samples)", flush=True)


def main(argv=None):
    args = build_parser().parse_args(argv)
    from advoc_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    {"train": train, "eval": evaluate, "infer": infer}[args.mode](args)


if __name__ == "__main__":
    main()
