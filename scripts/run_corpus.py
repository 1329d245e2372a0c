#!/usr/bin/env python
"""One-command corpus runbook: prepare → train(+concurrent eval) → panels →
export → precompile → serve selftest (VERDICT r4 next #7).

This is the artifact that makes real-corpus (LJSpeech) parity a same-day
exercise the moment a corpus appears: point ``--corpus_dir`` at a directory
of wavs and every production stage runs in order, each timed and logged
under ``<run_dir>/logs/``, with ONE machine-readable summary line
(``RUN_CORPUS_RESULT {...}``) and a non-zero exit on the first failure.

  python scripts/run_corpus.py --corpus_dir /data/LJSpeech-1.1/wavs \
      --run_dir runs/lj --max_steps 10000

No corpus on this machine? ``--synthetic 13100`` first synthesizes the
LJ-shaped rehearsal corpus (same duration distribution; see
``corpus_rehearsal.py``) and then runs the identical workflow.

Stages (each skippable with --skip_<stage> for a partial re-run):
  1. prep       scripts/prepare_dataset.py — scan/validate, train/eval split
  2. train      advoc train_evaluate --mode train on the default backend
                (HBM-resident corpus when it fits: --data_placement auto),
                with the checkpoint-polling eval running CONCURRENTLY on CPU
                (a single TPU chip is held exclusively by the train process)
  3. bundle     export the inference bundle from the final checkpoint (CPU)
  4. panel      scripts/stress_eval.py — offline stress/STOI quality panel
                through the trained generator
  5. aot        vocode_cli --aot_export — fixed-shape serving artifacts
  6. precompile scripts/precompile.py — warm the compile cache for serving
  7. serve      python -m advoc_tpu.serve --selftest — end-to-end TCP check

The rehearsal gate for this script (13k-file corpus, 2k steps) is recorded
in BASELINE.md r5; a tiny CPU variant runs in CI (tests/test_cli.py).
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import re
import subprocess
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(1, str(pathlib.Path(__file__).resolve().parent))

SCRIPTS = pathlib.Path(__file__).resolve().parent


def log(msg: str) -> None:
    print(f"[run_corpus] {msg}", flush=True)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--corpus_dir", required=True,
                   help="directory of wavs (created if --synthetic)")
    p.add_argument("--run_dir", required=True)
    p.add_argument("--synthetic", type=int, default=0, metavar="N_FILES",
                   help="synthesize an LJ-shaped corpus of N files first")
    p.add_argument("--model_size", choices=["full", "small"], default="full")
    p.add_argument("--model_overrides", default=None)
    p.add_argument("--max_steps", type=int, default=10000)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--ckpt_every", type=int, default=1000)
    p.add_argument("--eval_fraction", type=float, default=0.01)
    p.add_argument("--eval_timeout_s", type=float, default=1200.0,
                   help="concurrent eval: exit after this long with no new "
                        "checkpoint (generous default: HBM corpus staging "
                        "alone held the first checkpoint back ~5 min on the "
                        "13k rehearsal, and 240s silently evaluated nothing)")
    p.add_argument("--gl_iters", type=int, default=30)
    p.add_argument("--serve_clients", type=int, default=4)
    p.add_argument("--cpu", action="store_true",
                   help="force every stage onto CPU (CI / no-TPU hosts)")
    for s in ("prep", "train", "bundle", "panel", "aot", "precompile",
              "serve"):
        p.add_argument(f"--skip_{s}", action="store_true")
    args = p.parse_args(argv)

    run_dir = pathlib.Path(args.run_dir)
    logs = run_dir / "logs"
    logs.mkdir(parents=True, exist_ok=True)
    corpus = pathlib.Path(args.corpus_dir)
    train_dir = run_dir / "train"
    prep_dir = run_dir / "prep"
    bundle_dir = run_dir / "bundle"
    aot_dir = run_dir / "aot"

    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    cpu_env = dict(env)
    cpu_env["JAX_PLATFORMS"] = "cpu"
    cpu_env["PALLAS_AXON_POOL_IPS"] = ""
    if args.cpu:
        env = cpu_env

    model_flags = ["--model_size", args.model_size]
    if args.model_overrides:
        model_flags += ["--model_overrides", args.model_overrides]

    stages: dict[str, float] = {}
    summary: dict[str, object] = {}

    def stage(name: str, cmd: list[str], stage_env=None, check=True):
        """Run one stage to completion, teeing output to logs/<name>.log."""
        t0 = time.perf_counter()
        logf = logs / f"{name}.log"
        log(f"stage {name}: {' '.join(map(str, cmd))}")
        with open(logf, "w") as f:
            rc = subprocess.run(
                [str(c) for c in cmd], stdout=f, stderr=subprocess.STDOUT,
                env=stage_env or env,
            ).returncode
        stages[name] = round(time.perf_counter() - t0, 1)
        if check and rc != 0:
            print((logf.read_text())[-4000:])
            sys.exit(f"[run_corpus] stage {name} FAILED rc={rc} "
                     f"(log: {logf})")
        log(f"stage {name}: done in {stages[name]}s")
        return logf

    py = [sys.executable, "-u"]

    # 0. Optional synthetic corpus (the rehearsal path).
    if args.synthetic:
        from corpus_rehearsal import make_corpus

        from advoc_tpu.ops.reference import DEFAULT_PARAMS as P

        t0 = time.perf_counter()
        make_corpus(corpus, args.synthetic, P.sample_rate, seed=0)
        stages["synthesize"] = round(time.perf_counter() - t0, 1)

    # 1. Dataset prep: scan, validate, split.
    if not args.skip_prep:
        stage("prep", py + [SCRIPTS / "prepare_dataset.py",
                            "--in_dir", corpus, "--out_dir", prep_dir,
                            "--eval_fraction", args.eval_fraction])
    train_list = prep_dir / "train_files.txt"
    eval_list = prep_dir / "eval_files.txt"

    # 2. Train (default backend; HBM-resident corpus when it fits) with the
    # checkpoint-polling eval concurrent on CPU.
    cli = py + ["-m", "advoc_tpu.models.advoc.train_evaluate"]
    if not args.skip_train:
        t0 = time.perf_counter()
        train_log = logs / "train.log"
        train_p = subprocess.Popen(
            [str(c) for c in cli] +
            ["--mode", "train", "--train_dir", str(train_dir),
             "--data_dir", str(train_list),
             "--batch_size", str(args.batch_size),
             "--max_steps", str(args.max_steps),
             "--ckpt_every", str(args.ckpt_every),
             "--log_every", "100", "--data_placement", "auto",
             *model_flags],
            stdout=open(train_log, "w"), stderr=subprocess.STDOUT, env=env,
        )
        eval_p = subprocess.Popen(
            [str(c) for c in cli] +
            ["--mode", "eval", "--train_dir", str(train_dir),
             "--data_dir", str(eval_list), "--batch_size", "16",
             "--eval_timeout_s", str(args.eval_timeout_s), *model_flags],
            stdout=open(logs / "eval.log", "w"), stderr=subprocess.STDOUT,
            env=cpu_env,
        )
        rc = train_p.wait()
        stages["train"] = round(time.perf_counter() - t0, 1)
        if rc != 0:
            print(train_log.read_text()[-4000:])
            eval_p.kill()
            sys.exit(f"[run_corpus] stage train FAILED rc={rc}")
        log("train done; draining concurrent eval")
        rc_e = eval_p.wait()
        if rc_e != 0:
            print((logs / "eval.log").read_text()[-4000:])
            sys.exit(f"[run_corpus] concurrent eval FAILED rc={rc_e}")
        txt = train_log.read_text()
        rates = [float(m) for m in re.findall(r"\(([\d.]+) steps/s\)", txt)]
        summary["steps_per_s_median"] = (
            round(float(sorted(rates[1:])[len(rates[1:]) // 2]), 2)
            if len(rates) > 1 else None
        )
        ev = re.findall(r"\[eval\] ckpt (\d+): (.*)", (logs / "eval.log").read_text())
        summary["eval_last"] = ev[-1][1] if ev else None
        if not ev:
            log("WARNING: concurrent eval evaluated NOTHING "
                "(no checkpoint within --eval_timeout_s?)")

    # 3. Inference bundle from the final checkpoint (CPU — don't hold the
    # training chip for a restore+serialize).
    if not args.skip_bundle:
        code = (
            "import sys; sys.argv=['x']; "
            "import jax, jax.numpy as jnp; "
            "from advoc_tpu.models.advoc import AdvocGenerator, "
            "PatchDiscriminator; "
            "from advoc_tpu.models.advoc.model import AdvocConfig, "
            "small_config; "
            "from advoc_tpu.train import gan; "
            "from advoc_tpu.train.checkpoint import CheckpointManager, "
            "export_inference_bundle; "
            "from advoc_tpu.utils import apply_overrides; "
            f"cfg = small_config() if {args.model_size!r}=='small' "
            "else AdvocConfig(); "
            f"cfg = apply_overrides(cfg, {args.model_overrides!r}); "
            "g = AdvocGenerator(cfg); "
            "est0 = jnp.zeros((1, cfg.n_frames, cfg.n_freq)); "
            "gs, ds = gan.make_states(g, PatchDiscriminator(cfg), (est0,), "
            "(est0, est0)); "
            f"mgr = CheckpointManager({str(train_dir)!r}); "
            "b = mgr.restore(template={'g': gs, 'd': ds}); mgr.close(); "
            f"export_inference_bundle({str(bundle_dir)!r}, b['g'].params, "
            "dict(model_size="
            f"{args.model_size!r}, overrides={args.model_overrides!r})); "
            f"print('bundle ->', {str(bundle_dir)!r})"
        )
        stage("bundle", py + ["-c", code], stage_env=cpu_env)

    # 4. Stress/STOI quality panel through the trained generator.
    if not args.skip_panel:
        logf = stage("panel", py + [SCRIPTS / "stress_eval.py",
                                    "--train_dir", train_dir,
                                    "--gl_iters", args.gl_iters,
                                    *model_flags])
        summary["panel_tail"] = logf.read_text().strip().splitlines()[-8:]

    # 5. AOT serving artifacts (fixed production shape from a probe mel).
    if not args.skip_aot:
        import numpy as np

        probe = run_dir / "probe_mels.npy"
        np.save(probe, np.zeros((1, 256, 80), np.float32))
        # Artifacts serve on THIS machine → accept the Mosaic custom call
        # (the r4 on-chip gate shows the AOT path bit-exact vs live).
        stage("aot", py + ["-m", "advoc_tpu.infer.vocode_cli",
                           "--input", probe, "--out_dir", run_dir / "aot_out",
                           "--bundle", bundle_dir, "--aot_export", aot_dir,
                           "--aot_allow_custom_calls",
                           "--gl_iters", args.gl_iters, *model_flags])

    # 6. Warm the compile cache for serving shapes.
    if not args.skip_precompile:
        stage("precompile", py + [SCRIPTS / "precompile.py",
                                  "--bundle", bundle_dir, *model_flags])

    # 7. End-to-end TCP serving selftest against the trained bundle.
    if not args.skip_serve:
        logf = stage("serve", py + ["-m", "advoc_tpu.serve",
                                    "--selftest", args.serve_clients,
                                    "--pushes", "6",
                                    "--bundle", bundle_dir, *model_flags])
        m = re.search(r"VOCODE_SERVER_RESULT (\{.*\})", logf.read_text())
        summary["serve"] = json.loads(m.group(1)) if m else None

    summary["stages_s"] = stages
    summary["ok"] = True
    print("RUN_CORPUS_RESULT " + json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
