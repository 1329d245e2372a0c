#!/usr/bin/env python
"""Corpus-scale dress rehearsal: run the real advoc pipeline at LJSpeech shape.

No speech corpus exists on this machine (SURVEY.md §0/§4), but everything
*except* audio content can be rehearsed at full scale (VERDICT r2 missing
#1): this script synthesizes an LJSpeech-shaped corpus — 13,100 PCM16 wavs at
22.05 kHz with the LJ duration distribution (~1–10 s, mean ≈ 6.5 s, ≈ 24 h
total) — then runs the production workflow end-to-end:

  1. ``scripts/prepare_dataset.py`` over the 13k files (metadata scan,
     peak checks, train/eval split lists) — timed.
  2. ``models/advoc/train_evaluate.py --mode train`` for ``--max_steps``
     steps with the standard loader/prefetch stack — steps/s per window,
     checkpoint cadence, and stability are recorded from the live log.
  3. ``--mode eval`` polling the same train_dir CONCURRENTLY on the same
     chip (the reference's train+eval workflow, SURVEY.md §3.2), exiting on
     its own once checkpoints stop appearing.
  4. A summary report: steps/s distribution, checkpoint sizes/latency,
     loader scan time — the numbers BASELINE.md's corpus-scale section cites.

Usage (defaults reproduce the BASELINE run):
  python scripts/corpus_rehearsal.py --corpus_dir /tmp/lj_shaped \
      --train_dir /tmp/r3_corpus --max_steps 10000
Corpus generation is resumable (existing files are kept); pass
``--n_files 0`` to reuse a corpus without checking it file-by-file.
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

import numpy as np


def make_corpus(out_dir: pathlib.Path, n_files: int, sample_rate: int,
                seed: int) -> None:
    """LJSpeech-shaped synthetic corpus: durations from a clipped lognormal
    matched to LJ's ~(1.1 s min, 10.1 s max, 6.57 s mean)."""
    from advoc_tpu.data import audioio, loader

    out_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    t0 = time.perf_counter()
    made = 0
    for i in range(n_files):
        p = out_dir / f"LJS{i // 1000:03d}-{i % 1000:04d}.wav"
        if p.exists():
            continue
        dur = float(np.clip(rng.lognormal(mean=1.82, sigma=0.35), 1.1, 10.1))
        wav = loader.synthetic_speech(seed * 100003 + i,
                                      int(dur * sample_rate), sample_rate)
        audioio.save_as_wav(wav, p, sample_rate)
        made += 1
        if made % 1000 == 0:
            rate = made / (time.perf_counter() - t0)
            print(f"[corpus] {made} files written ({rate:.0f}/s)", flush=True)
    print(f"[corpus] {n_files} files ready in {out_dir} "
          f"({time.perf_counter() - t0:.0f}s this run)", flush=True)


def run(cmd: list[str], log: pathlib.Path) -> subprocess.Popen:
    f = open(log, "w")
    return subprocess.Popen(cmd, stdout=f, stderr=subprocess.STDOUT)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--corpus_dir", default="/tmp/lj_shaped")
    ap.add_argument("--train_dir", default="/tmp/r3_corpus")
    ap.add_argument("--n_files", type=int, default=13100)
    ap.add_argument("--max_steps", type=int, default=10000)
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--ckpt_every", type=int, default=1000)
    ap.add_argument("--sample_rate", type=int, default=22050)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--skip_make", action="store_true")
    ap.add_argument("--skip_eval", action="store_true",
                    help="skip the concurrent eval poller")
    args = ap.parse_args()

    corpus = pathlib.Path(args.corpus_dir)
    train_dir = pathlib.Path(args.train_dir)
    train_dir.mkdir(parents=True, exist_ok=True)

    if not args.skip_make and args.n_files:
        make_corpus(corpus, args.n_files, args.sample_rate, args.seed)

    # 1. Dataset prep at 13k-file scale (metadata scan + split lists), timed.
    prep_dir = train_dir / "prep"
    t0 = time.perf_counter()
    subprocess.run(
        [sys.executable, str(pathlib.Path(__file__).parent /
                             "prepare_dataset.py"),
         "--in_dir", str(corpus), "--out_dir", str(prep_dir),
         "--eval_fraction", "0.01"],
        check=True, capture_output=True,
    )
    prep_s = time.perf_counter() - t0
    train_list = prep_dir / "train_files.txt"
    eval_list = prep_dir / "eval_files.txt"
    n_train = len(train_list.read_text().splitlines())
    n_eval = len(eval_list.read_text().splitlines())
    print(f"[rehearsal] prepare_dataset over {n_train + n_eval} files: "
          f"{prep_s:.1f}s (train {n_train} / eval {n_eval})", flush=True)

    # 2+3. Training with a concurrent checkpoint-polling eval on this chip.
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
    cli = [sys.executable, "-u", "-m", "advoc_tpu.models.advoc.train_evaluate"]
    t_train0 = time.perf_counter()
    train_p = subprocess.Popen(
        cli + ["--mode", "train", "--train_dir", str(train_dir),
               "--data_dir", str(train_list),
               "--batch_size", str(args.batch_size),
               "--max_steps", str(args.max_steps),
               "--ckpt_every", str(args.ckpt_every), "--log_every", "100"],
        stdout=open(train_dir / "train.log", "w"),
        stderr=subprocess.STDOUT, env=env,
    )
    eval_p = None
    if not args.skip_eval:
        # The concurrent eval poller runs on CPU: a TPU chip is held
        # EXCLUSIVELY by one process (a second process blocks at device
        # attach until the first exits — measured on this host), so the
        # single-chip train+eval workflow puts eval on the host. On a
        # multi-chip machine, pin eval to its own chip instead
        # (TPU_VISIBLE_DEVICES) and drop these env overrides.
        eval_env = dict(env)
        eval_env["JAX_PLATFORMS"] = "cpu"
        eval_env["PALLAS_AXON_POOL_IPS"] = ""
        eval_p = subprocess.Popen(
            cli + ["--mode", "eval", "--train_dir", str(train_dir),
                   "--data_dir", str(eval_list), "--batch_size", "16",
                   "--eval_timeout_s", "240"],
            stdout=open(train_dir / "eval.log", "w"),
            stderr=subprocess.STDOUT, env=eval_env,
        )
    rc = train_p.wait()
    train_s = time.perf_counter() - t_train0
    if rc != 0:
        print(open(train_dir / "train.log").read()[-4000:])
        sys.exit(f"training failed rc={rc}")
    if eval_p is not None:
        print("[rehearsal] training done; waiting for eval to drain",
              flush=True)
        rc_e = eval_p.wait()
        if rc_e != 0:
            print(open(train_dir / "eval.log").read()[-4000:])
            sys.exit(f"eval failed rc={rc_e}")

    # 4. Report.
    log = (train_dir / "train.log").read_text()
    rates = [float(m) for m in re.findall(r"\(([\d.]+) steps/s\)", log)]
    steady = rates[1:]  # window 1 includes compile
    ckpts = sorted(
        int(p.name) for p in train_dir.iterdir() if p.name.isdigit()
    )
    ckpt_mb = (
        sum(f.stat().st_size for f in (train_dir / str(ckpts[-1])).rglob("*")
            if f.is_file()) / 1e6 if ckpts else 0.0
    )
    eval_log = (train_dir / "eval.log").read_text() if eval_p else ""
    eval_rows = re.findall(r"\[eval\] ckpt (\d+): (.*)", eval_log)
    report = {
        "n_files": n_train + n_eval,
        "prepare_dataset_s": round(prep_s, 1),
        "max_steps": args.max_steps,
        "train_wall_s": round(train_s, 1),
        "steps_per_s_median": round(float(np.median(steady)), 2),
        "steps_per_s_min": round(float(np.min(steady)), 2),
        "steps_per_s_max": round(float(np.max(steady)), 2),
        "steps_per_s_first_windows": [round(r, 2) for r in steady[:5]],
        "steps_per_s_last_windows": [round(r, 2) for r in steady[-5:]],
        "checkpoints": ckpts,
        "checkpoint_mb": round(ckpt_mb, 1),
        "eval_ckpts_scored": [int(s) for s, _ in eval_rows],
        "eval_last": eval_rows[-1][1] if eval_rows else None,
    }
    print("[rehearsal] " + json.dumps(report, indent=2), flush=True)


if __name__ == "__main__":
    main()
