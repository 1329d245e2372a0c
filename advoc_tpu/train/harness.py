"""Shared GAN training loop: the one harness all model families use.

The reference duplicated a TF1 MonitoredTrainingSession loop per model
directory (SURVEY.md §1 L4); here the loop is a library function. Contract
matched: checkpoint-save every N steps + auto-resume, TensorBoard summaries,
periodic stdout step logs, graceful stop at max_steps.
"""

from __future__ import annotations

import json
import pathlib
import time
from typing import Callable, Iterator

import jax
import numpy as np

from advoc_tpu.train import metrics as metrics_lib
from advoc_tpu.train.checkpoint import CheckpointManager


def check_run_config(train_dir: str, config: dict) -> None:
    """Record ``config`` as ``train_dir/config.json``; on resume, raise a
    clear error if it differs from the recorded one.

    Model-config defaults can change across versions (e.g. the r2 migration
    freq_pack 1→2 / head_kernel 4→1 changed head parameter shapes), which
    would otherwise surface as an opaque Orbax template-mismatch error when
    restoring an old run under new defaults (ADVICE r2 #2). Keys are
    compared on the intersection so adding new config fields stays
    backward-compatible.
    """
    path = pathlib.Path(train_dir) / "config.json"
    path.parent.mkdir(parents=True, exist_ok=True)
    if path.exists():
        recorded = json.loads(path.read_text())
        diff = {
            k: (recorded[k], config[k])
            for k in recorded.keys() & config.keys()
            if recorded[k] != config[k]
        }
        if diff:
            raise ValueError(
                f"run config mismatch in {train_dir}: this run was trained "
                f"with different model hyperparameters "
                f"(recorded → current): {diff}. Pass matching "
                f"--model_overrides to resume it, or use a fresh train_dir. "
                f"(Config defaults changed in r2: freq_pack 1→2, "
                f"head_kernel 4→1 — see README.)"
            )
    else:
        path.write_text(json.dumps(config, indent=2, sort_keys=True))


def train_loop(
    step_fn: Callable,
    gstate,
    dstate,
    data_it: Iterator[np.ndarray],
    train_dir: str,
    max_steps: int = 100000,
    ckpt_every: int = 1000,
    log_every: int = 50,
    summary_every: int = 100,
    seed: int = 0,
    hooks: list[Callable] | None = None,
    nan_check_every: int = 200,
    explode_ratio: float = 50.0,
    config: dict | None = None,
):
    """Run the alternating-GAN loop. step_fn(gstate, dstate, batch, rng).

    Resumes from the latest checkpoint in train_dir if present (the
    reference's MonitoredTrainingSession contract, SURVEY.md §5).

    NaN guard (SURVEY.md §5 sanitizer row): every ``nan_check_every`` steps
    the metric dict is checked on host; on the first non-finite value the
    loop saves a ``<step>-diverged`` checkpoint and raises — GAN divergence
    should kill the run loudly, not silently train garbage. Set to 0 to
    disable. Returns (gstate, dstate, final_step).

    Explosion guard (VERDICT r3 weak #5): GANs can diverge with every value
    finite — the r3 conditional-WaveGAN run blew d_loss 0.001 → 306 and the
    NaN guard never fired. At the same cadence, each ``*loss*`` metric is
    tracked with an EMA of its magnitude; a value exceeding
    ``explode_ratio × max(EMA, 1.0)`` trips the guard (same save-and-raise
    path). The first check only seeds the EMA, so high warm-up losses don't
    false-trip. ``explode_ratio=0`` disables.

    ``config``: optional dict of model hyperparameters, recorded as
    ``train_dir/config.json`` and verified on resume (clear error instead of
    an Orbax template mismatch when defaults drift — see
    :func:`check_run_config`).
    """
    if config is not None:
        check_run_config(train_dir, config)
    mgr = CheckpointManager(train_dir, max_to_keep=5)
    bundle = {"g": gstate, "d": dstate}
    bundle, start = mgr.restore_or_init(bundle)
    gstate, dstate = bundle["g"], bundle["d"]
    if start:
        print(f"[train] resumed from step {start} in {train_dir}", flush=True)

    writer = metrics_lib.SummaryWriter(f"{train_dir}/tb")
    rng = jax.random.PRNGKey(seed)

    step = start
    steps_at_last = start
    t_last = time.perf_counter()
    loss_emas: dict[str, float] = {}
    for batch in data_it:
        if step >= max_steps:
            break
        rng, srng = jax.random.split(rng)
        gstate, dstate, m = step_fn(gstate, dstate, batch, srng)
        step += 1

        if nan_check_every and step % nan_check_every == 0:
            host = metrics_lib.to_host(m)
            bad = {k: v for k, v in host.items() if not np.isfinite(v)}
            if bad:
                mgr.save(step, {"g": gstate, "d": dstate}, force=True,
                         wait=True)
                mgr.close()
                raise FloatingPointError(
                    f"non-finite training metrics at step {step}: {bad} "
                    f"(diverged checkpoint saved to {train_dir})"
                )
            if explode_ratio:
                blown = {}
                for k, v in host.items():
                    if "loss" not in k:
                        continue
                    a = abs(float(v))
                    ema = loss_emas.get(k)
                    if ema is None:  # first check seeds the EMA only
                        loss_emas[k] = a
                        continue
                    if a > explode_ratio * max(ema, 1.0):
                        blown[k] = (v, ema)
                    loss_emas[k] = 0.9 * ema + 0.1 * a
                if blown:
                    mgr.save(step, {"g": gstate, "d": dstate}, force=True,
                             wait=True)
                    mgr.close()
                    detail = ", ".join(
                        f"{k}={v:.4g} (EMA {e:.4g})"
                        for k, (v, e) in blown.items()
                    )
                    raise FloatingPointError(
                        f"training explosion at step {step}: {detail} "
                        f"exceeded {explode_ratio}× max(EMA, 1) while still "
                        f"finite — the divergence mode the NaN guard cannot "
                        f"see (r3 conditional-WaveGAN: d_loss 0.001→306). "
                        f"Diverged checkpoint saved to {train_dir}; resume "
                        f"from the last healthy periodic checkpoint."
                    )

        if step % log_every == 0:
            host = metrics_lib.to_host(m)  # syncs: dt below is honest
            dt = time.perf_counter() - t_last
            rate = (step - steps_at_last) / max(dt, 1e-9)
            t_last = time.perf_counter()
            steps_at_last = step
            msg = " ".join(f"{k}={v:.4f}" for k, v in sorted(host.items()))
            # First window includes compile time; later windows are steady
            # state (the metric fetch above forces completion each window).
            print(f"[train] step {step} ({rate:.2f} steps/s) {msg}", flush=True)
        if step % summary_every == 0:
            writer.scalars(step, metrics_lib.to_host(m))
        if step % ckpt_every == 0:
            mgr.save(step, {"g": gstate, "d": dstate})
            print(f"[train] checkpoint @ {step}", flush=True)
        if hooks:
            for h in hooks:
                h(step, gstate, dstate)

    if step > start and step % ckpt_every != 0:
        mgr.save(step, {"g": gstate, "d": dstate}, force=True)
    mgr.close()  # waits for any in-flight async save before returning
    close = getattr(data_it, "close", None)
    if close is not None:  # release the loader's producer thread promptly
        close()
    return gstate, dstate, step


def eval_loop(
    eval_fn: Callable,
    make_states: Callable,
    data_fn: Callable[[], Iterator[np.ndarray]],
    train_dir: str,
    once: bool = False,
    timeout_s: float = 3600.0,
    audio_fn: Callable | None = None,
    image_fn: Callable | None = None,
    eval_takes_bundle: bool = False,
):
    """Poll train_dir for new checkpoints; evaluate each (SURVEY.md §3.2).

    eval_fn(gparams, batch) → metric dict; metrics are averaged over the eval
    pass and written to train_dir/tb_eval. audio_fn(gparams) optionally
    returns (tag, waveform, sample_rate) tuples to dump as audio summaries;
    image_fn(gparams) returns (tag, HxW image in [0,1]) tuples (the
    reference's spectrogram image summaries, SURVEY.md §5).

    ``eval_takes_bundle``: call ``eval_fn(bundle, batch)`` with the full
    restored ``{"g": gstate, "d": dstate}`` bundle instead of generator
    params only — for evals that score with the trained discriminator
    (e.g. the melspecgan held-out-D metric).
    """
    mgr = CheckpointManager(train_dir)
    writer = metrics_lib.SummaryWriter(f"{train_dir}/tb_eval")
    gstate, dstate = make_states()
    template = {"g": gstate, "d": dstate}

    seen = None
    for step in mgr.poll(last_seen=None, interval_s=5.0,
                         timeout_s=0.0 if once else timeout_s):
        seen = step
        bundle = mgr.restore(step, template=template)
        gparams = bundle["g"].params
        eval_arg = bundle if eval_takes_bundle else gparams
        sums: dict[str, float] = {}
        n = 0
        for batch in data_fn():
            m = metrics_lib.to_host(eval_fn(eval_arg, batch))
            for k, v in m.items():
                sums[k] = sums.get(k, 0.0) + v
            n += 1
        means = {k: v / max(n, 1) for k, v in sums.items()}
        writer.scalars(step, means)
        msg = " ".join(f"{k}={v:.4f}" for k, v in sorted(means.items()))
        print(f"[eval] ckpt {step}: {msg}", flush=True)
        if audio_fn is not None:
            for tag, wav, sr in audio_fn(gparams):
                writer.audio(step, tag, np.asarray(wav), sr)
        if image_fn is not None:
            for tag, img in image_fn(gparams):
                writer.image(step, tag, np.asarray(img))
        if once:
            break
    if seen is None:
        # Silence here cost a full rehearsal its eval record (r5: the
        # concurrent eval timed out during HBM corpus staging, exited 0
        # with an empty log) — say loudly that nothing was evaluated.
        print(f"[eval] no checkpoint appeared in {train_dir} within "
              f"{timeout_s:.0f}s — evaluated NOTHING", flush=True)
    mgr.close()
    return seen
