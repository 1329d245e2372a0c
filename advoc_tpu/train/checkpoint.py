"""Checkpoint / resume: the reference tf.train.Saver contract, Orbax-backed.

Reference behavior to match (SURVEY.md §5): save every N steps into
``train_dir``, keep the latest k, auto-restore the latest checkpoint at
startup (MonitoredTrainingSession semantics), let the eval loop poll for new
checkpoints, and export an inference-only bundle (G params only).

Implementation: orbax.checkpoint with atomic finalization; a thin manager
class so callers never touch orbax directly (and so the backend could be
swapped without touching call sites).
"""

from __future__ import annotations

import pathlib
import time
from typing import Any, Iterator

import orbax.checkpoint as ocp


class CheckpointManager:
    """Save/restore {gstate, dstate, step} bundles; keep-k; poll-latest."""

    def __init__(self, train_dir: str | pathlib.Path, max_to_keep: int = 5,
                 save_interval_steps: int = 1, use_async: bool = True):
        """``use_async=True`` (default): saves return after snapshotting the
        state and the serialization/write overlaps subsequent train steps
        (orbax async checkpointing — the save stalls the step loop for
        milliseconds instead of the full write; VERDICT r2 weak #5).
        Checkpoints are still committed atomically — ``latest_step``/``poll``
        only ever see finalized steps."""
        self.dir = pathlib.Path(train_dir).resolve()
        self.dir.mkdir(parents=True, exist_ok=True)
        self._use_async = use_async
        self._mgr = ocp.CheckpointManager(
            self.dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                save_interval_steps=save_interval_steps,
                create=True,
                enable_async_checkpointing=use_async,
            ),
        )

    def save(self, step: int, state: Any, force: bool = False,
             wait: bool | None = None) -> bool:
        """Save a pytree at ``step``; atomic (tmp dir + rename, orbax).

        ``wait``: block until the checkpoint is fully written (default: only
        when the manager is synchronous). Async in-flight saves are finished
        by the next save, :meth:`wait_until_finished`, or :meth:`close`.
        """
        if self._use_async:
            # Finalize any in-flight save BEFORE starting the next one: the
            # keep-k garbage collector runs at save time and racing it
            # against a mid-rename async finalize throws FileNotFoundError
            # from a background thread (seen under test-suite load). The
            # overlap benefit is unchanged — training steps between saves
            # still run while the previous write completes.
            self._mgr.wait_until_finished()
        saved = self._mgr.save(
            step, args=ocp.args.StandardSave(state), force=force
        )
        if wait if wait is not None else not self._use_async:
            self._mgr.wait_until_finished()
        return bool(saved)

    def wait_until_finished(self) -> None:
        self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, step: int | None = None, template: Any = None) -> Any:
        """Restore the pytree at ``step`` (default: latest).

        ``template`` (an abstract/concrete pytree of the same structure)
        restores into matching dtypes/shardings — pass the freshly-built
        states for exact round-tripping.
        """
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.dir}")
        if template is not None:
            return self._mgr.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        return self._mgr.restore(step)

    def restore_or_init(self, state: Any) -> tuple[Any, int]:
        """MonitoredTrainingSession contract: resume latest or keep init.

        Returns (state, start_step).
        """
        step = self.latest_step()
        if step is None:
            return state, 0
        return self.restore(step, template=state), step

    def poll(self, last_seen: int | None = None, interval_s: float = 5.0,
             timeout_s: float | None = None) -> Iterator[int]:
        """Yield new checkpoint steps as they appear (the eval loop's driver,
        SURVEY.md §3.2). Stops after ``timeout_s`` without a new checkpoint.

        Re-reads the directory each iteration: orbax CheckpointManager
        caches its step listing, so without ``reload()`` a poller whose
        manager was constructed before the training process wrote its first
        checkpoint would NEVER see one — the concurrent train+eval workflow
        silently evaluated nothing (caught by the r3 corpus rehearsal)."""
        waited = 0.0
        while True:
            self._mgr.reload()
            step = self.latest_step()
            if step is not None and (last_seen is None or step > last_seen):
                last_seen = step
                waited = 0.0
                yield step
            else:
                if timeout_s is not None and waited >= timeout_s:
                    return
                time.sleep(interval_s)
                waited += interval_s

    def close(self):
        self._mgr.close()


def export_inference_bundle(
    path: str | pathlib.Path, g_params: Any, config: dict
) -> None:
    """Export generator params + featurizer constants for serving
    (SURVEY.md §5 checkpoint row: inference-only bundle)."""
    path = pathlib.Path(path).resolve()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path / "g_params", g_params)
    ckptr.wait_until_finished()
    import json

    (path / "config.json").write_text(json.dumps(config, indent=2))


def load_inference_bundle(path: str | pathlib.Path, template: Any = None):
    """Restore a bundle onto the CURRENT backend's default device.

    Bundles are exported wherever it was cheap (run_corpus exports on CPU
    so the training chip isn't held for a restore+serialize) and restored
    wherever they serve (TPU). Orbax's default restore replays the SAVED
    sharding — ``Device TFRT_CPU_0 was not found`` when a CPU-exported
    bundle is opened on the axon backend (caught live in the r5 runbook
    rehearsal, aot stage) — so every leaf is restored through an explicit
    ShapeDtypeStruct pinned to the local default device instead."""
    path = pathlib.Path(path).resolve()
    import json

    import jax
    import jax.numpy as jnp

    config = json.loads((path / "config.json").read_text())
    ckptr = ocp.StandardCheckpointer()
    sharding = jax.sharding.SingleDeviceSharding(jax.devices()[0])

    def _spec(shape, dtype):
        return jax.ShapeDtypeStruct(tuple(shape), dtype, sharding=sharding)

    if template is not None:
        target = jax.tree.map(
            lambda x: _spec(jnp.shape(x), jnp.asarray(x).dtype), template
        )
    else:
        meta = ckptr.metadata(path / "g_params").item_metadata.tree
        target = jax.tree.map(
            lambda m: _spec(m.shape, m.dtype), meta,
            is_leaf=lambda m: hasattr(m, "shape") and hasattr(m, "dtype"),
        )
    params = ckptr.restore(path / "g_params", target=target)
    return params, config
