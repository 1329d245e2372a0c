"""Harness tests: train_loop resume/ckpt/NaN-guard with a stub step."""

import numpy as np
import pytest

import jax.numpy as jnp

from advoc_tpu.train import gan, harness
from advoc_tpu.train.checkpoint import CheckpointManager


def _stub_states():
    import flax.linen as nn

    class Lin(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(4)(x)

    m = Lin()
    x0 = jnp.zeros((1, 4))
    return gan.make_states(m, m, (x0,), (x0,), seed=0)


def _ok_step(gstate, dstate, batch, rng):
    return gstate, dstate, {"loss": jnp.float32(1.0)}


def _nan_step(gstate, dstate, batch, rng):
    return gstate, dstate, {"loss": jnp.float32(float("nan"))}


def _batches(n):
    for _ in range(n):
        yield np.zeros((2, 4), np.float32)


class TestTrainLoop:
    def test_runs_and_checkpoints(self, tmp_path):
        g, d = _stub_states()
        g2, d2, step = harness.train_loop(
            _ok_step, g, d, _batches(5), str(tmp_path), max_steps=5,
            ckpt_every=2, log_every=100, nan_check_every=0,
        )
        assert step == 5
        mgr = CheckpointManager(tmp_path)
        assert mgr.latest_step() == 5  # final force-save
        mgr.close()

    def test_resume_continues_counting(self, tmp_path):
        g, d = _stub_states()
        harness.train_loop(
            _ok_step, g, d, _batches(3), str(tmp_path), max_steps=3,
            ckpt_every=2, log_every=100, nan_check_every=0,
        )
        g, d = _stub_states()
        _, _, step = harness.train_loop(
            _ok_step, g, d, _batches(10), str(tmp_path), max_steps=6,
            ckpt_every=2, log_every=100, nan_check_every=0,
        )
        assert step == 6  # resumed at 3, stopped at 6

    def test_nan_guard_raises_and_saves(self, tmp_path):
        g, d = _stub_states()
        with pytest.raises(FloatingPointError, match="non-finite"):
            harness.train_loop(
                _nan_step, g, d, _batches(5), str(tmp_path), max_steps=5,
                ckpt_every=100, log_every=100, nan_check_every=1,
            )
        mgr = CheckpointManager(tmp_path)
        assert mgr.latest_step() == 1  # diverged checkpoint saved
        mgr.close()


class TestRunConfig:
    """ADVICE r2 #2: config drift must fail loudly, not as a template error."""

    def test_records_and_accepts_same_config(self, tmp_path):
        cfg = {"width": 64, "freq_pack": 2}
        harness.check_run_config(str(tmp_path), cfg)
        assert (tmp_path / "config.json").exists()
        harness.check_run_config(str(tmp_path), dict(cfg))  # no raise

    def test_mismatch_raises_clear_error(self, tmp_path):
        harness.check_run_config(str(tmp_path), {"freq_pack": 1, "head_kernel": 4})
        with pytest.raises(ValueError, match="freq_pack"):
            harness.check_run_config(str(tmp_path), {"freq_pack": 2, "head_kernel": 4})

    def test_new_keys_are_backward_compatible(self, tmp_path):
        harness.check_run_config(str(tmp_path), {"width": 64})
        harness.check_run_config(str(tmp_path), {"width": 64, "new_knob": 7})

    def test_train_loop_records_config(self, tmp_path):
        g, d = _stub_states()
        harness.train_loop(
            _ok_step, g, d, _batches(2), str(tmp_path), max_steps=2,
            ckpt_every=10, log_every=100, nan_check_every=0,
            config={"width": 64},
        )
        import json

        assert json.loads((tmp_path / "config.json").read_text()) == {"width": 64}
