"""GAN train-step tests: smoke, loss behavior, DP equivalence on 8-dev mesh.

(SURVEY.md §4 items c–d: train-step smoke tests + multi-device DP tests on
forced-host-device-count CPU.)
"""

import numpy as np

import jax
import jax.numpy as jnp

from advoc_tpu.data import loader
from advoc_tpu.models.advoc import AdvocConfig, AdvocGenerator, PatchDiscriminator
from advoc_tpu.models.wavegan import (
    WaveGANConfig,
    WaveGANGenerator,
    WaveGANDiscriminator,
)
from advoc_tpu.models.melspecgan import (
    MelSpecGANConfig,
    MelSpecGANGenerator,
    MelSpecGANDiscriminator,
)
from advoc_tpu.ops.reference import DEFAULT_PARAMS
from advoc_tpu.parallel import data_mesh
from advoc_tpu.train import gan

CFG = AdvocConfig(n_frames=64, width=8, depth=4, disc_width=8, dtype="float32")
SLICE = CFG.n_frames * DEFAULT_PARAMS.hop_length  # 16384


def _advoc_setup(gan_type="lsgan", lr=2e-4):
    cfg = AdvocConfig(
        n_frames=64, width=8, depth=4, disc_width=8, dtype="float32",
        gan_type=gan_type,
    )
    g = AdvocGenerator(cfg)
    d = PatchDiscriminator(cfg)
    est0 = jnp.zeros((1, cfg.n_frames, cfg.n_freq))
    gstate, dstate = gan.make_states(
        g, d, (est0,), (est0, est0), seed=0,
        g_tx=gan.adam(lr), d_tx=gan.adam(lr),
    )
    step = gan.make_advoc_train_step(g, d, cfg, DEFAULT_PARAMS)
    return cfg, g, d, gstate, dstate, step


def _wav_batch(b=4, seed=0):
    return jnp.stack(
        [jnp.asarray(loader.synthetic_speech(seed + i, SLICE)) for i in range(b)]
    )


class TestAdvocTrainStep:
    def test_smoke_and_param_updates(self):
        _, _, _, gstate, dstate, step = _advoc_setup()
        jstep = jax.jit(step)
        wav = _wav_batch(2)
        g0 = jax.tree.map(lambda x: x.copy(), gstate.params)
        d0 = jax.tree.map(lambda x: x.copy(), dstate.params)
        gstate, dstate, m = jstep(gstate, dstate, wav, jax.random.PRNGKey(0))
        for k, v in m.items():
            assert np.isfinite(float(v)), f"{k} not finite"
        g_changed = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()) > 0, g0, gstate.params
        )
        d_changed = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()) > 0, d0, dstate.params
        )
        assert all(jax.tree.leaves(g_changed)), "G params did not update"
        assert all(jax.tree.leaves(d_changed)), "D params did not update"
        assert int(gstate.step) == 1 and int(dstate.step) == 1

    def test_l1_decreases_over_steps(self):
        _, _, _, gstate, dstate, step = _advoc_setup(lr=2e-3)
        jstep = jax.jit(step)
        wav = _wav_batch(4)
        l1s = []
        for i in range(8):
            gstate, dstate, m = jstep(gstate, dstate, wav, jax.random.PRNGKey(i))
            l1s.append(float(m["g_l1"]))
        assert l1s[-1] < l1s[0], f"L1 did not decrease: {l1s}"

    def test_wgan_gp_path(self):
        _, _, _, gstate, dstate, step = _advoc_setup(gan_type="wgan-gp")
        gstate, dstate, m = jax.jit(step)(
            gstate, dstate, _wav_batch(2), jax.random.PRNGKey(0)
        )
        assert np.isfinite(float(m["d_loss"]))

    def test_dcgan_path(self):
        _, _, _, gstate, dstate, step = _advoc_setup(gan_type="dcgan")
        gstate, dstate, m = jax.jit(step)(
            gstate, dstate, _wav_batch(2), jax.random.PRNGKey(0)
        )
        assert np.isfinite(float(m["d_loss"]))

    def test_eval_step_heuristic_vs_repaired(self):
        cfg, g, _, gstate, _, _ = _advoc_setup()
        estep = jax.jit(gan.make_advoc_eval_step(g, cfg, DEFAULT_PARAMS))
        m = estep(gstate.params, _wav_batch(2))
        assert np.isfinite(float(m["eval_l1_repaired"]))
        assert np.isfinite(float(m["eval_l1_heuristic"]))


class TestDataParallel:
    def test_dp_matches_single_device(self):
        """The DP-jitted step must be numerically ≈ the single-device step."""
        _, _, _, gstate, dstate, step = _advoc_setup()
        wav = _wav_batch(8)
        rng = jax.random.PRNGKey(0)

        g1, d1, m1 = jax.jit(step)(gstate, dstate, wav, rng)

        mesh = data_mesh(8)
        dp_step = gan.jit_data_parallel(step, mesh, donate=False)
        g2, d2, m2 = dp_step(gstate, dstate, wav, rng)

        np.testing.assert_allclose(
            float(m1["g_l1"]), float(m2["g_l1"]), rtol=2e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            float(m1["d_loss"]), float(m2["d_loss"]), rtol=2e-4, atol=1e-5
        )
        # Params after one Adam step: where gradients ≈ 0, reduction-order
        # float noise flips the ±lr·sign(g) first-step update, so tolerance is
        # O(lr), not float-eps. Gross divergence would be ≫ 2·lr.
        lr = 2e-4
        for a, b in zip(jax.tree.leaves(g1.params), jax.tree.leaves(g2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2.5 * lr)

    def test_dp_gradients_match_single_device(self):
        """Sharded-batch gradients must equal single-device gradients — the
        direct check that jit's implicit psum over the 'data' axis is right."""
        cfg, g, d, gstate, dstate, _ = _advoc_setup()
        wav = _wav_batch(8)

        def g_l1_loss(gparams, wav):
            mel, est, real = gan.featurize_advoc(wav, cfg.n_frames, DEFAULT_PARAMS)
            fake = g.apply({"params": gparams}, est)
            return jnp.mean(jnp.abs(fake - real))

        grad_fn = jax.jit(jax.grad(g_l1_loss))
        g_single = grad_fn(gstate.params, wav)

        from advoc_tpu.parallel import mesh as mesh_lib

        mesh = data_mesh(8)
        wav_sharded = mesh_lib.shard_batch(wav, mesh)
        params_repl = mesh_lib.replicate(gstate.params, mesh)
        g_dp = grad_fn(params_repl, wav_sharded)

        for a, b in zip(jax.tree.leaves(g_single), jax.tree.leaves(g_dp)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-6
            )

    def test_dp_runs_multiple_steps(self):
        _, _, _, gstate, dstate, step = _advoc_setup()
        mesh = data_mesh(8)
        dp_step = gan.jit_data_parallel(step, mesh)
        wav = _wav_batch(8)
        for i in range(3):
            gstate, dstate, m = dp_step(gstate, dstate, wav, jax.random.PRNGKey(i))
        assert np.isfinite(float(m["g_loss"]))


class TestWaveGANTrainStep:
    def test_smoke(self):
        cfg = WaveGANConfig(
            slice_len=1024, latent_dim=16, width=8, n_critic=2, dtype="float32"
        )
        g = WaveGANGenerator(cfg)
        d = WaveGANDiscriminator(cfg)
        z0 = jnp.zeros((1, cfg.latent_dim))
        w0 = jnp.zeros((1, cfg.slice_len))
        gstate, dstate = gan.make_states(
            g, d, (z0,), (w0,), seed=0,
            g_tx=gan.adam(1e-4, 0.5, 0.9), d_tx=gan.adam(1e-4, 0.5, 0.9),
        )
        step = jax.jit(gan.make_wavegan_train_step(g, d, cfg))
        wav = jnp.stack([_wav_batch(2, seed=i)[:, : cfg.slice_len] for i in range(2)])
        gstate, dstate, m = step(gstate, dstate, wav, jax.random.PRNGKey(0))
        assert np.isfinite(float(m["d_loss"])) and np.isfinite(float(m["g_loss"]))
        assert int(dstate.step) == cfg.n_critic


class TestMelSpecGANTrainStep:
    def test_smoke(self):
        cfg = MelSpecGANConfig(latent_dim=16, width=16, n_critic=2, dtype="float32")
        g = MelSpecGANGenerator(cfg)
        d = MelSpecGANDiscriminator(cfg)
        z0 = jnp.zeros((1, cfg.latent_dim))
        m0 = jnp.zeros((1, cfg.n_frames, cfg.n_mels))
        gstate, dstate = gan.make_states(g, d, (z0,), (m0,), seed=0)
        step = jax.jit(gan.make_melspecgan_train_step(g, d, cfg, DEFAULT_PARAMS))
        wav = jnp.stack(
            [_wav_batch(2, seed=i)[:, : cfg.n_frames * 256] for i in range(2)]
        )
        gstate, dstate, m = step(gstate, dstate, wav, jax.random.PRNGKey(0))
        assert np.isfinite(float(m["d_loss"])) and np.isfinite(float(m["g_loss"]))


class TestCondWaveGANTrainStep:
    def test_smoke_and_mel_l1_decreases(self):
        from advoc_tpu.models.wavegan.conditional import (
            CondWaveGANConfig,
            CondWaveGANGenerator,
            CondWaveGANDiscriminator,
        )

        cfg = CondWaveGANConfig(n_frames=16, width=8, dtype="float32")
        g, d = CondWaveGANGenerator(cfg), CondWaveGANDiscriminator(cfg)
        m0 = jnp.zeros((1, cfg.n_frames, cfg.n_mels))
        w0 = jnp.zeros((1, cfg.slice_len))
        gstate, dstate = gan.make_states(
            g, d, (m0,), (w0, m0), seed=0,
            g_tx=gan.adam(1e-3), d_tx=gan.adam(1e-3),
        )
        step = jax.jit(gan.make_cond_wavegan_train_step(g, d, cfg, DEFAULT_PARAMS))
        wav = _wav_batch(2)[:, : cfg.slice_len]
        l1s = []
        for i in range(6):
            gstate, dstate, m = step(gstate, dstate, wav, jax.random.PRNGKey(i))
            l1s.append(float(m["g_mel_l1"]))
        assert all(np.isfinite(v) for v in l1s)
        assert l1s[-1] < l1s[0], l1s


class TestConditionOnMel:
    def test_condition_on_mel_trains(self):
        """ADVICE r1: condition_on="mel" used to crash at trace time (the
        80-bin condition could not stack with the 513-bin magnitude)."""
        cfg = AdvocConfig(
            n_frames=64, width=8, depth=4, disc_width=8, dtype="float32",
            condition_on="mel",
        )
        g, d = AdvocGenerator(cfg), PatchDiscriminator(cfg)
        est0 = jnp.zeros((1, cfg.n_frames, cfg.n_freq))
        mel0 = jnp.zeros((1, cfg.n_frames, 80))
        gstate, dstate = gan.make_states(g, d, (est0,), (mel0, est0), seed=0)
        step = jax.jit(gan.make_advoc_train_step(g, d, cfg, DEFAULT_PARAMS))
        gstate, dstate, m = step(
            gstate, dstate, _wav_batch(2), jax.random.PRNGKey(0)
        )
        assert all(np.isfinite(float(v)) for v in m.values())


class TestDataParallelOtherFamilies:
    """VERDICT r1 weak #7: DP coverage was advoc-only; the (n_critic, B, T)
    batch layout must shard axis 1 (examples), not axis 0 (critics)."""

    def _wavegan_setup(self):
        cfg = WaveGANConfig(
            slice_len=1024, latent_dim=16, width=8, n_critic=2, dtype="float32"
        )
        g, d = WaveGANGenerator(cfg), WaveGANDiscriminator(cfg)
        z0 = jnp.zeros((1, cfg.latent_dim))
        w0 = jnp.zeros((1, cfg.slice_len))
        gstate, dstate = gan.make_states(g, d, (z0,), (w0,), seed=0)
        step = gan.make_wavegan_train_step(g, d, cfg)
        wav = jnp.stack(
            [_wav_batch(8, seed=10 * i)[:, : cfg.slice_len] for i in range(2)]
        )  # (n_critic=2, B=8, T)
        return gstate, dstate, step, wav

    def test_wavegan_dp_matches_single(self):
        gstate, dstate, step, wav = self._wavegan_setup()
        rng = jax.random.PRNGKey(0)
        g1, d1, m1 = jax.jit(step)(gstate, dstate, wav, rng)
        dp = gan.jit_data_parallel(step, data_mesh(8), batch_axis=1, donate=False)
        g2, d2, m2 = dp(gstate, dstate, wav, rng)
        np.testing.assert_allclose(
            float(m1["d_loss"]), float(m2["d_loss"]), rtol=2e-3, atol=1e-4
        )
        np.testing.assert_allclose(
            float(m1["g_loss"]), float(m2["g_loss"]), rtol=2e-3, atol=1e-4
        )

    def test_melspecgan_dp_matches_single(self):
        cfg = MelSpecGANConfig(latent_dim=16, width=8, n_critic=2, dtype="float32")
        g, d = MelSpecGANGenerator(cfg), MelSpecGANDiscriminator(cfg)
        z0 = jnp.zeros((1, cfg.latent_dim))
        m0 = jnp.zeros((1, cfg.n_frames, cfg.n_mels))
        gstate, dstate = gan.make_states(g, d, (z0,), (m0,), seed=0)
        step = gan.make_melspecgan_train_step(g, d, cfg, DEFAULT_PARAMS)
        wav = jnp.stack(
            [_wav_batch(8, seed=10 * i)[:, : cfg.n_frames * 256] for i in range(2)]
        )
        rng = jax.random.PRNGKey(0)
        g1, d1, m1 = jax.jit(step)(gstate, dstate, wav, rng)
        dp = gan.jit_data_parallel(step, data_mesh(8), batch_axis=1, donate=False)
        g2, d2, m2 = dp(gstate, dstate, wav, rng)
        np.testing.assert_allclose(
            float(m1["d_loss"]), float(m2["d_loss"]), rtol=2e-3, atol=1e-4
        )
        np.testing.assert_allclose(
            float(m1["g_loss"]), float(m2["g_loss"]), rtol=2e-3, atol=1e-4
        )
