"""Model forward-pass shape/range tests (SURVEY.md §4 item c)."""

import numpy as np

import jax
import jax.numpy as jnp

from advoc_tpu.models.advoc import AdvocConfig, AdvocGenerator, PatchDiscriminator
from advoc_tpu.models.advoc.model import small_config
from advoc_tpu.models.wavegan import (
    WaveGANConfig,
    WaveGANGenerator,
    WaveGANDiscriminator,
)
from advoc_tpu.models.wavegan.model import phase_shuffle
from advoc_tpu.models.melspecgan import (
    MelSpecGANConfig,
    MelSpecGANGenerator,
    MelSpecGANDiscriminator,
)

TINY = AdvocConfig(n_frames=64, width=8, depth=4, disc_width=8)


class TestAdvocModels:
    def test_generator_shapes_and_range(self):
        g = AdvocGenerator(TINY)
        est = jax.random.uniform(jax.random.PRNGKey(0), (2, 64, 513))
        params = g.init(jax.random.PRNGKey(1), est)["params"]
        out = g.apply({"params": params}, est)
        assert out.shape == (2, 64, 513)
        assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0

    def test_freq_pack_variants(self):
        # freq_pack is a layout change (freq bins → channels), not a model
        # capacity change: every pack must preserve I/O shapes, range, and
        # the Nyquist passthrough; pack=1 is the classic 1-channel image.
        import dataclasses

        est = jax.random.uniform(jax.random.PRNGKey(0), (2, 64, 513))
        for pack in (1, 2, 4, 8):
            cfg = dataclasses.replace(TINY, freq_pack=pack)
            g = AdvocGenerator(cfg)
            params = g.init(jax.random.PRNGKey(1), est)["params"]
            out = g.apply({"params": params}, est)
            assert out.shape == (2, 64, 513), (pack, out.shape)
            assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0
            np.testing.assert_array_equal(
                np.asarray(out[..., -1]), np.asarray(est[..., -1])
            )

    def test_freq_pack_fast_head(self):
        import dataclasses

        cfg = dataclasses.replace(TINY, freq_pack=4, fast_head=True)
        g = AdvocGenerator(cfg)
        est = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 513))
        params = g.init(jax.random.PRNGKey(1), est)["params"]
        out = g.apply({"params": params}, est)
        assert out.shape == (1, 64, 513)

    def test_subpixel_upsample_equals_convtranspose(self):
        """upsample="subpixel" is an exact re-parametrization of
        convtranspose k4/s2 (model.py _Up): mapping the transpose kernel via
        K[u,v,ci,(p,q,c)] = w[2u+p, 2v+q, ci, c] must reproduce the same
        function to float precision — so switching modes needs no quality
        gate (and checkpoints are mechanically convertible)."""
        import dataclasses

        from advoc_tpu.models.advoc.model import _Up

        cin, cout = 3, 5
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 6, cin))
        cfg_ct = dataclasses.replace(TINY, upsample="convtranspose",
                                     dtype="float32", norm_groups=1)
        cfg_sp = dataclasses.replace(cfg_ct, upsample="subpixel")
        up_ct, up_sp = _Up(cout, cfg_ct), _Up(cout, cfg_sp)
        p_ct = up_ct.init(jax.random.PRNGKey(1), x)["params"]
        w = np.asarray(p_ct["conv"]["kernel"])  # (4,4,cin,cout)
        b = np.asarray(p_ct["conv"]["bias"])
        K = np.zeros((2, 2, cin, 4 * cout), np.float32)
        B4 = np.zeros((4 * cout,), np.float32)
        for p in (0, 1):
            for q in (0, 1):
                blk = slice((p * 2 + q) * cout, (p * 2 + q + 1) * cout)
                for u in (0, 1):
                    for v in (0, 1):
                        K[u, v, :, blk] = w[2 * u + p, 2 * v + q]
                B4[blk] = b
        p_sp = jax.tree.map(np.asarray, up_sp.init(jax.random.PRNGKey(2), x)["params"])
        p_sp["conv"]["kernel"] = K
        p_sp["conv"]["bias"] = B4
        p_sp["norm"] = jax.tree.map(np.asarray, p_ct["norm"])
        y_ct = up_ct.apply({"params": p_ct}, x)
        y_sp = up_sp.apply({"params": p_sp}, x)
        assert y_sp.shape == y_ct.shape == (2, 16, 12, cout)
        np.testing.assert_allclose(
            np.asarray(y_sp), np.asarray(y_ct), atol=1e-5, rtol=1e-5
        )

    def test_packed_tail_equals_default(self):
        """packed_tail is an EXACT rewrite of the finest up level + head
        (model.py AdvocConfig.packed_tail): identical parameter tree,
        identical function — so trained checkpoints load unchanged and no
        quality gate is needed. Verified in f32 to float precision and in
        the production bf16 compute dtype to bf16 resolution."""
        import dataclasses

        for dtype, atol in (("float32", 2e-5), ("bfloat16", 4e-2)):
            cfg = dataclasses.replace(TINY, dtype=dtype)
            cfg_pk = dataclasses.replace(cfg, packed_tail=True)
            g, gp = AdvocGenerator(cfg), AdvocGenerator(cfg_pk)
            est = jax.random.uniform(jax.random.PRNGKey(0), (2, 64, 513))
            params = g.init(jax.random.PRNGKey(1), est)["params"]
            # Same tree: the packed model consumes the default's params.
            chex_tree = jax.tree.structure(params)
            params_pk = gp.init(jax.random.PRNGKey(2), est)["params"]
            assert jax.tree.structure(params_pk) == chex_tree
            assert jax.tree.map(jnp.shape, params_pk) == jax.tree.map(
                jnp.shape, params
            )
            out = g.apply({"params": params}, est)
            out_pk = gp.apply({"params": params}, est)
            np.testing.assert_allclose(
                np.asarray(out_pk), np.asarray(out), atol=atol, rtol=0,
                err_msg=dtype,
            )

    def test_packed_tail_invalid_config_raises(self):
        import dataclasses

        import pytest

        cfg = dataclasses.replace(TINY, packed_tail=True, head_kernel=4)
        g = AdvocGenerator(cfg)
        est = jnp.zeros((1, 64, 513))
        with pytest.raises(ValueError):
            g.init(jax.random.PRNGKey(0), est)

    def test_nyquist_passthrough(self):
        g = AdvocGenerator(TINY)
        est = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 513))
        params = g.init(jax.random.PRNGKey(1), est)["params"]
        out = g.apply({"params": params}, est)
        np.testing.assert_array_equal(np.asarray(out[..., -1]), np.asarray(est[..., -1]))

    def test_discriminator_patch_output(self):
        d = PatchDiscriminator(TINY)
        cond = jnp.zeros((2, 64, 513))
        mag = jnp.zeros((2, 64, 513))
        params = d.init(jax.random.PRNGKey(0), cond, mag)["params"]
        logits = d.apply({"params": params}, cond, mag)
        # disc_layers=4, 3 of them stride 2: 64/8=8; freq 512/pack/8
        assert logits.shape == (2, 8, 512 // TINY.freq_pack // 8, 1)

    def test_small_variant_is_config_not_code(self):
        cfg = small_config()
        assert cfg.width < AdvocConfig().width
        g = AdvocGenerator(cfg)
        est = jnp.zeros((1, cfg.n_frames, 513))
        params = g.init(jax.random.PRNGKey(0), est)["params"]
        out = g.apply({"params": params}, est)
        assert out.shape == (1, cfg.n_frames, 513)

    def test_param_count_scales_with_width(self):
        def count(cfg):
            g = AdvocGenerator(cfg)
            p = g.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 513)))["params"]
            return sum(x.size for x in jax.tree.leaves(p))

        full = count(AdvocConfig(n_frames=64, width=16, depth=4))
        small = count(AdvocConfig(n_frames=64, width=8, depth=4))
        assert small < full / 2.5  # ~quadratic in width


class TestWaveGAN:
    CFG = WaveGANConfig(slice_len=1024, latent_dim=32, width=16, phase_shuffle=2)

    def test_generator_output(self):
        g = WaveGANGenerator(self.CFG)
        z = jax.random.normal(jax.random.PRNGKey(0), (2, 32))
        params = g.init(jax.random.PRNGKey(1), z)["params"]
        wav = g.apply({"params": params}, z)
        assert wav.shape == (2, 1024)
        assert float(jnp.abs(wav).max()) <= 1.0

    def test_discriminator_logit(self):
        d = WaveGANDiscriminator(self.CFG)
        wav = jax.random.normal(jax.random.PRNGKey(0), (2, 1024)) * 0.1
        params = d.init(jax.random.PRNGKey(1), wav, rng=jax.random.PRNGKey(2))["params"]
        logits = d.apply({"params": params}, wav, rng=jax.random.PRNGKey(3))
        assert logits.shape == (2,)

    def test_phase_shuffle_exact(self):
        x = jnp.arange(8.0).reshape(1, 8, 1)
        # shift +1: output[t] = padded[rad+1+t] = x[t+1] (reflect at tail)
        out = phase_shuffle(x, jnp.array([1]), rad=2)
        np.testing.assert_array_equal(
            np.asarray(out[0, :, 0]), np.array([1, 2, 3, 4, 5, 6, 7, 6], np.float32)
        )
        out0 = phase_shuffle(x, jnp.array([0]), rad=2)
        np.testing.assert_array_equal(np.asarray(out0), np.asarray(x))


class TestMelSpecGAN:
    CFG = MelSpecGANConfig(latent_dim=32, width=16)

    def test_generator_output(self):
        g = MelSpecGANGenerator(self.CFG)
        z = jax.random.normal(jax.random.PRNGKey(0), (2, 32))
        params = g.init(jax.random.PRNGKey(1), z)["params"]
        mel = g.apply({"params": params}, z)
        assert mel.shape == (2, 64, 80)
        assert float(mel.min()) >= 0.0 and float(mel.max()) <= 1.0

    def test_discriminator_logit(self):
        d = MelSpecGANDiscriminator(self.CFG)
        mel = jax.random.uniform(jax.random.PRNGKey(0), (2, 64, 80))
        params = d.init(jax.random.PRNGKey(1), mel)["params"]
        assert d.apply({"params": params}, mel).shape == (2,)


class TestCondWaveGAN:
    def test_generator_geometry(self):
        from advoc_tpu.models.wavegan.conditional import (
            CondWaveGANConfig,
            CondWaveGANGenerator,
        )

        cfg = CondWaveGANConfig(n_frames=16, width=8, dtype="float32")
        g = CondWaveGANGenerator(cfg)
        mel = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 80))
        params = g.init(jax.random.PRNGKey(1), mel)["params"]
        wav = g.apply({"params": params}, mel)
        assert wav.shape == (2, 16 * 256)  # T frames x hop samples exactly
        assert float(jnp.abs(wav).max()) <= 1.0

    def test_discriminator_patch_logits(self):
        from advoc_tpu.models.wavegan.conditional import (
            CondWaveGANConfig,
            CondWaveGANDiscriminator,
        )

        cfg = CondWaveGANConfig(n_frames=16, width=8, dtype="float32")
        d = CondWaveGANDiscriminator(cfg)
        wav = jnp.zeros((2, cfg.slice_len))
        mel = jnp.zeros((2, 16, 80))
        params = d.init(jax.random.PRNGKey(0), wav, mel,
                        rng=jax.random.PRNGKey(1))["params"]
        logits = d.apply({"params": params}, wav, mel, rng=jax.random.PRNGKey(2))
        assert logits.ndim == 2 and logits.shape[0] == 2
