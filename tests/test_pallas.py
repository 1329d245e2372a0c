"""Pallas featurizer kernel vs the float64 oracle (interpret mode on CPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from advoc_tpu.data import loader
from advoc_tpu.ops import reference as ref
from advoc_tpu.ops import spectral as sp
from advoc_tpu.ops.pallas.featurizer import fused_melspec, _kernel_consts

P = ref.DEFAULT_PARAMS


class TestKernelConsts:
    def test_mel_support_truncation_is_exact(self):
        fb = ref.create_mel_filterbank(P)
        assert np.allclose(fb[:, 384:], 0.0)

    def test_dft_matrices_match_rfft(self):
        w_cos, w_sin, _ = _kernel_consts(P)
        rng = np.random.default_rng(0)
        frame = rng.standard_normal(P.n_fft).astype(np.float32)
        win = ref.hann_window(P.win_length)
        gold = np.fft.rfft(frame * win)[:384]
        got_re = frame @ w_cos
        got_im = frame @ w_sin
        np.testing.assert_allclose(got_re, gold.real, atol=2e-3)
        np.testing.assert_allclose(got_im, gold.imag, atol=2e-3)


class TestFusedMelspec:
    def test_matches_spectral_path(self):
        wav = jnp.asarray(loader.synthetic_speech(0, 256 * 256))  # exactly 1 tile
        got = fused_melspec(wav, P, interpret=True)
        gold = sp.waveform_to_r9y9_melspec(wav, P)[:256]
        assert got.shape == (256, 80)
        np.testing.assert_allclose(np.asarray(got), np.asarray(gold), atol=3e-3)

    def test_multi_tile_and_crop(self):
        wav = jnp.asarray(loader.synthetic_speech(1, 300 * 256))  # 300 frames
        got = fused_melspec(wav, P, t_blk=128, interpret=True)
        gold = sp.waveform_to_r9y9_melspec(wav, P)[:300]
        assert got.shape == (300, 80)
        np.testing.assert_allclose(np.asarray(got), np.asarray(gold), atol=3e-3)

    def test_batched(self):
        wavs = jnp.stack(
            [jnp.asarray(loader.synthetic_speech(i, 128 * 256)) for i in range(2)]
        )
        got = fused_melspec(wavs, P, t_blk=128, interpret=True)
        assert got.shape == (2, 128, 80)
        gold = sp.waveform_to_r9y9_melspec(wavs[1], P)[:128]
        np.testing.assert_allclose(np.asarray(got[1]), np.asarray(gold), atol=3e-3)

    def test_matches_float64_oracle(self):
        wav = loader.synthetic_speech(2, 256 * 256)
        got = fused_melspec(jnp.asarray(wav), P, interpret=True)
        gold = ref.waveform_to_r9y9_melspec(wav.astype(np.float64), P)[:256]
        np.testing.assert_allclose(np.asarray(got), gold, atol=3e-3)


class TestPackedUp:
    """Fused transpose-conv kernel (ops/pallas/packed_up.py): must equal
    nn.ConvTranspose k4/s2 + bias repacked into the packed-tail layout."""

    def test_matches_conv_transpose(self):
        from advoc_tpu.ops.pallas.packed_up import packed_up

        f, cin, B, H, W = 8, 12, 2, 32, 16
        q = lambda a: jnp.asarray(a, jnp.bfloat16).astype(jnp.float32)
        x = q(jax.random.normal(jax.random.PRNGKey(0), (B, H, W, cin)))
        wt = q(jax.random.normal(jax.random.PRNGKey(1), (4, 4, cin, f)) * 0.1)
        bias = q(jax.random.normal(jax.random.PRNGKey(2), (f,)) * 0.1)
        yt = jax.lax.conv_transpose(
            x, wt, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        ) + bias
        # packed[b, 2m+p, n, q·f+c] = yt[b, 2m+p, 2n+q, c]
        gold = yt.reshape(B, 2 * H, W, 2 * f)
        got = packed_up(x, wt, bias, f=f, tm=8, interpret=True)
        assert got.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(gold), atol=3e-2
        )

    def test_with_stats(self):
        """Σy / Σy² emitted by the kernel (the GroupNorm reductions) must
        match reducing the returned packed output itself — the revisiting
        accumulator covers every chunk exactly once."""
        from advoc_tpu.ops.pallas.packed_up import packed_up

        f, cin, B, H, W = 8, 12, 2, 64, 16
        x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, cin))
        wt = jax.random.normal(jax.random.PRNGKey(1), (4, 4, cin, f)) * 0.1
        bias = jax.random.normal(jax.random.PRNGKey(2), (f,)) * 0.1
        y, s1, s2 = packed_up(
            x, wt, bias, f=f, tm=8, with_stats=True, interpret=True
        )
        yf = np.asarray(y, np.float32)
        np.testing.assert_allclose(
            np.asarray(s1), yf.sum(axis=(1, 2)), rtol=1e-4, atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(s2), (yf * yf).sum(axis=(1, 2)), rtol=1e-4, atol=1e-3
        )

    def test_tm_16(self):
        from advoc_tpu.ops.pallas.packed_up import packed_up

        f, cin, B, H, W = 4, 6, 1, 64, 8
        x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, cin))
        wt = jax.random.normal(jax.random.PRNGKey(1), (4, 4, cin, f)) * 0.1
        bias = jnp.zeros((f,))
        yt = jax.lax.conv_transpose(
            x, wt, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        gold = yt.reshape(B, 2 * H, W, 2 * f)
        got = packed_up(x, wt, bias, f=f, tm=16, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(gold), atol=3e-2
        )
