"""Pallas featurizer kernel vs the float64 oracle (interpret mode on CPU)."""

import numpy as np

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
