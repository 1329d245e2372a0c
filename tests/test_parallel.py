"""Sequence-parallel halo exchange tests on the 8-device CPU mesh."""

import numpy as np

import jax
import jax.numpy as jnp

from advoc_tpu.data import loader
from advoc_tpu.ops import spectral as sp
from advoc_tpu.ops.reference import DEFAULT_PARAMS
from advoc_tpu.parallel import data_mesh
from advoc_tpu.parallel.halo import sharded_melspec, sharded_stft_mag

P = DEFAULT_PARAMS


class TestHaloExchange:
    def test_sharded_stft_matches_unsharded(self):
        L = 8 * 8192  # 8 shards × 32 frames
        wav = jnp.asarray(loader.synthetic_speech(0, L))
        mesh = data_mesh(8)
        mag_sharded = sharded_stft_mag(wav, mesh)
        mag_full = sp.waveform_to_magspec(wav, P)
        assert mag_sharded.shape == (L // P.hop_length, P.n_freq)
        np.testing.assert_allclose(
            np.asarray(mag_sharded),
            np.asarray(mag_full[: L // P.hop_length]),
            atol=1e-3,
        )

    def test_sharded_mel_matches_unsharded(self):
        L = 8 * 4096
        wav = jnp.asarray(loader.synthetic_speech(1, L))
        mesh = data_mesh(8)
        mel_sharded = sharded_melspec(wav, mesh)
        mel_full = sp.waveform_to_r9y9_melspec(wav, P)
        np.testing.assert_allclose(
            np.asarray(mel_sharded),
            np.asarray(mel_full[: L // P.hop_length]),
            atol=2e-3,
        )

    def test_output_is_sharded_on_frames(self):
        L = 8 * 4096
        wav = jnp.asarray(loader.synthetic_speech(2, L))
        mesh = data_mesh(8)
        mel = sharded_melspec(wav, mesh)
        assert len(mel.sharding.device_set) == 8

    def test_jittable(self):
        L = 8 * 4096
        wav = jnp.asarray(loader.synthetic_speech(3, L))
        mesh = data_mesh(8)
        fn = jax.jit(lambda w: sharded_melspec(w, mesh))
        out = fn(wav)
        assert bool(jnp.isfinite(out).all())


class TestDistributedInit:
    def test_single_host_is_noop(self, monkeypatch):
        from advoc_tpu.parallel.distributed import initialize

        for var in ("COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS",
                    "JAX_NUM_PROCESSES"):
            monkeypatch.delenv(var, raising=False)
        assert initialize() is False
