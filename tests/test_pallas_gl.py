"""Pallas Griffin-Lim kernel vs the XLA scan (interpret mode on CPU)."""

import numpy as np

import jax.numpy as jnp

from advoc_tpu.data import loader
from advoc_tpu.ops import spectral as sp
from advoc_tpu.ops.pallas.griffin_lim import griffin_lim_pallas
from advoc_tpu.ops.reference import DEFAULT_PARAMS as P


def _mag(b=2, t=256, seed=0):
    wav = loader.synthetic_speech(seed, b * t * P.hop_length)
    mel = sp.waveform_to_r9y9_melspec(jnp.asarray(wav), P)[: b * t]
    mel = mel.reshape(b, t, P.n_mels)
    return mel, sp.r9y9_melspec_to_magspec(mel, P)


class TestGriffinLimKernel:
    def test_quality_parity_with_xla(self):
        mel, mag = _mag()
        y = griffin_lim_pallas(mag, n_iters=8, momentum=0.99, params=P,
                               interpret=True)
        yx = sp.griffin_lim(mag, n_iters=8, momentum=0.99, params=P)
        assert y.shape == yx.shape == (2, 256 * P.hop_length)
        t = mel.shape[1]
        l1 = float(jnp.abs(sp.waveform_to_r9y9_melspec(y, P)[:, :t] - mel).mean())
        l1x = float(jnp.abs(sp.waveform_to_r9y9_melspec(yx, P)[:, :t] - mel).mean())
        # Boundary semantics differ (uncropped iteration); quality must stay
        # within 10% of the XLA path.
        assert l1 < 1.1 * l1x + 1e-4, (l1, l1x)

    def test_interior_matches_xla_exactly_at_one_iter(self):
        """One f32 iteration: interior frames follow identical math."""
        _, mag = _mag(b=1, t=64, seed=1)
        y = griffin_lim_pallas(mag, n_iters=1, momentum=0.0, params=P,
                               interpret=True)
        yx = sp.griffin_lim(mag, n_iters=1, momentum=0.0, params=P)
        s = 4 * P.hop_length
        np.testing.assert_allclose(
            np.asarray(y[:, s:-s]), np.asarray(yx[:, s:-s]), atol=5e-4
        )

    def test_spectral_dispatch(self):
        _, mag = _mag(b=1, t=64, seed=2)
        # fft_impl="pallas" routes through the kernel (interpret only works
        # via the direct call; here we check the dispatch path validates).
        try:
            y = sp.griffin_lim(mag, n_iters=1, params=P, fft_impl="pallas")
            assert y.shape == (1, 64 * P.hop_length)
        except Exception:
            # compiled pallas unsupported on CPU test backend — the
            # ValueError paths below are still exercised
            pass
        import pytest

        with pytest.raises(ValueError, match="pallas"):
            sp.griffin_lim(mag[0], n_iters=1, params=P, fft_impl="pallas")

    def test_bf16_mode_runs(self):
        _, mag = _mag(b=1, t=64, seed=3)
        y = griffin_lim_pallas(mag, n_iters=2, params=P, interpret=True,
                               loop_dtype="bfloat16")
        assert bool(jnp.isfinite(y).all())

    def test_512_bin_mode_matches_full(self):
        """drop_nyquist path: the loop on 512 bins (exact lane multiple)
        must match the 513-bin loop — the Nyquist bin in this pipeline is
        the ~zero heuristic passthrough."""
        mel, mag = _mag(b=1, t=64, seed=5)
        y512 = griffin_lim_pallas(mag[..., :-1], n_iters=4, momentum=0.99,
                                  params=P, interpret=True)
        y513 = griffin_lim_pallas(mag, n_iters=4, momentum=0.99, params=P,
                                  interpret=True)
        assert y512.shape == y513.shape
        t = mel.shape[1]
        l1a = float(jnp.abs(sp.waveform_to_r9y9_melspec(y512, P)[:, :t] - mel).mean())
        l1b = float(jnp.abs(sp.waveform_to_r9y9_melspec(y513, P)[:, :t] - mel).mean())
        assert abs(l1a - l1b) < 2e-4, (l1a, l1b)

    def test_drop_nyquist_guard(self):
        import pytest

        _, mag = _mag(b=1, t=64, seed=6)
        with pytest.raises(ValueError, match="pallas-path"):
            sp.griffin_lim(mag, n_iters=1, params=P, drop_nyquist=True)

    def test_asymmetric_split_modes_run(self):
        """split_synth (production) and split_anal both execute; in
        interpret mode (f32 dots regardless of precision) all split modes
        differ only by map storage, so they must agree closely."""
        mel, mag = _mag(b=1, t=64, seed=7)
        t = mel.shape[1]
        l1 = {}
        for mode in ("split", "split_synth", "split_anal"):
            y = griffin_lim_pallas(mag, n_iters=4, momentum=0.99, params=P,
                                   interpret=True, loop_dtype=mode)
            assert bool(jnp.isfinite(y).all())
            l1[mode] = float(
                jnp.abs(sp.waveform_to_r9y9_melspec(y, P)[:, :t] - mel).mean()
            )
        assert abs(l1["split"] - l1["split_synth"]) < 2e-3, l1
        assert abs(l1["split"] - l1["split_anal"]) < 2e-2, l1

    def test_split_mode_matches_f32_maps(self):
        """Production mode: bf16 (hi,lo) map pairs. hi+lo reconstructs the
        f32 tables to ~2^-16, so at matched (DEFAULT) dot precision the
        split result must track the f32-map result closely."""
        mel, mag = _mag(b=1, t=64, seed=4)
        import jax

        ys = griffin_lim_pallas(mag, n_iters=4, momentum=0.99, params=P,
                                interpret=True, loop_dtype="split")
        yf = griffin_lim_pallas(mag, n_iters=4, momentum=0.99, params=P,
                                interpret=True, loop_dtype="float32",
                                precision=jax.lax.Precision.HIGHEST)
        assert bool(jnp.isfinite(ys).all())
        t = mel.shape[1]
        l1s = float(jnp.abs(sp.waveform_to_r9y9_melspec(ys, P)[:, :t] - mel).mean())
        l1f = float(jnp.abs(sp.waveform_to_r9y9_melspec(yf, P)[:, :t] - mel).mean())
        # interpret mode executes dots in f32 regardless of precision, so
        # the only difference is map storage — must be within 2e-3.
        assert abs(l1s - l1f) < 2e-3, (l1s, l1f)


class TestTiledGriffinLim:
    """Time-tiled kernel (r3): lifts the 256-frame VMEM cap.

    With 3·iters_per_round ≤ halo the tile centers compute identical math to
    the whole-utterance kernel, so the tiled path must match it bit-for-bit
    (interpret mode executes both in plain f32)."""

    def test_matches_single_tile_kernel_exactly(self):
        from advoc_tpu.ops.pallas.griffin_lim import griffin_lim_pallas_tiled
        import jax

        _, mag = _mag(b=1, t=512, seed=8)
        yt = griffin_lim_pallas_tiled(
            mag, n_iters=6, momentum=0.99, params=P, interpret=True,
            loop_dtype="float32", precision=jax.lax.Precision.HIGHEST,
            tile=256, halo=16, iters_per_round=3,
        )
        ys = griffin_lim_pallas(
            mag, n_iters=6, momentum=0.99, params=P, interpret=True,
            loop_dtype="float32", precision=jax.lax.Precision.HIGHEST,
        )
        np.testing.assert_array_equal(np.asarray(yt), np.asarray(ys))

    def test_dispatch_above_single_tile_cap(self):
        """griffin_lim_pallas itself routes T>256 to the tiled driver."""
        from advoc_tpu.ops.pallas import griffin_lim as glmod

        _, mag = _mag(b=1, t=512, seed=9)
        y = glmod.griffin_lim_pallas(
            mag[..., :-1], n_iters=2, momentum=0.99, params=P, interpret=True)
        assert y.shape == (1, 512 * P.hop_length)
        assert bool(jnp.isfinite(y).all())

    def test_non_multiple_raises(self):
        import pytest
        from advoc_tpu.ops.pallas.griffin_lim import griffin_lim_pallas_tiled

        _, mag = _mag(b=1, t=320, seed=10)
        with pytest.raises(ValueError, match="T % 256"):
            griffin_lim_pallas_tiled(mag, n_iters=2, params=P, interpret=True)

    def test_halo_guard(self):
        import pytest
        from advoc_tpu.ops.pallas.griffin_lim import griffin_lim_pallas_tiled

        _, mag = _mag(b=1, t=512, seed=11)
        with pytest.raises(AssertionError, match="halo"):
            griffin_lim_pallas_tiled(
                mag, n_iters=30, params=P, interpret=True,
                halo=8, iters_per_round=10,
            )
