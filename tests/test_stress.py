"""Stress-fixture tests: degenerate inputs must round-trip without NaN and
with sane quality on the tonal classes (VERDICT r1 missing #4)."""

import numpy as np
import pytest

from advoc_tpu.data import loader


class TestStressFixtures:
    @pytest.mark.parametrize("kind", loader.STRESS_KINDS)
    def test_shape_dtype_finite(self, kind):
        x = loader.stress_fixture(kind, 4096)
        assert x.shape == (4096,)
        assert x.dtype == np.float32
        assert np.all(np.isfinite(x))
        assert np.abs(x).max() <= 1.0

    def test_deterministic(self):
        a = loader.stress_fixture("noise", 2048, seed=3)
        b = loader.stress_fixture("noise", 2048, seed=3)
        np.testing.assert_array_equal(a, b)

    def test_unknown_kind_raises(self):
        with pytest.raises(ValueError, match="unknown stress kind"):
            loader.stress_fixture("kazoo", 1024)

    def test_silence_is_zero_and_clipping_clips(self):
        assert not loader.stress_fixture("silence", 1024).any()
        clipped = loader.stress_fixture("clipping", 8192)
        assert (np.abs(clipped) >= 0.9499).mean() > 0.05  # saturates often


class TestStressPanel:
    @pytest.fixture(scope="class")
    def panel(self):
        from advoc_tpu.infer import Vocoder
        from advoc_tpu.ops.reference import DEFAULT_PARAMS
        from advoc_tpu.train.eval_metrics import stress_panel

        voc = Vocoder(params=DEFAULT_PARAMS, chunk_frames=64, gl_iters=4)
        return stress_panel(voc, n_frames=64)

    def test_all_classes_present(self, panel):
        assert set(panel) == set(loader.STRESS_KINDS)

    def test_metrics_finite(self, panel):
        # stress_panel itself raises on non-finite metrics (except snr_db,
        # degenerate on silence); re-assert the contract from the outside.
        for kind, m in panel.items():
            for name, v in m.items():
                if kind == "silence" and name in ("snr_db", "stoi"):
                    continue  # zero-energy reference: −∞ SNR, undefined STOI
                assert np.isfinite(v), (kind, name, v)

    def test_silence_roundtrips_to_silence(self, panel):
        # Zero mel → min-dB magnitude floor → near-silent audio.
        assert panel["silence"]["mel_l1"] < 0.01

    def test_tonal_classes_reasonable(self, panel):
        # A steady tone and a slow chirp are the easy cases for G-L even at
        # 4 iterations; loose bound, just catches gross breakage.
        assert panel["tone"]["mel_l1"] < 0.1
        assert panel["chirp"]["mel_l1"] < 0.1
