"""AOT export tests: serialized fused-vocoder artifacts (infer/export.py).

The artifact must reproduce the live Vocoder bit-for-bit (same XLA program,
params baked as constants), serve the pad-to-bucket/crop contract without
any model code, and fail loudly on shape or platform mismatches.
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from advoc_tpu.data import loader
from advoc_tpu.infer import Vocoder
from advoc_tpu.infer.export import ExportedVocoder, export_vocoder
from advoc_tpu.models.advoc import AdvocConfig, AdvocGenerator
from advoc_tpu.ops import spectral as sp
from advoc_tpu.ops.reference import DEFAULT_PARAMS as P


@pytest.fixture(scope="module")
def mel():
    wav = jnp.asarray(loader.synthetic_speech(0, 22050 * 2))
    return sp.waveform_to_r9y9_melspec(wav, P)  # (173, 80)


@pytest.fixture(scope="module")
def tiny_voc():
    cfg = AdvocConfig(n_frames=64, width=8, depth=4, dtype="float32")
    g = AdvocGenerator(cfg)
    params = g.init(
        jax.random.PRNGKey(0), jnp.zeros((1, cfg.n_frames, cfg.n_freq))
    )["params"]
    return Vocoder(
        g_apply=lambda p, est: g.apply({"params": p}, est),
        g_params=params, params=P,
        chunk_frames=cfg.n_frames, overlap_frames=8, gl_iters=4,
    )


class TestExportRoundTrip:
    def test_matches_live_vocoder(self, tmp_path, mel, tiny_voc):
        # Baking params as constants lets XLA constant-fold/fuse slightly
        # differently than the live params-as-argument program, so the
        # artifact is equivalent to ~1e-5 (float32 reassociation), not
        # bit-equal; the heuristic-only export below (no baked params) IS
        # bit-equal.
        export_vocoder(tiny_voc, [(1, 192)], tmp_path)
        served = ExportedVocoder(tmp_path)
        want = np.asarray(tiny_voc(mel))
        got = served(np.asarray(mel))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_heuristic_only_export(self, tmp_path, mel):
        voc = Vocoder(params=P, gl_iters=8, chunk_frames=64)
        export_vocoder(voc, [(1, 192)], tmp_path)
        served = ExportedVocoder(tmp_path)
        np.testing.assert_array_equal(served(np.asarray(mel)),
                                      np.asarray(voc(mel)))

    def test_pads_batch_and_time_to_exported_shape(self, tmp_path, tiny_voc):
        export_vocoder(tiny_voc, [(4, 128)], tmp_path)
        served = ExportedVocoder(tmp_path)
        mels = np.stack([
            np.asarray(sp.waveform_to_r9y9_melspec(
                jnp.asarray(loader.synthetic_speech(s, 100 * P.hop_length)),
                P,
            ))[:100]
            for s in (1, 2)
        ])  # (2, 100, 80) — needs padding to (4, 128, 80)
        got = served(mels)
        assert got.shape == (2, 100 * P.hop_length)
        want = np.asarray(tiny_voc(jnp.asarray(mels)))
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_picks_tightest_bucket(self, tmp_path, tiny_voc):
        export_vocoder(tiny_voc, [(1, 64), (1, 192), (2, 64)], tmp_path)
        served = ExportedVocoder(tmp_path)
        assert served._pick(1, 60) == (1, 64)
        assert served._pick(2, 64) == (2, 64)
        assert served._pick(1, 100) == (1, 192)


class TestExportContract:
    def test_manifest_contents(self, tmp_path, tiny_voc):
        m = export_vocoder(tiny_voc, [(2, 64)], tmp_path)
        on_disk = json.loads((tmp_path / "manifest.json").read_text())
        assert on_disk == m
        assert m["sample_rate"] == P.sample_rate
        assert m["hop_length"] == P.hop_length
        assert m["artifacts"][0]["batch"] == 2
        assert (tmp_path / m["artifacts"][0]["file"]).exists()

    def test_rejects_unaligned_bucket(self, tmp_path, tiny_voc):
        with pytest.raises(ValueError, match="bucket-aligned"):
            export_vocoder(tiny_voc, [(1, 100)], tmp_path)

    def test_no_fitting_artifact_raises(self, tmp_path, tiny_voc):
        export_vocoder(tiny_voc, [(1, 64)], tmp_path)
        served = ExportedVocoder(tmp_path)
        with pytest.raises(ValueError, match="no exported artifact"):
            served(np.zeros((2, 64, P.n_mels), np.float32))

    def test_platform_recorded(self, tmp_path, tiny_voc):
        m = export_vocoder(tiny_voc, [(1, 64)], tmp_path)
        assert jax.default_backend() in m["artifacts"][0]["platforms"]
